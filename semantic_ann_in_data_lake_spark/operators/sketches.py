"""Count-min sketch heavy hitters: approximate per-key frequency with
a FIXED-size summary, plus the exact-verified top-k report.

Extension beyond the reference surface (its only frequency operator is
the exact most-common-values top-20, ``SemLink/join_discoverer.py:90,
117-119``, re-expressed in ``operators/profiler.py``): at 100 TB an
exact per-key count of a high-cardinality key (user id, URL, n-gram)
is a full shuffle of the key space, while a count-min sketch is
``d × w`` integers REGARDLESS of cardinality — the classic streaming
summary (Cormode & Muthukrishnan 2005).

How the shape maps to Spark:

- The sketch build is ONE scan: each row explodes to its ``d``
  (depth, bucket) coordinates — generated inside whole-stage codegen —
  and a groupBy((depth, bucket)) counts. Partial aggregation combines
  map-side, so the shuffle moving data is at most ``d·w`` rows per
  input partition, i.e. the sketch size, not the data size.
- Estimation probes the sketch for a CANDIDATE key set:
  ``est(key) = min over d of bucket_count[depth][h_depth(key)]``.
  Candidates here are the distinct keys (exact at test scale); at
  100 TB you probe a sampled/streamed candidate set — the sketch does
  not enumerate keys, by design.
- CMS guarantees ``est ≥ true`` always (no false negatives for heavy
  hitters) and ``est ≤ true + εN`` w.h.p. for ``w = ⌈e/ε⌉``. The
  report joins the exact counts back in so the driver's oracle
  hash-checks both the estimates AND the one-sided error invariant.
- Hashing is the md5-derived engine-portable tier, so DuckDB
  reproduces every bucket bit-identically; production flips to
  ``xxhash64`` (same plan, one expression swap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from semantic_ann_in_data_lake_spark.functions.hashing import (
    fast_hash64,
    portable_hash64,
)


def _bucket(key: Column, depth: int, width: int, portable: bool) -> Column:
    h = (
        portable_hash64(key, seed=f"cms{depth}:")
        if portable
        else fast_hash64(key, seed=depth)
    )
    return F.pmod(h, F.lit(width)).cast("int")


def _coords(key: Column, depth: int, width: int, portable: bool) -> Column:
    """The exploded (depth, bucket) coordinate array — ONE definition
    shared by the sketch build and the probe so their layouts can never
    silently diverge (est >= true depends on them agreeing)."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("depth"),
                _bucket(key, d, width, portable).alias("bucket"),
            )
            for d in range(depth)
        ]
    )


def cms_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 512,
    portable: bool = True,
) -> DataFrame:
    """Build the ``d × w`` count-min table: one row per non-empty
    (depth, bucket) cell — at most ``depth·width`` rows total."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; got {depth}×{width}")
    key = F.col(key_col).cast("string")
    coords = _coords(key, depth, width, portable)
    return (
        df.where(F.col(key_col).isNotNull())
        .select(F.explode(coords).alias("c"))
        .groupBy(F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    depth: int = 3,
    width: int = 512,
    portable: bool = True,
) -> DataFrame:
    """Top-``k`` keys by count-min ESTIMATE, with the exact count and
    the one-sided-error invariant alongside.

    Returns ``(key, est_count, true_count, overestimate)`` ordered by
    (est desc, key asc) — ``overestimate = est - true ≥ 0`` always,
    which the oracle twin hash-verifies. ``true_count`` is exact here
    (candidate set = distinct keys at test scale); the sketch itself
    never depends on key cardinality.
    """
    sketch = cms_sketch(df, key_col, depth=depth, width=width, portable=portable)

    key = F.col(key_col).cast("string")
    truth = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(key.alias("key"))
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    probes = truth.select(
        "key",
        "true_count",
        F.explode(_coords(F.col("key"), depth, width, portable)).alias("c"),
    ).select("key", "true_count", F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket"))

    est = (
        probes.join(F.broadcast(sketch), ["depth", "bucket"])
        .groupBy("key", "true_count")
        .agg(F.min("cnt").alias("est_count"))
    )
    return (
        est.select(
            "key",
            "est_count",
            "true_count",
            (F.col("est_count") - F.col("true_count")).alias("overestimate"),
        )
        .orderBy(F.col("est_count").desc(), F.col("key").asc())
        .limit(k)
    )
