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


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (Flajolet et al. 2007) — the
# cardinality sibling of the count-min frequency sketch above, and the
# standalone form of the register machinery `operators/graphrank.hyperanf`
# already uses for neighborhood functions.
# ---------------------------------------------------------------------------

#: register count and the standard HLL bias constant α₆₄
HLL_M = 64
HLL_ALPHA = 0.709


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    seed: str = "hll:",
    portable: bool = True,
) -> DataFrame:
    """Sparse HLL register table per group: ``(*group_cols, pos, val)``
    with one row per TOUCHED register (``val`` = max ρ seen there) —
    at most ``m=64`` rows per group regardless of cardinality.

    Spark shape: one scan, coordinates generated in whole-stage
    codegen, one partial-aggregating groupBy((group, pos), max) — the
    shuffle moves at most ``m`` rows per input partition per group.
    Sketches are MERGEABLE by construction: union two register tables
    and re-take the max (:func:`hll_merge`) — shard-then-merge equals
    sketch-of-the-whole exactly (pinned in pytest).

    Engine discipline (same convention as `graphrank.hyperanf`): the
    hash is the md5-derived portable 60-bit tier (``portable=False``
    flips to 60-bit-masked xxhash64 — the CMS convention's codegen'd
    production tier, same register arithmetic, not oracle-portable);
    ``pos = h % 64``; ``val = 55 − len(bin(h >> 6))`` — the
    ``h >> 6 = 0`` corner folds to 54, one short of the true ρ,
    deterministically in both engines. NULL keys are skipped (a NULL
    is no observation)."""
    key = F.col(key_col).cast("string")
    if portable:
        h = portable_hash64(key, seed=seed)
    else:
        # production tier: xxhash64 (whole-stage codegen, no md5 string
        # round-trip), masked to the same 60-bit range so pos/ρ
        # arithmetic — and therefore estimator behavior — is identical
        # to the oracle-portable tier
        h = fast_hash64(key).bitwiseAND(F.lit((1 << 60) - 1))
    return (
        df.where(key.isNotNull())
        .select(
            *group_cols,
            F.pmod(h, F.lit(HLL_M)).cast("int").alias("pos"),
            (F.lit(55) - F.length(F.bin(F.shiftright(h, 6))))
            .cast("int")
            .alias("__rho"),
        )
        .groupBy(*group_cols, "pos")
        .agg(F.max("__rho").cast("int").alias("val"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union register tables (same schema) and re-take the per-(group,
    pos) max — the HLL merge. Associative and idempotent, so shard
    sketches combine in any order/tree shape."""
    if not register_tables:
        raise ValueError("at least one register table required")
    merged = register_tables[0]
    for t in register_tables[1:]:
        merged = merged.unionByName(t)
    keys = [c for c in merged.columns if c != "val"]
    return merged.groupBy(*keys).agg(F.max("val").cast("int").alias("val"))


def hll_estimate(
    registers: DataFrame,
    group_cols: tuple[str, ...] = (),
    round_dp: int = 2,
) -> DataFrame:
    """Raw HLL estimate per group from a register table:
    ``α·m² / (Σ_touched 2^(−val) + (m − touched))`` — untouched
    registers contribute 2⁰ = 1 each. Powers of two are EXACT doubles,
    so the ≤64-term sum is order-independent and the rounded estimate
    is cross-engine hash-stable. Deliberately NO ln-based small/large-
    range correction: ln is not ulp-portable across engines; the gate
    pins the MECHANISM and reports the exact twin alongside (accuracy
    bands live in pytest)."""
    z_touched = F.sum(
        F.lit(1.0) / F.expr("shiftleft(cast(1 as bigint), val)")
    )
    touched = F.count(F.lit(1))
    return (
        registers.groupBy(*group_cols)
        .agg(
            F.round(
                F.lit(HLL_ALPHA * HLL_M * HLL_M)
                / (z_touched + (F.lit(HLL_M) - touched)),
                round_dp,
            ).alias("n_est")
        )
    )
