"""Skew-aware join utilities.

AQE's skew-join splitting (enabled in session.py) handles MODERATE skew
by splitting oversized shuffle partitions, but it only helps
sort-merge joins and only after the skewed partition materializes. For
a join where a handful of keys dominate (the power-law reality of
user/event data at 100 TB), explicit SALTING reshapes the problem
before the shuffle: the skewed side's hot keys spread across
``salt_factor`` sub-keys, and the other side replicates its matching
rows ``salt_factor`` times, so no single task ever receives a whole hot
key.

``salted_join`` here salts ONLY a declared hot-key set (replicating
the entire build side for a handful of hot keys is wasted work): hot
keys route through the salted join, the long tail through a plain
join, and the two unions back together. The blanket-salting tier —
every key salted, whole build side replicated — lives in
``functions.skew`` (right when the build side is tiny and skew is
pervasive); ``functions.skew.two_stage_agg`` covers skewed
AGGREGATIONS rather than joins. Hot keys are either passed explicitly
(from domain knowledge / a prior profiling run — at scale that list is
computed once a day, not per query) or detected with a bounded
top-frequency scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_hot_keys(
    df: DataFrame, key: str, threshold: int, max_keys: int = 64
) -> list:
    """Keys whose row count exceeds ``threshold`` (bounded at
    ``max_keys`` — a skew list is a handful of heads, not a histogram).
    One partial-aggregating count + a distributed top-k: the driver
    receives at most ``max_keys`` scalars."""
    rows = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > threshold)
        .orderBy(F.col("__n").desc(), F.col(key).asc())
        .limit(max_keys)
        .collect()
    )
    return [r[key] for r in rows]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_factor: int = 8,
    hot_keys: list | None = None,
    hot_threshold: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to heavy key skew on the LEFT side.

    Hot-key rows on the left get a random-but-deterministic salt in
    [0, salt_factor) (hash of a unique row ordinal — reproducible, no
    rand()); the right side's hot-key rows replicate once per salt
    value. Cold keys join unsalted. Output = plain ``left.join(right,
    key, how)`` semantics, verified by the equivalence test.

    Only inner/left joins are offered: a salted right/full join would
    emit one null-extended row PER SALT for unmatched right rows.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if hot_keys is None:
        if hot_threshold is None:
            raise ValueError("pass hot_keys or hot_threshold")
        hot_keys = detect_hot_keys(left, key, hot_threshold)
    if not hot_keys:
        return left.join(right, key, how)

    is_hot = F.col(key).isin(hot_keys)
    # Per-row salt = hash(content, per-row ordinal). Content-only
    # hashing would send every copy of an identical duplicate row — the
    # boilerplate-heavy hot-key reality salting exists for — into ONE
    # bucket, re-creating the skew. Mixing monotonically_increasing_id
    # scatters identical rows too; the salted side is persisted so a
    # shuffle retry replays the same assignment instead of recomputing
    # a different one. (Salt choice never affects the OUTPUT rows —
    # the right side replicates into every salt value — only their
    # physical distribution across reducers.)
    from semantic_ann_in_data_lake_spark.cache import scoped_persist

    salt = F.pmod(
        F.xxhash64(
            F.monotonically_increasing_id(), *[F.col(c) for c in left.columns]
        ),
        F.lit(salt_factor),
    )
    l_hot = scoped_persist(left.where(is_hot).withColumn("__salt", salt))
    l_cold = left.where(~is_hot | F.col(key).isNull())
    r_hot = (
        right.where(is_hot)
        .withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))))
        .withColumn("__salt", F.col("__salt").cast("long"))
    )
    r_cold = right.where(~is_hot | F.col(key).isNull())

    hot_joined = l_hot.join(r_hot, on=[key, "__salt"], how=how).drop("__salt")
    cold_joined = l_cold.join(r_cold, on=key, how=how)
    return hot_joined.unionByName(cold_joined)


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    eps,
    on: list[str] | None = None,
) -> DataFrame:
    """Proximity (band) join: pairs with ``|left_val − right_val| ≤
    eps``, optionally under equi-keys ``on``.

    The naive form is an inequality theta-join — Spark executes those
    as BroadcastNestedLoopJoin (O(|L|·|R|) pair evaluations). Here both
    sides bucket by ``floor(val / eps)``; ``|a − b| ≤ eps`` implies the
    buckets differ by at most 1, so the right side replicates into its
    bucket ±1 (3× one side, NOT |L|·|R|), the join is a plain hash
    equi-join on (keys…, bucket), and the exact band predicate filters
    residuals. Each qualifying pair matches exactly once (the left
    row's single bucket hits one of the right row's three replicas).
    Same shape DuckDB's IEJoin and range-interval joins optimize to;
    timestamps should be pre-converted with functions.dates.epoch_us.
    """
    try:
        eps_ok = float(eps) > 0
    except (TypeError, ValueError):
        eps_ok = False
    if not eps_ok:
        # eps=0 would divide by zero in the bucket expr (null bands →
        # silently zero rows); negative eps breaks the bucket ±1
        # containment proof. Fail loudly instead.
        raise ValueError(f"band_join requires eps > 0, got {eps!r}")
    on = list(on or [])
    lb = left.withColumn(
        "__band", F.floor(F.col(left_val) / F.lit(eps)).cast("long")
    )
    r_band = F.floor(F.col(right_val) / F.lit(eps)).cast("long")
    rb = (
        right.withColumn("__d", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("__band", r_band + F.col("__d"))
        .drop("__d")
    )
    return (
        lb.join(rb, on=on + ["__band"], how="inner")
        .where(F.abs(F.col(left_val) - F.col(right_val)) <= F.lit(eps))
        .drop("__band")
    )


def join_size_estimate(
    left: DataFrame, right: DataFrame, on: str
) -> DataFrame:
    """Pre-flight equi-join planning: EXACT output size and skew
    profile of ``left ⋈ right`` WITHOUT running the join — the numbers
    that decide broadcast vs shuffle vs salting before a 100-TB
    shuffle is committed.

    Both sides collapse to per-key counts (partial-aggregating
    groupBys, shuffle = |distinct keys|); the count tables join and
    fold to one row:

    ``(matched_keys, join_rows, max_key_fanout, top_key)`` — join_rows
    is Σ cL·cR (the exact inner-join cardinality), max_key_fanout the
    largest single-key contribution (the skew headline: one task's
    minimum work in a plain shuffle join), top_key the key that causes
    it (the input ``detect_hot_keys``/``salted_join`` wants).

    Products accumulate in DECIMAL: two power-law sides can overflow
    int64 (1e10 × 1e9 rows on one hot key).
    """
    lc = left.groupBy(F.col(on).alias("__k")).agg(
        F.count(F.lit(1)).alias("__cl")
    )
    rc = right.groupBy(F.col(on).alias("__k")).agg(
        F.count(F.lit(1)).alias("__cr")
    )
    per_key = lc.join(rc, "__k").select(
        "__k",
        (
            F.col("__cl").cast("decimal(38,0)")
            * F.col("__cr").cast("decimal(38,0)")
        ).alias("__rows"),
    )
    # argmax via max(struct): struct comparison is lexicographic on
    # (rows, key-string), so ties break on the key — deterministic in
    # BOTH engines, where a bare max_by/arg_max would be tie-arbitrary
    top = F.max(
        F.struct(
            F.col("__rows").alias("r"), F.col("__k").cast("string").alias("k")
        )
    )
    return per_key.agg(
        F.count(F.lit(1)).alias("matched_keys"),
        F.coalesce(F.sum("__rows"), F.lit(0)).cast("decimal(38,0)").alias(
            "join_rows"
        ),
        F.coalesce(F.max("__rows"), F.lit(0)).cast("decimal(38,0)").alias(
            "max_key_fanout"
        ),
        top.alias("__top"),
    ).select(
        "matched_keys",
        "join_rows",
        "max_key_fanout",
        F.col("__top.k").alias("top_key"),
    )
