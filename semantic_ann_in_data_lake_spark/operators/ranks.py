"""Distributed global ranking + equi-depth histogram.

``Window.orderBy(...)`` with no partition key funnels the whole table
through ONE task — the classic Spark scale trap. These operators
compute exact global row numbers with the same distributed-prefix-sum
shape as ``operators/packing.py``: range-partition on the sort key,
one per-partition window (parallel), a partition-count-sized totals
frame, and a broadcast offsets join. One range shuffle total; nothing
data-sized ever passes through a single task.

Extension beyond the reference surface (its profiling is per-column
min/max/avg, ``ProfileDataLake/extract_schema.py:61-77``): equi-depth
histograms are the quantile-accurate profile a cost-based layer needs
for range-skew diagnostics at lake scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semantic_ann_in_data_lake_spark.cache import scoped_persist


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row number by ``order_cols`` (ties broken by
    the full key tuple — pass a unique last key for determinism),
    without a single-partition window.

    Cost: one range shuffle + one tiny (n_partitions-row) aggregate.
    """
    reserved = {"__pid", "__local_rn", "__offset"} & set(df.columns)
    if reserved:
        # withColumn would silently REPLACE (then drop) caller columns
        raise ValueError(f"df carries reserved internal columns: {sorted(reserved)}")
    keys = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *keys)
        if num_partitions
        else df.repartitionByRange(*keys)
    )
    part = ranged.withColumn("__pid", F.spark_partition_id())
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*[k.asc() for k in keys])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # feeds both the totals aggregate and the final join — persist so
    # the scan + range exchange run once (Catalyst has no cross-branch
    # CSE; same note as packing.py)
    local = scoped_persist(
        part.withColumn("__local_rn", F.count(F.lit(1)).over(w_local))
    )
    totals = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__ptot"))
    w_off = (
        Window.orderBy(F.col("__pid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.withColumn(
        "__offset", F.sum("__ptot").over(w_off) - F.col("__ptot")
    ).select("__pid", "__offset")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__local_rn") + F.col("__offset")).cast("long"))
        .drop("__pid", "__local_rn", "__offset")
    )


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    buckets: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact equi-depth histogram: ``buckets`` quantile buckets of
    ``value_col`` with per-bucket count and [lo, hi] bounds.

    Bucket assignment is ``(rn - 1) * buckets div n`` over the exact
    global row number — integer arithmetic end to end, so the split is
    reproducible cross-engine (unlike ntile, whose remainder placement
    is engine-defined). The count column is ~n/buckets by construction;
    lo/hi expose the actual value range per depth slice.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    # NULLs excluded: left in, they rank first and consume bucket
    # depth while staying invisible in lo/hi (min/max skip them)
    ranked = global_row_number(
        df.select(value_col, tie_col)
        .where(F.col(value_col).isNotNull()),
        [value_col, tie_col],
        num_partitions=num_partitions,
    )
    n_total = ranked.groupBy().agg(F.max("rn").alias("__n"))
    return (
        ranked.join(F.broadcast(n_total))
        .withColumn(
            "bucket",
            F.expr(f"(rn - 1L) * {int(buckets)}L div __n").cast("int"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min(value_col).cast("decimal(18,2)"), 2)
            .cast("double")
            .alias("lo"),
            F.round(F.max(value_col).cast("decimal(18,2)"), 2)
            .cast("double")
            .alias("hi"),
        )
    )


def winsorized_mean(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    lower_q: float = 0.05,
    upper_q: float = 0.95,
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT winsorized mean: clamp ``value_col`` to its [lower_q,
    upper_q] quantiles (value at global rank ⌈q·n⌉ — the exact
    definition, not an approx-percentile sketch) and average the
    clamped values.

    Returns one row ``(n, lo, hi, winsorized_mean, raw_mean)``. The
    quantile lookup reuses the distributed prefix-sum rank — one range
    shuffle; the two bound rows broadcast into the clamp expression.
    Means accumulate in DECIMAL then divide in double (engine-portable
    discipline; 4 dp)."""
    if not (0.0 <= lower_q < upper_q <= 1.0):
        raise ValueError(f"need 0 <= lower_q < upper_q <= 1, got {lower_q}, {upper_q}")
    # NULL contract: NULL values are EXCLUDED up front. Left in, they
    # rank first, so the lower-quantile rank can select a NULL row
    # whose value min() then skips — collapsing lo to hi and clamping
    # every value to the upper bound; raw_mean would also divide a
    # null-skipping sum by an all-rows count.
    ranked = scoped_persist(
        global_row_number(
            df.select(value_col, tie_col)
            .where(F.col(value_col).isNotNull()),
            [value_col, tie_col],
            num_partitions=num_partitions,
        )
    )
    n_total = ranked.groupBy().agg(F.max("rn").alias("__n"))
    # quantile rank = max(ceil(n·q − 1e-9), 1): the floor keeps
    # lower_q=0 anchored at rank 1 (ceil(0)=0 matches no row — the
    # bounds frame would then hold only the upper value and every row
    # would clamp to it), and the 1e-9 bias keeps an exact-integer n·q
    # from ceiling one rank high when the double product lands an ulp
    # above (25·0.28 → 7.000000000000001).
    def _qrank(q: float):
        return F.greatest(
            F.ceil(F.col("__n") * F.lit(q) - F.lit(1e-9)), F.lit(1)
        )

    bounds = (
        ranked.join(F.broadcast(n_total))
        .where(
            (F.col("rn") == _qrank(lower_q))
            | (F.col("rn") == _qrank(upper_q))
        )
        .groupBy()
        .agg(
            F.min(value_col).alias("__lo"),
            F.max(value_col).alias("__hi"),
        )
    )
    v = F.col(value_col).cast("decimal(18,2)")
    clamped = F.least(
        F.greatest(v, F.col("__lo").cast("decimal(18,2)")),
        F.col("__hi").cast("decimal(18,2)"),
    )
    return (
        ranked.join(F.broadcast(bounds))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("__lo").cast("decimal(18,2)"), 2)
            .cast("double")
            .alias("lo"),
            F.round(F.max("__hi").cast("decimal(18,2)"), 2)
            .cast("double")
            .alias("hi"),
            F.round(F.sum(clamped), 2).cast("double").alias("__wsum"),
            F.round(F.sum(v), 2).cast("double").alias("__rsum"),
        )
        .select(
            "n",
            "lo",
            "hi",
            F.round(F.col("__wsum") / F.col("n") + F.lit(1e-9), 4).alias(
                "winsorized_mean"
            ),
            F.round(F.col("__rsum") / F.col("n") + F.lit(1e-9), 4).alias(
                "raw_mean"
            ),
        )
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    query_col: str = "query_id",
    cand_col: str = "cand_id",
    rank_col: str = "rank",
    k_const: int = 60,
    topk: int = 5,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked candidate lists — the
    standard way hybrid retrieval merges a lexical ranking (BM25 /
    Jaccard) with a semantic one (embedding similarity):
    ``score = Σ_lists 1 / (k_const + rank)`` (Cormack et al.'s RRF,
    k=60 the conventional constant).

    Inputs carry ``(query_col, cand_col, rank_col)``; a candidate
    absent from one list contributes 0 for it (full-outer semantics).
    Returns ``(query, cand, rank_a, rank_b, rrf_score, rank)`` with
    the fused rank per query, ``rrf_score`` rounded to 6 dp and ties
    broken by candidate id — deterministic across engines and
    partitionings.

    Scale: one equi-shuffle on (query, cand) for the fusion join, one
    per-QUERY ranking window (never global). The upstream lists are
    top-N bounded, so the fused table is at most 2N per query.
    """
    a = ranked_a.select(
        F.col(query_col).alias("__q"),
        F.col(cand_col).alias("__c"),
        F.col(rank_col).alias("rank_a"),
    )
    b = ranked_b.select(
        F.col(query_col).alias("__q"),
        F.col(cand_col).alias("__c"),
        F.col(rank_col).alias("rank_b"),
    )
    fused = a.join(b, ["__q", "__c"], "full_outer").withColumn(
        "rrf_score",
        F.round(
            F.coalesce(1.0 / (F.lit(k_const) + F.col("rank_a")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k_const) + F.col("rank_b")), F.lit(0.0)),
            6,
        ),
    )
    w = Window.partitionBy("__q").orderBy(
        F.col("rrf_score").desc(), F.col("__c").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select(
            F.col("__q").alias(query_col),
            F.col("__c").alias(cand_col),
            "rank_a",
            "rank_b",
            "rrf_score",
            "rank",
        )
    )
