"""Lake-wide joinable-column discovery — the reference's headline
scenario (profile → describe → embed → kNN → candidate join pairs,
``semlink.py:11-32``) run over the ACTUAL lake tables, not a
pre-embedded fixture.

Stages (all lazy, one program):

1. ``column_catalog``: per table ONE wide aggregation computing row
   count, per-column distinct counts and null counts (the profiler's
   shape — no per-column re-scan), exploded into one row per column
   with a serialized description string. ``countDistinct`` is the
   gate-exact tier; swap ``approx_count_distinct`` at 100 TB (same
   plan shape, documented divergence).
2. hash-embed the description (`annotate.embedder.hash_embedding_expr`
   — the deterministic twin of the model embedder, oracle-checkable).
3. cross-table kNN: column pairs from DIFFERENT tables ranked by
   squared-L2 over the embeddings (sequential fold semantics, 6-dp
   rounding, id tie-break — the engine-portable distance discipline).

The column count is O(lake schema), thousands at most — the pair join
is tiny; all the data-proportional work is stage 1's aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semantic_ann_in_data_lake_spark.annotate.embedder import hash_embedding_expr
from semantic_ann_in_data_lake_spark.cache import scoped_persist
from semantic_ann_in_data_lake_spark.functions.vectors import l2_sq


def column_catalog(
    spark: SparkSession, sf_dir: str, tables: list[str]
) -> DataFrame:
    """One row per (table, column): (col_key, table_name, desc) where
    desc = 'table.col n=<rows> distinct=<d> nulls=<nulls>'."""
    from semantic_ann_in_data_lake_spark.sources.readers import read_table

    outs = []
    for t in tables:
        df = read_table(spark, sf_dir, t)
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in df.columns:
            aggs.append(F.countDistinct(F.col(c)).alias(f"__d_{c}"))
            aggs.append(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__u_{c}")
            )
        row = df.agg(*aggs)
        per_col = [
            F.struct(
                F.lit(f"{t}.{c}").alias("col_key"),
                F.lit(t).alias("table_name"),
                F.concat(
                    F.lit(f"{t}.{c} n="),
                    F.col("__n").cast("string"),
                    F.lit(" distinct="),
                    F.col(f"__d_{c}").cast("string"),
                    F.lit(" nulls="),
                    F.coalesce(F.col(f"__u_{c}"), F.lit(0)).cast("string"),
                ).alias("desc"),
            )
            for c in df.columns
        ]
        outs.append(
            row.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def discover_joinable_columns(
    spark: SparkSession,
    sf_dir: str,
    tables: list[str],
    dim: int = 16,
    k: int = 3,
) -> DataFrame:
    """Top-k nearest cross-table column candidates per column:
    (query_col, cand_col, distance, rank)."""
    cat = column_catalog(spark, sf_dir, tables)
    # persist: the embedded catalog feeds BOTH sides of the pair
    # self-join, and Catalyst does not CSE across join branches — without
    # this every table is profiled twice (8 scans for 4 tables, observed)
    emb = scoped_persist(
        cat.select(
            "col_key", "table_name", hash_embedding_expr("desc", dim).alias("e")
        )
    )
    a = emb.select(
        F.col("col_key").alias("query_col"),
        F.col("table_name").alias("qt"),
        F.col("e").alias("qe"),
    )
    b = emb.select(
        F.col("col_key").alias("cand_col"),
        F.col("table_name").alias("ct"),
        F.col("e").alias("ce"),
    )
    pairs = a.join(b, F.col("qt") != F.col("ct")).select(
        "query_col",
        "cand_col",
        F.round(l2_sq("qe", "ce"), 6).alias("distance"),
    )
    w = Window.partitionBy("query_col").orderBy(
        F.col("distance").asc(), F.col("cand_col").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_col", "cand_col", "distance", "rank")
    )


def value_overlap_discovery(
    col_values: DataFrame,
    threshold: float = 0.5,
    max_value_df: int = 10_000,
) -> DataFrame:
    """Containment-based joinable-column discovery (the JOSIE /
    SilkMoth formulation): columns A, B are join candidates when
    containment |values(A) ∩ values(B)| / |values(A)| ≥ threshold.

    The VALUE-side complement of the semantic (embedding) discovery
    above — FK→PK edges score containment 1.0 regardless of how the
    columns are named, which is exactly the case name-based and
    embedding-based discovery can miss.

    ``col_values`` has one row per (table_name, column_name, value),
    values pre-cast to string. Returns
    ``(query_table, query_column, cand_table, cand_column,
    n_query_distinct, n_overlap, containment)`` for cross-table pairs
    clearing the threshold, containment rounded to 6 dp.

    Scale design (100 TB):

    - One distinct pass builds the posting table; column sizes are one
      groupBy on (table, column) — both AQE-coalescible equi-shuffles.
    - The candidate join is the posting-list self-join keyed by VALUE.
      Its only blowup is ubiquitous values ('0', 'true', '') whose
      posting lists approach the lake's column count; ``max_value_df``
      caps the per-value fan-out by dropping values present in more
      than that many columns BEFORE the join (the standard stopword
      cut in set-overlap discovery; with the default cap nothing is
      dropped at test scale). Dropped values can only LOWER measured
      containment, never invent a pair — precision is preserved.
    - Overlap counting is a groupBy on the 4-part column-pair key;
      nothing is ever quadratic in rows, only in columns SHARING a
      value (the quantity the cap bounds).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if max_value_df < 2:
        raise ValueError(f"max_value_df must be >= 2, got {max_value_df}")

    vals = scoped_persist(
        col_values.where(F.col("value").isNotNull())
        .select("table_name", "column_name", "value")
        .distinct()
    )
    sizes = vals.groupBy("table_name", "column_name").agg(
        F.count(F.lit(1)).alias("n_distinct")
    )
    capped = (
        vals.groupBy("value")
        .agg(F.count(F.lit(1)).alias("vdf"))
        .where(F.col("vdf") <= max_value_df)
        .select("value")
    )
    posts = vals.join(capped, "value")
    a = posts.select(
        "value",
        F.col("table_name").alias("query_table"),
        F.col("column_name").alias("query_column"),
    )
    b = posts.select(
        "value",
        F.col("table_name").alias("cand_table"),
        F.col("column_name").alias("cand_column"),
    )
    overlap = (
        a.join(b, "value")
        .where(F.col("query_table") != F.col("cand_table"))
        .groupBy("query_table", "query_column", "cand_table", "cand_column")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        overlap.join(
            sizes.withColumnsRenamed(
                {"table_name": "query_table", "column_name": "query_column"}
            ),
            ["query_table", "query_column"],
        )
        # threshold compare on the INTEGER counts (overlap >= tau·n):
        # a 6-dp-rounded ratio drops pairs at non-representable taus
        # (1/3) and zeroes out small containments past ~2M distinct
        # values — the rounded column is display only
        .where(
            F.col("n_overlap").cast("double")
            >= F.lit(threshold) * F.col("n_distinct").cast("double")
            - F.lit(1e-9)
        )
        .withColumn(
            "containment",
            F.round(F.col("n_overlap") / F.col("n_distinct"), 6),
        )
        .select(
            "query_table",
            "query_column",
            "cand_table",
            "cand_column",
            F.col("n_distinct").alias("n_query_distinct"),
            "n_overlap",
            "containment",
        )
    )
