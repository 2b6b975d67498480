"""Driver-facing query registry: every implemented operator as a
(spark_fn, oracle_sql) pair.

Each entry's Spark side composes operators from the package; the oracle
side is ANSI-ish SQL DuckDB runs on the same parquet views. Column
names/types are aligned on both sides because the driver's comparator
hashes values under sorted column names.

Cross-engine float discipline (applies to every entry):
- money aggregates accumulate in DECIMAL (exact), round, then cast to
  DOUBLE — parallel double summation is order-nondeterministic in BOTH
  engines, decimals are not;
- vector distances fold sequentially in array order (bit-identical),
  are rounded to 6 dp, and ranking windows order by the ROUNDED value
  with an id tie-break;
- integer-valued doubles (counts, exact-int sums) are safe unrounded.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semantic_ann_in_data_lake_spark.functions.vectors import (
    cosine_sim_sql,
    l2_sq_sql,
)
from semantic_ann_in_data_lake_spark.operators import profiler
from semantic_ann_in_data_lake_spark.operators.evaluation import (
    ndcg_at_k,
    pair_metrics_df,
    symmetric_truth,
)
from semantic_ann_in_data_lake_spark.operators.knn import knn_join, threshold_join
from semantic_ann_in_data_lake_spark.plans import pipeline

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (spark_fn, oracle_sql_or_None)
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from semantic_ann_in_data_lake_spark.sources.readers import read_table

    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Profiling (reference SchemaExtraction — SURVEY §2.4 A1-A5, A11)
# ---------------------------------------------------------------------------

_PROFILE_TYPES = {
    "customer": [
        ("c_custkey", "integer"),
        ("c_name", "string"),
        ("c_nationkey", "integer"),
        ("c_acctbal", "float"),
        ("c_mktsegment", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "integer"),
        ("l_partkey", "integer"),
        ("l_suppkey", "integer"),
        ("l_linenumber", "integer"),
        ("l_quantity", "float"),
        ("l_extendedprice", "float"),
        ("l_discount", "float"),
        ("l_tax", "float"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "datetime"),
    ],
}


def _profile_oracle(table: str) -> str:
    parts = []
    for c, reftype in _PROFILE_TYPES[table]:
        parts.append(
            f"""
            SELECT '{table}' AS table_name, '{c}' AS column_name,
                   '{reftype}' AS col_type,
                   count(*) AS row_count,
                   count(*) - count({c}) AS n_nulls,
                   count({c}) AS num_values,
                   coalesce(min(length({c}::VARCHAR)), 0)::INT AS min_length,
                   coalesce(max(length({c}::VARCHAR)), 0)::INT AS max_length,
                   coalesce(round(avg(length({c}::VARCHAR)), 2), 0.0) AS avg_length
            FROM {table}"""
        )
    return " UNION ALL ".join(parts)


@register("profile_customer", _profile_oracle("customer"))
def profile_customer(spark, sf_dir):
    return profiler.profile(_t(spark, sf_dir, "customer"), "customer")


@register("profile_lineitem", _profile_oracle("lineitem"))
def profile_lineitem(spark, sf_dir):
    return profiler.profile(_t(spark, sf_dir, "lineitem"), "lineitem")


@register(
    "distinct_sample_orders",
    """
    SELECT 'orders' AS table_name, 'o_orderstatus' AS column_name,
           list_slice(list_sort(list(DISTINCT o_orderstatus::VARCHAR)), 1, 30)
               AS values_sample
    FROM orders WHERE o_orderstatus IS NOT NULL
    UNION ALL
    SELECT 'orders', 'o_orderpriority',
           list_slice(list_sort(list(DISTINCT o_orderpriority::VARCHAR)), 1, 30)
    FROM orders WHERE o_orderpriority IS NOT NULL
    """,
)
def distinct_sample_orders(spark, sf_dir):
    return profiler.distinct_sample(
        _t(spark, sf_dir, "orders"), "orders", ["o_orderstatus", "o_orderpriority"], 30
    )


@register(
    "most_common_events",
    """
    WITH counted AS (
      SELECT event_type::VARCHAR AS value, count(*) AS cnt
      FROM events WHERE event_type IS NOT NULL GROUP BY 1
    ), ranked AS (
      SELECT value, cnt,
             row_number() OVER (ORDER BY cnt DESC, value ASC) AS rnk
      FROM counted
    )
    SELECT 'events' AS table_name, 'event_type' AS column_name,
           value, cnt, rnk::INT AS rank
    FROM ranked WHERE rnk <= 20
    """,
)
def most_common_events(spark, sf_dir):
    return profiler.most_common_values(
        _t(spark, sf_dir, "events"), "events", ["event_type"], 20
    )


_ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@register(
    "row_counts",
    " UNION ALL ".join(
        f"SELECT '{t}' AS table_name, count(*) AS row_count FROM {t}"
        for t in _ALL_TABLES
    ),
)
def row_counts(spark, sf_dir):
    from functools import reduce

    parts = [
        _t(spark, sf_dir, t).agg(
            F.lit(t).alias("table_name"), F.count(F.lit(1)).alias("row_count")
        )
        for t in _ALL_TABLES
    ]
    return reduce(DataFrame.unionByName, parts)


# ---------------------------------------------------------------------------
# Relational aggregation / windows over the TPC-H-ish tables
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity::DECIMAL(18,2)), 2)::DOUBLE AS sum_qty,
           round(sum(l_extendedprice::DECIMAL(18,2)), 2)::DOUBLE AS sum_base_price,
           round(sum(l_extendedprice::DECIMAL(18,2)
                     * (1 - l_discount::DECIMAL(18,2))), 2)::DOUBLE AS sum_disc_price,
           round(sum(l_quantity::DECIMAL(18,2))::DOUBLE / count(*), 2) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(
                F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))), 2
            ).cast("double").alias("sum_disc_price"),
            F.round(
                F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1)), 2
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "window_topk_orders",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, rnk::INT AS rank
    FROM ranked WHERE rnk <= 3
    """,
)
def window_topk_orders(spark, sf_dir):
    """W2 generic form: per-group top-k via ranking window."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


# ---------------------------------------------------------------------------
# kNN similarity join (reference J6/V7-V9) + threshold + full evaluation
# ---------------------------------------------------------------------------

_KNN_L2_SQL = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             round({l2_sq_sql('q.v', 'c.v')}, 6) AS distance
      FROM e q, e c WHERE q.vec_id <> c.vec_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY distance ASC, cand_id ASC) AS rnk
      FROM pairs
    )
    SELECT query_id, cand_id, distance, rnk::INT AS rank
    FROM ranked WHERE rnk <= {{k}}
"""


@register("knn_exact_l2", _KNN_L2_SQL.format(k=5))
def knn_exact_l2(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return knn_join(emb, emb, k=5, strategy="exact")


@register("knn_broadcast_l2", _KNN_L2_SQL.format(k=5))
def knn_broadcast_l2(spark, sf_dir):
    """Strategy (b) must agree bit-for-bit with strategy (a) on exact
    metrics — same oracle as knn_exact_l2 proves it."""
    emb = _t(spark, sf_dir, "embeddings")
    return knn_join(emb, emb, k=5, strategy="broadcast")


@register(
    "knn_topk_cosine",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             round({cosine_sim_sql('q.v', 'c.v')}, 6) AS distance
      FROM e q, e c WHERE q.vec_id <> c.vec_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY distance DESC, cand_id ASC) AS rnk
      FROM pairs
    )
    SELECT query_id, cand_id, distance, rnk::INT AS rank
    FROM ranked WHERE rnk <= 10
    """,
)
def knn_topk_cosine(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return knn_join(emb, emb, k=10, metric="cosine", strategy="exact")


_TAU = 1.3


@register(
    "ann_threshold_join",
    _KNN_L2_SQL.format(k=25) + f" AND sqrt(distance) <= {_TAU}",
)
def ann_threshold_join(spark, sf_dir):
    """P7: joinable pairs = kNN(k=25) where sqrt(L2²) ≤ τ
    (`join_discoverer.py:303-325`)."""
    emb = _t(spark, sf_dir, "embeddings")
    return threshold_join(knn_join(emb, emb, k=25, strategy="exact"), _TAU)


_EVAL_SQL = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             round({l2_sq_sql('q.v', 'c.v')}, 6) AS distance
      FROM e q, e c WHERE q.vec_id <> c.vec_id
    ),
    knn AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY distance ASC, cand_id ASC) AS rnk
        FROM pairs) WHERE rnk <= {{k}}
    ),
    joinable AS (SELECT * FROM knn WHERE sqrt(distance) <= {{tau}}),
    disc AS (
      SELECT DISTINCT least(query_id::VARCHAR, cand_id::VARCHAR) AS lo,
                      greatest(query_id::VARCHAR, cand_id::VARCHAR) AS hi
      FROM joinable
    ),
    truth AS (
      SELECT DISTINCT least(a.vec_id::VARCHAR, b.vec_id::VARCHAR) AS lo,
                      greatest(a.vec_id::VARCHAR, b.vec_id::VARCHAR) AS hi
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    ),
    conf AS (
      SELECT
        count(*) FILTER (WHERE d.lo IS NOT NULL AND t.lo IS NOT NULL) AS tp,
        count(*) FILTER (WHERE d.lo IS NOT NULL AND t.lo IS NULL) AS fp,
        count(*) FILTER (WHERE d.lo IS NULL AND t.lo IS NOT NULL) AS fn
      FROM disc d FULL OUTER JOIN truth t USING (lo, hi)
    ),
    sym AS (
      SELECT a.vec_id AS tq, b.vec_id AS tc
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    scored AS (
      SELECT k.query_id, k.rnk,
             CASE WHEN s.tq IS NOT NULL THEN 1 ELSE 0 END AS rel
      FROM knn k LEFT JOIN sym s ON k.query_id = s.tq AND k.cand_id = s.tc
    ),
    dcg AS (
      SELECT query_id, sum(rel / log2(rnk + 1)) AS dcg
      FROM scored GROUP BY query_id
    ),
    nrel AS (SELECT tq AS query_id, count(*) AS n_rel FROM sym GROUP BY tq),
    ndcg AS (
      SELECT round(avg(CASE WHEN coalesce(n.n_rel, 0) > 0 THEN
        d.dcg / list_sum(list_transform(
          range(1, least({{k}}, n.n_rel) + 1), i -> 1.0 / log2(i + 1)))
        ELSE 0.0 END), 4) AS ndcg_at_k
      FROM dcg d LEFT JOIN nrel n USING (query_id)
    )
    SELECT {{k}} AS k, round(({{tau}})::DOUBLE, 2) AS tau, tp, fp, fn,
           round(tp / (tp + fp + 1e-8), 4) AS precision,
           round(tp / (tp + fn + 1e-8), 4) AS recall,
           round(2 * (tp / (tp + fp + 1e-8)) * (tp / (tp + fn + 1e-8))
                 / ((tp / (tp + fp + 1e-8)) + (tp / (tp + fn + 1e-8)) + 1e-8),
                 4) AS f1,
           ndcg_at_k
    FROM conf, ndcg
"""


@register("semlink_eval", _EVAL_SQL.format(k=10, tau=_TAU))
def semlink_eval(spark, sf_dir):
    """Flagship: the full discover+evaluate pipeline (reference §3.3)."""
    return pipeline.evaluate_discovery(spark, sf_dir, k=10, tau=_TAU, strategy="exact")


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
