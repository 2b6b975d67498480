"""Profiling / statistics / validation queries (SURVEY A1-A12).

Split from the single-file registry (round 4); the hub
`plans.registry` imports this module for its registration side
effects and re-exports every query function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_ann_in_data_lake_spark.plans.registry import register, _t

from semantic_ann_in_data_lake_spark.operators import profiler


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
           array_to_string(
             list_slice(list_sort(list(DISTINCT o_orderstatus::VARCHAR)), 1, 30),
             '|') AS values_sample
    FROM orders WHERE o_orderstatus IS NOT NULL
    UNION ALL
    SELECT 'orders', 'o_orderpriority',
           array_to_string(
             list_slice(list_sort(list(DISTINCT o_orderpriority::VARCHAR)), 1, 30),
             '|')
    FROM orders WHERE o_orderpriority IS NOT NULL
    """,
)
def distinct_sample_orders(spark, sf_dir):
    # Gated output serializes the sample array: the driver's canonicalizer
    # hashes sorted rows and cannot hash list cells. The operator itself
    # (profiler.distinct_sample) keeps the typed array.
    return profiler.distinct_sample(
        _t(spark, sf_dir, "orders"), "orders", ["o_orderstatus", "o_orderpriority"], 30
    ).withColumn("values_sample", F.array_join("values_sample", "|"))


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


@register(
    "profile_approx_distinct",
    """
    SELECT '' AS table_name, '' AS column_name, 0::BIGINT AS approx_n_distinct,
           0::BIGINT AS exact_n_distinct, 0.0 AS rel_err
    WHERE FALSE
    """,
)
def profile_approx_distinct(spark, sf_dir):
    """Sketch-based distinct counts (HLL++), exposed as the accuracy
    bound's violations: empty iff every column's estimate lies within
    15% (3× rsd) of the exact distinct count — deterministic on a
    fixed dataset, so the bound either holds reproducibly or fails
    loudly. Sketch values differ across engines by construction (the
    r2 `no_oracle` red); raw estimates via
    ``profiler.profile_approx_distinct``."""
    from semantic_ann_in_data_lake_spark.operators import checks

    return checks.approx_distinct_bound_violations(
        _t(spark, sf_dir, "orders"), "orders"
    )


_PROFILE_TYPES.update(
    {
        "region": [("r_regionkey", "integer"), ("r_name", "string")],
        "nation": [
            ("n_nationkey", "integer"),
            ("n_name", "string"),
            ("n_regionkey", "integer"),
        ],
        "supplier": [
            ("s_suppkey", "integer"),
            ("s_name", "string"),
            ("s_nationkey", "integer"),
            ("s_acctbal", "float"),
        ],
        "part": [
            ("p_partkey", "integer"),
            ("p_name", "string"),
            ("p_brand", "string"),
            ("p_type", "string"),
            ("p_size", "integer"),
            ("p_retailprice", "float"),
        ],
        "orders": [
            ("o_orderkey", "integer"),
            ("o_custkey", "integer"),
            ("o_orderstatus", "string"),
            ("o_totalprice", "float"),
            ("o_orderdate", "datetime"),
            ("o_orderpriority", "string"),
        ],
        "documents": [
            ("doc_id", "integer"),
            ("text", "string"),
            ("lang", "string"),
            ("source", "string"),
            ("n_chars", "integer"),
        ],
    }
)


_LAKE_TABLES = ["region", "nation", "supplier", "part", "orders", "documents"]


@register(
    "profile_lake_core",
    " UNION ALL ".join(_profile_oracle(t) for t in _LAKE_TABLES),
)
def profile_lake_core(spark, sf_dir):
    """Lake-wide catalog build (reference §3.1 entry point): one
    single-pass profile job per table, plan-level union — customer and
    lineitem are gated individually; vector/nanos tables are profiled
    via their scalar columns elsewhere."""
    tables = {t: _t(spark, sf_dir, t) for t in _LAKE_TABLES}
    return profiler.profile_lake(tables)




@register(
    "event_props_json_stats",
    """
    WITH kx AS (
      SELECT event_type,
             try_cast(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           count(k) AS n_with_k,
           sum(k)::BIGINT AS k_sum,
           min(k) AS k_min,
           max(k) AS k_max
    FROM kx GROUP BY 1
    """,
)
def event_props_json_stats(spark, sf_dir):
    """F9-F11 over a fact table: semi-structured JSON property
    extraction (`get_json_object`, JVM-side) aggregated per event type —
    the common clickstream-props pattern; no Python, no parsing UDF."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(k).alias("n_with_k"),
        F.sum(k).alias("k_sum"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
    )


@register(
    "profile_percentiles_lineitem",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25) + 1e-9, 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.50) + 1e-9, 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.75) + 1e-9, 4) AS p75,
           round(quantile_cont(l_extendedprice, 0.95) + 1e-9, 4) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def profile_percentiles_lineitem(spark, sf_dir):
    """Distribution profiling: exact linear-interpolated percentiles per
    group (Spark `percentile` == DuckDB `quantile_cont` definition; the
    exact form is the oracle-gateable tier — `approx_percentile`'s
    t-digest is the scale tier, engine-specific by construction, kept
    rows-only in profile_approx_distinct's family)."""
    li = _t(spark, sf_dir, "lineitem")
    agg = [
        F.round(
            F.percentile("l_extendedprice", F.lit(p)) + F.lit(1e-9), 4
        ).alias(name)
        for p, name in [(0.25, "p25"), (0.50, "p50"), (0.75, "p75"), (0.95, "p95")]
    ]
    return li.groupBy("l_returnflag").agg(*agg)


@register(
    "profile_entropy",
    """
    WITH ec AS (SELECT event_type AS v, count(*) AS n FROM events GROUP BY 1),
    et AS (SELECT sum(n) AS tot, count(*) AS k FROM ec),
    sc AS (SELECT source AS v, count(*) AS n FROM documents GROUP BY 1),
    st AS (SELECT sum(n) AS tot, count(*) AS k FROM sc),
    pc AS (SELECT o_orderpriority AS v, count(*) AS n FROM orders GROUP BY 1),
    pt AS (SELECT sum(n) AS tot, count(*) AS k FROM pc)
    SELECT 'event_type' AS "column", k::BIGINT AS n_distinct,
           round(-sum((n::DOUBLE / tot) * log2(n::DOUBLE / tot)) + 1e-9, 4)
             AS entropy
    FROM ec, et GROUP BY k
    UNION ALL
    SELECT 'source', k::BIGINT,
           round(-sum((n::DOUBLE / tot) * log2(n::DOUBLE / tot)) + 1e-9, 4)
    FROM sc, st GROUP BY k
    UNION ALL
    SELECT 'o_orderpriority', k::BIGINT,
           round(-sum((n::DOUBLE / tot) * log2(n::DOUBLE / tot)) + 1e-9, 4)
    FROM pc, pt GROUP BY k
    """,
)
def profile_entropy(spark, sf_dir):
    """Column information-content profiling: Shannon entropy + distinct
    count for the categorical columns of three tables in one result."""
    ev = _t(spark, sf_dir, "events").select(F.col("event_type"))
    docs = _t(spark, sf_dir, "documents").select(F.col("source"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_orderpriority"))
    a = profiler.categorical_entropy(ev, ["event_type"])
    b = profiler.categorical_entropy(docs, ["source"])
    c = profiler.categorical_entropy(o, ["o_orderpriority"])
    return a.unionByName(b).unionByName(c)


@register(
    "histogram_totalprice",
    """
    SELECT floor(o_totalprice / 50000)::INT AS bucket,
           count(*) AS n,
           round(min(o_totalprice)::DECIMAL(18,2), 2)::DOUBLE AS lo,
           round(max(o_totalprice)::DECIMAL(18,2), 2)::DOUBLE AS hi
    FROM orders GROUP BY 1
    """,
)
def histogram_totalprice(spark, sf_dir):
    """Fixed-width histogram of order totals: bucket index + count +
    actual [lo, hi] per bucket — one partial-aggregating groupBy, the
    profiling primitive behind range-skew diagnostics."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(
        F.floor(F.col("o_totalprice") / 50000).cast("int").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice").cast("decimal(18,2)"), 2)
        .cast("double")
        .alias("lo"),
        F.round(F.max("o_totalprice").cast("decimal(18,2)"), 2)
        .cast("double")
        .alias("hi"),
    )


@register(
    "validate_orders",
    """
    WITH base AS (
      SELECT count(*) AS n,
             sum(CASE WHEN NOT (o_totalprice > 0)
                      OR o_totalprice IS NULL THEN 1 ELSE 0 END)::BIGINT AS v_price,
             sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS v_cust,
             sum(CASE WHEN NOT (o_orderdate >= '1990-01-01'::TIMESTAMP
                                AND o_orderdate < '2010-01-01'::TIMESTAMP)
                      OR o_orderdate IS NULL THEN 1 ELSE 0 END)::BIGINT AS v_date
      FROM orders
    ),
    uq AS (
      SELECT sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS viol,
             sum(c)::BIGINT AS n
      FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
    )
    SELECT 'price_positive' AS rule, n AS n_rows, v_price AS n_violations,
           v_price = 0 AS pass FROM base
    UNION ALL
    SELECT 'custkey_not_null', n, v_cust, v_cust = 0 FROM base
    UNION ALL
    SELECT 'orderdate_in_range', n, v_date, v_date = 0 FROM base
    UNION ALL
    SELECT 'unique(o_orderkey)', n, viol, viol = 0 FROM uq
    """,
)
def validate_orders(spark, sf_dir):
    """Expectation checks over orders: positivity, non-null key, date
    range (single shared aggregation) + o_orderkey uniqueness (one
    distinct-count agg) — the data-quality report a pipeline runs
    before publishing a table."""
    o = _t(spark, sf_dir, "orders")
    return profiler.validate(
        o,
        rules={
            "price_positive": F.col("o_totalprice") > 0,
            "custkey_not_null": F.col("o_custkey").isNotNull(),
            "orderdate_in_range": (
                F.col("o_orderdate") >= F.lit("1990-01-01").cast("timestamp")
            )
            & (F.col("o_orderdate") < F.lit("2010-01-01").cast("timestamp")),
        },
        unique_cols=["o_orderkey"],
    )


@register(
    "equidepth_histogram_totalprice",
    """
    WITH r AS (
      SELECT o_totalprice,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*) OVER () AS n_total
      FROM orders
    )
    SELECT ((rn - 1) * 8 // n_total)::INT AS bucket,
           count(*) AS n,
           round(min(o_totalprice)::DECIMAL(18,2), 2)::DOUBLE AS lo,
           round(max(o_totalprice)::DECIMAL(18,2), 2)::DOUBLE AS hi
    FROM r GROUP BY 1
    """,
)
def equidepth_histogram_totalprice(spark, sf_dir):
    """Exact 8-bucket equi-depth histogram of order totals
    (operators/ranks.py): quantile-accurate range profile via the
    distributed prefix-sum global row number — one range shuffle, no
    single-partition window on the data path (the oracle's
    row_number() OVER () is exactly the plan shape this operator
    exists to avoid at scale)."""
    from semantic_ann_in_data_lake_spark.operators.ranks import (
        equidepth_histogram,
    )

    return equidepth_histogram(
        _t(spark, sf_dir, "orders"), "o_totalprice", "o_orderkey", buckets=8
    )


@register(
    "profile_correlations_lineitem",
    """
    WITH m AS (
      SELECT count(*) AS n,
             sum(l_quantity::DECIMAL(12,2)) AS s_q,
             sum(l_quantity::DECIMAL(12,2) * l_quantity::DECIMAL(12,2)) AS ss_q,
             sum(l_extendedprice::DECIMAL(12,2)) AS s_p,
             sum(l_extendedprice::DECIMAL(12,2) * l_extendedprice::DECIMAL(12,2)) AS ss_p,
             sum(l_discount::DECIMAL(12,2)) AS s_d,
             sum(l_discount::DECIMAL(12,2) * l_discount::DECIMAL(12,2)) AS ss_d,
             sum(l_quantity::DECIMAL(12,2) * l_extendedprice::DECIMAL(12,2)) AS sp_qp,
             sum(l_quantity::DECIMAL(12,2) * l_discount::DECIMAL(12,2)) AS sp_qd,
             sum(l_extendedprice::DECIMAL(12,2) * l_discount::DECIMAL(12,2)) AS sp_pd
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_discount IS NOT NULL
    ),
    p AS (
      SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y, n,
             s_q::DOUBLE AS sx, ss_q::DOUBLE AS sxx,
             s_p::DOUBLE AS sy, ss_p::DOUBLE AS syy, sp_qp::DOUBLE AS sxy
      FROM m
      UNION ALL
      SELECT 'l_quantity', 'l_discount', n,
             s_q::DOUBLE, ss_q::DOUBLE, s_d::DOUBLE, ss_d::DOUBLE,
             sp_qd::DOUBLE
      FROM m
      UNION ALL
      SELECT 'l_extendedprice', 'l_discount', n,
             s_p::DOUBLE, ss_p::DOUBLE, s_d::DOUBLE, ss_d::DOUBLE,
             sp_pd::DOUBLE
      FROM m
    )
    SELECT col_x, col_y, n,
           CASE WHEN sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) > 0
                THEN round((n * sxy - sx * sy)
                           / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                           + 1e-9, 4)
           END AS corr
    FROM p
    """,
)
def profile_correlations_lineitem(spark, sf_dir):
    """Pairwise Pearson correlations of the lineitem measures in ONE
    pass (operators/profiler.py correlation_matrix): every moment from
    a single wide aggregation with exact DECIMAL accumulation, pairs
    unpivoted by an explode (a union of selects would re-run the scan
    per pair — Catalyst has no cross-branch CSE)."""
    from semantic_ann_in_data_lake_spark.operators.profiler import (
        correlation_matrix,
    )

    return correlation_matrix(
        _t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount"],
    )


@register(
    "winsorized_stats_totalprice",
    """
    WITH r AS (
      SELECT o_totalprice,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*) OVER () AS n_total
      FROM orders
    ),
    b AS (
      SELECT min(o_totalprice) AS blo, max(o_totalprice) AS bhi
      FROM r WHERE rn = greatest(ceil(n_total * 0.05 - 1e-9), 1)
         OR rn = greatest(ceil(n_total * 0.95 - 1e-9), 1)
    )
    SELECT count(*)::BIGINT AS n,
           round(min(blo)::DECIMAL(18,2), 2)::DOUBLE AS lo,
           round(max(bhi)::DECIMAL(18,2), 2)::DOUBLE AS hi,
           round(round(sum(least(greatest(o_totalprice::DECIMAL(18,2),
                                          blo::DECIMAL(18,2)),
                                 bhi::DECIMAL(18,2))), 2)::DOUBLE
                 / count(*) + 1e-9, 4) AS winsorized_mean,
           round(round(sum(o_totalprice::DECIMAL(18,2)), 2)::DOUBLE
                 / count(*) + 1e-9, 4) AS raw_mean
    FROM r CROSS JOIN b
    """,
)
def winsorized_stats_totalprice(spark, sf_dir):
    """EXACT 5/95-winsorized mean of order totals (operators/ranks.py
    winsorized_mean): quantile bounds from the distributed prefix-sum
    rank (value at global rank ceil(q*n), not an approx sketch), clamp
    + DECIMAL-exact means — the outlier-robust profile statistic."""
    from semantic_ann_in_data_lake_spark.operators.ranks import (
        winsorized_mean,
    )

    return winsorized_mean(
        _t(spark, sf_dir, "orders"), "o_totalprice", "o_orderkey"
    )


@register(
    "brand_price_quartiles",
    """
    WITH r AS (
      SELECT p_brand, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice, p_partkey) AS rn,
             count(*) OVER (PARTITION BY p_brand) AS n
      FROM part
    )
    SELECT p_brand, max(n)::BIGINT AS n,
           round(max(CASE WHEN rn = greatest(ceil(n * 0.25 - 1e-9), 1) THEN p_retailprice END)
                 ::DECIMAL(18,2), 2)::DOUBLE AS q1,
           round(max(CASE WHEN rn = greatest(ceil(n * 0.50 - 1e-9), 1) THEN p_retailprice END)
                 ::DECIMAL(18,2), 2)::DOUBLE AS q2,
           round(max(CASE WHEN rn = greatest(ceil(n * 0.75 - 1e-9), 1) THEN p_retailprice END)
                 ::DECIMAL(18,2), 2)::DOUBLE AS q3
    FROM r GROUP BY p_brand
    """,
)
def brand_price_quartiles(spark, sf_dir):
    """EXACT per-group quartiles (value at within-group rank ⌈q·n⌉):
    one window partitioned BY BRAND — per-group percentiles never need
    the global-rank machinery, the partition key spreads the sort —
    then a conditional-pick aggregation. The grouped complement of
    winsorized_stats' global quantiles; no approx-percentile sketch."""
    from pyspark.sql import Window

    p = _t(spark, sf_dir, "part").select("p_brand", "p_partkey", "p_retailprice")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    wn = Window.partitionBy("p_brand")
    r = p.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )

    def pick(q):
        return (
            F.round(
                F.max(
                    F.when(
                        F.col("rn")
                        == F.greatest(
                            F.ceil(F.col("n") * F.lit(q) - F.lit(1e-9)),
                            F.lit(1),
                        ),
                        F.col("p_retailprice"),
                    )
                ).cast("decimal(18,2)"),
                2,
            )
            .cast("double")
        )

    return r.groupBy("p_brand").agg(
        F.max("n").cast("long").alias("n"),
        pick(0.25).alias("q1"),
        pick(0.50).alias("q2"),
        pick(0.75).alias("q3"),
    )


@register(
    "approx_percentile_bounds",
    """
    SELECT 0.0 AS q, 0.0 AS estimate, 0::BIGINT AS exact_rank,
           0.0 AS target_rank, '' AS violation
    WHERE FALSE
    """,
)
def approx_percentile_bounds(spark, sf_dir):
    """Accuracy gate for the quantile sketch the 100-TB profile tier
    uses in place of exact percentiles: empty iff every
    approx_percentile estimate's exact rank sits within the sketch's
    n/accuracy rank-error contract on l_extendedprice. The exact-rank
    recheck is one conditional aggregation against the 4-row broadcast
    estimate table — no global sort."""
    from semantic_ann_in_data_lake_spark.operators import checks

    return checks.approx_percentile_bound_violations(
        _t(spark, sf_dir, "lineitem"), "l_extendedprice"
    )


def _psi_oracle(tbl, col, datecol, pivot, width, n_bins):
    sm = 0.5 * n_bins
    return f"""
    bb_{col} AS (
      SELECT least(greatest(floor({col} / {width}), 0), {n_bins - 1})::INT AS bin,
             count(*) AS bn
      FROM {tbl}
      WHERE {datecol} < TIMESTAMP '{pivot}' AND {col} IS NOT NULL
      GROUP BY 1),
    cc_{col} AS (
      SELECT least(greatest(floor({col} / {width}), 0), {n_bins - 1})::INT AS bin,
             count(*) AS cn
      FROM {tbl}
      WHERE {datecol} >= TIMESTAMP '{pivot}' AND {col} IS NOT NULL
      GROUP BY 1),
    j_{col} AS (
      SELECT coalesce(bn, 0) AS bn, coalesce(cn, 0) AS cn
      FROM bb_{col} FULL OUTER JOIN cc_{col} USING (bin)),
    t_{col} AS (SELECT sum(bn) AS bt, sum(cn) AS ct FROM j_{col}),
    psi_{col} AS (
      SELECT '{col}' AS "column", bt::BIGINT AS base_n, ct::BIGINT AS curr_n,
             round(sum(CASE WHEN bn = 0 AND cn = 0 THEN 0.0 ELSE
               ((bn + 0.5) / (bt + {sm}) - (cn + 0.5) / (ct + {sm}))
               * ln(((bn + 0.5) / (bt + {sm})) / ((cn + 0.5) / (ct + {sm})))
             END) + 1e-9, 4) AS psi
      FROM j_{col}, t_{col} GROUP BY bt, ct)
    """


@register(
    "psi_drift_snapshots",
    f"""
    WITH {_psi_oracle('orders', 'o_totalprice', 'o_orderdate',
                      '1998-01-01 00:00:00', 50000, 10)},
    {_psi_oracle('lineitem', 'l_extendedprice', 'l_shipdate',
                 '1998-01-01 00:00:00', 10000, 11)}
    SELECT * FROM psi_o_totalprice
    UNION ALL
    SELECT * FROM psi_l_extendedprice
    """,
)
def psi_drift_snapshots(spark, sf_dir):
    """Distribution-drift scoring (operators/drift.py): PSI of order
    value and line price between the pre/post-1998 halves of the lake.
    Each snapshot collapses to a fixed-width bin-count table in one
    partial-aggregating pass; the score is a ≤n_bins-row fold — the
    two snapshots are never co-shuffled, and the bin tables are
    mergeable integer summaries a 100-TB deployment keeps per
    ingestion day."""
    from semantic_ann_in_data_lake_spark.operators.drift import psi_drift

    pivot = F.lit("1998-01-01 00:00:00").cast("timestamp")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    a = psi_drift(
        o.where(F.col("o_orderdate") < pivot),
        o.where(F.col("o_orderdate") >= pivot),
        "o_totalprice", lo=0.0, width=50000.0, n_bins=10,
    )
    b = psi_drift(
        li.where(F.col("l_shipdate") < pivot),
        li.where(F.col("l_shipdate") >= pivot),
        "l_extendedprice", lo=0.0, width=10000.0, n_bins=11,
    )
    return a.unionByName(b)


@register("profile_merge_partials", _profile_oracle("customer"))
def profile_merge_partials(spark, sf_dir):
    """Incremental profiling: the customer table sliced in two (as two
    ingestion days would arrive), each slice profiled into a MERGEABLE
    partial (exact integer length-sums instead of finalized averages),
    then combined without rescanning — merge(partial(a), partial(b)) ≡
    profile(a ∪ b), gated against the direct-profile oracle. At 100 TB
    the catalog updates per-slice instead of re-profiling the lake."""
    c = _t(spark, sf_dir, "customer")
    a = c.where(F.col("c_custkey") % 2 == 0)
    b = c.where(F.col("c_custkey") % 2 == 1)
    return profiler.merge_profile_partials(
        profiler.profile_partial(a, "customer"),
        profiler.profile_partial(b, "customer"),
    )


@register(
    "quantiles_from_bins_totalprice",
    """
    WITH b AS (
      SELECT least(greatest(floor(o_totalprice / 5000), 0), 99)::INT AS bin,
             count(*) AS n
      FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
    c AS (SELECT bin, n, sum(n) OVER (ORDER BY bin) AS cum,
                 sum(n) OVER () AS total
          FROM b),
    qq AS (SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS q),
    h AS (SELECT q, bin, n, cum, total, ceil(q * total)::BIGINT AS tgt,
                 row_number() OVER (PARTITION BY q ORDER BY bin) AS rn
          FROM c CROSS JOIN qq
          WHERE cum >= ceil(q * total)::BIGINT)
    SELECT q, total::BIGINT AS n_total,
           round(0.0 + (bin::DOUBLE + (tgt - (cum - n))::DOUBLE / n::DOUBLE)
                 * 5000.0, 6) AS est
    FROM h WHERE rn = 1
    """,
)
def quantiles_from_bins_totalprice(spark, sf_dir):
    """Mergeable approximate quantiles (operators/drift.py::
    quantiles_from_bins): order-value quartiles + p95 read off the
    fixed-width histogram — error ≤ one bin width, DETERMINISTIC
    (percentile_approx's sketch is merge-order-dependent), and
    incremental: slices keep integer bin tables, any union's quantiles
    are a ≤n_bins-row computation with no data re-read."""
    from semantic_ann_in_data_lake_spark.operators.drift import (
        bin_counts, quantiles_from_bins,
    )

    b = bin_counts(
        _t(spark, sf_dir, "orders"), "o_totalprice", 0.0, 5000.0, 100
    )
    return quantiles_from_bins(b, 0.0, 5000.0, (0.25, 0.5, 0.75, 0.95))
