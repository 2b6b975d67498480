"""TPC-H-shape relational queries q1-q22 + join coverage (J1-J10).

Split from the single-file registry (round 4); the hub
`plans.registry` imports this module for its registration side
effects and re-exports every query function.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semantic_ann_in_data_lake_spark.plans.registry import register, _t
from semantic_ann_in_data_lake_spark.operators import pairs as pairs_ops
from semantic_ann_in_data_lake_spark.plans.qshared import _DEC





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
    "j1_lookup_join",
    """
    SELECT l_orderkey, l_partkey, p_name, p_brand
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_orderkey % 50 = 0
    """,
)
def j1_lookup_join(spark, sf_dir):
    """J1: attach dimension attributes via broadcast hash lookup — the
    reference's dict-probe join (`repositoryLoader.py:56-72`)."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 50 == 0)
    p = _t(spark, sf_dir, "part")
    return li.join(
        F.broadcast(p), li.l_partkey == p.p_partkey
    ).select("l_orderkey", "l_partkey", "p_name", "p_brand")


@register(
    "j2_left_default",
    """
    SELECT o_orderkey, o_custkey,
           coalesce(c_mktsegment, '') AS segment
    FROM orders LEFT JOIN (
      SELECT * FROM customer WHERE c_acctbal > 5000
    ) c ON o_custkey = c_custkey
    WHERE o_orderkey % 20 = 0
    """,
)
def j2_left_default(spark, sf_dir):
    """J2: left lookup with ''-default for misses
    (`repositoryLoader.py:113-118,129-132`)."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 20 == 0)
    c = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 5000)
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey",
        "o_custkey",
        F.coalesce(F.col("c_mktsegment"), F.lit("")).alias("segment"),
    )


@register(
    "j7_supplier_pairs",
    """
    SELECT a.s_nationkey AS family, a.s_suppkey AS id_a, b.s_suppkey AS id_b
    FROM supplier a JOIN supplier b
      ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
    """,
)
def j7_supplier_pairs(spark, sf_dir):
    """J7: all i<j combos within a family group (`pairsBuilder.py:85-92`)."""
    s = _t(spark, sf_dir, "supplier")
    return pairs_ops.positive_pairs(s, "s_nationkey", "s_suppkey")


@register(
    "semi_anti_parts",
    """
    SELECT
      (SELECT count(*) FROM part WHERE EXISTS
        (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)) AS n_ordered,
      (SELECT count(*) FROM part WHERE NOT EXISTS
        (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)) AS n_never_ordered
    """,
)
def semi_anti_parts(spark, sf_dir):
    """J9: semi/anti-join cardinalities (the TP/FP/FN mechanics of
    `search_query.py:80-87` on relational data) — ONE lazy plan: left
    join onto the distinct key set + conditional agg, replacing the two
    eager .count() actions (each a full lineitem scan)."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey").distinct()
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left")
        .agg(
            F.sum(F.when(F.col("l_partkey").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_ordered"),
            F.sum(F.when(F.col("l_partkey").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_never_ordered"),
        )
    )


@register(
    "j10_symmetric_neighbors",
    """
    WITH pairs AS (
      SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b
      FROM supplier a JOIN supplier b
        ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
    ), sym AS (
      SELECT id_a AS sid, id_b AS nb FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    )
    SELECT sid AS s_suppkey,
           array_to_string(
             list_transform(list_sort(list(DISTINCT nb)), x -> x::VARCHAR),
             '|') AS neighbors
    FROM sym GROUP BY sid
    """,
)
def j10_symmetric_neighbors(spark, sf_dir):
    """J10: symmetric closure of GT pairs + neighbor sets
    (`join_discoverer.py:392-397`). Neighbor arrays serialized for the
    driver's row-hash canonicalizer."""
    s = _t(spark, sf_dir, "supplier")
    p = pairs_ops.positive_pairs(s, "s_nationkey", "s_suppkey")
    sym = p.select(F.col("id_a").alias("sid"), F.col("id_b").alias("nb")).union(
        p.select(F.col("id_b").alias("sid"), F.col("id_a").alias("nb"))
    )
    return sym.groupBy("sid").agg(
        F.sort_array(F.collect_set("nb")).alias("neighbors")
    ).select(
        F.col("sid").alias("s_suppkey"),
        F.array_join(
            F.transform("neighbors", lambda x: x.cast("string")), "|"
        ).alias("neighbors"),
    )


@register(
    "q3_top_orders",
    """
    WITH rev AS (
      SELECT o_orderkey, o_orderdate,
             round(sum(l_extendedprice::DECIMAL(18,2)
                       * (1 - l_discount::DECIMAL(18,2))), 2)::DOUBLE AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY o_orderkey, o_orderdate
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY revenue DESC, o_orderkey ASC) AS rnk
      FROM rev
    )
    SELECT o_orderkey, o_orderdate, revenue, rnk::INT AS rank
    FROM ranked WHERE rnk <= 10
    """,
)
def q3_top_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    dec = lambda col: F.col(col).cast("decimal(18,2)")
    rev = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
    )
    # Distributed top-10 first (TakeOrderedAndProject), then rank the 10
    # survivors — a global row_number window would funnel every grouped
    # row into one partition (WindowExec warns exactly this).
    top = rev.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc()).limit(10)
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "o_orderkey", "o_orderdate", "revenue", "rank"
    )


@register(
    "q5_local_supplier",
    """
    SELECT n_name,
           round(sum(l_extendedprice::DECIMAL(18,2)
                     * (1 - l_discount::DECIMAL(18,2))), 2)::DOUBLE AS revenue
    FROM region JOIN nation ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
                JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_supplier(spark, sf_dir):
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    dec = lambda col: F.col(col).cast("decimal(18,2)")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
    )




@register(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice::DECIMAL(18,2)
                     * l_discount::DECIMAL(18,2)), 2)::DOUBLE AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(dec("l_extendedprice") * dec("l_discount")), 2)
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q18_large_volume_customers",
    """
    WITH big AS (
      SELECT l_orderkey, round(sum(l_quantity::DECIMAL(18,2)), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity::DECIMAL(18,2)) > 150
    )
    SELECT c_custkey, c_name, o_orderkey,
           total_qty::DOUBLE AS total_qty,
           round(o_totalprice::DECIMAL(18,2), 2)::DOUBLE AS o_totalprice
    FROM big JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_volume_customers(spark, sf_dir):
    """q18 shape: aggregate-then-semi-join a HAVING subquery onto its
    dimensions — the agg side is the big shuffle, dims broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    dec = lambda col: F.col(col).cast("decimal(18,2)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum(dec("l_quantity")), 2).alias("total_qty_dec"))
        .where(F.col("total_qty_dec") > 150)
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("total_qty_dec").cast("double").alias("total_qty"),
            F.round(dec("o_totalprice"), 2).cast("double").alias("o_totalprice"),
        )
    )


# Final relational shapes: q12-style conditional counts, pivot, rollup


@register(
    "q12_priority_shipping",
    """
    SELECT l_returnflag,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_priority_shipping(spark, sf_dir):
    """q12 shape: conditional aggregation over a fact⋈dim join."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q4/q14 relational shapes + source/sink gates (SURVEY §2.1 S1/S2/S5/S6/S7)
# ---------------------------------------------------------------------------


@register(
    "q4_late_shipment_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_late_shipment_priority(spark, sf_dir):
    """q4 shape: correlated-predicate EXISTS (left-semi with a join
    condition referencing both sides; testdata lacks commit/receipt
    dates so 'late' = shipped >60 days after order)."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    cond = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q14_economy_revenue_ratio",
    """
    WITH j AS (
      SELECT p_type,
             l_extendedprice::DECIMAL(18,2)
               * (1 - l_discount::DECIMAL(18,2)) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-03-01 00:00:00'
    )
    SELECT round(100.0 * (round(sum(CASE WHEN p_type = 'ECONOMY' THEN rev END), 2)::DOUBLE)
                 / (round(sum(rev), 2)::DOUBLE) + 1e-9, 4) AS economy_pct,
           round(sum(rev), 2)::DOUBLE AS total_rev
    FROM j
    """,
)
def q14_economy_revenue_ratio(spark, sf_dir):
    """q14 shape: conditional revenue ratio. Both operands are exact
    rounded decimals cast to double, so the quotient is bit-identical
    across engines; +1e-9 bias before the final round (registry
    docstring / textstats.ROUND_BIAS)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-03-01 00:00:00").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_type", rev.alias("rev")
    )
    econ = F.round(F.sum(F.when(F.col("p_type") == "ECONOMY", F.col("rev"))), 2).cast(
        "double"
    )
    total = F.round(F.sum("rev"), 2).cast("double")
    return j.agg(
        F.round(F.lit(100.0) * econ / total + F.lit(1e-9), 4).alias("economy_pct"),
        total.alias("total_rev"),
    )


@register(
    "q10_returned_revenue",
    """
    WITH rev AS (
      SELECT c_custkey, c_name, n_name,
             round(sum(l_extendedprice::DECIMAL(18,2)
                       * (1 - l_discount::DECIMAL(18,2))), 2)::DOUBLE AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
                    JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, n_name
    )
    SELECT c_custkey, c_name, n_name, revenue
    FROM rev ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
)
def q10_returned_revenue(spark, sf_dir):
    """q10 shape: returned-item revenue per customer, top-20. Fact-fact
    join shuffles on orderkey; nation is broadcast; top-k is distributed
    TakeOrderedAndProject (no global window). Ties broken by c_custkey
    so the cut line is deterministic cross-engine."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dec = lambda col: F.col(col).cast("decimal(18,2)")
    rev = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
    )
    return rev.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(20)


@register(
    "q7_nation_volume",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           round(sum(l_extendedprice{_DEC} * (1 - l_discount{_DEC})), 2)::DOUBLE
             AS revenue
    FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                  JOIN orders ON o_orderkey = l_orderkey
                  JOIN customer ON c_custkey = o_custkey
                  JOIN nation n1 ON s_nationkey = n1.n_nationkey
                  JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= '1996-01-01'::TIMESTAMP
      AND l_shipdate < '1998-01-01'::TIMESTAMP
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between a nation pair by
    ship year. Both nation joins broadcast (25 rows); the fact-side
    joins shuffle on their keys with AQE; the nation-name disjunction is
    applied post-join where Catalyst can still prune fact columns."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = F.broadcast(_t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(_t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")))
    dec = lambda col: F.col(col).cast("decimal(18,2)")
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q8_market_share",
    f"""
    WITH flat AS (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice{_DEC} * (1 - l_discount{_DEC}) AS volume,
             n2.n_name AS supp_nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region ON n1.n_regionkey = r_regionkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    )
    SELECT o_year,
           round(round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                ELSE 0{_DEC} END), 2)::DOUBLE
                 / round(sum(volume), 2)::DOUBLE + 1e-9, 4) AS mkt_share
    FROM flat GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_3's share of PROMO-part revenue into ASIA
    customers per order year. Numerator and denominator accumulate in
    DECIMAL (exact, order-independent), are rounded, and only then meet
    double division — the cross-engine float discipline for ratios."""
    p = F.broadcast(
        _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = F.broadcast(_t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey")))
    n2 = F.broadcast(_t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")))
    r = F.broadcast(
        _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA").select("r_regionkey")
    )
    dec = lambda col: F.col(col).cast("decimal(18,2)")
    vol = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    flat = (
        p.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(r, F.col("n1_rkey") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("supp_nation"),
        )
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return flat.groupBy("o_year").agg(
        F.round(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(zero)),
                2,
            ).cast("double")
            / F.round(F.sum("volume"), 2).cast("double")
            + F.lit(1e-9),
            4,
        ).alias("mkt_share")
    )


@register(
    "q13_order_distribution",
    """
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q13_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of per-customer order counts with
    a filtered LEFT OUTER join (the filter lives in the join condition,
    so zero-order customers survive into the c_count = 0 bucket)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice{_DEC} * (1 - l_discount{_DEC})), 2)::DOUBLE
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= '1996-01-01'::TIMESTAMP
        AND l_shipdate < '1996-04-01'::TIMESTAMP
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier(s) with max quarterly revenue. The
    scalar max is a one-row aggregate broadcast back over the revenue
    view (no global sort); equality on a rounded exact-decimal value is
    engine-portable."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    dec = lambda col: F.col(col).cast("decimal(18,2)")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))), 2)
        .cast("double")
        .alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("__max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    f"""
    WITH pk AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#5' AND p_size <= 10
    ),
    th AS (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_thresh
      FROM lineitem JOIN pk ON l_partkey = p_partkey
      GROUP BY l_partkey
    )
    SELECT round(sum(l_extendedprice{_DEC})::DOUBLE / 7.0 + 1e-9, 2) AS avg_yearly
    FROM lineitem JOIN th ON lineitem.l_partkey = th.l_partkey
    WHERE l_quantity < qty_thresh
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue lost to small-quantity orders of
    Brand#5 small parts. The correlated AVG subquery becomes a per-part
    aggregate joined back to the fact; l_quantity is integer-valued so
    the double average is an exact-sum / count — order-independent on
    both engines."""
    pk = F.broadcast(
        _t(spark, sf_dir, "part")
        .where((F.col("p_brand") == "Brand#5") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    flt = li.join(pk, li.l_partkey == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    th = flt.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    dec = lambda col: F.col(col).cast("decimal(18,2)")
    return (
        flt.join(th, flt.l_partkey == th.t_partkey)
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(
                F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0) + F.lit(1e-9),
                2,
            ).alias("avg_yearly")
        )
    )


@register(
    "q19_disjunctive_revenue",
    f"""
    SELECT round(sum(l_extendedprice{_DEC} * (1 - l_discount{_DEC})), 2)::DOUBLE
             AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: disjunctive mixed part/lineitem predicates.
    The part side pre-filters to the union of brand/size branches (the
    pushdown-able part of the disjunction) and broadcasts; the residual
    cross-table disjunction evaluates post-join in codegen."""
    p = F.broadcast(
        _t(spark, sf_dir, "part")
        .where(
            ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
            | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
            | ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15))
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = _t(spark, sf_dir, "lineitem")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    dec = lambda col: F.col(col).cast("decimal(18,2)")
    return (
        li.join(p, li.l_partkey == F.col("p_partkey"))
        .where(cond)
        .agg(
            F.round(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q22_idle_customers",
    f"""
    WITH pool AS (
      SELECT c_custkey, c_nationkey, c_acctbal{_DEC} AS bal
      FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    ),
    stats AS (
      SELECT sum(bal) AS bal_sum, count(*) AS bal_cnt
      FROM pool WHERE bal > 0
    ),
    eligible AS (
      SELECT c_custkey, c_nationkey, bal
      FROM pool, stats
      WHERE bal * bal_cnt > bal_sum
    )
    SELECT c_nationkey, count(*) AS numcust,
           round(sum(bal), 2)::DOUBLE AS totacctbal
    FROM eligible
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= '2000-01-01'::TIMESTAMP)
    GROUP BY c_nationkey
    """,
)
def q22_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape: customers above the average positive balance of
    a nation pool who never ordered. The avg threshold is evaluated as
    the exact integer-scaled comparison bal·count > sum over DECIMALs —
    a double average of cents is order-dependent under parallel
    summation and would make row membership nondeterministic. The
    no-recent-orders predicate (nothing since 2000-01-01 — at testdata
    scale every customer has SOME order, so the unwindowed Q22 predicate
    selects nothing) is a LEFT ANTI join against the filtered orders."""
    nations = [1, 3, 5, 7, 9, 11, 13]
    pool = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_nationkey").isin(nations))
        .select(
            "c_custkey",
            "c_nationkey",
            F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
        )
    )
    stats = pool.where(F.col("bal") > 0).agg(
        F.sum("bal").alias("bal_sum"), F.count(F.lit(1)).alias("bal_cnt")
    )
    eligible = pool.crossJoin(F.broadcast(stats)).where(
        F.col("bal") * F.col("bal_cnt") > F.col("bal_sum")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    idle = eligible.join(o, eligible.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("bal"), 2).cast("double").alias("totacctbal"),
    )


# ---------------------------------------------------------------------------
# TPC-H remainder — q2/q9/q11/q16/q20 shapes (completes the 22).
#
# The testdata lake carries no partsupp table, so a deterministic
# partsupp-equivalent is derived IDENTICALLY on both engines from
# lineitem's (part, supplier) pairs: ps_supplycost = min unit price ever
# charged (rounded to 4 dp — exact thereafter), ps_availqty = total
# quantity ever shipped (integer-valued double, exact). What these five
# exercise is the DECORRELATION shapes nothing else in the registry
# covers: q2's correlated scalar-min subquery, q9's multi-way
# fact/derived-dim profit rollup, q11's scalar-aggregate HAVING, q16's
# NOT-IN anti-join under count-distinct, q20's nested semi-join chain.
# ---------------------------------------------------------------------------

_PS_CTE = """ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             round(min(l_extendedprice / l_quantity), 4) AS ps_supplycost,
             sum(l_quantity) AS ps_availqty
      FROM lineitem
      GROUP BY 1, 2
    )"""


def _derived_partsupp(spark, sf_dir):
    """lineitem → (ps_partkey, ps_suppkey, ps_supplycost, ps_availqty).

    One hash aggregate on (partkey, suppkey); both derived measures are
    order-independent (min of per-row IEEE divisions; sum of
    integer-valued quantities), so the relation is bit-identical across
    engines and partitionings."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 4)
            .alias("ps_supplycost"),
            F.sum("l_quantity").alias("ps_availqty"),
        )
    )


@register(
    "q2_min_cost_supplier",
    f"""
    WITH {_PS_CTE},
    eligible AS (
      SELECT ps_partkey, ps_supplycost, s_name, s_acctbal, n_name
      FROM ps
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
    ),
    mn AS (
      SELECT ps_partkey AS m_partkey, min(ps_supplycost) AS min_cost
      FROM eligible GROUP BY 1
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           ps_supplycost AS supply_cost
    FROM eligible
    JOIN mn ON ps_partkey = m_partkey AND ps_supplycost = min_cost
    JOIN part ON p_partkey = ps_partkey
    WHERE p_size = 3 AND p_type = 'STANDARD'
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: cheapest EUROPE supplier per STANDARD size-3
    part. The reference pattern is the correlated scalar-min subquery
    (cost = MIN(cost) over the same part, region-restricted); here it
    decorrelates to a per-part min aggregate joined back on
    (part, rounded-exact cost). Supplier×nation×region is tiny →
    broadcast; eligible→mn are co-keyed on ps_partkey so the join
    reuses the aggregate's partitioning. Ref: SURVEY §2.3 J-family."""
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eligible = _derived_partsupp(spark, sf_dir).join(
        F.broadcast(sup), F.col("ps_suppkey") == F.col("s_suppkey")
    )
    mn = eligible.groupBy(F.col("ps_partkey").alias("m_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    parts = F.broadcast(
        _t(spark, sf_dir, "part")
        .where((F.col("p_size") == 3) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_name")
    )
    return (
        eligible.join(
            mn,
            (F.col("ps_partkey") == F.col("m_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .join(parts, F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("ps_supplycost").alias("supply_cost"),
        )
    )


@register(
    "q9_product_profit",
    """
    WITH psq AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             CAST(round(min(l_extendedprice / l_quantity) * 10000, 0)
                  AS BIGINT) AS cost_e4
      FROM lineitem
      GROUP BY 1, 2
    ),
    j AS (
      SELECT n_name AS nation, year(l_shipdate)::INT AS o_year,
             CAST(sum((l_extendedprice::DECIMAL(18,2)
                        * (1 - l_discount::DECIMAL(18,2))) * 10000) AS BIGINT)
               - sum(cost_e4 * CAST(l_quantity AS BIGINT)) AS profit_e4
      FROM lineitem
      JOIN psq ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%gear%'
      GROUP BY 1, 2
    )
    SELECT nation, o_year,
           (CASE WHEN profit_e4 >= 0
                 THEN CAST(floor((profit_e4 + 50) / 100) AS BIGINT)
                 ELSE -CAST(floor((-profit_e4 + 50) / 100) AS BIGINT)
            END) / 100.0 AS sum_profit
    FROM j
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit on 'gear' parts by supplier nation and
    ship year. Every intermediate is EXACT: the derived unit cost is a
    BIGINT in 1e-4-dollar units (rounding the same IEEE double in both
    engines), revenue accumulates in DECIMAL scaled to the same units,
    and the final cents rounding is explicit half-away-from-zero integer
    arithmetic — a double→DECIMAL(18,4) cast of the cost diverged
    between engines by one unit in the last place, which a decimal SUM
    then amplified to visible cents. part filter and supplier×nation
    broadcast; the data-sized shuffles are the ps aggregate and the
    (nation, year) rollup."""
    li = _t(spark, sf_dir, "lineitem")
    psq = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")) * 10000, 0)
        .cast("bigint")
        .alias("cost_e4")
    )
    sup = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    parts = F.broadcast(
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%gear%"))
        .select("p_partkey")
    )
    dec2 = lambda col: F.col(col).cast("decimal(18,2)")
    rev_e4 = (dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))) * F.lit(
        10000
    )
    cost_term = F.col("cost_e4") * F.col("l_quantity").cast("bigint")
    j = (
        li.join(parts, li.l_partkey == F.col("p_partkey"))
        .join(
            psq,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(
            (
                F.sum(rev_e4).cast("bigint") - F.sum(cost_term)
            ).alias("profit_e4")
        )
    )
    p = F.col("profit_e4")
    cents = F.when(
        p >= 0, F.floor((p + 50) / 100).cast("bigint")
    ).otherwise(-F.floor((-p + 50) / 100).cast("bigint"))
    return j.select(
        "nation", "o_year", (cents / F.lit(100.0)).alias("sum_profit")
    )


@register(
    "q11_important_stock",
    f"""
    WITH {_PS_CTE},
    filt AS (
      SELECT ps_partkey,
             ps_supplycost::DECIMAL(18,4) * ps_availqty::DECIMAL(18,2) AS value
      FROM ps JOIN supplier ON s_suppkey = ps_suppkey
      WHERE s_nationkey IN (0, 1, 2, 3, 4)
    ),
    grouped AS (SELECT ps_partkey, sum(value) AS pv FROM filt GROUP BY 1),
    tot AS (SELECT sum(pv) AS total FROM grouped)
    SELECT ps_partkey, round(pv, 2)::DOUBLE AS part_value
    FROM grouped, tot
    WHERE pv * 1000 > total
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: parts whose stock value (derived supplycost ×
    availqty) for nations 0-4 exceeds 0.1% of the total. The scalar
    HAVING subquery decorrelates to a one-row aggregate broadcast back
    over the grouped view; the comparison is integer-scaled
    (pv·1000 > total) on exact DECIMALs so membership is deterministic
    — a double fraction would wobble at the threshold."""
    filt = (
        _derived_partsupp(spark, sf_dir)
        .join(
            F.broadcast(
                _t(spark, sf_dir, "supplier")
                .where(F.col("s_nationkey").isin(0, 1, 2, 3, 4))
                .select("s_suppkey")
            ),
            F.col("ps_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "ps_partkey",
            (
                F.col("ps_supplycost").cast("decimal(18,4)")
                * F.col("ps_availqty").cast("decimal(18,2)")
            ).alias("value"),
        )
    )
    grouped = filt.groupBy("ps_partkey").agg(F.sum("value").alias("pv"))
    tot = grouped.agg(F.sum("pv").alias("total"))
    return (
        grouped.crossJoin(F.broadcast(tot))
        .where(F.col("pv") * 1000 > F.col("total"))
        .select("ps_partkey", F.round("pv", 2).cast("double").alias("part_value"))
    )


@register(
    "q16_supplier_part_count",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
    FROM ps JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_part_count(spark, sf_dir):
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size) over
    the observed part-supplier relation, excluding one brand/type and
    negative-balance suppliers. The NOT IN becomes a broadcast LEFT
    ANTI join (the excluded set is provably non-null here, so anti-join
    ≡ NOT IN); count(DISTINCT) runs as Spark's two-phase distinct
    aggregate on the (brand, type, size) shuffle."""
    ps = (
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    bad = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    parts = F.broadcast(
        _t(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        ps.join(bad, ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_promotion_suppliers",
    f"""
    WITH {_PS_CTE},
    pk AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
    shipped AS (
      SELECT l_partkey, l_suppkey, 0.5 * sum(l_quantity) AS half_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate < TIMESTAMP '1999-01-01'
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT DISTINCT ps_suppkey
      FROM ps
      JOIN pk ON ps_partkey = p_partkey
      JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      WHERE ps_availqty > half_qty
    )
    SELECT s_suppkey, s_name
    FROM supplier JOIN cand ON s_suppkey = ps_suppkey
    WHERE s_nationkey IN (0, 1, 2, 3, 4)
    """,
)
def q20_promotion_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: nations-0-4 suppliers holding more than half of
    1998's shipped quantity of 'small%' parts. The nested
    IN(IN(...), correlated scalar) chain decorrelates to: per-pair 1998
    shipment aggregate, inner-joined to derived availqty on the SAME
    (partkey, suppkey) keys (co-partitioned — one shuffle feeds both
    aggregates), part filter broadcast, then a distinct-suppkey semi
    join into the 100-row supplier dim. Both compared quantities are
    integer-valued-double sums → exact comparison."""
    li = _t(spark, sf_dir, "lineitem")
    pk = F.broadcast(
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    shipped = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg((F.lit(0.5) * F.sum("l_quantity")).alias("half_qty"))
    )
    cand = (
        _derived_partsupp(spark, sf_dir)
        .join(pk, F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .where(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey").isin(0, 1, 2, 3, 4))
        .join(F.broadcast(cand), F.col("s_suppkey") == F.col("ps_suppkey"))
        .select("s_suppkey", "s_name")
    )


@register(
    "q21_waiting_supplier",
    """
    SELECT l1.l_suppkey, count(*) AS numwait
    FROM lineitem l1 JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY l1.l_suppkey
    """,
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape (no receiptdate in testdata — 'kept the order
    waiting' becomes 'shipped last'): per supplier, finished orders
    where at least one OTHER supplier participated (correlated EXISTS →
    LEFT SEMI join) and no other supplier shipped later (correlated
    NOT EXISTS → LEFT ANTI join). Both decorrelate onto the l_orderkey
    shuffle key, so the three lineitem scans co-partition."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    l1 = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("o3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("ship3"),
    )
    stage = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("o3"))
        & (F.col("l_suppkey") != F.col("s3"))
        & (F.col("ship3") > F.col("l_shipdate")),
        "left_anti",
    )
    return stage.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("numwait"))
