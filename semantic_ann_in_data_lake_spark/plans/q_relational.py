"""Window / grouping-set / layout / upsert relational shapes.

Split from the single-file registry (round 4); the hub
`plans.registry` imports this module for its registration side
effects and re-exports every query function.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semantic_ann_in_data_lake_spark.plans.registry import register, _t



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


@register(
    "pivot_linestatus",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O'
                     THEN l_quantity::DECIMAL(18,2) ELSE 0 END), 2)::DOUBLE AS qty_O,
           round(sum(CASE WHEN l_linestatus = 'F'
                     THEN l_quantity::DECIMAL(18,2) ELSE 0 END), 2)::DOUBLE AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_linestatus(spark, sf_dir):
    """Pivot: wide per-category aggregates (groupBy().pivot())."""
    li = _t(spark, sf_dir, "lineitem")
    dec = F.col("l_quantity").cast("decimal(18,2)")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum(dec), 2).cast("double"))
    )
    return pivoted.select(
        "l_returnflag",
        F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_O"),
        F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_F"),
    )


@register(
    "rollup_revenue",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_extendedprice::DECIMAL(18,2)), 2)::DOUBLE AS revenue,
           count(*) AS n_items
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue(spark, sf_dir):
    """ROLLUP: hierarchical subtotals (flag, flag+status, grand total)."""
    li = _t(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast("decimal(18,2)")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n_items",
        )
    )


@register(
    "customer_order_trends",
    """
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS order_seq,
           round(o_totalprice::DECIMAL(18,2), 2)::DOUBLE AS price,
           round(lag(o_totalprice::DECIMAL(18,2)) OVER w, 2)::DOUBLE AS prev_price,
           round(sum(o_totalprice::DECIMAL(18,2)) OVER
                 (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)::DOUBLE
             AS running_total,
           round((avg(o_totalprice::DECIMAL(18,2)) OVER
                 (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))::DOUBLE + 1e-9, 2)
             AS moving_avg3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def customer_order_trends(spark, sf_dir):
    """Per-customer order-sequence analytics: sequence number, previous
    price (lag), running total, 3-order moving average — the rolling
    window family over a properly partitioned window (shuffle by
    customer only; no global sort). Money stays DECIMAL through every
    frame; only the divided moving average crosses to double (with the
    rounding bias)."""
    o = _t(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wavg = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("order_seq"),
        F.round(dec, 2).cast("double").alias("price"),
        F.round(F.lag(dec).over(w), 2).cast("double").alias("prev_price"),
        F.round(F.sum(dec).over(wrun), 2).cast("double").alias("running_total"),
        F.round(F.avg(dec).over(wavg).cast("double") + F.lit(1e-9), 2).alias(
            "moving_avg3"
        ),
    )


@register(
    "cube_revenue",
    """
    SELECT coalesce(l_returnflag, '<all>') AS returnflag,
           coalesce(l_linestatus, '<all>') AS linestatus,
           grouping(l_returnflag)::INT AS g_flag,
           grouping(l_linestatus)::INT AS g_status,
           count(*) AS n,
           round(sum(l_extendedprice::DECIMAL(18,2)), 2)::DOUBLE AS revenue
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_revenue(spark, sf_dir):
    """CUBE grouping sets over (returnflag, linestatus) with GROUPING()
    provenance flags — all four aggregation levels in one pass (Spark
    Expand + single partial-agg shuffle, not four scans)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "g_flag",
            "g_status",
            "n",
            "revenue",
        )
    )


@register(
    "upsert_orders_latest",
    """
    WITH updates AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             round(o_totalprice::DECIMAL(18,2) * 1.1, 2)::DOUBLE AS o_totalprice,
             o_orderdate, o_orderpriority, 2 AS version
      FROM orders WHERE o_orderkey % 7 = 0
    ),
    uni AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             round(o_totalprice::DECIMAL(18,2), 2)::DOUBLE AS o_totalprice,
             o_orderdate, o_orderpriority, 1 AS version
      FROM orders
      UNION ALL SELECT * FROM updates
    )
    SELECT o_orderkey,
           round(o_totalprice::DECIMAL(18,2), 2)::DOUBLE AS o_totalprice,
           version
    FROM uni
    QUALIFY row_number() OVER (PARTITION BY o_orderkey
                               ORDER BY version DESC, o_orderkey DESC) = 1
    """,
)
def upsert_orders_latest(spark, sf_dir):
    """Batch MERGE semantics: a deterministic update set (every 7th
    order re-priced at +10%, version 2) upserted over the base snapshot
    (version 1) — latest version wins per key via one key-partitioned
    window; the updated keys must surface version 2 and the new price."""
    from semantic_ann_in_data_lake_spark.operators.pairs import upsert_latest

    dec = lambda c: F.col(c).cast("decimal(18,2)")
    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round(dec("o_totalprice"), 2).cast("double").alias("o_totalprice"),
        "o_orderdate", "o_orderpriority", F.lit(1).alias("version"),
    )
    updates = base.where(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice",
        F.round(dec("o_totalprice") * F.lit(1.1), 2).cast("double"),
    ).withColumn("version", F.lit(2))
    merged = upsert_latest(base, updates, keys=["o_orderkey"], version_col="version")
    return merged.select(
        "o_orderkey",
        F.round(dec("o_totalprice"), 2).cast("double").alias("o_totalprice"),
        "version",
    )


@register(
    "customer_trailing_revenue",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice::DECIMAL(18,2)) OVER (
             PARTITION BY o_custkey ORDER BY epoch(o_orderdate::TIMESTAMP)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
           ), 2)::DOUBLE AS trailing_30d_revenue
    FROM orders
    """,
)
def customer_trailing_revenue(spark, sf_dir):
    """RANGE-frame window (the time-based frame ROWS cannot express):
    per order, the customer's revenue over the trailing 30 days —
    orders at the same timestamp share one frame value, and gaps in
    order history shrink the frame (unlike a fixed row count). Ordered
    by epoch seconds so the numeric RANGE bound is engine-portable."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w), 2)
        .cast("double")
        .alias("trailing_30d_revenue"),
    )


@register(
    "salted_heavy_user_rollup",
    """
    WITH d AS (SELECT user_id, count(*) AS user_total FROM events GROUP BY 1)
    SELECT event_type, count(*)::BIGINT AS n_events,
           count(DISTINCT e.user_id)::BIGINT AS n_users
    FROM events e JOIN d USING (user_id)
    WHERE user_total > 70
    GROUP BY 1
    """,
)
def salted_heavy_user_rollup(spark, sf_dir):
    """Heavy-user activity rollup routed through the SKEW-SALTED join
    (operators/joins.py): hot user_ids (detected by a bounded
    top-frequency scan) spread across salt sub-keys before the shuffle,
    cold keys join plain, and the oracle — a plain SQL join — proves the
    salted decomposition changes the PLAN, not the result. At 100 TB
    this is the operator for power-law keys AQE's post-hoc splitting
    can't fix (it splits tasks, not the per-key pair blowup)."""
    from semantic_ann_in_data_lake_spark.operators.joins import (
        detect_hot_keys,
        salted_join,
    )

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type")
    dim = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_total"))
    hot = detect_hot_keys(ev, "user_id", threshold=70)
    joined = salted_join(ev, dim, "user_id", salt_factor=4, hot_keys=hot)
    return (
        joined.where(F.col("user_total") > 70)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def _zorder_oracle_sql() -> str:
    """DuckDB twin of layout.zorder_key over (o_custkey, o_totalprice),
    8 bits each: identical scaling arithmetic, identical interleave."""
    terms = []
    for b in range(8):
        for i in (0, 1):
            terms.append(f"(((s{i} >> {b}) & 1) << {b * 2 + i})")
    zexpr = " | ".join(terms)
    scale = (
        "CASE WHEN mx{i} > mn{i} THEN floor(({col}::DOUBLE - mn{i})"
        " / (mx{i} - mn{i}) * 255)::BIGINT ELSE 0 END"
    )
    s0 = scale.format(i=0, col="o_custkey")
    s1 = scale.format(i=1, col="o_totalprice")
    return f"""
    WITH bounds AS (
      SELECT min(o_custkey::DOUBLE) AS mn0, max(o_custkey::DOUBLE) AS mx0,
             min(o_totalprice::DOUBLE) AS mn1, max(o_totalprice::DOUBLE) AS mx1
      FROM orders
    ),
    s AS (
      SELECT o_orderkey, {s0} AS s0, {s1} AS s1 FROM orders, bounds
    )
    SELECT o_orderkey, ({zexpr})::BIGINT AS zkey FROM s
    """


@register("zorder_key_orders", _zorder_oracle_sql())
def zorder_key_orders(spark, sf_dir):
    """Morton/Z-order clustering key over (o_custkey, o_totalprice) —
    the layout-optimization primitive (operators/layout.py): min-max
    scale each column to 8 bits, interleave. Pure shift/mask column
    arithmetic (codegen'd, no UDF); the DuckDB oracle recomputes the
    identical interleave, pinning cross-engine determinism of the
    curve. The pruning payoff is pinned by
    test_zorder_layout_prunes_both_columns."""
    from semantic_ann_in_data_lake_spark.operators.layout import with_zorder_key

    orders = _t(spark, sf_dir, "orders")
    return with_zorder_key(
        orders, ["o_custkey", "o_totalprice"], bits=8
    ).select("o_orderkey", "zkey")


@register(
    "bucketed_join_spend",
    """
    SELECT c_custkey,
           count(o_orderkey) AS n_orders,
           round(sum(o_totalprice::DECIMAL(18,2)), 2)::DOUBLE AS spend
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def bucketed_join_spend(spark, sf_dir):
    """Co-located fact join via BUCKETED tables (operators/layout.py
    write_bucketed): both sides bucketed on the customer key at the
    same count, so the join AND the per-customer aggregation run with
    zero shuffle exchanges (plan-pinned in tests) — Spark's native
    answer to 'repartition once, join forever'. The gate checks the
    bucketed roundtrip preserves the join result exactly."""
    from semantic_ann_in_data_lake_spark.operators.layout import (
        write_bucketed,
    )

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    bo = write_bucketed(o, "sals_orders_bucketed", ["o_custkey"], 8)
    bc = write_bucketed(c, "sals_customer_bucketed", ["c_custkey"], 8)
    return (
        bc.hint("merge")
        .join(bo, bc["c_custkey"] == bo["o_custkey"])
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("spend"),
        )
    )


@register(
    "bloom_prune_join_orders",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice::DECIMAL(18,2)), 2)::DOUBLE AS spend
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000
    GROUP BY o_orderpriority
    """,
)
def bloom_prune_join_orders(spark, sf_dir):
    """Runtime row-level filtering: the selective customer dim builds a
    Bloom filter (operators/bloomjoin.py) that drops non-matching
    orders rows IN THE SCAN STAGE — before the join shuffle — via
    broadcast word-table lookups; the exact join then removes Bloom
    false positives, so the result is identical to the plain join (the
    oracle IS the plain join). At 100 TB this is the difference
    between shuffling the whole fact table and shuffling the ~2% that
    can match. Plan-pinned: probe joins broadcast, no fact exchange
    before the probe."""
    from semantic_ann_in_data_lake_spark.operators.bloomjoin import (
        bloom_prune_join,
    )

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    c = (
        _t(spark, sf_dir, "customer")
        .where((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000))
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return (
        bloom_prune_join(o, c, "o_custkey", expected_keys=1 << 12)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("spend"),
        )
    )


@register(
    "fd_check_lake",
    """
    SELECT 'events.user_id->event_type' AS fd, user_id::VARCHAR AS det,
           count(DISTINCT row(event_type))::BIGINT AS n_variants
    FROM events GROUP BY 2
    HAVING count(DISTINCT row(event_type)) > 1
    UNION ALL
    SELECT 'orders.o_orderkey->o_custkey', o_orderkey::VARCHAR,
           count(DISTINCT row(o_custkey))::BIGINT
    FROM orders GROUP BY 2
    HAVING count(DISTINCT row(o_custkey)) > 1
    """,
)
def fd_check_lake(spark, sf_dir):
    """Functional-dependency audit (operators/checks.py::fd_violations):
    the order-key → customer dependency must HOLD (contributes zero
    rows — a distributed property check in the checks.py style), while
    user → event-type is expected to fail per user; the violating keys
    and their variant counts are the gated artifact. One groupBy per
    FD, struct-counted so NULL variants are never silently dropped."""
    from semantic_ann_in_data_lake_spark.operators.checks import fd_violations

    ev = fd_violations(
        _t(spark, sf_dir, "events"), ["user_id"], ["event_type"]
    ).select(
        F.lit("events.user_id->event_type").alias("fd"),
        F.col("user_id").cast("string").alias("det"),
        "n_variants",
    )
    ok = fd_violations(
        _t(spark, sf_dir, "orders"), ["o_orderkey"], ["o_custkey"]
    ).select(
        F.lit("orders.o_orderkey->o_custkey").alias("fd"),
        F.col("o_orderkey").cast("string").alias("det"),
        "n_variants",
    )
    return ev.unionByName(ok)


@register(
    "join_size_orders_lineitem",
    """
    WITH lc AS (SELECT o_orderkey AS k, count(*) AS cl
                FROM orders GROUP BY 1),
    rc AS (SELECT l_orderkey AS k, count(*) AS cr
           FROM lineitem GROUP BY 1),
    p AS (SELECT k, cl::DECIMAL(38,0) * cr::DECIMAL(38,0) AS nrows
          FROM lc JOIN rc USING (k)),
    t AS (SELECT count(*) AS matched_keys,
                 coalesce(sum(nrows), 0)::DECIMAL(38,0) AS join_rows,
                 coalesce(max(nrows), 0)::DECIMAL(38,0) AS max_key_fanout,
                 max({'r': nrows, 'k': k::VARCHAR}) AS top
          FROM p)
    SELECT matched_keys, join_rows::VARCHAR AS join_rows,
           max_key_fanout::VARCHAR AS max_key_fanout, top.k AS top_key
    FROM t
    """,
)
def join_size_orders_lineitem(spark, sf_dir):
    """Pre-flight join planning (operators/joins.py::
    join_size_estimate): exact orders⋈lineitem output cardinality and
    skew profile from per-key count tables alone — the broadcast/
    shuffle/salt decision input, computed at |distinct keys| cost
    instead of |join output|. DECIMAL products (power-law keys
    overflow int64); argmax via max(struct) so the top-key tie-break
    is deterministic cross-engine."""
    from semantic_ann_in_data_lake_spark.operators.joins import (
        join_size_estimate,
    )

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey")
    )
    est = join_size_estimate(o, li, "orderkey")
    # gated projection: DECIMAL counts as exact digit strings (pandas
    # canonicalizes Spark DECIMAL as object vs DuckDB's float — the
    # array-serialization lesson from round 3 applied to decimals);
    # the operator API keeps the typed DECIMAL columns
    return est.select(
        "matched_keys",
        F.col("join_rows").cast("string").alias("join_rows"),
        F.col("max_key_fanout").cast("string").alias("max_key_fanout"),
        "top_key",
    )


@register(
    "table_diff_orders",
    """
    WITH oldt AS (
      SELECT o_orderkey AS k, o_orderpriority AS p, o_totalprice AS t
      FROM orders),
    newt AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 89 = 0 THEN 'X-MUTATED'
                  ELSE o_orderpriority END AS p,
             o_totalprice AS t
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_orderpriority, o_totalprice
      FROM orders WHERE o_orderkey % 101 = 0),
    j AS (SELECT coalesce(o.k, n.k) AS key,
                 CASE WHEN o.k IS NULL THEN 'added'
                      WHEN n.k IS NULL THEN 'removed'
                      WHEN o.p IS DISTINCT FROM n.p
                           OR o.t IS DISTINCT FROM n.t THEN 'changed'
                 END AS change
          FROM oldt o FULL OUTER JOIN newt n ON o.k = n.k)
    SELECT key, change FROM j WHERE change IS NOT NULL
    """,
)
def table_diff_orders(spark, sf_dir):
    """Keyed snapshot diff (operators/checks.py::table_diff): the
    ingestion audit between two table versions — added / removed /
    changed keys from (key, content-hash) projections, |delta|-sized
    output, full rows never shuffle. The synthetic 'new' snapshot
    removes every 97th order, mutates every 89th priority, and appends
    every 101st under a shifted key; the oracle derives the same
    classification by direct column comparison (the hash is the
    implementation, not the contract — collisions at 2^-64)."""
    from semantic_ann_in_data_lake_spark.operators.checks import table_diff

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("p"),
        F.col("o_totalprice").alias("t"),
    )
    new = (
        o.where(F.col("k") % 97 != 0)
        .withColumn(
            "p",
            F.when(F.col("k") % 89 == 0, "X-MUTATED").otherwise(F.col("p")),
        )
        .unionByName(
            o.where(F.col("k") % 101 == 0).withColumn(
                "k", F.col("k") + F.lit(10_000_000)
            )
        )
    )
    return table_diff(o, new, "k")


_COMPACT_RT = "/tmp/sals_gate/compact_rt"


@register(
    "compact_roundtrip_stats",
    """
    SELECT lang, count(*) AS n, sum(length(text))::BIGINT AS chars,
           sum(doc_id)::BIGINT AS id_sum
    FROM documents GROUP BY 1
    """,
)
def compact_roundtrip_stats(spark, sf_dir):
    """Small-file compaction gate (layout.compact_parquet): fragment
    documents into 32 tiny files, auto-size-compact them (FS byte
    probe → target file count), and aggregate the compacted copy vs
    the ORIGINAL table — lossless per row, per column. The file-count
    mechanics are unit-pinned; this entry hash-gates the data."""
    from semantic_ann_in_data_lake_spark.operators.layout import (
        compact_parquet,
    )

    frag = f"{_COMPACT_RT}/frag"
    dst = f"{_COMPACT_RT}/compacted"
    _t(spark, sf_dir, "documents").repartition(32).write.mode(
        "overwrite"
    ).parquet(frag)
    compact_parquet(spark, frag, dst, order_col="doc_id")
    back = spark.read.parquet(dst)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("chars"),
        F.sum("doc_id").alias("id_sum"),
    )
