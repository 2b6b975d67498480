"""Physical-plan assertions: the scale discipline, pinned.

These tests read `.explain` output and fail if a future change
regresses pushdown, broadcast choice, or top-k distribution — the
properties that decide whether a plan survives a 100× scale-up.
"""

from __future__ import annotations

from semantic_ann_in_data_lake_spark.plans import registry


def _plan(spark, sf_dir, name: str, mode: str = "formatted") -> str:
    fn, _ = registry.REGISTRY[name]
    df = fn(spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_q1_filter_pushed_and_columns_pruned(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters" in plan and "LessThanOrEqual(l_shipdate" in plan
    # projection pruning: the 11-column lineitem scan must not read keys
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_j1_broadcasts_dimension_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "j1_lookup_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_profile_is_single_scan_single_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "profile_customer")
    assert plan.count("Location: InMemoryFileIndex") == 1  # one table pass
    assert "Exchange hashpartitioning" not in plan  # global agg only


def test_topk_queries_avoid_global_window(spark, sf_dir):
    # q3 and most_common must use distributed TakeOrderedAndProject,
    # never a single-partition window over unbounded input
    for name in ["q3_top_orders", "most_common_events"]:
        plan = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in plan, name


def test_knn_window_is_partitioned_by_query(spark, sf_dir):
    plan = _plan(spark, sf_dir, "knn_exact_l2")
    assert "hashpartitioning(query_id" in plan
