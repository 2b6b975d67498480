"""The invariant gates of the approximate tier (operators/checks.py)
must themselves be falsifiable: a clean result yields zero violations,
and each corruption of the contract is detected with the right label.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_ann_in_data_lake_spark.operators import checks, dedup
from semantic_ann_in_data_lake_spark.operators.knn import knn_join
from semantic_ann_in_data_lake_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


def _violations(df):
    return {r["violation"] for r in df.collect()}


def test_knn_clean_result_has_no_violations(spark, emb):
    knn = knn_join(emb, emb, k=5, strategy="lsh")
    assert checks.knn_invariant_violations(knn, emb).count() == 0


def test_knn_distance_corruption_detected(spark, emb):
    knn = knn_join(emb, emb, k=5, strategy="lsh")
    bad = knn.withColumn(
        "distance",
        F.when(F.col("rank") == 3, F.col("distance") + 0.5).otherwise(
            F.col("distance")
        ),
    )
    v = _violations(checks.knn_invariant_violations(bad, emb))
    # the shifted distance both mismatches the recomputation and (being
    # larger than rank 4's) breaks monotonicity — "distance" wins the
    # when-chain on the corrupted row itself
    assert "distance" in v


def test_knn_rank_gap_detected(spark, emb):
    knn = knn_join(emb, emb, k=5, strategy="lsh")
    bad = knn.where(F.col("rank") != 2)  # hole in the rank sequence
    assert "rank_gap" in _violations(checks.knn_invariant_violations(bad, emb))


def test_knn_self_pair_detected(spark, emb):
    knn = knn_join(emb, emb, k=3, strategy="broadcast")
    self_rows = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("vec_id").alias("cand_id"),
        F.lit(0.0).alias("distance"),
        F.lit(1).alias("rank"),
    ).limit(4)
    # rank-1 self pairs at distance 0.0: exact distance matches, but the
    # self-exclusion contract is broken (and real rank-1 rows now have a
    # duplicate rank — self_pair must be flagged on the injected rows)
    bad = knn.where(F.col("rank") > 1).unionByName(self_rows)
    assert "self_pair" in _violations(checks.knn_invariant_violations(bad, emb))


def test_neardup_clean_and_corrupted(spark, emb):
    pairs = dedup.embedding_near_dups(emb, tau=0.3, strategy="lsh", k=20)
    clean = checks.near_dup_invariant_violations(pairs, emb, tau=0.3)
    assert clean.count() == 0

    flipped = pairs.select(
        F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"), "cosine"
    )
    v = _violations(checks.near_dup_invariant_violations(flipped, emb, tau=0.3))
    assert v == {"not_canonical"}

    lowered = pairs.withColumn("cosine", F.col("cosine") - F.lit(0.8))
    v2 = _violations(checks.near_dup_invariant_violations(lowered, emb, tau=0.3))
    assert "cosine" in v2


def test_approx_distinct_bounds(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    ok = checks.approx_distinct_bound_violations(orders, "orders", rel_bound=0.15)
    assert ok.count() == 0
    # an impossible bound must flag every column with nonzero estimate error
    tight = checks.approx_distinct_bound_violations(
        orders, "orders", rel_bound=-1.0
    )
    assert tight.count() == len(orders.columns)
