"""Graph-index query path (operators/graphsearch.py) — beam search
over a persisted kNN graph for out-of-corpus vectors, the hnswlib
knn_query analogue (`DeepJoin/annIndex.py:21-40`).

Cross-engine equality of the full search mechanism is covered by the
oracle gate (`graph_search_recall_report` replays entries + every hop
in DuckDB; `knn_graph_search_l2` gates the distance/rank contract);
these tests pin what the gates leave to pytest: high recall where the
graph is navigable (blob fixture), recall monotonicity in beam/hops,
the build-once/persist/load/query-arbitrary-vectors lifecycle, and
edge shapes.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_ann_in_data_lake_spark.operators.graphsearch import graph_search
from semantic_ann_in_data_lake_spark.operators.knn import knn_join
from semantic_ann_in_data_lake_spark.operators.nndescent import (
    nndescent_knn_graph,
    nndescent_recall_vs_exact,
)


@pytest.fixture(scope="module")
def corpus_and_queries(spark):
    """Clustered, navigable data: 30 Gaussian blobs of 12 corpus
    points each in d=16, plus 3 OUT-OF-CORPUS query vectors per blob
    drawn from the same blob — each query's exact top-5 lies inside
    its home blob, so a working graph search must navigate there."""
    rng = np.random.default_rng(11)
    centers = rng.uniform(-1.0, 1.0, size=(30, 16))
    corpus, queries = [], []
    vid, qid = 0, 100000
    for c in centers:
        for _ in range(12):
            v = c + rng.normal(0.0, 0.05, size=16)
            corpus.append((vid, [float(x) for x in v]))
            vid += 1
        for _ in range(3):
            v = c + rng.normal(0.0, 0.05, size=16)
            queries.append((qid, [float(x) for x in v]))
            qid += 1
    schema = "vec_id bigint, embedding array<double>"
    return (
        spark.createDataFrame(corpus, schema),
        spark.createDataFrame(queries, schema),
    )


def _recall(res, exact) -> float:
    row = nndescent_recall_vs_exact(res, exact).collect()[0]
    return row["n_found"] / row["n_exact"]


@pytest.mark.slow  # >20s; default run budget (VERDICT r11 item 1)
def test_graph_search_high_recall_on_blobs(spark, corpus_and_queries):
    """Entry-coverage contract on a DISCONNECTED graph (30 blob
    components): with an entry budget covering the components
    (n_entry=120 → P(blob unseeded) ≈ 0.8%) recall ≥ 0.9 (measured
    0.967), while the √n default (19) is documented to strand the
    unseeded blobs (measured 0.43) — the operator docstring's
    connectivity contract, pinned from both sides."""
    corpus, queries = corpus_and_queries
    graph = knn_join(corpus, corpus, k=5, strategy="broadcast")
    exact = knn_join(queries, corpus, k=5, strategy="broadcast",
                     exclude_self=False).persist()
    covered = graph_search(queries, corpus, graph, k=5, beam=8, hops=3,
                           n_entry=120)
    assert _recall(covered, exact) >= 0.9
    stranded = graph_search(queries, corpus, graph, k=5, beam=8, hops=3,
                            n_entry=19)
    assert _recall(stranded, exact) < 0.7  # the documented failure mode


def test_graph_search_navigates_connected_graph(spark):
    """TRUE multi-hop navigation with the √n entry default: on a
    connected kNN graph (uniform d=4 corpus — one giant component),
    4 hops at beam 12 reach ≥0.95 of the exact out-of-corpus top-5
    (measured 0.995) from only √n ≈ 20 entry seeds."""
    rng = np.random.default_rng(11)
    schema = "vec_id bigint, embedding array<double>"
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in rng.uniform(-1, 1, 4)]) for i in range(400)],
        schema,
    )
    queries = spark.createDataFrame(
        [(100000 + i, [float(x) for x in rng.uniform(-1, 1, 4)])
         for i in range(80)],
        schema,
    )
    graph = knn_join(corpus, corpus, k=8, strategy="broadcast")
    res = graph_search(queries, corpus, graph, k=5, beam=12, hops=4)
    exact = knn_join(queries, corpus, k=5, strategy="broadcast",
                     exclude_self=False)
    assert _recall(res, exact) >= 0.95


@pytest.mark.slow  # >20s; default run budget (VERDICT r11 item 1)
def test_graph_search_contract_and_monotone_knobs(spark, corpus_and_queries):
    """Contract projection empty (exact distances, consecutive
    monotone ranks) and recall non-decreasing in hops and beam — each
    knob only grows the visited superset."""
    from semantic_ann_in_data_lake_spark.operators import checks

    corpus, queries = corpus_and_queries
    graph = nndescent_knn_graph(corpus, k=5, iters=4, seed=42)
    exact = knn_join(queries, corpus, k=5, strategy="broadcast",
                     exclude_self=False).persist()

    recalls = []
    for hops in (0, 1, 3):
        res = graph_search(
            queries, corpus, graph, k=5, beam=8, hops=hops, n_entry=18
        )
        recalls.append(_recall(res, exact))
    assert recalls == sorted(recalls), recalls

    res = graph_search(queries, corpus, graph, k=5, beam=8, hops=3)
    assert (
        checks.knn_invariant_violations(
            res, queries, metric="l2_sq", cand_emb=corpus
        ).count()
        == 0
    )
    wide = graph_search(queries, corpus, graph, k=5, beam=16, hops=3)
    assert _recall(wide, exact) >= recalls[-1]

    # k rows per query, ranks consecutive from 1
    per_q = res.groupBy("query_id").agg(
        F.count("*").alias("n"), F.min("rank").alias("lo"),
        F.max("rank").alias("hi"),
    )
    bad = per_q.where(
        (F.col("n") != 5) | (F.col("lo") != 1) | (F.col("hi") != 5)
    )
    assert bad.count() == 0


def test_graph_search_persisted_graph_lifecycle(
    spark, corpus_and_queries, tmp_path
):
    """The annIndex.py lifecycle: build the graph ONCE, persist it as
    parquet, load it in a fresh frame, and answer arbitrary query
    vectors against the loaded graph — results identical to searching
    the in-memory build."""
    corpus, queries = corpus_and_queries
    graph = nndescent_knn_graph(corpus, k=5, iters=4, seed=42)
    path = str(tmp_path / "knn_graph_index")
    graph.write.parquet(path)
    loaded = spark.read.parquet(path)

    live = graph_search(queries, corpus, graph, k=3, beam=6, hops=2,
                        n_entry=18)
    persisted = graph_search(queries, corpus, loaded, k=3, beam=6, hops=2,
                             n_entry=18)
    assert sorted(map(tuple, live.collect())) == sorted(
        map(tuple, persisted.collect())
    )


def test_graph_search_argument_validation(spark, corpus_and_queries):
    corpus, queries = corpus_and_queries
    graph = knn_join(corpus.limit(30), corpus.limit(30), k=2,
                     strategy="broadcast")
    with pytest.raises(ValueError, match="hops >= 0"):
        graph_search(queries, corpus, graph, k=0)
    with pytest.raises(ValueError, match="hops >= 0"):
        graph_search(queries, corpus, graph, hops=-1)


def test_knn_join_graph_strategy_dispatch(spark, corpus_and_queries):
    """knn_join(strategy='graph') is the unified-dispatch face of
    graph_search: identical rows to the direct call (prebuilt graph
    passed through), self-join calls rejected toward 'nndescent'."""
    corpus, queries = corpus_and_queries
    g = nndescent_knn_graph(corpus, k=5, iters=4, seed=42)
    direct = graph_search(queries, corpus, g, k=3, beam=6, hops=2, seed=42)
    via_join = knn_join(
        queries, corpus, k=3, strategy="graph", graph=g, beam=6, hops=2,
        seed=42,
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, via_join.collect())
    )
    with pytest.raises(ValueError, match="nndescent"):
        knn_join(corpus, corpus, k=3, strategy="graph")
    with pytest.raises(ValueError, match="l2_sq"):
        knn_join(queries, corpus, k=3, strategy="graph", metric="cosine")


def test_knn_join_auto_prefers_supplied_graph(spark, corpus_and_queries):
    """auto + a prebuilt graph= for an out-of-corpus batch routes to
    the graph tier (identical rows to the explicit strategy), while
    auto WITHOUT a graph still answers via the probe ladder."""
    corpus, queries = corpus_and_queries
    g = nndescent_knn_graph(corpus, k=5, iters=4, seed=42)
    via_auto = knn_join(
        queries, corpus, k=3, strategy="auto", graph=g, beam=6, hops=2,
        seed=42,
    )
    explicit = knn_join(
        queries, corpus, k=3, strategy="graph", graph=g, beam=6, hops=2,
        seed=42,
    )
    assert sorted(map(tuple, via_auto.collect())) == sorted(
        map(tuple, explicit.collect())
    )
    # no graph supplied: auto must still resolve (small corpus ->
    # broadcast rung) and return full top-3 per query
    no_graph = knn_join(queries, corpus, k=3, strategy="auto", seed=42)
    n_q = queries.count()
    assert no_graph.count() == 3 * n_q
