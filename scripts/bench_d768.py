"""d=768 ANN tier benchmark (VERDICT r10 task 3).

The driver testdata embeddings are d=64, far below real sentence-
embedding widths, so the PQ/OPQ/refine tiers' payoff claims were
design arguments, not measurements (PERF.md r10 admits it). This
script measures every self-join ANN tier plus the out-of-corpus
graph-search path on a synthetic d=768 clustered corpus at two sizes,
recording wall time AND recall@k vs the exact broadcast baseline, so
the tier-ladder crossovers are pinned at a realistic width.

Fixture: C Gaussian clusters in d=768 (unit-scale centers, σ=0.25 —
moderately tight, the geometry of near-dup-bearing embedding corpora),
deterministic rng, regenerated in-memory per run (no committed blob).

Output: D768_BENCH.json at the repo root (committed) + a stderr table;
PERF.md quotes the numbers.

Usage: python scripts/bench_d768.py [n_small n_big]   (default 4000 12000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

D = 768
N_QUERY = 400
K = 10
SEED = 768042


def make_fixture(spark, n: int):
    rng = np.random.default_rng(SEED)
    n_clusters = max(20, n // 50)
    centers = rng.normal(0.0, 1.0, size=(n_clusters, D))
    assign = rng.integers(0, n_clusters, size=n)
    mat = centers[assign] + rng.normal(0.0, 0.25, size=(n, D))
    qassign = rng.integers(0, n_clusters, size=N_QUERY)
    qmat = centers[qassign] + rng.normal(0.0, 0.25, size=(N_QUERY, D))
    schema = "vec_id bigint, embedding array<double>"
    corpus = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(mat)], schema
    ).repartition(32).persist()
    queries = spark.createDataFrame(
        [(10_000_000 + i, row.tolist()) for i, row in enumerate(qmat)], schema
    ).persist()
    corpus.count(), queries.count()
    return corpus, queries


def main():
    from semantic_ann_in_data_lake_spark.cache import cache_scope
    from semantic_ann_in_data_lake_spark.operators.embedproj import (
        knn_nndescent_refine,
        knn_opq_refine,
        knn_pca_refine,
        pca_fit,
    )
    from semantic_ann_in_data_lake_spark.operators.graphsearch import (
        graph_search,
    )
    from semantic_ann_in_data_lake_spark.operators.knn import knn_join
    from semantic_ann_in_data_lake_spark.operators.nndescent import (
        nndescent_knn_graph,
        nndescent_recall_vs_exact,
    )
    from semantic_ann_in_data_lake_spark.session import get_spark

    sizes = (
        [int(sys.argv[1]), int(sys.argv[2])]
        if len(sys.argv) > 2
        else [4000, 12000]
    )
    spark = get_spark("bench_d768")
    results: dict = {"d": D, "k": K, "n_query_ooc": N_QUERY, "sizes": {}}

    for n in sizes:
        corpus, queries = make_fixture(spark, n)
        print(f"# ---- n={n} d={D} ----", file=sys.stderr)
        models = {
            "pca32": pca_fit(corpus, m=32),
            "pca_full": pca_fit(corpus),
        }
        exact = knn_join(corpus, corpus, k=K, strategy="broadcast").persist()
        exact.count()

        def tiers():
            yield "broadcast", lambda: knn_join(
                corpus, corpus, k=K, strategy="broadcast")
            yield "pq", lambda: knn_join(corpus, corpus, k=K, strategy="pq")
            yield "ivf_nprobe8", lambda: knn_join(
                corpus, corpus, k=K, strategy="ivf", nprobe=8)
            yield "ivf_pq_nprobe8", lambda: knn_join(
                corpus, corpus, k=K, strategy="ivf_pq_refine", nprobe=8,
                refine_factor=1)
            yield "ivf_pq_refine3", lambda: knn_join(
                corpus, corpus, k=K, strategy="ivf_pq_refine", nprobe=8,
                refine_factor=3)
            yield "pca_refine_warm", lambda: knn_pca_refine(
                corpus, corpus, k=K, nprobe=8, refine_factor=3,
                model=models["pca32"])
            yield "opq_refine_warm", lambda: knn_opq_refine(
                corpus, corpus, k=K, nprobe=8, refine_factor=3,
                model=models["pca_full"])
            yield "nndescent", lambda: nndescent_knn_graph(
                corpus, k=K, iters=3, reverse_cap=20)
            yield "nndescent_refine_warm", lambda: knn_nndescent_refine(
                corpus, k=K, refine_factor=2, iters=3, reverse_cap=20,
                model=models["pca32"])

        per_tier: dict = {}
        for name, make in tiers():
            with cache_scope():
                t0 = time.time()
                res = make().persist()
                res.count()
                el = time.time() - t0
                row = nndescent_recall_vs_exact(res, exact).collect()[0]
                recall = row["n_found"] / row["n_exact"]
                res.unpersist()
            per_tier[name] = {"sec": round(el, 2),
                              "recall_at_10": round(recall, 4)}
            print(f"# {name}: {el:.1f}s recall@{K}={recall:.3f}",
                  file=sys.stderr)

        # out-of-corpus query path: exact vs graph search over the
        # nndescent graph (the hnswlib knn_query analogue)
        exact_q = knn_join(queries, corpus, k=K, strategy="broadcast",
                           exclude_self=False).persist()
        t0 = time.time()
        exact_q.count()
        exact_q_sec = time.time() - t0
        graph = nndescent_knn_graph(corpus, k=K, iters=3,
                                    reverse_cap=20).persist()
        graph.count()  # build untimed: the index is amortized
        with cache_scope():
            t0 = time.time()
            gs = graph_search(queries, corpus, graph, k=K, beam=16,
                              hops=3).persist()
            gs.count()
            gs_sec = time.time() - t0
            row = nndescent_recall_vs_exact(gs, exact_q).collect()[0]
            gs_recall = row["n_found"] / row["n_exact"]
            gs.unpersist()
        per_tier["ooc_exact_broadcast"] = {"sec": round(exact_q_sec, 2),
                                           "recall_at_10": 1.0}
        per_tier["ooc_graph_search"] = {"sec": round(gs_sec, 2),
                                        "recall_at_10": round(gs_recall, 4)}
        print(f"# ooc exact {exact_q_sec:.1f}s | graph_search {gs_sec:.1f}s "
              f"recall={gs_recall:.3f}", file=sys.stderr)

        results["sizes"][str(n)] = per_tier
        graph.unpersist(); exact.unpersist(); exact_q.unpersist()
        corpus.unpersist(); queries.unpersist()

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "D768_BENCH.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps({"written": out}))


if __name__ == "__main__":
    main()
