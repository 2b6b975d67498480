"""PageRank centrality (operators/graphrank.py).

Cross-engine equality of the full 5-round build over the symmetrized
kNN graph is covered by the oracle gate (`pagerank_knn_graph` replays
every iteration in DuckDB); these tests pin what the gate graph cannot
exercise: the dangling-node redistribution path (vs a pure-Python
model), mass conservation, and the curation-signal direction (central
nodes outrank peripheral ones on a hub graph).
"""

from __future__ import annotations

import pytest

from semantic_ann_in_data_lake_spark.operators.graphrank import (
    pagerank,
    symmetrize,
)


def _python_pagerank(edges, damping=0.85, iters=5, dp=9):
    """Direct model of the documented contract: exact-decimal contrib
    sums (contributions rounded at 12 dp), uniform dangling
    redistribution, per-round rounding at ``dp``."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {v: round(1.0 / n, dp) for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, d in sorted(edges):
            contrib[d] += round(r[s] / out[s], 12)
        dm = sum(r[v] for v in nodes if v not in out)
        base = (1.0 - damping) / n
        r = {
            v: round(base + damping * (contrib[v] + dm / n), dp)
            for v in nodes
        }
    return r


def test_pagerank_matches_python_model_with_dangling(spark):
    """Star + chain + a DANGLING sink: node 9 has only in-edges, so its
    mass must redistribute uniformly each round — the path the
    symmetrized-kNN gate graph never drives."""
    edges = [
        (1, 2), (1, 3), (1, 4),
        (2, 1), (3, 1), (4, 1),
        (4, 5), (5, 6), (6, 4),
        (3, 9),  # 9 is dangling: no out-edges
    ]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        row["node"]: row["pr"]
        for row in pagerank(df, damping=0.85, iters=5).collect()
    }
    want = _python_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-9), v


def test_pagerank_mass_conserved_without_dangling(spark):
    """On a graph where every node has out-edges, total rank stays 1
    (up to n rounding steps of 1e-9)."""
    edges = [(1, 2), (2, 3), (3, 1), (3, 2), (1, 3)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    total = sum(r["pr"] for r in pagerank(df, iters=5).collect())
    assert total == pytest.approx(1.0, abs=1e-8)


def test_pagerank_hub_outranks_periphery(spark):
    """The curation-signal direction: a node reciprocally linked by
    everyone (dense-region representative) scores above leaf nodes."""
    edges = []
    for leaf in range(2, 10):
        edges += [(1, leaf), (leaf, 1)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    pr = {r["node"]: r["pr"] for r in pagerank(df, iters=5).collect()}
    assert all(pr[1] > pr[leaf] for leaf in range(2, 10))


def test_symmetrize_dedupes_and_covers_both_directions(spark):
    knn = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3)], "query_id bigint, cand_id bigint"
    )
    got = {(r["src"], r["dst"]) for r in symmetrize(knn).collect()}
    assert got == {(1, 2), (2, 1), (2, 3), (3, 2)}
