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


def test_triangle_stats_hand_case(spark):
    """K4 minus one edge: nodes 1-2-3-4 fully connected except (1,4).
    Triangles: (1,2,3) and (2,3,4). Degrees: 1→2, 2→3, 3→3, 4→2.
    Clustering: 1 and 4 are 1.0 (their 2 neighbors are linked),
    2 and 3 are 2·2/(3·2)=0.666667."""
    from semantic_ann_in_data_lake_spark.operators.graphrank import (
        symmetrize,
        triangle_stats,
    )

    directed = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)],
        "query_id bigint, cand_id bigint",
    )
    got = {
        r["node"]: (r["degree"], r["triangles"], r["clustering"])
        for r in triangle_stats(symmetrize(directed)).collect()
    }
    assert got == {
        1: (2, 1, 1.0),
        2: (3, 2, 0.666667),
        3: (3, 2, 0.666667),
        4: (2, 1, 1.0),
    }


def test_triangle_free_graph_zero_clustering(spark):
    from semantic_ann_in_data_lake_spark.operators.graphrank import (
        symmetrize,
        triangle_stats,
    )

    star = spark.createDataFrame(
        [(1, n) for n in (2, 3, 4, 5)], "query_id bigint, cand_id bigint"
    )
    rows = triangle_stats(symmetrize(star)).collect()
    assert all(r["triangles"] == 0 and r["clustering"] == 0.0 for r in rows)


def test_lpa_two_cliques_two_communities(spark):
    """Two 4-cliques joined by a single bridge edge: labels must
    converge to one community per clique (the bridge minority label
    never outvotes the clique majority)."""
    from semantic_ann_in_data_lake_spark.operators.graphrank import (
        lpa_communities,
        symmetrize,
    )

    edges = []
    for block in ((1, 2, 3, 4), (11, 12, 13, 14)):
        for i, a in enumerate(block):
            for b in block[i + 1:]:
                edges.append((a, b))
    edges.append((4, 11))  # bridge
    df = spark.createDataFrame(edges, "query_id bigint, cand_id bigint")
    lab = {
        r["node"]: r["community"]
        for r in lpa_communities(symmetrize(df), iters=4).collect()
    }
    first = {lab[v] for v in (1, 2, 3, 4)}
    second = {lab[v] for v in (11, 12, 13, 14)}
    assert len(first) == 1 and len(second) == 1 and first != second


def test_lpa_recovers_blob_communities(spark):
    """kNN graph of 10 tight Gaussian blobs: LPA communities align
    with blob membership (majority-community purity ≥ 0.85; measured
    0.90 — one blob fragments on the sparse k=3 graph, the rest are
    recovered exactly; deterministic, so the number is stable)."""
    import numpy as np

    from semantic_ann_in_data_lake_spark.operators.graphrank import (
        lpa_communities,
        symmetrize,
    )
    from semantic_ann_in_data_lake_spark.operators.knn import knn_join

    rng = np.random.default_rng(11)
    centers = rng.uniform(-1.0, 1.0, size=(10, 8))
    rows, vid = [], 0
    truth = {}
    for bi, c in enumerate(centers):
        for _ in range(8):
            rows.append((vid, [float(x) for x in c + rng.normal(0, 0.03, 8)]))
            truth[vid] = bi
            vid += 1
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    edges = symmetrize(knn_join(df, df, k=3, strategy="broadcast"))
    lab = {
        r["node"]: r["community"]
        for r in lpa_communities(edges, iters=4).collect()
    }
    from collections import Counter

    pure = 0
    for bi in range(10):
        members = [lab[v] for v, b in truth.items() if b == bi]
        pure += Counter(members).most_common(1)[0][1]
    assert pure / len(truth) >= 0.85


def test_community_dedup_keeps_min_per_community(spark):
    from semantic_ann_in_data_lake_spark.operators.graphrank import (
        community_dedup,
    )

    labels = spark.createDataFrame(
        [(5, 1), (3, 1), (9, 1), (7, 2), (8, 2), (4, 4)],
        "node bigint, community bigint",
    )
    rows = {r["node"]: r["kept"] for r in community_dedup(labels).collect()}
    assert rows == {3: True, 5: False, 9: False, 7: True, 8: False, 4: True}
