"""kNN similarity join — the reference's core operator (J6/V7-V9).

The reference does exact flat-L2 kNN with FAISS
(``SemLink/join_discoverer.py:273-299``) and approximate kNN with an
HNSW index (``DeepJoin/annIndex.py:6-40``). Spark has no mutable ANN
index object; instead one logical operator —
``knn_join(queries, candidates, k)`` — dispatches to three physical
strategies (SURVEY §4.2):

a. ``strategy="exact"``   cross join + higher-order-array L2 + ranking
   window. O(|Q|·|C|·d) but fully declarative, whole-stage-codegen'd,
   and the one whose semantics the DuckDB oracle can check bit-for-bit.
b. ``strategy="broadcast"`` collect+broadcast the candidate matrix, then
   a vectorized numpy top-k per partition via ``mapInPandas`` — the
   FAISS/hnswlib role. Matches (a) for exact metrics in practice
   (every gated run agrees hash-exactly), with one theoretical caveat:
   the BLAS expansion ||q||²-2q·c+||c||² sums in a different order
   than (a)'s sequential per-element fold, so a distance within ~1 ulp
   of a 6-dp rounding boundary could round differently. ~50-100×
   faster since the distance matrix is BLAS-computed. Right whenever
   candidates fit in executor memory (≤ a few GB of vectors).
c. ``strategy="lsh"``     random-projection bucket LSH (p-stable hash
   family) with per-bucket BLAS rescoring — the analog of HNSW
   approximation; cost stays sub-quadratic when BOTH sides are huge.
   Quality is judged by the P/R/NDCG harness, not hash-equality.

Distances are SQUARED L2 internally, exactly like FAISS ``IndexFlatL2``
(the reference thresholds ``dist**0.5 <= tau``,
``join_discoverer.py:318``); ties in top-k rank break by candidate id
ascending (FAISS breaks by insertion index — SURVEY §7.4.5), and
distances are rounded to ``round_dp`` *before* ranking so the ordering
is reproducible cross-engine.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semantic_ann_in_data_lake_spark.functions.vectors import l2_sq

DEFAULT_ROUND_DP = 6

#: per-worker-process cache of the dequantized int8 broadcast index,
#: keyed by broadcast file path (stable across tasks in a reused python
#: worker) — see _knn_broadcast's topk closure. At most one entry.
_DEQUANT_CACHE: dict = {}


def _broadcast_byte_budget() -> int:
    """Hard cap on the broadcast candidate-matrix size (bytes).

    Tunable per deployment via ``SPARK_GRAFT_KNN_BCAST_BUDGET_MB``; the
    512 MiB default leaves a multi-GiB executor comfortable (the
    broadcast lives once per executor, plus one dequantized float64
    rebuild per python worker process for int8 payloads)."""
    import os

    return int(os.environ.get("SPARK_GRAFT_KNN_BCAST_BUDGET_MB", "512")) << 20


def _estimate_rows(df: DataFrame) -> int | None:
    """Row count from parquet footers when ``df`` is an unfiltered
    file scan — zero Spark jobs (footer metadata only); None when the
    plan is anything richer (a filter would make footer counts an
    OVER-estimate, which could wrongly pick the ivf tier — fine — or
    keep broadcast on a smaller-than-estimated side — also fine — but
    we stay conservative and fall back to count())."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        if plan.getClass().getSimpleName() not in (
            "LogicalRelation",
            "LogicalRelationWithTable",
        ):
            return None
        files = df.inputFiles()
        if not files or not all(f.endswith(".parquet") for f in files):
            return None
        import pyarrow.parquet as pq

        total = 0
        for f in files:
            total += pq.ParquetFile(
                f.removeprefix("file://").removeprefix("file:")
            ).metadata.num_rows
        return total
    except Exception:
        return None


def _prep(df: DataFrame, id_col: str, vec_col: str, side: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"{side}_id"),
        F.col(vec_col).cast("array<double>").alias(f"{side}_vec"),
    )


def derive_nlist(
    candidates: DataFrame | None = None,
    floor: int = 16,
    cap: int = 4096,
    known_n: int | None = None,
) -> int:
    """Scale-aware IVF cell count: nlist ≈ √n keeps the per-cell
    candidate population ≈ √n, so probe work |Q|·nprobe·(n/nlist)
    grows as n^1.5 overall but each cell stays worker-sized as the
    corpus grows 100× — a fixed nlist instead re-approaches |Q|·|C|
    per cell (the sf1 7.4× outlier in SCALING, VERDICT r5 item 5).
    ``known_n`` (a count the caller already paid for — the auto
    dispatcher, the PQ degrade path) skips the probe entirely; else
    row count from parquet footers when free, count() otherwise.
    Capped so the centroid broadcast stays small. The floor/cap/√n
    policy lives ONLY here — every tier derives through this helper."""
    if candidates is None and known_n is None:
        raise ValueError("derive_nlist needs candidates or known_n")
    n = known_n
    if n is None:
        n = _estimate_rows(candidates)
    if n is None:
        n = candidates.count()
    return int(min(cap, max(floor, round(n ** 0.5))))


def knn_join(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    metric: str = "l2_sq",
    strategy: str = "exact",
    exclude_self: bool = True,
    round_dp: int = DEFAULT_ROUND_DP,
    compress: str | None = None,
    ivf_fit: str = "sample",
    max_bucket_size: int | None = None,
    nlist: int | None = None,
    nprobe: int = 4,
    refine_factor: int = 4,
    iters: int = 3,
    seed: int = 42,
    reverse_cap: int | None = None,
    min_update_frac: float | None = None,
    beam: int = 8,
    hops: int = 3,
    graph: DataFrame | None = None,
) -> DataFrame:
    """Top-k nearest candidates per query.

    Returns ``(query_id, cand_id, distance, rank)`` with ``rank`` in
    1..k ordered by (distance asc, cand_id asc) for ``l2_sq`` and
    (similarity desc, cand_id asc) for ``cosine`` (where ``distance``
    holds the similarity).

    ``strategy="nndescent"`` routes self-join graph builds to the
    index-free graph-ANN tier (`operators/nndescent.py`), same return
    contract; ``iters``/``seed``/``reverse_cap``/``min_update_frac``
    are its descent knobs (ignored by every other strategy) and
    ``compress`` is rejected — descent scores raw vectors only.

    ``strategy="graph"`` answers OUT-OF-CORPUS queries (a different
    frame than ``candidates``) by bounded-hop beam search over the
    candidates' NN-descent graph (`operators/graphsearch.py` — the
    hnswlib ``knn_query`` analogue); ``beam``/``hops`` are its search
    knobs and ``graph=`` accepts a prebuilt/persisted edge list so the
    build amortizes across query batches. ``strategy="auto"`` with a
    ``graph=`` supplied (and a distinct query frame, l2_sq, no
    compress) dispatches straight here — a persisted index beats every
    build-from-scratch rung and needs no size probes.

    ``compress="int8"`` (broadcast and ivf strategies): ship the
    candidate matrix as the symmetric-int8 index
    (:func:`quantize_embeddings`) — 8× smaller broadcast (broadcast
    strategy) or 8× smaller cell shuffle + cache-resident cells (ivf).
    Workers dequantize (qvec·scale) and score as usual; distances are
    then approximate (quantization error ~scale/2 per lane), so results
    are near- but not hash-exact.
    """
    known_n_cand = known_n_query = None
    if (
        strategy == "auto"
        and graph is not None
        and queries is not candidates
        and metric == "l2_sq"
        and compress is None
    ):
        # the caller handed a prebuilt/persisted candidate graph for an
        # out-of-corpus query batch: beam search over it beats every
        # build-from-scratch rung (O(entry_sample + hops·beam·k) scored
        # pairs per query, no corpus broadcast, no re-index) — and it
        # needs none of the row-count/dim probes below, so dispatch
        # before paying them
        strategy = "graph"
    if strategy == "auto":
        # SURVEY §4.2's optional dispatch: broadcast the candidate index
        # when it fits comfortably in executor memory, else fall back to
        # the partitioned IVF path (both-sides-huge). Cost of the probe:
        # parquet FOOTER row counts when the input is a bare scan (no
        # Spark job at all), else one count(); plus one head() for dim.
        #
        # TWO ceilings, not one: memory (the candidate matrix must fit
        # an executor) AND compute (brute-force scoring is |Q|·|C| —
        # 4M dim-8 vectors fit the 256 MiB broadcast line yet cost
        # 1.6e13 pair ops; the sf1 curve measured the quadratic tier at
        # ~n² wall-clock, SCALING_sf1.json). Past the pair budget
        # (SPARK_GRAFT_KNN_PAIR_BUDGET, default 1e10 ≈ minutes of BLAS
        # on one box, amortized across executors) auto prefers the
        # sub-quadratic IVF path even when memory would allow broadcast.
        import os

        n_cand = _estimate_rows(candidates)
        if n_cand is None:
            n_cand = candidates.count()
        n_query = n_cand
        if queries is not candidates:
            n_query = _estimate_rows(queries)
            if n_query is None:
                n_query = queries.count()
        first = candidates.select(vec_col).head(1)
        dim = len(first[0][0]) if first else 0
        approx_bytes = n_cand * dim * 8
        pair_budget = float(
            os.environ.get("SPARK_GRAFT_KNN_PAIR_BUDGET", "1e10")
        )
        fits_mem = approx_bytes <= 256 << 20
        fits_compute = n_query * n_cand <= pair_budget
        if fits_mem and fits_compute:
            # pass the probe results down: _knn_broadcast would
            # otherwise re-run head(1) + a count/LIMIT-probe job to
            # re-derive what the dispatcher just measured
            return _knn_broadcast(
                queries, candidates, id_col, vec_col, k, metric,
                exclude_self, round_dp, compress,
                known_n_cand=n_cand, known_dim=dim,
            )
        # middle rung of the ladder: compute fits but the float64
        # matrix doesn't — the PQ index is 8·dim/m× smaller (32× at
        # defaults), so the same pair budget often still broadcasts.
        # ADC distances are approximate; past BOTH budgets → IVF.
        # call-time import: pq imports from this module at its top
        from semantic_ann_in_data_lake_spark.operators.pq import derive_m

        pq_bytes = n_cand * (derive_m(dim) + 16)  # m codes + id/overhead
        if (
            fits_compute
            and not fits_mem
            and metric == "l2_sq"
            and pq_bytes <= 256 << 20
        ):
            strategy = "pq"
        else:
            strategy = "ivf"
        # pass the dispatcher's measurements down so neither knn_pq's
        # budget guard nor derive_nlist re-counts the lineage
        known_n_cand, known_n_query = n_cand, n_query
    if strategy == "exact":
        return _knn_exact(
            queries, candidates, id_col, vec_col, k, metric, exclude_self, round_dp
        )
    if strategy == "broadcast":
        return _knn_broadcast(
            queries, candidates, id_col, vec_col, k, metric, exclude_self,
            round_dp, compress,
        )
    if strategy == "lsh":
        if metric == "cosine":
            # cosine top-k == L2 top-k on unit vectors (L2² = 2 - 2cos);
            # normalization happens inside the LSH numpy stage (no extra
            # plan nodes, no interpreted HOF norm), then the similarity
            # is recovered as 1 - L2²/2.
            res = _knn_lsh(
                queries, candidates, id_col, vec_col, k, exclude_self,
                round_dp, normalize=True, max_bucket_size=max_bucket_size,
            )
            return res.select(
                "query_id",
                "cand_id",
                F.round(F.lit(1.0) - F.col("distance") / 2, round_dp).alias(
                    "distance"
                ),
                "rank",
            )
        return _knn_lsh(
            queries, candidates, id_col, vec_col, k, exclude_self, round_dp,
            max_bucket_size=max_bucket_size,
        )
    if strategy == "ivf":
        if nlist is None:
            # explicit-tier default mirrors the auto degrade path:
            # derive cells from the candidate count instead of a fixed
            # 16 that stops partitioning the corpus at scale
            nlist = derive_nlist(candidates, known_n=known_n_cand)
        return _knn_ivf(
            queries, candidates, id_col, vec_col, k, metric, exclude_self, round_dp,
            nlist=nlist, nprobe=nprobe, fit=ivf_fit, compress=compress,
        )
    if strategy == "pq":
        # product-quantization / ADC tier (operators/pq.py): m uint8
        # codes per vector in the broadcast instead of dim float64 —
        # the memory end-game past int8. l2_sq only (ADC estimates
        # squared L2 directly).
        if metric != "l2_sq":
            raise ValueError("strategy='pq' supports metric='l2_sq' only")
        from semantic_ann_in_data_lake_spark.operators.pq import knn_pq

        return knn_pq(
            queries, candidates, id_col, vec_col, k=k,
            exclude_self=exclude_self, round_dp=round_dp,
            known_n_cand=known_n_cand, known_n_query=known_n_query,
        )
    if strategy == "pq_refine":
        # broadcast-ADC shortlist + exact re-rank (the refine stage of
        # the IVF-PQ variant applied to the broadcast tier)
        if metric != "l2_sq":
            raise ValueError(
                "strategy='pq_refine' supports metric='l2_sq' only"
            )
        from semantic_ann_in_data_lake_spark.operators.pq import (
            knn_pq_refine,
        )

        return knn_pq_refine(
            queries, candidates, id_col, vec_col, k=k,
            refine_factor=refine_factor,
            exclude_self=exclude_self, round_dp=round_dp,
        )
    if strategy in ("ivf_pq", "ivf_pq_refine"):
        # both-sides-huge compressed tier (operators/pq.py): IVF cell
        # shuffle carrying m uint8 codes; "_refine" re-scores an ADC
        # shortlist of k·refine_factor exactly on the raw vectors
        # (FAISS IndexRefineFlat shape) — exact distances, better
        # recall, still sub-quadratic. l2_sq only.
        if metric != "l2_sq":
            raise ValueError(
                f"strategy={strategy!r} supports metric='l2_sq' only"
            )
        from semantic_ann_in_data_lake_spark.operators.pq import (
            knn_ivf_pq,
            knn_ivf_pq_refine,
        )

        fn = knn_ivf_pq_refine if strategy == "ivf_pq_refine" else knn_ivf_pq
        extra = (
            {"refine_factor": refine_factor}
            if strategy == "ivf_pq_refine"
            else {}
        )
        return fn(
            queries, candidates, id_col, vec_col, k=k,
            nlist=nlist, nprobe=nprobe,
            exclude_self=exclude_self, round_dp=round_dp, **extra,
        )
    if strategy == "opq_refine":
        # OPQ shape (operators/embedproj.py): energy-interleaved
        # full-rank rotation, IVF-PQ shortlist on rotated vectors,
        # exact re-rank on raw. Exact distances, l2_sq only.
        if metric != "l2_sq":
            raise ValueError(
                "strategy='opq_refine' supports metric='l2_sq' only"
            )
        from semantic_ann_in_data_lake_spark.operators.embedproj import (
            knn_opq_refine,
        )

        return knn_opq_refine(
            queries, candidates, id_col, vec_col, k=k,
            refine_factor=refine_factor, nlist=nlist, nprobe=nprobe,
            exclude_self=exclude_self, round_dp=round_dp,
        )
    if strategy == "pca_refine":
        # rotate→compress→refine (operators/embedproj.py): IVF
        # shortlist in the top-m principal subspace (m-dim fold cost),
        # exact re-rank on raw vectors — FAISS PCAMatrix +
        # IndexRefineFlat shape. Exact distances, l2_sq only.
        if metric != "l2_sq":
            raise ValueError(
                "strategy='pca_refine' supports metric='l2_sq' only"
            )
        from semantic_ann_in_data_lake_spark.operators.embedproj import (
            knn_pca_refine,
        )

        return knn_pca_refine(
            queries, candidates, id_col, vec_col, k=k,
            refine_factor=refine_factor, nlist=nlist, nprobe=nprobe,
            exclude_self=exclude_self, round_dp=round_dp,
        )
    if strategy == "nndescent_refine":
        # graph-ANN in the top-m principal subspace, exact re-rank on
        # raw (operators/embedproj.py) — self-join, l2_sq only, same
        # guards as plain nndescent plus the refine knob
        if queries is not candidates:
            raise ValueError(
                "strategy='nndescent_refine' builds a self kNN graph: "
                "pass the same DataFrame object as queries and candidates"
            )
        if metric != "l2_sq":
            raise ValueError(
                "strategy='nndescent_refine' supports metric='l2_sq' only"
            )
        if not exclude_self:
            raise ValueError(
                "strategy='nndescent_refine' always excludes self pairs"
            )
        if compress is not None:
            raise ValueError(
                "strategy='nndescent_refine' scores raw vectors on the "
                "refine pass; compress is not supported"
            )
        from semantic_ann_in_data_lake_spark.operators.embedproj import (
            knn_nndescent_refine,
        )

        return knn_nndescent_refine(
            candidates, id_col=id_col, vec_col=vec_col, k=k,
            refine_factor=refine_factor, iters=iters, seed=seed,
            reverse_cap=reverse_cap, round_dp=round_dp,
            min_update_frac=min_update_frac,
        )
    if strategy == "nndescent":
        # graph-ANN tier (operators/nndescent.py): index-free iterated
        # co-neighbor refinement — a SELF-join construction (the graph
        # is over one corpus), exact distances, l2_sq only.
        if queries is not candidates:
            raise ValueError(
                "strategy='nndescent' builds a self kNN graph: pass the "
                "same DataFrame object as queries and candidates"
            )
        if metric != "l2_sq":
            raise ValueError(
                "strategy='nndescent' supports metric='l2_sq' only"
            )
        if not exclude_self:
            raise ValueError(
                "strategy='nndescent' always excludes self pairs"
            )
        if compress is not None:
            raise ValueError(
                "strategy='nndescent' scores raw vectors; compress is "
                "not supported"
            )
        from semantic_ann_in_data_lake_spark.operators.nndescent import (
            nndescent_knn_graph,
        )

        return nndescent_knn_graph(
            candidates, k=k, iters=iters, seed=seed, id_col=id_col,
            vec_col=vec_col, reverse_cap=reverse_cap,
            round_dp=round_dp, min_update_frac=min_update_frac,
        )
    if strategy == "graph":
        # graph-index QUERY tier (operators/graphsearch.py): build the
        # NN-descent graph over the candidates, answer the (DIFFERENT)
        # query frame by bounded-hop beam search — the hnswlib
        # knn_query analogue (`DeepJoin/annIndex.py:21-40`). Pass a
        # prebuilt/persisted edge list via ``graph=`` to amortize the
        # build across query batches. Self-join calls should use
        # strategy='nndescent': the graph IS the self answer.
        if queries is candidates:
            raise ValueError(
                "strategy='graph' answers OUT-OF-CORPUS queries; for a "
                "self kNN graph use strategy='nndescent'"
            )
        if metric != "l2_sq":
            raise ValueError("strategy='graph' supports metric='l2_sq' only")
        if compress is not None:
            raise ValueError(
                "strategy='graph' scores raw vectors; compress is not "
                "supported"
            )
        from semantic_ann_in_data_lake_spark.operators.graphsearch import (
            graph_search,
        )
        from semantic_ann_in_data_lake_spark.operators.nndescent import (
            nndescent_knn_graph,
        )

        g = graph
        if g is None:
            g = nndescent_knn_graph(
                candidates, k=k, iters=iters, seed=seed, id_col=id_col,
                vec_col=vec_col, reverse_cap=reverse_cap,
                round_dp=round_dp, min_update_frac=min_update_frac,
            )
        return graph_search(
            queries, candidates, g, k=k, beam=beam, hops=hops,
            id_col=id_col, vec_col=vec_col, seed=seed, round_dp=round_dp,
        )
    raise ValueError(f"unknown strategy {strategy!r}")


def _ranked_topk(scored: DataFrame, k: int, metric: str) -> DataFrame:
    order = (
        [F.col("distance").asc(), F.col("cand_id").asc()]
        if metric == "l2_sq"
        else [F.col("distance").desc(), F.col("cand_id").asc()]
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "distance", "rank")
    )


def _knn_exact(
    queries, candidates, id_col, vec_col, k, metric, exclude_self, round_dp
) -> DataFrame:
    # Round-12 optimization (guide §8): when the vector matrices fit
    # the broadcast budget, the |Q|·|C| crossJoin + interpreted fold is
    # replaced by the pairscore superset kernel — bit-identical
    # unrounded distances (sequential lane loop) emitted only for a
    # provable superset of the rounded top-k; the SAME JVM round +
    # window below then picks the final rows, so output is identical
    # (A/B-pinned, oracle-gated). Gates decline (None) on non-integral
    # ids, NULL/ragged vectors, duplicates, or over-budget corpora —
    # the declarative path below stands unchanged. l2_sq only; the
    # cosine exact tier keeps its declarative shape.
    if metric == "l2_sq":
        from semantic_ann_in_data_lake_spark.operators.pairscore import (
            exact_l2_topk_superset,
        )

        sup = exact_l2_topk_superset(
            queries, candidates, id_col, vec_col, k, exclude_self
        )
        if sup is not None:
            scored = sup.select(
                "query_id",
                "cand_id",
                F.round(F.col("d"), round_dp).alias("distance"),
            )
            return _ranked_topk(scored, k, metric)

    q = _prep(queries, id_col, vec_col, "query")
    c = _prep(candidates, id_col, vec_col, "cand")
    if metric == "cosine":
        # norms are per-ROW quantities: compute them once per side
        # before the join instead of re-folding both arrays per PAIR
        # (3× fewer array folds; same expression tree → bit-identical
        # values, oracle-safe). The norm fold matches functions.vectors.norm.
        from semantic_ann_in_data_lake_spark.functions.vectors import norm

        q = q.withColumn("query_norm", norm("query_vec"))
        c = c.withColumn("cand_norm", norm("cand_vec"))
    pairs = q.crossJoin(F.broadcast(c))
    if exclude_self:
        pairs = pairs.where(F.col("query_id") != F.col("cand_id"))
    if metric == "l2_sq":
        dist = l2_sq("query_vec", "cand_vec")
    else:
        from semantic_ann_in_data_lake_spark.functions.vectors import dot

        dist = dot("query_vec", "cand_vec") / (
            (F.col("query_norm") * F.col("cand_norm")) + F.lit(1e-12)
        )
    scored = pairs.select(
        "query_id", "cand_id", F.round(dist, round_dp).alias("distance")
    )
    return _ranked_topk(scored, k, metric)


def _np_topk_rows(qids, qmat, cids, cmat, k, metric, exclude_self, round_dp,
                  with_rank=True):
    """Shared numpy kernel: BLAS distance matrix + per-query stable top-k.

    ``cids``/``cmat`` MUST be pre-sorted by id so the stable argsort on
    rounded distances reproduces the declarative (distance, cand_id)
    tie-break. Distances are rounded BEFORE ranking (cross-engine
    reproducibility — module docstring).
    """
    import numpy as np

    sq_c = (cmat * cmat).sum(axis=1)
    if metric == "l2_sq":
        # ||q-c||² = ||q||² - 2q·c + ||c||², BLAS-backed
        d = (
            (qmat * qmat).sum(axis=1)[:, None]
            - 2.0 * (qmat @ cmat.T)
            + sq_c[None, :]
        )
        d = np.maximum(d, 0.0)
        asc = True
    else:
        qn = np.sqrt((qmat * qmat).sum(axis=1))
        cn = np.sqrt(sq_c)
        d = (qmat @ cmat.T) / (qn[:, None] * cn[None, :] + 1e-12)
        asc = False
    # Vectorized selection (a per-query python loop with a full argsort
    # was the measured hot spot, and rounding the FULL matrix costs more
    # than the matmul): work on key = ±d so "best" is always smallest,
    # knock out self-matches with +inf via one searchsorted, threshold
    # every row at its kth UNROUNDED key + one rounding quantum (any
    # candidate whose rounded key could tie the kth must lie within it),
    # then round and exact-tie-break ONLY the ≤ k+ties survivors.
    key = d if asc else -d
    if exclude_self:
        pos = np.searchsorted(cids, qids)
        ok = pos < len(cids)
        ri = np.nonzero(ok)[0]
        hit = ri[cids[pos[ok]] == qids[ri]]
        key[hit, pos[hit]] = np.inf
    kk = min(k, key.shape[1])
    kth = np.partition(key, kk - 1, axis=1)[:, kk - 1]
    quantum = 10.0 ** (-round_dp)
    with np.errstate(invalid="ignore"):
        mask = (key <= kth[:, None] + quantum) & np.isfinite(key)
    counts = mask.sum(axis=1)
    _, cols_idx = np.nonzero(mask)
    rows = []
    sign = 1.0 if asc else -1.0
    for i, cols in enumerate(np.split(cols_idx, np.cumsum(counts)[:-1])):
        if len(cols) == 0:
            continue
        # np.round is half-even and symmetric, so round(key)=±round(d)
        ki = np.round(key[i, cols], round_dp)
        # cols ascend in cand_id (cids pre-sorted), so a stable sort on
        # the rounded key alone reproduces the (distance, cand_id)
        # tie-break of the declarative round-then-rank plan
        order = np.argsort(ki, kind="stable")[:k]
        qi = int(qids[i])
        for r, (j, kv) in enumerate(zip(cols[order], ki[order]), start=1):
            row = (qi, int(cids[j]), float(sign * kv))
            rows.append(row + (r,) if with_rank else row)
    return rows


def _knn_broadcast(
    queries, candidates, id_col, vec_col, k, metric, exclude_self, round_dp,
    compress=None, known_n_cand=None, known_dim=None,
) -> DataFrame:
    """Strategy (b): the candidate matrix rides a broadcast variable; each
    query partition computes a BLAS distance matrix + argpartition top-k.

    Mirrors the role of the reference's in-process FAISS index
    (``join_discoverer.py:276-287``) with exact semantics up to BLAS
    summation order (see the module docstring's rounding-boundary
    caveat; ``compress="int8"`` trades near-exactness for an 8× smaller
    broadcast — see :func:`knn_join`).

    Memory guard: the candidate matrix must fit in driver AND executor
    memory. The auto-dispatcher's row estimate already routes oversized
    inputs to IVF, but an EXPLICIT strategy="broadcast" call used to
    trust the caller blindly — now the estimated matrix bytes are
    checked against a hard budget (``SPARK_GRAFT_KNN_BCAST_BUDGET_MB``,
    default 512) and oversized inputs degrade to the probe-all IVF path
    (same exact semantics, partitioned shuffle instead of a broadcast)
    with a logged warning.
    """
    import numpy as np

    spark = queries.sparkSession
    if known_dim is not None:
        dim = known_dim
    else:
        first = candidates.select(vec_col).head(1)
        dim = len(first[0][0]) if first and first[0][0] is not None else 0
    per_elem = 1 if compress == "int8" else 8
    n_cand = known_n_cand if known_n_cand is not None else _estimate_rows(candidates)
    if n_cand is None:
        # derived frame — no parquet footer to read. A full count()
        # here costs an entire extra scan of the candidate lineage per
        # call (measured on the doc-embedding bench queries); all the
        # guard needs is "more rows than the budget allows?", which a
        # LIMIT probe answers with bounded work: scan until budget+1
        # rows are produced, then stop.
        budget_rows = _broadcast_byte_budget() // max(dim * per_elem + 16, 1)
        probe = candidates.select(F.lit(1)).limit(budget_rows + 1).count()
        n_cand = probe  # == budget_rows + 1 iff over budget
    est_bytes = n_cand * dim * per_elem + n_cand * 16
    budget = _broadcast_byte_budget()
    if est_bytes > budget:
        import warnings

        if known_n_cand is None and _estimate_rows(candidates) is None:
            # the LIMIT probe only proved "over budget" — get the true
            # row count for nlist sizing (we are about to run a far
            # bigger IVF job; one count is noise next to it)
            n_cand = candidates.count()
            est_bytes = n_cand * dim * per_elem + n_cand * 16
        nlist = int(min(4096, max(16, 4 * (est_bytes / max(budget, 1)))))
        warnings.warn(
            f"knn_join(strategy='broadcast'): estimated candidate matrix "
            f"{est_bytes >> 20} MiB exceeds the {budget >> 20} MiB broadcast "
            f"budget; degrading to the exact probe-all IVF path "
            f"(nlist={nlist}). Raise SPARK_GRAFT_KNN_BCAST_BUDGET_MB to "
            f"override.",
            stacklevel=3,
        )
        return _knn_ivf(
            queries, candidates, id_col, vec_col, k, metric, exclude_self,
            round_dp, nlist=nlist, nprobe=nlist, fit="sample",
            compress=compress,
        )
    if compress == "int8":
        qrows = quantize_embeddings(candidates, id_col, vec_col).toPandas()
        cand_ids = qrows["vec_id"].to_numpy(dtype=np.int64)
        qmat_i8 = np.asarray(list(qrows["qvec"]), dtype=np.int8)
        scales = qrows["scale"].to_numpy(dtype=np.float64)
        order = np.argsort(cand_ids)
        cand_ids = cand_ids[order]
        # The payload crosses the wire as int8 (+1 double/row, 8×
        # narrower); workers rebuild float64 once per PROCESS via
        # _DEQUANT_CACHE (keyed by broadcast path), not once per task —
        # measured on sf0.1 embeddings: repeat int8 broadcast query
        # 6.1 s cold → 1.5 s with reused workers + cached rebuild.
        payload = (qmat_i8[order], scales[order])
    elif compress is None:
        cand_rows = (
            _prep(candidates, id_col, vec_col, "cand").toPandas()
        )
        cand_ids = np.asarray(cand_rows["cand_id"].to_numpy(), dtype=np.int64)
        cand_mat = np.asarray(list(cand_rows["cand_vec"]), dtype=np.float64)
        # Pre-sort candidates by id so numpy's stable argsort tie-break
        # matches the declarative (distance, cand_id) ordering.
        order = np.argsort(cand_ids)
        cand_ids, cand_mat = cand_ids[order], cand_mat[order]
        payload = cand_mat
    else:
        raise ValueError(f"unknown compress {compress!r}")
    bc = spark.sparkContext.broadcast((cand_ids, payload, compress))

    q = _prep(queries, id_col, vec_col, "query")
    # a single-file parquet source arrives as ONE partition → the whole
    # top-k would run on one task; spread queries across the executors
    # (narrow rows, one extra shuffle — negligible next to the scoring)
    target = spark.sparkContext.defaultParallelism
    if q.rdd.getNumPartitions() < target:
        q = q.repartition(target)
    out_schema = "query_id long, cand_id long, distance double, rank int"

    def topk(batches: Iterator) -> Iterator:
        import pandas as pd

        ids, data, comp = bc.value
        if comp == "int8":
            # Dequantize ONCE PER WORKER PROCESS, not per task: python
            # workers are reused across tasks (spark.python.worker.reuse)
            # and the broadcast file path is a stable per-broadcast key,
            # so the rebuilt float64 matrix is cached module-side. The
            # cache holds a single entry — a worker scores one index at
            # a time; a new broadcast evicts the previous rebuild.
            # No id(bc) fallback: id() values are recycled after GC, so
            # a reused worker could serve a stale matrix belonging to a
            # DIFFERENT broadcast index — if there is no stable _path,
            # skip the cache and dequantize per task instead.
            qi8, sc = data
            key = getattr(bc, "_path", None)
            if key is None:
                mat = qi8.astype(np.float64) * sc[:, None]
            else:
                cached = _DEQUANT_CACHE.get(key)
                if cached is None:
                    cached = qi8.astype(np.float64) * sc[:, None]
                    _DEQUANT_CACHE.clear()
                    _DEQUANT_CACHE[key] = cached
                mat = cached
        else:
            mat = data
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qmat = np.asarray(list(pdf["query_vec"]), dtype=np.float64)
            qids = pdf["query_id"].to_numpy(dtype=np.int64)
            rows = _np_topk_rows(
                qids, qmat, ids, mat, k, metric, exclude_self, round_dp
            )
            yield pd.DataFrame(
                rows, columns=["query_id", "cand_id", "distance", "rank"]
            )

    return q.mapInPandas(topk, schema=out_schema)


def _knn_lsh(
    queries, candidates, id_col, vec_col, k, exclude_self, round_dp,
    num_hash_tables: int = 4, bucket_length: float = 1.0, seed: int = 42,
    normalize: bool = False, max_bucket_size: int | None = None,
) -> DataFrame:
    """Strategy (c): random-projection bucket LSH (scalar-quantized
    p-stable LSH — the same hash family as Spark ML's
    ``BucketedRandomProjectionLSH``), re-expressed as explicit
    DataFrame stages so scoring stays BLAS-side.

    HNSW's (M, ef_construction) knobs (``annIndex.py:12-18``) map onto
    (num_hash_tables, bucket_length). Per table t: bucket =
    floor(v·g_t / bucket_length) with g_t seeded gaussian. Each side is
    bucketed in ONE vectorized pass; each (table, bucket) cogroup
    computes exact BLAS distances + a local top-k; cross-table
    duplicate pairs (identical exact distance) collapse in a
    dropDuplicates over ≤ num_hash_tables·k rows/query before the
    global merge. Neighbors that collide in no table are unfindable —
    recall < 1 by design, judged by the P/R/NDCG harness.

    vs Spark ML's ``approxSimilarityJoin`` (radius-cut + per-pair UDF
    distance + key-distinct on the full collision set): measured 9.6 s
    → ~2 s at sf0.1, and no finite-radius blind spot. Scale notes: the
    collision shuffle carries only (id, vec, table, bucket); hot
    buckets (many near-identical vectors) are the skew risk — shrink
    bucket_length or add tables, exactly the classic LSH tuning.
    Measured on sf0.1 64-dim embeddings (k=10, recall vs exact):
    (2, 0.5)→0.33, (4, 0.5)→0.55, (4, 1.0)→0.80 [default],
    (4, 2.0)→0.96 — wider buckets buy recall at the price of bigger
    cogroups, so prefer more tables at cluster scale.
    """
    import numpy as np
    import pandas as pd

    spark = queries.sparkSession
    c = _prep(candidates, id_col, vec_col, "cand")
    q = _prep(queries, id_col, vec_col, "query")
    first = c.select("cand_vec").head(1)
    if not first:
        return spark.createDataFrame(
            [], "query_id long, cand_id long, distance double, rank int"
        )
    dim = len(first[0][0])
    rng = np.random.RandomState(seed)
    proj = rng.standard_normal((num_hash_tables, dim))
    bc = spark.sparkContext.broadcast(proj)

    def bucketize(side: str):
        def run(batches):
            P = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                vecs = np.asarray(list(pdf.iloc[:, 1]), dtype=np.float64)
                if normalize:  # cosine-via-unit-L2: see knn_join
                    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
                    norms[norms == 0.0] = 1.0
                    vecs = vecs / norms
                    pdf = pdf.copy()
                    pdf[pdf.columns[1]] = pd.Series(
                        list(vecs), index=pdf.index
                    )
                B = np.floor((vecs @ P.T) / bucket_length).astype(np.int64)
                out = []
                for t in range(P.shape[0]):
                    part = pdf.copy()
                    part["table"] = t
                    part["bucket"] = B[:, t]
                    out.append(part)
                yield pd.concat(out, ignore_index=True)

        return run

    c_b = c.mapInPandas(
        bucketize("cand"),
        schema="cand_id long, cand_vec array<double>, table int, bucket long",
    )
    if max_bucket_size is not None:
        # Explicit hot-bucket bound: one (table, bucket) cogroup holds a
        # whole bucket in one pandas frame, so a 10k-identical-vector
        # bucket is an OOM/straggler risk AQE cannot split (the blowup
        # is inside one applyInPandas group, not across tasks). Keep a
        # deterministic cand_id-ordered prefix per bucket: the bucket is
        # hot because near-identical vectors collide there, so the
        # retained prefix still saturates every query's k slots at
        # near-identical distances (recall loss bounded; judged by the
        # recall harness like every approx knob).
        from pyspark.sql.window import Window as _W

        wb = _W.partitionBy("table", "bucket").orderBy(F.col("cand_id").asc())
        c_b = (
            c_b.withColumn("__bn", F.row_number().over(wb))
            .where(F.col("__bn") <= max_bucket_size)
            .drop("__bn")
        )
    q_b = q.mapInPandas(
        bucketize("query"),
        schema="query_id long, query_vec array<double>, table int, bucket long",
    )

    def score_bucket(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["query_id", "cand_id", "distance"]
        if len(qpdf) == 0 or len(cpdf) == 0:
            return pd.DataFrame(columns=cols)
        cids = cpdf["cand_id"].to_numpy(dtype=np.int64)
        cmat = np.asarray(list(cpdf["cand_vec"]), dtype=np.float64)
        order = np.argsort(cids)
        cids, cmat = cids[order], cmat[order]
        qids = qpdf["query_id"].to_numpy(dtype=np.int64)
        qmat = np.asarray(list(qpdf["query_vec"]), dtype=np.float64)
        rows = _np_topk_rows(
            qids, qmat, cids, cmat, k, "l2_sq", exclude_self, round_dp,
            with_rank=False,
        )
        return pd.DataFrame(rows, columns=cols)

    scored = (
        q_b.groupBy("table", "bucket")
        .cogroup(c_b.groupBy("table", "bucket"))
        .applyInPandas(score_bucket, schema="query_id long, cand_id long, distance double")
        # a pair colliding in several tables repeats with an IDENTICAL
        # exact distance — collapse before ranking so it occupies one slot
        .dropDuplicates(["query_id", "cand_id"])
    )
    return _ranked_topk(scored, k, "l2_sq")


def fit_ivf_centroids(
    c: DataFrame, nlist: int = 16, seed: int = 42, fit: str = "sample"
):
    """Fit the nlist IVF centroids over a prepped ``(cand_id,
    cand_vec)`` frame; returns a float64 numpy matrix (small,
    broadcastable). Shared by the per-run IVF strategy and the
    persistent index (operators/ivf_index.py).

    ``fit="kmeans_ml"``: distributed k-means|| — every candidate row
    participates, executors hold only their partitions; preferred at
    100 TB when the sample tier isn't representative (many fine cells,
    drifting data). ``fit="sample"``: driver-side Lloyd over a bounded
    sample — O(sample·d) regardless of table size; the collected
    sample is sorted by id so the seeded pick (and every approximate
    IVF result) is reproducible across sessions (limit() returns rows
    in partition-completion order otherwise)."""
    import numpy as np

    if fit == "kmeans_ml":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        train = c.select(
            array_to_vector(F.col("cand_vec").cast("array<double>")).alias("features")
        )
        km = KMeans(
            k=nlist, seed=seed, maxIter=10, initMode="k-means||"
        ).fit(train)
        return np.asarray(
            [ctr for ctr in km.clusterCenters()], dtype=np.float64
        )
    if fit == "sample":
        sample = c.select("cand_id", "cand_vec").limit(100_000).toPandas()
        sample = sample.sort_values("cand_id", kind="mergesort")
        mat = np.asarray(list(sample["cand_vec"]), dtype=np.float64)
        rng = np.random.RandomState(seed)
        centroids = mat[
            rng.choice(len(mat), size=min(nlist, len(mat)), replace=False)
        ]
        # BLAS |x|²-2x·c+|c|² form, same as pq.fit_pq: the (n, k, d)
        # broadcast-subtract allocates n·k·d floats per iteration and
        # became the dominant cost once nlist started scaling with the
        # corpus (derive_nlist); the Gram form allocates only n·k.
        sq = (mat * mat).sum(axis=1)[:, None]
        for _ in range(10):  # Lloyd iterations, driver-side on the sample
            d2 = (
                sq
                - 2.0 * (mat @ centroids.T)
                + (centroids * centroids).sum(axis=1)[None, :]
            )
            assign = d2.argmin(axis=1)
            # vectorized per-cell mean: bincount sums per assigned cell
            counts = np.bincount(assign, minlength=len(centroids))
            for j in range(mat.shape[1]):
                sums = np.bincount(
                    assign, weights=mat[:, j], minlength=len(centroids)
                )
                nz = counts > 0
                centroids[nz, j] = sums[nz] / counts[nz]
        return centroids
    raise ValueError(f"unknown ivf fit {fit!r}")


def _knn_ivf(
    queries, candidates, id_col, vec_col, k, metric, exclude_self, round_dp,
    nlist: int = 16, nprobe: int = 4, seed: int = 42, fit: str = "sample",
    compress: str | None = None,
) -> DataFrame:
    """Strategy (d): IVF-style partitioned search (FAISS IVF-Flat's
    shape, distributed).

    1. KMeans over (a sample of) the candidate vectors → nlist
       centroids (small, broadcastable);
    2. every candidate is assigned to its nearest centroid (one cell);
    3. every query probes its ``nprobe`` nearest cells;
    4. equi-join on cell id + exact distance + top-k window.

    The join is a plain shuffle on cell id, so BOTH sides scale out —
    unlike the broadcast strategy (candidate side must fit memory) —
    and recall degrades gracefully with nprobe/nlist instead of
    falling off a bucket cliff like LSH. Recall < 1 by design: the
    true neighbor may live in an unprobed cell.
    """
    import numpy as np
    import pandas as pd

    spark = queries.sparkSession
    c = _prep(candidates, id_col, vec_col, "cand")
    centroids = fit_ivf_centroids(c, nlist=nlist, seed=seed, fit=fit)
    bc = spark.sparkContext.broadcast(centroids)

    def assign_cells(n_cells: int):
        def run(batches):
            cents = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                vecs = np.asarray(list(pdf.iloc[:, 1]), dtype=np.float64)
                d2 = (
                    (vecs * vecs).sum(axis=1)[:, None]
                    - 2.0 * (vecs @ cents.T)
                    + (cents * cents).sum(axis=1)[None, :]
                )
                order = np.argsort(d2, axis=1, kind="stable")[:, :n_cells]
                out = pdf.copy()
                out["cells"] = [row.tolist() for row in order]
                yield out

        return run

    if compress == "int8":
        # The candidate side crosses the cell shuffle as the int8 index
        # (8× narrower than float64); cells dequantize qvec·scale at
        # scoring time. Distances become quantization-approximate —
        # same contract as the broadcast int8 tier.
        cq = quantize_embeddings(candidates, id_col, vec_col).select(
            F.col("vec_id").alias("cand_id"), "scale", "qvec"
        )

        def assign_q(batches):
            cents = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                vecs = np.asarray(list(pdf["qvec"]), dtype=np.float64)
                vecs *= pdf["scale"].to_numpy(dtype=np.float64)[:, None]
                d2 = (
                    (vecs * vecs).sum(axis=1)[:, None]
                    - 2.0 * (vecs @ cents.T)
                    + (cents * cents).sum(axis=1)[None, :]
                )
                out = pdf.copy()
                out["cell"] = d2.argmin(axis=1).astype("int32")
                yield out

        c_cells = cq.mapInPandas(
            assign_q, schema="cand_id long, scale double, qvec array<int>, cell int"
        )
    elif compress is None:
        c_cells = c.mapInPandas(
            assign_cells(1),
            schema="cand_id long, cand_vec array<double>, cells array<int>",
        ).select("cand_id", "cand_vec", F.col("cells")[0].alias("cell"))
    else:
        raise ValueError(f"unknown compress {compress!r}")
    q = _prep(queries, id_col, vec_col, "query")
    q_cells = q.mapInPandas(
        assign_cells(nprobe),
        schema="query_id long, query_vec array<double>, cells array<int>",
    ).select("query_id", "query_vec", F.explode("cells").alias("cell"))

    # Per-cell BLAS scoring with a LOCAL top-k, then a global merge over
    # ≤ nprobe·k survivors per query — the classic IVF merge. The naive
    # alternative (equi-join on cell + per-pair distance + one global
    # window) materializes |Q|·nprobe·(n/nlist) pairs and funnels them
    # all through the ranking shuffle (measured 13 s vs ~2 s at sf0.1);
    # here the shuffle after scoring carries only nprobe·k rows/query.
    # Each cogroup holds one cell (~n/nlist candidates + its probing
    # queries) — nlist grows with n, keeping cells worker-sized.
    # A query's global top-k over probed cells is contained in the union
    # of its per-cell top-ks, so the merge is lossless.
    import pandas as pd

    def score_cell(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["query_id", "cand_id", "distance"]
        if len(qpdf) == 0 or len(cpdf) == 0:
            return pd.DataFrame(columns=cols)
        cids = cpdf["cand_id"].to_numpy(dtype=np.int64)
        if "cand_vec" in cpdf.columns:
            cmat = np.asarray(list(cpdf["cand_vec"]), dtype=np.float64)
        else:  # int8 cells: dequantize qvec·scale at scoring time
            cmat = np.asarray(list(cpdf["qvec"]), dtype=np.float64)
            cmat *= cpdf["scale"].to_numpy(dtype=np.float64)[:, None]
        order = np.argsort(cids)
        cids, cmat = cids[order], cmat[order]
        qids = qpdf["query_id"].to_numpy(dtype=np.int64)
        qmat = np.asarray(list(qpdf["query_vec"]), dtype=np.float64)
        rows = _np_topk_rows(
            qids, qmat, cids, cmat, k, metric, exclude_self, round_dp,
            with_rank=False,
        )
        return pd.DataFrame(rows, columns=cols)

    scored = (
        q_cells.groupBy("cell")
        .cogroup(c_cells.groupBy("cell"))
        .applyInPandas(score_cell, schema="query_id long, cand_id long, distance double")
    )
    return _ranked_topk(scored, k, metric)


def threshold_join(knn: DataFrame, tau: float) -> DataFrame:
    """P7: declare a pair joinable iff sqrt(squared-L2) ≤ τ — exactly the
    reference's ``distance**0.5 <= dist_threshold``
    (``join_discoverer.py:318``).
    """
    return knn.where(F.sqrt(F.col("distance")) <= F.lit(tau))


def build_vector_index(
    emb: DataFrame, path: str, id_col: str = "vec_id", vec_col: str = "embedding"
) -> None:
    """S8 analog: persist the (id, vector) table as the engine's 'index'
    artifact. Spark has no incremental index file (SURVEY §4.3) — the
    artifact is columnar Parquet; strategies rebuild (lsh/ivf fit) or
    broadcast (exact/broadcast) from it at load."""
    emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<float>").alias("embedding"),
    ).write.mode("overwrite").parquet(path)


def load_vector_index(spark, path: str) -> DataFrame:
    """Load a persisted vector index artifact (validates schema)."""
    df = spark.read.parquet(path)
    assert {"vec_id", "embedding"} <= set(df.columns), df.columns
    return df


def quantize_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric int8 index compression: (vec_id, scale, qvec) with
    scale = max(|v|)/127 and qvec[i] = sign(v_i)·floor(|v_i|/scale+0.5)
    in [-127, 127] (round-half-away — engine-portable, no banker's
    rounding). 8× memory cut vs float64 is what keeps a billion-vector
    index broadcastable / cache-resident; rebuild ≈ qvec·scale.

    Shape: posexplode elements → one groupBy computing the max-abs AND
    the ordered element list → quantize via a transform over the BOUND
    agg output (cheap column refs only — quantizing an inline
    max-abs expression per element would re-scan the vector per
    element, the Catalyst HOF trap documented in operators.dedup).
    """
    ex = emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("__pos", "__x"),
    )
    agg = ex.groupBy("vec_id").agg(
        F.max(F.abs(F.col("__x"))).alias("__mx"),
        F.array_sort(F.collect_list(F.struct("__pos", "__x"))).alias("__vs"),
    )
    scale = F.col("__mx") / F.lit(127.0)
    qvec = F.transform(
        F.col("__vs"),
        lambda s: F.when(F.col("__mx") == 0, F.lit(0))
        .otherwise(F.signum(s["__x"]) * F.floor(F.abs(s["__x"]) / scale + F.lit(0.5)))
        .cast("int"),
    )
    return agg.select("vec_id", scale.alias("scale"), qvec.alias("qvec"))
