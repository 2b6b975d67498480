"""Product-quantization ANN tier (FAISS PQ/ADC's shape, distributed).

Extends the kNN strategy ladder (exact → broadcast → LSH → IVF,
``operators/knn.py``) with the memory end-game: PQ splits each vector
into ``m`` subvectors, k-means-quantizes each subspace to ``ksub``
codewords, and stores each vector as ``m`` small codes — at the m=16/ksub=256
default, a dim-64 float64 embedding becomes 16 bytes instead of 512
(32×; measured recall@10 ≈ 0.76 on the uniform-random test embeddings,
the adversarial case for PQ — m=32 trades to 16×/0.89). Query-side scoring is ADC (asymmetric distance computation):
one (m × ksub) lookup table of exact subsquared-distances per query,
then each candidate's approximate distance is m table lookups — no
decode, no per-pair float math.

Scale design:

- Codebooks are tiny (m·ksub·dsub doubles) and train on a bounded,
  id-sorted, seeded sample — same reproducibility discipline as the
  IVF ``fit="sample"`` tier (``knn.py:586``).
- Encoding is one Arrow-batched ``mapInPandas`` pass (vectorized
  argmin per subspace); encoded candidates are what an index build
  persists (cf. SURVEY §4.3's parquet index redesign).
- The broadcast carries ids + uint8 codes: the 512 MiB broadcast
  budget that holds 8M float64 dim-8 vectors holds 128M PQ-coded ones.
  Both-sides-huge deployments route cells through the IVF shuffle and
  apply PQ within cells — the codes column drops in wherever the
  float column went.
- Approximation contract: distances are ADC estimates (codebook
  reconstruction error); like the LSH/IVF tiers this ships rows-only
  at the oracle gate plus recall-vs-exact unit tests, per the repo's
  correctness model for genuinely approximate operators.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_ann_in_data_lake_spark.operators.knn import (
    DEFAULT_ROUND_DP,
    _prep,
    _ranked_topk,
    derive_nlist,
)


def derive_m(dim: int, cap: int = 96) -> int:
    """Dim-adaptive subquantizer count: ~4 dims per subspace (the
    FAISS-convention resolution), capped at ``cap``, reduced to the
    nearest divisor of ``dim``. The d=768 crossover bench
    (D768_BENCH.json, round 11) measured recall@10 collapsing to
    0.23-0.33 under the old fixed m=16 there (48-dim subspaces are far
    too coarse at real embedding widths), while at the gate corpus's
    d=64 this derives the SAME m=16 the oracle gates replay — so
    every ``m=None`` default below is gate-neutral."""
    m = max(1, min(cap, dim // 4 or 1))
    while dim % m:
        m -= 1
    return m


def train_pq_codebooks(
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int | None = None,
    ksub: int = 256,
    sample_limit: int = 100_000,
    seed: int = 42,
    iters: int = 10,
):
    """Per-subspace codebooks as a numpy array (m, ksub, dsub).

    Driver-side Lloyd iterations over a bounded, id-sorted sample
    (seeded) — deterministic across sessions and partitionings. The
    vector dim must divide evenly into ``m`` subspaces.
    """
    import numpy as np

    sample = (
        _prep(candidates, id_col, vec_col, "cand")
        .limit(sample_limit)
        .toPandas()
        .sort_values("cand_id", kind="mergesort")
    )
    mat = np.asarray(list(sample["cand_vec"]), dtype=np.float64)
    return _books_from_mat(mat, m, ksub, seed, iters)


def _books_from_mat(mat, m: int | None, ksub: int, seed: int, iters: int = 10):
    """Codebooks from an in-memory sample matrix (shared by
    train_pq_codebooks and knn_ivf_pq, which reuses ONE collected
    sample for both the coarse quantizer and the codebooks)."""
    import numpy as np

    dim = mat.shape[1]
    if m is None:
        m = derive_m(dim)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = mat[:, j * dsub:(j + 1) * dsub]
        k_eff = min(ksub, len(sub))
        cents = sub[rng.choice(len(sub), size=k_eff, replace=False)]
        sub_sq = (sub * sub).sum(axis=1)[:, None]
        for _ in range(iters):
            # BLAS expansion |x|²-2x·c+|c|²: O(n·ksub) memory — the
            # (n, ksub, dsub) broadcast form allocates ~800 MB per
            # iteration at the 100k sample (measured; dominated the
            # tier's bench time)
            d2 = (
                sub_sq
                - 2.0 * (sub @ cents.T)
                + (cents * cents).sum(axis=1)[None, :]
            )
            assign = d2.argmin(axis=1)
            # vectorized centroid update (round-11): the former
            # per-cluster boolean-mask loop cost ~2.5 s of the 2.9 s
            # fit at the 100k-sample posture (k_eff·iters·m mask scans
            # of the sample). np.add.at accumulates deterministically
            # in row order of the id-sorted sample, so the fit stays a
            # pure function of the input (summation grouping differs
            # from the old per-cluster mean at fp noise level — fit
            # QUALITY is what's pinned, by the pytest recall floors;
            # no oracle replays this fit, the recall meta-gates use
            # the hash-picked codewords).
            sums = np.zeros((k_eff, cents.shape[1]))
            np.add.at(sums, assign, sub)
            counts = np.bincount(assign, minlength=k_eff)
            nz = counts > 0
            cents[nz] = sums[nz] / counts[nz, None].astype(np.float64)
        if k_eff < ksub:  # degenerate tiny input: pad by repetition
            cents = np.concatenate(
                [cents, np.repeat(cents[:1], ksub - k_eff, axis=0)]
            )
        books[j] = cents
    return books


def pq_encode(
    candidates: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<int>) — each vector's per-subspace nearest
    codeword indices. One vectorized Arrow pass; this is the persisted
    form of a PQ index."""
    import numpy as np

    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(codebooks))

    def encode(batches: Iterator):
        import pandas as pd

        books = bc.value
        m, ksub, dsub = books.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.asarray(list(pdf["cand_vec"]), dtype=np.float64)
            codes = np.empty((len(vecs), m), dtype=np.int64)
            for j in range(m):
                sub = vecs[:, j * dsub:(j + 1) * dsub]
                d2 = (
                    (sub * sub).sum(axis=1)[:, None]
                    - 2.0 * (sub @ books[j].T)
                    + (books[j] * books[j]).sum(axis=1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["cand_id"], "codes": list(codes)}
            )

    return _prep(candidates, id_col, vec_col, "cand").mapInPandas(
        encode, schema="vec_id long, codes array<int>"
    )


def knn_pq(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int | None = None,
    ksub: int = 256,
    exclude_self: bool = True,
    round_dp: int = DEFAULT_ROUND_DP,
    seed: int = 42,
    known_n_cand: int | None = None,
    known_n_query: int | None = None,
) -> DataFrame:
    """Top-k by ADC-approximate squared L2 over the PQ-coded candidate
    index (broadcast tier).

    Returns ``(query_id, cand_id, distance, rank)`` like every other
    strategy; ``distance`` is the ADC estimate rounded to ``round_dp``
    with (distance, cand_id) rank tie-breaks, so results are
    deterministic even though approximate.
    """
    import numpy as np

    # imported at call time, NOT module level: knn is the single
    # monkeypatch seam for the budget probes (tests patch
    # knn._estimate_rows); a module-level binding here would freeze
    # the unpatched function
    from semantic_ann_in_data_lake_spark.operators.knn import (
        _broadcast_byte_budget,
        _estimate_rows,
    )

    spark = queries.sparkSession
    if m is None:
        # resolve before the byte guard (code bytes scale with m)
        first = candidates.select(vec_col).head(1)
        dim0 = len(first[0][0]) if first and first[0][0] is not None else 0
        m = derive_m(dim0) if dim0 else 16
    # the coded index is collected to the driver before broadcasting —
    # same discipline as _knn_broadcast's guard: estimate the code
    # bytes first and degrade to the cell-sharded IVF-PQ path instead
    # of OOMing the driver (codes are m ints + id ≈ m+16 bytes/row
    # once packed; the pandas interchange is wider, so the budget
    # check uses the broadcast-side size it protects)
    n_cand = known_n_cand if known_n_cand is not None else _estimate_rows(candidates)
    # PQ/ADC shrinks MEMORY, not compute: the broadcast scorer still
    # evaluates every (query, candidate) pair. Mirror auto-dispatch's
    # compute ceiling (SPARK_GRAFT_KNN_PAIR_BUDGET) so an oversized
    # explicit call degrades to the cell-sharded IVF-PQ tier instead of
    # running a quadratic job (VERDICT r5 carried item: pq.py had only
    # the byte guard). count() fallback is noise next to the full
    # encode+collect this tier performs anyway.
    import os

    if n_cand is None:
        n_cand = candidates.count()
    if known_n_query is not None:
        n_query = known_n_query
    elif queries is candidates:
        n_query = n_cand
    else:
        n_query = _estimate_rows(queries) or queries.count()
    pair_budget = float(os.environ.get("SPARK_GRAFT_KNN_PAIR_BUDGET", "1e10"))
    over_bytes = n_cand * (m + 16) > _broadcast_byte_budget()
    over_pairs = n_query * n_cand > pair_budget
    if over_bytes or over_pairs:
        import warnings

        why = (
            "exceed the broadcast budget even PQ-coded"
            if over_bytes
            else f"x {n_query} queries exceed the {pair_budget:.0e} pair budget"
        )
        warnings.warn(
            f"knn_pq: ~{n_cand} candidates {why}; degrading to "
            "knn_ivf_pq (cell-sharded).",
            stacklevel=2,
        )
        return knn_ivf_pq(
            queries, candidates, id_col, vec_col, k=k,
            nlist=derive_nlist(known_n=n_cand), nprobe=8, m=m,
            ksub=ksub, exclude_self=exclude_self, round_dp=round_dp,
            seed=seed,
        )
    books = train_pq_codebooks(
        candidates, id_col, vec_col, m=m, ksub=ksub, seed=seed
    )
    coded = pq_encode(candidates, books, id_col, vec_col).toPandas()
    cand_ids = coded["vec_id"].to_numpy(dtype=np.int64)
    codes = np.asarray(list(coded["codes"]), dtype=np.int64)
    order = np.argsort(cand_ids)
    cand_ids, codes = cand_ids[order], codes[order]
    bc = spark.sparkContext.broadcast((cand_ids, codes, np.asarray(books)))

    q = _prep(queries, id_col, vec_col, "query")
    target = spark.sparkContext.defaultParallelism
    if q.rdd.getNumPartitions() < target:
        q = q.repartition(target)

    def topk(batches: Iterator):
        import pandas as pd

        cids, cds, bks = bc.value
        mm, kk, dsub = bks.shape
        # flatten codes once per worker: dist row = lut.flat[off + code]
        # per-subspace code columns for the accumulating gather below
        code_cols = [cds[:, j] + j * kk for j in range(mm)]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qmat = np.asarray(list(pdf["query_vec"]), dtype=np.float64)
            qids = pdf["query_id"].to_numpy(dtype=np.int64)
            # ADC lookup tables for the WHOLE batch at once: per
            # subspace, |q_sub|² - 2 q_sub·c + |c|² → (nq, m·ksub);
            # then distances for all (query, candidate) pairs are one
            # fancy-indexed gather + sum — no per-query Python loop in
            # the LUT build (measured ~2× on the bench tier).
            lut = np.empty((len(qmat), mm * kk), dtype=np.float64)
            for j in range(mm):
                q_sub = qmat[:, j * dsub:(j + 1) * dsub]
                lut[:, j * kk:(j + 1) * kk] = (
                    (q_sub * q_sub).sum(axis=1)[:, None]
                    - 2.0 * (q_sub @ bks[j].T)
                    + (bks[j] * bks[j]).sum(axis=1)[None, :]
                )
            rows = []
            # 256-query blocks bound the (block, n_cand) gather at
            # ~2 MB per 1k candidates — batch-vectorized without an
            # O(nq·nc) allocation spike
            for lo in range(0, len(qmat), 256):
                hi = min(lo + 256, len(qmat))
                # accumulate per subspace: peak memory is ONE
                # (block, n_cand) array — the fused fancy gather
                # lut[block, flat_codes] materializes (block, n_cand, m),
                # m× larger, which at broadcast-tier candidate counts
                # OOMs the python worker before the broadcast budget
                # ever binds
                blk = lut[lo:hi]
                dist = blk[:, code_cols[0]].copy()
                for j in range(1, mm):
                    dist += blk[:, code_cols[j]]
                if exclude_self:
                    dist[qids[lo:hi, None] == cids[None, :]] = np.inf
                dr = np.round(dist, round_dp)
                for qi in range(hi - lo):
                    take = min(k, int((dr[qi] < np.inf).sum()))
                    idx = np.argsort(dr[qi], kind="stable")[:take]
                    for r, j in enumerate(idx, start=1):
                        rows.append(
                            (
                                int(qids[lo + qi]),
                                int(cids[j]),
                                float(dr[qi, j]),
                                r,
                            )
                        )
            yield pd.DataFrame(
                rows, columns=["query_id", "cand_id", "distance", "rank"]
            )

    scored = q.mapInPandas(
        topk, schema="query_id long, cand_id long, distance double, rank int"
    )
    # rank locally then re-rank declaratively for the standard contract
    return _ranked_topk(
        scored.select("query_id", "cand_id", "distance"), k, "l2_sq"
    )


def fit_ivf_pq(
    c: DataFrame, nlist: int = 16, m: int | None = None, ksub: int = 256,
    seed: int = 42,
):
    """Coarse centroids + RESIDUAL codebooks for the IVF-PQ tier, from
    ONE collected bounded id-sorted seeded sample (a second
    limit().toPandas() would double the driver collection); Lloyd in
    the BLAS |x|²-2x·c+|c|² form — the (n, nlist, dim) broadcast
    difference allocates ~800 MB/iteration at the 100k sample (the
    exact cost _books_from_mat's comment documents). Deterministic, so
    the ADC contract check can replay the identical quantization.

    Residual codebooks (FAISS IVF-PQ): quantize x − centroid(cell),
    not x. Residuals are centered and much smaller in norm than raw
    vectors, so the same ksub codewords spend their resolution on the
    within-cell geometry — ||q−x|| = ||q′−x′|| exactly when both
    subtract the same centroid, so ADC on residuals estimates the
    true distance with strictly less quantization error."""
    import numpy as np

    sample = (
        c.limit(100_000).toPandas().sort_values("cand_id", kind="mergesort")
    )
    mat = np.asarray(list(sample["cand_vec"]), dtype=np.float64)
    rng = np.random.RandomState(seed)
    cents = mat[rng.choice(len(mat), size=min(nlist, len(mat)), replace=False)]
    mat_sq = (mat * mat).sum(axis=1)[:, None]
    for _ in range(10):
        d2 = (
            mat_sq
            - 2.0 * (mat @ cents.T)
            + (cents * cents).sum(axis=1)[None, :]
        )
        assign = d2.argmin(axis=1)
        for j in range(len(cents)):
            members = mat[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    d2 = (
        mat_sq - 2.0 * (mat @ cents.T) + (cents * cents).sum(axis=1)[None, :]
    )
    books = _books_from_mat(mat - cents[d2.argmin(axis=1)], m, ksub, seed)
    return cents, books


def ivf_pq_encode(
    candidates: DataFrame, cents, books,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Standalone (cand_id, codes, cell) encoder under a FIXED
    quantizer — the replayable half of the IVF-PQ contract check (and
    the nightly-index form of the encode knn_ivf_pq performs
    inline)."""
    import numpy as np

    spark = candidates.sparkSession
    c = _prep(candidates, id_col, vec_col, "cand")
    bc = spark.sparkContext.broadcast((np.asarray(cents), np.asarray(books)))

    def run(batches: Iterator):
        import pandas as pd

        cents_, books_ = bc.value
        mm, _, dsub = books_.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.asarray(list(pdf["cand_vec"]), dtype=np.float64)
            d2 = (
                (vecs * vecs).sum(axis=1)[:, None]
                - 2.0 * (vecs @ cents_.T)
                + (cents_ * cents_).sum(axis=1)[None, :]
            )
            cell = d2.argmin(axis=1).astype("int32")
            res = vecs - cents_[cell]
            codes = np.empty((len(vecs), mm), dtype=np.int64)
            for j in range(mm):
                sub = res[:, j * dsub:(j + 1) * dsub]
                sd2 = (
                    (sub * sub).sum(axis=1)[:, None]
                    - 2.0 * (sub @ books_[j].T)
                    + (books_[j] * books_[j]).sum(axis=1)[None, :]
                )
                codes[:, j] = sd2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "cand_id": pdf["cand_id"].to_numpy(dtype=np.int64),
                    "codes": list(codes),
                    "cell": cell,
                }
            )

    return c.mapInPandas(
        run, schema="cand_id long, codes array<int>, cell int"
    )


def ivf_pq_decode(coded: DataFrame, cents, books) -> DataFrame:
    """Reconstruction under the IVF-PQ quantizer: ``centroid(cell) +
    residual_decode(codes)`` — the vector whose exact L2² to the raw
    query IS the reported residual-frame ADC distance
    (‖(q−c)−r‖ = ‖q−(c+r)‖), making the tier invariant-checkable."""
    import numpy as np

    spark = coded.sparkSession
    bc = spark.sparkContext.broadcast((np.asarray(cents), np.asarray(books)))

    def run(batches: Iterator):
        import pandas as pd

        cents_, books_ = bc.value
        mm, _, dsub = books_.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cs = np.asarray(list(pdf["codes"]), dtype=np.int64)
            dec = np.empty((len(cs), mm * dsub), dtype=np.float64)
            for j in range(mm):
                dec[:, j * dsub:(j + 1) * dsub] = books_[j][cs[:, j]]
            dec += cents_[pdf["cell"].to_numpy(dtype=np.int64)]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["cand_id"].to_numpy(dtype=np.int64),
                    "embedding": [row.tolist() for row in dec],
                }
            )

    return coded.mapInPandas(
        run, schema="vec_id long, embedding array<double>"
    )


def knn_ivf_pq(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int | None = None,
    nprobe: int = 4,
    m: int | None = None,
    ksub: int = 256,
    exclude_self: bool = True,
    round_dp: int = DEFAULT_ROUND_DP,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ: the both-sides-huge tier COMBINED with the compressed
    index — candidates cross the cell shuffle as m uint8 codes instead
    of dim float64 (the "codes column drops in wherever the float
    column went" promise of the PQ docstring, kept).

    Coarse quantizer: nlist centroids from the same bounded id-sorted
    seeded sample as the IVF tier; queries probe nprobe cells; per-cell
    scoring is ADC over the cell's codes with a per-query,
    per-probed-cell lookup table; the merge carries ≤ nprobe·k rows per
    query. Codebooks quantize RESIDUALS (x − centroid) — the FAISS
    IVF-PQ formulation; one shared residual codebook serves every cell.
    """
    import numpy as np
    import pandas as pd

    spark = queries.sparkSession
    c = _prep(candidates, id_col, vec_col, "cand")

    if nlist is None:
        # mirror knn_join's explicit-IVF default: cells scale ≈ √n so
        # per-cell ADC work stays bounded as the corpus grows
        nlist = derive_nlist(candidates)
    cents, books = fit_ivf_pq(c, nlist=nlist, m=m, ksub=ksub, seed=seed)
    bc = spark.sparkContext.broadcast((cents, np.asarray(books)))

    def encode_and_cell(batches):
        cents_, books_ = bc.value
        mm, kk, dsub = books_.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.asarray(list(pdf["cand_vec"]), dtype=np.float64)
            d2 = (
                (vecs * vecs).sum(axis=1)[:, None]
                - 2.0 * (vecs @ cents_.T)
                + (cents_ * cents_).sum(axis=1)[None, :]
            )
            cell = d2.argmin(axis=1).astype("int32")
            vecs = vecs - cents_[cell]  # residual encoding (see above)
            codes = np.empty((len(vecs), mm), dtype=np.int64)
            for j in range(mm):
                sub = vecs[:, j * dsub:(j + 1) * dsub]
                sd2 = (
                    (sub * sub).sum(axis=1)[:, None]
                    - 2.0 * (sub @ books_[j].T)
                    + (books_[j] * books_[j]).sum(axis=1)[None, :]
                )
                codes[:, j] = sd2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "cand_id": pdf["cand_id"],
                    "codes": list(codes),
                    "cell": cell,
                }
            )

    c_cells = c.mapInPandas(
        encode_and_cell, schema="cand_id long, codes array<int>, cell int"
    )

    def probe_cells(batches):
        cents_, _books = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.asarray(list(pdf["query_vec"]), dtype=np.float64)
            d2 = (
                (vecs * vecs).sum(axis=1)[:, None]
                - 2.0 * (vecs @ cents_.T)
                + (cents_ * cents_).sum(axis=1)[None, :]
            )
            order = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
            out = pdf.copy()
            out["cells"] = [row.tolist() for row in order]
            yield out

    q = _prep(queries, id_col, vec_col, "query")
    q_cells = q.mapInPandas(
        probe_cells,
        schema="query_id long, query_vec array<double>, cells array<int>",
    ).select("query_id", "query_vec", F.explode("cells").alias("cell"))

    def score_cell(key, qpdf, cpdf):
        cols = ["query_id", "cand_id", "distance"]
        if len(qpdf) == 0 or len(cpdf) == 0:
            return pd.DataFrame(columns=cols)
        cents_, books_ = bc.value
        mm, kk, dsub = books_.shape
        cids = cpdf["cand_id"].to_numpy(dtype=np.int64)
        codes = np.asarray(list(cpdf["codes"]), dtype=np.int64)
        order = np.argsort(cids)
        cids, codes = cids[order], codes[order]
        code_cols = [codes[:, j] + j * kk for j in range(mm)]
        qids = qpdf["query_id"].to_numpy(dtype=np.int64)
        qmat = np.asarray(list(qpdf["query_vec"]), dtype=np.float64)
        # the query also moves to THIS cell's residual frame — the
        # cogroup key is the cell id
        qmat = qmat - cents_[int(key[0])][None, :]
        # batch LUT build (see knn_pq.topk): (nq, m·ksub) in one BLAS
        # pass per subspace, then a blocked gather over the cell
        lut = np.empty((len(qmat), mm * kk), dtype=np.float64)
        for j in range(mm):
            q_sub = qmat[:, j * dsub:(j + 1) * dsub]
            lut[:, j * kk:(j + 1) * kk] = (
                (q_sub * q_sub).sum(axis=1)[:, None]
                - 2.0 * (q_sub @ books_[j].T)
                + (books_[j] * books_[j]).sum(axis=1)[None, :]
            )
        rows = []
        for lo in range(0, len(qmat), 256):
            hi = min(lo + 256, len(qmat))
            blk = lut[lo:hi]
            dist = blk[:, code_cols[0]].copy()  # see knn_pq: (block, n_cand) peak
            for j in range(1, mm):
                dist += blk[:, code_cols[j]]
            if exclude_self:
                dist[qids[lo:hi, None] == cids[None, :]] = np.inf
            dr = np.round(dist, round_dp)
            for qi in range(hi - lo):
                take = min(k, int((dr[qi] < np.inf).sum()))
                idx = np.argsort(dr[qi], kind="stable")[:take]
                for j in idx:
                    rows.append(
                        (int(qids[lo + qi]), int(cids[j]), float(dr[qi, j]))
                    )
        return pd.DataFrame(rows, columns=cols)

    scored = (
        q_cells.groupBy("cell")
        .cogroup(c_cells.groupBy("cell"))
        .applyInPandas(
            score_cell, schema="query_id long, cand_id long, distance double"
        )
    )
    return _ranked_topk(scored, k, "l2_sq")


def _exact_rerank(
    shortlist: DataFrame,
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    round_dp: int,
) -> DataFrame:
    """Shared refine stage: re-score a (query_id, cand_id) shortlist
    exactly on the raw vectors (two n·k′-row equi-joins + the
    declarative L2² fold) and return the standard ranked top-k.

    Round-12 negative result, kept honest: routing this through the
    pairscore kernel (operators/pairscore.py — a clear win inside the
    NN-descent rounds) measured a WASH here (interleaved best-of-3 at
    sf0.1: 3.88 s kernel vs 3.60 s joins on knn_ivf_pq_refine_l2_k10,
    similar on pca/opq/lloyd) — the shortlist is only n·k·rf rows, so
    the per-call driver collect of the vector matrix costs what the
    join + fold saves. The declarative path stays; the kernel remains
    the NN-descent scorer where the pair volume justifies it."""
    from semantic_ann_in_data_lake_spark.functions.vectors import l2_sq

    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    cv = candidates.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    rescored = (
        shortlist.join(qv, "query_id")
        .join(cv, "cand_id")
        .select(
            "query_id",
            "cand_id",
            F.round(l2_sq("__qv", "__cv"), round_dp).alias("distance"),
        )
    )
    return _ranked_topk(rescored, k, "l2_sq")


def knn_pq_refine(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    refine_factor: int = 4,
    m: int | None = None,
    ksub: int = 256,
    exclude_self: bool = True,
    round_dp: int = DEFAULT_ROUND_DP,
    seed: int = 42,
) -> DataFrame:
    """Broadcast-PQ with an exact re-rank — the refine stage of
    :func:`knn_ivf_pq_refine` applied to the broadcast/ADC tier: the
    compressed index shortlists ``k·refine_factor`` per query, the
    shortlist is re-scored on raw vectors, exact top-k out. Same two
    properties as the IVF variant (true L2² distances → symmetric
    invariant gate; recall monotone ≥ ADC-only). Inherits knn_pq's
    byte AND pair budget guards — an oversized call degrades through
    knn_pq to the cell-sharded tier before the refine join runs."""
    if refine_factor < 1:
        raise ValueError(f"refine_factor must be >= 1, got {refine_factor}")
    shortlist = knn_pq(
        queries, candidates, id_col, vec_col, k=k * refine_factor,
        m=m, ksub=ksub, exclude_self=exclude_self, round_dp=round_dp,
        seed=seed,
    ).select("query_id", "cand_id")
    return _exact_rerank(
        shortlist, queries, candidates, id_col, vec_col, k, round_dp
    )


def knn_ivf_pq_refine(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    refine_factor: int = 4,
    nlist: int | None = None,
    nprobe: int = 4,
    m: int | None = None,
    ksub: int = 256,
    exclude_self: bool = True,
    round_dp: int = DEFAULT_ROUND_DP,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ with an exact re-rank (refine) stage — the standard
    production ANN shape (FAISS ``IndexRefineFlat``): the compressed
    index shortlists ``k·refine_factor`` candidates per query by ADC,
    then the shortlist alone is re-scored against the RAW vectors and
    the exact top-k is returned.

    Two properties fall out:

    - **distances are exact** — unlike the plain PQ/IVF-PQ tiers, the
      returned ``distance`` is the true L2² between raw vectors, so
      the symmetric invariant projection
      (``checks.knn_invariant_violations`` with no ``cand_emb``)
      gates this tier exactly like the LSH/IVF ones;
    - **recall is monotone in refine_factor** — the final top-k can
      only improve on ADC top-k, since every exact-top-k member the
      shortlist captures survives the exact re-rank by definition.

    Scale design: the shortlist is n_query·k·refine_factor rows of
    (query_id, cand_id) — two equi-joins fetch the raw vectors (the
    candidate-side join is the only one touching the full corpus, and
    it ships exactly the shortlisted vectors), the exact distance is
    the declarative fold, and the re-rank is the shared WindowGroupLimit
    top-k. Nothing here is quadratic; the refine stage costs
    O(n_query·k·refine_factor·dim) on top of the IVF-PQ probe.
    """
    if refine_factor < 1:
        raise ValueError(f"refine_factor must be >= 1, got {refine_factor}")
    shortlist = knn_ivf_pq(
        queries, candidates, id_col, vec_col, k=k * refine_factor,
        nlist=nlist, nprobe=nprobe, m=m, ksub=ksub,
        exclude_self=exclude_self, round_dp=round_dp, seed=seed,
    ).select("query_id", "cand_id")
    return _exact_rerank(
        shortlist, queries, candidates, id_col, vec_col, k, round_dp
    )


def build_pq_index(
    candidates: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int | None = None,
    ksub: int = 256,
    seed: int = 42,
) -> None:
    """Persist a PQ index as TWO parquet artifacts under ``path``:
    ``codes/`` (vec_id, codes) — the data-sized but 32×-narrower part —
    and ``codebooks/`` (subspace, codeword, center) — the tiny
    trainable part. The write-once/reuse-many form of the S8 index
    story (``knn.py::build_vector_index``) for the compressed tier: a
    nightly encode job writes it; every downstream search loads codes
    without touching raw vectors."""
    import numpy as np

    spark = candidates.sparkSession
    books = train_pq_codebooks(
        candidates, id_col, vec_col, m=m, ksub=ksub, seed=seed
    )
    pq_encode(candidates, books, id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(f"{path}/codes")
    rows = [
        (int(j), int(c), [float(x) for x in books[j, c]])
        for j in range(books.shape[0])
        for c in range(books.shape[1])
    ]
    spark.createDataFrame(
        rows, "subspace int, codeword int, center array<double>"
    ).write.mode("overwrite").parquet(f"{path}/codebooks")


def load_pq_index(spark, path: str):
    """Load a persisted PQ index → (codes DataFrame, codebooks ndarray).
    Validates shapes; the codebooks frame is tiny (m·ksub rows)."""
    import numpy as np

    codes = spark.read.parquet(f"{path}/codes")
    assert {"vec_id", "codes"} <= set(codes.columns), codes.columns
    bk = spark.read.parquet(f"{path}/codebooks").collect()
    m = max(r["subspace"] for r in bk) + 1
    ksub = max(r["codeword"] for r in bk) + 1
    dsub = len(bk[0]["center"])
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for r in bk:
        books[r["subspace"], r["codeword"]] = r["center"]
    return codes, books


def pq_decode(
    codes: DataFrame, codebooks, id_col: str = "vec_id"
) -> DataFrame:
    """Reconstruct the quantized vectors from their codes:
    ``(vec_id, embedding)`` with ``embedding[j·dsub:(j+1)·dsub] =
    codebooks[j][codes[j]]``. The decode makes the ADC contract
    CHECKABLE: an ADC distance is BY DEFINITION the exact L2² between
    the raw query and this reconstruction, so
    ``checks.knn_invariant_violations(res, emb, cand_emb=decoded)``
    turns the approximate tier into an invariant-gated one. One
    Arrow-batched pass, codebooks broadcast."""
    import numpy as np

    spark = codes.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(codebooks))

    def run(batches: Iterator):
        import pandas as pd

        bks = bc.value
        mm, _, dsub = bks.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cs = np.asarray(list(pdf["codes"]), dtype=np.int64)
            dec = np.empty((len(cs), mm * dsub), dtype=np.float64)
            for j in range(mm):
                dec[:, j * dsub:(j + 1) * dsub] = bks[j][cs[:, j]]
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "embedding": [row.tolist() for row in dec],
                }
            )

    return codes.mapInPandas(
        run, schema="vec_id long, embedding array<double>"
    )
