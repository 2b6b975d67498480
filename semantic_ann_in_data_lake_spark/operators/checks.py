"""Invariant projections for the approximate tier — the oracle-gateable
contracts of operators whose full results are approximate by design.

The driver's correctness gate compares a Spark result against a DuckDB
oracle by row count + schema + value multiset. An ANN result set cannot
be equality-gated (which pairs surface depends on bucketing), but the
reference's own ANN contract (``DeepJoin/annIndex.py:21-40``: HNSW
returns approximate *neighbors* with exact *distances*) is still
checkable: every returned pair's distance must equal the exact distance
recomputed independently from the raw vectors, ranks must be consecutive
and monotone in distance, self-pairs must be excluded, and near-dup
pairs must genuinely clear the τ threshold.

Each function here returns the VIOLATIONS of those invariants — a
DataFrame that is empty iff the contract holds — so the oracle is simply
``SELECT … WHERE FALSE`` with the same schema, and the driver's
rows+schema+hash gate becomes a real distributed property check (a
non-empty result fails the row-count compare and surfaces the violating
rows). Recall floors (how MUCH of the exact answer the approximation
finds) stay in pytest (`tests/test_operators.py`), where a measured
threshold belongs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semantic_ann_in_data_lake_spark.functions.vectors import cosine_sim, l2_sq

#: |reported − round(expected, 6)| above this is a violation. The numpy
#: paths compute distances via the BLAS expansion ‖q‖²−2q·c+‖c‖² which
#: sums in a different order than the declarative per-element fold used
#: for the recomputation, so values within ~1 ulp of a 6-dp rounding
#: boundary may legitimately round one step apart (knn.py module
#: docstring); one rounding step of slack keeps the check honest without
#: gating on float-summation order.
DIST_TOL = 1.5e-6


def knn_invariant_violations(
    knn: DataFrame,
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "l2_sq",
    round_dp: int = 6,
    tol: float = DIST_TOL,
    cand_emb: DataFrame | None = None,
) -> DataFrame:
    """Violations of the kNN result contract for ``knn`` (any strategy)
    over source vectors ``emb``: returns (query_id, cand_id, reported,
    expected, violation), EMPTY iff the contract holds.

    Checked invariants (`operators/knn.py` return contract):
    - ``distance`` equals the exact metric recomputed from the raw
      vectors (within one 6-dp rounding step — see :data:`DIST_TOL`);
    - no self pairs (``exclude_self=True`` paths);
    - ``rank`` is consecutive 1..n per query;
    - ``distance`` is monotone along rank (asc for l2_sq, desc for
      cosine) — ties must break by ``cand_id`` ascending.
    """
    # cand_emb: asymmetric contracts — e.g. the PQ/ADC tier, where the
    # reported distance is exact w.r.t. the RECONSTRUCTED candidate
    qv = emb.select(F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("__qv"))
    cside = cand_emb if cand_emb is not None else emb
    cv = cside.select(F.col(id_col).alias("cand_id"), F.col(vec_col).cast("array<double>").alias("__cv"))
    j = knn.join(qv, "query_id").join(cv, "cand_id")
    if metric == "l2_sq":
        expected = l2_sq("__qv", "__cv")
        worse = F.col("reported") < F.col("__prev_d")  # asc order
    elif metric == "cosine":
        expected = cosine_sim("__qv", "__cv")
        worse = F.col("reported") > F.col("__prev_d")  # desc order
    else:
        raise ValueError(f"unknown metric {metric!r}")
    w = Window.partitionBy("query_id").orderBy(F.col("rank").asc())
    flagged = j.select(
        "query_id",
        "cand_id",
        F.col("distance").alias("reported"),
        F.round(expected, round_dp).alias("expected"),
        "rank",
        F.lag("rank").over(w).alias("__prev_r"),
        F.lag("distance").over(w).alias("__prev_d"),
        F.lag("cand_id").over(w).alias("__prev_c"),
    )
    tie_broken_wrong = (F.col("reported") == F.col("__prev_d")) & (
        F.col("cand_id") < F.col("__prev_c")
    )
    violation = (
        F.when(F.abs(F.col("reported") - F.col("expected")) > tol, "distance")
        .when(F.col("query_id") == F.col("cand_id"), "self_pair")
        .when(F.coalesce(F.col("__prev_r"), F.lit(0)) != F.col("rank") - 1, "rank_gap")
        .when(worse | tie_broken_wrong, "rank_order")
    )
    return (
        flagged.withColumn("violation", violation)
        .where(F.col("violation").isNotNull())
        .select("query_id", "cand_id", "reported", "expected", "violation")
    )


def near_dup_invariant_violations(
    pairs: DataFrame,
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau: float = 0.3,
    round_dp: int = 6,
    tol: float = DIST_TOL,
) -> DataFrame:
    """Violations of the embedding near-dup contract for ``pairs``
    (id_a, id_b, cosine) from any strategy of
    :func:`..dedup.embedding_near_dups`: empty iff every emitted pair is
    canonical (id_a < id_b), genuinely clears τ, and carries the exact
    cosine recomputed from the raw vectors — i.e. the ANN tier's
    precision really is 1.0 even though its recall is not.
    """
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("__va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("__vb"))
    j = pairs.join(va, "id_a").join(vb, "id_b")
    expected = F.round(cosine_sim("__va", "__vb"), round_dp)
    violation = (
        F.when(F.col("id_a") >= F.col("id_b"), "not_canonical")
        .when(F.abs(F.col("cosine") - expected) > tol, "cosine")
        .when(F.col("cosine") < tau - tol, "below_tau")
    )
    return (
        j.select(
            "id_a", "id_b", F.col("cosine").alias("reported"),
            expected.alias("expected"),
            violation.alias("violation"),
        )
        .where(F.col("violation").isNotNull())
    )


def approx_distinct_bound_violations(
    df: DataFrame,
    table_name: str,
    rel_bound: float = 0.15,
    rsd: float = 0.05,
) -> DataFrame:
    """Violations of the HLL++ accuracy contract of
    :func:`..profiler.profile_approx_distinct`: per column, the sketch
    estimate must lie within ``rel_bound`` of the exact distinct count.
    Empty iff every column's estimate is in bounds.

    ``rel_bound`` = 3× the sketch's ``rsd`` (a deterministic sketch on a
    fixed dataset either passes or fails reproducibly — measured max
    relative error on the test lake is ~0.04 at rsd 0.05). Exact counts
    ride ONE wide aggregation (Spark plans multi-distinct via expand),
    so the check is a scan + two aggs regardless of column count.
    """
    from semantic_ann_in_data_lake_spark.operators.profiler import (
        profile_approx_distinct,
    )

    cols = df.columns
    exact_wide = df.agg(
        *[F.countDistinct(F.col(c)).alias(f"{c}__exact") for c in cols]
    )
    exact = exact_wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(f"{c}__exact").alias("exact_n_distinct"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.*")
    approx = profile_approx_distinct(df, table_name, rsd)
    j = approx.join(exact, "column_name")
    rel_err = F.abs(F.col("approx_n_distinct") - F.col("exact_n_distinct")) / F.greatest(
        F.col("exact_n_distinct"), F.lit(1)
    )
    return j.select(
        "table_name", "column_name", "approx_n_distinct", "exact_n_distinct",
        F.round(rel_err, 6).alias("rel_err"),
    ).where(rel_err > rel_bound)


def approx_percentile_bound_violations(
    df: DataFrame,
    value_col: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 1000,
) -> DataFrame:
    """Violations of `approx_percentile`'s RANK-ERROR contract.

    Spark's quantile sketch (Greenwald-Khanna variant) guarantees the
    returned value's exact rank is within ``n / accuracy`` of the
    target rank ``q·n``. The check recomputes each estimate's exact
    rank (count of values ≤ estimate — one conditional aggregation,
    no sort) and emits a row per quantile whose rank error exceeds the
    bound (+1 slack for rank-definition boundaries). Empty iff the
    sketch honors its contract; deterministic on a fixed dataset.

    100-TB posture: this is the EXACT-verification harness you run at
    test scale to trust the sketch; production runs only the sketch —
    a single pass of bounded state per partition vs the full
    range-shuffle an exact quantile needs.
    """
    vals = df.where(F.col(value_col).isNotNull())
    est_row = vals.agg(
        F.percentile_approx(
            F.col(value_col), F.array(*[F.lit(q) for q in quantiles]), accuracy
        ).alias("est"),
        F.count(F.lit(1)).alias("n"),
    )
    est = est_row.select(
        F.posexplode("est").alias("qi", "estimate"), "n"
    ).select(
        F.element_at(
            F.array(*[F.lit(q) for q in quantiles]), F.col("qi") + 1
        ).alias("q"),
        "estimate",
        "n",
    )
    ranked = est.join(
        vals.select(F.col(value_col).alias("__v")),
        F.col("__v") <= F.col("estimate"),
        "left",
    ).groupBy("q", "estimate", "n").agg(
        F.count("__v").alias("exact_rank")
    )
    bound = F.col("n") / F.lit(accuracy) + F.lit(1)
    target = F.col("q") * F.col("n")
    return ranked.where(
        F.abs(F.col("exact_rank") - target) > bound
    ).select(
        F.col("q").cast("double").alias("q"),
        F.col("estimate").cast("double").alias("estimate"),
        F.col("exact_rank").cast("long").alias("exact_rank"),
        F.round(target, 2).alias("target_rank"),
        F.lit("rank_error_exceeds_bound").alias("violation"),
    )


def fd_violations(
    df: DataFrame, determinant: list[str], dependent: list[str]
) -> DataFrame:
    """Functional-dependency check: determinant groups that map to MORE
    than one distinct dependent combination — empty iff ``determinant →
    dependent`` holds. The catalog-quality primitive behind key
    discovery and denormalization validation (is this column really a
    key? does this lookup table contradict itself?).

    One partial-aggregating groupBy on the determinant; the dependent
    combination is counted as a STRUCT so all-NULL and partial-NULL
    variants are distinct values rather than silently ignored (bare
    count-distinct drops NULLs — a dependency violated only via NULL
    would pass unchecked).

    Returns ``(determinant..., n_variants)``, n_variants > 1.
    """
    if not determinant or not dependent:
        raise ValueError("determinant and dependent must be non-empty")
    return (
        df.groupBy(*determinant)
        .agg(
            F.countDistinct(F.struct(*[F.col(c) for c in dependent])).alias(
                "n_variants"
            )
        )
        .where(F.col("n_variants") > 1)
    )


def table_diff(
    old: DataFrame, new: DataFrame, key: str, compare: list[str] | None = None
) -> DataFrame:
    """Keyed snapshot diff: ``(key, change)`` with change ∈ {added,
    removed, changed} — the ingestion audit between two versions of a
    table (what did yesterday's load actually do?).

    Rows compare by a 64-bit content hash over ``compare`` (default:
    all non-key columns, in a SORTED order so column order differences
    between snapshots don't read as changes). Unchanged rows are
    dropped in the join, so the output is |delta|-sized; the only
    shuffle is the key equi-join of (key, hash) projections — never
    the full rows.

    NULL discipline: the row hash nests a PER-COLUMN hash (NULL → the
    hash seed constant, position-preserving) — a flat
    ``xxhash64(c1, c2)`` SKIPS null inputs, so a value MOVING between
    columns (v=NULL,w='x' → v='x',w=NULL) would hash identically and
    the audit would report "no change" for a changed row.
    """
    if compare is None:
        compare = sorted(c for c in new.columns if c != key)
        old_compare = sorted(c for c in old.columns if c != key)
        if old_compare != compare:
            raise ValueError(
                f"snapshots disagree on columns: {old_compare} vs {compare}"
            )
    h = F.xxhash64(*[F.xxhash64(F.col(c)) for c in compare])
    o = old.select(F.col(key).alias("key"), h.alias("__oh"))
    n = new.select(F.col(key).alias("key"), h.alias("__nh"))
    j = o.join(n, "key", "full_outer")
    change = (
        F.when(F.col("__oh").isNull(), "added")
        .when(F.col("__nh").isNull(), "removed")
        .when(F.col("__oh") != F.col("__nh"), "changed")
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select("key", "change")
    )


def semdedup_invariant_violations(
    result: DataFrame,
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau: float = 0.95,
    seed: int = 42,
    max_cluster_size: int = 100_000,
    tol: float = DIST_TOL,
) -> DataFrame:
    """Violations of the SemDeDup contract for ``result`` (the output
    of ``operators/semdedup.semdedup`` over ``emb``): returns
    ``(vec_id, other_id, reported, expected, violation)``, EMPTY iff
    the contract holds.

    Checked invariants (`operators/semdedup.py` return contract):

    - ``coverage``: every input vector appears exactly once;
    - ``kept_pair``: no two KEPT vectors in the same sweep group share
      cosine > τ (the sweep group — (cluster, sub) — is recomputed
      here from the output's own cluster sizes and the
      content-addressed subsplit hash, so the check follows the
      operator's documented subsplit recall trade exactly);
    - ``kept_flags``: kept rows carry the sentinel witness
      (dup_of = −1, dup_cos = 0);
    - ``bad_witness``: a dropped row's ``dup_of`` names a KEPT row of
      the same cluster;
    - ``witness_below_tau``: a dropped row's ``dup_cos`` clears τ;
    - ``witness_cos``: ``dup_cos`` equals the cosine recomputed from
      the raw vectors (within :data:`DIST_TOL`).
    """
    v = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    out_schema = [
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("other_id").cast("long").alias("other_id"),
        F.col("reported").cast("double").alias("reported"),
        F.col("expected").cast("double").alias("expected"),
        F.col("violation").cast("string").alias("violation"),
    ]

    coverage = (
        v.select("vec_id")
        .join(result.select("vec_id", F.lit(1).alias("__o")), "vec_id", "full")
        .groupBy("vec_id")
        .agg(F.sum(F.coalesce("__o", F.lit(0))).alias("n"))
        .filter(F.col("n") != 1)
        .select(
            "vec_id",
            F.lit(-1).alias("other_id"),
            F.col("n").cast("double").alias("reported"),
            F.lit(1.0).alias("expected"),
            F.lit("coverage").alias("violation"),
        )
        .select(*out_schema)
    )

    sizes = result.groupBy("cluster").agg(F.count(F.lit(1)).alias("__cs"))
    n_sub = F.greatest(
        F.lit(1),
        F.ceil(F.col("__cs") / F.lit(max_cluster_size)).cast("int"),
    )
    r = (
        result.join(F.broadcast(sizes), "cluster")
        .withColumn(
            "__sub",
            F.when(
                n_sub > 1,
                F.pmod(F.xxhash64("vec_id", F.lit(seed)), n_sub),
            ).otherwise(F.lit(0)).cast("int"),
        )
        .join(v, "vec_id")
    )

    kept = r.filter(F.col("kept")).select(
        "cluster", "__sub", F.col("vec_id").alias("kid"),
        F.col("__v").alias("__kv"),
    )
    kept_pair = (
        kept.alias("a")
        .join(
            kept.alias("b"),
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.__sub") == F.col("b.__sub"))
            & (F.col("a.kid") < F.col("b.kid")),
        )
        .select(
            F.col("a.kid").alias("vec_id"),
            F.col("b.kid").alias("other_id"),
            cosine_sim("a.__kv", "b.__kv").alias("reported"),
            F.lit(float(tau)).alias("expected"),
            F.lit("kept_pair").alias("violation"),
        )
        .filter(F.col("reported") > F.lit(float(tau)) + F.lit(tol))
        .select(*out_schema)
    )

    kept_flags = (
        r.filter(F.col("kept"))
        .filter((F.col("dup_of") != -1) | (F.col("dup_cos") != 0.0))
        .select(
            "vec_id",
            F.col("dup_of").alias("other_id"),
            F.col("dup_cos").alias("reported"),
            F.lit(0.0).alias("expected"),
            F.lit("kept_flags").alias("violation"),
        )
        .select(*out_schema)
    )

    dropped = r.filter(~F.col("kept"))
    witness = dropped.alias("d").join(
        kept.alias("k"),
        (F.col("d.dup_of") == F.col("k.kid"))
        & (F.col("d.cluster") == F.col("k.cluster")),
        "left",
    )
    bad_witness = witness.filter(F.col("k.kid").isNull()).select(
        F.col("d.vec_id").alias("vec_id"),
        F.col("d.dup_of").alias("other_id"),
        F.col("d.dup_cos").alias("reported"),
        F.lit(float(tau)).alias("expected"),
        F.lit("bad_witness").alias("violation"),
    ).select(*out_schema)
    witness_below_tau = witness.filter(
        F.col("k.kid").isNotNull()
        & (F.col("d.dup_cos") <= F.lit(float(tau)) - F.lit(tol))
    ).select(
        F.col("d.vec_id").alias("vec_id"),
        F.col("d.dup_of").alias("other_id"),
        F.col("d.dup_cos").alias("reported"),
        F.lit(float(tau)).alias("expected"),
        F.lit("witness_below_tau").alias("violation"),
    ).select(*out_schema)
    witness_cos = witness.filter(F.col("k.kid").isNotNull()).select(
        F.col("d.vec_id").alias("vec_id"),
        F.col("d.dup_of").alias("other_id"),
        F.col("d.dup_cos").alias("reported"),
        cosine_sim("d.__v", "k.__kv").alias("expected"),
        F.lit("witness_cos").alias("violation"),
    ).filter(
        F.abs(F.col("reported") - F.col("expected")) > tol
    ).select(*out_schema)

    return (
        coverage.unionByName(kept_pair)
        .unionByName(kept_flags)
        .unionByName(bad_witness)
        .unionByName(witness_below_tau)
        .unionByName(witness_cos)
    )
