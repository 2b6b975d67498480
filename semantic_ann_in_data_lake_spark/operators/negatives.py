"""Negative sampling for contrastive embedding training.

The reference fine-tunes a contrastive model over column pairs
(``DeepJoin/train.py`` — positives from ground truth, negatives
implicit). Production contrastive pipelines need negatives EXPLICITLY,
and the two standard tiers are:

- **hard negatives**: the anchor's nearest non-positive neighbors —
  the examples that actually move a contrastive loss (Xiong et al.
  2021, ANCE). Mined here as: top-(k_neg + slack) ANN per anchor →
  anti-join the positive set → per-anchor re-rank → top-k_neg.
- **random negatives**: uniform non-positives as the cheap baseline /
  curriculum mix-in. Drawn by ranking a deterministic per-(anchor,
  candidate) hash — reproducible across runs and partitionings, no
  RNG state.

Spark shape: the ANN pass is the existing ``knn_join`` ladder (exact
tier = the oracle; broadcast/LSH/IVF at scale), everything after is
k-bounded per anchor: one left-anti join against positives, one
window. Random negatives rank a hash over a candidate pool —
production bounds the pool with a hash-threshold sample (sub-quadratic
end to end), the exact pool is the oracle tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semantic_ann_in_data_lake_spark.functions.hashing import portable_hash64
from semantic_ann_in_data_lake_spark.operators.knn import knn_join


def hard_negative_mine(
    emb: DataFrame,
    positives: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_neg: int = 5,
    slack: int = 5,
    metric: str = "cosine",
    strategy: str = "exact",
) -> DataFrame:
    """Per anchor: its ``k_neg`` nearest NON-positive neighbors.

    ``positives`` is ``(a_id, b_id)``; both orientations are treated
    as positive (contrastive pairs are symmetric). ``slack`` extra ANN
    candidates absorb the positives removed by the anti-join — if an
    anchor has more than ``slack`` positives inside its top-(k_neg +
    slack), the tail of its negatives is genuinely beyond the ANN
    horizon and the anchor yields fewer than ``k_neg`` rows (count,
    don't silently pad).

    Returns ``(anchor_id, neg_id, distance, neg_rank)``.
    """
    if k_neg < 1 or slack < 0:
        raise ValueError("k_neg must be >= 1 and slack >= 0")
    knn = knn_join(
        emb, emb, id_col, vec_col, k=k_neg + slack, metric=metric,
        strategy=strategy, exclude_self=True,
    )
    pos = positives.select(
        F.col(positives.columns[0]).alias("__pa"),
        F.col(positives.columns[1]).alias("__pb"),
    )
    sym = pos.unionByName(
        pos.select(F.col("__pb").alias("__pa"), F.col("__pa").alias("__pb"))
    ).distinct()
    kept = knn.join(
        sym,
        (knn["query_id"] == sym["__pa"]) & (knn["cand_id"] == sym["__pb"]),
        "left_anti",
    )
    order = (
        [F.col("distance").desc(), F.col("cand_id").asc()]
        if metric == "cosine"
        else [F.col("distance").asc(), F.col("cand_id").asc()]
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        kept.withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= k_neg)
        .select(
            F.col("query_id").alias("anchor_id"),
            F.col("cand_id").alias("neg_id"),
            "distance",
            "neg_rank",
        )
    )


def random_negatives(
    anchors: DataFrame,
    candidates: DataFrame,
    positives: DataFrame,
    id_col: str = "vec_id",
    k_neg: int = 5,
    seed: str = "",
    pool_fraction: float = 1.0,
) -> DataFrame:
    """Per anchor: ``k_neg`` pseudo-uniform non-positive candidates,
    ranked by a deterministic per-(anchor, candidate) hash — the same
    draw on every run and partitioning (resumable exports, ablations).

    ``pool_fraction < 1`` pre-thins the candidate side by an
    independent hash Bernoulli BEFORE the pairing — the sub-quadratic
    production posture (pool ≈ fraction·|C| per anchor is still vastly
    more than k_neg); 1.0 ranks the full cross pairing (oracle tier,
    |A|·|C| — test scale only).

    Returns ``(anchor_id, neg_id, neg_rank)``.
    """
    if k_neg < 1 or not 0 < pool_fraction <= 1:
        raise ValueError("k_neg >= 1 and 0 < pool_fraction <= 1 required")
    a = anchors.select(F.col(id_col).alias("anchor_id"))
    c = candidates.select(F.col(id_col).alias("neg_id"))
    if pool_fraction < 1:
        # deterministic Bernoulli: keep candidates whose hash falls
        # under the threshold (independent of the pairing hash below)
        thresh = int(pool_fraction * (1 << 60))
        c = c.where(
            portable_hash64(F.col("neg_id").cast("string"), seed=f"pool{seed}:")
            < F.lit(thresh)
        )
    pos = positives.select(
        F.col(positives.columns[0]).alias("__pa"),
        F.col(positives.columns[1]).alias("__pb"),
    )
    sym = pos.unionByName(
        pos.select(F.col("__pb").alias("__pa"), F.col("__pa").alias("__pb"))
    ).distinct()
    paired = (
        a.crossJoin(c)
        .where(F.col("anchor_id") != F.col("neg_id"))
        .join(
            sym,
            (F.col("anchor_id") == F.col("__pa"))
            & (F.col("neg_id") == F.col("__pb")),
            "left_anti",
        )
    )
    h = portable_hash64(
        F.concat(
            F.col("anchor_id").cast("string"),
            F.lit(f"|neg{seed}|"),
            F.col("neg_id").cast("string"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        h.asc(), F.col("neg_id").asc()
    )
    return (
        paired.withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= k_neg)
    )
