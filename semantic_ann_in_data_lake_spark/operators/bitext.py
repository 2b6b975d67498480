"""Margin-based parallel-text mining over embedding columns.

A core LLM-training-data pipeline step the reference's ANN machinery
stops just short of: align documents across two corpora (typically two
LANGUAGES) by embedding similarity, keeping only pairs whose best
match stands out from the local similarity background. Raw cosine
thresholds fail here — dense regions of embedding space produce high
absolute similarities for non-translations — so mining uses the RATIO
MARGIN of Artetxe & Schwenk (ACL 2019, "Margin-based Parallel Corpus
Mining with Multilingual Sentence Embeddings"):

    margin(x, y) = cos(x, y) /
        ( avg cos(x, NN_k(x)) / 2 + avg cos(y, NN_k(y)) / 2 )

i.e. a pair must beat the average of its OWN top-k neighborhoods.

Spark shape — entirely on the existing kNN operator:

- forward and backward top-k (`knn_join`, cosine) give both the
  candidate pairs and the neighborhood averages in the same result —
  no extra scoring pass;
- neighborhood sums aggregate INTEGER micro-similarities
  (``round(sim·1e6)``: the kNN output is already 6-dp-rounded, so the
  scaling is exact) — integer sums are order-independent, which keeps
  the margin bit-identical across engines and partitionings where a
  double summation would drift in the last ulp;
- the margin ranking follows the repo convention: order by the ROUNDED
  margin with an id tie-break.

Scale: with ``strategy="exact"`` the pair generation is the oracle
baseline (|src|·|tgt|); production passes ``strategy="broadcast" /
"lsh" / "ivf" / "auto"`` and every downstream step is top-k-bounded —
2k rows per document through one groupBy and two broadcast-sized
joins. 100 TB cost = two ANN passes + k-bounded bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semantic_ann_in_data_lake_spark.operators.knn import knn_join


def mine_bitext(
    src: DataFrame,
    tgt: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    k: int = 4,
    margin_tau: float = 1.0,
    strategy: str = "exact",
) -> DataFrame:
    """Mine aligned pairs ``(src_id, tgt_id, sim, margin)``.

    One row per src document: its margin-best target among its k
    nearest, kept only when ``margin ≥ margin_tau``. ``src`` and
    ``tgt`` must carry disjoint ``id_col`` values (they are different
    corpora; the kNN tiers key caches by id).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    fwd = knn_join(
        src, tgt, id_col, vec_col, k=k, metric="cosine",
        strategy=strategy, exclude_self=False,
    )
    bwd = knn_join(
        tgt, src, id_col, vec_col, k=k, metric="cosine",
        strategy=strategy, exclude_self=False,
    )
    # integer micro-sims: exact, order-independent accumulation
    fwd6 = fwd.select(
        F.col("query_id").alias("sid"),
        F.col("cand_id").alias("tid"),
        F.round(F.col("distance") * 1e6).cast("long").alias("sim6"),
    )
    bwd6 = bwd.select(
        F.col("query_id").alias("tid"),
        F.round(F.col("distance") * 1e6).cast("long").alias("sim6"),
    )
    fstats = fwd6.groupBy("sid").agg(
        F.sum("sim6").alias("ssum"), F.count(F.lit(1)).alias("scnt")
    )
    bstats = bwd6.groupBy("tid").agg(
        F.sum("sim6").alias("tsum"), F.count(F.lit(1)).alias("tcnt")
    )
    # the ratio margin is only meaningful over POSITIVE neighborhood
    # similarity mass: a zero denominator divides by zero (ANSI: kills
    # the job) and a negative one inverts the ranking so the FARTHEST
    # target scores highest — anchors whose neighborhoods are not
    # net-positive are dropped, not mis-ranked
    denom = (
        F.col("ssum").cast("double") / F.col("scnt")
        + F.col("tsum").cast("double") / F.col("tcnt")
    ) / 2
    scored = (
        fwd6.join(fstats, "sid")
        .join(bstats, "tid")
        .withColumn("__den", denom)
        .where(F.col("__den") > 0)
        .withColumn("margin", F.round(F.col("sim6") / F.col("__den"), 6))
        .drop("__den")
    )
    w = Window.partitionBy("sid").orderBy(
        F.col("margin").desc(), F.col("tid").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("margin") >= F.lit(margin_tau)))
        .select(
            F.col("sid").alias("src_id"),
            F.col("tid").alias("tgt_id"),
            (F.col("sim6") / F.lit(1000000.0)).alias("sim"),
            "margin",
        )
    )
