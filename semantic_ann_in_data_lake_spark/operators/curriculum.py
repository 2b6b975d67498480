"""Curriculum ordering: emit a deterministic global TRAINING ORDER over
a corpus, stratified by a difficulty score (curriculum learning,
Bengio et al. 2009; modern pipelines order or anneal by quality /
length / perplexity buckets rather than raw score to avoid starving
the loader of diversity).

The shape every curriculum variant reduces to:
  1. bucket documents by score quantile (ntile — equal-population
     difficulty strata);
  2. shuffle WITHIN each bucket deterministically (md5 hash order — the
     engine's content-addressed shuffle convention, replayable and
     cross-engine);
  3. interleave buckets round-robin into one global order, so any
     contiguous training window sees every stratum at its corpus
     proportion while the stratum-internal order stays random-ish.

``order_idx = (rank_in_bucket − 1) · n_buckets + (bucket − 1)`` gives
the interleave without any global sort of the output — the index is
computed from two window functions over (bucket)-partitioned data; a
trainer ORDER BYs order_idx at read time (or uses it as the shard/row
key at write time, `layout.py`).

Ascending score = easy-first curriculum; pass ``descending=True`` for
anti-curriculum. Every step is integer/window arithmetic on a total
order with id tie-breaks, so the full relation is cross-engine
hash-exact (`plans/q_text.py::curriculum_order_docs`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def curriculum_order(
    df: DataFrame,
    score_col: str | Column,
    id_col: str = "doc_id",
    n_buckets: int = 4,
    seed: int = 42,
    descending: bool = False,
) -> DataFrame:
    """``(id, score, bucket, order_idx)`` — see module docstring.

    ``order_idx`` is unique and dense per bucket-chain; ties in score
    break by id so bucketing is reproducible. The only shuffles are
    the two window partitions (one unpartitioned ntile over the
    (score, id) total order — acceptable because ntile streams in
    sort order with O(1) state; for corpora too big for one sort,
    pre-bucket by approx quantiles instead)."""
    if n_buckets < 1:
        raise ValueError("n_buckets >= 1 required")
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    ident = F.col(id_col)
    order = [score.desc() if descending else score.asc(), ident.asc()]
    w_all = Window.orderBy(*order)
    bucketed = df.select(
        ident.alias("id"),
        score.alias("score"),
        F.ntile(n_buckets).over(w_all).alias("bucket"),
    )
    shuffle_key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col("id").cast("string"))
    )
    w_b = Window.partitionBy("bucket").orderBy(shuffle_key.asc(), F.col("id").asc())
    return bucketed.select(
        "id",
        "score",
        "bucket",
        (
            (F.row_number().over(w_b) - F.lit(1)) * F.lit(n_buckets)
            + (F.col("bucket") - F.lit(1))
        ).cast("long").alias("order_idx"),
    )
