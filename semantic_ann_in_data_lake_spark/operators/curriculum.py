"""Curriculum ordering: emit a deterministic global TRAINING ORDER over
a corpus, stratified by a difficulty score (curriculum learning,
Bengio et al. 2009; modern pipelines order or anneal by quality /
length / perplexity buckets rather than raw score to avoid starving
the loader of diversity).

The shape every curriculum variant reduces to:
  1. bucket documents by score quantile (exact equal-population
     difficulty strata — ntile semantics);
  2. shuffle WITHIN each bucket deterministically (md5 hash order — the
     engine's content-addressed shuffle convention, replayable and
     cross-engine);
  3. interleave buckets round-robin into one global order, so any
     contiguous training window sees every stratum at its corpus
     proportion while the stratum-internal order stays random-ish.

``order_idx = (rank_in_bucket − 1) · n_buckets + (bucket − 1)`` gives
the interleave without any global sort of the output — the index is
computed from a window over (bucket)-partitioned data; a trainer
ORDER BYs order_idx at read time (or uses it as the shard/row key at
write time, `layout.py`).

Scale note (the 100-TB plan shape): a naive ``ntile`` with no
partitionBy funnels the whole corpus through ONE task. Instead the
bucket is derived from AGGREGATES — per-score-value counts plus a
cumulative sum over the (small) distinct-score relation give each
row's exact global rank as ``base(score) + rank_within_score(id)``,
and the ntile bucket is closed-form integer arithmetic on that rank
and the total count. The only unpartitioned window runs over the
GROUPED score histogram (bounded by an Aggregate); every row-level
window is partitioned (by score for the within-rank, by bucket for
the interleave). Output is bit-identical to the single-task ntile.

Ascending score = easy-first curriculum; pass ``descending=True`` for
anti-curriculum. Every step is integer/window arithmetic on a total
order with id tie-breaks, so the full relation is cross-engine
hash-exact (`plans/q_text.py::curriculum_order_docs`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_ntile_buckets(
    df: DataFrame,
    score_col: str | Column,
    id_col: str = "doc_id",
    n_buckets: int = 4,
    descending: bool = False,
) -> DataFrame:
    """``(id, score, bucket)`` — exact ``ntile(n_buckets)`` over the
    (score, id) total order WITHOUT a global single-task window:
    global_rank = (count of rows ordered strictly before this score,
    from an aggregated histogram) + (row_number within the score
    group, partitioned window), then the standard ntile split — the
    first ``n mod B`` buckets take ``ceil(n/B)`` rows, the rest
    ``floor(n/B)``. Bit-identical to the naive ntile; the only
    unpartitioned window runs over the distinct-score relation (above
    an Aggregate, the plan-shape invariant). Scores are assumed
    non-null (engines order nulls differently; callers ``coalesce``
    upstream). Shared by curriculum ordering and score-decile reports
    (NB calibration)."""
    if n_buckets < 1:
        raise ValueError("n_buckets >= 1 required")
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    ident = F.col(id_col)
    scored = df.select(ident.alias("id"), score.alias("score"))

    # Exact-rank machinery from aggregates: histogram of score values,
    # cumulative count of strictly-preceding rows per distinct score.
    # The unpartitioned cumsum window sits ABOVE the groupBy aggregate,
    # so its input is the distinct-score relation, not the corpus.
    s_ord = F.col("score").desc() if descending else F.col("score").asc()
    hist = scored.groupBy("score").agg(F.count(F.lit(1)).alias("__cnt"))
    w_cum = Window.orderBy(s_ord).rowsBetween(Window.unboundedPreceding, -1)
    bounds = hist.select(
        F.col("score").alias("__s"),
        F.coalesce(F.sum("__cnt").over(w_cum), F.lit(0)).alias("__base"),
    )
    total = scored.agg(F.count(F.lit(1)).alias("__n"))

    w_score = Window.partitionBy("score").orderBy(F.col("id").asc())
    ranked = (
        scored.withColumn("__within", F.row_number().over(w_score))
        .join(bounds, F.col("score").eqNullSafe(F.col("__s")), "left")
        .drop("__s")
        .crossJoin(F.broadcast(total))
    )

    # ntile(B) over n rows: q = n div B, r = n mod B; the first r
    # buckets hold q+1 rows each, the remaining B−r hold q. A row at
    # global rank k lands in bucket ceil(k/(q+1)) while k ≤ r·(q+1),
    # else r + ceil((k − r·(q+1))/q). q = 0 (B > n) only reaches the
    # first branch (head = r = n ≥ k), so div-by-q never evaluates.
    # SQL `div` keeps everything in exact 64-bit integer arithmetic —
    # double `/` + cast('long') would rest the bit-identical-to-ntile
    # guarantee on IEEE rounding never crossing an integer boundary,
    # which can fail at very large rank/count magnitudes.
    B = int(n_buckets)
    prepared = ranked.withColumn(
        "__k", (F.col("__base") + F.col("__within")).cast("long")
    )
    bucket = F.expr(
        f"CASE WHEN __k <= (__n % {B}) * ((__n div {B}) + 1) "
        f"THEN ((__k - 1) div ((__n div {B}) + 1)) + 1 "
        f"ELSE (__n % {B}) + "
        f"((__k - (__n % {B}) * ((__n div {B}) + 1) - 1) div (__n div {B}))"
        f" + 1 END"
    )
    return prepared.select("id", "score", bucket.cast("int").alias("bucket"))


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
    break by id so bucketing is reproducible. Bucket assignment is
    :func:`exact_ntile_buckets` (aggregate-derived, no global
    single-task window)."""
    bucketed = exact_ntile_buckets(
        df, score_col, id_col=id_col, n_buckets=n_buckets,
        descending=descending,
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
