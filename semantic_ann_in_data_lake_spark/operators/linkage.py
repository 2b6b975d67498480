"""Record linkage: sorted-neighborhood blocking + Fellegi–Sunter
match scoring.

Public methods: Hernández & Stolfo, *The Merge/Purge Problem for
Large Databases* (SIGMOD 1995) — sort the union of both sources by a
blocking key and compare only records within a sliding window of the
sort order; and Fellegi & Sunter, *A Theory for Record Linkage*
(JASA 1969) — score a candidate pair by the sum of per-field
log-likelihood ratios: ``log(m/u)`` when the field agrees,
``log((1−m)/(1−u))`` when it disagrees, where ``m`` is the agreement
probability among true matches and ``u`` among random non-matches.
``u`` is estimated from the data itself (the standard frequency-table
estimate): ``u_f = Σ_v c_v(c_v−1) / n(n−1)`` — the probability two
random records agree on field ``f``.

Extension beyond the reference surface: the reference's pair
construction is ground-truth-driven (``pairsBuilder.py``); blocking +
probabilistic scoring is the published recipe for finding matches
WITHOUT ground truth — the entity-resolution leg of a lake-curation
pipeline (complements the similarity-join family: PPJoin/PassJoin
match strings, this matches RECORDS across fields).

Scale design:

- **Blocking is the ranks.py pattern**: `global_row_number` (one
  range shuffle + an n_partitions-row offset aggregate — no
  single-partition window), then a BAND equi-join on rank buckets
  (``rn div W`` joined to ``{bucket, bucket−1}``): every pair within
  rank distance < W shares a bucket or sits in adjacent ones, so the
  join is keyed, never all-pairs; per-key fan-out is bounded by 2W.
- **u-estimation is one groupBy per field** over value counts
  (partial-agg collapsed), reduced to a single (Σc(c−1), n) pair per
  field — a bounded driver literal, same discipline as the synonym
  vocabulary. ``m`` is a caller parameter (the EM fit that usually
  produces it is an offline concern; the scoring plumbing is
  unchanged when a fitted m arrives).
- **Scoring is row-local integer math**: per-field weights are
  6-dp micro-unit constants folded into a CASE sum — exact,
  partition-order-independent, engine-portable (the dsir.py
  discipline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from semantic_ann_in_data_lake_spark.operators.ranks import global_row_number

#: see textstats.ROUND_BIAS / dsir._MICRO
_ROUND_BIAS = 1e-9
_MICRO = 1_000_000


def sorted_neighborhood_pairs(
    df: DataFrame,
    order_cols: list[str],
    id_col: str,
    window: int = 5,
    num_partitions: int | None = None,
) -> DataFrame:
    """Candidate pairs from one pass of sorted-neighborhood blocking.

    Returns every pair of rows whose global rank distance under
    ``order_cols`` (ties broken by ``id_col``) is strictly less than
    ``window`` — exactly the pairs a width-``window`` sliding window
    over the sorted file compares. Output columns: the two sides'
    ``id_col`` (suffixed ``_a``/``_b``, with ``rank_a < rank_b``) plus
    both ranks. Cost: one range shuffle (the rank), one bucket-keyed
    equi-join with fan-out ≤ 2·window per row.
    """
    if window < 2:
        raise ValueError("window must be ≥ 2 (a 1-window compares nothing)")
    ranked = global_row_number(
        df, [*order_cols, id_col], out_col="__rn",
        num_partitions=num_partitions,
    ).select(id_col, "__rn")
    w = int(window)
    a = ranked.select(
        F.col(id_col).alias(f"{id_col}_a"),
        F.col("__rn").alias("rank_a"),
        F.floor(F.col("__rn") / w).alias("__bkt"),
    )
    # a pair with 0 < rank_b - rank_a < w shares b's bucket or sits in
    # the one before it — probe both (bounded 2-explode, not a theta join)
    b = ranked.select(
        F.col(id_col).alias(f"{id_col}_b"),
        F.col("__rn").alias("rank_b"),
        F.explode(
            F.array(
                F.floor(F.col("__rn") / w),
                F.floor(F.col("__rn") / w) - 1,
            )
        ).alias("__bkt"),
    )
    return (
        a.join(b, "__bkt")
        .filter(
            (F.col("rank_b") > F.col("rank_a"))
            & (F.col("rank_b") - F.col("rank_a") < w)
        )
        .drop("__bkt")
    )


def estimate_u_counts(df: DataFrame, field: str) -> tuple[int, int]:
    """Exact ingredients of the frequency-table u estimate for
    ``field``: returns ``(Σ_v c_v(c_v−1), n)`` so the caller computes
    ``u = Σ/ (n(n−1))`` engine-side. One partial-agg groupBy reduced
    to a single row; NULLs count as a regular value (two NULLs agree,
    matching SQL ``IS NOT DISTINCT FROM`` agreement)."""
    row = (
        df.groupBy(F.col(field).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .agg(
            F.sum(F.col("__c") * (F.col("__c") - 1)).alias("s"),
            F.sum("__c").alias("n"),
        )
        .collect()[0]
    )
    return int(row["s"] or 0), int(row["n"] or 0)


def fs_scores(
    pairs: DataFrame,
    fields: list[tuple[Column, float, tuple[int, int]]],
    out_col: str = "fs_score",
) -> DataFrame:
    """Fellegi–Sunter score: per-field log-likelihood ratios summed in
    exact micro-units.

    ``fields`` is a list of ``(agree_expr, m, (u_sum, u_n))`` — the
    boolean agreement expression over ``pairs``, the assumed match
    agreement probability ``m``, and the u-estimate ingredients from
    :func:`estimate_u_counts`. Weights are computed engine-side from
    those exact integers (6-dp micro rounding), so results are
    bit-identical to a SQL twin running the same arithmetic. u is
    clamped to [1/(n(n−1)), 1 − 1/(n(n−1))] so degenerate fields
    (all-equal or all-distinct) keep finite weights.
    """
    total = None
    for agree, m, (u_sum, u_n) in fields:
        if not (0.0 < float(m) < 1.0):
            # m=1 → log(0)=-inf disagreement weight; m≤0 or m≥1 likewise
            # produce -inf/NaN that the micro-unit round+cast turns into
            # garbage scores instead of an error
            raise ValueError(
                f"match probability m must be in (0, 1), got {m!r}"
            )
        denom = u_n * (u_n - 1)
        if denom <= 0:
            raise ValueError("u estimate needs at least 2 rows")
        u = F.least(
            F.greatest(
                F.lit(float(u_sum)) / F.lit(float(denom)),
                F.lit(1.0) / F.lit(float(denom)),
            ),
            F.lit(1.0) - F.lit(1.0) / F.lit(float(denom)),
        )
        aw = F.round(
            (F.log(F.lit(float(m))) - F.log(u) + F.lit(_ROUND_BIAS))
            * F.lit(_MICRO),
            0,
        ).cast("long")
        dw = F.round(
            (
                F.log(F.lit(1.0 - float(m)))
                - F.log(F.lit(1.0) - u)
                + F.lit(_ROUND_BIAS)
            )
            * F.lit(_MICRO),
            0,
        ).cast("long")
        term = F.when(agree, aw).otherwise(dw)
        total = term if total is None else total + term
    if total is None:
        raise ValueError("fields must be non-empty")
    return pairs.withColumn(
        out_col,
        F.round(total / F.lit(float(_MICRO)) + F.lit(_ROUND_BIAS), 4),
    )
