"""DSIR-style importance weighting for training-data selection.

Public method: Xie et al., *Data Selection for Language Models via
Importance Resampling* (NeurIPS 2023). Documents are featurized as
hashed n-gram bags (unigrams + positional bigrams hashed into ``B``
buckets); two smoothed bag-of-buckets generative models are fit — one
on the TARGET distribution, one on the RAW corpus — and each raw
document gets a log importance weight

    log w(x) = sum_g [ ln p_target(bucket(g)) - ln p_raw(bucket(g)) ]

over its grams. Selection is Gumbel-top-k: sampling without
replacement proportional to w(x) reduces to ranking
``log w(x) + Gumbel(0,1)`` and keeping the top k (Xie et al. §2.2).

Extension beyond the reference surface (its text handling stops at
normalization + serialization, ``search_query.py:16-17``): this is the
standard published recipe for "select the 5% of the crawl that looks
like the high-quality target" at pre-training scale.

Scale design (100 TB story):

- **Fit is bounded, score is row-local.** The only shuffle in the
  whole operator is the bucket-count aggregation: exploded grams
  group-by B buckets, where partial aggregation collapses each task's
  contribution to ≤B rows before the exchange — the shuffle moves
  O(tasks·B) rows regardless of corpus size, and hot buckets (stopword
  grams) are absorbed map-side. The fitted log-ratio table (≤B rows,
  B ≈ 1k–10k) is collected and inlined as a literal lookup array, so
  the scoring pass is pure whole-stage-codegen column math: tokenize,
  hash, array-aggregate — ZERO shuffle over the corpus.
- **Deterministic end-to-end.** Buckets use the engine-portable
  md5 hash; per-gram log-ratios are rounded to integer MICRO-units
  (1e-6) so the per-document sum is exact integer addition —
  associative, partition-order-independent, bit-identical in DuckDB.
  The Gumbel draw is a hash of the document id (content-addressed:
  retries and repartitions reproduce the same sample).
- **Selection without a global window.** Top-k goes through
  ``orderBy(...).limit(k)`` (TakeOrderedAndProject: per-partition
  heaps + k-row driver merge), and the selected flag is attached with
  a broadcast join of the k-row id set — no single-partition sort of
  the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from semantic_ann_in_data_lake_spark.cache import scoped_persist
from semantic_ann_in_data_lake_spark.functions.hashing import portable_hash64
from semantic_ann_in_data_lake_spark.functions.text import words

#: see textstats.ROUND_BIAS
_ROUND_BIAS = 1e-9

#: micro-unit scale for exact integer accumulation of log-ratios
_MICRO = 1_000_000

#: Gumbel uniform grid size (2^20): u = (h mod M + 0.5) / M keeps u
#: strictly inside (0, 1) so -ln(-ln(u)) is finite.
_GUMBEL_M = 1 << 20


def feature_grams(w: Column) -> Column:
    """Unigrams + positional bigrams from a MATERIALIZED words-array
    column (bound reference, not an expression tree — an inline
    ``words(text)`` would re-split the text per array position, the
    O(len²) trap documented on ``text.word_shingles_from``)."""
    n_bg = F.size(w) - 1
    bigrams = F.when(n_bg < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_bg),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i), F.element_at(w, i + 1)
            ),
        )
    )
    return F.concat(w, bigrams)


def _bucket_of(gram: Column, n_buckets: int, seed: str) -> Column:
    return portable_hash64(gram, seed=seed) % n_buckets


def fit_bucket_log_ratios(
    grams_df: DataFrame,
    is_target: Column,
    n_buckets: int = 1024,
    alpha: float = 1.0,
    seed: str = "dsir:",
) -> list[int]:
    """Fit the per-bucket importance log-ratio table.

    ``grams_df`` must carry a ``grams`` array column; ``is_target`` is
    a boolean column marking rows of the target distribution. Returns
    a dense length-``n_buckets`` list of MICRO-unit integers

        round( ( ln((cp_b + α)/(Tp + αB)) - ln((cq_b + α)/(Tq + αB))
                 + 1e-9 ) · 1e6 )

    where cp/cq are target/raw bucket gram counts and Tp/Tq their
    totals (add-α smoothing over B buckets). The collect is bounded by
    construction: ≤B rows ever reach the driver.
    """
    e = grams_df.select(
        is_target.alias("is_t"), F.explode("grams").alias("gram")
    ).select(
        "is_t", _bucket_of(F.col("gram"), n_buckets, seed).alias("b")
    )
    counts = e.groupBy("b").agg(
        F.count(F.lit(1)).alias("cq"),
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("cp"),
    )
    totals = counts.agg(
        F.sum("cq").alias("tq"), F.sum("cp").alias("tp")
    )
    ab = float(alpha) * n_buckets
    ratio_micro = F.round(
        (
            F.log((F.col("cp") + F.lit(alpha)) / (F.col("tp") + F.lit(ab)))
            - F.log((F.col("cq") + F.lit(alpha)) / (F.col("tq") + F.lit(ab)))
            + F.lit(_ROUND_BIAS)
        )
        * F.lit(_MICRO),
        0,
    ).cast("long")
    # buckets no gram ever hashed into score the smoothing-only prior
    # ln((Tq+αB)/(Tp+αB)) — relevant only when scoring a DIFFERENT
    # corpus than the fit corpus (computed Spark-side in the same
    # collect so the oracle's ln/round arithmetic is engine-identical)
    prior_micro = F.round(
        (
            F.log((F.col("tq") + F.lit(ab)) / (F.col("tp") + F.lit(ab)))
            + F.lit(_ROUND_BIAS)
        )
        * F.lit(_MICRO),
        0,
    ).cast("long")
    rows = (
        counts.crossJoin(F.broadcast(totals))
        .select("b", ratio_micro.alias("rm"), prior_micro.alias("prior"))
        .collect()
    )
    table = [int(rows[0]["prior"]) if rows else 0] * n_buckets
    for r in rows:
        table[int(r["b"])] = int(r["rm"])
    return table


def dsir_select(
    raw: DataFrame,
    target_pred: Column,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 1.0,
    seed: str = "dsir:",
) -> DataFrame:
    """Score every raw document with its DSIR log importance weight
    and flag the Gumbel-top-k sample.

    ``target_pred`` is a boolean expression over ``raw`` naming the
    target distribution (e.g. ``F.col("lang") == "en"``); an external
    target corpus is supported by unioning it in with a flag column.
    Returns ``(doc_id, n_grams, log_weight, sel_key, selected)`` —
    weights/keys in 4-dp doubles, ``selected`` marking the k sampled
    documents (ties broken by doc_id; draw is content-addressed by id,
    so the sample is stable under retries and repartitioning).
    """
    g = scoped_persist(
        raw.select(
            F.col(id_col).alias("doc_id"),
            target_pred.alias("is_t"),
            words(text_col).alias("w"),
        ).select(
            "doc_id", "is_t", feature_grams(F.col("w")).alias("grams")
        )
    )
    table = fit_bucket_log_ratios(
        g, F.col("is_t"), n_buckets=n_buckets, alpha=alpha, seed=seed
    )
    # literal lookup array: bucket -> micro log-ratio (1-indexed for
    # element_at). Row-local scoring — no shuffle over the corpus.
    arr = F.array(*[F.lit(v) for v in table])
    wm = F.aggregate(
        F.transform(
            F.col("grams"),
            lambda gr: _bucket_of(gr, n_buckets, seed).cast("int"),
        ),
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.element_at(arr, b + 1),
    )
    u = (
        (portable_hash64(F.col("doc_id").cast("string"), seed=seed + "g:")
         % _GUMBEL_M).cast("double")
        + 0.5
    ) / F.lit(float(_GUMBEL_M))
    gumbel_micro = F.round(
        (-F.log(-F.log(u)) + F.lit(_ROUND_BIAS)) * F.lit(_MICRO), 0
    ).cast("long")
    keyed = g.select(
        "doc_id",
        F.size("grams").cast("int").alias("n_grams"),
        wm.alias("wm"),
        (wm + gumbel_micro).alias("km"),
    )
    topk = (
        keyed.select("doc_id", "km")
        .orderBy(F.col("km").desc(), F.col("doc_id"))
        .limit(k)
        .select("doc_id", F.lit(True).alias("selected"))
    )
    micro = float(_MICRO)
    return (
        keyed.join(F.broadcast(topk), "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.round(F.col("wm") / micro + F.lit(_ROUND_BIAS), 4).alias(
                "log_weight"
            ),
            F.round(F.col("km") / micro + F.lit(_ROUND_BIAS), 4).alias(
                "sel_key"
            ),
            F.coalesce("selected", F.lit(False)).alias("selected"),
        )
    )
