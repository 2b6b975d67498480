"""The five-stage curation funnel as a reusable operator.

Extracted from the gated registry query ``curation_funnel_docs``
(plans/q_text.py keeps the DuckDB oracle twin) so the streaming
quality monitor can run the identical stage pipeline per micro-batch.
Stage semantics and the one-scan design are documented on the
registry entry; expressions here are byte-identical to the gated
shape — any change must keep the oracle hash-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_ann_in_data_lake_spark.cache import scoped_persist
from semantic_ann_in_data_lake_spark.functions.text import (
    normalize_sentence,
    word_shingles_from,
)
from semantic_ann_in_data_lake_spark.operators.textstats import (
    LANG_MARKERS,
    ROUND_BIAS,
    STOPWORDS,
    _count_in,
)


def _entropy_band_flag(n, lo: float, hi: float):
    """Char-entropy band flag over an already-normalized string column
    ``n`` — true iff entropy/log2(alphabet) ∈ [lo, hi] with ≥2 distinct
    chars. Produces the IDENTICAL integer micro-unit terms as
    textstats.char_entropy (count_g/n_chars per glyph, 6-dp micro
    round, summed over the sorted alphabet), so the oracle hash of any
    consumer is unchanged.

    Cost shape (the r8 rewrite — the r7 per-glyph ``filter`` over a
    ``transform(sequence…substring)`` char array was ~14s of the 16s
    sf0.1 funnel):

    - the char array comes from native ``split(n, '')`` (code-point
      correct in Spark 4, measured 7× cheaper than the substring
      transform, whose per-call code-point seek makes it O(L²));
    - per-glyph counts are ``length(n) − length(replace(n, g))`` —
      whole-stage-codegen string scans, not interpreted lambdas — so
      the only interpreted loop is the ≤|alphabet| outer aggregate;
    - the whole computation is LET-bound in one one-element-array
      lambda scope, so CollapseProject cannot re-derive the alphabet
      (or ``n`` itself) per reference.
    """

    def body(nb):
        nc = F.length(nb).cast("double")
        alpha = F.array_sort(
            F.array_distinct(
                F.when(
                    F.length(nb) == 0, F.array().cast("array<string>")
                ).otherwise(F.split(nb, ""))
            )
        )

        def inner(al):
            def term(g):
                cnt = F.length(nb) - F.length(F.replace(nb, g))
                pg = cnt.cast("double") / nc
                return F.round(
                    (-pg * F.log2(pg) + F.lit(ROUND_BIAS))
                    * F.lit(1_000_000),
                    0,
                ).cast("long")

            em = F.aggregate(
                al, F.lit(0).cast("long"), lambda acc, g: acc + term(g)
            )
            nd = F.size(al)
            return (nd >= 2) & F.round(
                em / F.lit(1_000_000.0) / F.log2(nd.cast("double"))
                + F.lit(ROUND_BIAS),
                4,
            ).between(lo, hi)

        return F.element_at(F.transform(F.array(alpha), inner), 1)

    return F.element_at(F.transform(F.array(n), body), 1)


def funnel_flags(docs: DataFrame) -> DataFrame:
    """Per-document funnel stage flags — the shared core of the batch
    funnel, the streaming quality monitor, and the quality-classifier
    threshold sweep: ``(doc_id, __h, __nt, __q, __en, __ef)`` =
    (content md5, whitespace token count, quality flag, english flag,
    stage-5 survivor flag). One corpus scan, all row-local; callers
    persist it when they fan out into multiple consumers.

    ``__ef`` is NOT a standalone entropy measurement: it is
    entropy-band AND ``__q`` AND ``__en`` (hard-False whenever the
    cheap flags fail, so the expensive entropy fold is skipped for
    rows the funnel already dropped). Consumers that need the entropy
    band independent of the quality/english gates must call
    ``_entropy_band_flag`` directly."""
    staged = docs.select(
        # NULL-safe: a missing body is an empty document — without the
        # coalesce, NULL text yields __h = md5(NULL) = NULL and NULL
        # stage flags, which silently fall out of every keep-count
        "doc_id",
        F.coalesce(normalize_sentence("text"), F.lit("")).alias("__n"),
    ).select(
        "doc_id",
        "__n",
        F.when(
            F.length("__n") == 0, F.array().cast("array<string>")
        ).otherwise(F.split("__n", " ")).alias("__w"),
    )
    nt = F.size("__w")
    stop_hits = _count_in(F.col("__w"), STOPWORDS)
    ng = F.greatest(nt - 2, F.lit(0))
    ndg = F.size(word_shingles_from(F.col("__w"), 3))
    q_flag = (
        nt.between(20, 200)
        & (
            F.round(
                stop_hits.cast("double") / F.greatest(nt, F.lit(1))
                + F.lit(ROUND_BIAS),
                4,
            )
            >= 0.05
        )
        & (
            F.round(
                F.when(ng == 0, F.lit(0.0)).otherwise(
                    (ng - ndg).cast("double") / ng
                )
                + F.lit(ROUND_BIAS),
                4,
            )
            <= 0.2
        )
    )
    scores = {
        lang: _count_in(F.col("__w"), ms) for lang, ms in LANG_MARKERS.items()
    }
    best = F.lit(0)
    for lang in LANG_MARKERS:
        best = F.greatest(best, scores[lang])
    pred = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when(
            (scores[lang] > 0) & (scores[lang] == best), F.lit(lang)
        ).otherwise(pred)
    en_flag = pred == "en"
    # __ef is only consulted for stage-5 survivors (c5 = c4 & __ef with
    # c4 ⊆ __q & __en), so the entropy fold — the most expensive flag —
    # runs lazily behind the cheap flags: If() evaluates the taken
    # branch only, skipping ~60% of rows at sf0.1. Two projections so
    # __q/__en are plain attribute references here, not re-evaluated.
    e_flag = F.when(
        F.col("__q") & F.col("__en"),
        _entropy_band_flag(F.col("__n"), 0.86, 0.92),
    ).otherwise(F.lit(False))
    return staged.select(
        "doc_id",
        "__n",
        F.md5("__n").alias("__h"),
        nt.alias("__nt"),
        q_flag.alias("__q"),
        en_flag.alias("__en"),
    ).select("doc_id", "__h", "__nt", "__q", "__en", e_flag.alias("__ef"))


def curation_funnel(docs: DataFrame) -> DataFrame:
    """(stage_rank, stage, n_docs, n_tokens) for the five-stage
    keep/drop pipeline over ``docs`` (doc_id, text)."""
    flags = scoped_persist(funnel_flags(docs))
    keep = (
        flags.filter(F.col("__q") & F.col("__en"))
        .groupBy("__h")
        .agg(F.min("doc_id").alias("__keeper"))
    )
    fl2 = flags.join(keep, "__h", "left").withColumn(
        "__isk", F.col("doc_id") == F.col("__keeper")
    )

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    def tok(cond):
        return F.coalesce(
            F.sum(F.when(cond, F.col("__nt"))), F.lit(0)
        ).cast("long")

    c2 = F.col("__en")
    c3 = c2 & F.col("__q")
    c4 = c3 & F.col("__isk")
    c5 = c4 & F.col("__ef")
    agg = fl2.agg(
        cnt(F.lit(True)).alias("d1"), tok(F.lit(True)).alias("t1"),
        cnt(c2).alias("d2"), tok(c2).alias("t2"),
        cnt(c3).alias("d3"), tok(c3).alias("t3"),
        cnt(c4).alias("d4"), tok(c4).alias("t4"),
        cnt(c5).alias("d5"), tok(c5).alias("t5"),
    )
    return agg.selectExpr(
        "stack(5, 1, 'ingest', d1, t1, 2, 'lang_en', d2, t2,"
        " 3, 'quality', d3, t3, 4, 'exact_dedup', d4, t4,"
        " 5, 'entropy_band', d5, t5)"
        " as (stage_rank, stage, n_docs, n_tokens)"
    )
