"""Self-trained bigram language-model scoring: a KenLM-style
perplexity proxy for corpus quality filtering, computed entirely
in-engine.

Extension beyond the reference surface: production data pipelines
score documents with an n-gram LM (fluent text scores high, boilerplate
and garbage score low) and filter on the score. The heavy external
dependency (a trained LM) is replaced by the corpus's own bigram
statistics — add-one-smoothed P(w2|w1) = (c(w1 w2)+1)/(c(w1)+V) —
which is the exact shape of the real thing: swap the count tables for
an external model's and the plumbing is unchanged.

Scale design:

- Two count tables (unigram, bigram) = two keyed groupBys over
  exploded tokens; the score join is keyed by bigram string (well
  spread) and by first word (fan-in only — each row matches one count
  row, so hot words skew a lookup, not a blow-up).
- Vocabulary size is a 1-row frame broadcast into the expression, not
  a driver-side collect.
- Per-document log-prob totals accumulate in DECIMAL(18,6) after a
  6-dp round of each bigram's log10 — decimal addition is associative,
  so the parallel aggregation is bit-identical regardless of partition
  order (the repo-wide money-sum discipline applied to log space).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_ann_in_data_lake_spark.cache import scoped_persist
from semantic_ann_in_data_lake_spark.functions.text import words

#: see textstats.ROUND_BIAS
_ROUND_BIAS = 1e-9


def bigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean bigram log10-probability under the corpus's
    own add-one-smoothed bigram model.

    Returns ``(doc_id, n_bigrams, lm_score)``; ``lm_score`` is the
    mean log10 P(w2|w1) over the document's positional bigrams (4 dp;
    higher = more typical of the corpus). Documents with fewer than
    two tokens appear with ``n_bigrams = 0`` and ``lm_score = 0.0``.
    """
    toks = scoped_persist(
        docs.select(F.col(id_col).alias("doc_id"), words(text_col).alias("w"))
    )
    uni = toks.select(F.explode("w").alias("tok"))
    c1 = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c1"))
    vocab = uni.select(F.countDistinct("tok").alias("vsize"))

    n_bg = F.size("w") - 1
    bg_arr = F.when(n_bg < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_bg),
            lambda i: F.concat_ws(
                " ", F.element_at("w", i), F.element_at("w", i + 1)
            ),
        )
    )
    doc_bg = toks.select(
        "doc_id", F.explode(bg_arr).alias("bg")
    ).withColumn("w1", F.split("bg", " ").getItem(0))
    c2 = doc_bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))

    logp = F.round(
        F.log10(
            (F.col("c2") + 1).cast("double")
            / (F.col("c1") + F.col("vsize")).cast("double")
        )
        + F.lit(_ROUND_BIAS),
        6,
    ).cast("decimal(18,6)")
    scored = (
        doc_bg.join(c2, "bg")
        .join(c1, doc_bg["w1"] == c1["tok"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(logp).alias("logp_sum"),
        )
    )
    base = toks.select("doc_id")
    return base.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.round(
            F.when(
                F.col("n_bigrams").isNull(), F.lit(0.0)
            ).otherwise(
                F.col("logp_sum").cast("double") / F.col("n_bigrams")
            )
            + F.lit(_ROUND_BIAS),
            4,
        ).alias("lm_score"),
    )


def nb_log_odds_scores(
    docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Naive-Bayes quality classifier TRAINED IN-ENGINE: per-token
    class log-odds between the ``label_col`` = true docs (the
    "reference" corpus) and the rest, applied back to every document —
    the public quality-filter shape (GPT-3 / CCNet / fastText train a
    linear classifier "curated-reference vs crawl" and keep
    high-scoring docs; NB log-odds IS that linear model with
    closed-form weights, so train and apply are two aggregations
    instead of a gradient loop).

    Returns ``(doc_id, n_tokens, nb_score)`` where ``nb_score`` is the
    mean per-token weight (4 dp; > 0 = looks like the reference class)
    and zero-token documents score 0.0.

    weight(t) = log10((c_ref(t)+α)/(N_ref+α·V))
              − log10((c_rest(t)+α)/(N_rest+α·V))   (add-α smoothing)

    Float discipline (`bigram_lm_scores`'s, applied to log-odds): each
    token weight is one fixed tree of double ops on exact integer
    counts, rounded to 6 dp and accumulated in DECIMAL(18,6) — the
    per-document sum is bit-identical across partitionings and engines.

    Scale design: ONE exploded-token pass feeds both class count
    tables (conditional aggregation, map-side combine; |vocab| keys);
    totals ride a 1-row broadcast; the scoring join is keyed by token —
    fan-in only (each row matches exactly one weight row, so hot
    tokens skew a lookup, never a blow-up).
    """
    toks = scoped_persist(
        docs.select(
            F.col(id_col).alias("doc_id"),
            # NULL labels are "not the reference class", not poison:
            # a NULL would drop the token from BOTH class counts
            # (count_if skips NULL on either polarity)
            F.coalesce(F.col(label_col).cast("boolean"), F.lit(False)).alias(
                "__ref"
            ),
            words(text_col).alias("w"),
        )
    )
    doc_tok = toks.select(
        "doc_id", "__ref", F.explode("w").alias("tok")
    )
    cls = doc_tok.groupBy("tok").agg(
        F.count_if(F.col("__ref")).alias("c_ref"),
        F.count_if(~F.col("__ref")).alias("c_rest"),
    )
    totals = cls.select(
        F.sum("c_ref").alias("n_ref"),
        F.sum("c_rest").alias("n_rest"),
        F.count(F.lit(1)).alias("vsize"),
    )
    a = F.lit(float(alpha))
    weight = F.round(
        F.log10(
            (F.col("c_ref") + a) / (F.col("n_ref") + a * F.col("vsize"))
        )
        - F.log10(
            (F.col("c_rest") + a) / (F.col("n_rest") + a * F.col("vsize"))
        )
        + F.lit(_ROUND_BIAS),
        6,
    ).cast("decimal(18,6)")
    weights = cls.crossJoin(F.broadcast(totals)).select(
        "tok", weight.alias("w6")
    )
    scored = (
        doc_tok.join(weights, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w6").alias("w_sum"),
        )
    )
    base = toks.select("doc_id")
    return base.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        (
            F.round(
                F.when(F.col("n_tokens").isNull(), F.lit(0.0)).otherwise(
                    F.col("w_sum").cast("double") / F.col("n_tokens")
                )
                + F.lit(_ROUND_BIAS),
                4,
            )
            + F.lit(0.0)  # fold -0.0 to +0.0 (engines disagree on the sign)
        ).alias("nb_score"),
    )
