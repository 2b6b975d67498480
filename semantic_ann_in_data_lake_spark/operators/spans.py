"""Duplicated-span detection: exact repeated n-gram analysis across a
corpus (the "deduplicating training data makes LM better" signal —
positional word n-grams shared verbatim between documents).

Extension beyond the reference (its dedup story stops at whole-column
caches, ``SemLink/join_discoverer.py:214-247``): a training-data
pipeline needs to know not just *which documents* are near-duplicates
but *how much of each document* is boilerplate copied verbatim
elsewhere. The classic formulation finds all n-gram spans that occur in
more than one document and reports, per document, the fraction of its
positional n-grams that are so shared.

Scale design (the 100-TB argument):

- Positional n-grams are generated inside whole-stage codegen
  (``transform(sequence(...))`` over a materialized words array — no
  UDF, no re-tokenization per position).
- The shuffle payload is ``(gram_hash BIGINT, doc_id)`` — grams are
  hashed to 64-bit integers *before* the explode leaves the scan
  stage, so the corpus-wide gram table never carries strings.
- Two keyed aggregations (distinct doc-per-gram count, then per-doc
  rollup) and one equi-join on the hash — all AQE-coalescible; nothing
  is quadratic in corpus size or duplication factor.
- ``portable=True`` uses the md5-derived oracle-portable hash so DuckDB
  can verify bit-identically; production flips to ``xxhash64``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from semantic_ann_in_data_lake_spark.functions.hashing import (
    fast_hash64,
    portable_hash64,
)
from semantic_ann_in_data_lake_spark.functions.text import words

#: see textstats.ROUND_BIAS — nudge rounded ratios off exact decimal
#: midpoints so Spark and DuckDB round the same way.
_ROUND_BIAS = 1e-9


def positional_ngrams(w: Column, n: int) -> Column:
    """ALL word n-grams of a materialized words array, in position
    order, duplicates preserved (unlike ``word_shingles_from``, which
    dedups and sorts for set semantics — span analysis needs
    multiplicity: a doc that repeats its own boilerplate should count
    every occurrence)."""
    n_pos = F.size(w) - F.lit(n - 1)
    return F.when(
        n_pos < 1, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_pos),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        )
    )


def duplicated_span_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    portable: bool = True,
) -> DataFrame:
    """Per-document duplicated-span statistics.

    Returns ``(doc_id, n_grams, n_dup_grams, dup_fraction)`` where
    ``n_dup_grams`` counts the positions whose n-gram also occurs in at
    least one OTHER document, and ``dup_fraction`` is the ratio (4 dp).
    Documents shorter than ``n`` words appear with ``n_grams = 0`` and
    ``dup_fraction = 0.0`` — profile consumers enumerate every doc.
    """
    if n < 1:
        # n=0 would make every position an empty-string gram: all docs
        # "share" one hash and report dup_fraction ~1.0 with no error
        raise ValueError(f"n must be >= 1, got {n}")
    from semantic_ann_in_data_lake_spark.cache import scoped_persist

    hasher = portable_hash64 if portable else fast_hash64
    # persisted: grams feeds both the shared-hash aggregate and the
    # per-doc join — Catalyst has no cross-branch CSE, so without the
    # persist the scan + tokenize + explode + hash run twice
    grams = scoped_persist(
        docs.select(F.col(id_col).alias("doc_id"), words(text_col).alias("__w"))
        .select("doc_id", F.explode_outer(positional_ngrams(F.col("__w"), n)).alias("gram"))
        .select("doc_id", hasher(F.col("gram")).alias("gh"))
    )
    # corpus-wide: which gram hashes appear in >1 distinct document?
    # (distinct-first then count avoids a count-distinct hash build per
    # gram; both are one shuffle on gh)
    shared = (
        grams.where(F.col("gh").isNotNull())
        .select("gh", "doc_id").distinct()
        .groupBy("gh").agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") > 1)
        .select("gh", F.lit(1).alias("is_dup"))
    )
    per_doc = (
        grams.join(shared, "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.col("gh")).alias("n_grams"),
            F.coalesce(F.sum("is_dup"), F.lit(0)).cast("long").alias("n_dup_grams"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_dup_grams",
        F.round(
            F.when(F.col("n_grams") == 0, F.lit(0.0)).otherwise(
                F.col("n_dup_grams") / F.col("n_grams")
            )
            + F.lit(_ROUND_BIAS),
            4,
        ).alias("dup_fraction"),
    )
