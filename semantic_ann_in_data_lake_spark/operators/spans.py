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


def duplicated_span_rewrite(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    portable: bool = True,
) -> DataFrame:
    """Cross-document duplicated-span REMOVAL — the rewrite step of
    exact-substring training-data dedup (Lee et al., *Deduplicating
    Training Data Makes Language Models Better*, ACL 2022, public
    method), at word-n-gram granularity.

    Every verbatim token span of length ≥ ``n`` that occurs more than
    once in the corpus (across documents or repeated within one) is
    excised from every occurrence EXCEPT the canonical one — the
    occurrence with the lexicographically smallest ``(doc_id,
    position)``, a deterministic keep rule. Formally: a token position
    is removed iff it is covered by at least one positional n-gram
    whose (doc, position) is not that n-gram's canonical occurrence.
    A shared span of s ≥ n tokens contributes s−n+1 shared grams whose
    coverage union is exactly the span, so whole spans vanish and one
    copy survives; spans shorter than n are below the detection
    threshold by definition. Single-pass semantics: excision can make
    previously-distant tokens adjacent, and newly-formed grams are NOT
    re-deduplicated (run to fixpoint by re-applying if required).

    Returns ``(doc_id, n_tokens, n_removed, text_dedup)`` for EVERY
    input document; ``text_dedup`` is the surviving tokens re-joined
    with single spaces (token-normalized space, like the boilerplate
    rewrite). A fully-duplicated non-canonical document collapses to
    ``''``.

    Scale design (the 100-TB argument — no suffix array, no driver
    state):

    - grams are hashed to BIGINT inside the scan projection, so the
      corpus-wide canonical-occurrence aggregation shuffles
      ``(gh, doc_id, pos)`` only;
    - the canonical occurrence is ``min(struct(doc_id, pos))`` — one
      keyed aggregation, map-side combinable; the dup-occurrence join
      is the matching equi-join on ``gh`` (co-partitioned, AQE);
    - coverage explodes ≤ n rows per DUPLICATED gram occurrence
      (O(n·dup_density·L) per doc, never O(L²)), dedups on
      ``(doc_id, tpos)``, and drops tokens via a LEFT ANTI join —
      linear everywhere, every stage a plain shuffle Catalyst can
      coalesce;
    - reassembly is one per-doc groupBy (sort_array over collected
      (pos, token) structs — bounded by document length, the same
      bound every per-doc array op in this package carries).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from semantic_ann_in_data_lake_spark.cache import scoped_persist

    hasher = portable_hash64 if portable else fast_hash64
    base = scoped_persist(
        docs.select(F.col(id_col).alias("doc_id"), words(text_col).alias("__w"))
    )
    return _span_rewrite_pass(base, n, hasher)


def _span_rewrite_pass(base: DataFrame, n: int, hasher) -> DataFrame:
    """One excision pass over a staged ``(doc_id, __w)`` frame — the
    body of :func:`duplicated_span_rewrite`, factored so the fixpoint
    variant can chain passes."""
    from semantic_ann_in_data_lake_spark.cache import scoped_persist
    # hash inside the transform so the explode emits BIGINTs, not gram
    # strings (the duplicated_span_stats discipline)
    occ = scoped_persist(
        base.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    positional_ngrams(F.col("__w"), n), lambda g: hasher(g)
                )
            ).alias("p0", "gh"),
        ).select("doc_id", (F.col("p0") + 1).alias("pos"), "gh")
    )
    canon = occ.groupBy("gh").agg(
        F.min(F.struct("doc_id", "pos")).alias("__c")
    )
    dup = occ.join(canon, "gh").where(
        (F.col("doc_id") != F.col("__c.doc_id"))
        | (F.col("pos") != F.col("__c.pos"))
    )
    covered = dup.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
        ).alias("tpos"),
    ).distinct()
    toks = base.select(
        "doc_id", F.posexplode("__w").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("tpos"), "tok")
    kept = toks.join(covered, ["doc_id", "tpos"], "left_anti")
    reassembled = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("__n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tpos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("text_dedup"),
    )
    return (
        base.select("doc_id", F.size("__w").alias("n_tokens"))
        .join(reassembled, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (
                F.col("n_tokens") - F.coalesce(F.col("__n_kept"), F.lit(0))
            )
            .cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
        )
    )


def duplicated_span_rewrite_multi(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    passes: int = 2,
    portable: bool = True,
) -> DataFrame:
    """Iterated duplicated-span removal: re-apply the excision
    ``passes`` times, feeding each pass's rewrite back in as the text.

    Why more than one pass: excision makes previously-distant tokens
    ADJACENT, and the newly-formed token sequence can itself be a
    duplicated span the single pass (by documented design) does not
    see. A fixed small pass count is the production posture — each
    pass is the same linear pipeline, duplication mass shrinks
    monotonically (n_removed of pass p+1 ≤ corpus tokens left), and
    two passes already reach the fixpoint on natural corpora (the
    multi-pass gate at both test sfs removes nothing in pass 2 — the
    unit test constructs the adversarial case where pass 2 acts).

    Returns ``(doc_id, n_tokens, n_removed, text_dedup)`` where
    ``n_tokens`` is the ORIGINAL token count and ``n_removed`` the
    total excised across all passes.
    """
    if passes < 1:
        raise ValueError(f"passes must be >= 1, got {passes}")
    from semantic_ann_in_data_lake_spark.cache import scoped_persist

    hasher = portable_hash64 if portable else fast_hash64
    cur = duplicated_span_rewrite(
        docs, id_col=id_col, text_col=text_col, n=n, portable=portable
    )
    for _ in range(passes - 1):
        base = scoped_persist(
            cur.select(
                "doc_id",
                F.col("n_tokens").alias("__nt0"),
                words("text_dedup").alias("__w"),
            )
        )
        nxt = _span_rewrite_pass(base.select("doc_id", "__w"), n, hasher)
        cur = nxt.join(
            base.select("doc_id", "__nt0"), "doc_id"
        ).select(
            "doc_id",
            F.col("__nt0").cast("long").alias("n_tokens"),
            (F.col("__nt0") - (F.col("n_tokens") - F.col("n_removed")))
            .cast("long")
            .alias("n_removed"),
            "text_dedup",
        )
    return cur
