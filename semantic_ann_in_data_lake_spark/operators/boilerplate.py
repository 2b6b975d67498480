"""Corpus-wide shared-segment removal: the REWRITE counterpart to
duplicated-span detection (``operators/spans.py``).

Web-scale curation pipelines (the CCNet / RefinedWeb recipe) do not
just *measure* boilerplate — they delete it: any paragraph/line that
occurs verbatim in many documents (navigation chrome, license
headers, cookie banners) is removed from every document before
training. The reference has no notion of this (its dedup story stops
at whole-column caches, ``SemLink/join_discoverer.py:214-247``); this
operator is part of the beyond-reference LLM-data-pipeline surface.

Formulation here: documents are segmented into NON-overlapping
``seg_words``-word positional chunks (the corpus has no newlines, so
fixed-width word windows stand in for lines; a ``split_pattern``
parameter would swap in real line/paragraph splitting unchanged).
A segment is *shared* when it occurs in at least ``min_docs`` DISTINCT
documents; every occurrence of a shared segment is dropped and the
surviving segments are re-joined in original position order.

Scale design (the 100-TB argument):

- Segmentation is ``transform(sequence(...))`` over one materialized
  token array — whole-stage codegen, no UDF, no per-position re-split.
- The corpus-wide frequency pass shuffles ``(segment_hash BIGINT,
  doc_id)`` only — segments are 64-bit-hashed before the explode
  leaves the scan stage, exactly like the span detector.
- The shared-segment table is *bounded by the threshold*: only hashes
  with ≥ min_docs distinct docs survive, i.e. the join back is
  broadcast-sized for any realistic boilerplate distribution (and an
  equi-join either way — never quadratic).
- Reassembly is one groupBy(doc_id) with an in-group sort of
  (position, segment) structs — partitioned by document id, never a
  global window.
- ``portable=True`` uses the md5-derived cross-engine hash so DuckDB
  verifies bit-identically; production flips to ``xxhash64``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from semantic_ann_in_data_lake_spark.functions.hashing import (
    fast_hash64,
    portable_hash64,
)


def _segments(tokens, seg_words: int):
    """Non-overlapping seg_words-word chunks (trailing partial kept),
    in position order."""
    n_seg = F.ceil(F.size(tokens) / F.lit(seg_words)).cast("int")
    return F.when(n_seg < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_seg),
            lambda i: F.array_join(
                F.slice(tokens, (i - F.lit(1)) * seg_words + 1, seg_words), " "
            ),
        )
    )


def remove_shared_segments(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 5,
    min_docs: int = 2,
    portable: bool = True,
) -> DataFrame:
    """Drop every occurrence of segments shared by ≥ ``min_docs``
    distinct documents.

    Returns ``(doc_id, n_segments, n_removed, text_clean)`` — one row
    per input document (empty docs appear with 0/0/''), ``text_clean``
    the surviving segments re-joined in original order.
    """
    if seg_words < 1:
        raise ValueError(f"seg_words must be >= 1, got {seg_words}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    hasher = portable_hash64 if portable else fast_hash64

    # raw whitespace tokens (NOT the normalizing words(): a rewrite
    # must preserve the document's own bytes, only deleting segments)
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    from semantic_ann_in_data_lake_spark.cache import scoped_persist

    # persisted: segs feeds both the shared-hash aggregate and the
    # reassembly join — without it the scan + segment + hash run twice
    # (Catalyst has no cross-branch CSE; same note as discovery.py)
    segs = scoped_persist(
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode_outer(_segments(toks, seg_words)).alias("pos", "seg"),
        ).withColumn("gh", hasher(F.col("seg")))
    )

    shared = (
        segs.where(F.col("gh").isNotNull())
        .select("gh", "doc_id")
        .distinct()
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("gh", F.lit(1).alias("is_shared"))
    )

    flagged = segs.join(shared, "gh", "left")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("seg").alias("n_segments"),
            F.coalesce(F.sum("is_shared"), F.lit(0))
            .cast("long")
            .alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("is_shared").isNull()
                                & F.col("seg").isNotNull(),
                                F.struct(F.col("pos"), F.col("seg")),
                            )
                        )
                    ),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("text_clean"),
        )
        .select("doc_id", "n_segments", "n_removed", "text_clean")
    )
