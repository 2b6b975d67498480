"""Winnowing document fingerprints + fingerprint-overlap detection.

Public method: Schleimer, Wilkerson & Aiken, *Winnowing: Local
Algorithms for Document Fingerprinting* (SIGMOD 2003) — the MOSS
algorithm. Hash every character k-gram of the normalized text, slide
a window of ``w`` consecutive hashes, and keep each window's minimum
(rightmost one on ties). The selected set is a ~2/(w+1)-density
fingerprint with the winnowing GUARANTEE: any verbatim match of at
least ``w + k − 1`` characters between two documents shares at least
one fingerprint — the exact-substring complement to MinHash (which
sees bags of shingles, not positions, and only guarantees detection
probabilistically).

Extension beyond the reference surface (its identity check is a
whole-string md5, ``textstats.fingerprints``): winnowing is the
standard published recipe for plagiarism/near-verbatim reuse
detection and paragraph-level duplication mining in pre-training
corpora.

Scale design:

- **Fingerprinting is ZERO shuffle.** k-gram hashing, window minima,
  and per-document dedup (``array_distinct`` BEFORE the explode) are
  row-local array expressions inside whole-stage codegen; the
  operator emits ~2·L/(w+1) rows per document straight off the scan.
- **Engine-portable integer packing.** Each k-gram key packs
  (40-bit portable hash, 20-bit reversed position) into one BIGINT:
  ``key = h·2²⁰ + (2²⁰−1−pos)``, so a plain integer ``min`` over a
  window implements "min hash, rightmost position on ties" in one
  comparison — bit-identical in DuckDB. Positions are capped at 2²⁰
  characters (docs longer than ~1 M chars should be chunked first —
  ``chunking.chunk_documents``).
- **Overlap join is inverted-index-shaped** (same discipline as the
  JOSIE/PPJoin tiers): one groupBy on fingerprint hash to measure
  document frequency, a ``max_df`` cap that drops ubiquitous
  fingerprints (boilerplate n-grams — the fan-out bound), then an
  equi-join on hash and a pair-count aggregation. No all-pairs path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from semantic_ann_in_data_lake_spark.functions.hashing import (
    portable_hash_expr,
    portable_hash_spark_sql,
)
from semantic_ann_in_data_lake_spark.functions.text import (
    normalize_sentence,
    normalize_sentence_sql,
)

#: fingerprint hash width (bits) after packing; 40 bits keeps k-gram
#: collisions negligible (~1e-5 at 1e5 grams/doc) with 20 bits left
#: for the position inside a signed 63-bit space.
_HASH_BITS = 40
_POS_BITS = 20
_POS_CAP = (1 << _POS_BITS) - 1
_HASH_MOD = 1 << _HASH_BITS
_POS_MOD = 1 << _POS_BITS


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    seed: str = "win:",
) -> DataFrame:
    """Winnowing fingerprints: one row per selected (position, hash).

    Returns ``(doc_id, pos, fp)`` — ``pos`` is the 1-based character
    offset of the fingerprinted k-gram in the NORMALIZED text, ``fp``
    the 40-bit k-gram hash. Documents shorter than ``k`` (normalized)
    emit nothing; documents with fewer than ``w`` k-grams emit the
    single global minimum (the degenerate window).
    """
    norm = normalize_sentence(text_col)
    n_keys = F.greatest(F.length("__norm__") - F.lit(k - 1), F.lit(0))
    gram_hash = portable_hash_spark_sql(
        f"substring(__norm__, i, {k})", seed=seed
    )
    # sequence(1, 0) is the DESCENDING [1, 0] in Spark (the
    # word_shingles_from gotcha) — guard the empty case explicitly
    keys = F.expr(
        f"case when __nk__ < 1 then array() "
        f"else transform(sequence(1, __nk__), "
        f"i -> ({gram_hash} % {_HASH_MOD}) * {_POS_MOD}"
        f" + ({_POS_CAP} - i)) end"
    )
    sel = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size("__keys__") - F.lit(w - 1), F.lit(1))
            ),
            lambda j: F.array_min(F.slice("__keys__", j, w)),
        )
    )
    staged = (
        docs.select(F.col(id_col).alias("doc_id"), norm.alias("__norm__"))
        .select("doc_id", "__norm__", n_keys.alias("__nk__"))
        .select("doc_id", keys.alias("__keys__"))
        .filter(F.size("__keys__") > 0)
        .select("doc_id", F.explode(sel).alias("__key__"))
    )
    return staged.select(
        "doc_id",
        (F.lit(_POS_CAP) - F.col("__key__") % F.lit(_POS_MOD))
        .cast("int")
        .alias("pos"),
        F.shiftright("__key__", _POS_BITS).alias("fp"),
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 1000,
    seed: str = "win:",
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints.

    Returns ``(doc_id_a, doc_id_b, n_shared)`` with ``a < b``.
    Fingerprints present in more than ``max_df`` documents are dropped
    before the join (corpus-wide boilerplate — they carry no pairing
    signal and bound the per-hash fan-out at max_df²).
    """
    from semantic_ann_in_data_lake_spark.cache import scoped_persist

    # persisted: the distinct-fp frame feeds three consumers (df-cap
    # measurement + both join sides) — one shuffle, not three
    fp = scoped_persist(
        winnow_fingerprints(
            docs, id_col=id_col, text_col=text_col, k=k, w=w, seed=seed
        ).select("doc_id", "fp").distinct()
    )
    df_ok = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter((F.col("__df") >= 2) & (F.col("__df") <= max_df))
        .select("fp")
    )
    fp = fp.join(df_ok, "fp")
    a = fp.select(F.col("doc_id").alias("doc_id_a"), "fp")
    b = fp.select(F.col("doc_id").alias("doc_id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# --- DuckDB-SQL twins ----------------------------------------------------

def winnow_fingerprints_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    seed: str = "win:",
) -> str:
    """DuckDB twin of :func:`winnow_fingerprints` (identical packing
    arithmetic; used to build oracle_sql strings)."""
    norm = normalize_sentence_sql(text_col)
    gram_hash = portable_hash_expr(f"substr(n, i, {k})", seed=seed)
    return f"""
    WITH nrm AS (SELECT {id_col} AS doc_id, {norm} AS n FROM {table}),
    ks AS (SELECT doc_id,
             list_transform(range(1, greatest(length(n) - {k - 1}, 0) + 1),
               i -> (({gram_hash}) % {_HASH_MOD}) * {_POS_MOD}
                    + ({_POS_CAP} - i)) AS keys
           FROM nrm),
    sel AS (SELECT doc_id,
              list_distinct(list_transform(
                range(1, greatest(len(keys) - {w - 1}, 1) + 1),
                j -> list_min(list_slice(keys, j, j + {w - 1})))) AS fps
            FROM ks WHERE len(keys) > 0),
    e AS (SELECT doc_id, unnest(fps) AS key FROM sel)
    SELECT doc_id,
           ({_POS_CAP} - (key % {_POS_MOD}))::INT AS pos,
           (key // {_POS_MOD})::BIGINT AS fp
    FROM e
    """
