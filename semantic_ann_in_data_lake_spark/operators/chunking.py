"""Document chunking — sliding token windows for training-data prep.

Beyond the reference's surface (its unit of text is a whole serialized
column, ``SemLink/join_discoverer.py:176-213``): a pre-training corpus
pipeline splits documents into fixed-size token windows with overlap
before tokenization/packing. Pure DataFrame program:

    tokens (posexplode, ONE tokenize per doc) →
    token → its covering chunk ids (explode of a tiny int sequence) →
    groupBy (doc, chunk) rebuilds each window's text.

Chunk contract: a chunk starts at every ``stride`` tokens while any
token remains (start < n_tokens), covers ``[start, start+window)``,
and the trailing chunks may be partial — deterministic and
oracle-checkable (DuckDB: ``range(0, len(w), stride)`` + slice). A
token at position p (0-based) belongs to chunks
``ceil(max(p-window+1,0)/stride) .. floor(p/stride)``.

Scale notes: the only shuffle is the (doc_id, chunk_id) groupBy of
narrow (pos, token) rows; fan-out is ``window/stride``× the token
count — the same data inflation any overlapped chunker pays. No
higher-order folds over inline expressions (the Catalyst re-evaluation
trap documented in :mod:`..operators.dedup`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_ann_in_data_lake_spark.functions.text import words


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 32,
) -> DataFrame:
    """(doc_id, chunk_id, start_pos, n_tokens, chunk_text); empty docs
    yield no chunks; ``stride <= window`` required (no token gaps)."""
    if not 0 < stride <= window:
        raise ValueError(f"need 0 < stride({stride}) <= window({window})")
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(words(text_col)).alias("__pos", "__wd"),
    )
    lo = F.ceil(F.greatest(F.col("__pos") - window + 1, F.lit(0)) / stride).cast(
        "int"
    )
    hi = F.floor(F.col("__pos") / stride).cast("int")
    ex = tok.select(
        "doc_id",
        "__pos",
        "__wd",
        F.explode(F.sequence(lo, hi)).alias("chunk_id"),
    )
    return (
        ex.groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            # rebuild window text in token order; struct sort orders by
            # __pos first (ints, unique within a chunk)
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__wd"))),
                    lambda s: s["__wd"],
                ),
                " ",
            ).alias("chunk_text"),
        )
        .select(
            "doc_id",
            "chunk_id",
            (F.col("chunk_id") * stride).alias("start_pos"),
            "n_tokens",
            "chunk_text",
        )
    )
