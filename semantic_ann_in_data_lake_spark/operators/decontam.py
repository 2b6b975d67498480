"""Benchmark decontamination: flag corpus documents that share word
n-grams with an evaluation/benchmark set.

Training-data-pipeline extension beyond the reference surface (the
reference dedups within one corpus — ``DeepJoin``/MinHash family; a
training pipeline must ALSO exclude documents that leak evaluation
data). The standard contract: a document is contaminated when it
contains at least ``min_overlap`` distinct word n-grams that appear
anywhere in the benchmark set.

Scale design: both sides reduce to (id, gram) pairs through the SAME
staged words→shingles projection the MinHash path uses (materialized
words array — the inline form re-splits text per position, O(len²);
see functions.text.word_shingles_from). The benchmark gram set is
DISTINCT-reduced and is normally tiny next to the corpus (benchmarks
are small by construction) → broadcast hash join against the corpus
gram stream; the only data-sized shuffle is the final per-doc
count-distinct. For a benchmark too large to broadcast, the same plan
degrades gracefully to a shuffle join on the gram hash — no code
change, Spark picks it when the broadcast threshold is exceeded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_ann_in_data_lake_spark.functions.text import (
    word_shingles_from,
    words,
)


def _doc_grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    w = df.select(F.col(id_col), words(text_col).alias("__w"))
    return w.select(
        F.col(id_col),
        F.explode(word_shingles_from(F.col("__w"), n)).alias("gram"),
    )


def contaminated_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_overlap: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(id, n_overlap) for every corpus doc sharing ≥ ``min_overlap``
    distinct word ``n``-grams with the benchmark set.

    Corpus rows whose id also appears in ``benchmark`` are excluded
    (self-overlap is not contamination). Grams are distinct per doc
    (word_shingles_from dedups), so ``n_overlap`` counts distinct
    leaked n-grams, not occurrences.
    """
    bench_ids = benchmark.select(F.col(id_col)).distinct()
    bg = _doc_grams(benchmark, id_col, text_col, n).select("gram").distinct()
    if broadcast_benchmark:
        # the hint FORCES a broadcast (no automatic size fallback) —
        # callers with an unboundedly large benchmark set pass False
        # and get the shuffle join
        bg = F.broadcast(bg)
    dg = _doc_grams(docs, id_col, text_col, n).join(
        F.broadcast(bench_ids), on=id_col, how="left_anti"
    )
    return (
        dg.join(bg, "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_overlap"))
        .where(F.col("n_overlap") >= min_overlap)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """The filtering form: ``docs`` minus contaminated rows (benchmark
    members themselves are KEPT — they are excluded from the
    contamination check, not from the corpus; drop them separately if
    the corpus and benchmark actually overlap)."""
    bad = contaminated_docs(
        docs, benchmark, id_col, text_col, n, min_overlap
    ).select(id_col)
    # NO broadcast hint: `bad` is CORPUS-bounded (a boilerplate-heavy
    # web corpus can flag a large fraction of docs), and an explicit
    # hint FORCES the broadcast regardless of size — let AQE pick
    # broadcast when the flagged set is actually small
    return docs.join(bad, on=id_col, how="left_anti")
