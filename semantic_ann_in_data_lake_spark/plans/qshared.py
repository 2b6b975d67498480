"""Shared DuckDB-SQL text fragments used by several query modules
(tokenization CTEs over the documents table).
"""

from __future__ import annotations

from semantic_ann_in_data_lake_spark.functions.text import (
    word_shingles_from_sql, words_sql,
)

_TOKS = words_sql("text")

#: staged CTE: words once per row, then shingles from the bound column
#: (inline shingles-over-words re-splits the text per position — same
#: O(len²) blowup as the Spark side; see text.word_shingles_from)
_W_CTE = f"w AS (SELECT doc_id, {_TOKS} AS w FROM documents)"

_SH_CTE = (
    f"s AS (SELECT doc_id, {word_shingles_from_sql('w', 3)} AS sh FROM w)"
)

#: DECIMAL cast fragment for money-exact oracle sums (TPC-H family).
_DEC = "::DECIMAL(18,2)"
