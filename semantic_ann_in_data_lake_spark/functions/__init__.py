"""Reusable column expressions (all JVM-side built-ins, no Python UDFs)."""

from semantic_ann_in_data_lake_spark.functions.hashing import (
    portable_hash64,
    portable_hash_expr,
    fast_hash64,
)
from semantic_ann_in_data_lake_spark.functions.vectors import (
    l2_sq,
    cosine_sim,
    dot,
    norm,
)
from semantic_ann_in_data_lake_spark.functions.text import (
    normalize_sentence,
    words,
    word_shingles,
    char_shingles,
)
from semantic_ann_in_data_lake_spark.functions.dates import normalize_date

__all__ = [
    "portable_hash64",
    "portable_hash_expr",
    "fast_hash64",
    "l2_sq",
    "cosine_sim",
    "dot",
    "norm",
    "normalize_sentence",
    "words",
    "word_shingles",
    "char_shingles",
    "normalize_date",
]
