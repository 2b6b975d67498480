"""Model-based document scoring: the quality-classifier stage of a
training-data pipeline, engine-portable.

Rule-based quality gates (textstats' Gopher rules) catch structural
junk; production pipelines ALSO run a learned quality model over every
document. The Spark shape of that stage is what this module provides:
a linear scorer ``sigmoid(w · φ(text) + b)`` where φ is the package's
deterministic hash-embedding feature map — the same broadcast-weights /
vectorized-batch plumbing a real classifier head uses, with every
arithmetic step expressible in SQL so the DuckDB oracle can hash-check
the whole path (swap φ for real model embeddings via
``annotate.embedder`` and the plan shape is unchanged; only the gate
weakens to rows-only, as with every learned component).

Everything stays JVM-side: the feature map is a column expression, the
dot product a sequential fold (bit-identical cross-engine), the logit
pure multiply/add. Scores round at 4 dp because ``exp`` is the one
step libm does not guarantee correctly rounded across engines; the
logit itself is gated at 6 dp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from semantic_ann_in_data_lake_spark.annotate.embedder import (
    hash_embedding_expr,
    hash_embedding_sql,
)
from semantic_ann_in_data_lake_spark.functions.vectors import dot, dot_sql


def default_weights(dim: int) -> list[float]:
    """Deterministic demo weights (a fixed 'trained' head): spread over
    [-0.9, 0.9], reproducible in SQL as ((i*37) % 19 - 9) / 10."""
    return [((i * 37) % 19 - 9) / 10.0 for i in range(dim)]


def score_expr(
    text: Column | str, weights: list[float], bias: float
) -> tuple[Column, Column]:
    """(logit, score) columns for sigmoid(w · hash_embedding(text) + b)."""
    dim = len(weights)
    emb = hash_embedding_expr(text, dim)
    w = F.array(*[F.lit(float(x)) for x in weights])
    logit = dot(emb, w) + F.lit(float(bias))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return logit, score


def score_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: list[float] | None = None,
    bias: float = 0.0,
    dim: int = 16,
) -> DataFrame:
    """(id, logit, score) per document — logit at 6 dp (exactly
    portable), score at 4 dp (exp tolerance, see module docstring)."""
    weights = weights if weights is not None else default_weights(dim)
    logit, score = score_expr(text_col, weights, bias)
    return df.select(
        F.col(id_col),
        F.round(logit, 6).alias("logit"),
        F.round(score, 4).alias("score"),
    )


def model_quality_filter(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: list[float] | None = None,
    bias: float = 0.0,
    dim: int = 16,
) -> DataFrame:
    """Keep documents the model scores at or above ``threshold``.

    Thresholds on the LOGIT (log(t/(1-t))) rather than the score so row
    membership never depends on cross-engine exp rounding."""
    import math

    weights = weights if weights is not None else default_weights(dim)
    logit, _ = score_expr(text_col, weights, bias)
    cut = math.log(threshold / (1.0 - threshold))
    return df.where(F.round(logit, 6) >= cut)


def score_oracle_sql(
    text_expr: str, weights: list[float], bias: float
) -> str:
    """DuckDB twin of :func:`score_documents`'s projection."""
    dim = len(weights)
    warr = "[" + ", ".join(repr(float(x)) for x in weights) + "]"
    emb = hash_embedding_sql(text_expr, dim)
    logit = f"({dot_sql(emb, warr)} + {float(bias)!r})"
    return (
        f"round({logit}, 6) AS logit, "
        f"round(1.0 / (1.0 + exp(-{logit})), 4) AS score"
    )
