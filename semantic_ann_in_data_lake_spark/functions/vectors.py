"""Vector math as higher-order array expressions (JVM-side, codegen'd).

These reproduce the distance semantics of the reference's FAISS / hnswlib
usage: squared L2 is the internal convention (FAISS ``IndexFlatL2``
returns squared distances — the reference thresholds ``dist**0.5``,
``SemLink/join_discoverer.py:318``), with cosine for the similarity-search
extension ops.

All expressions fold element-wise left-to-right in array order with
double-precision accumulation, which makes them bit-identical to an
equivalent sequential SQL fold in DuckDB — a requirement for the driver's
hash-match oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def l2_sq(a: Column | str, b: Column | str) -> Column:
    """Squared L2 distance between two ARRAY<FLOAT/DOUBLE> columns."""
    def sq_diff(x: Column, y: Column) -> Column:
        d = x.cast("double") - y.cast("double")
        return d * d  # explicit multiply: pow() is not ulp-identical cross-engine

    return F.aggregate(
        F.zip_with(_c(a), _c(b), sq_diff),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns (double accumulation)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    """Euclidean norm of an array column."""
    return F.sqrt(
        F.aggregate(
            F.transform(_c(a), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity with an epsilon guard against zero vectors."""
    return dot(a, b) / ((norm(a) * norm(b)) + F.lit(1e-12))


# --- DuckDB-SQL twins (text), used to build oracle_sql() strings ---------

def l2_sq_sql(a: str, b: str) -> str:
    """Sequential index-order fold — matches Spark's aggregate() bitwise."""
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> (({a}[i]::DOUBLE) - ({b}[i]::DOUBLE)) * (({a}[i]::DOUBLE) - ({b}[i]::DOUBLE))))"
    )


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> ({a}[i]::DOUBLE) * ({b}[i]::DOUBLE)))"
    )


def norm_sql(a: str) -> str:
    return f"sqrt(list_sum(list_transform({a}, x -> (x::DOUBLE) * (x::DOUBLE))))"


def cosine_sim_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)}) / (({norm_sql(a)}) * ({norm_sql(b)}) + 1e-12)"


def centroid_per_key(
    df, key_col: str, vec_col: str, round_dp: int = 6
):
    """Mean-pool vectors per key → (key, n_vectors, centroid) — the
    per-domain/cluster centroid builder (routing tables, domain
    signatures, IVF seed refresh).

    Exactness discipline: per-dimension sums accumulate in DECIMAL
    (parallel double summation is order-nondeterministic), divide once
    as double, round. Shape: posexplode → ONE (key, dim) aggregate →
    re-assemble the array with an ordered collect — shuffle payload is
    |keys|·dim partial sums, never |rows|·dim."""
    from pyspark.sql import functions as F

    e = df.select(
        F.col(key_col).alias("key"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    )
    agg = e.groupBy("key", "pos").agg(
        F.sum(F.col("val").cast("double").cast("decimal(28,10)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    comp = F.round(F.col("s").cast("double") / F.col("n"), round_dp)
    return (
        agg.select("key", "pos", comp.alias("c"), "n")
        .groupBy("key")
        .agg(
            F.max("n").alias("n_vectors"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda x: x["c"],
            ).alias("centroid"),
        )
    )
