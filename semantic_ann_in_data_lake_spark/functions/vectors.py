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


def centroid_outliers(
    df,
    key_col: str,
    vec_col: str,
    id_col: str = "vec_id",
    z_tau: float = 2.0,
    round_dp: int = 6,
):
    """Embedding-quality audit: vectors whose distance to their group's
    centroid is a z-score outlier — the standard screen for corrupted
    embeddings, mislabeled sources, and drift clusters before vectors
    enter an index or training mix.

    Returns ``(key, id, dist, z)`` for rows with ``z ≥ z_tau``.

    Float discipline (the part that makes a z-score oracle-gateable):
    distances are 6-dp-rounded then scaled to exact integer
    micro-distances, so the per-key moment sums are order-independent
    integers (the squared sum in DECIMAL — it exceeds int64 once
    n·d6² passes ~9e18, i.e. at real corpus scale); the z expression
    is a fixed tree of double ops over those exact sums. Variance is
    floored at 1e-12 so constant groups yield z = 0 instead of a
    division error.

    Scale shape: centroids via :func:`centroid_per_key` (shuffle =
    |keys|·dim), one broadcast join of the tiny centroid table, one
    per-key moment aggregation, one broadcast join back. No window, no
    Python, nothing quadratic.
    """
    from pyspark.sql import DataFrame  # noqa: F401

    cents = centroid_per_key(df, key_col, vec_col, round_dp=round_dp)
    d = df.join(
        F.broadcast(cents.select(F.col("key").alias(key_col), "centroid")),
        key_col,
    ).select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("id"),
        F.round(F.sqrt(l2_sq(vec_col, "centroid")), round_dp).alias("dist"),
    )
    d6 = d.withColumn(
        "__d6", F.round(F.col("dist") * 1e6).cast("long")
    )
    st = d6.groupBy("key").agg(
        F.sum("__d6").alias("__s"),
        F.sum(
            F.col("__d6").cast("decimal(18,0)")
            * F.col("__d6").cast("decimal(18,0)")
        ).alias("__q"),
        F.count(F.lit(1)).alias("__n"),
    )
    m = F.col("__s").cast("double") / F.col("__n")
    var = F.col("__q").cast("double") / F.col("__n") - m * m
    z = F.round(
        (F.col("__d6") - m) / F.sqrt(F.greatest(var, F.lit(1e-12))), 4
    )
    return (
        d6.join(F.broadcast(st), "key")
        .withColumn("z", z)
        .where(F.col("z") >= F.lit(z_tau))
        .select("key", "id", "dist", "z")
    )
