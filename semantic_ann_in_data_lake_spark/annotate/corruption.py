"""Header-corruption operators for robustness experiments (reference
C1-C4, ``SemanticAnnotation/corruption.py``).

The reference's three corruption regimes, re-expressed deterministically
(its ``random.shuffle``/nlpaug draws are not reproducible across
engines; we key every choice on a portable content hash — documented
divergence, SURVEY §7.4):

- C1 positional: columns renamed ``attribiute_{i}`` (sic — the
  reference's typo is behavior, kept) with positions permuted by
  hash order instead of ``random.shuffle``.
- C2 char-noise: seeded character swap/delete keyed on the hash —
  replaces the nlpaug augmenter (not installed, and nondeterministic).
- C3 swapped-name: each column takes another column's name drawn by
  hash order rotation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semantic_ann_in_data_lake_spark.functions.hashing import portable_hash64


def _columns_df(spark: SparkSession, table_name: str, columns: list[str]) -> DataFrame:
    return spark.createDataFrame(
        [(table_name, c, i) for i, c in enumerate(columns)],
        "table_name string, column_name string, position int",
    )


def corrupt_positional(
    spark: SparkSession, table_name: str, columns: list[str], seed: str = "c1"
) -> DataFrame:
    """C1: ``attribiute_{i}`` with i assigned in hash-permuted order
    (``corruption.py:25-30``; typo preserved as reference behavior)."""
    df = _columns_df(spark, table_name, columns)
    w = Window.orderBy(portable_hash64(F.col("column_name"), seed=seed))
    return df.withColumn(
        "new_name",
        F.format_string("attribiute_%d", F.row_number().over(w) - 1),
    ).select("table_name", "column_name", "new_name")


def corrupt_charnoise(
    spark: SparkSession, table_name: str, columns: list[str], seed: str = "c2"
) -> DataFrame:
    """C2: deterministic char-level noise — drop the character at
    (hash mod len) when the hash selects the column (65% of draws,
    matching the reference's aug_p intent, ``corruption.py:5-11``)."""
    df = _columns_df(spark, table_name, columns)
    h = portable_hash64(F.col("column_name"), seed=seed)
    drop_pos = (F.pmod(h, F.length("column_name")) + 1).cast("int")
    # substring with column-valued positions needs the expr form
    noisy = F.concat(
        F.expr("substr(column_name, 1, __pos - 1)"),
        F.expr("substr(column_name, __pos + 1)"),
    )
    out = (
        df.withColumn("__pos", drop_pos)
        .withColumn("__apply", F.pmod(h, F.lit(100)) < 65)
        .withColumn(
            "new_name",
            F.when(F.col("__apply") & (F.length("column_name") > 1), noisy).otherwise(
                F.col("column_name")
            ),
        )
    )
    return out.select("table_name", "column_name", "new_name")


def corrupt_swap(
    spark: SparkSession, table_name: str, columns: list[str], seed: str = "c3"
) -> DataFrame:
    """C3: every column takes the NEXT column's name in hash order — a
    deterministic derangement-ish stand-in for the reference's uniform
    random draw (``corruption.py:17,35``)."""
    df = _columns_df(spark, table_name, columns)
    w = Window.orderBy(portable_hash64(F.col("column_name"), seed=seed))
    ranked = df.withColumn("rnk", F.row_number().over(w))
    n = len(columns)
    other = ranked.select(
        F.col("rnk").alias("o_rnk"), F.col("column_name").alias("new_name")
    )
    return (
        ranked.withColumn("next_rnk", F.pmod(F.col("rnk"), F.lit(n)) + 1)
        .join(other, F.col("next_rnk") == F.col("o_rnk"))
        .select("table_name", "column_name", "new_name")
    )


def apply_corruption(df: DataFrame, mapping: DataFrame) -> DataFrame:
    """C4: rename a table's columns from a corruption mapping
    (collects the small mapping — it is one row per column).

    One SELECT with aliases, NOT sequential withColumnRenamed calls:
    swap mappings (corrupt_swap's whole point) make intermediate names
    collide — after alpha→gamma there are two 'gamma' columns and the
    next rename clobbers BOTH (withColumnRenamed renames every
    matching attribute), leaving several columns with one name."""
    pairs = {
        r["column_name"]: r["new_name"] for r in mapping.select("column_name", "new_name").collect()
    }
    return df.select(
        *[F.col(c).alias(pairs.get(c, c)) for c in df.columns]
    )
