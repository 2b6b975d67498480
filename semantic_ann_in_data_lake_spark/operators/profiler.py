"""Column profiler — the catalog builder (reference "SchemaExtraction").

Reproduces the per-column profile record of
``SchemaExtraction/extract_schema.py:33-79``: inferred scalar type
(integer/float/datetime/string, `:11-20`), null count (`:64`), value
count and min/max/avg string-length stats (`:50-59,65-70`, avg rounded
to 2 dp `:69`), plus the distinct-value sample (`:74-77`) and the
latent most-common-values field consumed by the embed prompt
(``SemLink/join_discoverer.py:90,117-119``).

Scale design
------------
``profile`` computes ALL per-column stats in a single global
aggregation over one scan: for an n-column table this is ~6n partial
aggregates that combine map-side, so the job is one scan + a tiny
2-stage reduce — no shuffle proportional to data size, no per-column
re-scan (the reference re-walks the pandas frame per column). The
1-row wide result is then unpivoted driver-side into the catalog shape
(one row per column), which is O(n_columns), not O(rows).

``distinct_sample`` and ``most_common_values`` inherently need
per-value grouping (a real shuffle); they shuffle only the projected
column(s), pre-aggregated map-side, and bound their output (k values)
— at 100 TB the shuffle payload is |distinct values| per column, not
|rows|.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: reference type lattice: pandas dtype → {integer,float,datetime,string}
#: (`extract_schema.py:11-20`); everything else collapses to string.
_TYPE_MAP = {
    "tinyint": "integer",
    "smallint": "integer",
    "int": "integer",
    "bigint": "integer",
    "float": "float",
    "double": "float",
    "date": "datetime",
    "timestamp": "datetime",
    "timestamp_ntz": "datetime",
}


def infer_col_type(spark_dtype: str) -> str:
    base = spark_dtype.split("(")[0].lower()
    if base.startswith("decimal"):
        return "float"
    return _TYPE_MAP.get(base, "string")


def profile(df: DataFrame, table_name: str) -> DataFrame:
    """Catalog rows ``(table_name, column_name, col_type, row_count,
    n_nulls, num_values, min_length, max_length, avg_length)`` — one row
    per column of ``df``, from a single-pass aggregation.

    Stats are computed on the string form of values, exactly like the
    reference (``extract_schema.py:49`` ``astype(str)``); empty columns
    default lengths to 0 (`:65-70`).
    """
    cols = df.columns
    aggs = [F.count(F.lit(1)).alias("__row_count")]
    for c in cols:
        s = F.length(F.col(c).cast("string"))
        aggs += [
            F.count(F.col(c)).alias(f"{c}__num_values"),
            F.min(s).alias(f"{c}__min_length"),
            F.max(s).alias(f"{c}__max_length"),
            F.avg(s).alias(f"{c}__avg_length"),
        ]
    wide = df.agg(*aggs)

    dtypes = dict(df.dtypes)
    per_col = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.lit(infer_col_type(dtypes[c])).alias("col_type"),
            F.col("__row_count").alias("row_count"),
            (F.col("__row_count") - F.col(f"{c}__num_values")).alias("n_nulls"),
            F.col(f"{c}__num_values").alias("num_values"),
            F.coalesce(F.col(f"{c}__min_length"), F.lit(0)).alias("min_length"),
            F.coalesce(F.col(f"{c}__max_length"), F.lit(0)).alias("max_length"),
            F.coalesce(F.round(F.col(f"{c}__avg_length"), 2), F.lit(0.0)).alias(
                "avg_length"
            ),
        )
        for c in cols
    ]
    return (
        wide.select(F.explode(F.array(*per_col)).alias("p"))
        .select(F.lit(table_name).alias("table_name"), "p.*")
    )


def profile_lake(tables: dict[str, DataFrame]) -> DataFrame:
    """Profile every table of a lake → one unified catalog DataFrame.

    Each table is one independent single-pass agg job; the union is a
    plan-level union (no extra shuffle).
    """
    parts = [profile(df, name) for name, df in tables.items()]
    return reduce(DataFrame.unionByName, parts)


def distinct_sample(
    df: DataFrame, table_name: str, columns: list[str], k: int = 30
) -> DataFrame:
    """First-k distinct values per column, deterministic ordering.

    The reference keeps the first 30 distinct values in *insertion*
    order (``extract_schema.py:74-77``) — nondeterministic under
    distributed execution, so we take the k smallest values in binary
    string order instead (divergence documented in SURVEY §7.4).

    Plan per column: project 1 column → distinct (map-side partial) →
    orderBy+limit k (Spark plans TakeOrderedAndProject: only k rows per
    partition survive) → collapse to one array row.
    """
    parts = []
    for c in columns:
        vals = (
            df.select(F.col(c).cast("string").alias("value"))
            .where(F.col("value").isNotNull())
            .distinct()
            .orderBy("value")
            .limit(k)
        )
        parts.append(
            vals.agg(F.sort_array(F.collect_list("value")).alias("values_sample"))
            .select(
                F.lit(table_name).alias("table_name"),
                F.lit(c).alias("column_name"),
                "values_sample",
            )
        )
    return reduce(DataFrame.unionByName, parts)


def most_common_values(
    df: DataFrame, table_name: str, columns: list[str], k: int = 20
) -> DataFrame:
    """Top-k most frequent values per column (reference A11: the
    ``most_common_values`` field of the embed prompt,
    ``join_discoverer.py:90,117-119``).

    Ties broken by value ascending so ranking is deterministic and
    oracle-portable. Shuffle payload = distinct values only (partial
    counts combine map-side).
    """
    from pyspark.sql import Window

    parts = []
    for c in columns:
        counted = (
            df.select(F.col(c).cast("string").alias("value"))
            .where(F.col("value").isNotNull())
            .groupBy("value")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # Distributed top-k first (TakeOrderedAndProject — only k rows per
        # partition survive the sort), THEN a row_number window over the
        # ≤k-row result. A global window over all distinct values would
        # funnel them into one partition; this never does.
        topk = counted.orderBy(F.col("cnt").desc(), F.col("value").asc()).limit(k)
        w = Window.orderBy(F.col("cnt").desc(), F.col("value").asc())
        parts.append(
            topk.withColumn("rank", F.row_number().over(w))
            .select(
                F.lit(table_name).alias("table_name"),
                F.lit(c).alias("column_name"),
                "value",
                "cnt",
                "rank",
            )
        )
    return reduce(DataFrame.unionByName, parts)


def sample_rows_markdown(df: DataFrame, n: int = 10, seed: str = "md42") -> str:
    """F16: render a deterministic sample of rows as a markdown table
    (the reference feeds this into the LLM annotation prompt,
    ``semantic_annotation.py:66-67``: dedup → seeded sample → fillna('')
    → markdown). Driver-side by design — n is tiny and the result is a
    prompt string, not a dataset.

    Sampling is hash-ordered (engine-portable W5 variant) instead of
    the reference's pandas seed-42 draw.
    """
    from semantic_ann_in_data_lake_spark.functions.hashing import portable_hash64

    cols = df.columns
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    rows = (
        df.dropDuplicates()
        .na.fill("")
        .orderBy(portable_hash64(key, seed=seed))
        .limit(n)
        .collect()
    )
    header = "| " + " | ".join(cols) + " |"
    sep = "| " + " | ".join("---" for _ in cols) + " |"
    body = [
        "| " + " | ".join("" if r[c] is None else str(r[c]) for c in cols) + " |"
        for r in rows
    ]
    return "\n".join([header, sep] + body)


def profile_approx_distinct(
    df: DataFrame, table_name: str, rsd: float = 0.05
) -> DataFrame:
    """Approximate distinct-count profile: one HLL++ sketch per column
    in a single pass (``approx_count_distinct``, relative sd ``rsd``).

    The 100 TB companion to :func:`profile`: exact per-column distinct
    counts need a shuffle per column; sketches ride the same single
    global aggregation as the other stats. Not oracle-gated — DuckDB's
    HLL implementation differs — so it carries a rows-only check plus
    an accuracy test against exact counts.
    """
    cols = df.columns
    aggs = [
        F.approx_count_distinct(F.col(c), rsd).alias(f"{c}__approx")
        for c in cols
    ]
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__approx").alias("approx_n_distinct"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select(
        F.lit(table_name).alias("table_name"), "p.*"
    )


def categorical_entropy(df, cols: list[str]) -> "DataFrame":
    """Shannon entropy (bits) + distinct count per categorical column:
    (column, n_distinct, entropy).

    Profiling-depth extension: entropy ranks columns by information
    content — near-zero entropy flags constants/degenerate columns, high
    entropy flags key-like columns (the reference's profiler stops at
    distinct samples, `extract_schema.py`). One partial-aggregating
    groupBy per column over only that column, unioned; each per-column
    result is a handful of rows, so the final union is negligible.
    """
    from pyspark.sql import functions as F

    outs = []
    for c in cols:
        counts = df.groupBy(F.col(c).alias("__v")).agg(
            F.count(F.lit(1)).alias("__n")
        )
        tot = counts.agg(
            F.sum("__n").alias("__tot"), F.count(F.lit(1)).alias("__k")
        )
        p = F.col("__n").cast("double") / F.col("__tot")
        outs.append(
            counts.crossJoin(F.broadcast(tot))
            .agg(
                F.first(F.lit(c)).alias("column"),
                F.first("__k").alias("n_distinct"),
                F.round(
                    -F.sum(p * F.log2(p)) + F.lit(1e-9), 4
                ).alias("entropy"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def validate(df, rules: dict[str, "Column"], unique_cols: list[str] | None = None):
    """Data-quality expectation checks (Deequ-style, minimal): one pass
    over the table evaluating every row-local rule as a conditional
    count, plus optional key-uniqueness checks.

    ``rules`` maps rule name → boolean Column that should hold per row;
    output is (rule, n_rows, n_violations, pass) — one row per rule.
    Row-local rules share a SINGLE aggregation (no per-rule scans);
    each uniqueness check adds one distinct-count aggregation
    (count vs approx tier is the caller's choice at 100 TB — exact here
    since the gate demands determinism).
    """
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(F.when(~cond | cond.isNull(), 1).otherwise(0)).alias(f"__v_{name}")
        )
    row = df.agg(*aggs)
    outs = []
    for name in rules:
        outs.append(
            row.select(
                F.lit(name).alias("rule"),
                F.col("__n").alias("n_rows"),
                F.col(f"__v_{name}").alias("n_violations"),
                (F.col(f"__v_{name}") == 0).alias("pass"),
            )
        )
    for cols in unique_cols or []:
        key = [cols] if isinstance(cols, str) else list(cols)
        dup = (
            df.groupBy(*key)
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(
                F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0)).alias(
                    "__viol"
                ),
                F.sum("__c").alias("__n"),
            )
        )
        outs.append(
            dup.select(
                F.lit(f"unique({','.join(key)})").alias("rule"),
                F.col("__n").alias("n_rows"),
                F.col("__viol").alias("n_violations"),
                (F.col("__viol") == 0).alias("pass"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
