"""Column→text serialization (reference V1/V2) as pure column exprs.

The reference serializes a column profile to a natural-language
sentence for embedding:

- DeepJoin form (``DeepJoin/repositoryLoader.py:139-180``,
  ``pairsBuilder.py:10-43``): ``"{title}. {header} contains {n} values
  ({max}, {min}, {avg}): v1, v2, …"`` with annotation- and
  corruption-aware variants.
- SemLink prompt form (``SemLink/join_discoverer.py:64-127``): a
  multi-line description combining annotation, table description,
  examples, stats and most-common values.

Both are ``concat_ws``/``when`` compositions — fully codegen'd, no
Python in the loop, and SQL-expressible for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def column_to_text(
    header: Column,
    num_values: Column,
    min_len: Column,
    max_len: Column,
    avg_len: Column,
    values_sample: Column,
    title: Column | None = None,
) -> Column:
    """DeepJoin V1 sentence for one column profile row."""
    base = F.concat(
        header,
        F.lit(" contains "),
        num_values.cast("string"),
        F.lit(" values (max="),
        max_len.cast("string"),
        F.lit(", min="),
        min_len.cast("string"),
        F.lit(", avg="),
        avg_len.cast("string"),
        F.lit("): "),
        F.array_join(values_sample, ", "),
    )
    if title is not None:
        # NULL-title rows keep the base sentence: concat's any-NULL-in
        # semantics would null the WHOLE text and the embedder would
        # index an empty string (same guard as embed_prompt's optional
        # description)
        return F.when(title.isNotNull(), F.concat(title, F.lit(". "), base)).otherwise(base)
    return base


def column_to_text_sql(
    header: str,
    num_values: str,
    min_len: str,
    max_len: str,
    avg_len: str,
    values_sample: str,
    title: str | None = None,
) -> str:
    """DuckDB twin of :func:`column_to_text`."""
    base = (
        f"{header} || ' contains ' || ({num_values})::VARCHAR"
        f" || ' values (max=' || ({max_len})::VARCHAR"
        f" || ', min=' || ({min_len})::VARCHAR"
        f" || ', avg=' || ({avg_len})::VARCHAR"
        f" || '): ' || array_to_string({values_sample}, ', ')"
    )
    if title is not None:
        return (
            f"CASE WHEN ({title}) IS NULL THEN {base} "
            f"ELSE ({title}) || '. ' || {base} END"
        )
    return base


def embed_prompt(
    table_name: Column,
    column_name: Column,
    col_type: Column,
    num_values: Column,
    values_sample: Column,
    description: Column | None = None,
) -> Column:
    """SemLink V2 multi-line embed prompt (conditional sections via
    ``when``, mirroring ``join_discoverer.py:64-127``)."""
    parts = [
        F.concat(F.lit("Column: "), column_name),
        F.concat(F.lit("Table: "), table_name),
        F.concat(F.lit("Type: "), col_type),
        F.concat(F.lit("Values count: "), num_values.cast("string")),
        F.concat(F.lit("Examples: "), F.array_join(values_sample, ", ")),
    ]
    if description is not None:
        parts.insert(
            2,
            F.when(
                description.isNotNull() & (F.length(description) > 0),
                F.concat(F.lit("Description: "), description),
            ).otherwise(F.lit("")),
        )
    joined = F.concat_ws("\n", *parts)
    return F.regexp_replace(joined, r"\n\n+", "\n")
