"""Sources and sinks: scans, writers, checkpoint helper (SURVEY §2.1)."""

from semantic_ann_in_data_lake_spark.sources.readers import (
    read_table,
    read_lake,
    read_csv_dir,
    read_json_catalog,
    read_jsonl,
)
from semantic_ann_in_data_lake_spark.sources.writers import (
    write_parquet,
    write_json_lines,
    write_csv,
    checkpoint,
)

__all__ = [
    "read_table",
    "read_lake",
    "read_csv_dir",
    "read_json_catalog",
    "read_jsonl",
    "write_parquet",
    "write_json_lines",
    "write_csv",
    "checkpoint",
]
