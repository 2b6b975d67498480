"""Sinks + the cache-or-compute checkpoint helper (reference S6-S9).

The reference writes JSON/JSONL/CSV artifacts and re-loads them on the
next run instead of recomputing (exists-checks at ``semlink.py:12-16``,
``data_loader.py:145-149``, ``join_discoverer.py:190-197``).
``checkpoint`` is that pattern as a Parquet-backed helper — the unit of
caching for expensive stages (profiles, embeddings, kNN results) so
Spark retries / reruns never redo external-model work (SURVEY §4.3).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_json_lines(df: DataFrame, path: str) -> None:
    """S6: JSONL sink (Spark's native JSON output is line-delimited)."""
    df.write.mode("overwrite").json(path)


def write_csv(df: DataFrame, path: str) -> None:
    """S7: header CSV sink (`SemLink/config.py:103-111`)."""
    df.write.mode("overwrite").option("header", True).csv(path)


def checkpoint(
    spark: SparkSession, path: str, compute: Callable[[], DataFrame]
) -> DataFrame:
    """S9: if ``path`` exists, read it; else compute, persist, read back.

    Reading back (rather than returning the computed plan) pins the
    lineage to the materialized files, so downstream stages never
    re-trigger the upstream computation.
    """
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        compute().write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
