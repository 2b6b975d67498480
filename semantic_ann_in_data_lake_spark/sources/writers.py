"""Sinks + the cache-or-compute checkpoint helper (reference S6-S9).

The reference writes JSON/JSONL/CSV artifacts and re-loads them on the
next run instead of recomputing (exists-checks at ``semlink.py:12-16``,
``data_loader.py:145-149``, ``join_discoverer.py:190-197``).
``checkpoint`` is that pattern as a Parquet-backed helper — the unit of
caching for expensive stages (profiles, embeddings, kNN results) so
Spark retries / reruns never redo external-model work (SURVEY §4.3).
"""

from __future__ import annotations

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
    # probe through the Hadoop FileSystem, not os.path: a driver-local
    # exists() is always False for hdfs://, s3a://, etc., so every call
    # would recompute and rewrite — silently defeating the cache at
    # exactly the deployment scale the helper targets
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path + "/_SUCCESS")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        compute().write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def write_layout(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_by: list[str] | None = None,
    num_output_tasks: int = 8,
) -> None:
    """Layout-optimized parquet sink: hive-partition directories by
    ``partition_by``, rows range-routed and sorted by
    ``partition_by + sort_by``.

    Why this exists at 100 TB: a naive ``partitionBy`` write emits one
    file per (task × partition-value) — thousands of small files per
    value — and unsorted row groups defeat parquet min/max pruning.
    ``repartitionByRange`` gives every output task a CONTIGUOUS
    (partition, sort-key) range, so (a) each hive value's rows land in
    few files, (b) the sort key's min/max ranges are disjoint across
    files AND row groups — later range scans (dates, ids) prune whole
    files from footer stats. ``num_output_tasks`` sizes target files
    (rows/task ≈ total/num); this is the write-side half of scan
    performance — no compaction pass needed.
    """
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in (partition_by + (sort_by or []))]
    routed = df.repartitionByRange(num_output_tasks, *cols).sortWithinPartitions(*cols)
    routed.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def write_orc(df, path: str) -> None:
    """ORC sink — Spark's second built-in columnar format; same
    overwrite contract as the parquet/CSV sinks. Included so lake
    tables written by ORC-native engines interop without a converter
    step; readers are symmetric (``spark.read.orc``)."""
    df.write.mode("overwrite").orc(path)
