"""Streaming extensions: the streamed rollup must equal its batch twin,
and incremental embedding must be idempotent under re-delivery."""

from __future__ import annotations

import shutil


def _stage_dir(src_parquet: str, tmp_path, name: str) -> str:
    """Spark's file stream source requires a directory input."""
    d = tmp_path / name
    d.mkdir()
    shutil.copy(src_parquet, d / "part-000.parquet")
    return str(d)


def test_stream_rollup_equals_batch(spark, sf_dir, tmp_path):
    from semantic_ann_in_data_lake_spark.plans.registry import events_hourly_rollup
    from semantic_ann_in_data_lake_spark.streaming.profile_stream import (
        events_stream,
        hourly_rollup_stream,
        run_available_now,
    )

    batch = events_hourly_rollup(spark, sf_dir)
    events_dir = _stage_dir(f"{sf_dir}/events.parquet", tmp_path, "events_in")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = events_stream(spark, events_dir, raw_schema)
    assert stream.isStreaming
    rollup = hourly_rollup_stream(stream)
    run_available_now(rollup, table_name="rollup_test")
    got = spark.table("rollup_test").collect()
    want = batch.collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_incremental_embed_idempotent(spark, sf_dir, tmp_path):
    from semantic_ann_in_data_lake_spark.streaming.profile_stream import (
        incremental_embed_foreach_batch,
    )

    sink = str(tmp_path / "emb_sink")
    docs_dir = _stage_dir(f"{sf_dir}/documents.parquet", tmp_path, "docs_in")
    docs_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    for i in range(2):  # second pass re-delivers the same files
        stream = spark.readStream.schema(docs_schema).parquet(docs_dir)
        writer = incremental_embed_foreach_batch(stream, sink, dim=4)
        q = writer.option("checkpointLocation", str(tmp_path / f"ckpt_{i}")).start()
        q.awaitTermination()
    out = spark.read.parquet(sink)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert out.count() == n_docs  # no duplicates from the second delivery
    assert out.select("content_hash").distinct().count() == n_docs
