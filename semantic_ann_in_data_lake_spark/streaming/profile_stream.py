"""Incremental profiling / rollup of an append-only events table.

The batch twin of these plans is ``registry.events_hourly_rollup`` —
the SAME logical plan (window + agg) runs under ``readStream`` with a
watermark; Structured Streaming maintains the window state and emits
finalized buckets. ``run_available_now`` drives the stream over the
currently-available files and stops — the pattern tests use, and the
production shape for periodic catch-up jobs.

At scale: state is keyed by (window, event_type) — bounded by
cardinality, not rows; the 1-hour watermark bounds state retention;
``foreachBatch`` incremental embedding keys on content_hash so
re-deliveries never re-embed (cache-or-compute S9, streamed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_stream(spark: SparkSession, events_dir: str, schema) -> DataFrame:
    """readStream over a directory of events parquet files."""
    return spark.readStream.schema(schema).parquet(events_dir)


def hourly_rollup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window rollup (same plan as the batch twin)."""
    e = events
    if dict(e.dtypes).get("ts") == "bigint":  # nanos-as-long parquet
        e = e.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return (
        e.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_available_now(
    rollup: DataFrame, table_name: str = "rollup_out", checkpoint_dir: str | None = None
):
    """Drive the stream over all currently-available input and stop.

    Results land in an in-memory table (``spark.table(table_name)``);
    complete output mode because window aggregation state finalizes
    only past the watermark.
    """
    import tempfile

    q = (
        rollup.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option(
            "checkpointLocation",
            checkpoint_dir or tempfile.mkdtemp(prefix="sals_stream_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def incremental_embed_foreach_batch(
    docs_stream: DataFrame,
    sink_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 16,
):
    """foreachBatch incremental embedding: each micro-batch embeds only
    rows whose content_hash is not already in the sink (idempotent
    under re-delivery)."""
    from semantic_ann_in_data_lake_spark.annotate.embedder import embed_texts

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        embedded = embed_texts(batch_df, text_col=text_col, id_cols=(id_col,), dim=dim)
        try:
            seen = spark.read.parquet(sink_path).select("content_hash").distinct()
            fresh = embedded.join(seen, "content_hash", "left_anti")
        except Exception:  # first batch: sink does not exist yet
            fresh = embedded
        fresh.write.mode("append").parquet(sink_path)

    return (
        docs_stream.writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
    )


def incremental_dedup_foreach_batch(docs_stream: DataFrame, sink_path: str,
                                    id_col: str = "doc_id",
                                    text_col: str = "text"):
    """foreachBatch streaming exact dedup (the streamed form of
    ``dedup.exact_duplicates``): each micro-batch keeps one canonical
    row per content digest — the minimum id within the batch — and only
    for digests not already in the sink, so re-deliveries and
    cross-batch duplicates are dropped exactly once.

    Sink rows: (text_hash, canonical_id). First-arrival wins across
    batches; when input files arrive in id order this equals the batch
    operator's global min-id canonicalization. At scale the per-batch
    work is one partial-aggregating groupBy over the micro-batch plus a
    left-anti join against the sink's digest column (parquet
    column-pruned scan; for very large seen-sets swap the sink read for
    a Delta/bucketed table — the plan shape is unchanged)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        firsts = (
            batch_df.select(
                F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col)
            )
            .groupBy("text_hash")
            .agg(F.min(id_col).alias("canonical_id"))
        )
        try:
            seen = spark.read.parquet(sink_path).select("text_hash").distinct()
            fresh = firsts.join(seen, "text_hash", "left_anti")
        except Exception:  # first batch: sink does not exist yet
            fresh = firsts
        fresh.write.mode("append").parquet(sink_path)

    return docs_stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
