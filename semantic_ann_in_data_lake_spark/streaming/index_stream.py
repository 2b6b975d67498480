"""Streaming maintenance of the persistent IVF index (SURVEY §2.10
extension; batch twin: ``operators/ivf_index.py``).

The reference builds its FAISS index once per run from the full
embedding set (``join_discoverer.py`` builds in-memory per query
session); a 100 TB lake instead ingests embeddings continuously. This
sink appends each micro-batch's vectors UNDER THE STORED CENTROIDS —
the same O(new · nlist) no-refit contract as
:func:`refresh_ivf_index` — so the searchable index trails the stream
by one trigger interval and never pauses for a rebuild.

Exactly-once story (two independent layers, both bounded):

1. a committed ``ingest_log`` of batch ids — a replayed foreachBatch
   invocation (same checkpoint, driver retry) short-circuits before
   touching the cells;
2. a vec_id anti-join against the existing cells for cross-run
   re-delivery (fresh checkpoint replaying old files). The probe reads
   ONLY the vec_id column of the cell files (column-pruned scan), and
   can be disabled (``dedup_ids=False``) when a stable checkpoint
   makes layer 1 sufficient.

Even a row that slips both layers (crash between the cell append and
the log write) is absorbed semantically: assignment under stored
centroids is deterministic, so the duplicate is byte-identical, and
:func:`search_ivf_index` deduplicates (query_id, cand_id) pairs before
ranking — replayed appends can never change a search result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_ann_in_data_lake_spark.operators.ivf_index import (
    refresh_ivf_index,
)
from semantic_ann_in_data_lake_spark.streaming.profile_stream import (
    _read_sink_or_none,
)


def stream_refresh_ivf_index(
    emb_stream: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dedup_ids: bool = True,
):
    """``writeStream`` writer that keeps the IVF index at ``path``
    current with an append-only embedding stream. The index must
    already exist (``build_ivf_index``) — centroids are never refit
    here, so cell geometry stays stable under ingestion and the
    assignment invariant (``index_assignment_violations``) holds for
    streamed rows exactly as for built rows.
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        log_path = f"{path}/ingest_log"
        log = _read_sink_or_none(spark, log_path)
        if (
            log is not None
            and log.where(F.col("batch_id") == batch_id).head(1)
        ):
            return  # driver-retry replay of a fully committed batch
        fresh = batch_df
        deduped = False
        if dedup_ids:
            cells = _read_sink_or_none(spark, f"{path}/cells")
            if cells is not None:
                seen = cells.select(
                    F.col("vec_id").alias(id_col)
                ).distinct()
                # persist: the anti-join probes the vec_id column of
                # the ENTIRE index — without this, the emptiness check
                # and the cell append would each run that scan
                fresh = fresh.join(seen, id_col, "left_anti").persist()
                deduped = True
        try:
            if fresh.head(1):
                refresh_ivf_index(spark, path, fresh, id_col, vec_col)
            spark.createDataFrame(
                [(int(batch_id),)], "batch_id long"
            ).write.mode("append").parquet(log_path)
        finally:
            if deduped:
                fresh.unpersist()

    return (
        emb_stream.writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
    )
