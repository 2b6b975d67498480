"""Streaming per-domain admission cap: the ingest-time form of the
batch corpus-balance lever (operators/domains.py::cap_per_domain).

A web-crawl ingest admits documents as they arrive; the no-single-
domain-dominates cap must therefore be enforced ONLINE — once a
registrable domain has n admitted documents, later arrivals from it
are dropped at the door instead of post-hoc. First-arrival-wins
(within a batch, lowest id first) makes the admitted set deterministic
and, when files arrive in id order, IDENTICAL to the batch operator's
keep set over the full log — the stream ≡ batch pin the test asserts.

Scale/exactly-once design (same discipline as the other foreachBatch
sinks): per batch one row-local domain extraction, one
WindowGroupLimit-bounded rank within the batch, one broadcast join
against the ≤n_domains-row admitted-count aggregate of the sink, and
an id-retry-guarded append — a replayed batch's rows are dropped by
the anti-join before quota math runs, so retries can neither
double-admit nor burn quota twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semantic_ann_in_data_lake_spark.streaming.profile_stream import (
    _read_sink_or_none,
    scoped_foreach_batch,
)


def incremental_domain_cap_foreach_batch(
    docs_stream: DataFrame,
    sink_path: str,
    n_per_domain: int,
    id_col: str = "doc_id",
):
    """foreachBatch per-domain admission: sink rows are the ADMITTED
    documents ``(doc_id, domain)``. Quota left for a domain = cap −
    already-admitted; within a batch candidates rank by id so the
    admitted set is deterministic under repartitioning and retries."""
    from semantic_ann_in_data_lake_spark.operators import domains as D

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cand = batch_df.select(
            F.col(id_col),
            D.registrable_domain(D.url_host("url")).alias("domain"),
        )
        sink = _read_sink_or_none(spark, sink_path)
        if sink is not None:
            # retry guard FIRST: a re-delivered row must not re-enter
            # quota math (it is already admitted or already rejected —
            # rejected rows lost their race and stay rejected: the
            # admitted set is append-only, so the outcome replays)
            cand = cand.join(
                sink.select(id_col).distinct(), id_col, "left_anti"
            )
            used = sink.groupBy("domain").agg(
                F.count(F.lit(1)).alias("__used")
            )
        else:
            used = None
        w = Window.partitionBy("domain").orderBy(F.col(id_col).asc())
        ranked = cand.withColumn("__rn", F.row_number().over(w))
        if used is not None:
            ranked = ranked.join(F.broadcast(used), "domain", "left")
            left = F.lit(int(n_per_domain)) - F.coalesce(
                F.col("__used"), F.lit(0)
            )
        else:
            left = F.lit(int(n_per_domain))
        admitted = ranked.where(F.col("__rn") <= left).select(
            id_col, "domain"
        )
        admitted.write.mode("append").parquet(sink_path)

    return docs_stream.writeStream.foreachBatch(
        scoped_foreach_batch(handle)
    ).trigger(availableNow=True)
