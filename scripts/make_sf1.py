"""Derive a deterministic sf1 fixture from the driver's sf0.1 parquet.

The driver ships sf{0.001,0.01,0.1} only; the scaling curve needs one
more decade to show no query goes super-linear (VERDICT r3 task 7).
This derives sf1 by replicating the FACT tables 10× with shifted
surrogate keys while keeping the dimension tables as-is:

- ``orders``/``lineitem``: ``*_orderkey += copy · K`` (K = a power of
  ten above max(o_orderkey), so shifted keys never collide and stay
  readable); ``o_custkey``/``l_partkey``/``l_suppkey`` unchanged — they
  reference the unchanged dimensions, so every join fan-out grows 10×,
  which is exactly what a fact-table decade does in a real warehouse.
- ``events``: ``event_id`` shifted the same way; ``user_id`` unchanged
  (10× events per user); timestamps unchanged (denser traffic, same
  window widths).
- ``documents``/``embeddings``: ``doc_id``/``vec_id`` shifted in
  lockstep so the doc↔vector linkage survives; text/vectors repeat,
  which is realistic for dedup workloads (near-dup density grows) and
  irrelevant for the relational/bench queries the curve tracks.
- dimensions (``region nation customer supplier part``): copied.

Output: ``<repo>/testdata_sf1/*.parquet`` (gitignored — regenerate with
``python scripts/make_sf1.py``; ~170 MB, <2 min on local[32]).
Deterministic: pure column arithmetic over the seed=42 driver fixtures,
no randomness of our own.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

COPIES = 10
SRC = "/root/testdata/sf0.1"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1"
)

DIMS = ["region", "nation", "customer", "supplier", "part"]
#: fact table -> columns that carry its surrogate key family
FACT_KEYS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _key_stride(spark, src: str) -> int:
    """One global power-of-ten stride above the max of EVERY shifted key
    column, so no key family can collide across copies."""
    mx = 0
    for t, keys in FACT_KEYS.items():
        row = (
            spark.read.parquet(f"{src}/{t}.parquet")
            .agg(*[F.max(k).alias(k) for k in keys])
            .head()
        )
        mx = max(mx, *[int(v) for v in row])
    stride = 1
    while stride <= mx:
        stride *= 10
    return stride


def make_sf1(spark, src: str = SRC, dst: str = DST, copies: int = COPIES):
    from semantic_ann_in_data_lake_spark.sources.readers import read_table

    os.makedirs(dst, exist_ok=True)
    stride = _key_stride(spark, src)
    copy_df = spark.range(copies).select(F.col("id").alias("__copy"))
    for t in DIMS:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")
    for t, keys in FACT_KEYS.items():
        # events goes through read_table (TIMESTAMP_NANOS handling);
        # plain parquet read elsewhere keeps source schemas untouched.
        df = (
            read_table(spark, src, t)
            if t == "events"
            else spark.read.parquet(f"{src}/{t}.parquet")
        )
        out = df.crossJoin(F.broadcast(copy_df))
        for kcol in keys:
            out = out.withColumn(
                kcol, F.col(kcol) + F.col("__copy") * F.lit(stride)
            )
        out.drop("__copy").repartition(32).write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
    print(f"sf1 fixture written to {dst} (stride={stride}, copies={copies})")


if __name__ == "__main__":
    from semantic_ann_in_data_lake_spark.session import get_spark

    make_sf1(get_spark("make_sf1"))
