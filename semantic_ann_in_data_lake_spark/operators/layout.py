"""Data-layout optimization: Z-order (Morton) clustering for
multi-column scan pruning, plus small-file compaction.

Why this is a first-class 100 TB operator: parquet scan pruning works
off per-row-group min/max statistics. A table sorted by ONE column
prunes predicates on that column only; interleaving the bits of
several normalized columns (the Z-order / Morton curve — the same
public technique lakehouse table formats expose as ``OPTIMIZE ZORDER
BY``) makes row groups tight on EVERY participating column at once, so
selective predicates on any of them skip most of the file. The curve
computation is pure column arithmetic (shift/mask/or), whole-stage
codegen'd — no UDF.

``compact_parquet`` is the companion hygiene operator: streaming sinks
and incremental jobs accrete small files; scans then pay per-file open
cost and lose row-group locality. Compaction = one range-repartition
by the layout key to the target file count and a rewrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_to_int(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Min-max scale a numeric column to [0, 2^bits) as LONG.

    Constant columns (mx == mn) map to 0; nulls map to 0 (they sort
    first, same as parquet stats treat them)."""
    top = (1 << bits) - 1
    span = mx - mn
    scaled = F.when(
        span > 0, F.floor((col.cast("double") - mn) / span * top)
    ).otherwise(F.lit(0))
    return F.coalesce(scaled.cast("long"), F.lit(0))


def zorder_key(scaled: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` of each pre-scaled LONG column into
    one Morton key. With c columns, the key uses c·bits bits — keep
    c·bits ≤ 63. Pure shift/mask arithmetic → codegen'd."""
    n = len(scaled)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a signed long")
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, col in enumerate(scaled):
            bit = F.shiftright(col, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16, key_name: str = "zkey"
) -> DataFrame:
    """Append the Z-order key over ``cols``. Column ranges come from ONE
    tiny min/max aggregate (2·c scalars to the driver) — at production
    scale these bounds come from table statistics instead; the key
    arithmetic is identical."""
    # NaN-excluded bounds: Spark orders NaN GREATEST, so one NaN value
    # would make max() return NaN, the span NaN, and every row of that
    # dimension silently collapse to bucket 0
    def _finite(c):
        col = F.col(c).cast("double")
        return F.when(~F.isnan(col), col)

    bounds = df.agg(
        *[F.min(_finite(c)).alias(f"__mn_{c}") for c in cols],
        *[F.max(_finite(c)).alias(f"__mx_{c}") for c in cols],
    ).collect()[0]
    for c in cols:
        if bounds[f"__mn_{c}"] is None:
            # float(None) below would raise an opaque TypeError
            raise ValueError(
                f"z-order column {c!r} has no non-NULL/non-NaN values"
            )
    scaled = [
        _scale_to_int(
            F.col(c),
            F.lit(float(bounds[f"__mn_{c}"])),
            F.lit(float(bounds[f"__mx_{c}"])),
            bits,
        )
        for c in cols
    ]
    return df.withColumn(key_name, zorder_key(scaled, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    target_files: int = 8,
) -> None:
    """Rewrite ``df`` as ``target_files`` parquet files clustered on the
    Z-order curve of ``cols``: range-repartition on the key (files hold
    contiguous curve segments) + sort within partitions (row groups
    inside each file stay tight)."""
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(target_files, F.col("zkey"))
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_files: int | None = None,
    order_col: str | None = None,
    target_mb: int = 128,
) -> None:
    """Small-file compaction: rewrite ``src_path`` as ``target_files``
    files, optionally range-clustered on ``order_col`` so the rewrite
    also restores scan locality.

    ``target_files=None`` derives the count from the source's on-disk
    DATA byte size (recursive Hadoop FileSystem listing summing only
    ``*.parquet`` files — ContentSummary would also count ``_SUCCESS``
    markers, local-FS ``.crc`` shadows, and stray subdirectory
    metadata, inflating the count near a ``target_mb`` boundary) at
    ``target_mb`` per output file: the auto-sizing a recurring lake
    compaction job needs, since the right file count is a function of
    data volume, not a constant. The listing is driver-side but
    metadata-scale — one RPC page per few thousand files."""
    if target_files is None:
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(src_path)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        total = 0
        it = fs.listFiles(p, True)
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if name.endswith(".parquet") and not name.startswith(
                ("_", ".")
            ):
                total += st.getLen()
        target_files = max(1, -(-int(total) // (target_mb << 20)))
    df = spark.read.parquet(src_path)
    if order_col is not None:
        df = df.repartitionByRange(target_files, F.col(order_col)).sortWithinPartitions(
            order_col
        )
    else:
        df = df.coalesce(target_files)
    df.write.mode("overwrite").parquet(dst_path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Persist ``df`` as a BUCKETED parquet table (hash-partitioned
    into ``num_buckets`` files per partition by ``bucket_cols``,
    optionally sorted within buckets) and return the re-read table.

    Why first-class at 100 TB: two tables bucketed the same way
    (same columns, same bucket count) join and aggregate WITHOUT a
    shuffle — the scan itself reports the hash partitioning to
    Catalyst, so the exchange that dominates every big fact-fact join
    simply disappears from the plan (the plan test pins this). This is
    Spark's native form of the co-located join; the bucket write is a
    one-time cost amortized over every subsequent join/agg on the key
    (cf. the reference persisting its FAISS index once and querying it
    many times, ``join_discoverer.py:268-287`` — same
    write-once/reuse-many discipline applied to relational layout).

    Bucketed tables live in the session warehouse (metastore-backed) —
    ``table_name`` is overwritten.
    """
    spark = df.sparkSession
    # record BEFORE dropping: after DROP TABLE the exists-check is
    # vacuously false and the cleanup below would run unconditionally —
    # including deleting a location a persistent metastore just
    # released correctly
    known = spark.catalog.tableExists(table_name)
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # with the default in-memory catalog, a previous PROCESS's table
    # survives only as its warehouse directory — the DROP above can't
    # see it and the write then fails LOCATION_ALREADY_EXISTS. Clear
    # the orphaned location; only for unqualified names (a qualified
    # 'db.tbl' lives at warehouse/db.db/tbl, which this simple mapping
    # would miss — and a persistent-metastore deployment handles it
    # through the catalog anyway).
    if not known and "." not in table_name:
        import os
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        orphan = os.path.join(wh, table_name.lower())
        if wh and os.path.isdir(orphan):
            shutil.rmtree(orphan)
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)
    return spark.table(table_name)


def assign_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "",
    portable: bool = True,
) -> DataFrame:
    """Deterministic training-shard assignment: ``shard_id =
    hash(id) mod n_shards``. Content-addressed (re-runs and retries
    land every document in the same shard — the idempotence a resumable
    export needs) and key-uniform (no range skew from sorted ids).
    ``salt`` re-deals the assignment without touching the data —
    epoch-level reshuffling for training. ``portable=False`` swaps the
    md5 tier for xxhash64 (the at-scale default; portable exists so the
    assignment itself is oracle-checkable)."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from semantic_ann_in_data_lake_spark.functions.hashing import (
        fast_hash64, portable_hash64,
    )

    key = F.col(id_col).cast("string")
    h = (
        portable_hash64(key, seed=f"shard{salt}:")
        if portable
        else fast_hash64(F.concat(F.lit(f"shard{salt}:"), key))
    )
    return df.withColumn("shard_id", F.pmod(h, F.lit(n_shards)).cast("int"))


def shard_manifest(
    shards: DataFrame, token_count_col: str | None = None
) -> DataFrame:
    """Per-shard manifest ``(shard_id, n_docs[, token_sum])`` — the
    sidecar a training loader reads to plan epochs without listing
    files. One partial-aggregating groupBy over ``n_shards`` groups."""
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if token_count_col is not None:
        aggs.append(
            F.sum(F.col(token_count_col).cast("long")).alias("token_sum")
        )
    return shards.groupBy("shard_id").agg(*aggs)


def write_shards(
    shards: DataFrame,
    path: str,
    n_shards: int,
    fmt: str = "parquet",
    shuffle_by: str | None = None,
    shuffle_salt: str = "",
) -> None:
    """Materialize shards as one directory per ``shard_id``: a
    repartition ON the shard column co-locates each shard into a
    single task, so the hive layout writes exactly one file per shard
    (the fixed-cardinality layout training loaders want), and the
    partition column makes per-shard reads directory-pruned.

    ``shuffle_by``: id column to SHUFFLE each shard's row order by —
    sortWithinPartitions on a salted hash gives the
    shuffled-but-reproducible intra-shard order sequential training
    readers need (same salt → same order on every re-export; new salt
    → fresh order). Sorting is per-task, no extra exchange."""
    out = shards.repartition(n_shards, F.col("shard_id"))
    if shuffle_by is not None:
        from semantic_ann_in_data_lake_spark.functions.hashing import (
            fast_hash64,
        )

        # leading shard_id: the partitioned writer REQUIRES rows sorted
        # by the partition column and would otherwise insert its own
        # (non-stable) sort, destroying the shuffle order; with the
        # partition column as sort prefix the writer reuses this
        # ordering as-is
        out = out.sortWithinPartitions(
            F.col("shard_id"),
            fast_hash64(
                F.concat(
                    F.lit(f"order{shuffle_salt}:"),
                    F.col(shuffle_by).cast("string"),
                )
            ),
        )
    (
        out.write.mode("overwrite")
        .partitionBy("shard_id")
        .format(fmt)
        .save(path)
    )
