"""Sequence packing: assign documents to fixed-token-budget bins for
training-batch construction.

Training-data-pipeline extension beyond the reference surface: after
dedup/filtering, documents are concatenated into fixed-length model
sequences; the assignment step is "which bin does each doc start in,
at which offset". The deterministic contiguous policy used here packs
docs in id order and lets a doc straddle a bin boundary (the common
"packed dataset" layout where sequences are sliced from a continuous
token stream): bin = cum_tokens_before // budget, offset =
cum_tokens_before % budget.

Scale design — the global running sum is the textbook DISTRIBUTED
PREFIX SUM, not a single-partition window: range-partition by id, one
per-partition cumulative window (parallel), aggregate one row of
per-partition totals (n_partitions rows — schema-sized), turn those
into partition offsets with a window over the tiny totals frame, and
broadcast-join the offsets back. Total cost: one range shuffle + one
tiny aggregate — vs Window.orderBy(id) which funnels the WHOLE corpus
through one task (the plan test pins the absence of a single-partition
exchange on the data path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def token_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer=None,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, [extra_cols,] n_tokens) — THE tokenizer seam for every
    token-accounting operator (same contract as
    functions.text.token_truncate):

    - ``tokenizer=None``: whitespace tokens, pure JVM expressions —
      the oracle-gated tier;
    - ``tokenizer=factory``: exact-token tier. ``factory()`` must
      return an ``encode(str) -> list[int]`` object (tiktoken's
      interface; functions.bpe.BpeTokenizer fits) and is invoked once
      per Python worker inside an Arrow-batched mapInPandas.

    NULL text counts NULL in both tiers.
    """
    from semantic_ann_in_data_lake_spark.functions.text import words

    if tokenizer is None:
        return docs.select(
            F.col(id_col),
            *[F.col(c) for c in extra_cols],
            F.size(words(text_col)).cast("long").alias("n_tokens"),
        )

    id_type = dict(docs.dtypes)[id_col]
    extra_schema = "".join(
        f", {c} {dict(docs.dtypes)[c]}" for c in extra_cols
    )

    def run(batches):
        import pandas as pd

        enc = tokenizer()
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    **{c: pdf[c] for c in extra_cols},
                    "n_tokens": pdf[text_col].map(
                        lambda t: len(enc.encode(t))
                        if isinstance(t, str)
                        else None
                    ),
                }
            )

    return docs.select(id_col, *extra_cols, text_col).mapInPandas(
        run, schema=f"{id_col} {id_type}{extra_schema}, n_tokens long"
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    num_partitions: int | None = None,
    tokenizer=None,
) -> DataFrame:
    """(id, n_tokens, cum_before, bin_id, bin_offset) per document.

    ``n_tokens`` comes from :func:`token_counts` — whitespace tier by
    default (the oracle-gated tier), exact-BPE/tiktoken through the
    ``tokenizer`` factory seam. All downstream arithmetic is
    integer-exact, so the assignment is reproducible cross-engine
    under either tokenizer.
    """
    toks = token_counts(docs, id_col, text_col, tokenizer=tokenizer)
    if num_partitions:
        toks = toks.repartitionByRange(num_partitions, F.col(id_col))
    else:
        toks = toks.repartitionByRange(F.col(id_col))
    part = toks.withColumn("__pid", F.spark_partition_id())
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    from semantic_ann_in_data_lake_spark.cache import scoped_persist

    # local feeds BOTH the totals aggregate and the final cum join;
    # Catalyst does not CSE across branches, so without this the scan +
    # range shuffle + window run twice (observed 2 scans / 2 range
    # exchanges in the executed plan).
    local = scoped_persist(
        part.withColumn("__local_cum", F.sum("n_tokens").over(w_local))
    )
    # per-partition totals: n_partitions rows — schema-sized, not
    # data-sized; the offsets window runs over this tiny frame only
    totals = local.groupBy("__pid").agg(F.sum("n_tokens").alias("__ptot"))
    w_off = (
        Window.orderBy(F.col("__pid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.withColumn(
        "__offset", F.sum("__ptot").over(w_off) - F.col("__ptot")
    ).select("__pid", "__offset")
    cum = local.join(F.broadcast(offsets), "__pid").withColumn(
        "__cum", F.col("__local_cum") + F.col("__offset")
    )
    before = F.col("__cum") - F.col("n_tokens")
    # `div` keeps the division in LONG arithmetic end to end; a double
    # division rounds above 2^53 cumulative tokens and would diverge
    # from the oracle's integer // at extreme scale.
    return cum.withColumn("cum_before", before).select(
        F.col(id_col),
        "n_tokens",
        "cum_before",
        F.expr(f"cum_before div {int(budget)}L").alias("bin_id"),
        (F.col("cum_before") % budget).alias("bin_offset"),
    )


def grouped_running_total(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    val_col: str,
    out_col: str = "running",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group running total of ``val_col`` in ``order_cols`` order —
    the GROUPED form of :func:`pack_sequences`'s distributed prefix
    sum, for when one group can be corpus-sized.

    A plain ``Window.partitionBy(group)`` funnels each group through
    ONE task — fatal when a group holds a large share of 100 TB (the
    dominant source of a training mix routinely does). Here the data
    range-partitions on (group, order keys), each partition computes a
    LOCAL cumulative sum (parallel), per-(group, partition) totals —
    a frame of at most n_partitions + n_groups rows — turn into
    partition offsets with a window over that tiny frame only, and a
    broadcast join adds the offsets back. One range shuffle + one tiny
    aggregate, any group size.

    ``order_cols`` must totally order rows WITHIN a group (include a
    unique tiebreaker such as the id column) — ties across a partition
    boundary would otherwise make the running total nondeterministic.
    """
    if not order_cols:
        raise ValueError("order_cols must totally order rows within a group")
    group = F.col(group_col)
    order = [c if isinstance(c, Column) else F.col(c) for c in order_cols]
    if num_partitions:
        keyed = df.repartitionByRange(num_partitions, group, *order)
    else:
        keyed = df.repartitionByRange(group, *order)
    part = keyed.withColumn("__pid", F.spark_partition_id())
    w_local = (
        Window.partitionBy(group_col, "__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    from semantic_ann_in_data_lake_spark.cache import scoped_persist

    # feeds BOTH the totals aggregate and the final join (Catalyst
    # does not CSE across branches — same reuse shape as
    # pack_sequences)
    local = scoped_persist(
        part.withColumn("__local_cum", F.sum(val_col).over(w_local))
    )
    totals = local.groupBy(group_col, "__pid").agg(
        F.sum(val_col).alias("__ptot")
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy(F.col("__pid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.withColumn(
        "__offset", F.sum("__ptot").over(w_off) - F.col("__ptot")
    ).select(group_col, "__pid", "__offset")
    return (
        local.join(F.broadcast(offsets), [group_col, "__pid"])
        .withColumn(out_col, F.col("__local_cum") + F.col("__offset"))
        .drop("__pid", "__local_cum", "__offset")
    )


def select_to_token_budget(
    df: DataFrame,
    quotas: DataFrame,
    group_col: str = "source",
    order_cols: list | None = None,
    weight_col: str = "n_tokens",
    quota_col: str = "alloc_tokens",
    num_partitions: int | None = None,
    tokenizer=None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy per-group selection filling each group's token quota —
    the SELECTION step that turns a mixture allocation
    (``temperature_mix_allocation``: tokens per source) into actual
    rows: walk each group in ``order_cols`` order (put the best docs
    first) and keep a row iff the running token total BEFORE it is
    still under the group's quota. The straddling document is kept, so
    every quota is met exactly once the group has enough tokens;
    groups short of quota contribute everything they have.

    ``quotas``: one row per group with ``quota_col`` (token budget).
    Adds ``cum_before`` (tokens admitted before this row) to the
    selected rows. Deterministic given a totally-ordering
    ``order_cols`` (include the id column as tiebreaker); integer
    arithmetic end to end, so the selected SET is reproducible
    cross-engine. Scale: the running total is the skew-safe
    :func:`grouped_running_total`; the quota join broadcasts the
    n_groups-row allocation table.

    ``tokenizer``/``text_col``: the :func:`token_counts` seam — when a
    tokenizer factory is given, ``weight_col`` is (re)computed as the
    exact token count of ``text_col`` before selection, so budgets are
    enforced in the same units the model will see. Default keeps the
    caller-supplied weights (whitespace-tier or precomputed).
    """
    if tokenizer is not None:
        counts = token_counts(
            df, id_col=id_col, text_col=text_col, tokenizer=tokenizer
        )
        df = df.drop(weight_col).join(
            counts.withColumnRenamed("n_tokens", weight_col), id_col
        )
    run = grouped_running_total(
        df, group_col, order_cols, weight_col,
        out_col="__cum", num_partitions=num_partitions,
    )
    sel = run.join(F.broadcast(quotas), group_col)
    before = F.col("__cum") - F.col(weight_col)
    return (
        sel.where(before < F.col(quota_col))
        .withColumn("cum_before", before)
        .drop("__cum", quota_col)
    )


def length_bucket_batches(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_bucket: int = 16,
    max_bucket: int = 4096,
) -> DataFrame:
    """Inference-side counterpart of :func:`pack_sequences`: batched
    serving pads every sequence in a batch to the batch max, so
    batching unsorted traffic wastes compute proportional to the
    length spread. The standard fix buckets by power-of-two token
    length; this operator reports the bucket layout AND its padding
    economics so a serving owner can size buckets from data:

    ``(bucket, n_docs, token_sum, padded_sum, padding_waste)`` where
    ``bucket`` is the po2 capacity each doc pads to (clamped to
    [min_bucket, max_bucket] — oversize docs would be split upstream),
    ``padded_sum = n_docs·bucket``, and ``padding_waste = 1 −
    token_sum/padded_sum`` (the fraction of batch compute spent on
    pad tokens). One row-local bucket expression + one groupBy over
    ≤log2(max/min)+1 groups; integer-exact, cross-engine.
    """
    if min_bucket < 1 or max_bucket < min_bucket:
        raise ValueError("need 1 <= min_bucket <= max_bucket")
    if min_bucket & (min_bucket - 1) or max_bucket & (max_bucket - 1):
        raise ValueError("buckets must be powers of two")
    from semantic_ann_in_data_lake_spark.functions.text import words

    toks = docs.select(
        F.col(id_col), F.size(words(text_col)).cast("long").alias("n_tokens")
    )
    # next power of two ≥ n (n ≥ 1): 2^ceil(log2(n)). Safe cross-engine
    # because log2 is EXACT at powers of two (the only inputs where
    # ceil sits on a boundary): 2^k is representable and a correctly-
    # rounded log2 returns exactly k there, in both the JVM and DuckDB
    po2 = F.expr(
        "shiftleft(1L, cast(ceil(log2(greatest(n_tokens, 1))) as int))"
    )
    bucket = F.least(
        F.greatest(po2, F.lit(min_bucket).cast("long")),
        F.lit(max_bucket).cast("long"),
    )
    b = toks.withColumn("bucket", bucket)
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("token_sum"),
        )
        .select(
            "bucket",
            "n_docs",
            "token_sum",
            (F.col("n_docs") * F.col("bucket")).alias("padded_sum"),
            F.round(
                F.lit(1.0)
                - F.col("token_sum").cast("double")
                / (F.col("n_docs") * F.col("bucket")).cast("double"),
                6,
            ).alias("padding_waste"),
        )
    )


def replay_upsample(
    df: DataFrame,
    factor: Column,
    id_col: str = "doc_id",
    salt: str = "replay",
    portable: bool = True,
    max_factor: float = 100.0,
) -> DataFrame:
    """Source-level replay mixing: repeat each row ``factor`` times —
    the "books x2.5 epochs, web x0.7" primitive that turns a mixture
    allocation into an epoch-expanded document stream. Each row emits
    ``ceil(factor)`` candidate copies (``copy_idx`` 0..); a copy is
    kept when ``copy_idx < floor(factor)`` (the whole replays), plus
    the one fractional copy when a deterministic uniform from
    ``hash(id)`` lands under ``frac(factor)`` — so factor 2.5 replays
    every row twice and a content-chosen, reproducible half of the
    rows a third time, and factor 0.7 DOWN-samples to ~70% (one op
    covers both directions; factor <= 0 drops the row entirely).

    Deterministic and content-addressed: re-runs, retries, and
    repartitions keep exactly the same copies (the fractional draw
    depends only on the id hash, never on row order). Scale: entirely
    row-local — one projection, a bounded explode (fan-out clamped to
    ``max_factor``), a filter; no shuffle, no window, no driver state.
    ``portable=False`` swaps the md5-tier uniform for xxhash64 (the
    at-scale default; the portable tier exists so the selection is
    oracle-checkable cross-engine).
    """
    from semantic_ann_in_data_lake_spark.functions.hashing import (
        fast_hash64,
        portable_hash64,
    )

    f_col = F.least(factor.cast("double"), F.lit(float(max_factor)))
    key = F.col(id_col).cast("string")
    h = (
        portable_hash64(key, seed=f"{salt}:")
        if portable
        else fast_hash64(F.concat(F.lit(f"{salt}:"), key))
    )
    # uniform in (0, 1]: same idiom as weighted_sample's u, bit-equal
    # in DuckDB via portable_hash_expr
    u = (
        ((F.pmod(h, F.lit(1000000007))) + 1).cast("double") / 1000000008.0
    )
    base = (
        df.withColumn("__replay_f", f_col)
        .where(F.col("__replay_f") > 0)
        .withColumn("__replay_u", u)
    )
    out = base.withColumn(
        "copy_idx",
        F.explode(
            F.sequence(
                F.lit(0),
                F.ceil(F.col("__replay_f")).cast("int") - 1,
                F.lit(1),
            )
        ),
    )
    whole = F.col("copy_idx") < F.floor(F.col("__replay_f"))
    frac = F.col("__replay_f") - F.floor(F.col("__replay_f"))
    keep = whole | (F.col("__replay_u") < frac)
    return out.where(keep).drop("__replay_f", "__replay_u")
