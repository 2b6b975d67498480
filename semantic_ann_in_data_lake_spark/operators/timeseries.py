"""Time-series regularization: per-key resampling onto a fixed grid
with gap-fill by linear interpolation.

Extension beyond the reference surface (its event handling is
row-level annotation): feature pipelines over event streams need
evenly-spaced series (model inputs, rollup joins), and the raw lake
has gaps. This operator buckets events to a fixed interval, builds
each key's [min, max] grid with ``sequence()`` (codegen, no UDF), and
fills missing buckets by linear interpolation between the nearest
observed neighbors (endpoints extend flat).

Scale design:

- One keyed aggregation (bucket means, DECIMAL-exact), one per-key
  min/max, and two per-key windows — every shuffle and window
  partitions by the series key, never globally.
- The nearest-observed-neighbor lookup is the portable
  ``max(struct(bucket, value))`` running-window trick: struct order
  compares the leading timestamp, so the running max IS the latest
  observed (bucket, value) pair — no IGNORE NULLS dependence, same
  semantics in Spark and DuckDB (the oracle uses ``max(row(...))``).
- Grid density is bounded by span/interval per key; the explode is
  linear in output size, which is the floor for a gap-fill operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semantic_ann_in_data_lake_spark.functions.dates import epoch_us

#: see textstats.ROUND_BIAS
_ROUND_BIAS = 1e-9


def resample_interpolate(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    interval: str = "1 hour",
) -> DataFrame:
    """Per-key fixed-interval series with linear gap-fill.

    Returns ``(key, bucket, value, is_observed)``: one row per key per
    interval step from the key's first to last observed bucket.
    Observed buckets carry the DECIMAL-exact bucket mean (4 dp);
    gaps are linearly interpolated between the nearest observed
    neighbors; leading/trailing positions (none here by construction,
    since the grid starts/ends on observed buckets) extend flat.
    """
    # epoch-floor bucketing, NOT date_trunc: date_trunc ignores the
    # interval COUNT ("2 hour" grids would skip odd-hour observations)
    # and rejects plural unit spellings outright ("15 minutes" →
    # all-null buckets → silently empty output). Flooring epoch
    # microseconds to the full step handles any "N unit" and equals
    # date_trunc for the 1-unit case under the UTC session zone.
    parts = interval.split()
    if len(parts) != 2 or not parts[0].isdigit() or int(parts[0]) < 1:
        raise ValueError(f"interval must be '<count> <unit>', got {interval!r}")
    unit_us = {
        "second": 1_000_000,
        "minute": 60_000_000,
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
        "week": 7 * 86_400_000_000,
    }.get(parts[1].rstrip("s"))
    if unit_us is None:
        raise ValueError(f"unsupported interval unit {parts[1]!r}")
    step = int(parts[0]) * unit_us
    e = epoch_us(F.col(ts_col))
    # e − pmod(e, step) is the floored multiple of step (pmod stays
    # non-negative, so pre-epoch timestamps floor correctly too)
    bucket = F.timestamp_micros(e - F.pmod(e, F.lit(step))).alias("bucket")
    # NULL values excluded up front: the decimal sum skips them but a
    # bare count(*) would not, deflating the bucket mean; an all-NULL
    # bucket must be a true GAP (interpolated), not an observation
    observed = (
        events.where(F.col(value_col).isNotNull())
        .select(F.col(key_col).alias("key"), bucket, F.col(value_col).alias("v"))
        .groupBy("key", "bucket")
        .agg(
            # mean via exact-decimal sum then DOUBLE division: decimal
            # division scale rules differ between engines (Spark caps
            # the result scale at precision 38, DuckDB at its own), so
            # a repeating quotient could round differently at 4 dp.
            # double/long division is one IEEE op — identical everywhere.
            F.round(
                F.round(F.sum(F.col("v").cast("decimal(18,2)")), 2)
                .cast("double")
                / F.count(F.lit(1))
                + F.lit(_ROUND_BIAS),
                4,
            ).alias("v")
        )
    )
    grid = (
        observed.groupBy("key")
        .agg(F.min("bucket").alias("h0"), F.max("bucket").alias("h1"))
        .select(
            "key",
            F.explode(
                F.sequence("h0", "h1", F.expr(f"interval {interval}"))
            ).alias("bucket"),
        )
    )
    j = grid.join(observed, ["key", "bucket"], "left")

    w_prev = (
        Window.partitionBy("key")
        .orderBy(F.col("bucket").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("key")
        .orderBy(F.col("bucket").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_pair = F.when(F.col("v").isNotNull(), F.struct("bucket", "v"))
    filled = (
        j.withColumn("prev", F.max(obs_pair).over(w_prev))
        .withColumn("next", F.min(obs_pair).over(w_next))
    )
    t = epoch_us("bucket").cast("double")
    pt = epoch_us(F.col("prev.bucket")).cast("double")
    nt = epoch_us(F.col("next.bucket")).cast("double")
    interp = F.col("prev.v") + (F.col("next.v") - F.col("prev.v")) * (
        (t - pt) / (nt - pt)
    )
    value = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("prev").isNull(), F.col("next.v"))
        .when(F.col("next").isNull(), F.col("prev.v"))
        .otherwise(interp)
    )
    return filled.select(
        F.col("key").alias(key_col),
        "bucket",
        F.round(value + F.lit(_ROUND_BIAS), 4).alias("value"),
        F.col("v").isNotNull().alias("is_observed"),
    )


def zscore_outliers(
    events: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
    value_col: str = "value",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-key z-score anomaly detection: rows whose value deviates
    from THEIR OWN key's mean by more than ``z_threshold`` sample
    standard deviations.

    Two-pass shape, both passes keyed by ``key_col`` (one co-partitioned
    shuffle pair, AQE-coalescible): per-key moments from exact
    DECIMAL(12,2) sums (partition-order-proof), then a join back and a
    row-local z expression. Keys with fewer than 2 rows or zero
    variance emit nothing. Returns ``(key, id, value, z)`` with z at
    4 dp.
    """
    dec = F.col(value_col).cast("decimal(12,2)")
    stats = (
        events.groupBy(key_col)
        .agg(
            # count(dec), not count(*): NULL values (and values past
            # DECIMAL(12,2), which cast to NULL under ANSI-off) vanish
            # from the sums — counting them would deflate the mean and
            # corrupt every z-score for the key
            F.count(dec).alias("__n"),
            F.sum(dec).alias("__s"),
            F.sum(dec * dec).alias("__ss"),
        )
        .where(F.col("__n") >= 2)
    )
    n = F.col("__n").cast("double")
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    stats = stats.select(
        key_col,
        (s / n).alias("__mean"),
        F.sqrt((n * ss - s * s) / (n * (n - 1))).alias("__std"),
    ).where(F.col("__std") > 0)
    z = (F.col(value_col).cast("double") - F.col("__mean")) / F.col("__std")
    return (
        events.select(key_col, id_col, value_col)
        .join(stats, key_col)
        .withColumn("z", F.round(z + F.lit(_ROUND_BIAS), 4))
        .where(F.abs("z") > z_threshold)
        .select(key_col, id_col, value_col, "z")
    )


def ewma_truncated(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    window: int = 32,
    round_dp: int = 6,
) -> DataFrame:
    """Per-key exponentially-weighted moving average (α = 0.5),
    truncated to the last ``window`` observations:

        y_t = Σ_{j=0..window-1} 0.5^(j+1) · x_{t−j}

    the bounded-memory form of the recursive ``y_t = 0.5·x_t +
    0.5·y_{t−1}`` — truncation error ≤ 0.5^window · max|x| (2^-32 at
    the default window: far below the 6-dp output rounding for any
    sane value scale).

    Why α is FIXED at 0.5: every weight is then an exact power of two,
    so each term ``x · 0.5^k`` is an exact IEEE scaling and the only
    rounding anywhere is the final sum — which folds SEQUENTIALLY in
    frame order on both engines (``F.aggregate`` / ``list_sum``),
    making the result bit-identical cross-engine and
    partition-invariant. An arbitrary α would put an engine-specific
    ``pow`` rounding inside every term; a slower/faster decay is a
    different ``window``, not a different α, at this exactness tier.

    Scale shape: one window per key (ROWS frame of ``window`` values —
    bounded state), zero joins, zero Python. The per-row frame list is
    ≤``window`` doubles inside codegen.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-(window - 1), 0)
    )
    lst = F.collect_list(F.col(value_col).cast("double")).over(w)
    out = events.withColumn("__l", lst)
    n = F.size(F.col("__l"))
    # element i (0-based, oldest first) gets weight 0.5^(n-i): the
    # newest (i = n-1) carries α = 0.5
    terms = F.transform(
        F.col("__l"),
        lambda x, i: x * F.pow(F.lit(0.5), (n - i).cast("double")),
    )
    y = F.round(
        F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x), round_dp
    )
    return (
        out.withColumn("ewma", y)
        .withColumn("n_in_window", n)
        .drop("__l")
    )
