"""Distribution-drift scoring between two corpus snapshots.

Training-data pipelines re-ingest continuously; the question "did this
month's data move?" has a standard scalar answer — the Population
Stability Index over a fixed binning:

    PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)

(p = baseline share, q = current share; <0.1 stable, 0.1–0.25 drifting,
>0.25 shifted — the usual scorecard thresholds). KL divergence is the
one-sided variant of the same sum; PSI is symmetric and finite under
smoothing, which is why monitoring uses it.

Spark shape — built so the comparison never co-shuffles the two
snapshots:

- each side collapses to per-bin COUNTS in one partial-aggregating
  groupBy (bins are FIXED-width from declared bounds, not quantiles —
  binning that depends on the data would make the score incomparable
  across runs, and quantile edges would need their own pass);
- the two ≤``n_bins``-row count tables full-outer-join on the bin id —
  a broadcast-sized join regardless of snapshot size — and the PSI sum
  folds over ≤``n_bins`` rows;
- Laplace-style smoothing (+½ per bin) keeps empty bins finite and
  deterministic on both engines.

The per-bin count tables are MERGEABLE summaries (integer adds), so at
100 TB each day's snapshot keeps its own bin table and any pair of
days scores in milliseconds — the same property as the CMS sketch
(operators/sketches.py).

Float discipline: bin counts are exact integers; shares and the ln
fold are ≤``n_bins`` double terms, rounded at 4 dp with the +1e-9
nudge — the profile_entropy convention (plans/q_profile.py), gated
green since round 3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bin_counts(
    df: DataFrame, col: str, lo: float, width: float, n_bins: int
) -> DataFrame:
    """Fixed-width histogram ``(bin, n)``; values outside [lo, lo +
    n_bins·width) clamp into the edge bins so totals are preserved
    (drift TO out-of-range values must move the score, not vanish).
    NULLs are excluded — null-rate drift is a separate check."""
    if width <= 0 or n_bins < 2:
        raise ValueError("width must be > 0 and n_bins >= 2")
    # clamp in LONG, cast to int AFTER: casting the raw floor first
    # overflows int on extreme outliers (ANSI mode: job-killing CAST
    # error; legacy: negative wraparound that clamps a huge HIGH value
    # into the LOW edge bin, moving drift the wrong way)
    b = F.floor((F.col(col) - F.lit(lo)) / F.lit(width))
    clamped = F.least(
        F.greatest(b, F.lit(0).cast("long")), F.lit(n_bins - 1).cast("long")
    ).cast("int")
    return (
        df.where(F.col(col).isNotNull())
        .select(clamped.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def psi_from_counts(
    base: DataFrame, curr: DataFrame, n_bins: int, round_dp: int = 4
) -> DataFrame:
    """One-row ``(base_n, curr_n, psi)`` from two bin-count tables."""
    from pyspark.sql.window import Window

    j = (
        base.withColumnRenamed("n", "bn")
        .join(curr.withColumnRenamed("n", "cn"), "bin", "full_outer")
        .select(
            F.coalesce("bn", F.lit(0)).alias("bn"),
            F.coalesce("cn", F.lit(0)).alias("cn"),
        )
    )
    # totals via a GLOBAL window over the ≤n_bins-row bin table (a
    # single-partition exchange of ≤n_bins rows — metadata-sized), not
    # a separate aggregate + join: Catalyst does not share the
    # aggregation subtree across a self-join, so the join form scans
    # each SNAPSHOT twice (observed in the plan audit)
    wall = Window.partitionBy()
    jt = j.select(
        "bn", "cn",
        F.sum("bn").over(wall).alias("bt"),
        F.sum("cn").over(wall).alias("ct"),
    )
    # smoothing denominator uses the FIXED bin count, so a bin empty on
    # both sides (absent from the join) contributes exactly 0 and the
    # result is independent of which empty bins happen to materialize
    p = (F.col("bn") + F.lit(0.5)) / (F.col("bt") + F.lit(0.5) * n_bins)
    q = (F.col("cn") + F.lit(0.5)) / (F.col("ct") + F.lit(0.5) * n_bins)
    zero = (F.col("bn") == 0) & (F.col("cn") == 0)
    contrib = F.when(zero, F.lit(0.0)).otherwise((p - q) * F.log(p / q))
    return jt.agg(
        F.coalesce(F.first("bt"), F.lit(0)).alias("base_n"),
        F.coalesce(F.first("ct"), F.lit(0)).alias("curr_n"),
        # empty-vs-empty scores 0.0, not NULL (sum over zero rows)
        F.coalesce(
            F.round(F.sum(contrib) + F.lit(1e-9), round_dp), F.lit(0.0)
        ).alias("psi"),
    )


def psi_drift(
    base: DataFrame,
    curr: DataFrame,
    col: str,
    lo: float,
    width: float,
    n_bins: int,
    label: str | None = None,
) -> DataFrame:
    """PSI of ``col`` between two snapshots: ``(column, base_n, curr_n,
    psi)`` — one row."""
    out = psi_from_counts(
        bin_counts(base, col, lo, width, n_bins),
        bin_counts(curr, col, lo, width, n_bins),
        n_bins,
    )
    return out.select(
        F.lit(label or col).alias("column"), "base_n", "curr_n", "psi"
    )


def quantiles_from_bins(
    bins: DataFrame,
    lo: float,
    width: float,
    qs: tuple = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Approximate quantiles from a fixed-width bin-count table —
    error ≤ one bin width, DETERMINISTIC (unlike ``percentile_approx``,
    whose sketch depends on merge order), and mergeable by
    construction: at 100 TB each slice keeps its histogram
    (:func:`bin_counts` — integer adds to merge) and any quantile of
    any slice union is a ≤n_bins-row computation, no data re-read.

    Per quantile q: target rank ``ceil(q·N)``; the answer bin is the
    first with cumulative count ≥ target; the estimate interpolates
    linearly inside it. All ranks are exact integers; the only float
    ops are the final fixed-shape interpolation — cross-engine safe.

    Returns ``(q, n_total, est)`` — one row per requested quantile.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    if any(not 0 < q <= 1 for q in qs):
        raise ValueError("quantiles must be in (0, 1]")
    from pyspark.sql.window import Window

    w = Window.partitionBy().orderBy("bin")
    wall = Window.partitionBy()
    c = bins.select(
        "bin",
        "n",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(wall).alias("total"),
    )
    qdf = c.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    # per (q, bin): the first bin whose cum covers the target rank
    tgt = F.ceil(F.col("q") * F.col("total")).cast("long")
    hit = (
        c.join(F.broadcast(qdf))
        .withColumn("__tgt", tgt)
        .where(F.col("cum") >= F.col("__tgt"))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("q").orderBy(F.col("bin").asc())
            ),
        )
        .where(F.col("__rn") == 1)
    )
    frac = (
        F.col("__tgt") - (F.col("cum") - F.col("n"))
    ).cast("double") / F.col("n").cast("double")
    est = F.round(
        F.lit(float(lo))
        + (F.col("bin").cast("double") + frac) * F.lit(float(width)),
        6,
    )
    return hit.select(
        "q", F.col("total").alias("n_total"), est.alias("est")
    )
