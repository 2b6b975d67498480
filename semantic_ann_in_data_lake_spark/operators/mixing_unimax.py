"""UniMax mixture allocation (Chung, Garcia, Constant et al. 2023,
"UniMax: Fairer and More Effective Language Sampling for Large-Scale
Multilingual Pretraining"): allocate a token budget across sources
UNIFORMLY, capped at E epochs per source — the published successor to
temperature sampling (which still over-weights head sources at any α).

The allocation is a classic waterfill: alloc_s = min(capacity_s, τ)
with capacity_s = tokens_s · E and the water level τ chosen so the
allocations sum to the budget. Closed form over the capacity-sorted
prefix sums (no iteration): fill every source below the level fully,
split what remains uniformly over the rest.

Determinism contract: the level-selection predicate is pure INTEGER
arithmetic — ``B − prefix_j ≤ capacity_j · remaining_j`` is the
division-free form of ``τ_j ≤ capacity_j`` — so the chosen breakpoint
is cross-engine exact; the only float ops are one floor-division for
the final level and the epochs readout, both rounded
(`plans/q_pipeline.py::unimax_mix_allocation` replays it in DuckDB).

Scale shape: everything after the per-source aggregate runs on the
#sources-row table (window prefix sums + one 1-row broadcast) — the
corpus-sized work is only the upstream token count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def unimax_allocation(
    per_source: DataFrame,
    epoch_cap: int = 4,
    budget: int | None = None,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """``(source, …, capacity, alloc_tokens, epochs)`` — see module
    docstring. ``budget=None`` defaults to half the total capacity
    (a self-scaling fixture-friendly default; production passes the
    real token budget)."""
    if epoch_cap < 1:
        raise ValueError("epoch_cap >= 1 required")
    v = per_source.withColumn(
        "capacity", (F.col(tokens_col) * F.lit(epoch_cap)).cast("long")
    )
    w = Window.orderBy(F.col("capacity").asc(), F.col(source_col).asc())
    r = v.select(
        "*",
        F.row_number().over(w).alias("__rk"),
        F.coalesce(
            F.sum("capacity").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__prefix"),
        F.count(F.lit(1)).over(
            Window.partitionBy()
        ).alias("__m"),
    )
    if budget is None:
        b_frame = v.agg(
            F.floor(
                F.sum("capacity").cast("double") / F.lit(2.0)
            ).cast("long").alias("__b")
        )
    else:
        b_frame = v.sparkSession.range(1).select(
            F.lit(int(budget)).cast("long").alias("__b")
        )
    r = r.crossJoin(F.broadcast(b_frame))
    pick = (
        r.where(
            (F.col("__b") - F.col("__prefix"))
            <= F.col("capacity") * (F.col("__m") - F.col("__rk") + 1)
        )
        .agg(F.min(F.struct("__rk", "__prefix", "__m")).alias("__p"))
        .select(
            F.col("__p.__prefix").alias("__pnum"),
            (F.col("__p.__m") - F.col("__p.__rk") + 1).alias("__pden"),
        )
    )
    out = r.crossJoin(F.broadcast(pick)).select(
        source_col,
        *[c for c in per_source.columns if c != source_col],
        "capacity",
        F.when(
            F.col("__pden").isNull(), F.col("capacity")
        )
        .otherwise(
            F.least(
                F.col("capacity"),
                F.floor(
                    (F.col("__b") - F.col("__pnum")).cast("double")
                    / F.col("__pden").cast("double")
                ).cast("long"),
            )
        )
        .alias("alloc_tokens"),
    )
    return out.withColumn(
        "epochs",
        F.round(
            F.col("alloc_tokens").cast("double")
            / F.col(tokens_col).cast("double"),
            6,
        ),
    )
