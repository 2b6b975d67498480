"""As-of (temporal) join: for each left row, the most recent right row
at-or-before the left timestamp, per key.

Extension beyond the reference surface (the reference joins only on
equality — ``SemLink/join_discoverer.py`` candidate pairs): an as-of
join is the standard event-enrichment primitive a training-data /
telemetry pipeline needs (attach last-known state to each observation).

Spark has no built-in ASOF JOIN (DuckDB and kdb do). A naive
``l.key = r.key AND r.ts <= l.ts`` range join followed by a max-ts
dedup materializes O(|matches|) intermediate rows — quadratic per key
in the worst case. The scale-correct distributed shape used here is
the union-tag / sort / carry-forward composition:

1. tag right rows side=0 and left rows side=1, union by name;
2. one hash shuffle on the key, sort within partitions by
   (ts, side, right_id) — a single exchange, AQE-coalesced;
3. ``last(right_col, ignorenulls=True)`` over rows-between
   (unboundedPreceding → current) carries the latest right payload
   forward onto each left row;
4. keep side=1 rows.

Cost is one shuffle + one sort of |L| + |R| rows — the same lower
bound a sort-merge equi-join pays; no row amplification. Skewed keys
behave like any sort-window op (AQE/salting apply). Ordering right
rows BEFORE left rows at equal ts gives the inclusive (ts >= right.ts)
semantics DuckDB's ASOF JOIN has; the right_id ascending tie-break
makes equal-(key, ts) right rows resolve deterministically to the
largest id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semantic_ann_in_data_lake_spark.functions.dates import epoch_us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    how: str = "left",
    tolerance_us: int | None = None,
    right_id: str | None = None,
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right.{right_ts} <= left.{left_ts}`` and equal ``on`` key.

    right_cols are emitted as ``matched_<name>``; unmatched left rows
    keep NULLs (how='left') or are dropped (how='inner').
    ``tolerance_us`` (microseconds) drops matches older than
    ``left_ts − tolerance`` — the pandas ``merge_asof(tolerance=...)``
    semantics. ``right_id`` (a right column name, typically already in
    right_cols) breaks equal-(key, ts) right-row ties deterministically
    toward the largest id; without it such ties are partition-order
    dependent.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    # The whole right payload travels as ONE struct so that every
    # matched_* field comes from the SAME right row: carrying columns
    # independently with last(ignorenulls=True) would backfill a NULL
    # payload field from an OLDER right row while matched_ts came from
    # the newer one (a struct is non-null even when its fields are null).
    # Positional field names (__c{i}) sidestep collisions when
    # right_cols contains right_ts itself.
    payload = F.struct(
        F.col(right_ts).alias("__mt"),
        *[F.col(c).alias(f"__c{i}") for i, c in enumerate(right_cols)],
    )
    # NULL right keys are dropped: the union-tag window partitions by
    # key, and SQL-equality semantics must not let NULL-key left rows
    # inherit state from NULL-key right rows (partitionBy groups NULLs
    # together; an equi-join would never match them)
    rsel = right.where(F.col(on).isNotNull()).select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        (F.col(right_id) if right_id is not None else F.lit(0)).alias("__r_id"),
        payload.alias("__r"),
    )
    lsel = left.select(
        "*",
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
    )
    u = lsel.unionByName(rsel, allowMissingColumns=True)
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__r_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select("*", F.last("__r", ignorenulls=True).over(w).alias("__m"))
    out = carried.where(F.col("__side") == 1)
    if tolerance_us is not None:
        # Null out the WHOLE matched struct when stale, so an
        # out-of-tolerance row cannot leak individual payload fields.
        in_tol = (
            epoch_us(F.col("__ts")) - epoch_us(F.col("__m.__mt"))
        ) <= F.lit(tolerance_us)
        out = out.withColumn("__m", F.when(in_tol, F.col("__m")))
    out = out.select(
        "*",
        F.col("__m.__mt").alias("matched_ts"),
        *[
            F.col(f"__m.__c{i}").alias(f"matched_{c}")
            for i, c in enumerate(right_cols)
        ],
    )
    if how == "inner":
        out = out.where(F.col("__m").isNotNull())
    return out.drop("__key", "__ts", "__side", "__r_id", "__r", "__m")
