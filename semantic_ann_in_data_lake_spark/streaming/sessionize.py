"""Stateful sessionization of an event stream (Structured Streaming
``applyInPandasWithState``) with an identical-semantics batch twin.

Extension beyond the reference (which has no streaming, SURVEY §2.10):
the canonical custom stateful operator a training-data/events pipeline
needs — group events into per-user sessions closed by an inactivity
gap. The streaming form keeps one small state blob per user (bounded
state; watermark evicts idle users); the batch twin computes the same
sessions with a lag-window gap-and-island plan, so tests can assert
stream ≡ batch on the same input.

Scale notes: batch twin shuffles once on user_id (window partition);
streaming state is O(active users), timeouts via event-time watermark.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semantic_ann_in_data_lake_spark.functions.dates import epoch_us

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-and-island sessionization: new session when the gap from the
    previous event of the same user exceeds ``gap_minutes``."""
    w = Window.partitionBy("user_id").orderBy("ts")
    # microsecond gap comparison — cast-to-long truncates to seconds and
    # would split sessions differently than the micros-exact stream twin
    gap = epoch_us(F.col("ts")) - F.lag(epoch_us(F.col("ts"))).over(w)
    with_flag = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0),
    )
    with_id = with_flag.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_id.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .drop("session_id")
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """applyInPandasWithState sessionizer.

    State per user: (open-session start, last ts, count, sum). An
    incoming batch's events are folded in event-time order; sessions
    whose gap closed are emitted; the open session stays in state and
    is flushed on event-time timeout (watermark-driven), so results for
    fully-delivered input match ``sessionize_batch``.

    State-format compatibility: the redelivery guard compares
    ``(ts, event_id)`` lexicographically with numeric event ids
    zero-padded to 20 digits (covers the full unsigned-64-bit id
    domain; ids longer than 20 digits fall back to plain
    lexicographic order). Checkpoints written by pre-padding builds
    store UNPADDED ids, so an equal-timestamp redelivery straddling
    an upgrade can be misclassified (folded twice or dropped) —
    upgrades across the padding change require a FRESH checkpoint
    (replay the log), the same operational rule as any Spark
    stateful-operator schema change.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def to_cents(val: float) -> int:
        # exact integer cents, matching the batch twin's
        # cast(value AS DECIMAL(18,2)): Spark converts via the double's
        # shortest string repr and rounds HALF_UP — Decimal(repr(val))
        # is that same repr, quantized the same way. A float accumulator
        # with round(total, 2) (binary half-even) can diverge on .005
        # boundaries and under accumulation drift.
        from decimal import ROUND_HALF_UP, Decimal

        return int(
            Decimal(repr(val)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
            * 100
        )

    def fn(
        key, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        rows = []
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, _last_eid, n, cents = state.get
                rows.append((user_id, start_us, last_us, n, cents / 100.0))
                state.remove()
        else:
            # integer microseconds end-to-end: float epochs would round
            # session bounds off the source micros and break the
            # stream ≡ batch equality contract
            events_ts: list[tuple[int, str, float]] = []
            for pdf in pdfs:
                for r in pdf.itertuples(index=False):
                    # the redelivery guard below compares (ts, eid)
                    # lexicographically; a numeric id must be zero-padded
                    # so string order == numeric order (eid 10 after eid 9
                    # at the same microsecond is NEW data, not a replay)
                    eid = str(r.event_id)
                    if eid.isdigit():
                        eid = eid.rjust(20, "0")
                    events_ts.append(
                        (int(r.ts.value // 1000), eid, float(r.value))
                    )
            events_ts.sort(key=lambda x: (x[0], x[1]))
            if state.exists:
                start_us, last_us, last_eid, n, cents = state.get
            else:
                start_us = last_us = last_eid = None
                n, cents = 0, 0
            for ts_us, eid, val in events_ts:
                if last_us is not None and (ts_us, eid) <= (last_us, last_eid):
                    # cross-batch late arrival (would move last_us
                    # BACKWARD, mis-measuring the next gap and
                    # splitting sessions the batch twin keeps whole)
                    # OR an at-least-once redelivery of an
                    # already-folded event (would inflate n and the
                    # value sum). Lexicographic (ts, event_id) guard —
                    # same contract as the SCD2 changelog / EWMA
                    # streams; the batch job over the full log is the
                    # reconciliation path. Tie order among equal-ts
                    # events is the zero-padded id order — numeric order
                    # for numeric ids, string order otherwise (the state
                    # slot is typed once for both long and string id
                    # sources); session aggregates are order-insensitive,
                    # so the tie order never changes a result row.
                    continue
                if last_us is not None and ts_us - last_us > gap_us:
                    rows.append((user_id, start_us, last_us, n, cents / 100.0))
                    start_us, n, cents = None, 0, 0
                if start_us is None:
                    start_us = ts_us
                last_us, last_eid = ts_us, eid
                n += 1
                # NULL values arrive as NaN: count the event, add 0 —
                # the batch twin's decimal sum skips NULLs the same way
                # (Decimal('nan') would otherwise kill the query)
                if val == val:
                    cents += to_cents(val)
            if start_us is not None:
                state.update((start_us, last_us, last_eid, n, cents))
                # close the open session once event time passes last+gap
                state.setTimeoutTimestamp((last_us + gap_us) // 1000)
        if rows:
            yield pd.DataFrame(
                [
                    (
                        u,
                        pd.Timestamp(s * 1000),  # ns from exact micros
                        pd.Timestamp(e * 1000),
                        n,
                        v,
                    )
                    for (u, s, e, n, v) in rows
                ],
                columns=[
                    "user_id", "session_start", "session_end", "n_events", "sum_value",
                ],
            )

    from semantic_ann_in_data_lake_spark.streaming.profile_stream import (
        normalize_event_ts,
    )

    state_schema = (
        "start_us long, last_us long, last_eid string, "
        "n long, total_cents long"
    )
    return (
        normalize_event_ts(events).withWatermark("ts", "1 minute")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
