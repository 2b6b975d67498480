"""Streaming EWMA: per-key decayed score as live state.

The streaming twin of ``operators/timeseries.py::ewma_truncated`` —
same α=0.5 semantics, O(1) state per key: the recursion ``y = 0.5·x +
0.5·y_prev`` IS the operator, folded per micro-batch in event-time
order inside ``applyInPandasWithState``.

Why stream ≡ batch is BIT-exact here (the property the test pins):
multiplying a double by 0.5 is an exact exponent decrement, so the
recursion distributes exactly over each previously-rounded partial sum
— unrolling it yields precisely the batch operator's left fold
``((x₁w₁ + x₂w₂) + x₃w₃)…`` (IEEE addition is commutative; only
associativity is lossy, and both forms associate identically). The
one semantic delta: the stream never truncates (state carries the full
history's decay), so it equals the batch op at ``window ≥`` the
longest per-key series; the batch window exists to bound the FRAME
cost, which a recursion doesn't pay.

Same cross-batch discipline as the SCD2 changelog: within a delivery,
rows fold in event-time order; an event older than the last folded
timestamp would rewrite history a recursion cannot rewind, so it is
dropped (the batch operator over the full log is the reconciliation
path).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

EWMA_SCHEMA = "user_id long, event_id long, value double, ewma double, n long"


def ewma_stream(events: DataFrame, round_dp: int = 6) -> DataFrame:
    """Per-event EWMA rows ``(user_id, event_id, value, ewma, n)`` from
    an event stream; ``ewma`` is the score AFTER folding that event."""
    import pandas as pd
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    quantum = Decimal(1).scaleb(-round_dp)

    def round_half_up(v: float) -> float:
        # match Spark's F.round (BigDecimal HALF_UP over the shortest
        # decimal repr) — Python's round() is banker's and would split
        # from the batch operator on exact .5 boundaries
        return float(Decimal(repr(v)).quantize(quantum, rounding=ROUND_HALF_UP))

    def fn(
        key, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        evs: list[tuple[int, int, float]] = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                evs.append((int(r.ts.value // 1000), int(r.event_id), float(r.value)))
        evs.sort()
        if state.exists:
            y, n, last_us, last_eid = state.get
        else:
            # None, not a -1 epoch sentinel (pre-epoch events would
            # read as late and be dropped forever)
            y, n, last_us, last_eid = 0.0, 0, None, None
        out = []
        for ts_us, eid, x in evs:
            # lexicographic (ts, event_id) guard: a bare ts < last
            # check would fold an equal-timestamp event from a later
            # batch AFTER an already-folded higher event_id (diverging
            # from the batch (ts asc, event_id asc) order) and would
            # double-fold an at-last-timestamp redelivery
            if last_us is not None and (ts_us, eid) <= (last_us, last_eid):
                continue  # cross-batch late event: see module docstring
            last_us, last_eid = ts_us, eid
            y = 0.5 * x + 0.5 * y
            n += 1
            out.append((user_id, eid, x, round_half_up(y), n))
        state.update((y, n, last_us, last_eid))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "event_id", "value", "ewma", "n"]
            )

    from semantic_ann_in_data_lake_spark.streaming.profile_stream import (
        normalize_event_ts,
    )

    state_schema = "y double, n long, last_us long, last_eid long"
    return (
        normalize_event_ts(events)
        .withWatermark("ts", "1 minute")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=EWMA_SCHEMA,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
