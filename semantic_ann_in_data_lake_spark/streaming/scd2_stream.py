"""Streaming SCD2 changelog: per-key current-state tracking that emits
a versioned validity interval whenever the state CHANGES.

The streaming twin of ``operators/pairs.py::scd2_history`` — same
semantics, incremental: state per key is the OPEN run (current state,
version, valid_from, event count); an incoming event with a different
state closes the run (emit ``valid_to = new event's ts``) and opens
the next version. Emitted rows are exactly the batch operator's
CLOSED intervals (``valid_to IS NOT NULL``) — the equality the test
pins. This is the event-log → CDC-changelog primitive: downstream
``upsert_latest`` consumers get one row per completed version.

Scale: state is one tiny tuple per key in the state store; each
micro-batch folds its rows in event-time order inside
``applyInPandasWithState`` (same discipline as the sessionizer,
``sessionize.py:60`` — integer microseconds end to end so stream ≡
batch equality is exact).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

SCD2_SCHEMA = (
    "user_id long, state string, valid_from timestamp, "
    "valid_to timestamp, version int, n_events long"
)


def scd2_changelog_stream(events: DataFrame) -> DataFrame:
    """Closed SCD2 intervals per user from an event stream.

    Output rows appear when a run CLOSES (the user's event_type
    changes); the open run stays in state. For fully-delivered,
    event-time-ordered input this equals
    ``scd2_history(...).where(valid_to IS NOT NULL)``.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        rows = []
        evs: list[tuple[int, int, str]] = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                evs.append((int(r.ts.value // 1000), int(r.event_id), r.event_type))
        evs.sort()
        if state.exists:
            cur, version, from_us, n, last_us, last_eid = state.get
        else:
            # None, not a -1 epoch sentinel: pre-epoch timestamps are
            # legitimate (ts_us < -1 would read as "late" and a key
            # whose events are all pre-1970 would never open a run)
            cur, version, from_us, n, last_us, last_eid = (
                None, 0, None, 0, None, None,
            )
        for ts_us, eid, etype in evs:
            if last_us is not None and (ts_us, eid) <= (last_us, last_eid):
                # cross-batch late arrival OR at-least-once transport
                # redelivery: folding a late event in arrival order
                # would emit an INVERTED interval (valid_to before
                # valid_from) and permanently desync version numbers
                # from the batch operator; re-folding a redelivered
                # event would inflate n / open a spurious version. The
                # lexicographic (ts, event_id) guard matches the batch
                # operator's (ts asc, event_id asc) fold order exactly
                # (same discipline as the EWMA stream); the batch job
                # over the full log is the reconciliation path.
                continue
            last_us, last_eid = ts_us, eid
            if cur is None:
                cur, version, from_us, n = etype, 1, ts_us, 1
            elif etype == cur:
                n += 1
            else:
                rows.append((user_id, cur, from_us, ts_us, version, n))
                cur, version, from_us, n = etype, version + 1, ts_us, 1
        if cur is not None:
            state.update((cur, version, from_us, n, last_us, last_eid))
        if rows:
            yield pd.DataFrame(
                [
                    (
                        u,
                        s,
                        pd.Timestamp(f * 1000),
                        pd.Timestamp(t * 1000),
                        v,
                        n,
                    )
                    for (u, s, f, t, v, n) in rows
                ],
                columns=[
                    "user_id", "state", "valid_from", "valid_to",
                    "version", "n_events",
                ],
            )

    from semantic_ann_in_data_lake_spark.streaming.profile_stream import (
        normalize_event_ts,
    )

    state_schema = (
        "cur string, version int, from_us long, n long, "
        "last_us long, last_eid long"
    )
    return (
        normalize_event_ts(events)
        .withWatermark("ts", "1 minute")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SCD2_SCHEMA,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
