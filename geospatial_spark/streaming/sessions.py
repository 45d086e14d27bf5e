"""Custom stateful streaming operator: gap-based sessionization with
`applyInPandasWithState`.

The batch form lives in plans/catalog (`events_sessionize`, lag+cumsum
windows); this is the streaming form a 100-TB event pipeline actually
runs: per-key session state survives across micro-batches, sessions
CLOSE (and are emitted, append-mode) either when a later event arrives
past the gap or when the event-time watermark passes the open
session's gap deadline (GroupStateTimeout.EventTimeTimeout — no event
needed to flush an abandoned session).

Reference analogue: the scheduled-refresh plumbing keeps per-datasource
state alive across runs (ip2geo/jobscheduler/DatasourceUpdateService);
here the state is per-user and the trigger is event time.

Scale notes: state is (start, last, n) per ACTIVE key — O(active
users), not O(events); the shuffle is the groupBy(user) micro-batch
exchange Structured Streaming already does for any stateful op; late
events beyond the watermark are dropped by Spark before they reach the
operator (the documented contract, same as the windowed aggregation in
streaming/incremental.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType, TimestampType)

SESSION_SCHEMA = StructType([
    StructField("user_id", StringType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
])

# per-key state: open session (epoch microseconds)
STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
])


def _make_fn(gap_us: int):
    import pandas as pd

    def to_df(key, closed):
        return pd.DataFrame({
            "user_id": [key] * len(closed),
            "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
            "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
            "n_events": [n for _, _, n in closed],
        })

    def fn(key, pdfs, state):
        user = key[0]
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield to_df(user, [(start, last, n)])
            return

        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(t.value) // 1000 for t in pd.to_datetime(pdf["ts"]))
        ts.sort()

        closed = []
        if state.exists:
            # merge a later micro-batch into the open session summary.
            # In-watermark stragglers BEFORE the open start are real
            # (batch parity): sessionize them among themselves, bridge
            # the latest straggler run into the open session when it is
            # within gap of start (start moves back, matching the batch
            # operator), and close the rest as their own earlier
            # sessions. One summary-state limitation stands documented:
            # events INSIDE [start, last] merge by count — the summary
            # cannot re-split a span it has already compressed.
            start, last, n = state.get
            pre = [t for t in ts if t < start]
            n += sum(1 for t in ts if start <= t <= last)
            post = [t for t in ts if t > last]
            if pre:
                subs = []
                s0, l0, c0 = pre[0], pre[0], 1
                for t in pre[1:]:
                    if t - l0 > gap_us:
                        subs.append((s0, l0, c0))
                        s0, l0, c0 = t, t, 1
                    else:
                        l0, c0 = t, c0 + 1
                if start - l0 <= gap_us:
                    # latest straggler run bridges into the open session
                    start, n = s0, n + c0
                else:
                    subs.append((s0, l0, c0))
                closed.extend(subs)
            for t in post:
                if t - last > gap_us:
                    closed.append((start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = t, n + 1
        else:
            start = last = None
            n = 0
            for t in ts:
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_us:
                    closed.append((start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = t, n + 1
        # flush the open session when event time passes last + gap; if
        # the watermark already passed the deadline (stragglers moved no
        # event time forward), close NOW — a timeout in the past would
        # be rejected by the state store
        deadline_ms = (last + gap_us) // 1000
        if deadline_ms <= state.getCurrentWatermarkMs():
            closed.append((start, last, n))
            state.remove()
        else:
            state.update((start, last, n))
            state.setTimeoutTimestamp(deadline_ms)
        if closed:
            yield to_df(user, closed)

    return fn


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      watermark: str = "2 hours",
                      user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """events (streaming, with `user_col` + event-time `ts_col`) →
    append-mode stream of CLOSED sessions
    (user_id, session_start, session_end, n_events)."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    src = events.select(F.col(user_col).cast("string").alias("user_id"),
                        F.col(ts_col).cast("timestamp").alias("ts"))
    return (src.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_fn(gap_us), SESSION_SCHEMA, STATE_SCHEMA,
                "append", "EventTimeTimeout"))
