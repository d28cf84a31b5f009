"""Stateful streaming sessionization: the custom stateful operator the
reference's roadmap gestures at ("real-time indexing with streaming
updates", /root/reference/README.md:521) and the streaming twin of the
batch ``events_sessionization`` gate (lag + cumulative-sum sessions,
entry_queries.py).

``applyInPandasWithState`` keeps ONE open session per user as state
(start, last, n_events — three longs, O(users) state total, independent
of event volume); arriving micro-batches extend or split it. A session
closes — and is emitted, exactly once — when either
  (a) a later event for the same user arrives more than ``gap`` after the
      session's last event (an in-stream split: final by construction), or
  (b) the event-time watermark passes last + gap (EventTimeTimeout: no
      further event can extend the session, by the watermark contract).

Session boundary semantics match the batch gate exactly: an event at
``t`` starts a new session iff ``t - last > gap`` (strictly greater,
full microsecond precision — the same full-precision interval compare the
batch gate uses).

Scale notes: state is hash-partitioned by user across executors (the
shuffle a streaming groupBy implies); per-group work is a single
vectorized pass over that user's batch events. Late events beyond the
watermark are dropped by Spark before the operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
_STATE_SCHEMA = "start long, last long, n long"  # epoch microseconds


def _sessions_frame(user: int, rows: list[tuple[int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": np.int64(user),
            "session_start": pd.to_datetime(
                np.array([r[0] for r in rows], dtype=np.int64), unit="us"
            ),
            "session_end": pd.to_datetime(
                np.array([r[1] for r in rows], dtype=np.int64), unit="us"
            ),
            "n_events": np.array([r[2] for r in rows], dtype=np.int64),
        }
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming (user_id, session_start, session_end, n_events) of CLOSED
    sessions. ``events`` must be a streaming DataFrame; ``ts_col`` is cast
    to TIMESTAMP (the synthetic events table is TIMESTAMP_NTZ)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_minutes) * 60 * 1_000_000
    gap_ms = gap_us // 1000

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = int(key[0])
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield _sessions_frame(user, [(start, last, n)])
            return
        ts_parts = [
            pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            for pdf in pdfs
        ]
        ts = np.sort(np.concatenate(ts_parts))
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed: list[tuple[int, int, int]] = []
        # vectorized split points within the batch; the only sequential
        # step is stitching the carried-over open session to the first run
        if start is not None and len(ts) and ts[0] - last <= gap_us:
            pass  # first event extends the open session
        elif start is not None and len(ts):
            closed.append((start, last, n))
            start = None
        if len(ts):
            brk = np.nonzero(np.diff(ts) > gap_us)[0]
            seg_starts = np.concatenate(([0], brk + 1))
            seg_ends = np.concatenate((brk, [len(ts) - 1]))
            for i, (a, b) in enumerate(zip(seg_starts, seg_ends)):
                seg = (int(ts[a]), int(ts[b]), int(b - a + 1))
                if i == 0 and start is not None:
                    seg = (start, seg[1], n + seg[2])
                if b == len(ts) - 1:
                    start, last, n = seg  # trailing run stays open
                else:
                    closed.append(seg)
        if start is not None:
            state.update((int(start), int(last), int(n)))
            state.setTimeoutTimestamp(
                max(int(last) // 1000 + gap_ms,
                    state.getCurrentWatermarkMs() + 1)
            )
        if closed:
            yield _sessions_frame(user, closed)

    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
    ).withWatermark("ts", watermark)
    return ev.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Batch reference implementation with the identical boundary rule
    (lag + cumulative-sum, the batch gate's shape) for equivalence tests."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).cast("timestamp"))
    ts = F.col(ts_col).cast("timestamp")
    prev = F.lag(ts).over(w)
    new_s = F.when(
        prev.isNull()
        | (ts > prev + F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")),
        1,
    ).otherwise(0)
    sid = F.sum(F.col("_new")).over(
        Window.partitionBy(user_col)
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        events.withColumn("_new", new_s)
        .withColumn("_sid", sid)
        .groupBy(F.col(user_col).alias("user_id"), "_sid")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
        )
        .drop("_sid")
    )
