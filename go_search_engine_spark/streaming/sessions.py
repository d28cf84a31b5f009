"""Stateful streaming sessionization: the custom stateful operator the
reference's roadmap gestures at ("real-time indexing with streaming
updates", /root/reference/README.md:521) and the streaming twin of the
batch ``events_sessionization`` gate (lag + cumulative-sum sessions,
entry_queries.py).

``applyInPandasWithState`` keeps the OPEN session intervals per user as
state (parallel start/last/count arrays — O(users x concurrent open
intervals); more than one interval stays open only while out-of-order
events inside the watermark delay could still bridge them). A session is
emitted — exactly once — only when the event-time watermark passes
``last + gap``: by the watermark contract no future event can then land
within ``gap`` of it, so the boundary is final. This is the only sound
finality rule under reordering: an in-stream gap alone is NOT final,
because a late event (still >= watermark) can arrive inside the gap and
bridge the two runs.

Session boundary semantics match the batch gate exactly: an event at
``t`` starts a new session iff ``t - last > gap`` (strictly greater,
full microsecond precision). Equivalence: as the watermark advances past
every event, the emitted set converges to exactly the batch
sessionization (tests/test_streaming.py drives sentinel events through
to force full closure and asserts set equality with the batch twin).

NOTE (state format): the state schema is three parallel long ARRAYS;
streaming checkpoints written by the earlier scalar (start, last, n)
schema are incompatible -- discard the checkpoint directory when
upgrading (Spark's state-schema check refuses to resume otherwise).

Scale notes: state is hash-partitioned by user across executors (the
shuffle a streaming groupBy implies); per-group work is one vectorized
pass over that user's batch events plus an interval merge bounded by the
out-of-orderness, not the event count. Late events beyond the watermark
are dropped by Spark before the operator.
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
# open intervals, ascending by start, pairwise separated by > gap
_STATE_SCHEMA = "starts array<long>, lasts array<long>, ns array<long>"


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


def _event_runs(ts: np.ndarray, gap_us: int) -> list[list[int]]:
    """Sorted event times -> [start, last, n] runs split at gaps."""
    brk = np.nonzero(np.diff(ts) > gap_us)[0]
    seg_starts = np.concatenate(([0], brk + 1))
    seg_ends = np.concatenate((brk, [len(ts) - 1]))
    return [
        [int(ts[a]), int(ts[b]), int(b - a + 1)]
        for a, b in zip(seg_starts, seg_ends)
    ]


def _merge_intervals(
    intervals: list[list[int]], gap_us: int
) -> list[list[int]]:
    """Merge start-sorted [start, last, n] intervals whose gap <= gap_us
    (the strictly-greater split rule: > gap starts a new session)."""
    intervals = sorted(intervals)
    out: list[list[int]] = []
    for iv in intervals:
        if out and iv[0] - out[-1][1] <= gap_us:
            out[-1][1] = max(out[-1][1], iv[1])
            out[-1][2] += iv[2]
        else:
            out.append(list(iv))
    return out


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming (user_id, session_start, session_end, n_events) of
    FINALIZED sessions (watermark passed last + gap). ``events`` must be
    a streaming DataFrame; ``ts_col`` is cast to TIMESTAMP (the synthetic
    events table is TIMESTAMP_NTZ)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_minutes) * 60 * 1_000_000

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = int(key[0])
        intervals: list[list[int]] = []
        if state.exists:
            starts, lasts, ns = state.get
            intervals = [list(t) for t in zip(starts, lasts, ns)]
        if not state.hasTimedOut:
            ts_parts = [
                pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
                for pdf in pdfs
            ]
            ts = np.sort(np.concatenate(ts_parts)) if ts_parts else np.array([])
            if len(ts):
                intervals.extend(_event_runs(ts, gap_us))
        intervals = _merge_intervals(intervals, gap_us)

        # an interval is FINAL iff no admissible future event (t >= wm)
        # can extend it: last + gap < wm
        wm_us = state.getCurrentWatermarkMs() * 1000
        closed = [iv for iv in intervals if iv[1] + gap_us < wm_us]
        kept = [iv for iv in intervals if iv[1] + gap_us >= wm_us]

        if kept:
            state.update(
                (
                    [iv[0] for iv in kept],
                    [iv[1] for iv in kept],
                    [iv[2] for iv in kept],
                )
            )
            # fire once the watermark can finalize the earliest interval
            # (ceil to ms: firing a ms early would close a session that
            # an event at exactly last + gap is still allowed to extend)
            next_us = min(iv[1] for iv in kept) + gap_us
            state.setTimeoutTimestamp(
                max(-(-next_us // 1000), state.getCurrentWatermarkMs() + 1)
            )
        elif state.exists:
            state.remove()
        if closed:
            yield _sessions_frame(user, [tuple(iv) for iv in closed])

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
