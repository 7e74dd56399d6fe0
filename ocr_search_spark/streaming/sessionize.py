"""Sessionization: gap-based event sessions, batch and stateful-streaming.

The reference has no stream processing (its Dramatiq queue is task
scheduling — SURVEY.md §2.5); these are the standard session operators any
large-scale event/ingest pipeline needs:

* :func:`sessionize_batch` — analytic-window formulation (lag → gap flag →
  running session index → aggregate). Pure built-ins, SQL-portable, used as
  the DuckDB-oracle-checked form.
* :func:`sessionize_stream` — the same semantics over an unbounded stream
  via ``applyInPandasWithState`` (event-time timeout closes a session once
  the watermark passes its last event + gap).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
_STATE_SCHEMA = "start long, last long, n long"  # epoch micros


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessions via analytic windows (batch form)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_us = gap_minutes * 60 * 1_000_000
    # epoch MICROseconds, no floor — sub-second gaps must split identically
    # to the streaming twin (which compares raw micros); flooring to whole
    # seconds merged sessions whose true gap exceeded the threshold by
    # <1 s. unix_micros handles both TIMESTAMP and TIMESTAMP_NTZ parquet
    # columns (NTZ→LTZ is identity under the UTC session timezone).
    epoch_us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    flagged = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.when(epoch_us - F.lag(epoch_us).over(w) > gap_us, 1)
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = Window.partitionBy("user_id").orderBy("ts")
    sessions = flagged.withColumn("session_idx", F.sum("new_session").over(w2))
    return (
        sessions.groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def _session_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]

        def emit(start_us: int, last_us: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield emit(start, last, n)
            return

        ts_us = []
        for pdf in pdfs:
            ts_us.extend(int(t.value // 1_000) for t in pd.to_datetime(pdf["ts"]))

        # interval-merge the open-session state with the batch's events:
        # sorting + merging handles LATE in-watermark events correctly —
        # an event older than the open session's start lowers the start
        # (or bridges via intermediate events), where a per-event
        # max(last, t) update silently swallowed it into the wrong
        # session. Residual approximation (documented): a late event more
        # than one gap BEFORE the open session emits immediately as its
        # own session; batch would hold it open for even-later stragglers
        # inside the watermark. Bounded by the watermark delay.
        intervals = [[t, t, 1] for t in sorted(ts_us)]
        if state.exists:
            start, last, n = state.get
            intervals.append([start, last, n])
            intervals.sort(key=lambda iv: (iv[0], iv[1]))
        merged: list[list[int]] = []
        for iv in intervals:
            if merged and iv[0] - merged[-1][1] <= gap_us:
                m = merged[-1]
                m[1] = max(m[1], iv[1])
                m[2] += iv[2]
            else:
                merged.append(iv)
        for m in merged[:-1]:
            yield emit(m[0], m[1], m[2])  # closed mid-batch / late session
        if merged:
            start, last, n = merged[-1]
            state.update((start, last, n))
            # close once the event-time watermark passes last + gap
            state.setTimeoutTimestamp((last + gap_us) // 1_000)

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization (custom stateful operator).

    State per user = open session (start, last, count); a session closes —
    and is emitted — either when a later event arrives beyond the gap, or
    when the event-time timeout fires after the watermark passes
    ``last + gap``.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .select(F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes),
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
