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
    gap_s = gap_minutes * 60
    # epoch seconds, floored — works for both TIMESTAMP and TIMESTAMP_NTZ
    # parquet columns (NTZ→LTZ is identity under the UTC session timezone)
    epoch_s = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp_ltz")) / F.lit(1_000_000)
    )
    flagged = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.when(epoch_s - F.lag(epoch_s).over(w) > gap_s, 1)
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
        ts_us.sort()

        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0

        for t in ts_us:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                yield emit(start, last, n)  # closed mid-batch
                start, last, n = t, t, 1
            else:
                last, n = max(last, t), n + 1

        if start is not None:
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
