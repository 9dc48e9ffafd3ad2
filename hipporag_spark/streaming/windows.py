"""Streaming event-time operators: watermarked window aggregation and a
custom stateful sessionizer (``applyInPandasWithState``).

These are the streaming forms of ``ops/sessions.py``; the batch forms are
the correctness oracles (``tests/test_streaming.py`` runs both over the
same drops and compares).

Scale/semantics notes:

- ``windowed_event_stats_stream`` is a stock watermark + tumbling-window
  aggregate: state is one row per open (window, event_type), evicted when
  the watermark passes the window end. Late rows beyond the watermark are
  DROPPED — the test pins this. In append mode a window emits exactly once
  (when finalized), which is the contract an idempotent downstream sink
  (epoch-partitioned parquet / Iceberg MERGE, see ``streaming/ingest.py``)
  wants.

- ``sessionize_stream`` keeps ONE open session per user in the state
  store (four scalars: start, last-seen, count, sum) — state size is
  O(active users), independent of event volume, which is what survives a
  100 TB/day event feed. An arriving event either extends the open
  session or closes it (emits the finished row) and opens a new one.
  The operator uses NoTimeout: an open session is emitted only when a
  later event closes it, so the stream's output is exactly the batch
  sessionizer's output minus each user's final (still-open) session —
  a deterministic, watermark-free contract that keeps replays idempotent.
  (With event-time timeouts the close would ride the watermark instead;
  that variant trades determinism-in-test for lower emission latency and
  slots in here without changing the state layout.)
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..ops.sessions import epoch_us

SESSION_OUT_SCHEMA = (
    "user_id long, session_start_us long, session_end_us long, "
    "n_events long, sum_value double"
)
_SESSION_STATE_SCHEMA = "start_us long, last_us long, n long, total double"


def windowed_event_stats_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window per-type aggregate over a streaming
    events DataFrame (ts timestamp, event_type string, user_id long,
    value double). Append-mode capable: rows emit once their window is
    older than the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            # window bounds inherit ts's type; reuse the tz-free extractor
            F.unix_micros(F.col("w.start").cast("timestamp")).alias("window_start_us"),
            F.col("event_type"),
            F.col("n_events"),
            F.col("sum_value"),
        )
    )


def _sessionize_fn(gap_us: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = []  # closed sessions to emit
        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us = None
            last_us = n = 0
            total = 0.0
        # a group's rows may arrive chunked across several pdfs — gather,
        # then ONE time-sort over the whole micro-batch group (bounded by
        # one user's events per batch)
        batch = sorted(
            (int(t), float(v))
            for pdf in pdfs
            for t, v in zip(pdf["ts_us"].values, pdf["value"].values)
        )
        for ts_us, value in batch:
            if start_us is None:
                start_us, last_us, n, total = ts_us, ts_us, 1, value
            elif ts_us - last_us > gap_us:
                rows.append((key[0], start_us, last_us, n, round(total, 4)))
                start_us, last_us, n, total = ts_us, ts_us, 1, value
            else:
                last_us, n, total = ts_us, n + 1, total + value
        state.update((start_us, last_us, n, total))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    "user_id",
                    "session_start_us",
                    "session_end_us",
                    "n_events",
                    "sum_value",
                ],
            )

    return fn


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Custom stateful operator: per-user gap sessionization via
    ``applyInPandasWithState``. Emits a session row when a later event
    for the same user closes it; the open session lives in the state
    store. Output schema matches ``ops.sessions.sessionize`` minus
    ``session_no`` (a stream has no total order to number against)."""
    gap_us = int(gap_seconds) * 1_000_000
    prepared = events.select(
        "user_id", epoch_us(events, "ts").alias("ts_us"), "value"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_us),
        SESSION_OUT_SCHEMA,
        _SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
