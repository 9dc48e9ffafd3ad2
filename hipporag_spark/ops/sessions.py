"""Event-time bucketing and gap-based sessionization (batch forms).

Training-data pipelines over event/interaction logs need two time-shaped
primitives beyond the reference's static-corpus scope (the reference,
``HippoRAG.py``, has no notion of event time at all — these are the task
mandate's "operations a large-scale training-data pipeline would need"):

- **windowed_event_stats** — tumbling-window per-type aggregates. The
  bucket is computed ARITHMETICALLY from epoch microseconds
  (``floor(unix_micros/width)``) rather than via ``F.window``/``date_trunc``
  so the result is independent of ``spark.sql.session.timeZone`` — the
  driver's oracle session and the engine session need not agree on a zone
  for the hash-compare to hold. At scale this is one map + one partial-agg
  shuffle on (bucket, event_type): fully combinable, no skew concentration
  beyond what the type distribution carries (AQE skew-split covers hot
  types).

- **sessionize** — classic gap-based sessions: a new session starts when
  the per-user inter-event gap exceeds ``gap``. Expressed as the standard
  two-window plan (lag → boundary flag → running sum → groupBy), which
  Catalyst executes as ONE shuffle on ``user_id`` followed by a per-key
  time-sorted scan — the canonical distributed sessionization shape; a
  1000-executor run shuffles each user's events to one task and never
  materializes cross-user state. Per-user event counts are Zipf-ish in
  real logs; the single-key worst case is bounded by one user's history,
  which is the same bound every engine's session operator carries.

Streaming forms (watermarked window aggregation, applyInPandasWithState
sessionization) live in ``streaming/windows.py`` and are cross-checked
against these batch forms in ``tests/test_streaming.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_us(df: DataFrame, colname: str = "ts") -> Column:
    """Epoch microseconds of a timestamp column, timezone-free for BOTH
    timestamp flavors: TIMESTAMP_NTZ (what Spark 4 infers from the naive
    parquet timestamps the test tables carry) diffs against a literal NTZ
    epoch — no session-zone interpretation anywhere — and TIMESTAMP (LTZ)
    takes ``unix_micros``, which reads the underlying instant directly.
    Either way the value matches DuckDB's ``epoch_us(ts)`` on the same
    file, so oracle comparisons hold under ANY driver session timezone."""
    if dict(df.dtypes).get(colname) == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {colname})"
        )
    return F.unix_micros(F.col(colname))


def windowed_event_stats(events: DataFrame, bucket_seconds: int = 3600) -> DataFrame:
    """Tumbling-window aggregate over an event log.

    ``events`` needs columns ``ts timestamp, event_type string,
    user_id long, value double``. Returns one row per (bucket,
    event_type) with the bucket as epoch-seconds of the window start.
    """
    width_us = int(bucket_seconds) * 1_000_000
    bucket_start_s = (
        (F.floor(epoch_us(events, "ts") / F.lit(width_us)) * bucket_seconds)
        .cast("long")
        .alias("bucket_start_s")
    )
    return (
        events.groupBy(bucket_start_s, F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("bucket_start_s", "event_type")
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based per-user sessions: events closer than ``gap_seconds``
    chain into one session; a larger gap opens a new one.

    Returns (user_id, session_no, session_start_us, session_end_us,
    n_events, sum_value) with 1-based ``session_no`` per user in time
    order and timestamps as epoch microseconds (timezone-free ints).
    """
    gap_us = int(gap_seconds) * 1_000_000
    order = Window.partitionBy("user_id").orderBy("ts_us")
    e = events.select(
        "user_id", epoch_us(events, "ts").alias("ts_us"), "value"
    )
    flagged = e.withColumn(
        "new_sess",
        F.when(
            F.lag("ts_us").over(order).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(order)) > gap_us),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_no",
        F.sum("new_sess").over(order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy("user_id", "session_no")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("user_id", "session_no")
    )
