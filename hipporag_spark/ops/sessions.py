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


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition estimate over per-user event-type
    sequences: ``(prev_type, next_type, n, prob)`` with ``prob`` the
    row-normalized count (Σ prob = 1 per prev_type), rounded to 6 dp.
    Consecutive pairs are taken within each user's (ts, event_id)-ordered
    stream — the pinned tie-break keeps pairs deterministic at any
    parallelism. The classic session-model / next-event-prediction
    feature over interaction logs.

    Scale shape: one shuffle on the user key for the lag, then a
    map-side-combinable (prev, next) count; the per-prev normalizer is a
    tiny (|types|²) aggregate joined back broadcast."""
    order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    e = events.select(
        "user_id", "event_id", epoch_us(events, "ts").alias("ts_us"), "event_type"
    )
    pairs = (
        e.withColumn("prev_type", F.lag("event_type").over(order))
        .filter(F.col("prev_type").isNotNull())
        .select("prev_type", F.col("event_type").alias("next_type"))
    )
    counts = pairs.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    totals = counts.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return (
        counts.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.col("tot"), 6).alias("prob"),
        )
        .orderBy("prev_type", "next_type")
    )


def rolling_zscore(
    events: DataFrame,
    key: str = "user_id",
    value_col: str = "value",
    window: int = 20,
    min_periods: int = 5,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-key rolling z-score anomaly detection over an event log — the
    standard streaming-metrics outlier primitive (is this value ``>
    threshold`` sample standard deviations from its own trailing
    baseline?).

    Baseline = the TRAILING ``window`` rows per key, EXCLUDING the
    current row (no self-contamination), in pinned (ts, event_id) order
    (the tie-break keeps the frame deterministic at any parallelism).
    Rows with fewer than ``min_periods`` baseline points, or a
    zero-variance baseline, get a NULL z and are never anomalies.

    Returns ``(event_id, <key>, <value_col>, z, is_anomaly)``. ``z`` is
    rounded to 6 dp BEFORE the threshold test so the flag is a pure
    function of the emitted value (cross-engine float noise in the
    rolling moments sits at ~1e-12, far inside the grid).

    Scale shape: ONE shuffle on the key, then a per-key time-sorted scan
    with a bounded moving frame — the same plan family as
    :func:`sessionize`; per-task state is one key's history, hot keys
    bounded the way every engine's window operator bounds them.
    """
    order = Window.partitionBy(key).orderBy("ts_us", "event_id")
    frame = order.rowsBetween(-int(window), -1)
    e = events.select(
        "event_id", key, epoch_us(events, "ts").alias("ts_us"), value_col
    )
    stats = e.select(
        "event_id",
        key,
        value_col,
        F.avg(value_col).over(frame).alias("mu"),
        F.stddev_samp(value_col).over(frame).alias("sd"),
        F.count(value_col).over(frame).alias("n"),
    )
    z = F.when(
        (F.col("n") >= int(min_periods)) & (F.col("sd") > 0),
        F.round((F.col(value_col) - F.col("mu")) / F.col("sd"), 6),
    )
    return (
        stats.select(
            "event_id",
            key,
            value_col,
            z.alias("z"),
            F.coalesce(F.abs(z) > F.lit(float(threshold)), F.lit(False)).alias(
                "is_anomaly"
            ),
        )
        .orderBy("event_id")
    )
