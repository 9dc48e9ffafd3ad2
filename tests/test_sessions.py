"""Event-time operators: batch sessionization semantics, watermarked
streaming window aggregation (late-row drop), and the
applyInPandasWithState streaming sessionizer vs its batch oracle.

(The batch ops' DuckDB oracle parity runs in test_driver_parity via the
`events_windowed_stats` / `sessionize_events` driver entries.)
"""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from hipporag_spark.ops.sessions import sessionize, windowed_event_stats
from hipporag_spark.streaming.windows import (
    sessionize_stream,
    windowed_event_stats_stream,
)

EVENT_SCHEMA = "ts timestamp, user_id long, event_type string, value double"


def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _write_drop(spark, rows, path):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_sessionize_gap_semantics(spark):
    rows = [
        (_t(10, 0), 1, "a", 1.0),
        (_t(10, 10), 1, "a", 2.0),   # within 30-min gap → same session
        (_t(12, 0), 1, "a", 3.0),    # 110-min gap → new session
        (_t(9, 0), 2, "b", 5.0),     # other user: independent numbering
    ]
    ev = spark.createDataFrame(rows, EVENT_SCHEMA)
    got = {
        (r["user_id"], r["session_no"]): (
            r["session_start_us"],
            r["session_end_us"],
            r["n_events"],
            r["sum_value"],
        )
        for r in sessionize(ev, 1800).collect()
    }
    us = lambda h, m=0: int(dt.datetime(2024, 1, 1, h, m).timestamp() * 1e6)
    assert got == {
        (1, 1): (us(10, 0), us(10, 10), 2, 3.0),
        (1, 2): (us(12, 0), us(12, 0), 1, 3.0),
        (2, 1): (us(9, 0), us(9, 0), 1, 5.0),
    }


def test_rolling_zscore_semantics(spark):
    """Trailing-window baseline excludes the current row; min_periods and
    zero-variance rows yield NULL z / no anomaly; a genuine spike flags."""
    import statistics

    from hipporag_spark.ops.sessions import rolling_zscore

    base = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2]
    rows = [
        (i, _t(0, i), 1, "x", v) for i, v in enumerate(base)
    ] + [(6, _t(0, 6), 1, "x", 100.0)]  # the spike
    # user 2: constant values → sd == 0 → never anomalous
    rows += [(10 + i, _t(0, i), 2, "x", 5.0) for i in range(8)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["event_id"]: r for r in rolling_zscore(df, min_periods=5).collect()}
    # first five rows of user 1: fewer than min_periods baseline points
    for i in range(5):
        assert out[i]["z"] is None and not out[i]["is_anomaly"]
    # row 6: baseline = the six base values, z = (100 - mu) / sd
    mu = statistics.mean(base)
    sd = statistics.stdev(base)
    assert out[6]["z"] == pytest.approx(round((100.0 - mu) / sd, 6), abs=1e-6)
    assert out[6]["is_anomaly"]
    assert not out[5]["is_anomaly"]
    # constant-valued user: zero variance, never anomalous
    for i in range(10, 18):
        assert out[i]["z"] is None and not out[i]["is_anomaly"]


def test_event_transitions_counts_and_rowsum(spark):
    """Hand-computed lag pairs per user; probs row-normalize to 1."""
    from hipporag_spark.ops.sessions import event_transitions

    rows = [
        (0, _t(0, 0), 1, "a", 0.0), (1, _t(0, 1), 1, "b", 0.0),
        (2, _t(0, 2), 1, "a", 0.0), (3, _t(0, 3), 1, "b", 0.0),
        (4, _t(0, 0), 2, "b", 0.0), (5, _t(0, 1), 2, "c", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {(r["prev_type"], r["next_type"]): (r["n"], r["prob"])
           for r in event_transitions(df).collect()}
    # user 1: a->b, b->a, a->b; user 2: b->c
    assert got[("a", "b")] == (2, 1.0)
    assert got[("b", "a")][0] == 1 and got[("b", "a")][1] == 0.5
    assert got[("b", "c")][1] == 0.5
    sums: dict = {}
    for (p, _n), (n, prob) in got.items():
        sums[p] = sums.get(p, 0.0) + prob
    for p, s in sums.items():
        assert abs(s - 1.0) < 1e-9, (p, s)


def test_streaming_windowed_agg_finalizes_and_drops_late(spark, tmp_path):
    """Append-mode watermarked tumbling windows: a row older than the
    watermark is DROPPED; each finalized window emits exactly once."""
    in_dir = str(tmp_path / "in")
    ck_dir = str(tmp_path / "ck")
    # drop 1: hours 0, 1, 3 → watermark after the batch = 03:00 - 30m = 02:30
    _write_drop(
        spark,
        [
            (_t(0, 5), 1, "a", 1.0),
            (_t(0, 15), 2, "a", 2.0),
            (_t(1, 10), 1, "b", 3.0),
            (_t(3, 0), 3, "c", 9.0),
        ],
        in_dir,
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(in_dir)
    out = windowed_event_stats_stream(stream, window="1 hour", watermark="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("win_agg_test")
        .outputMode("append")
        .option("checkpointLocation", ck_dir)
        .start()
    )
    try:
        q.processAllAvailable()
        # drop 2: a LATE row for hour 0 (ts 00:20 < watermark 02:30 → must
        # not count) + a fresh hour-5 row that advances the watermark
        _write_drop(
            spark,
            [(_t(0, 20), 9, "a", 100.0), (_t(5, 0), 4, "c", 4.0)],
            in_dir,
        )
        q.processAllAvailable()
        # drop 3: advances the watermark past hour 3's window end so the
        # hour-3 window finalizes; hour-5/6 windows stay open (never emit)
        _write_drop(spark, [(_t(6, 0), 5, "d", 6.0)], in_dir)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["window_start_us"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("win_agg_test").collect()
    }
    hour_us = lambda h: int(dt.datetime(2024, 1, 1, h).timestamp() * 1e6)
    assert got == {
        (hour_us(0), "a"): (2, 3.0),   # late 100.0 excluded
        (hour_us(1), "b"): (1, 3.0),
        (hour_us(3), "c"): (1, 9.0),
    }


def test_sessionize_stream_matches_batch_closed_sessions(spark, tmp_path):
    """The stateful streaming sessionizer emits exactly the batch
    sessionizer's output minus each user's final (still-open) session —
    including sessions that span a micro-batch boundary."""
    in_dir = str(tmp_path / "in")
    ck_dir = str(tmp_path / "ck")
    drop1 = [
        (_t(10, 0), 1, "a", 1.0),
        (_t(10, 10), 1, "a", 2.0),
        (_t(10, 0), 2, "a", 5.0),
        (_t(10, 0), 3, "a", 7.0),   # u3's session continues in drop 2
    ]
    drop2 = [
        (_t(12, 0), 1, "a", 3.0),   # closes u1's first session
        (_t(10, 20), 3, "a", 8.0),  # extends u3's open session across batches
        (_t(13, 0), 3, "a", 9.0),   # closes it (n=2, spanning both drops)
    ]
    _write_drop(spark, drop1, in_dir)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(in_dir)
    q = (
        sessionize_stream(stream, 1800)
        .writeStream.format("memory")
        .queryName("sess_stream_test")
        .outputMode("append")
        .option("checkpointLocation", ck_dir)
        .start()
    )
    try:
        q.processAllAvailable()
        _write_drop(spark, drop2, in_dir)
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        tuple(r)
        for r in spark.table("sess_stream_test")
        .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_value")
        .collect()
    )
    # batch oracle on the union of both drops, minus each user's last session
    ev = spark.createDataFrame(drop1 + drop2, EVENT_SCHEMA)
    batch = sessionize(ev, 1800)
    last = batch.groupBy("user_id").agg(F.max("session_no").alias("session_no"))
    closed = batch.join(last, ["user_id", "session_no"], "left_anti")
    want = sorted(
        tuple(r)
        for r in closed.select(
            "user_id", "session_start_us", "session_end_us", "n_events", "sum_value"
        ).collect()
    )
    assert got == want
    assert len(got) == 2  # u1 session 1 and u3 session 1; u2 still open


def test_windowed_stats_buckets_are_timezone_free(spark):
    """The bucket is pure epoch arithmetic: rebucketing the same instants
    under a different session timezone must not move any row."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    base = windowed_event_stats(ev, 3600).collect()
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")  # UTC+5:30
    try:
        shifted = windowed_event_stats(ev, 3600).collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert sorted(map(tuple, base)) == sorted(map(tuple, shifted))
