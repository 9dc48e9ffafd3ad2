"""As-of join and range join semantics (ops/joins.py). DuckDB ASOF/IE-join
parity runs in test_driver_parity via `asof_join_events` /
`range_join_error_windows`; these tests pin the corner semantics the
driver data doesn't exercise."""

from pyspark.sql import functions as F

from hipporag_spark.ops.joins import asof_join, range_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_inclusive_and_unmatched(spark):
    left = _df(spark, [(1, 10, "l1"), (1, 20, "l2"), (2, 5, "l3")],
               "k long, ts_us long, lv string")
    right = _df(spark, [(1, 5, "r5"), (1, 15, "r15"), (1, 20, "r20"), (2, 9, "r9")],
                "k long, ts_us long, rv string")
    out = {
        (r["k"], r["ts_us"]): (r["m_ts_us"], r["m_rv"])
        for r in asof_join(left, right, on="k", ts="ts_us",
                           right_cols=["rv"], prefix="m_").collect()
    }
    assert out == {
        (1, 10): (5, "r5"),      # most recent prior
        (1, 20): (20, "r20"),    # equal ts matches (inclusive, DuckDB ASOF)
        (2, 5): (None, None),    # right row at ts 9 is in the future → no match
    }


def test_asof_tolerance_nulls_stale_match(spark):
    left = _df(spark, [(1, 100, "x")], "k long, ts_us long, lv string")
    right = _df(spark, [(1, 10, "old")], "k long, ts_us long, rv string")
    near = asof_join(left, right, "k", "ts_us", ["rv"], tolerance_us=90).collect()[0]
    far = asof_join(left, right, "k", "ts_us", ["rv"], tolerance_us=89).collect()[0]
    assert near["asof_rv"] == "old"
    assert far["asof_rv"] is None and far["asof_ts_us"] is None


def test_asof_equal_ts_right_duplicates_deterministic(spark):
    """Two right rows at the identical (key, ts): the greatest payload
    struct wins — stable across partitionings."""
    left = _df(spark, [(1, 10, "l")], "k long, ts_us long, lv string")
    right = _df(spark, [(1, 10, "aa"), (1, 10, "zz")], "k long, ts_us long, rv string")
    for parts in (1, 7):
        got = asof_join(left, right.repartition(parts), "k", "ts_us", ["rv"]).collect()
        assert [(r["asof_ts_us"], r["asof_rv"]) for r in got] == [(10, "zz")]


def test_range_join_bounds_buckets_and_keys(spark):
    pts = _df(spark, [(1, 100, 1), (1, 250, 2), (1, 300, 3), (2, 150, 4)],
              "k long, ts_us long, pid int")
    # interval [100, 300] spans 3 buckets at width 100; inclusive both ends
    iv = _df(spark, [(1, 100, 300, 7), (2, 400, 500, 8)],
             "k long, start_us long, end_us long, ivid int")
    keyed = range_join(pts, iv, "ts_us", "start_us", "end_us",
                       bucket_us=100, on="k")
    got = sorted((r["pid"], r["ivid"]) for r in keyed.collect())
    assert got == [(1, 7), (2, 7), (3, 7)]  # pid 4: key 2's interval misses it
    # without the equality key, pid 4 (ts 150) falls inside interval 7 too
    unkeyed = range_join(pts.drop("k"), iv.drop("k"), "ts_us", "start_us",
                         "end_us", bucket_us=100)
    got = sorted((r["pid"], r["ivid"]) for r in unkeyed.collect())
    assert got == [(1, 7), (2, 7), (3, 7), (4, 7)]


def test_range_join_no_duplicate_matches_across_buckets(spark):
    """A point inside an interval that spans many buckets matches exactly
    once (the explode is on the interval side only)."""
    pts = _df(spark, [(55, 1)], "ts_us long, pid int")
    iv = _df(spark, [(0, 1000, 9)], "start_us long, end_us long, ivid int")
    got = range_join(pts, iv, "ts_us", "start_us", "end_us", bucket_us=10).collect()
    assert [(r["pid"], r["ivid"]) for r in got] == [(1, 9)]


def test_asof_broadcast_strategy_equals_shuffle(spark):
    """The zero-left-shuffle broadcast strategy is result-identical to the
    window strategy, including null handling, tolerance, and the
    equal-(key,ts) tie rule."""
    import random

    rnd = random.Random(7)
    left = _df(
        spark,
        [(rnd.randrange(5), rnd.randrange(100), f"l{i}") for i in range(200)],
        "k long, ts_us long, lv string",
    )
    right = _df(
        spark,
        [(rnd.randrange(5), rnd.randrange(100), f"r{i}") for i in range(60)]
        + [(1, 50, "dupA"), (1, 50, "dupZ")],  # exercised tie
        "k long, ts_us long, rv string",
    )
    for tol in (None, 10):
        a = sorted(
            map(tuple, asof_join(left, right, "k", "ts_us", ["rv"],
                                 tolerance_us=tol).collect())
        )
        b = sorted(
            map(tuple, asof_join(left, right, "k", "ts_us", ["rv"],
                                 tolerance_us=tol, strategy="broadcast").collect())
        )
        assert a == b


def test_asof_broadcast_does_not_shuffle_left(spark):
    left = _df(spark, [(1, 10, "l")], "k long, ts_us long, lv string")
    right = _df(spark, [(1, 5, "r")], "k long, ts_us long, rv string")
    plan = (
        asof_join(left, right, "k", "ts_us", ["rv"], strategy="broadcast")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    # no window / sort-merge machinery: the left side feeds the broadcast
    # join straight from its scan
    assert "SortMergeJoin" not in plan and "Window" not in plan
    # the only hash-partitioning Exchange is the right-side collect_list
    # aggregate (the small side); the left is never shuffled
    assert plan.count("hashpartitioning") <= 1
