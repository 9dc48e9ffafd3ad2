"""Structured Streaming incremental ingest: two file drops → same edge
table as one batch build."""

from pyspark.sql import functions as F

from hipporag_spark.graph.build import fact_edges, passage_edges
from hipporag_spark.extract import extract
from hipporag_spark.streaming.ingest import StreamingIndexer
from hipporag_spark.synth import repo_files


def test_streaming_ingest_matches_batch(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    full = repo_files(spark, 12).persist()
    first = full.limit(7).persist()
    rest = full.join(first.select("path"), "path", "left_anti")

    first.write.mode("overwrite").parquet(input_dir)
    idx = StreamingIndexer(spark, input_dir, state_dir)
    q = idx.start(trigger_available_now=True)
    q.awaitTermination(120)
    assert idx.extraction().count() == 7

    # drop the remaining files (plus a duplicate of an old one — the
    # hash-diff must skip it) and run another availableNow pass
    rest.unionByName(first.limit(1)).write.mode("append").parquet(input_dir)
    q = idx.start(trigger_available_now=True)
    q.awaitTermination(120)
    assert idx.extraction().count() == 12

    ex = extract(full)
    want = fact_edges(ex).unionByName(passage_edges(ex))
    got = idx.edge_table()
    w = {(r["src"], r["dst"], r["etype"]): r["weight"] for r in want.collect()}
    g = {(r["src"], r["dst"], r["etype"]): r["weight"] for r in got.collect()}
    assert g == w


def test_foreachbatch_replay_is_idempotent(spark, tmp_path):
    """A replayed epoch (at-least-once foreachBatch) must not duplicate
    staged edges or extraction rows: each epoch overwrites its own
    partition (ADVICE r1: double mode-append writes doubled edge weights
    on replay)."""
    from hipporag_spark.streaming.ingest import StreamingIndexer
    from hipporag_spark.synth import repo_files

    idx = StreamingIndexer(spark, str(tmp_path / "in"), str(tmp_path / "state"))
    batch = repo_files(spark, 5).persist()
    idx._process_batch(batch, epoch_id=0)
    edges_once = sorted(
        (r["src"], r["dst"], r["weight"]) for r in idx.edge_table().collect()
    )
    n_ex_once = idx.extraction().count()
    # replay the same epoch (crash-before-commit scenario)
    idx._process_batch(batch, epoch_id=0)
    edges_replay = sorted(
        (r["src"], r["dst"], r["weight"]) for r in idx.edge_table().collect()
    )
    assert edges_replay == edges_once
    assert idx.extraction().count() == n_ex_once


def test_dedup_stream_drops_cross_batch_duplicates(spark, tmp_path):
    """First occurrence of each content hash passes through exactly once
    across micro-batches; within a batch the smallest doc_id wins and
    the duplicate count is reported."""
    from pyspark.sql import functions as F
    from hipporag_spark.streaming.dedup import dedup_stream

    in_dir = str(tmp_path / "din")
    ck_dir = str(tmp_path / "dck")
    schema = "content_hash string, doc_id long, text string"

    drop1 = [("h1", 5, "alpha"), ("h1", 2, "alpha"), ("h2", 7, "beta")]
    drop2 = [("h1", 9, "alpha"), ("h3", 1, "gamma"), ("h3", 3, "gamma")]
    spark.createDataFrame(drop1, schema).coalesce(1).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema(schema).parquet(in_dir)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .option("checkpointLocation", ck_dir)
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(drop2, schema).coalesce(1).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        tuple(r)
        for r in spark.table("dedup_stream_test")
        .select("content_hash", "doc_id", "text", "n_dupes_in_batch")
        .collect()
    )
    # h1: first batch winner doc_id=2 with 1 dup; second-batch h1 dropped.
    # h2: single. h3: winner doc_id=1 with 1 dup in its batch.
    assert got == [
        ("h1", 2, "alpha", 1),
        ("h2", 7, "beta", 0),
        ("h3", 1, "gamma", 1),
    ]


def test_count_stream_cumulative_changelog(spark, tmp_path):
    """Per-batch changelog rows carry cumulative totals; folding the
    changelog by max(total) equals the exact batch groupBy count."""
    from pyspark.sql import functions as F
    from hipporag_spark.streaming.counters import count_stream

    in_dir = str(tmp_path / "cin")
    ck_dir = str(tmp_path / "cck")
    schema = "key string"
    drop1 = [("a",), ("a",), ("b",)]
    drop2 = [("a",), ("c",), ("c",), ("b",)]
    spark.createDataFrame(drop1, schema).coalesce(1).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema(schema).parquet(in_dir)
    q = (
        count_stream(stream)
        .writeStream.format("memory")
        .queryName("count_stream_test")
        .outputMode("append")
        .option("checkpointLocation", ck_dir)
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(drop2, schema).coalesce(1).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    log = spark.table("count_stream_test")
    rows = sorted(tuple(r) for r in log.collect())
    assert rows == [
        ("a", 2, 2), ("a", 3, 1), ("b", 1, 1), ("b", 2, 1), ("c", 2, 2),
    ]
    folded = {
        r["key"]: r["m"] for r in log.groupBy("key").agg(F.max("total").alias("m")).collect()
    }
    batch = spark.createDataFrame(drop1 + drop2, schema).groupBy("key").count()
    assert folded == {r["key"]: r["count"] for r in batch.collect()}
