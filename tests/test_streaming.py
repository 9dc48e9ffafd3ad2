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
