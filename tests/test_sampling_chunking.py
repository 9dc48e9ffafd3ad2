"""hash_split / stratified_sample / chunk_documents semantics. (DuckDB
oracle parity runs in test_driver_parity via `hash_split_counts` /
`chunk_documents`.)"""

import pytest
from pyspark.sql import functions as F

from hipporag_spark.ops.chunking import chunk_documents
from hipporag_spark.ops.sampling import hash_split, stratified_sample


def test_hash_split_is_deterministic_and_partition_stable(spark):
    df = spark.range(2000).select(F.col("id").alias("k"))
    a = {r["k"]: r["split"] for r in hash_split(df, "k").collect()}
    b = {r["k"]: r["split"] for r in hash_split(df.repartition(13), "k").collect()}
    assert a == b
    # proportions roughly honored (exact counts pinned by the driver oracle)
    from collections import Counter
    c = Counter(a.values())
    assert 0.85 < c["train"] / 2000 < 0.95
    assert set(c) == {"train", "val", "test"}
    # a different salt reassigns some keys
    s = {r["k"]: r["split"] for r in hash_split(df, "k", salt="v2").collect()}
    assert s != a


def test_stratified_sample_rates_and_determinism(spark):
    df = spark.range(6000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("cls")
    )
    frac = {"0": 1.0, "1": 0.5, "2": 0.0}
    got = stratified_sample(df, "cls", frac)
    counts = {r["cls"]: r["n"] for r in got.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    assert counts.get("0") == 2000          # fraction 1.0 keeps everything
    assert "2" not in counts                # fraction 0.0 drops everything
    assert 800 < counts.get("1", 0) < 1200  # ~half
    again = stratified_sample(df.repartition(7), "cls", frac)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, again.collect()))


def test_chunk_documents_boundaries(spark):
    docs = spark.createDataFrame(
        [(1, "a" * 100), (2, "b" * 101), (3, "c" * 40), (4, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_chars=100, overlap=60)  # stride 40
    rows = {(r["doc_id"], r["chunk_idx"]): (r["chunk_len"], r["n_chunks"], len(r["chunk_text"]))
            for r in out.collect()}
    # doc 1 (len 100): starts 0, 40, 80 → lens 100, 60, 20
    assert rows[(1, 0)] == (100, 3, 100)
    assert rows[(1, 1)] == (60, 3, 60)
    assert rows[(1, 2)] == (20, 3, 20)
    # doc 2 (len 101): starts 0, 40, 80 → last len 21
    assert rows[(2, 2)] == (21, 3, 21)
    # doc 3 (len 40): one chunk
    assert rows[(3, 0)] == (40, 1, 40)
    # empty doc yields nothing
    assert not any(d == 4 for d, _ in rows)
    # overlap property: consecutive chunks share `overlap` chars
    texts = {r["chunk_idx"]: r["chunk_text"] for r in out.filter(F.col("doc_id") == 2).collect()}
    assert texts[0][40:] == texts[1][:60]


def test_chunk_documents_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_chars=10, overlap=10)


def test_weighted_sample_rate_and_determinism(spark):
    from hipporag_spark.ops.sampling import weighted_sample

    df = spark.range(4000).select(
        F.col("id"), (F.col("id") % 7 + 1).cast("long").alias("w")
    )
    kept = weighted_sample(df, "id", "w", rate=0.5)
    ids = sorted(r["id"] for r in kept.collect())
    # deterministic: identical on a second run
    assert ids == sorted(r["id"] for r in weighted_sample(df, "id", "w", 0.5).collect())
    # realized rate near 0.5 at 1/10000 bucket granularity
    assert 0.45 < len(ids) / 4000 < 0.55
    # keep rate grows with weight
    by_w = (
        weighted_sample(df, "id", "w", 0.5)
        .groupBy("w").count().orderBy("w").collect()
    )
    rates = {r["w"]: r["count"] / (4000 / 7) for r in by_w}
    assert rates[7] > rates[1]


def test_weighted_sample_caps_probability_at_one(spark):
    from hipporag_spark.ops.sampling import weighted_sample

    # one huge weight: p would exceed 1 without the cap; every heavy row kept
    df = spark.range(100).select(
        F.col("id"), F.when(F.col("id") < 5, 1000).otherwise(1).cast("long").alias("w")
    )
    kept = {r["id"] for r in weighted_sample(df, "id", "w", 0.5).collect()}
    assert set(range(5)) <= kept
