"""Sources/sinks: store round-trip, hash-diff upsert, delete, OpenIE cache."""

import json

from pyspark.sql import functions as F

from hipporag_spark.extract import extract
from hipporag_spark.sources.stores import EmbeddingStoreIO, OpenIECache, read_corpus_json
from hipporag_spark.synth import repo_files


def test_read_corpus_json(spark, tmp_path):
    corpus = [{"title": "T1", "text": "body one"}, {"title": "T2", "text": "body two"}]
    p = str(tmp_path / "corpus.json")
    with open(p, "w") as f:
        json.dump(corpus, f)
    df = read_corpus_json(spark, p)
    rows = {r["title"]: r["doc"] for r in df.collect()}
    assert rows == {"T1": "T1\nbody one", "T2": "T2\nbody two"}


def test_store_upsert_is_incremental(spark, tmp_path):
    io = EmbeddingStoreIO(spark, str(tmp_path / "store"))
    a = spark.createDataFrame(
        [("h1", "one", [1.0]), ("h2", "two", [2.0])],
        "hash_id string, content string, embedding array<float>",
    )
    io.save(a)
    # upsert with one overlapping and one new row: existing row must win
    b = spark.createDataFrame(
        [("h2", "two-CHANGED", [9.0]), ("h3", "three", [3.0])],
        "hash_id string, content string, embedding array<float>",
    )
    out = io.upsert(b)
    rows = {r["hash_id"]: r["content"] for r in out.collect()}
    assert rows == {"h1": "one", "h2": "two", "h3": "three"}

    # delete by hash
    io.delete(spark.createDataFrame([("h1",)], "hash_id string"))
    assert {r["hash_id"] for r in io.load().collect()} == {"h2", "h3"}

    # bulk lookup
    got = io.get_rows(spark.createDataFrame([("h3",), ("h9",)], "hash_id string")).collect()
    assert [r["hash_id"] for r in got] == ["h3"]


def test_openie_cache_diff_and_merge(spark, tmp_path):
    cache = OpenIECache(spark, str(tmp_path / "openie"))
    corpus = repo_files(spark, 6).persist()
    # everything missing initially
    assert cache.missing(corpus).count() == 6
    ex = extract(corpus)
    cache.merge_save(ex.filter(F.col("chunk_id").isNotNull()).limit(4))
    # only the un-cached chunks are "missing" now
    assert cache.missing(corpus).count() == 2
    # merging the rest completes the cache; idempotent re-merge keeps count
    cache.merge_save(ex)
    assert cache.missing(corpus).count() == 0
    assert cache.load().count() == 6
    cache.merge_save(ex)
    assert cache.load().count() == 6


def test_catalog_table_io_fallback_merge(spark, tmp_path):
    """CatalogTableIO: MERGE-contract upsert/delete through whichever
    physical path the runtime supports (Iceberg MERGE INTO when the
    extensions are installed; two-phase parquet swap here)."""
    from hipporag_spark.sources.catalog import CatalogTableIO, iceberg_available

    target = str(tmp_path / "cat_store")
    io = CatalogTableIO(spark, target, key="hash_id")
    assert not io.use_iceberg  # sandbox has no Iceberg jars — fallback path

    base = spark.createDataFrame(
        [("a", 1), ("b", 2)], "hash_id string, v int"
    )
    io.create_or_replace(base)
    # upsert: replace existing key, insert new one
    io.upsert(spark.createDataFrame([("b", 20), ("c", 3)], "hash_id string, v int"))
    got = {r["hash_id"]: r["v"] for r in io.load().collect()}
    assert got == {"a": 1, "b": 20, "c": 3}
    # delete by key
    io.delete_keys(spark.createDataFrame([("a",)], "hash_id string"))
    got = {r["hash_id"]: r["v"] for r in io.load().collect()}
    assert got == {"b": 20, "c": 3}
    assert isinstance(iceberg_available(spark), bool)
