"""M0 tests: deterministic input generation + extraction.

Invariants: determinism across parallelism levels, the sha256 per-row
invariant (BASELINE.json input_hint), extraction semantics (per-chunk unique
entities, validated deduped triples — misc_utils.py:84-102,
llm_utils.py:222-252), built-in vs pandas extraction parity.
"""

import hashlib

from pyspark.sql import functions as F

from hipporag_spark.extract import extract, extract_triples_pandas
from hipporag_spark.synth import repo_files


def test_generator_deterministic_across_partitioning(spark):
    a = repo_files(spark, 200).orderBy("path").collect()
    b = repo_files(spark, 200).repartition(17).orderBy("path").collect()
    assert a == b


def test_sha256_invariant(tiny_files):
    for r in tiny_files.collect():
        assert r["content_sha256"] == hashlib.sha256(r["content"].encode()).hexdigest()


def test_schema_matches_input_hint(tiny_files):
    assert [f.name for f in tiny_files.schema.fields] == [
        "repo", "path", "commit", "lang", "content", "content_sha256",
    ]
    assert len(tiny_files.collect()[0]["commit"]) == 40


def test_extraction_semantics(tiny_files):
    ex = extract(tiny_files)
    rows = ex.collect()
    assert len(rows) == 9
    for r in rows:
        # chunk key = 'chunk-' + md5(content)
        assert r["chunk_id"] == "chunk-" + hashlib.md5(r["passage"].encode()).hexdigest()
        trips = [(t["s"], t["p"], t["o"]) for t in r["triples"]]
        # deduped, all len-3 non-empty, text-processed (lowercase alnum+space)
        assert len(trips) == len(set(trips))
        for s, p, o in trips:
            assert s and o and p in ("imports", "defines")
            for x in (s, p, o):
                assert all(c.islower() or c.isdigit() or c == " " for c in x)
        # entities = sorted unique subjects+objects (np.unique semantics)
        expect = sorted({t[0] for t in trips} | {t[2] for t in trips})
        assert r["entities"] == expect


def test_pandas_extractor_parity(small_files):
    a = extract(small_files).orderBy("chunk_id").collect()
    b = extract_triples_pandas(small_files).orderBy("chunk_id").collect()
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra["chunk_id"] == rb["chunk_id"]
        assert ra["entities"] == rb["entities"]
        assert sorted(map(tuple, ra["triples"])) == sorted(map(tuple, rb["triples"]))


def test_hub_skew_present(small_files):
    ex = extract(small_files)
    deg = (
        ex.select(F.explode("triples").alias("t"))
        .filter(F.col("t.p") == "imports")
        .groupBy("t.o")
        .count()
        .orderBy(F.desc("count"))
        .collect()
    )
    # hub lib should dominate import in-degree (skew fixture, FIXTURES.md F1)
    assert deg[0]["o"] == "libcore"
    assert deg[0]["count"] > 3 * deg[1]["count"]
