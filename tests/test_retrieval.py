"""F5 lifecycle: index → retrieve → incremental index → retrieve → delete →
retrieve (mirrors /root/reference/tests_local.py:12-114), plus scoring and
KNN unit checks."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hipporag_spark.engine import LinkGraphEngine
from hipporag_spark.retrieval.embeddings import embed_text, embedding_store
from hipporag_spark.retrieval.knn import knn, synonymy_edges
from hipporag_spark.retrieval.scoring import minmax
from hipporag_spark.synth import repo_files


def corpus(spark, n):
    return repo_files(spark, n)


def test_minmax_constant_input_all_ones(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 5.0)], "id int, x double")
    out = minmax(df, "x", "norm").collect()
    assert all(r["norm"] == 1.0 for r in out)  # misc_utils.py:104-113


def test_minmax_range(spark):
    df = spark.createDataFrame([(1, 0.0), (2, 5.0), (3, 10.0)], "id int, x double")
    got = {r["id"]: r["norm"] for r in minmax(df, "x", "norm").collect()}
    assert got == {1: 0.0, 2: 0.5, 3: 1.0}


def test_knn_exact_vs_numpy(spark):
    texts = [f"phrase number {i}" for i in range(30)]
    df = spark.createDataFrame([(t,) for t in texts], "content string")
    store = embedding_store(df, "content", "entity-")
    items = store.select(F.col("hash_id").alias("key"), "embedding")
    out = knn(items, items, k=3, num_blocks=4, exclude_self=True).collect()

    embs = {r["hash_id"]: np.array(r["embedding"]) for r in store.collect()}
    keys = sorted(embs)
    M = np.stack([embs[k] for k in keys])
    S = M @ M.T
    np.fill_diagonal(S, -np.inf)
    got = {}
    for r in out:
        got.setdefault(r["query_key"], []).append((r["rank"], r["item_key"], r["score"]))
    assert len(got) == 30
    for qi, k in enumerate(keys):
        nn = sorted(got[k])
        best_idx = int(np.argmax(S[qi]))
        assert nn[0][1] == keys[best_idx]
        assert abs(nn[0][2] - S[qi][best_idx]) < 1e-6
        assert len(nn) == 3


def test_synonymy_edges_guards(spark):
    # phrases with ≤2 alphanumeric chars must not appear as queries
    df = spark.createDataFrame([("ab",), ("x1",), ("longword one",), ("longword two",)], "content string")
    store = embedding_store(df, "content", "entity-")
    edges = synonymy_edges(store, threshold=-1.0, num_blocks=2).collect()
    import hashlib

    short_keys = {
        "entity-" + hashlib.md5(t.encode()).hexdigest() for t in ("ab", "x1")
    }
    assert all(r["src"] not in short_keys for r in edges)
    assert all(r["src"] != r["dst"] for r in edges)
    assert all(r["etype"] == "synonymy" for r in edges)


@pytest.mark.slow
def test_lifecycle_index_incremental_delete(spark):
    eng = LinkGraphEngine(spark, num_blocks=8)
    base = corpus(spark, 9)
    eng.index(base)
    info0 = eng.state.n_vertices
    assert info0 > 9  # passages + entities

    queries = ["import libcore", "def fn3v0"]
    r1 = eng.retrieve(queries, retrieval_top_k=5)
    rows1 = r1.collect()
    assert {r["query_id"] for r in rows1} == set(queries)
    per_q = {}
    for r in rows1:
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rs in per_q.items():
        assert len(rs) == 5
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == [1, 2, 3, 4, 5]
        scores = [r["score"] for r in sorted(rs, key=lambda x: x["rank"])]
        assert scores == sorted(scores, reverse=True)

    # incremental: 5 new files (ids 9..13 of the 14-file corpus)
    full = corpus(spark, 14)
    new5 = full.join(base.select("path"), "path", "left_anti")
    assert new5.count() == 5
    eng.index(new5)
    assert eng.state.extraction.count() == 14
    assert eng.state.n_vertices > info0

    # delete the 5 new docs → graph returns to the original vertex set
    new_contents = [r["content"] for r in new5.collect()]
    eng.delete(new_contents)
    assert eng.state.extraction.count() == 9
    assert eng.state.n_vertices == info0

    r3 = eng.retrieve(queries, retrieval_top_k=5)
    got3 = {(r["query_id"], r["chunk_id"], r["rank"]) for r in r3.collect()}
    got1 = {(r["query_id"], r["chunk_id"], r["rank"]) for r in rows1}
    assert got3 == got1  # delete fully reverses the incremental index
