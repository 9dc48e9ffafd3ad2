"""Incremental index/delete ≡ full rebuild (VERDICT r1 item 4).

The merge path must scan only the delta yet land on exactly the state a
from-scratch build produces (name-keyed: ids are append-only minted, so the
id *assignment* legitimately differs from a fresh global rank — everything
the math consumes — weights, strengths, refcounts, stores — must match).
Reference semantics: ``HippoRAG.py:238-246`` (hash-diff), ``:1022-1086``
(append add_new_nodes/add_new_edges), ``:280-361`` (refcount cascade).
"""

import pytest
from pyspark.sql import functions as F

from hipporag_spark.engine import LinkGraphEngine
from hipporag_spark.synth import repo_files


def _name_keyed(eng):
    """Graph state projected onto content-addressed names (id-agnostic)."""
    s = eng.state
    v = s.verts.select("id", "name")
    adj = (
        s.adj.join(v.select(F.col("id").alias("src"), F.col("name").alias("sn")), "src")
        .join(v.select(F.col("id").alias("dst"), F.col("name").alias("dn")), "dst")
        .select("sn", "dn", "weight")
    )
    st = s.strength.join(v, "id").select("name", "strength")
    return {
        "verts": {(r["name"], r["ntype"]) for r in s.verts.select("name", "ntype").collect()},
        "adj": {(r["sn"], r["dn"], r["weight"]) for r in adj.collect()},
        "strength": {(r["name"], r["strength"]) for r in st.collect()},
        "chunk_counts": {tuple(r) for r in eng.state.chunk_counts.collect()},
        "fact_counts": {tuple(r) for r in eng.state.fact_counts.collect()},
        "chunk_store": {r["hash_id"] for r in s.chunk_store.collect()},
        "entity_store": {r["hash_id"] for r in s.entity_store.collect()},
        "fact_store": {r["hash_id"] for r in s.fact_store.collect()},
    }


@pytest.fixture(scope="module")
def corpora(spark):
    base = repo_files(spark, 9).persist()
    full = repo_files(spark, 14).persist()
    new5 = full.join(base.select("path"), "path", "left_anti").persist()
    return base, full, new5


def test_incremental_merge_equals_rebuild(spark, corpora):
    base, full, new5 = corpora
    inc = LinkGraphEngine(spark, num_blocks=8)
    inc.index(base)
    inc.index(new5)
    scratch = LinkGraphEngine(spark, num_blocks=8)
    scratch.index(full)
    a, b = _name_keyed(inc), _name_keyed(scratch)
    for k in a:
        assert a[k] == b[k], f"incremental vs rebuild mismatch in {k}"


def test_second_index_scans_only_delta(spark, corpora):
    base, full, new5 = corpora
    eng = LinkGraphEngine(spark, num_blocks=8)
    eng.index(base)
    old_ids = {r["name"]: r["id"] for r in eng.state.verts.collect()}
    n0 = eng.state.n_vertices
    eng.index(full)  # 9 of the 14 are already indexed
    # hash-diff: only the 5 new chunks entered the pipeline
    assert eng.last_index_stats["new_chunks"] == 5
    new_ids = {r["name"]: r["id"] for r in eng.state.verts.collect()}
    # existing vertices keep their ids; new ones extend past the old range
    for name, i in old_ids.items():
        assert new_ids[name] == i
    added = {n: i for n, i in new_ids.items() if n not in old_ids}
    assert added and min(added.values()) == n0
    assert sorted(new_ids.values()) == list(range(len(new_ids)))  # still dense

    # re-indexing the same corpus is a no-op
    st = eng.state
    eng.index(full)
    assert eng.last_index_stats["new_chunks"] == 0
    assert eng.state is st


def test_delete_subtracts_to_rebuild_state(spark, corpora):
    base, full, new5 = corpora
    eng = LinkGraphEngine(spark, num_blocks=8)
    eng.index(full)
    ids_before = {r["name"]: r["id"] for r in eng.state.verts.collect()}
    eng.delete([r["content"] for r in new5.collect()])
    scratch = LinkGraphEngine(spark, num_blocks=8)
    scratch.index(base)
    a, b = _name_keyed(eng), _name_keyed(scratch)
    for k in a:
        assert a[k] == b[k], f"delete vs rebuild mismatch in {k}"
    # survivors keep their ids (holes are fine; values are what matters)
    for r in eng.state.verts.collect():
        assert ids_before[r["name"]] == r["id"]


def _syn_keyed(eng):
    """Edges/adj/strength projected onto names, as dicts for approx-compare:
    synonymy weights are cosine scores from float64 matmuls whose BLAS
    blocking differs between a delta-shaped and a full-shaped KNN, so
    weights may differ in ulps between merge and rebuild (topology and
    everything integer must still match exactly)."""
    s = eng.state
    v = s.verts.select("id", "name")
    e = (
        s.edges.join(v.select(F.col("id").alias("src"), F.col("name").alias("sn")), "src")
        .join(v.select(F.col("id").alias("dst"), F.col("name").alias("dn")), "dst")
        .select("sn", "dn", "etype", "weight")
    )
    adj = (
        s.adj.join(v.select(F.col("id").alias("src"), F.col("name").alias("sn")), "src")
        .join(v.select(F.col("id").alias("dst"), F.col("name").alias("dn")), "dst")
        .select("sn", "dn", "weight")
    )
    st = s.strength.join(v, "id").select("name", "strength")
    return {
        "edges": {(r["sn"], r["dn"], r["etype"]): r["weight"] for r in e.collect()},
        "adj": {(r["sn"], r["dn"]): r["weight"] for r in adj.collect()},
        "strength": {r["name"]: r["strength"] for r in st.collect()},
        "verts": {(r["name"], r["ntype"]) for r in s.verts.select("name", "ntype").collect()},
        "entity_store": {r["hash_id"] for r in s.entity_store.collect()},
    }


def _assert_syn_equal(a, b):
    assert a["verts"] == b["verts"]
    assert a["entity_store"] == b["entity_store"]
    for part in ("edges", "adj", "strength"):
        assert set(a[part]) == set(b[part]), f"{part} topology mismatch"
        for k, va in a[part].items():
            assert abs(va - b[part][k]) < 1e-9, (part, k, va, b[part][k])


def test_incremental_merge_equals_rebuild_synonymy(spark, corpora):
    base, full, new5 = corpora
    inc = LinkGraphEngine(spark, num_blocks=8, enable_synonymy=True)
    inc.index(base)
    inc.index(new5)
    scratch = LinkGraphEngine(spark, num_blocks=8, enable_synonymy=True)
    scratch.index(full)
    _assert_syn_equal(_syn_keyed(inc), _syn_keyed(scratch))


def test_delete_equals_rebuild_synonymy(spark, corpora):
    base, full, new5 = corpora
    eng = LinkGraphEngine(spark, num_blocks=8, enable_synonymy=True)
    eng.index(full)
    eng.delete([r["content"] for r in new5.collect()])
    scratch = LinkGraphEngine(spark, num_blocks=8, enable_synonymy=True)
    scratch.index(base)
    _assert_syn_equal(_syn_keyed(eng), _syn_keyed(scratch))
