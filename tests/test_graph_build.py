"""M1 tests: edge/vertex construction semantics (SURVEY.md §1.2, §2.2)."""

import hashlib

import pytest

from pyspark.sql import functions as F

from hipporag_spark.extract import extract
from hipporag_spark.graph.build import (
    adjacency,
    build_graph,
    fact_edges,
    graph_info,
    passage_edges,
    strength,
    vertices,
)
from hipporag_spark.graph.ids import assign_dense_ids


def ekey(phrase):
    return "entity-" + hashlib.md5(phrase.encode()).hexdigest()


def test_fact_edges_cooccurrence_weights(spark):
    # two chunks sharing the triple (a, imports, b); one (a, defines, c)
    data = [
        ("c1", [("a", "imports", "b"), ("a", "defines", "c")]),
        ("c2", [("a", "imports", "b")]),
    ]
    ex = spark.createDataFrame(
        [(cid, [{"s": s, "p": p, "o": o} for s, p, o in ts]) for cid, ts in data],
        "chunk_id string, triples array<struct<s:string,p:string,o:string>>",
    )
    rows = {(r["src"], r["dst"]): r["weight"] for r in fact_edges(ex).collect()}
    # both directions, weight = #occurrences across chunks
    assert rows[(ekey("a"), ekey("b"))] == 2.0
    assert rows[(ekey("b"), ekey("a"))] == 2.0
    assert rows[(ekey("a"), ekey("c"))] == 1.0
    assert len(rows) == 4


def test_fact_edges_drop_self_pairs(spark):
    ex = spark.createDataFrame(
        [("c1", [{"s": "x", "p": "imports", "o": "x"}])],
        "chunk_id string, triples array<struct<s:string,p:string,o:string>>",
    )
    assert fact_edges(ex).count() == 0  # HippoRAG.py:1064


def test_passage_edges_weight_one(spark):
    ex = spark.createDataFrame(
        [("chunk-abc", ["e1", "e2"])], "chunk_id string, entities array<string>"
    )
    rows = passage_edges(ex).collect()
    assert {(r["src"], r["dst"], r["weight"]) for r in rows} == {
        ("chunk-abc", ekey("e1"), 1.0),
        ("chunk-abc", ekey("e2"), 1.0),
    }


def test_resolve_drops_unknown_endpoints_and_adjacency_sums(spark, tiny_files):
    ex = extract(tiny_files)
    verts, edges, adj = build_graph(ex)
    # endpoint validation: every edge endpoint exists in the vertex table
    vids = {r["id"] for r in verts.collect()}
    for r in edges.collect():
        assert r["src"] in vids and r["dst"] in vids
        assert r["src"] != r["dst"]
    # adjacency is symmetric with identical weight both ways
    a = {(r["src"], r["dst"]): r["weight"] for r in adj.collect()}
    for (u, v), w in a.items():
        assert a[(v, u)] == w
    # strength = row sums
    st = {r["id"]: r["strength"] for r in strength(adj).collect()}
    import collections

    acc = collections.defaultdict(float)
    for (u, _), w in a.items():
        acc[u] += w
    assert set(st) == set(acc)
    for k in st:
        assert abs(st[k] - acc[k]) < 1e-12


def test_vertices_dense_deterministic_ids(spark, tiny_files):
    ex = extract(tiny_files)
    v1 = vertices(ex).orderBy("id").collect()
    v2 = vertices(ex.repartition(7)).orderBy("id").collect()
    names1 = [r["name"] for r in v1]
    assert [r["id"] for r in v1] == list(range(len(v1)))  # dense 0..n-1
    assert names1 == sorted(names1)  # id = rank in name order
    assert [(r["id"], r["name"]) for r in v1] == [(r["id"], r["name"]) for r in v2]


def test_assign_dense_ids_matches_window_rank(spark):
    df = spark.createDataFrame([(f"k{i:03d}",) for i in range(97)], "key string")
    got = {r["key"]: r["id"] for r in assign_dense_ids(df.repartition(13), "key").collect()}
    for i in range(97):
        assert got[f"k{i:03d}"] == i


def test_graph_info_counts(spark, tiny_files):
    ex = extract(tiny_files)
    verts, edges, adj = build_graph(ex)
    info = graph_info(verts, edges)
    assert info["num_passage_nodes"] == 9
    assert info["num_total_nodes"] == info["num_phrase_nodes"] + 9
    assert info["num_total_edges"] == sum(info["edges_by_type"].values())
    assert info["edges_by_type"]["passage"] > 0 and info["edges_by_type"]["fact"] > 0


def test_route_labels_bijection_onto_partitions(spark):
    """route_labels(P) must return P labels whose Spark-hash placement
    (pmod(murmur3(label), P)) covers every partition exactly once — the
    property the blocked engine relies on to avoid balls-in-bins
    stragglers (graph/blocked.py:route_labels)."""
    from pyspark.sql import functions as F

    from hipporag_spark.graph.blocked import route_labels

    for P in (2, 3, 8, 33, 129):
        labels = route_labels(spark, P)
        assert labels is not None and len(labels) == P
        assert len(set(labels)) == P
        placed = (
            spark.createDataFrame([(int(x),) for x in labels], "lbl int")
            .select(F.pmod(F.hash("lbl"), F.lit(P)).alias("p"))
            .collect()
        )
        assert sorted(r["p"] for r in placed) == list(range(P))
    # past the cap: identity (routing off)
    import hipporag_spark.graph.blocked as blocked_mod

    assert route_labels(spark, blocked_mod._ROUTE_MAX_BLOCKS + 1) is None


def test_bipartite_project_counts_shared_groups(spark):
    from hipporag_spark.graph.build import bipartite_project

    rows = [
        ("g1", "a"), ("g1", "b"), ("g1", "c"),
        ("g2", "a"), ("g2", "b"),
        ("g3", "a"), ("g3", "b"),
        ("g3", "a"),  # duplicate membership must not double-count
    ]
    bip = spark.createDataFrame(rows, "src string, dst string")
    out = {(r["a"], r["b"]): r["weight"]
           for r in bipartite_project(bip, min_weight=1).collect()}
    assert out == {("a", "b"): 3, ("a", "c"): 1, ("b", "c"): 1}
    out2 = {(r["a"], r["b"]): r["weight"]
            for r in bipartite_project(bip, min_weight=2).collect()}
    assert out2 == {("a", "b"): 3}


def test_bipartite_project_max_fanout_drops_hub_groups(spark):
    from hipporag_spark.graph.build import bipartite_project

    hub = [("big", f"m{i}") for i in range(10)]
    small = [("s", "x"), ("s", "y")]
    bip = spark.createDataFrame(hub + small, "src string, dst string")
    out = {(r["a"], r["b"]): r["weight"]
           for r in bipartite_project(bip, max_fanout=5).collect()}
    assert out == {("x", "y"): 1}


def test_sparsify_edges_deterministic_and_bridge_preserving(spark):
    from hipporag_spark.graph.build import sparsify_edges

    # hub clique (high degrees, thinned) + a pendant path (deg<=2, kept)
    clique = [(u, v) for u in range(20) for v in range(u + 1, 20)]
    path = [(100, 101), (101, 102), (102, 103)]
    e = spark.createDataFrame(clique + path, "src long, dst long")
    kept = sparsify_edges(e, c=4.0)
    rows = {(r["a"], r["b"]): r["keep_prob"] for r in kept.collect()}
    # deg<=2 endpoints: p = min(1, 4/sqrt(<=4)) = 1 -> always kept
    for a, b in path:
        assert (a, b) in rows and rows[(a, b)] == 1.0
    # clique edges: p = 4/19 -> most dropped
    clique_kept = [k for k in rows if k[0] < 100]
    assert 0 < len(clique_kept) < len(clique) / 2
    # deterministic
    rows2 = {(r["a"], r["b"]): r["keep_prob"]
             for r in sparsify_edges(e.repartition(5), c=4.0).collect()}
    assert rows == rows2


def test_reciprocity_exact(spark):
    from hipporag_spark.graph.build import reciprocity

    # 0->1 (reciprocated), 1->0, 1->2 (not), 2->2 (self loop, dropped)
    e = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 2)], "src long, dst long"
    )
    row = reciprocity(e).collect()[0]
    assert row["n_directed"] == 3 and row["n_reciprocal"] == 2
    assert abs(row["reciprocity"] - round(2 / 3, 6)) < 1e-12


def test_butterfly_count_hand_computed(spark):
    from hipporag_spark.graph.build import butterfly_count

    # groups g1..g3 over members a,b,c: (a,b) share 3 groups -> C(3,2)=3
    # butterflies; (a,c) and (b,c) share only 1 group (below min_weight).
    rows = [
        ("g1", "a"), ("g1", "b"),
        ("g2", "a"), ("g2", "b"),
        ("g3", "a"), ("g3", "b"), ("g3", "c"),
    ]
    bip = spark.createDataFrame(rows, "src string, dst string")
    out = butterfly_count(bip).collect()[0]
    assert out["wedge_pairs"] == 1 and out["butterflies"] == 3


def test_rich_club_star_plus_clique(spark):
    nx = pytest.importorskip("networkx")
    from hipporag_spark.graph.build import rich_club

    # K5 (degrees 4) + star leaves on vertex 0 (degree 4+3=7)
    edges = [(u, v) for u in range(5) for v in range(u + 1, 5)]
    edges += [(0, 10), (0, 11), (0, 12)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["k"]: (r["n_nodes"], r["n_edges"], r["phi"])
           for r in rich_club(e, ks=[1, 2, 4]).collect()}
    G = nx.Graph(edges)
    want = nx.rich_club_coefficient(G, normalized=False)
    for k in (1, 2):  # k=4: only vertex 0 qualifies -> no row (n<2)
        assert got[k][2] == round(want[k], 6), (k, got[k], want[k])
    assert 4 not in got
