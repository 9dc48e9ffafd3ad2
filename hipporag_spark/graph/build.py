"""Edge + vertex table construction (the reference's ``node_to_node_stats``
and igraph vertex set, re-expressed as DataFrames).

Reference semantics reproduced (citations per SURVEY.md §1.2/§2.2):

- **Fact edges** (``HippoRAG.py:729-775``): per chunk, per triple (s,p,o),
  weight +1.0 to BOTH directed pairs (h(s),h(o)) and (h(o),h(s)); keys are
  md5 of the text-processed phrase with prefix ``entity-``.
- **Passage edges** (``HippoRAG.py:777-819``): one edge
  (chunk_key, entity_key, 1.0) per unique entity per chunk.
- **Synonymy edges** (``HippoRAG.py:821-882``): KNN over entity embeddings,
  cosine ≥ 0.8, ≤100 neighbors, query phrase >2 alphanumeric chars — built in
  retrieval/knn.py and unioned in here.
- **Edge load** (``HippoRAG.py:1052-1086``): self-loops dropped, edges with
  unknown endpoints dropped (semi-join both endpoints).
- **Vertex load** (``HippoRAG.py:1022-1050``): union of entity + chunk key
  sets; igraph sums parallel-edge weights into vertex strength, so the
  effective symmetric adjacency is W[u,v] = Σ all edge weights between u,v
  (SURVEY.md §1.2) — materialized here by :func:`adjacency`.

Scale notes: every step is a narrow projection, an `explode`, or a keyed
aggregation; the only shuffles are the groupBy(src,dst) weight sums and the
dense-id sort. No driver-side data structures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..keys import CHUNK_PREFIX, ENTITY_PREFIX, chunk_key, entity_key
from .ids import assign_dense_ids


def fact_edges(extraction: DataFrame) -> DataFrame:
    """Entity↔entity co-occurrence edges: ``(src_key, dst_key, weight, etype)``.

    Both directions get +1.0 per triple occurrence (``HippoRAG.py:766-772``);
    the weight accumulation across chunks is the groupBy sum. Self-pairs are
    dropped (``HippoRAG.py:1064`` drops them at load; dropping early saves
    shuffle volume).
    """
    t = extraction.select(F.explode("triples").alias("t"))
    pairs = t.select(
        entity_key(F.col("t.s")).alias("a"), entity_key(F.col("t.o")).alias("b")
    ).filter(F.col("a") != F.col("b"))
    both = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    return (
        both.groupBy("src", "dst")
        .agg(F.sum(F.lit(1.0)).alias("weight"))
        .withColumn("etype", F.lit("fact"))
    )


def passage_edges(extraction: DataFrame) -> DataFrame:
    """Passage→entity edges, weight 1.0 per unique entity per chunk
    (``HippoRAG.py:809-817``). ``entities`` is already per-chunk unique."""
    e = extraction.select(
        F.col("chunk_id").alias("src"), F.explode("entities").alias("phrase")
    )
    return e.select(
        "src", entity_key("phrase").alias("dst"), F.lit(1.0).alias("weight")
    ).withColumn("etype", F.lit("passage"))


def bipartite_project(
    bipartite: DataFrame, min_weight: int = 1, max_fanout: int | None = None
) -> DataFrame:
    """Project a bipartite membership table ``(src=group, dst=member)``
    onto the member side: ``(a, b, weight)`` with a < b and weight =
    number of shared groups, keeping pairs with weight ≥ ``min_weight``
    (e.g. passage→entity edges → the entity co-mention graph, the classic
    densification HippoRAG's synonymy layer approximates semantically).

    Scale: the self-join is keyed on the group id, so its fan-out is
    quadratic in per-group membership — the one real hazard. At 100 TB,
    pass ``max_fanout`` to drop hub groups (a doc listing 10⁴ entities
    contributes 10⁸ pairs and no signal); the cutoff is a deterministic
    per-group count filter, so the result is reproducible. The pair agg
    is map-side-combinable and AQE splits residual skew."""
    m = bipartite.select(F.col("src").alias("g"), F.col("dst").alias("v")).distinct()
    if max_fanout is not None:
        sz = m.groupBy("g").agg(F.count("*").alias("fanout"))
        m = m.join(
            sz.filter(F.col("fanout") <= max_fanout).select("g"), "g", "left_semi"
        )
    left = m.select("g", F.col("v").alias("a"))
    right = m.select("g", F.col("v").alias("b"))
    pairs = left.join(right, "g").filter(F.col("a") < F.col("b"))
    out = pairs.groupBy("a", "b").agg(F.count("*").alias("weight"))
    if min_weight > 1:
        out = out.filter(F.col("weight") >= min_weight)
    return out


def sparsify_edges(
    edges: DataFrame, c: float = 4.0, salt: str = ""
) -> DataFrame:
    """Degree-proportional edge sparsification: keep undirected edge
    {u, v} with probability ``min(1, c / sqrt(deg(u)·deg(v)))``, decided
    by the edge key's md5 bucket — the effective-resistance-inspired
    heuristic (Spielman–Srivastava flavored): edges between hubs are
    heavily thinned (they carry redundant connectivity), bridge-ish edges
    between low-degree vertices are always kept. Deterministic — any
    engine that can compute md5 replays the identical cut, and the graph
    shrinks reproducibly at any parallelism.

    Scale shape: one degree agg + two keyed joins + a pure projection
    filter; no iteration, no driver data. Returns ``(a, b, keep_prob)``
    with a < b for the surviving edges."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        und.join(deg.select(F.col("id").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("db")), "b")
    )
    p = F.least(F.lit(1.0), F.lit(c) / F.sqrt(F.col("da") * F.col("db")))
    h = F.md5(
        F.concat_ws("|", F.col("a").cast("string"), F.col("b").cast("string"),
                    F.lit(salt))
    )
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 10_000
    return (
        e.filter(bucket < F.floor(p * 10_000))
        .select("a", "b", F.round(p, 6).alias("keep_prob"))
    )


def butterfly_count(bipartite: DataFrame) -> DataFrame:
    """Global butterfly (bipartite 4-cycle) count as a 1-row DataFrame
    ``(wedge_pairs, butterflies)``: butterflies = Σ over member pairs
    C(shared_groups, 2) — the standard bipartite cohesion census
    (Sanei-Mehri et al. 2018's counting identity, re-expressed as the
    projection aggregate).

    Scale shape: rides :func:`bipartite_project` (the one quadratic
    hazard, same mitigation applies — pass the projection of a
    fanout-capped membership for the capped census); the census itself
    is a map-side-combinable 1-row aggregate over the pair weights."""
    proj = bipartite_project(bipartite, min_weight=2)
    return proj.agg(
        F.count("*").alias("wedge_pairs"),
        F.sum(
            (F.col("weight") * (F.col("weight") - 1) / 2).cast("long")
        ).alias("butterflies"),
    )


def rich_club(edges: DataFrame, ks: list[int] | None = None) -> DataFrame:
    """Rich-club coefficients φ(k) = 2·E_k / (N_k·(N_k−1)) for each
    degree threshold k: the edge density among vertices of degree > k
    (Zhou & Mondragón 2004). Returns ``(k, n_nodes, n_edges, phi)`` —
    rows only for thresholds with ≥ 2 qualifying vertices.

    Scale shape: one degree agg, then per-k two semi-joins of the edge
    list against the (shrinking) rich set + a 1-row agg — k values are
    few and fixed, so this is a handful of keyed passes, no iteration."""
    ks = ks or [1, 2, 4, 8]
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
        .persist()
    )
    parts = []
    for k in ks:
        rich = deg.filter(F.col("deg") > k).select("id")
        ek = (
            und.join(rich.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(rich.withColumnRenamed("id", "b"), "b", "left_semi")
            .agg(F.count("*").alias("n_edges"))
        )
        nk = rich.agg(F.count("*").alias("n_nodes"))
        parts.append(
            nk.crossJoin(F.broadcast(ek)).select(
                F.lit(k).alias("k"), "n_nodes", "n_edges",
                F.round(
                    2.0 * F.col("n_edges") / (F.col("n_nodes") * (F.col("n_nodes") - 1)),
                    6,
                ).alias("phi"),
            ).filter(F.col("n_nodes") >= 2)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def reciprocity(edges: DataFrame) -> DataFrame:
    """Directed-graph reciprocity as a 1-row DataFrame
    ``(n_directed, n_reciprocal, reciprocity)``: the fraction of directed
    edges whose reverse also exists (self-loops dropped). One distinct +
    one self-semi-join on the flipped key + a 1-row agg — no iteration."""
    d = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    recip = d.join(
        d.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        ["src", "dst"],
        "left_semi",
    )
    return d.agg(F.count("*").alias("n_directed")).crossJoin(
        F.broadcast(recip.agg(F.count("*").alias("n_reciprocal")))
    ).select(
        "n_directed",
        "n_reciprocal",
        F.round(F.col("n_reciprocal") / F.col("n_directed"), 6).alias("reciprocity"),
    )


def vertices(extraction: DataFrame, edges: DataFrame | None = None) -> DataFrame:
    """Vertex table ``(id: long, name: string, ntype, content)``.

    name = content-addressed key (the igraph vertex ``name`` attribute,
    ``HippoRAG.py:1040-1050``); ntype from the key prefix; dense determinstic
    ids via global-rank assignment (ids.py).
    """
    ents = (
        extraction.select(F.explode("entities").alias("content"))
        .distinct()
        .select(
            entity_key("content").alias("name"),
            F.lit("entity").alias("ntype"),
            "content",
        )
    )
    chunks = extraction.select(
        F.col("chunk_id").alias("name"),
        F.lit("passage").alias("ntype"),
        F.col("passage").alias("content"),
    ).dropDuplicates(["name"])
    v = ents.unionByName(chunks)
    return assign_dense_ids(v, "name")


def resolve_edges(edge_keys: DataFrame, verts: DataFrame) -> DataFrame:
    """Key-space edges → id-space ``edges(src: long, dst: long, weight, etype)``.

    Joining to the vertex table doubles as endpoint validation: unknown
    endpoints drop out (inner join ≡ the semi-join check at
    ``HippoRAG.py:1075-1077``). Self-loops already dropped at build.
    """
    vs = verts.select("name", "id")
    return (
        edge_keys.join(
            vs.select(F.col("name").alias("src"), F.col("id").alias("src_id")), "src"
        )
        .join(vs.select(F.col("name").alias("dst"), F.col("id").alias("dst_id")), "dst")
        .select(
            F.col("src_id").alias("src"), F.col("dst_id").alias("dst"), "weight", "etype"
        )
    )


def adjacency(edges: DataFrame) -> DataFrame:
    """Symmetric weighted adjacency ``adj(src, dst, weight)``.

    The reference's graph is undirected with parallel edges summed into
    strength (igraph; SURVEY.md §1.2): each undirected edge {u,v} of total
    weight w contributes w to BOTH adjacency rows (u,v) and (v,u) — exactly
    the Kotlin reference adjacency build (``SimpleGraph.kt:141-148``).
    """
    sym = edges.select("src", "dst", "weight").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    return sym.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))


def strength(adj: DataFrame) -> DataFrame:
    """Vertex strength = Σ incident weights (PPR out-normalizer,
    ``SimpleGraph.kt:150-153``)."""
    return adj.groupBy("src").agg(F.sum("weight").alias("strength")).withColumnRenamed("src", "id")


def build_graph(extraction: DataFrame, synonymy: DataFrame | None = None):
    """Full build: extraction → (vertices, edges, adjacency).

    ``synonymy`` is an optional pre-built key-space edge table
    (retrieval/knn.synonymy_edges) unioned before resolution.
    """
    staged = fact_edges(extraction).unionByName(passage_edges(extraction))
    if synonymy is not None:
        staged = staged.unionByName(synonymy)
    verts = vertices(extraction).persist()
    edges = resolve_edges(staged, verts).persist()
    adj = adjacency(edges).persist()
    return verts, edges, adj


def graph_info(verts: DataFrame, edges: DataFrame) -> dict:
    """Node/edge counts by class (``HippoRAG.py:1095-1148``)."""
    vc = {r["ntype"]: r["count"] for r in verts.groupBy("ntype").count().collect()}
    ec = {r["etype"]: r["count"] for r in edges.groupBy("etype").count().collect()}
    return {
        "num_phrase_nodes": vc.get("entity", 0),
        "num_passage_nodes": vc.get("passage", 0),
        "num_total_nodes": sum(vc.values()),
        "edges_by_type": ec,
        "num_total_edges": sum(ec.values()),
    }
