"""Engine facade: the reference's ``index`` / ``retrieve`` / ``delete``
lifecycle (``/root/reference/src/hipporag/HippoRAG.py:218-523``) as one
DataFrame lineage per stage.

State lives in DataFrames (persist Parquet/Iceberg in production):

    chunk_store / entity_store / fact_store   (hash_id, content, embedding)
    extraction   (chunk_id, passage, entities, triples, repo, content_sha256)
    verts        (id, name, ntype, content)
    edges        (src, dst, weight, etype)          — id space
    adj          (src, dst, weight)                 — symmetric, summed
    chunk_counts (entity_name, num_chunks)          — the ent→chunk index

Incremental ``index`` is hash-diff ingest: the new corpus is anti-joined
against the existing chunk store so only new chunks are extracted
(``embedding_store.py:63-90``, ``HippoRAG.py:238-246``); the graph is then
rebuilt from the unioned extraction (deterministic ids must be re-minted —
a full rebuild of the two small tables, NOT a re-extraction).

``delete`` is the ref-counted cascade (``HippoRAG.py:280-361``): drop the
chunks; drop entities/facts only when no surviving chunk references them —
all expressed as semi/anti-joins.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import extract
from .graph.build import adjacency, fact_edges, passage_edges, resolve_edges, strength, vertices
from .graph.ids import assign_dense_ids
from .keys import CHUNK_PREFIX, ENTITY_PREFIX, chunk_key
from .retrieval.embeddings import embedding_store
from .retrieval.knn import synonymy_edges
from .retrieval.scoring import (
    LINK_TOP_K,
    RETRIEVAL_TOP_K,
    build_reset,
    passage_weights,
    phrase_weights,
    rank_docs,
    score_store,
    top_facts,
)


# COO arrays ≈ 20 bytes/edge → 2e8 edges ≈ 4 GB broadcast: the practical
# executor-memory ceiling for the query-partitioned broadcast PPR engine
BROADCAST_EDGE_LIMIT = int(2e8)


@dataclass
class GraphState:
    extraction: DataFrame
    verts: DataFrame
    edges: DataFrame
    adj: DataFrame
    strength: DataFrame
    chunk_store: DataFrame
    entity_store: DataFrame
    fact_store: DataFrame
    chunk_counts: DataFrame
    fact_counts: DataFrame  # (hash_id, n_chunks) — the fact→chunk refcount
    n_vertices: int
    n_edges: int

    def tables(self) -> list[DataFrame]:
        return [
            self.extraction, self.verts, self.edges, self.adj, self.strength,
            self.chunk_store, self.entity_store, self.fact_store,
            self.chunk_counts, self.fact_counts,
        ]

    def unpersist(self) -> None:
        for t in self.tables():
            try:
                t.unpersist()
            except Exception:
                pass


class LinkGraphEngine:
    def __init__(
        self,
        spark: SparkSession,
        enable_synonymy: bool = False,
        num_blocks: int | None = None,
    ):
        self.spark = spark
        self.enable_synonymy = enable_synonymy
        self.num_blocks = num_blocks
        self.state: GraphState | None = None
        self._block_graph = None  # compiled once per state, reused by every retrieve
        self._graph_coo_bc = None  # broadcast COO, collected once per state

    def graph_coo(self):
        """The broadcast graph-COO for the current state, collected and
        broadcast ONCE and invalidated by index()/delete() (same rationale
        as :meth:`block_graph` — re-collecting + re-broadcasting a
        multi-hundred-MB COO per retrieve() is a full graph scan per query
        batch)."""
        from .algo.ppr import collect_graph_coo

        assert self.state is not None, "index() first"
        if self._graph_coo_bc is None:
            s = self.state
            coo = collect_graph_coo(s.adj, s.strength, s.verts.select("id"))
            self._graph_coo_bc = self.spark.sparkContext.broadcast(coo)
        return self._graph_coo_bc

    def _drop_graph_coo(self) -> None:
        if self._graph_coo_bc is not None:
            mdir = self._graph_coo_bc.value.get("mmap_dir")
            self._graph_coo_bc.unpersist()
            self._graph_coo_bc = None
            if mdir:
                import shutil

                shutil.rmtree(mdir, ignore_errors=True)

    def block_graph(self):
        """The packed BlockGraph for the current state, compiled lazily ONCE
        and invalidated by index()/delete() (VERDICT r1: compiling per
        retrieve() re-ran the whole edge packing every query batch)."""
        from .graph.blocked import compile_blocks, default_num_blocks

        assert self.state is not None, "index() first"
        if self._block_graph is None:
            s = self.state
            P = self.num_blocks or default_num_blocks(s.n_edges)
            self._block_graph = compile_blocks(s.adj, s.strength, s.verts.select("id"), P)
        return self._block_graph

    # ---------------- index ----------------

    def index(self, repo_files: DataFrame) -> GraphState:
        """Build or extend the graph from a ``(repo, path, commit, lang,
        content, content_sha256)`` table.

        The incremental path is DELTA-ONLY (``HippoRAG.py:238-246`` hash-diff
        + ``:1022-1086`` append semantics): only new chunks are extracted and
        exploded; new vertices get ids appended past the existing id space
        (append-only minting); the new edges/strengths/refcounts are merged
        into the existing aggregated tables by keyed sums. No O(corpus)
        re-extraction, re-explode, or id re-mint happens — the only
        full-table inputs are the already-aggregated graph tables themselves
        (at production scale those unions are partition-aligned merges on
        bucketed Iceberg tables).
        """
        new_ex = extract(repo_files).dropDuplicates(["chunk_id"])
        if self.state is None:
            return self._build_state(new_ex)
        # hash-diff incremental ingest: only chunks not yet indexed
        new_ex = new_ex.join(
            self.state.extraction.select("chunk_id"), "chunk_id", "left_anti"
        ).localCheckpoint(eager=True)
        n_new = new_ex.count()
        self.last_index_stats = {"new_chunks": n_new}
        if n_new == 0:
            return self.state
        return self._merge_state(new_ex)

    def delete(self, contents: list[str]) -> GraphState:
        """Ref-counted cascade delete of chunks by content
        (``HippoRAG.py:280-361``), delta-only: the doomed chunks' edge /
        refcount contributions are SUBTRACTED from the aggregated tables;
        entities and facts whose refcount reaches zero drop out — exactly
        the reference's cascade, as keyed merges over delta-sized inputs."""
        assert self.state is not None
        s = self.state
        doomed_keys = self.spark.createDataFrame(
            [(c,) for c in contents], "content string"
        ).select(chunk_key("content").alias("chunk_id")).distinct()
        doomed_ex = s.extraction.join(
            F.broadcast(doomed_keys), "chunk_id", "left_semi"
        ).localCheckpoint(eager=True)
        if doomed_ex.count() == 0:
            return s
        return self._subtract_state(doomed_ex)

    # ----- shared delta builders (used by full, merge and subtract paths) -----

    @staticmethod
    def _fact_text_df(ex: DataFrame) -> DataFrame:
        return (
            ex.select(F.explode("triples").alias("t"))
            .select(
                F.to_json(F.struct(F.col("t.s"), F.col("t.p"), F.col("t.o"))).alias(
                    "fact_text"
                )
            )
            .dropDuplicates(["fact_text"])
        )

    @staticmethod
    def _fact_counts(ex: DataFrame) -> DataFrame:
        """(hash_id, n_chunks): fact → #chunks refcount
        (``proc_triples_to_docs``, ``HippoRAG.py:1212-1219``)."""
        return (
            ex.select("chunk_id", F.explode("triples").alias("t"))
            .select(
                "chunk_id",
                F.to_json(F.struct(F.col("t.s"), F.col("t.p"), F.col("t.o"))).alias(
                    "fact_text"
                ),
            )
            .groupBy("fact_text")
            .agg(F.countDistinct("chunk_id").alias("n_chunks"))
            .select(
                F.concat(F.lit("fact-"), F.md5("fact_text")).alias("hash_id"), "n_chunks"
            )
        )

    @staticmethod
    def _chunk_count_delta(ex: DataFrame) -> DataFrame:
        from .keys import entity_key

        return (
            ex.select("chunk_id", F.explode("entities").alias("phrase"))
            .select("chunk_id", entity_key("phrase").alias("entity_name"))
            .groupBy("entity_name")
            .agg(F.countDistinct("chunk_id").alias("num_chunks"))
        )

    def _old_synonymy_keys(self, s) -> DataFrame:
        """The current synonymy edge set lifted back to key space
        ``(src, dst, weight)`` — vertex names ARE the store hash_ids."""
        vmap = s.verts.select("id", "name")
        return (
            s.edges.filter(F.col("etype") == "synonymy")
            .join(vmap.select(F.col("id").alias("src"), F.col("name").alias("sk")), "src")
            .join(vmap.select(F.col("id").alias("dst"), F.col("name").alias("dk")), "dst")
            .select(F.col("sk").alias("src"), F.col("dk").alias("dst"), "weight")
        )

    def _merge_synonymy(self, s, entity_store: DataFrame, ent_delta: DataFrame) -> DataFrame:
        """Delta-only synonymy update for index(): key-space edge set equal
        (up to matmul ulps) to a from-scratch self-KNN over ``entity_store``.

        The reference re-queries only the NEW nodes against all entities
        (``HippoRAG.py:821-830`` — query_node_keys = newly added). For
        merge ≡ rebuild we additionally patch the reverse direction: an old
        query's global top-k over (old ∪ new) items is the re-ranked union
        of its existing top-k (over old items) and its top-k over the new
        items alone — both unions are exact because any global top-k member
        is in its subset's top-k, and score ≥ 0.8 filtering commutes with
        top-k (scores ≥ threshold always outrank scores below it). Cost:
        two KNNs of shape |delta| × |all| — never old × old again.
        """
        from .retrieval.knn import rerank_synonymy, synonymy_candidates

        blocks = self.num_blocks or 8
        old_syn = self._old_synonymy_keys(s)
        # old qualified queries vs ONLY the new items (delta-sized item set)
        patch = synonymy_candidates(s.entity_store, ent_delta, num_blocks=blocks)
        # new qualified queries vs ALL items — these lists are already global
        fresh = synonymy_candidates(ent_delta, entity_store, num_blocks=blocks)
        return rerank_synonymy(old_syn.unionByName(patch).unionByName(fresh))

    def _subtract_synonymy(self, s, entity_store: DataFrame) -> DataFrame:
        """Delta-only synonymy update for delete(): ``entity_store`` is the
        surviving store. Queries that cascade out drop with their edges; a
        surviving query's list changes only if a DELETED item occupied one
        of its slots (removing non-members can't alter a top-k), so exactly
        those queries are re-run against the surviving items."""
        from .retrieval.knn import rerank_synonymy, synonymy_candidates

        blocks = self.num_blocks or 8
        deleted = s.entity_store.join(
            entity_store.select("hash_id"), "hash_id", "left_anti"
        ).select("hash_id")
        old_syn = self._old_synonymy_keys(s)
        surviving_syn = old_syn.join(
            deleted.select(F.col("hash_id").alias("src")), "src", "left_anti"
        )
        affected = (
            surviving_syn.join(
                deleted.select(F.col("hash_id").alias("dst")), "dst", "left_semi"
            )
            .select("src")
            .distinct()
        )
        unaffected = surviving_syn.join(affected, "src", "left_anti")
        requery = entity_store.join(
            affected.select(F.col("src").alias("hash_id")), "hash_id", "left_semi"
        )
        recomputed = synonymy_candidates(requery, entity_store, num_blocks=blocks)
        return rerank_synonymy(unaffected.unionByName(recomputed))

    def _swap_state(self, **tables) -> GraphState:
        """Install a new GraphState: count, invalidate the compiled block
        graph, release the previous state's cached tables."""
        old = self.state
        new = GraphState(
            n_vertices=tables["verts"].count(),
            n_edges=tables["adj"].count(),
            **tables,
        )
        if self._block_graph is not None:  # new graph → stale blocks
            self._block_graph.unpersist()
            self._block_graph = None
        self._drop_graph_coo()  # new graph → stale broadcast COO
        if old is not None:
            old.unpersist()
        self.state = new
        return new

    def _build_state(self, extraction: DataFrame) -> GraphState:
        """Full build from an extraction table (initial index, or the
        synonymy-enabled rebuild path)."""
        # eager truncation: rebuilds chain extraction through unions /
        # anti-joins — without this each rebuild re-analyzes the whole
        # chain in every downstream action
        extraction = extraction.localCheckpoint(eager=True)
        ents = extraction.select(F.explode("entities").alias("content")).distinct()
        entity_store = embedding_store(ents, "content", ENTITY_PREFIX).persist()
        chunk_store = embedding_store(
            extraction.select("passage"), "passage", CHUNK_PREFIX
        ).persist()
        fact_store = embedding_store(
            self._fact_text_df(extraction), "fact_text", "fact-"
        ).persist()

        staged = fact_edges(extraction).unionByName(passage_edges(extraction))
        if self.enable_synonymy:
            staged = staged.unionByName(
                synonymy_edges(entity_store, num_blocks=self.num_blocks or 8)
            )
        verts = vertices(extraction).persist()
        edges = resolve_edges(staged, verts).persist()
        adj = adjacency(edges).persist()
        st = strength(adj).persist()

        # entity → #chunks inverted index (only the cardinality is used:
        # HippoRAG.py:1463-1464 / SURVEY.md §1.3)
        chunk_counts = self._chunk_count_delta(extraction).persist()
        fact_counts = self._fact_counts(extraction).persist()
        return self._swap_state(
            extraction=extraction,
            verts=verts,
            edges=edges,
            adj=adj,
            strength=st,
            chunk_store=chunk_store,
            entity_store=entity_store,
            fact_store=fact_store,
            chunk_counts=chunk_counts,
            fact_counts=fact_counts,
        )

    def _merge_state(self, new_ex: DataFrame) -> GraphState:
        """Incremental index: merge ONLY the new chunks' contributions.

        Every exploded/derived input below is delta-sized; the existing
        aggregated tables enter exactly once each, as one side of a keyed
        sum/append (``HippoRAG.py:1022-1086`` add_new_nodes/add_new_edges).
        ``localCheckpoint(eager=True)`` truncates lineage so repeated
        increments keep O(1) plans.
        """
        from .keys import entity_key

        s = self.state
        ck = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
        extraction = ck(s.extraction.unionByName(new_ex))

        # stores: append rows not already present (anti-join by hash key —
        # embedding_store.py:63-90 upsert semantics)
        new_ents = new_ex.select(F.explode("entities").alias("content")).distinct()
        ent_delta = embedding_store(new_ents, "content", ENTITY_PREFIX).join(
            s.entity_store.select("hash_id"), "hash_id", "left_anti"
        )
        entity_store = ck(s.entity_store.unionByName(ent_delta))
        # new chunks are new by construction (anti-joined on chunk_id)
        chunk_store = ck(
            s.chunk_store.unionByName(
                embedding_store(new_ex.select("passage"), "passage", CHUNK_PREFIX)
            )
        )
        fact_delta = embedding_store(
            self._fact_text_df(new_ex), "fact_text", "fact-"
        ).join(s.fact_store.select("hash_id"), "hash_id", "left_anti")
        fact_store = ck(s.fact_store.unionByName(fact_delta))

        # vertices: unseen names minted APPEND-ONLY past the current id max
        ents_v = new_ents.select(
            entity_key("content").alias("name"),
            F.lit("entity").alias("ntype"),
            "content",
        )
        chunks_v = new_ex.select(
            F.col("chunk_id").alias("name"),
            F.lit("passage").alias("ntype"),
            F.col("passage").alias("content"),
        )
        new_names = (
            ents_v.unionByName(chunks_v)
            .dropDuplicates(["name"])
            .join(s.verts.select("name"), "name", "left_anti")
        )
        new_verts = assign_dense_ids(new_names, "name", start=s.n_vertices)
        verts = ck(s.verts.unionByName(new_verts))

        # edge/strength/refcount deltas, merged by keyed sums
        staged = fact_edges(new_ex).unionByName(passage_edges(new_ex))
        resolved = resolve_edges(staged, verts)
        base_edges = (
            s.edges.filter(F.col("etype") != "synonymy")
            if self.enable_synonymy
            else s.edges
        )
        merged_edges = (
            base_edges.unionByName(resolved)
            .groupBy("src", "dst", "etype")
            .agg(F.sum("weight").alias("weight"))
        )
        if self.enable_synonymy:
            # synonymy edges are top-k lists, not additive counts: the delta
            # update replaces the edge set wholesale (still delta-only KNN
            # work), and adj/strength re-aggregate from the final edges —
            # the same one-shuffle cost class as the keyed-sum merge, without
            # float-cancellation on cosine weights
            syn = resolve_edges(self._merge_synonymy(s, entity_store, ent_delta), verts)
            edges = ck(merged_edges.unionByName(syn))
            adj = ck(adjacency(edges))
            st = ck(strength(adj))
        else:
            edges = ck(merged_edges)
            adj_delta = adjacency(resolved)
            adj = ck(
                s.adj.unionByName(adj_delta)
                .groupBy("src", "dst")
                .agg(F.sum("weight").alias("weight"))
            )
            st = ck(
                s.strength.unionByName(strength(adj_delta))
                .groupBy("id")
                .agg(F.sum("strength").alias("strength"))
            )
        chunk_counts = ck(
            s.chunk_counts.unionByName(self._chunk_count_delta(new_ex))
            .groupBy("entity_name")
            .agg(F.sum("num_chunks").alias("num_chunks"))
        )
        fact_counts = ck(
            s.fact_counts.unionByName(self._fact_counts(new_ex))
            .groupBy("hash_id")
            .agg(F.sum("n_chunks").alias("n_chunks"))
        )
        return self._swap_state(
            extraction=extraction,
            verts=verts,
            edges=edges,
            adj=adj,
            strength=st,
            chunk_store=chunk_store,
            entity_store=entity_store,
            fact_store=fact_store,
            chunk_counts=chunk_counts,
            fact_counts=fact_counts,
        )

    def _subtract_state(self, doomed_ex: DataFrame) -> GraphState:
        """Incremental delete: subtract the doomed chunks' contributions.

        All weights are integer-valued sums of +1.0 contributions (fact
        co-occurrence counts / passage-edge units), so subtraction is exact
        and "refcount reached zero" is an exact ``weight > 0`` filter.
        Entities/facts cascade out via their chunk refcounts
        (``HippoRAG.py:280-361``).
        """
        s = self.state
        ck = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
        doomed_ids = doomed_ex.select("chunk_id")
        extraction = ck(s.extraction.join(doomed_ids, "chunk_id", "left_anti"))

        # refcounts first — they decide which entities/facts survive
        neg_cc = self._chunk_count_delta(doomed_ex).withColumn(
            "num_chunks", -F.col("num_chunks")
        )
        chunk_counts = ck(
            s.chunk_counts.unionByName(neg_cc)
            .groupBy("entity_name")
            .agg(F.sum("num_chunks").alias("num_chunks"))
            .filter(F.col("num_chunks") > 0)
        )
        neg_fc = self._fact_counts(doomed_ex).withColumn("n_chunks", -F.col("n_chunks"))
        fact_counts = ck(
            s.fact_counts.unionByName(neg_fc)
            .groupBy("hash_id")
            .agg(F.sum("n_chunks").alias("n_chunks"))
            .filter(F.col("n_chunks") > 0)
        )

        # stores: chunks drop by id; entities/facts drop when unreferenced
        chunk_store = ck(
            s.chunk_store.join(
                doomed_ids.select(F.col("chunk_id").alias("hash_id")), "hash_id", "left_anti"
            )
        )
        entity_store = ck(
            s.entity_store.join(
                chunk_counts.select(F.col("entity_name").alias("hash_id")),
                "hash_id",
                "left_semi",
            )
        )
        fact_store = ck(
            s.fact_store.join(fact_counts.select("hash_id"), "hash_id", "left_semi")
        )

        # vertices: doomed passages out; entities survive iff refcount > 0
        # (ids are stable — survivors keep theirs; the id space gains holes,
        # which every engine tolerates: ranks/CSR key by id value, not rank)
        verts_pass = s.verts.filter(F.col("ntype") == "passage").join(
            doomed_ids.select(F.col("chunk_id").alias("name")), "name", "left_anti"
        )
        verts_ent = s.verts.filter(F.col("ntype") == "entity").join(
            chunk_counts.select(F.col("entity_name").alias("name")), "name", "left_semi"
        )
        verts = ck(verts_pass.unionByName(verts_ent))

        # subtract the doomed edge contributions (delta-sized)
        staged = fact_edges(doomed_ex).unionByName(passage_edges(doomed_ex))
        resolved = resolve_edges(staged, s.verts)
        base_edges = (
            s.edges.filter(F.col("etype") != "synonymy")
            if self.enable_synonymy
            else s.edges
        )
        subtracted = (
            base_edges.unionByName(resolved.withColumn("weight", -F.col("weight")))
            .groupBy("src", "dst", "etype")
            .agg(F.sum("weight").alias("weight"))
            .filter(F.col("weight") > 0)
        )
        if self.enable_synonymy:
            # replace the synonymy edge set (delete cascade may drop
            # entities out of surviving queries' top-k lists); adj/strength
            # re-aggregate from the final edges — see _merge_state
            syn = resolve_edges(self._subtract_synonymy(s, entity_store), verts)
            edges = ck(subtracted.unionByName(syn))
            adj = ck(adjacency(edges))
            st = ck(strength(adj))
            return self._swap_state(
                extraction=extraction,
                verts=verts,
                edges=edges,
                adj=adj,
                strength=st,
                chunk_store=chunk_store,
                entity_store=entity_store,
                fact_store=fact_store,
                chunk_counts=chunk_counts,
                fact_counts=fact_counts,
            )
        edges = ck(subtracted)
        adj_delta = adjacency(resolved)
        adj = ck(
            s.adj.unionByName(adj_delta.withColumn("weight", -F.col("weight")))
            .groupBy("src", "dst")
            .agg(F.sum("weight").alias("weight"))
            .filter(F.col("weight") > 0)
        )
        neg_st = strength(adj_delta).withColumn("strength", -F.col("strength"))
        st = ck(
            s.strength.unionByName(neg_st)
            .groupBy("id")
            .agg(F.sum("strength").alias("strength"))
            .filter(F.col("strength") > 0)
        )
        return self._swap_state(
            extraction=extraction,
            verts=verts,
            edges=edges,
            adj=adj,
            strength=st,
            chunk_store=chunk_store,
            entity_store=entity_store,
            fact_store=fact_store,
            chunk_counts=chunk_counts,
            fact_counts=fact_counts,
        )

    # ---------------- retrieve ----------------

    def fact_table(self) -> DataFrame:
        """(hash_id, subj_key, obj_key) for reset building."""
        from .keys import entity_key

        s = self.state
        facts = (
            s.extraction.select(F.explode("triples").alias("t"))
            .select(
                F.to_json(F.struct(F.col("t.s"), F.col("t.p"), F.col("t.o"))).alias("fact_text"),
                entity_key(F.col("t.s")).alias("subj_key"),
                entity_key(F.col("t.o")).alias("obj_key"),
            )
            .dropDuplicates(["fact_text"])
        )
        return facts.select(
            F.concat(F.lit("fact-"), F.md5("fact_text")).alias("hash_id"),
            "subj_key",
            "obj_key",
        )

    def _query_embeddings(
        self, queries: list[str], instruction: str | None = None
    ) -> list[tuple[str, list[float]]]:
        from .retrieval.embeddings import embed_text

        return [(q, embed_text(q, instruction=instruction).tolist()) for q in queries]

    def dpr_retrieve(
        self,
        queries: list[str],
        retrieval_top_k: int = RETRIEVAL_TOP_K,
        dpr_scores: DataFrame | None = None,
        query_ids: set[str] | None = None,
    ) -> DataFrame:
        """Pure DPR ranking → ``(query_id, chunk_id, score, rank)``.

        The StandardRAG baseline (``StandardRAG.py:37-429``) and the
        zero-fact fallback of :meth:`retrieve` (``HippoRAG.py:417-419``).
        ``dpr_scores`` / ``query_ids`` let retrieve() reuse its already-
        scored chunk table for just the factless queries.
        """
        from pyspark.sql import Window

        from .retrieval.embeddings import QUERY_TO_PASSAGE

        s = self.state
        assert s is not None, "index() first"
        if dpr_scores is None:
            dpr_scores = score_store(
                s.chunk_store, self._query_embeddings(queries, QUERY_TO_PASSAGE)
            )
        if query_ids is not None:
            dpr_scores = dpr_scores.filter(F.col("query_id").isin(list(query_ids)))
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("hash_id"))
        return (
            dpr_scores.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= retrieval_top_k)
            .select("query_id", F.col("hash_id").alias("chunk_id"), "score", "rank")
        )

    def retrieve(
        self,
        queries: list[str],
        link_top_k: int = LINK_TOP_K,
        retrieval_top_k: int = RETRIEVAL_TOP_K,
        damping: float = 0.5,
        checkpoint_dir: str | None = None,
        engine: str = "auto",
        rerank_filter=None,
    ) -> DataFrame:
        """Multi-query PPR retrieval → ``(query_id, chunk_id, score, rank)``.

        Queries are embedded driver-side (same deterministic encoder as the
        stores), scored against fact + passage stores in one batched pass;
        the top facts pass through the pluggable recognition-memory rerank
        (``HippoRAG.py:1522-1570``); queries left with ZERO facts fall back
        to pure DPR ranking exactly like the reference
        (``HippoRAG.py:417-419``). Fact-bearing queries run batched PPR:
        the broadcast-graph engine when the graph fits executor memory (the
        HippoRAG retrieval regime), else the packed block engine over the
        BlockGraph compiled once per GraphState (never per retrieve).
        """
        from .algo.ppr import personalized_pagerank_batch
        from .retrieval.rerank import rerank_facts

        from .retrieval.embeddings import QUERY_TO_FACT, QUERY_TO_PASSAGE

        s = self.state
        assert s is not None, "index() first"
        # dual query embeddings: fact scoring and DPR use DIFFERENT task
        # instructions (HippoRAG.py:1254-1288, prompts/linking.py:1-10)
        fact_scores = score_store(
            s.fact_store, self._query_embeddings(queries, QUERY_TO_FACT)
        )
        tf = top_facts(fact_scores, link_top_k)
        if rerank_filter is not None:
            tf = rerank_facts(tf, rerank_filter)
        dpr = score_store(
            s.chunk_store, self._query_embeddings(queries, QUERY_TO_PASSAGE)
        ).persist()
        # ≤ Q rows: which queries still have facts after rerank
        with_facts = {r["query_id"] for r in tf.select("query_id").distinct().collect()}
        factless = {q for q in queries if q not in with_facts}

        graph_out = None
        if with_facts:
            pw = phrase_weights(tf, self.fact_table(), s.chunk_counts, link_top_k)
            resets = build_reset(pw, passage_weights(dpr), s.verts)
            if factless:
                resets = resets.filter(~F.col("query_id").isin(list(factless)))
            resets = resets.persist()
            if engine == "auto":
                # graph COO fits comfortably in executor/driver memory → the
                # query-partitioned broadcast engine; beyond that, packed blocks
                engine = (
                    "broadcast"
                    if s.n_edges <= BROADCAST_EDGE_LIMIT and checkpoint_dir is None
                    else "csr"
                )
            ranks, _ = personalized_pagerank_batch(
                self.spark,
                s.adj,
                s.strength,
                s.verts.select("id"),
                reset_df=resets,
                n_vertices=s.n_vertices,
                damping=damping,
                graph=self.block_graph() if engine == "csr" else None,
                graph_coo=self.graph_coo() if engine == "broadcast" else None,
                checkpoint_dir=checkpoint_dir,
                run_id=None,
                engine=engine,
            )
            graph_out = rank_docs(ranks, s.verts, retrieval_top_k)
            resets.unpersist()
        if factless:
            dpr_out = self.dpr_retrieve(
                queries, retrieval_top_k, dpr_scores=dpr, query_ids=factless
            )
            out = graph_out.unionByName(dpr_out) if graph_out is not None else dpr_out
        else:
            out = graph_out
        dpr.unpersist()
        return out

    # ---------------- rag_qa ----------------

    def rag_qa(
        self,
        questions: list[str],
        llm=None,
        qa_top_k: int | None = None,
        retrieval_top_k: int = RETRIEVAL_TOP_K,
        gold_answers: list[list[str]] | None = None,
        retriever: str = "graph",
        rerank_filter=None,
    ) -> DataFrame:
        """End-to-end retrieve → read → (optional) evaluate, mirroring
        ``HippoRAG.py:451-523``. ``retriever="dpr"`` is the StandardRAG
        baseline (``StandardRAG.py:37-429``) — same QA stage, pure-DPR
        ranking.

        Returns ``(query_id, answer[, em, f1])`` — one row per question;
        with ``gold_answers`` the EM / token-F1 columns are per-query scores
        (``qa_eval.py:19-95``).
        """
        from .ops.evaluation import exact_match, token_f1
        from .retrieval.qa import QA_TOP_K, assemble_prompts, qa_read

        s = self.state
        assert s is not None, "index() first"
        k = qa_top_k or QA_TOP_K
        if retriever == "dpr":
            retrieved = self.dpr_retrieve(questions, retrieval_top_k)
        else:
            retrieved = self.retrieve(
                questions, retrieval_top_k=retrieval_top_k, rerank_filter=rerank_filter
            )
        passages = s.chunk_store.select(
            F.col("hash_id").alias("chunk_id"), F.col("content").alias("passage")
        )
        qdf = self.spark.createDataFrame(
            [(q, q) for q in questions], "query_id string, question string"
        )
        prompts = assemble_prompts(retrieved, passages, qdf, qa_top_k=k)
        answers = qa_read(prompts, llm)
        if gold_answers is None:
            return answers
        gold = self.spark.createDataFrame(
            list(zip(questions, gold_answers)),
            "query_id string, gold_answers array<string>",
        )
        joined = answers.join(gold, "query_id")
        return (
            answers.join(exact_match(joined), "query_id")
            .join(token_f1(joined), "query_id")
            .select("query_id", "answer", "em", "f1")
        )
