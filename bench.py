#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Headline jobs (all inputs/block counts are DATA-derived and pinned, never
functions of the core count, so two parallelism levels run identical
physical plans — the precondition for scaling comparisons):

- ``graph_build``: synthetic repo_files (deterministic, size scaled to the
  SF dir) → extraction → vertex/edge/adjacency tables (counts forced).
- ``ppr``: single-query Personalized PageRank to L1 < 1e-6 (packed block
  engine — the distributed superstep/checkpoint machinery); reports
  supersteps, supersteps/min, edges/sec (the BASELINE.json metric).
- ``ppr_batch``: 32 queries via the broadcast-graph engine (the engine
  `retrieve()` picks in this graph-fits-memory regime).
- ``ppr_batch_blocked``: the same 32 queries through the packed block
  (shuffle) engine — the beyond-memory scale path, tracked separately.
- ``connected_components`` / ``label_propagation`` / ``triangle_count``.
- pipeline ops at $SPARK_GRAFT_SF_DIR: minhash LSH pairs, simhash,
  token stats, blocked-cogroup KNN over the embeddings table.

Timing discipline (round-2 finding: a hypervisor-steal window inflated two
queries 4-7x in the official record): every query runs
SPARK_GRAFT_BENCH_TRIALS times (default 2); the headline number is the MIN
wall, and the JSON carries per-trial walls plus per-trial steal%% from
/proc/stat so a noisy record is visibly noisy. Same rigor as
scripts/scaling_bench.py.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_FILES (default scales
with SF: 10000 at sf0.1), SPARK_GRAFT_BENCH_QUERIES (default 32),
SPARK_GRAFT_BENCH_TRIALS (default 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from hipporag_spark.session import get_spark


def _cpu_ticks() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat (see scripts/ppr_scale_worker)."""
    f = open("/proc/stat").readline().split()
    vals = [int(x) for x in f[1:9]]
    return vals[7], sum(vals)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1
    n_files = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", str(max(1000, int(100_000 * sf)))))
    n_trials = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "2")))

    spark = get_spark(parallelism=cpus, app_name="hipporag_spark_bench")
    timings: dict[str, float] = {}
    trial_walls: dict[str, list] = {}
    trial_steal: dict[str, list] = {}
    extras: dict[str, float] = {}

    def bench(name, fn, trials=n_trials):
        """min-of-trials with per-trial steal%%; returns the last trial's
        result (all benched jobs are deterministic re-runs)."""
        result = None
        walls, steals = [], []
        for _ in range(trials):
            s0, c0 = _cpu_ticks()
            t0 = time.time()
            result = fn()
            walls.append(round(time.time() - t0, 3))
            s1, c1 = _cpu_ticks()
            steals.append(round(100 * (s1 - s0) / max(1, c1 - c0), 1))
        timings[name] = min(walls)
        trial_walls[name] = walls
        trial_steal[name] = steals
        return result

    # ---- graph build over the synthetic repo table ----
    from hipporag_spark.extract import extract
    from hipporag_spark.graph.build import build_graph, strength
    from hipporag_spark.synth import repo_files

    built = {}

    def run_graph_build():
        # drop the previous trial's cached frames so each trial pays the
        # full cold build (and doesn't stack persisted copies)
        if built:
            built["ex"].unpersist()
            built["st"].unpersist()
        files = repo_files(spark, n_files)
        ex = extract(files).persist()
        verts, edges, adj = build_graph(ex)
        st = strength(adj).persist()
        built.update(
            ex=ex, verts=verts, edges=edges, adj=adj, st=st,
            n_vertices=verts.count(), n_edges=adj.count(),
        )
        return built

    built = bench("graph_build", run_graph_build)
    verts, adj, st = built["verts"], built["adj"], built["st"]
    n_vertices, n_edges = built["n_vertices"], built["n_edges"]
    extras["n_vertices"] = n_vertices
    extras["n_adj_rows"] = n_edges
    extras["n_files"] = n_files

    # ---- PPR (the centerpiece) ----
    from hipporag_spark.algo.ppr import (
        personalized_pagerank,
        personalized_pagerank_batch,
    )
    from hipporag_spark.graph.blocked import compile_blocks, default_num_blocks

    blocks = default_num_blocks(n_edges)
    extras["ppr_num_blocks"] = blocks

    compiled = {}

    def run_compile():
        if compiled:
            compiled["bg"].unpersist()
        compiled["bg"] = compile_blocks(adj, st, verts.select("id"), blocks)
        return compiled["bg"]

    bg = bench("ppr_compile_blocks", run_compile)
    ids = [r["id"] for r in verts.filter(F.col("ntype") == "entity").orderBy("id").limit(5).collect()]
    reset = spark.createDataFrame([(int(i), 1.0) for i in ids], "id long, weight double")

    def run_ppr():
        ranks, lineage = personalized_pagerank(
            spark, adj, st, verts.select("id"), n_vertices=n_vertices,
            reset_df=reset, damping=0.5, engine="csr", graph=bg,
        )
        ranks.count()
        return lineage

    lineage = bench("ppr", run_ppr)
    steps = len(lineage)
    extras["ppr_supersteps"] = steps
    extras["ppr_supersteps_per_min"] = round(steps / (timings["ppr"] / 60.0), 2)
    extras["ppr_edges_per_sec"] = round(steps * n_edges / timings["ppr"], 1)
    extras["ppr_converged"] = bool(lineage and lineage[-1]["converged"])

    # batched multi-source PPR: Q PINNED queries (never a function of cpus)
    n_queries = int(os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "32"))
    ent_ids = [
        r["id"]
        for r in verts.filter(F.col("ntype") == "entity").orderBy("id").limit(n_queries).collect()
    ]
    breset = spark.createDataFrame(
        [(f"q{j:03d}", int(i), 1.0) for j, i in enumerate(ent_ids)],
        "query_id string, id long, weight double",
    )
    extras["ppr_batch_queries"] = len(ent_ids)

    # broadcast-graph engine: the retrieval-regime engine (graph fits memory)
    def run_batch_broadcast():
        branks, blineage = personalized_pagerank_batch(
            spark, adj, st, verts.select("id"), breset,
            n_vertices=n_vertices, damping=0.5, engine="broadcast",
        )
        branks.count()
        return blineage

    blineage = bench("ppr_batch", run_batch_broadcast)
    b_iters = blineage[0].get("total_iterations", 0)
    extras["ppr_batch_engine"] = "broadcast"
    extras["ppr_batch_total_iterations"] = b_iters
    extras["ppr_batch_query_edges_per_sec"] = round(
        b_iters * n_edges / timings["ppr_batch"], 1
    )

    # packed block (shuffle) engine on the same queries: the beyond-memory path
    def run_batch_blocked():
        branks2, blineage2 = personalized_pagerank_batch(
            spark, adj, st, verts.select("id"), breset,
            n_vertices=n_vertices, damping=0.5, graph=bg, engine="csr",
        )
        branks2.count()
        return blineage2

    blineage2 = bench("ppr_batch_blocked", run_batch_blocked)
    bsteps = len(blineage2)
    extras["ppr_batch_blocked_supersteps"] = bsteps
    extras["ppr_batch_blocked_query_edges_per_sec"] = round(
        bsteps * n_edges * len(ent_ids) / timings["ppr_batch_blocked"], 1
    )

    # ---- other algorithms on the same graph ----
    from hipporag_spark.algo.components import connected_components
    from hipporag_spark.algo.labelprop import label_propagation
    from hipporag_spark.algo.triangles import triangle_count

    def run_cc():
        comp, cc_lin = connected_components(spark, adj, verts.select("id"), num_blocks=blocks)
        comp.count()
        return cc_lin

    cc_lin = bench("connected_components", run_cc)
    extras["cc_supersteps"] = len(cc_lin)

    def run_lp():
        labels, _ = label_propagation(spark, adj, verts.select("id"), max_iter=5, num_blocks=blocks)
        labels.count()

    bench("label_propagation", run_lp)

    total_tri = bench("triangle_count", lambda: triangle_count(adj)[1])
    extras["triangles"] = total_tri

    from hipporag_spark.algo.sssp import shortest_paths

    def run_sssp():
        srcs = verts.select("id").orderBy("id").limit(4)
        dist, sp_lin = shortest_paths(spark, adj, srcs, num_blocks=blocks)
        dist.count()
        return sp_lin

    sp_lin = bench("shortest_paths", run_sssp)
    extras["sssp_supersteps"] = len(sp_lin)

    from hipporag_spark.algo.kcore import k_core

    def run_kcore():
        core, kc_lin = k_core(spark, adj, verts.select("id"), k=3, num_blocks=blocks)
        core.count()
        return kc_lin

    kc_lin = bench("k_core", run_kcore)
    extras["kcore_peel_rounds"] = len(kc_lin)

    from hipporag_spark.algo.linkpred import link_prediction_scores

    def run_linkpred():
        # hub cap bounds wedge work on the synthetic repo graph's hot files;
        # top_k bounds the output (the realistic recommendation shape)
        return link_prediction_scores(adj, max_center_degree=256, top_k=10).count()

    extras["linkpred_rows"] = bench("link_prediction", run_linkpred)

    from hipporag_spark.algo.hits import hits as hits_algo

    def run_hits():
        scores, h_lin = hits_algo(
            spark, built["edges"], verts.select("id"), max_iter=10, tol=1e-8,
            num_blocks=blocks,
        )
        scores.count()
        return h_lin

    h_lin = bench("hits", run_hits)
    extras["hits_supersteps"] = len(h_lin)

    from hipporag_spark.algo.katz import katz_centrality

    # α data-derived (0.5 / max weighted in-strength ≤ 0.5/λ_max): always
    # contracting, any input — same rule as the driver-gate katz_words
    katz_alpha = 0.5 / (
        built["edges"].groupBy("dst").agg(F.sum("weight").alias("ws"))
        .agg(F.max("ws")).collect()[0][0]
    )

    def run_katz():
        scores, k_lin = katz_centrality(
            spark, built["edges"], verts.select("id"), alpha=katz_alpha, beta=1.0,
            max_iter=10, tol=1e-8, num_blocks=blocks,
        )
        scores.count()
        return k_lin

    k_lin = bench("katz", run_katz)
    extras["katz_supersteps"] = len(k_lin)

    from hipporag_spark.algo.mis import maximal_independent_set

    def run_mis():
        mis, m_lin = maximal_independent_set(
            spark, adj, verts.select("id"), num_blocks=blocks
        )
        extras["mis_size"] = mis.count()
        return m_lin

    m_lin = bench("mis", run_mis)
    extras["mis_rounds"] = len(m_lin)

    from hipporag_spark.algo.betweenness import seeded_betweenness

    def run_betweenness():
        # 4 deterministic pivots — the Brandes–Pich sampled estimator
        seeds = [r["id"] for r in verts.select("id").orderBy("id").limit(4).collect()]
        bc, b_lin = seeded_betweenness(spark, adj, seeds, num_blocks=blocks)
        extras["betweenness_rows"] = bc.count()
        return b_lin

    b_lin = bench("betweenness_4seed", run_betweenness)
    extras["betweenness_bfs_supersteps"] = sum(l["bfs_supersteps"] for l in b_lin)

    from hipporag_spark.algo.truss import k_truss

    def run_ktruss():
        truss, t_lin = k_truss(spark, built["edges"], k=4, num_blocks=blocks)
        extras["ktruss_edges"] = truss.count()
        return t_lin

    t_lin = bench("k_truss", run_ktruss)
    extras["ktruss_peel_rounds"] = len(t_lin)

    from hipporag_spark.algo.triangles import clustering_coefficient

    extras["clustering_coeff_rows"] = bench(
        "clustering_coefficient", lambda: clustering_coefficient(adj).count()
    )

    from hipporag_spark.algo.dag import longest_path_layers

    def run_dag_layers():
        # id-oriented DAG over the repo graph (acyclic by construction):
        # the dependency-layering workload shape
        dag = built["edges"].select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        ).filter(F.col("src") != F.col("dst"))
        layers, d_lin = longest_path_layers(spark, dag, num_blocks=blocks)
        extras["dag_max_layer"] = layers.agg(F.max("layer")).collect()[0][0]
        return d_lin

    d_lin = bench("dag_layers", run_dag_layers)
    extras["dag_supersteps"] = len(d_lin)

    from hipporag_spark.algo.modularity import modularity as modularity_score

    def run_modularity():
        labels, _ = label_propagation(
            spark, adj, verts.select("id"), max_iter=5, num_blocks=blocks
        )
        row = modularity_score(built["edges"].select("src", "dst"), labels).collect()[0]
        extras["lp_modularity"] = round(row["modularity"], 6)
        extras["lp_communities"] = row["n_communities"]

    bench("modularity_lp", run_modularity)

    from hipporag_spark.algo.coreness import coreness as coreness_algo

    def run_coreness():
        core, c_lin = coreness_algo(spark, adj, verts.select("id"), num_blocks=blocks)
        extras["coreness_max"] = core.agg(F.max("coreness")).collect()[0][0]
        return c_lin

    c_lin = bench("coreness", run_coreness)
    extras["coreness_rounds"] = len(c_lin)

    from hipporag_spark.algo.coloring import greedy_coloring

    def run_coloring():
        colors, col_lin = greedy_coloring(
            spark, adj, verts.select("id"), num_blocks=blocks
        )
        extras["coloring_colors"] = colors.agg(
            F.countDistinct("color")
        ).collect()[0][0]
        return col_lin

    col_lin = bench("greedy_coloring", run_coloring)
    extras["coloring_rounds"] = len(col_lin)

    from hipporag_spark.algo.matching import maximal_matching

    def run_matching():
        out, m_lin = maximal_matching(spark, adj)
        extras["matching_edges"] = out.count()
        return m_lin

    m_lin = bench("maximal_matching", run_matching)
    extras["matching_rounds"] = len(m_lin)

    from hipporag_spark.algo.anf import anf, effective_diameter

    def run_anf():
        nf, anf_lin = anf(spark, adj, verts.select("id"), max_h=16, k=32)
        rows = [tuple(r) for r in nf.collect()]
        extras["anf_rounds"] = len(anf_lin)
        extras["anf_effective_diameter"] = round(effective_diameter(rows), 2)
        extras["anf_reach_final"] = round(rows[-1][1], 1)
        return rows

    bench("anf_neighborhood_function", run_anf)

    from hipporag_spark.algo.neighborhood import two_hop_sizes

    def run_two_hop():
        # hub-middle cap: the Σdeg² wedge fanout guard (exact counts for
        # all pairs not routed through a >256-degree middle)
        return two_hop_sizes(adj, max_mid_degree=256).count()

    extras["two_hop_rows"] = bench("two_hop_sizes", run_two_hop)

    from hipporag_spark.algo.mst import minimum_spanning_forest

    def run_msf():
        forest, m_lin = minimum_spanning_forest(
            spark, built["edges"], num_blocks=blocks
        )
        extras["msf_edges"] = forest.count()
        return m_lin

    m2_lin = bench("minimum_spanning_forest", run_msf)
    extras["msf_rounds"] = len(m2_lin)

    from hipporag_spark.graph.build import bipartite_project

    def run_bipartite():
        # passage→entity membership projected to the entity co-mention
        # graph, hub passages capped (the quadratic-fanout guard at scale)
        bip = built["ex"].select(
            F.col("chunk_id").alias("src"), F.explode("entities").alias("dst")
        )
        return bipartite_project(bip, min_weight=2, max_fanout=256).count()

    extras["cooccurrence_pairs"] = bench("bipartite_project", run_bipartite)

    from hipporag_spark.algo.walks import random_walks

    def run_walks():
        # DeepWalk-style corpus: every vertex seeds 2 walks of length 8
        # (the embedding-training sampling shape); xxhash64 = scale mode
        seeds = verts.select(F.col("id").alias("vertex"))
        return random_walks(adj, seeds, length=8, walks_per_seed=2,
                            hash_fn="xxhash64").count()

    extras["walk_corpus_rows"] = bench("random_walks", run_walks)

    from hipporag_spark.algo.ppr_push import ppr_forward_push

    def run_ppr_push():
        seed = verts.select("id").orderBy("id").limit(1).withColumn(
            "weight", F.lit(1.0)
        )
        scores, fp_lin = ppr_forward_push(
            spark, adj, st, seed, damping=0.5, eps=1e-6, num_blocks=blocks
        )
        n_touched = scores.count()
        return fp_lin, n_touched

    fp_lin, fp_touched = bench("ppr_forward_push", run_ppr_push)
    extras["ppr_push_supersteps"] = len(fp_lin)
    extras["ppr_push_touched"] = fp_touched

    # ---- forward-push LOCALITY demonstration (r3 verdict item #5) ----
    # The point of push is touched ≪ V. The repo graph is one near-connected
    # component (touched ≈ 93% of V above), so replicate it into K disjoint
    # shifted copies and seed in copy 0: exact PPR must sweep all K·E edges
    # every superstep, push only ever expands copy 0's neighborhood, so
    # touched/V ≤ 1/K by construction. Both engines run the SAME input.
    K_LOCAL = 50
    pad = n_vertices + 1
    copies = spark.range(K_LOCAL).select(F.col("id").alias("c"))
    adj_multi = (
        adj.crossJoin(F.broadcast(copies))
        .select(
            (F.col("src") + F.col("c") * pad).alias("src"),
            (F.col("dst") + F.col("c") * pad).alias("dst"),
            "weight",
        )
        .persist()
    )
    st_multi = (
        st.crossJoin(F.broadcast(copies))
        .select((F.col("id") + F.col("c") * pad).alias("id"), "strength")
        .persist()
    )
    verts_multi = (
        verts.select("id")
        .crossJoin(F.broadcast(copies))
        .select((F.col("id") + F.col("c") * pad).alias("id"))
        .persist()
    )
    n_vertices_multi = verts_multi.count()
    extras["ppr_push_local_E"] = adj_multi.count()
    st_multi.count()
    seed_local = spark.createDataFrame([(int(ids[0]), 1.0)], "id long, weight double")

    from hipporag_spark.algo.ppr_push import ppr_push_localized

    def run_push_local():
        # the wall-honest local form: entire push inside one applyInPandas
        # kernel per outer round (r4 verdict item #3 — the distributed
        # superstep loop lost to exact despite touching 1.2% of V)
        scores, lin = ppr_push_localized(
            spark, adj_multi, st_multi, seed_local, damping=0.5, eps=1e-6,
        )
        return lin, scores.count()

    pl_lin, pl_touched = bench("ppr_push_local", run_push_local)
    extras["ppr_push_local_supersteps"] = len(pl_lin)
    extras["ppr_push_local_touched"] = pl_touched
    extras["ppr_push_local_V"] = n_vertices_multi
    extras["ppr_push_local_touched_frac"] = round(pl_touched / n_vertices_multi, 4)

    # comparator = the blocked/shuffle EXACT engine: the same execution
    # regime as push at the target scale (the broadcast engine is the
    # graph-fits-in-RAM special case, unavailable at 10^12 edges). Block
    # compile is the one-time index build, timed separately.
    multi_state: dict = {}

    def run_multi_compile():
        if multi_state:
            multi_state["bg"].unpersist()
        multi_state["bg"] = compile_blocks(
            adj_multi, st_multi, verts_multi, default_num_blocks(extras["ppr_push_local_E"])
        )
        return multi_state["bg"]

    bench("ppr_multi_compile_blocks", run_multi_compile)

    def run_exact_local():
        ranks, lin = personalized_pagerank(
            spark, adj_multi, st_multi, verts_multi,
            n_vertices=n_vertices_multi, reset_df=seed_local, damping=0.5,
            engine="csr", graph=multi_state["bg"],
        )
        ranks.count()
        return lin

    bench("ppr_exact_on_multi", run_exact_local)
    multi_state["bg"].unpersist()
    extras["ppr_push_local_speedup_vs_exact"] = round(
        timings["ppr_exact_on_multi"] / max(timings["ppr_push_local"], 1e-9), 2
    )
    adj_multi.unpersist()
    st_multi.unpersist()
    verts_multi.unpersist()

    from hipporag_spark.algo.scc import strongly_connected_components

    def run_scc():
        comp, s_lin = strongly_connected_components(
            spark, built["edges"], verts.select("id"), num_blocks=blocks
        )
        comp.count()
        return s_lin

    s_lin = bench("scc", run_scc)
    extras["scc_outer_rounds"] = max(l["outer"] for l in s_lin) + 1
    extras["scc_supersteps"] = len(s_lin)

    # ---- pipeline ops over the driver testdata ----
    from hipporag_spark import driver_queries as dq

    for name in [
        "minhash_lsh_pairs",
        "simhash",
        "token_stats",
        "sessionize_events",
        "asof_join_events",
        "dedup_clusters",
        "tfidf_top_terms",
        "decontamination",
        "pack_documents_bins",
        "pii_redaction",
    ]:
        bench(name, lambda name=name: dq.all_queries()[name](spark, sf_dir).count())

    # substring-level dup profile in its 100 TB key mode (xxhash64 gram
    # keys — the driver-oracle variant keys on strings for parity)
    from hipporag_spark.ops.dedup import dup_ngram_windows

    docs_df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench(
        "dup_ngram_windows",
        lambda: dup_ngram_windows(docs_df, k=8, hash_grams=True).count(),
    )

    # compute-bound exact KNN: all-pairs blocked cogroup matmul over the
    # embeddings table replicated R× (O((Rn)²·d) FLOPs). Block count from
    # DATA (≈500 items/block) so both parallelism levels run the same plan
    # with enough independent tasks to fill either cluster.
    from hipporag_spark.retrieval.knn import knn

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    R = int(os.environ.get("SPARK_GRAFT_KNN_REPLICATE", "8"))
    reps = spark.range(R).select(F.col("id").alias("rep"))
    items = (
        emb.crossJoin(F.broadcast(reps))
        .select(
            F.concat_ws("_", F.col("vec_id").cast("string"), F.col("rep").cast("string")).alias("key"),
            "embedding",
        )
        .persist()
    )
    n_items = items.count()
    extras["knn_items"] = n_items
    knn_blocks = max(1, n_items // 500)
    extras["knn_blocks"] = knn_blocks
    def run_knn():
        nn = knn(items, items, k=5, num_blocks=knn_blocks, exclude_self=True)
        return nn.count()

    extras["knn_result_rows"] = bench("knn_all_pairs", run_knn)

    # ---- IVF ANN vs brute force: recall + wall (r3 verdict item #6) ----
    # Reuses the R×-replicated embedding table (exact duplicates land in
    # the same inverted list, and both engines share the (score desc,
    # vec_id asc) tie rule, so id-based recall is well-defined). The index
    # is built once (the amortized serving shape) and timed separately;
    # the query pass probes nprobe of num_centroids lists — an 8× candidate
    # cut at these settings.
    from hipporag_spark.ops.similarity import brute_force_topk, ivf_index, ivf_topk

    ivf_items = items.select(F.col("key").alias("vec_id"), "embedding")
    ann_q = (
        emb.orderBy("vec_id")
        .limit(32)
        .select(
            F.concat(F.lit("q"), F.col("vec_id").cast("string")).alias("query_id"),
            "embedding",
        )
    )
    ivf_state: dict = {}

    def run_ivf_build():
        if ivf_state:
            ivf_state["assigned"].unpersist()
        cents, assigned = ivf_index(ivf_items, num_centroids=32, lloyd_iters=2)
        cents = cents.persist()
        assigned = assigned.persist()
        assigned.count()
        ivf_state.update(cents=cents, assigned=assigned)
        return ivf_state

    bench("ivf_index_build", run_ivf_build)

    iv_rows = bench(
        "ann_ivf_topk",
        lambda: ivf_topk(
            ivf_items, ann_q, k=10, nprobe=6,
            index=(ivf_state["cents"], ivf_state["assigned"]),
        ).collect(),
    )
    bf_rows = bench(
        "ann_bruteforce_topk",
        lambda: brute_force_topk(ivf_items, ann_q, k=10).collect(),
    )
    bf_sets: dict[str, set] = {}
    for r in bf_rows:
        bf_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    ivf_hits = sum(1 for r in iv_rows if r["vec_id"] in bf_sets[r["query_id"]])
    extras["ivf_recall_at_10"] = round(ivf_hits / max(1, len(bf_sets) * 10), 4)
    extras["ivf_num_centroids"] = 32
    extras["ivf_nprobe"] = 6
    extras["ivf_speedup_vs_bruteforce"] = round(
        timings["ann_bruteforce_topk"] / max(timings["ann_ivf_topk"], 1e-9), 2
    )

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "trials": n_trials,
        "trial_walls": trial_walls,
        "trial_steal_pct": trial_steal,
        **extras,
    }
    line = json.dumps(result, separators=(",", ":"))
    # r3 finding: the driver's bounded stdout-tail capture (~3 KB)
    # truncated the result JSON mid-line — the full record at sf0.1 is
    # ~4 KB and grows with trial count. Defenses: (1) the full result
    # goes to a dedicated small file the moment it exists; (2) Spark is
    # stopped BEFORE the line is printed so no shutdown chatter can land
    # after it; (3) the PRINTED line drops the per-trial arrays (they
    # live in BENCH_RESULT.json, pointed at by trial_detail) so it stays
    # well under the tail buffer, and is flushed as the very last write.
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_RESULT.json")
    with open(out_path, "w") as fh:
        fh.write(line + "\n")
    slim = {
        k: v for k, v in result.items() if k not in ("trial_walls", "trial_steal_pct")
    }
    slim["trial_detail"] = "BENCH_RESULT.json"
    spark.stop()
    print(json.dumps(slim, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
