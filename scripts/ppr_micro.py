#!/usr/bin/env python
"""Quick PPR micro-benchmark for iterating on superstep cost."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from hipporag_spark.session import get_spark
from hipporag_spark.extract import extract
from hipporag_spark.graph.build import build_graph, strength
from hipporag_spark.graph.blocked import compile_blocks, default_num_blocks
from hipporag_spark.synth import repo_files
from hipporag_spark.algo.ppr import personalized_pagerank, personalized_pagerank_batch

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
n_files = int(os.environ.get("N_FILES", "10000"))
nq = int(os.environ.get("N_QUERIES", "32"))
spark = get_spark(parallelism=cpus, app_name="ppr_micro")

t0 = time.time()
files = repo_files(spark, n_files)
ex = extract(files).persist()
verts, edges, adj = build_graph(ex)
st = strength(adj).persist()
n_vertices = verts.count()
n_edges = adj.count()
print(f"build: {time.time()-t0:.1f}s V={n_vertices} E={n_edges}")

blocks = default_num_blocks(n_edges)
t0 = time.time()
bg = compile_blocks(adj, st, verts.select("id"), blocks)
print(f"compile_blocks(P={blocks}): {time.time()-t0:.1f}s")

ids = [r["id"] for r in verts.filter(F.col("ntype") == "entity").orderBy("id").limit(nq).collect()]
reset = spark.createDataFrame([(int(ids[0]), 1.0)], "id long, weight double")

t0 = time.time()
ranks, lineage = personalized_pagerank(
    spark, adj, st, verts.select("id"), n_vertices=n_vertices,
    reset_df=reset, damping=0.5, engine="csr", graph=bg,
)
ranks.count()
dt = time.time() - t0
print(f"ppr csr: {dt:.1f}s steps={len(lineage)} ({dt/len(lineage)*1000:.0f} ms/step) converged={lineage[-1]['converged']}")

breset = spark.createDataFrame(
    [(f"q{j}", int(i), 1.0) for j, i in enumerate(ids)],
    "query_id string, id long, weight double",
)
t0 = time.time()
branks, blin = personalized_pagerank_batch(
    spark, adj, st, verts.select("id"), breset, n_vertices=n_vertices,
    damping=0.5, graph=bg, engine="csr",
)
branks.count()
dt = time.time() - t0
print(f"ppr batch csr ({nq}q): {dt:.1f}s steps={len(blin)} ({dt/len(blin)*1000:.0f} ms/step)")

t0 = time.time()
branks2, blin2 = personalized_pagerank_batch(
    spark, adj, st, verts.select("id"), breset, n_vertices=n_vertices,
    damping=0.5, engine="broadcast",
)
branks2.count()
dt = time.time() - t0
iters = blin2[0]["total_iterations"]
print(f"ppr batch broadcast ({nq}q): {dt:.1f}s total_iters={iters} converged={blin2[0]['converged']}")
