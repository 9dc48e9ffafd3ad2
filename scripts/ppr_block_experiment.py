#!/usr/bin/env python
"""Isolate the blocked-engine superstep overhead at bench size.

Builds the bench graph (sf0.1 repo_files analog), compiles blocks once,
then runs the 32-query blocked batch under a matrix of
(shuffle.partitions, AQE) settings in ONE session. Prints one JSON line
per config. Diagnostic only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_files = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", "10000"))
    from hipporag_spark.algo.ppr import personalized_pagerank_batch
    from hipporag_spark.extract import extract
    from hipporag_spark.graph.build import build_graph, strength
    from hipporag_spark.graph.blocked import compile_blocks, default_num_blocks
    from hipporag_spark.session import get_spark
    from hipporag_spark.synth import repo_files

    spark = get_spark(parallelism=cpus, app_name="ppr_block_exp")
    files = repo_files(spark, n_files)
    ex = extract(files).persist()
    verts, edges, adj = build_graph(ex)
    st = strength(adj).persist()
    n_vertices = verts.count()
    n_edges = adj.count()
    P = default_num_blocks(n_edges)
    bg = compile_blocks(adj, st, verts.select("id"), P)

    ids = [
        r["id"]
        for r in verts.filter(F.col("ntype") == "entity").orderBy("id").limit(32).collect()
    ]
    breset = spark.createDataFrame(
        [(f"q{j:03d}", int(i), 1.0) for j, i in enumerate(ids)],
        "query_id string, id long, weight double",
    )

    base = {"cpus": cpus, "V": n_vertices, "E": n_edges, "P": P}
    for sp in (int(spark.conf.get("spark.sql.shuffle.partitions")), max(1, P)):
        for aqe in ("true", "false"):
            spark.conf.set("spark.sql.shuffle.partitions", str(sp))
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            t0 = time.time()
            ranks, lin = personalized_pagerank_batch(
                spark, adj, st, verts.select("id"), breset,
                n_vertices=n_vertices, damping=0.5, graph=bg, engine="csr",
            )
            ranks.count()
            wall = round(time.time() - t0, 2)
            print(json.dumps({
                **base, "sp": sp, "aqe": aqe, "wall_sec": wall,
                "steps": len(lin),
                "step_ms": [round(m["wall_ms"]) for m in lin],
            }), flush=True)


if __name__ == "__main__":
    main()
