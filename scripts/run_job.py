#!/usr/bin/env python
"""Cluster job entrypoint — the ``spark-submit --py-files`` surface.

Package the library and submit (multi-executor cluster or local):

    cd /root/repo && zip -r /tmp/hipporag_spark.zip hipporag_spark
    spark-submit --py-files /tmp/hipporag_spark.zip scripts/run_job.py \
        --algorithm ppr --input /path/to/repo_files_parquet \
        --checkpoint-dir /path/to/ck --run-id prod1 --output /path/out

Omitting ``--input`` synthesizes a deterministic repo_files table of
``--n-files`` rows (the test fixture generator). The job builds the graph,
runs the chosen algorithm with per-superstep checkpointing, and writes the
result vector + a lineage JSON. Re-submitting with the same
``--checkpoint-dir``/``--run-id`` resumes from the last completed
superstep.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--algorithm", choices=["ppr", "cc", "lp", "tc"], default="ppr")
    p.add_argument("--input", default=None, help="parquet path of (repo,path,commit,lang,content)")
    p.add_argument("--n-files", type=int, default=10000)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--run-id", default=None)
    p.add_argument("--output", default=None)
    p.add_argument("--damping", type=float, default=0.5)
    p.add_argument("--reset-top-entities", type=int, default=5)
    p.add_argument(
        "--max-iter", type=int, default=100,
        help="superstep budget; with --checkpoint-dir a budget-exhausted "
        "run leaves resumable checkpoints (kill/resume drills)",
    )
    args = p.parse_args()

    spark = SparkSession.builder.appName(f"hipporag_spark_{args.algorithm}").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from hipporag_spark.extract import extract
    from hipporag_spark.graph.build import build_graph, strength
    from hipporag_spark.synth import repo_files

    files = spark.read.parquet(args.input) if args.input else repo_files(spark, args.n_files)
    ex = extract(files).persist()
    verts, edges, adj = build_graph(ex)
    st = strength(adj).persist()
    vids = verts.select("id")
    n = verts.count()

    lineage = []
    if args.algorithm == "ppr":
        from hipporag_spark.algo.ppr import personalized_pagerank

        ids = [
            r["id"]
            for r in verts.filter(F.col("ntype") == "entity")
            .orderBy("id").limit(args.reset_top_entities).collect()
        ]
        reset = spark.createDataFrame([(int(i), 1.0) for i in ids], "id long, weight double")
        result, lineage = personalized_pagerank(
            spark, adj, st, vids, n_vertices=n, reset_df=reset, damping=args.damping,
            max_iter=args.max_iter,
            checkpoint_dir=args.checkpoint_dir, run_id=args.run_id,
        )
    elif args.algorithm == "cc":
        from hipporag_spark.algo.components import connected_components

        result, lineage = connected_components(
            spark, adj, vids, max_iter=args.max_iter,
            checkpoint_dir=args.checkpoint_dir, run_id=args.run_id,
        )
    elif args.algorithm == "lp":
        from hipporag_spark.algo.labelprop import label_propagation

        result, lineage = label_propagation(
            spark, adj, vids, checkpoint_dir=args.checkpoint_dir, run_id=args.run_id
        )
    else:
        from hipporag_spark.algo.triangles import triangle_count

        result, total = triangle_count(adj)
        lineage = [{"triangles_total": total}]

    if args.output:
        result.write.mode("overwrite").parquet(os.path.join(args.output, "result"))
        with open(os.path.join(args.output, "lineage.json"), "w") as f:
            json.dump(lineage, f, indent=1)
    else:
        result.show(10)
    print(json.dumps({"algorithm": args.algorithm, "n_vertices": n, "supersteps": len(lineage)}))


if __name__ == "__main__":
    main()
