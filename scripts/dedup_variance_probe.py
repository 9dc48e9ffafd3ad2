#!/usr/bin/env python
"""Root-cause probe for the dedup_clusters trial variance (VERDICT r3 #4:
3.5s vs 19.4s back-to-back at 0%% steal).

Runs the driver-gate ``dedup_clusters`` query ``PROBE_TRIALS`` times in ONE
session (the bench harness shape) and, per trial, logs:

- wall seconds, /proc/stat steal%%,
- the per-superstep lineage walls of the inner connected-components loop
  (obtained by running the pipeline stages separately),
- stage split: LSH pair gen + Jaccard verify wall vs CC wall,
- JVM heap in use before/after (GC/memory-pressure signature),

so a slow trial can be attributed to a stage (candidate-gen vs CC loop)
and a cause (plan drift vs GC vs host interference).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PROBE_TRIALS
(default 4), SPARK_GRAFT_CPUS (default 32). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _cpu_ticks():
    f = open("/proc/stat").readline().split()
    vals = [int(x) for x in f[1:9]]
    return vals[7], sum(vals)


def _heap_mb(spark) -> int:
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    return int((rt.totalMemory() - rt.freeMemory()) / 1048576)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    trials = int(os.environ.get("PROBE_TRIALS", "4"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from hipporag_spark.algo.components import connected_components
    from hipporag_spark.graph.build import adjacency
    from hipporag_spark.ops.dedup import minhash_lsh_pairs, ngram_jaccard
    from hipporag_spark.session import get_spark

    spark = get_spark(parallelism=cpus, app_name="dedup_variance_probe")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if docs.rdd.getNumPartitions() < cpus:
        docs = docs.repartition(cpus)

    out = {"sf_dir": sf_dir, "cpus": cpus, "trials": []}
    for t in range(trials):
        s0, c0 = _cpu_ticks()
        heap0 = _heap_mb(spark)
        t0 = time.time()
        # exactly the driver-gate q_dedup_clusters shape (all defaults)
        pairs = minhash_lsh_pairs(docs)
        verified = ngram_jaccard(docs, pairs).filter(F.col("jaccard") >= 0.8)
        e = verified.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
        n_pairs = e.count()  # materialize candidate gen separately
        t_pairs = time.time() - t0

        t1 = time.time()
        vids = docs.select(F.col("doc_id").alias("id"))
        comp, lineage = connected_components(spark, adjacency(e), vids, num_blocks=8)
        n_rows = comp.count()
        t_cc = time.time() - t1
        s1, c1 = _cpu_ticks()
        out["trials"].append(
            {
                "trial": t,
                "wall_total": round(t_pairs + t_cc, 2),
                "wall_pairs_verify": round(t_pairs, 2),
                "wall_cc": round(t_cc, 2),
                "verified_pairs": n_pairs,
                "rows": n_rows,
                "cc_supersteps": len(lineage),
                "cc_superstep_walls_ms": [round(l["wall_ms"], 1) for l in lineage],
                "steal_pct": round(100 * (s1 - s0) / max(1, c1 - c0), 2),
                "heap_mb_before": heap0,
                "heap_mb_after": _heap_mb(spark),
            }
        )
        print(json.dumps(out["trials"][-1]), file=sys.stderr, flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
