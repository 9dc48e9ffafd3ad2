#!/usr/bin/env python
"""Isolate per-superstep overhead: P, AQE, shuffle partitions."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from hipporag_spark.session import get_spark
from hipporag_spark.graph.blocked import compile_blocks
from hipporag_spark.algo.ppr import personalized_pagerank
from hipporag_spark.graph.build import adjacency, strength

import numpy as np

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
aqe = os.environ.get("AQE", "true")
sp = os.environ.get("SP", str(cpus))
spark = get_spark(parallelism=cpus, app_name="step_overhead", shuffle_partitions=int(sp),
                  extra_conf={"spark.sql.adaptive.enabled": aqe})

n = 35000
rng = np.random.default_rng(1)
e = rng.integers(0, n, size=(167000, 2))
edges = spark.createDataFrame(
    [(int(a), int(b), 1.0) for a, b in e], "src long, dst long, weight double"
)
adj = adjacency(edges).persist()
st = strength(adj).persist()
vids = spark.range(n).select(F.col("id"))
adj.count()

for P in [1, 4, 8, 32]:
    bg = compile_blocks(adj, st, vids, P)
    reset = spark.createDataFrame([(0, 1.0)], "id long, weight double")
    t0 = time.time()
    ranks, lin = personalized_pagerank(
        spark, adj, st, vids, n_vertices=n, reset_df=reset, graph=bg, max_iter=8, tol=0.0
    )
    dt = time.time() - t0
    steps = [l["wall_ms"] for l in lin]
    print(f"AQE={aqe} sp={sp} P={P}: total={dt:.1f}s first={steps[0]:.0f}ms "
          f"rest_mean={np.mean(steps[1:]):.0f}ms min={min(steps[1:]):.0f}ms")
    bg.unpersist()
