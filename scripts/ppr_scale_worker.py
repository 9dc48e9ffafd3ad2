#!/usr/bin/env python
"""One parallelism level of the PPR scaling benchmark. Prints ONE JSON line.

Workload: batch PPR (broadcast-graph engine) over a deterministic synthetic
link graph — E edges, V vertices, Q single-vertex resets — the retrieval
regime the BASELINE metric (query·edges/sec) targets. The graph and every
block/partition count derive from DATA sizes only, so each parallelism
level runs the identical logical job on identical input.

Protocol: steady-state measurement — all workers pre-load the mmap-shared
COO and run one full-shape warmup (first-touch page faults, worker arenas,
plan compilation), then 3 timed trials; report the minimum (this VM shows
2-4× interference spikes; min = least-interfered run).

With CALIBRATE=1 also measures the HARDWARE's own scaling: the identical
power-iteration kernel in bare Python processes (no Spark) at 1, N and 4N
processes over the same mmap arrays. The engine's efficiency can then be
compared against what the machine itself permits (a single box shares one
memory system across all cores; a real N→4N executor scale-out multiplies
memory channels with nodes, which the sandbox cannot).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def kernel_pass(g: dict, r: np.ndarray, rr: np.ndarray, ebuf, segbuf, d=0.5):
    """One power-iteration SpMV pass — the broadcast engine's inner loop."""
    np.multiply(r, g["inv_strength"], out=rr)
    edge_lo, seg_lo, rel_seg, src = g["edge_lo"], g["seg_lo"], g["rel_seg"], g["src"]
    for ci in range(len(edge_lo) - 1):
        a, b = edge_lo[ci], edge_lo[ci + 1]
        sa, sb = seg_lo[ci], seg_lo[ci + 1]
        eb = ebuf[: b - a]
        np.take(rr, src[a:b], out=eb)
        if g["w"] is not None:
            np.multiply(eb, g["w"][a:b], out=eb)
        np.add.reduceat(eb, rel_seg[sa:sb], out=segbuf[sa:sb])
    return segbuf


def _calib_proc(args):
    mmap_dir, iters = args
    from hipporag_spark.algo.ppr import _resolve_coo

    g = _resolve_coo({"mmap_dir": mmap_dir, "w_const": 1.0, "n": 0})
    src = g["src"]
    n = len(g["inv_strength"])
    rng = np.random.default_rng(1)
    r = rng.random(n)
    rr = np.empty(n)
    ebuf = np.empty(int(np.diff(g["edge_lo"]).max()))
    segbuf = np.empty(len(g["uniq_dst"]))
    uniq = g["uniq_dst"]
    t0 = time.time()
    for _ in range(iters):
        seg = kernel_pass(g, r, rr, ebuf, segbuf)
        r[uniq] = 1e-6 + 0.5 * seg
    return len(src) * iters / (time.time() - t0)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    E = int(os.environ.get("SCALE_E", "8000000"))
    V = int(os.environ.get("SCALE_V", "50000"))
    Q = int(os.environ.get("SCALE_Q", "256"))
    NP_ = int(os.environ.get("SCALE_NP", "32"))
    trials = int(os.environ.get("SCALE_TRIALS", "3"))

    from pyspark.sql import functions as F

    from hipporag_spark.algo.ppr import _ppr_broadcast_batch, collect_graph_coo
    from hipporag_spark.session import get_spark

    spark = get_spark(parallelism=cpus, app_name="ppr_scale")
    df = spark.range(E)
    edges = df.select(
        (F.abs(F.xxhash64(F.lit("s"), "id")) % V).alias("src"),
        (F.abs(F.xxhash64(F.lit("d"), "id")) % V).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    strength = edges.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("strength"))
    t0 = time.time()
    coo = collect_graph_coo(edges, strength, spark.range(V).select("id"))
    build_sec = time.time() - t0
    bc = spark.sparkContext.broadcast(coo)

    def touch(it):
        for pdf in it:
            _ = bc.value["n"]
            yield pd.DataFrame({"x": [len(pdf)]})

    spark.range(cpus * 4).repartition(cpus * 4).mapInPandas(touch, "x long").count()
    breset = spark.createDataFrame(
        [(f"q{j:04d}", j % V, 1.0) for j in range(Q)],
        "query_id string, id long, weight double",
    )
    _ppr_broadcast_batch(spark, bc, breset, 0.5, 1e-6, 2, num_partitions=NP_)[0].count()

    walls, iters_total = [], 0
    for trial in range(trials):
        t0 = time.time()
        _, lin = _ppr_broadcast_batch(
            spark, bc, breset, 0.5, 1e-6, 100 + trial, num_partitions=NP_
        )
        walls.append(round(time.time() - t0, 2))
        iters_total = lin[0]["total_iterations"]
        assert lin[0]["converged"]

    best = min(walls)
    out = {
        "cpus": cpus,
        "E": E,
        "V": V,
        "Q": Q,
        "num_partitions": NP_,
        "build_sec": round(build_sec, 1),
        "trial_walls": walls,
        "wall_sec": best,
        "total_query_iterations": iters_total,
        "query_edges_per_sec": round(iters_total * E / best, 1),
    }

    if os.environ.get("CALIBRATE") == "1" and coo.get("mmap_dir"):
        import multiprocessing as mp

        calib = {}
        for nproc in (1, cpus):
            iters = max(4, 64 // nproc)
            with mp.get_context("spawn").Pool(nproc) as pool:
                rates = pool.map(_calib_proc, [(coo["mmap_dir"], iters)] * nproc)
            calib[str(nproc)] = {
                "per_proc_edges_per_sec": round(float(np.median(rates)), 1),
                "aggregate_edges_per_sec": round(float(np.sum(rates)), 1),
            }
        out["hw_calibration"] = calib

    print(json.dumps(out))


if __name__ == "__main__":
    main()
