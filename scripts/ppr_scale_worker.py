#!/usr/bin/env python
"""One (workload, parallelism) point of the PPR scaling benchmark.
Prints ONE JSON line.

Workloads (``SCALE_WORKLOAD``) over a deterministic synthetic link graph —
E edges, V vertices, Q resets — sized by env so every block/partition count
derives from DATA only and two parallelism levels run the identical
logical job on identical input:

- ``broadcast``: batch PPR through the broadcast-graph engine (the
  retrieval regime the BASELINE metric query·edges/sec targets). Two
  interesting sizes: a CACHE-RESIDENT graph (src stream fits shared L3 —
  the analog of a multi-executor cluster where each node brings its own
  memory channels) and a DRAM-BOUND graph (where a single box's shared
  memory system is the known ceiling — quantified by the calibration).
- ``blocked``: batch PPR through the packed block (shuffle) engine — the
  beyond-memory scale path; per-superstep work is Q·E multiply-adds moved
  through a real shuffle.

Protocol: steady-state measurement — pre-load/warm every worker (mmap
first-touch, arenas, plan compilation) with one full-shape run, then
``SCALE_TRIALS`` timed trials; report the minimum (this VM shows 2-4×
interference spikes; min = least-interfered run).

With CALIBRATE_PROCS="1,8,32" also measures the HARDWARE's own scaling:
the identical power-iteration kernel in bare Python processes (no Spark)
at each listed process count over the same mmap arrays. The engine's
N→4N efficiency can then be read against what the machine itself permits
between the same two process counts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def _cpu_ticks() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — per-trial interference gauge
    on a shared host (steal = cycles the hypervisor gave to someone else)."""
    f = open("/proc/stat").readline().split()
    vals = [int(x) for x in f[1:9]]
    return vals[7], sum(vals)


def kernel_pass(g: dict, r: np.ndarray, rr: np.ndarray, ebuf, segbuf, d=0.5):
    """One power-iteration SpMV pass — the broadcast engine's inner loop.
    Replays whichever COO layout the engine built: v1 (single src/w stream,
    edge_lo/seg_lo chunking) or the executor-spilled "parts" layout
    (per-partition src/w files + global chunk descriptors)."""
    np.multiply(r, g["inv_strength"], out=rr)
    rel_seg = g["rel_seg"]
    if g.get("layout") == "parts":
        from hipporag_spark.algo.ppr import _load_part

        mdir = g["mmap_dir"]
        for ci in range(len(g["chunk_part"])):
            psrc, pw = _load_part(mdir, int(g["chunk_part"][ci]))
            a, b = g["chunk_elo"][ci], g["chunk_ehi"][ci]
            sa, sb = g["chunk_slo"][ci], g["chunk_shi"][ci]
            eb = ebuf[: b - a]
            np.take(rr, psrc[a:b], out=eb)
            if pw is not None:
                np.multiply(eb, pw[a:b], out=eb)
            np.add.reduceat(eb, rel_seg[sa:sb], out=segbuf[sa:sb])
        return segbuf
    edge_lo, seg_lo, src = g["edge_lo"], g["seg_lo"], g["src"]
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

    layout = "parts" if not os.path.exists(f"{mmap_dir}/src.npy") else "v1"
    g = _resolve_coo({"mmap_dir": mmap_dir, "w_const": 1.0, "n": 0, "layout": layout})
    n = len(g["inv_strength"])
    if layout == "parts":
        spans = np.asarray(g["chunk_ehi"]) - np.asarray(g["chunk_elo"])
        n_edges = int(spans.sum())
        max_chunk = int(spans.max()) if len(spans) else 0
    else:
        n_edges = len(g["src"])
        max_chunk = int(np.diff(g["edge_lo"]).max())
    rng = np.random.default_rng(1)
    r = rng.random(n)
    rr = np.empty(n)
    ebuf = np.empty(max_chunk)
    segbuf = np.empty(len(g["uniq_dst"]))
    uniq = g["uniq_dst"]
    t0 = time.time()
    for _ in range(iters):
        seg = kernel_pass(g, r, rr, ebuf, segbuf)
        r[uniq] = 1e-6 + 0.5 * seg
    return n_edges * iters / (time.time() - t0)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    workload = os.environ.get("SCALE_WORKLOAD", "broadcast")
    E = int(os.environ.get("SCALE_E", "8000000"))
    V = int(os.environ.get("SCALE_V", "50000"))
    Q = int(os.environ.get("SCALE_Q", "256"))
    NP_ = int(os.environ.get("SCALE_NP", "32"))
    trials = int(os.environ.get("SCALE_TRIALS", "3"))

    from pyspark.sql import functions as F

    from hipporag_spark.algo.ppr import (
        _ppr_broadcast_batch,
        collect_graph_coo,
        personalized_pagerank_batch,
    )
    from hipporag_spark.session import get_spark

    if os.environ.get("SCALE_CLUSTER_MODE") == "1":
        # launched via spark-submit against a standalone master: the
        # master URL, executor cores/memory, and ALL Spark confs arrive
        # from the submit command (pinned identically across the N / 4N
        # pair by scripts/cluster_scaling_bench.py) — do NOT override
        # them here or the two points stop running the same job
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName(f"ppr_scale_{workload}").getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
    else:
        spark = get_spark(parallelism=cpus, app_name=f"ppr_scale_{workload}")
    df = spark.range(E)
    edges = df.select(
        (F.abs(F.xxhash64(F.lit("s"), "id")) % V).alias("src"),
        (F.abs(F.xxhash64(F.lit("d"), "id")) % V).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    strength = edges.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("strength"))
    verts = spark.range(V).select("id")
    breset = spark.createDataFrame(
        [(f"q{j:04d}", j % V, 1.0) for j in range(Q)],
        "query_id string, id long, weight double",
    )

    out = {"workload": workload, "cpus": cpus, "E": E, "V": V, "Q": Q}
    walls: list[float] = []

    if workload == "broadcast":
        t0 = time.time()
        coo = collect_graph_coo(edges, strength, verts)
        out["build_sec"] = round(time.time() - t0, 1)
        bc = spark.sparkContext.broadcast(coo)

        def touch(it):
            for pdf in it:
                _ = bc.value["n"]
                yield pd.DataFrame({"x": [len(pdf)]})

        spark.range(cpus * 4).repartition(cpus * 4).mapInPandas(touch, "x long").count()
        _ppr_broadcast_batch(spark, bc, breset, 0.5, 1e-6, 2, num_partitions=NP_)[0].count()
        iters_total = 0
        steals = []
        for trial in range(trials):
            s0, c0 = _cpu_ticks()
            t0 = time.time()
            _, lin = _ppr_broadcast_batch(
                spark, bc, breset, 0.5, 1e-6, 100 + trial, num_partitions=NP_
            )
            walls.append(round(time.time() - t0, 2))
            s1, c1 = _cpu_ticks()
            steals.append(round(100 * (s1 - s0) / max(1, c1 - c0), 1))
            iters_total = lin[0]["total_iterations"]
            assert lin[0]["converged"]
        out["trial_steal_pct"] = steals
        out["num_partitions"] = NP_
        out["total_query_iterations"] = iters_total

        calib_procs = os.environ.get("CALIBRATE_PROCS", "")
        if calib_procs and coo.get("mmap_dir"):
            import multiprocessing as mp

            calib = {}
            for nproc in (int(x) for x in calib_procs.split(",")):
                iters = max(4, 128 // nproc)
                with mp.get_context("spawn").Pool(nproc) as pool:
                    rates = pool.map(_calib_proc, [(coo["mmap_dir"], iters)] * nproc)
                calib[str(nproc)] = {
                    "per_proc_edges_per_sec": round(float(np.median(rates)), 1),
                    "aggregate_edges_per_sec": round(float(np.sum(rates)), 1),
                }
            out["hw_calibration"] = calib

    elif workload == "blocked":
        from hipporag_spark.graph.blocked import compile_blocks, default_num_blocks

        t0 = time.time()
        P = default_num_blocks(E)
        bg = compile_blocks(edges, strength, verts, P)
        bg.subblocks.count()  # force the packing before timing
        out["build_sec"] = round(time.time() - t0, 1)
        out["num_blocks"] = P
        # warmup: one full-shape superstep pass (plans, arenas, shuffle dirs)
        personalized_pagerank_batch(
            spark, edges, strength, verts, breset, n_vertices=V,
            damping=0.5, max_iter=2, graph=bg, engine="csr",
        )[0].count()
        iters_total = 0
        steals = []
        for trial in range(trials):
            s0, c0 = _cpu_ticks()
            t0 = time.time()
            ranks, lin = personalized_pagerank_batch(
                spark, edges, strength, verts, breset, n_vertices=V,
                damping=0.5, max_iter=100 + trial, graph=bg, engine="csr",
                check_every=int(os.environ.get("SCALE_CHECK_EVERY", "0")) or None,
            )
            ranks.count()
            walls.append(round(time.time() - t0, 2))
            s1, c1 = _cpu_ticks()
            steals.append(round(100 * (s1 - s0) / max(1, c1 - c0), 1))
            iters_total = len(lin) * Q
            assert lin[-1]["converged"]
        out["supersteps"] = len(lin)
        out["trial_steal_pct"] = steals
        # last trial's per-superstep walls (chunked supersteps report the
        # chunk wall split evenly) — the fixed-vs-parallel cost split
        # between two executor counts lives here
        out["superstep_walls_ms"] = [round(l["wall_ms"], 1) for l in lin]
    else:
        raise SystemExit(f"unknown SCALE_WORKLOAD {workload!r}")

    best = min(walls)
    out["trial_walls"] = walls
    out["wall_sec"] = best
    out["query_edges_per_sec"] = round(iters_total * E / best, 1)
    if os.environ.get("SCALE_CLUSTER_MODE") == "1":
        # counted AFTER the trials (registration is async at startup);
        # driver block-manager counts as one endpoint, executors the rest
        n_endpoints = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
        out["executors"] = max(0, n_endpoints - 1)
        out["master"] = spark.sparkContext.master
    print(json.dumps(out))


if __name__ == "__main__":
    main()
