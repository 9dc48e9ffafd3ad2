#!/usr/bin/env python
"""Two-parallelism scaling run (the sandbox stand-in for N vs 4N executors).

Runs, in fresh JVMs on IDENTICAL inputs at local[N] and local[4N]:

1. the dedicated PPR scaling workload (``ppr_scale_worker.py``: batch PPR,
   broadcast-graph engine, steady-state min-of-3) — the BASELINE.json
   metric (query·edges/sec), plus a bare-process HARDWARE CALIBRATION of
   the identical kernel so the engine's scaling can be separated from the
   single-box memory-system ceiling;
2. the full bench.py suite (headline table).

Efficiency definitions appended to BENCH/BASELINE.md:

- wall efficiency      (T_N / T_4N) / 4      — the raw number
- harness efficiency   wall efficiency ÷ hardware efficiency, where
  hardware efficiency is the same ratio for the bare (Spark-free) kernel
  processes. A single box shares ONE memory system across every core, so
  a DRAM-bound kernel cannot scale 4× here no matter the framework; on a
  real cluster each executor brings its own memory channels. Harness
  efficiency ≈ 1 means Spark adds no scaling overhead beyond hardware.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N = int(os.environ.get("SCALING_N", "8"))
N4 = 4 * N
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(script: str, cpus: int, extra_env: dict | None = None) -> dict:
    # pin BLAS/OMP to one thread per task: otherwise numpy grabs every
    # machine core and the local[N] vs local[4N] comparison measures nothing
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        OPENBLAS_NUM_THREADS="1",
        OMP_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
        **(extra_env or {}),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, script)],
        env=env, capture_output=True, text=True, timeout=5400,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(
        f"no JSON from {script} at cpus={cpus}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    ppr_low = run("scripts/ppr_scale_worker.py", N)
    ppr_high = run("scripts/ppr_scale_worker.py", N4, {"CALIBRATE": "1"})
    bench_low = run("bench.py", N)
    bench_high = run("bench.py", N4)

    eff_ppr = round(ppr_low["wall_sec"] / ppr_high["wall_sec"] / (N4 / N), 3)
    hw = ppr_high.get("hw_calibration", {})
    hw_eff = None
    harness_eff = None
    if str(N4) in hw and "1" in hw:
        # hardware efficiency of N→4N procs on the bare kernel, derived
        # from one run at 4N procs vs the single-proc rate (per-core
        # retention at 4N ÷ ideal)
        agg_4n = hw[str(N4)]["aggregate_edges_per_sec"]
        per1 = hw["1"]["per_proc_edges_per_sec"]
        hw_eff = round(agg_4n / (N4 * per1), 3)
        harness_eff = round(eff_ppr / hw_eff, 3) if hw_eff else None

    def eff(key):
        return round((bench_low["queries"][key] / bench_high["queries"][key]) / (N4 / N), 3)

    report = {
        "n_low": N,
        "n_high": N4,
        "ppr_scale_wall": [ppr_low["wall_sec"], ppr_high["wall_sec"]],
        "ppr_scale_query_edges_per_sec": [
            ppr_low["query_edges_per_sec"], ppr_high["query_edges_per_sec"]
        ],
        "efficiency_ppr_scale": eff_ppr,
        "hw_efficiency": hw_eff,
        "harness_efficiency": harness_eff,
        "efficiency_ppr_single": eff("ppr"),
        "efficiency_ppr_batch_broadcast": eff("ppr_batch"),
        "efficiency_ppr_batch_blocked": eff("ppr_batch_blocked"),
        "efficiency_knn": eff("knn_all_pairs"),
        "efficiency_triangles": eff("triangle_count"),
        "efficiency_total": round((bench_low["value"] / bench_high["value"]) / (N4 / N), 3),
    }
    print(json.dumps(report))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Scaling run (local[{N}] vs local[{N4}], sandbox stand-in for N vs 4N executors)\n\n"
            f"### PPR scaling workload (batch PPR, broadcast engine; "
            f"E={ppr_low['E']}, V={ppr_low['V']}, Q={ppr_low['Q']}; steady-state min of "
            f"{len(ppr_low['trial_walls'])})\n\n"
            f"| | local[{N}] | local[{N4}] |\n|---|---|---|\n"
            f"| wall sec | {ppr_low['wall_sec']} | {ppr_high['wall_sec']} |\n"
            f"| query·edges/sec | {ppr_low['query_edges_per_sec']:.3e} | "
            f"{ppr_high['query_edges_per_sec']:.3e} |\n\n"
            f"- wall efficiency (T_N/T_4N)/4: **{eff_ppr}**\n"
            f"- hardware efficiency (identical kernel, bare processes, no Spark): "
            f"**{hw_eff}** — the single-box memory-system ceiling\n"
            f"- harness efficiency (engine ÷ hardware): **{harness_eff}** — ≥1 means the "
            f"Spark engine loses nothing beyond what the shared-DRAM box itself imposes; "
            f"on a multi-executor cluster (per-node memory channels) hardware efficiency "
            f"returns to ~1 and the engine's wall efficiency tracks the harness number\n"
            f"- raw calibration: `{json.dumps(hw)}`\n\n"
            f"### Full bench suite\n\n"
            f"| metric | local[{N}] | local[{N4}] | efficiency |\n|---|---|---|---|\n"
        )
        for label, key in [
            ("PPR single query (blocked engine)", "ppr"),
            ("PPR batch 32q (broadcast engine)", "ppr_batch"),
            ("PPR batch 32q (blocked engine)", "ppr_batch_blocked"),
            ("exact KNN all-pairs", "knn_all_pairs"),
            ("triangle count", "triangle_count"),
        ]:
            f.write(
                f"| {label} | {bench_low['queries'][key]} | {bench_high['queries'][key]} "
                f"| {eff(key)} |\n"
            )
        f.write(
            f"| PPR supersteps/min | {bench_low['ppr_supersteps_per_min']} | "
            f"{bench_high['ppr_supersteps_per_min']} | — |\n"
            f"| headline total sec | {bench_low['value']} | {bench_high['value']} | "
            f"{report['efficiency_total']} |\n\n"
            f"raw ppr_scale low: `{json.dumps(ppr_low)}`\n\n"
            f"raw ppr_scale high: `{json.dumps(ppr_high)}`\n\n"
            f"raw bench low: `{json.dumps(bench_low)}`\n\n"
            f"raw bench high: `{json.dumps(bench_high)}`\n"
        )


if __name__ == "__main__":
    main()
