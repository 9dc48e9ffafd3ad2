#!/usr/bin/env python
"""Two-parallelism scaling run (the sandbox stand-in for N vs 4N executors).

Runs bench.py twice in fresh JVMs — local[N] and local[4N] — on identical
input, then reports throughput at both and the scaling efficiency
``(T_N / T_4N) / 4`` required ≥ 0.8 by BASELINE.json. Appends the table to
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N = int(os.environ.get("SCALING_N", "8"))
N4 = 4 * N
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int) -> dict:
    # pin BLAS/OMP to one thread per task: otherwise numpy matmuls inside
    # pandas workers grab every machine core and the local[N] vs local[4N]
    # comparison measures nothing
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        OPENBLAS_NUM_THREADS="1",
        OMP_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"no JSON from bench at cpus={cpus}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    low, high = run(N), run(N4)

    def eff(key):
        return round((low["queries"][key] / high["queries"][key]) / (N4 / N), 3)

    report = {
        "n_low": N, "n_high": N4,
        "efficiency_ppr": eff("ppr"),
        "efficiency_ppr_batch": eff("ppr_batch"),
        "efficiency_knn": eff("knn_all_pairs"),
        "efficiency_triangles": eff("triangle_count"),
        "efficiency_total": round((low["value"] / high["value"]) / (N4 / N), 3),
        "ppr_batch_query_edges_per_sec": [
            low["ppr_batch_query_edges_per_sec"], high["ppr_batch_query_edges_per_sec"]
        ],
    }
    print(json.dumps(report))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    rows = [
        ("PPR (single query) sec to 1e-6", "ppr", report["efficiency_ppr"]),
        ("PPR batch (32 queries) sec to 1e-6", "ppr_batch", report["efficiency_ppr_batch"]),
        ("exact KNN all-pairs sec", "knn_all_pairs", report["efficiency_knn"]),
        ("triangle count sec", "triangle_count", report["efficiency_triangles"]),
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Scaling run (local[{N}] vs local[{N4}], sandbox stand-in for N vs 4N executors)\n\n"
            f"| metric | local[{N}] | local[{N4}] | efficiency (T_N/T_4N)/4 |\n|---|---|---|---|\n"
        )
        for label, key, e in rows:
            f.write(f"| {label} | {low['queries'][key]} | {high['queries'][key]} | {e} |\n")
        f.write(
            f"| PPR batch query·edges/sec | {low['ppr_batch_query_edges_per_sec']} | "
            f"{high['ppr_batch_query_edges_per_sec']} | — |\n"
            f"| PPR supersteps/min | {low['ppr_supersteps_per_min']} | "
            f"{high['ppr_supersteps_per_min']} | — |\n"
            f"| headline total sec | {low['value']} | {high['value']} | {report['efficiency_total']} |\n\n"
            f"raw low: `{json.dumps(low)}`\n\nraw high: `{json.dumps(high)}`\n"
        )


if __name__ == "__main__":
    main()
