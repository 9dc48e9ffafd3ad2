"""Per-superstep checkpointing with per-partition lineage + metrics.

Contract (BASELINE.json north_rule): every superstep persists its state
vector with enough metadata that a killed job resumes mid-iteration, and
each checkpoint carries per-partition lineage (rows, value mass, L1 delta
contribution, wall ms).

Layout under ``<dir>/<run_id>/``:

    superstep=K/state/          Parquet of the rank/label vector
    superstep=K/manifest.json   {run_id, superstep, delta, converged,
                                 wall_ms, partitions: [{block, rows, mass,
                                 delta}], written LAST → atomicity marker}

A superstep directory without a manifest is incomplete and ignored on
resume (the manifest write is the commit point). The reference has only a
whole-graph pickle (``HippoRAG.py:1088-1093``); per-superstep durability is
this engine's addition per the north rule.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class SuperstepCheckpoint:
    run_id: str
    superstep: int
    delta: float
    converged: bool
    wall_ms: float
    partitions: list = field(default_factory=list)
    extra: dict = field(default_factory=dict)


class CheckpointManager:
    def __init__(self, base_dir: str, run_id: str):
        self.base = os.path.join(base_dir, run_id)
        self.run_id = run_id
        os.makedirs(self.base, exist_ok=True)

    def _step_dir(self, superstep: int) -> str:
        return os.path.join(self.base, f"superstep={superstep}")

    def write(self, state: DataFrame, meta: SuperstepCheckpoint) -> DataFrame:
        """Write state + manifest; return the re-read (lineage-truncated) state."""
        d = self._step_dir(meta.superstep)
        t0 = time.time()
        state.write.mode("overwrite").parquet(os.path.join(d, "state"))
        meta.wall_ms += (time.time() - t0) * 1000
        with open(os.path.join(d, "manifest.json"), "w") as f:
            json.dump(
                {
                    "run_id": meta.run_id,
                    "superstep": meta.superstep,
                    "delta": meta.delta,
                    "converged": meta.converged,
                    "wall_ms": meta.wall_ms,
                    "partitions": meta.partitions,
                    **meta.extra,
                },
                f,
            )
        return state.sparkSession.read.parquet(os.path.join(d, "state"))

    def latest_complete(self) -> int | None:
        """Highest superstep K whose manifest exists (the resume point)."""
        best = None
        if not os.path.isdir(self.base):
            return None
        for name in os.listdir(self.base):
            if not name.startswith("superstep="):
                continue
            k = int(name.split("=", 1)[1])
            if os.path.exists(os.path.join(self._step_dir(k), "manifest.json")):
                best = k if best is None else max(best, k)
        return best

    def load(self, spark: SparkSession, superstep: int) -> tuple[DataFrame, dict]:
        d = self._step_dir(superstep)
        with open(os.path.join(d, "manifest.json")) as f:
            manifest = json.load(f)
        return spark.read.parquet(os.path.join(d, "state")), manifest

    def lineage(self) -> list[dict]:
        """All manifests in superstep order — the run's lineage log."""
        out = []
        k = 0
        latest = self.latest_complete()
        if latest is None:
            return out
        for k in range(latest + 1):
            p = os.path.join(self._step_dir(k), "manifest.json")
            if os.path.exists(p):
                with open(p) as f:
                    out.append(json.load(f))
        return out

    def clear(self):
        shutil.rmtree(self.base, ignore_errors=True)
