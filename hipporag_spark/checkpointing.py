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
resume (the manifest write is the commit point; the manifest itself lands
via tmp-file + rename, the Hadoop-FS atomic primitive). ``base_dir`` may be
ANY Hadoop-FS URI — ``hdfs://``, ``s3a://``, ``file://``, or a plain local
path — because both the state (Spark parquet) and the manifests (fsio's
JVM ``FileSystem`` helpers) route through the cluster's filesystem layer;
nothing here touches driver-local ``os.*``, which is what makes resume work
under ``spark-submit`` on a multi-executor cluster. The reference has only
a whole-graph pickle (``HippoRAG.py:1088-1093``); per-superstep durability
is this engine's addition per the north rule.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .fsio import (
    fs_delete,
    fs_exists,
    fs_list_names,
    fs_mkdirs,
    fs_read_text,
    fs_write_text,
)


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
    def __init__(self, base_dir: str, run_id: str, spark: SparkSession | None = None):
        self.base = f"{base_dir.rstrip('/')}/{run_id}"
        self.run_id = run_id
        # lazily resolved: manifests are read/written from the driver, where
        # an active session always exists by the time a superstep runs
        self._spark = spark

    @property
    def spark(self) -> SparkSession:
        if self._spark is None:
            self._spark = SparkSession.getActiveSession()
        return self._spark

    def _step_dir(self, superstep: int) -> str:
        return f"{self.base}/superstep={superstep}"

    def write(self, state: DataFrame, meta: SuperstepCheckpoint) -> DataFrame:
        """Write state + manifest; return the re-read (lineage-truncated) state."""
        d = self._step_dir(meta.superstep)
        t0 = time.time()
        state.write.mode("overwrite").parquet(f"{d}/state")
        meta.wall_ms += (time.time() - t0) * 1000
        fs_write_text(
            self.spark,
            f"{d}/manifest.json",
            json.dumps(
                {
                    "run_id": meta.run_id,
                    "superstep": meta.superstep,
                    "delta": meta.delta,
                    "converged": meta.converged,
                    "wall_ms": meta.wall_ms,
                    "partitions": meta.partitions,
                    **meta.extra,
                }
            ),
        )
        return state.sparkSession.read.parquet(f"{d}/state")

    def latest_complete(self) -> int | None:
        """Highest superstep K whose manifest exists (the resume point)."""
        best = None
        for name in fs_list_names(self.spark, self.base):
            if not name.startswith("superstep="):
                continue
            k = int(name.split("=", 1)[1])
            if fs_exists(self.spark, f"{self._step_dir(k)}/manifest.json"):
                best = k if best is None else max(best, k)
        return best

    def load(self, spark: SparkSession, superstep: int) -> tuple[DataFrame, dict]:
        d = self._step_dir(superstep)
        manifest = json.loads(fs_read_text(spark, f"{d}/manifest.json"))
        return spark.read.parquet(f"{d}/state"), manifest

    def lineage(self) -> list[dict]:
        """All manifests in superstep order — the run's lineage log."""
        out = []
        latest = self.latest_complete()
        if latest is None:
            return out
        for k in range(latest + 1):
            p = f"{self._step_dir(k)}/manifest.json"
            if fs_exists(self.spark, p):
                out.append(json.loads(fs_read_text(self.spark, p)))
        return out

    def clear(self):
        fs_delete(self.spark, self.base, recursive=True)

    def ensure_base(self) -> None:
        fs_mkdirs(self.spark, self.base)
