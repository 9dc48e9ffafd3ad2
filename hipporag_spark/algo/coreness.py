"""Full core-number decomposition via distributed h-index iteration.

Not in the reference (igraph answers ``coreness`` single-node); completes
:mod:`.kcore` (fixed-k membership) to the FULL decomposition — every
vertex's core number in one job — using the h-operator convergence
theorem (Lü/Chen/Ren/Zhang/Zhou/Stanley 2016, "Vital nodes and the
h-index"): starting from c₀(v) = deg(v) and iterating

    c_{t+1}(v) = H({c_t(u) : u ∈ N(v)})

(H = the h-index: the largest h such that ≥ h neighbors have value ≥ h)
the values decrease monotonically to exactly the core numbers — no
global peel ordering needed, which is what makes coreness tractable as a
bulk-synchronous job: sequential Batagelj–Zaveršnik peeling is inherently
serial in k, while the h-operator is embarrassingly vertex-parallel per
round.

Scale shape per round: one equi-join of the (static, persisted,
dst-pre-partitioned) edge list against the V-row value table + one
per-src window (row_number over neighbor values desc — the h-index is
``max(min(rank, value))``) + one map-side-combinable max agg; all keyed
on vertex id. Integer-only, monotone → EXACT and identical at any
parallelism; convergence read from the same O(P) metrics action that
materializes the round. Rounds needed track the graph's core-hierarchy
depth (small on power-law graphs), and the monotone cap
``least(old, H)`` makes every round a no-op after fixpoint.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..checkpointing import CheckpointManager, SuperstepCheckpoint
from ..lifecycle import free_local_checkpoint
from ..graph.csr import block_of


def coreness(
    spark: SparkSession,
    adj: DataFrame,
    vertex_ids: DataFrame | None = None,
    max_iter: int = 100,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Return (``core(id, coreness)``, lineage): the core number of every
    vertex. ``adj`` is the symmetric adjacency (one row per directed
    neighbor pair); vertices present only in ``vertex_ids`` (isolated)
    get coreness 0. Raises RuntimeError on iteration exhaustion (the
    scc.py lesson — never silently-partial output)."""
    P = num_blocks or spark.sparkContext.defaultParallelism
    edges = (
        adj.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
        .repartition(F.col("dst"))
        .persist()
    )

    state = edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("val")
    )
    if vertex_ids is not None:
        state = (
            vertex_ids.select("id")
            .join(state, "id", "left_outer")
            .select("id", F.coalesce(F.col("val"), F.lit(0).cast("long")).alias("val"))
        )
    ckpt = None
    start = 0
    lineage: list[dict] = []
    if checkpoint_dir is not None:
        ckpt = CheckpointManager(checkpoint_dir, run_id or uuid.uuid4().hex[:12])
        latest = ckpt.latest_complete()
        if latest is not None:
            state, manifest = ckpt.load(spark, latest)
            lineage = ckpt.lineage()
            if manifest.get("converged"):
                return state.select("id", F.col("val").alias("coreness")), lineage
            start = latest + 1
    state = state.persist()

    for step in range(start, max_iter):
        t0 = time.time()
        nb = edges.join(
            state.select(F.col("id").alias("dst"), "val"), "dst"
        ).select(F.col("src").alias("id"), "val")
        w = Window.partitionBy("id").orderBy(F.col("val").desc())
        h = (
            nb.withColumn("rn", F.row_number().over(w))
            .groupBy("id")
            .agg(F.max(F.least(F.col("rn").cast("long"), F.col("val"))).alias("h"))
        )
        new_state = (
            state.join(h, "id", "left_outer")
            .select(
                "id",
                F.least(
                    F.col("val"), F.coalesce(F.col("h"), F.lit(0).cast("long"))
                ).alias("val"),
                (F.coalesce(F.col("h"), F.lit(0).cast("long")) < F.col("val"))
                .alias("changed_flag"),
            )
            .localCheckpoint(eager=False)
        )

        stats = (
            new_state.withColumn("block", block_of(F.col("id"), P))
            .groupBy("block")
            .agg(
                F.count("*").alias("rows"),
                F.sum(F.col("changed_flag").cast("long")).alias("changed"),
            )
            .collect()
        )
        changed = int(sum(r["changed"] for r in stats))
        wall_ms = (time.time() - t0) * 1000
        converged = changed == 0

        meta = SuperstepCheckpoint(
            run_id=ckpt.run_id if ckpt else "in-memory",
            superstep=step,
            delta=float(changed),
            converged=converged,
            wall_ms=wall_ms,
            partitions=[
                {"block": r["block"], "rows": r["rows"], "changed": r["changed"]}
                for r in stats
            ],
            extra={"algorithm": "coreness"},
        )
        old = state
        new_state = new_state.drop("changed_flag")
        if ckpt is not None:
            state = ckpt.write(new_state, meta)
            free_local_checkpoint(new_state)
        else:
            state = new_state
        old.unpersist()
        free_local_checkpoint(old)
        lineage.append(
            {"run_id": meta.run_id, "superstep": step, "changed": changed,
             "converged": converged, "wall_ms": wall_ms, "partitions": meta.partitions}
        )
        if converged:
            break
    else:
        edges.unpersist()
        state.unpersist()
        free_local_checkpoint(state)
        raise RuntimeError(
            f"coreness did not reach fixpoint within max_iter={max_iter} rounds"
        )

    out = state.select("id", F.col("val").alias("coreness"))
    edges.unpersist()
    return out, lineage
