"""Connected components as an iterative DataFrame job (exact).

Not in the reference (BASELINE.json adds it; the reference's igraph object
could answer it trivially single-node). Algorithm: deterministic min-label
propagation — ``label(v) ← min(label(v), min_{u~v} label(u))``, init
``label(v)=v`` — integer-only updates, so results are EXACT and identical
at any parallelism (no float ties; SURVEY.md §7.3).

Each superstep is one join + one min-aggregate; converged when zero labels
changed (the change-count is the same single action that yields per-block
metrics). Supersteps checkpoint through the same CheckpointManager contract
as PPR. Plain min-propagation needs O(diameter) rounds; linkgraph/social
graphs have tiny diameters, and the passage↔entity bipartite KG here has
diameter ≤ ~2·(chunk chain length). For adversarial long-chain inputs,
``pointer_jump=True`` adds a label-shortcutting round
(``label ← label(label)``) that halves path lengths (Stergiou-style
shortcutting), giving O(log d) convergence.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpointing import CheckpointManager, SuperstepCheckpoint
from ..fsio import STATS_RESET_EVERY, truncate_stats
from ..lifecycle import free_local_checkpoint
from ..graph.csr import block_of


def connected_components(
    spark: SparkSession,
    adj: DataFrame,
    vertex_ids: DataFrame,
    max_iter: int = 100,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
    pointer_jump: bool = True,
) -> tuple[DataFrame, list[dict]]:
    """Return (``components(id, component)``, lineage). component = min
    vertex id reachable, i.e. a canonical deterministic component id."""
    P = num_blocks or spark.sparkContext.defaultParallelism
    # pre-partition on the probe key so the O(E) side is NEVER
    # re-exchanged per superstep (only the O(V) label side shuffles; the
    # cached outputPartitioning satisfies the join requirement at any
    # scale where the state no longer broadcasts)
    edges = adj.select("src", "dst").repartition(F.col("src")).persist()

    labels = vertex_ids.select("id", F.col("id").alias("component"))
    ckpt = None
    start = 0
    lineage: list[dict] = []
    if checkpoint_dir is not None:
        ckpt = CheckpointManager(checkpoint_dir, run_id or uuid.uuid4().hex[:12])
        latest = ckpt.latest_complete()
        if latest is not None:
            labels, manifest = ckpt.load(spark, latest)
            lineage = ckpt.lineage()
            if manifest.get("converged"):
                return labels, lineage
            start = latest + 1
    labels = labels.persist()

    for step in range(start, max_iter):
        t0 = time.time()
        # neighbor-min: adj join labels on src, min per dst
        nbr_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy("dst")
            .agg(F.min("component").alias("nbr"))
            .withColumnRenamed("dst", "id")
        )
        new_labels = (
            labels.join(nbr_min, "id", "left_outer")
            .select("id", F.least(F.col("component"), F.coalesce(F.col("nbr"), F.col("component"))).alias("component"))
        )
        if pointer_jump:
            # shortcut: component ← component(component)
            parent = new_labels.select(
                F.col("id").alias("pid"), F.col("component").alias("pcomp")
            )
            new_labels = (
                new_labels.join(parent, new_labels.component == parent.pid, "left_outer")
                .select("id", F.coalesce(F.col("pcomp"), F.col("component")).alias("component"))
            )
        # lazy checkpoint + metrics in the SAME action: the stats collect
        # materializes the checkpoint blocks, so a superstep is exactly one
        # Spark action (the eager-checkpoint + separate-metrics version ran
        # two, re-executing the plan)
        new_labels = new_labels.localCheckpoint(eager=False)

        stats = (
            labels.select("id", F.col("component").alias("old"))
            .join(new_labels.select("id", F.col("component").alias("new")), "id")
            .withColumn("block", block_of(F.col("id"), P))
            .groupBy("block")
            .agg(
                F.count("*").alias("rows"),
                F.sum((F.col("old") != F.col("new")).cast("long")).alias("changed"),
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
                {"block": r["block"], "rows": r["rows"], "changed": r["changed"]} for r in stats
            ],
            extra={"algorithm": "connected_components"},
        )
        old = labels
        if ckpt is not None:
            labels = ckpt.write(new_labels, meta)  # parquet-backed copy
            free_local_checkpoint(new_labels)
        else:
            labels = new_labels
            if not converged and (step + 1) % STATS_RESET_EVERY == 0:
                # periodic stat reset: localCheckpoint carries the plan's
                # estimated sizeInBytes forward, and this superstep joins
                # the state leaf 4× — unbounded rounds otherwise compound
                # the estimate's digits exponentially (see fsio.truncate_stats)
                labels = truncate_stats(new_labels, "hipporag_cc_state_")
                free_local_checkpoint(new_labels)
        old.unpersist()
        free_local_checkpoint(old)
        lineage.append(
            {"run_id": meta.run_id, "superstep": step, "changed": changed,
             "converged": converged, "wall_ms": wall_ms, "partitions": meta.partitions}
        )
        if converged:
            break

    edges.unpersist()
    return labels, lineage
