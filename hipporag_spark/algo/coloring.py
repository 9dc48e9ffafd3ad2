"""Distance-1 graph coloring — Jones–Plassmann with id priority.

Not in the reference; added because coloring is the classic distributed
symmetry-breaking primitive (register/channel assignment, conflict-free
scheduling of updates over a link graph) and completes the MIS/matching
family (:mod:`.mis`).

Algorithm (Jones–Plassmann 1993, bulk-synchronous, with the FIXED
priority = smaller id first): an uncolored vertex colors itself in the
round when every smaller-id neighbor is already colored, taking the
minimum color unused by its colored neighbors (first-fit / mex). With
this priority the result is EXACTLY the sequential greedy first-fit
coloring in ascending id order — a pinned, partitioning-independent
answer (SURVEY.md §7.3) with the classic Δ+1 bound — while the rounds
run vertex-parallel: round count = the longest decreasing-id path, not
V.

Scale shape per round: one anti-join (ready = uncolored with no
uncolored smaller neighbor), one join against colored neighbors for
used colors, and the mex as a sequence-explode + anti-join + min agg —
all keyed on vertex id, integer-only, map-side-combinable aggs; the mex
explode is bounded per vertex by its degree+1. One O(P) metrics action
per round doubles as the convergence check. Non-fixpoint exhaustion
raises (the scc.py lesson).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpointing import CheckpointManager, SuperstepCheckpoint
from ..lifecycle import free_local_checkpoint
from ..graph.csr import block_of


def greedy_coloring(
    spark: SparkSession,
    adj: DataFrame,
    vertex_ids: DataFrame | None = None,
    max_iter: int = 200,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Return (``colors(id, color)``, lineage): the sequential greedy
    first-fit coloring in ascending id order, computed in parallel
    rounds. Isolated vertices (``vertex_ids`` only) get color 0. Raises
    RuntimeError on iteration exhaustion."""
    P = num_blocks or spark.sparkContext.defaultParallelism
    nbrs = (
        adj.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
        .repartition(F.col("src"))
        .persist()
    )
    verts = nbrs.select(F.col("src").alias("id")).distinct()
    if vertex_ids is not None:
        verts = vertex_ids.select("id").distinct()

    # state: colored(id, color) grows; uncolored shrinks
    colored = spark.createDataFrame([], "id long, color long")
    uncolored = verts
    ckpt = None
    start = 0
    lineage: list[dict] = []
    if checkpoint_dir is not None:
        ckpt = CheckpointManager(checkpoint_dir, run_id or uuid.uuid4().hex[:12])
        latest = ckpt.latest_complete()
        if latest is not None:
            colored, manifest = ckpt.load(spark, latest)
            lineage = ckpt.lineage()
            if manifest.get("converged"):
                return colored, lineage
            uncolored = verts.join(colored.select("id"), "id", "left_anti")
            start = latest + 1
    colored = colored.persist()
    uncolored = uncolored.persist()
    n_verts = verts.count()

    deg = nbrs.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))

    for step in range(start, max_iter):
        t0 = time.time()
        # ready: uncolored with NO uncolored smaller-id neighbor
        # no distinct: left_anti tolerates duplicate blocker rows, and
        # dropping it saves a per-round shuffle
        blockers = (
            nbrs.join(uncolored.withColumnRenamed("id", "src"), "src", "left_semi")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("id"))
        )
        ready = uncolored.join(blockers, "id", "left_anti")

        # mex over colors already used by (any) colored neighbors
        used = (
            nbrs.join(ready.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(
                colored.select(F.col("id").alias("dst"), "color"), "dst"
            )
            .select(F.col("src").alias("id"), "color")
        )
        cand = (
            ready.join(deg, "id", "left_outer")
            .select(
                "id",
                F.explode(
                    F.sequence(
                        F.lit(0).cast("long"),
                        F.coalesce(F.col("deg"), F.lit(0)).cast("long"),
                    )
                ).alias("color"),
            )
        )
        newly = (
            cand.join(used, ["id", "color"], "left_anti")
            .groupBy("id")
            .agg(F.min("color").alias("color"))
        )
        new_colored = colored.unionByName(newly).localCheckpoint(eager=False)

        # one action per round: the per-block size of the colored set
        # materializes the lazy checkpoint AND yields the convergence
        # verdict (remaining = n_verts − colored, n_verts counted once)
        stats = (
            new_colored.withColumn("block", block_of(F.col("id"), P))
            .groupBy("block")
            .agg(F.count("*").alias("rows"))
            .collect()
        )
        n_colored = int(sum(r["rows"] for r in stats))
        remaining = n_verts - n_colored
        converged = remaining == 0
        wall_ms = (time.time() - t0) * 1000

        old_colored, old_uncolored = colored, uncolored
        if ckpt is not None:
            meta = SuperstepCheckpoint(
                run_id=ckpt.run_id, superstep=step, delta=float(remaining),
                converged=converged, wall_ms=wall_ms,
                partitions=[{"block": r["block"], "rows": r["rows"]} for r in stats],
                extra={"algorithm": "greedy_coloring", "n_colored": n_colored},
            )
            colored = ckpt.write(new_colored, meta)
            free_local_checkpoint(new_colored)
        else:
            colored = new_colored
        uncolored = verts.join(colored.select("id"), "id", "left_anti").persist()
        old_colored.unpersist()
        old_uncolored.unpersist()
        free_local_checkpoint(old_colored)
        lineage.append(
            {"run_id": ckpt.run_id if ckpt else "in-memory", "superstep": step,
             "n_colored": n_colored, "remaining": remaining,
             "converged": converged, "wall_ms": wall_ms}
        )
        if converged:
            break
    else:
        nbrs.unpersist()
        uncolored.unpersist()
        colored.unpersist()
        free_local_checkpoint(colored)
        raise RuntimeError(
            f"greedy_coloring did not finish within max_iter={max_iter} rounds"
        )

    nbrs.unpersist()
    uncolored.unpersist()
    return colored.select("id", "color"), lineage
