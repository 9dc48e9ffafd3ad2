"""Maximal independent set as an iterative DataFrame job.

Not in the reference (its igraph object answers independent sets
single-node, ``igraph.largest_independent_vertex_sets`` family); added on
the same edge-table infrastructure as the BASELINE.json algorithms
(components/labelprop/triangles) because MIS is the standard building
block for distributed graph coloring, scheduling and parallel contraction
at scale.

Algorithm: synchronous greedy-by-priority (the deterministic Luby
variant). Priority = the dense vertex id itself, so the result is the
LEXICOGRAPHICALLY-FIRST MIS — exactly what sequential greedy over ids
produces — and is identical at any parallelism (integer comparisons only,
no random bits, SURVEY.md §7.3). Each round, every active vertex whose id
is smaller than all of its ACTIVE neighbors' ids enters the set; its
active neighbors leave; fixpoint = empty active set.

Scale shape per round: two semi-joins of the (static, persisted) edge
list against the shrinking active set, one map-side-combinable
min-neighbor aggregate, one anti-join — all keyed on vertex id, so hub
skew spreads across partitions; no collect beyond the O(P) per-block
metrics action that doubles as the convergence check. Hubs resolve in
round 1 (a hub is either the local min or adjacent to one), so rounds
track the id-decreasing path structure, small on real graphs. Supersteps
checkpoint through the same CheckpointManager contract as PPR/CC.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpointing import CheckpointManager, SuperstepCheckpoint
from ..lifecycle import free_local_checkpoint
from ..graph.csr import block_of

__all__ = ["maximal_independent_set"]


def maximal_independent_set(
    spark: SparkSession,
    adj: DataFrame,
    vertex_ids: DataFrame,
    max_iter: int = 200,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Return (``mis(id, round)``, lineage): the members of the
    lexicographically-first maximal independent set and the superstep in
    which each entered (round is 0-based). ``adj`` is the symmetric
    adjacency (:func:`..graph.build.adjacency`). Vertices in
    ``vertex_ids`` with no edges are isolated and enter in round 0.

    Raises ``RuntimeError`` if ``max_iter`` rounds end with vertices still
    active (non-fixpoint exit would silently drop them from the set —
    same contract as scc.py's non-convergence guard).
    """
    P = num_blocks or spark.sparkContext.defaultParallelism
    edges = adj.select("src", "dst").persist()

    active = vertex_ids.select("id").distinct()
    mis = spark.createDataFrame([], "id long, round int")
    ckpt = None
    start = 0
    lineage: list[dict] = []
    if checkpoint_dir is not None:
        ckpt = CheckpointManager(checkpoint_dir, run_id or uuid.uuid4().hex[:12])
        latest = ckpt.latest_complete()
        if latest is not None:
            # checkpointed state is the union (kind=0 → mis rows with their
            # round, kind=1 → still-active frontier) so one parquet resumes
            # both halves mid-run
            state, manifest = ckpt.load(spark, latest)
            mis = state.filter(F.col("round") >= 0).select("id", "round")
            active = state.filter(F.col("round") < 0).select("id")
            lineage = ckpt.lineage()
            if manifest.get("converged"):
                edges.unpersist()
                return mis, lineage
            start = latest + 1
    active = active.persist()
    mis = mis.persist()

    converged = False
    for step in range(start, max_iter):
        t0 = time.time()
        live = edges.join(active, edges.src == active.id, "left_semi").join(
            active, edges.dst == active.id, "left_semi"
        )
        minnbr = live.groupBy("src").agg(F.min("dst").alias("mn"))
        cand = (
            active.join(minnbr, active.id == minnbr.src, "left_outer")
            .filter(F.col("mn").isNull() | (F.col("id") < F.col("mn")))
            .select("id")
        )
        # active neighbors of this round's winners leave the frontier;
        # adjacency is symmetric, so one direction covers both sides
        out = (
            live.join(cand, live.src == cand.id, "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        new_active = active.join(
            cand.unionByName(out).distinct(), "id", "left_anti"
        ).localCheckpoint(eager=False)
        new_mis = mis.unionByName(
            cand.withColumn("round", F.lit(step).cast("int"))
        ).localCheckpoint(eager=False)

        # metrics + convergence in the SAME action that materializes both
        # lazy checkpoints (one Spark action per round, like kcore.py)
        stats = (
            new_mis.select("id", F.lit(0).alias("kind"))
            .unionByName(new_active.select("id", F.lit(1).alias("kind")))
            .withColumn("block", block_of(F.col("id"), P))
            .groupBy("block")
            .agg(
                F.sum((F.col("kind") == 0).cast("long")).alias("in_mis"),
                F.sum((F.col("kind") == 1).cast("long")).alias("active"),
            )
            .collect()
        )
        remaining = int(sum(r["active"] for r in stats))
        wall_ms = (time.time() - t0) * 1000
        converged = remaining == 0

        meta = SuperstepCheckpoint(
            run_id=ckpt.run_id if ckpt else "in-memory",
            superstep=step,
            delta=float(remaining),
            converged=converged,
            wall_ms=wall_ms,
            partitions=[
                {"block": r["block"], "rows": r["in_mis"], "active": r["active"]}
                for r in stats
            ],
            extra={"algorithm": "maximal_independent_set"},
        )
        old_active, old_mis = active, mis
        if ckpt is not None:
            state = new_mis.unionByName(
                new_active.withColumn("round", F.lit(-1).cast("int"))
            )
            state = ckpt.write(state, meta)
            free_local_checkpoint(new_mis)
            free_local_checkpoint(new_active)
            mis = state.filter(F.col("round") >= 0).select("id", "round")
            active = state.filter(F.col("round") < 0).select("id")
        else:
            active, mis = new_active, new_mis
        for df in (old_active, old_mis):
            df.unpersist()
            free_local_checkpoint(df)
        lineage.append(
            {"run_id": meta.run_id, "superstep": step, "remaining": remaining,
             "converged": converged, "wall_ms": wall_ms, "partitions": meta.partitions}
        )
        if converged:
            break

    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"maximal_independent_set did not reach a fixpoint in {max_iter} "
            "rounds; result would be missing still-active vertices"
        )
    return mis, lineage
