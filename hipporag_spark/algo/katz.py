"""Katz centrality as an iterative DataFrame job.

Not in the reference (igraph would expose it single-node; cf.
``SimpleGraph.kt``'s PPR being the only centrality the reference computes
— HippoRAG.py:889-905); same from-scratch distributed treatment as the
rest of the link-graph family (:mod:`.components`, :mod:`.hits`). Katz
completes the attenuation-based centralities: unlike PageRank it does not
normalize by out-degree, so prolific linkers confer full weight along
every edge — the standard "influence through all paths, damped by length"
score:

    x(v) ← β + α · Σ_{u→v} w(u,v) · x(u),      x₀(v) = β

which at convergence is x = β·(I − αAᵀ)⁻¹·1 (converges for
α < 1/λ_max(A); the fixed-round form the driver oracle replays is the
truncated path series Σ_k (αAᵀ)^k β·1 — deterministic at any
parallelism up to float associativity, compared at 6 dp).

Physical plan per superstep (identical discipline to
:mod:`.labelprop`):

- the O(E) directed edge table is pre-partitioned on ``src`` ONCE and
  cached — per-superstep joins re-exchange only the O(V) state;
- contribution sum is a two-phase (map-side combinable) ``groupBy(dst)``
  aggregate;
- EXACTLY ONE Spark action per superstep: the per-block stats collect
  (L1 delta) that also materializes the lazily local-checkpointed new
  state;
- ``truncate_stats`` every :data:`~..fsio.STATS_RESET_EVERY` rounds
  bounds Catalyst's localCheckpoint-carried sizeInBytes growth;
- supersteps checkpoint through the same
  :class:`~..checkpointing.CheckpointManager` contract as PPR/CC/LP, so
  a killed job resumes mid-iteration.

``tol=0.0`` forces exactly ``max_iter`` rounds (what the unrolled-CTE
driver oracle needs — same technique as ``hits``/``ppr_docs``).
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


def katz_centrality(
    spark: SparkSession,
    edges: DataFrame,
    vertex_ids: DataFrame,
    alpha: float = 0.1,
    beta: float = 1.0,
    max_iter: int = 50,
    tol: float = 1e-8,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Return (``scores(id, katz)``, lineage) over the DIRECTED weighted
    edge table ``edges(src, dst, weight)`` (parallel edges summed here).
    ``vertex_ids`` fixes the vertex set: a vertex with no in-edges scores
    exactly ``beta``. Converged when the L1 step delta < ``tol``."""
    P = num_blocks or spark.sparkContext.defaultParallelism
    adj = (
        edges.groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
        .repartition(F.col("src"))
        .persist()
    )

    state = vertex_ids.select("id", F.lit(float(beta)).alias("katz"))
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
                return state, lineage
            start = latest + 1
    state = state.persist()

    for step in range(start, max_iter):
        t0 = time.time()
        contrib = (
            adj.join(state, adj.src == state.id)
            .groupBy("dst")
            .agg(F.sum(F.col("weight") * F.col("katz")).alias("insum"))
            .withColumnRenamed("dst", "id")
        )
        new_state = (
            state.select("id")
            .join(contrib, "id", "left_outer")
            .select(
                "id",
                (
                    F.lit(float(beta))
                    + F.lit(float(alpha)) * F.coalesce(F.col("insum"), F.lit(0.0))
                ).alias("katz"),
            )
            # lazy checkpoint + metrics in the SAME action (one Spark
            # action per superstep; see components.py)
            .localCheckpoint(eager=False)
        )

        stats = (
            state.select("id", F.col("katz").alias("old"))
            .join(new_state.select("id", F.col("katz").alias("new")), "id")
            .withColumn("block", block_of(F.col("id"), P))
            .groupBy("block")
            .agg(
                F.count("*").alias("rows"),
                F.sum(F.abs(F.col("new") - F.col("old"))).alias("delta"),
            )
            .collect()
        )
        delta = float(sum(r["delta"] for r in stats))
        wall_ms = (time.time() - t0) * 1000
        converged = delta < tol

        meta = SuperstepCheckpoint(
            run_id=ckpt.run_id if ckpt else "in-memory",
            superstep=step,
            delta=delta,
            converged=converged,
            wall_ms=wall_ms,
            partitions=[
                {"block": r["block"], "rows": r["rows"], "delta": r["delta"]} for r in stats
            ],
            extra={"algorithm": "katz", "alpha": alpha, "beta": beta},
        )
        old = state
        if ckpt is not None:
            state = ckpt.write(new_state, meta)  # parquet-backed copy
            free_local_checkpoint(new_state)
        else:
            state = new_state
            if not converged and (step + 1) % STATS_RESET_EVERY == 0:
                # bound localCheckpoint-carried sizeInBytes digit growth
                state = truncate_stats(new_state, "hipporag_katz_state_")
                free_local_checkpoint(new_state)
        old.unpersist()
        free_local_checkpoint(old)
        lineage.append(
            {"run_id": meta.run_id, "superstep": step, "delta": delta,
             "converged": converged, "wall_ms": wall_ms, "partitions": meta.partitions}
        )
        if converged:
            break

    adj.unpersist()
    return state, lineage
