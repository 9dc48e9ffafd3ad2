"""Approximate Personalized PageRank by synchronous forward push.

The LOCAL-computation complement to :mod:`.ppr`'s exact engines, and the
realistic single-query path at 10^12-file scale: exact PPR iterates over
every edge every superstep (O(E·iters)); forward push (Andersen-Chung-Lang
2006, the algorithm behind every production local-PPR system) touches only
the neighborhood the random walk actually reaches. For one seed on a
trillion-edge graph that neighborhood is a vanishing fraction of the
corpus — the same frontier-sparse representation as :mod:`.sssp`: the
state holds ONLY touched vertices, and each superstep expands only edges
out of the frontier.

Semantics (same random walk as :mod:`.ppr` / SimpleGraph.kt, i.e. teleport
probability ``1-d`` to the normalized reset distribution, transition
``W[u,v]/strength(u)``): maintain estimates ``p`` and residuals ``r`` with
the ACL invariant  π = p + Σ_v r(v)·π_v.  A superstep pushes EVERY vertex
whose residual ≥ ``eps`` simultaneously (deterministic, unlike sequential
push — the set of pushed vertices is a pure function of the state):

    p(v) += (1-d)·r(v)                          [v in frontier]
    r(u) += d·r(v)·W(v,u)/strength(v)           [edges out of frontier]
    r(v)  = 0                                   [v in frontier]

Dangling frontier vertices (no out-edges — only isolated seeds can hold
mass here, since the adjacency is symmetric) teleport their pushed mass to
the reset distribution; that mass is aggregated in the superstep's metrics
collect and re-injected NEXT superstep as a literal-scaled reset term
(the same driver-literal pattern as :mod:`.hits` — never a crossJoin).

At convergence (no residual ≥ eps, no pending dangling mass) the additive
error obeys ‖π − p‖∞ ≤ ‖r‖₁ < eps·|touched|; shrink ``eps`` for accuracy,
grow it for locality. The superstep is union + aggregate over the state
leaf (the no-self-join formulation; see algo/hits.py on why), one action
per superstep, checkpointed through the same CheckpointManager contract —
a killed run resumes with the true frontier and pending dangling mass.
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


def ppr_forward_push(
    spark: SparkSession,
    adj: DataFrame,
    strength: DataFrame,
    reset_df: DataFrame,
    damping: float = 0.5,
    eps: float = 1e-4,
    max_iter: int = 200,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Return (``scores(id, estimate, residual)``, lineage) — one row per
    TOUCHED vertex. ``adj`` is the symmetric weighted adjacency
    (``graph.build.adjacency``), ``strength`` its ``(id, strength)`` row
    sums, ``reset_df`` the seed distribution ``(id, weight)`` (normalized
    here; non-positive rows dropped)."""
    P = num_blocks or spark.sparkContext.defaultParallelism
    d = float(damping)

    # normalized out-transition edges, compiled once (fixed leaf per run)
    adj_norm = (
        adj.join(strength.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.col("weight") / F.col("strength")).alias("wn"))
        # pre-partitioned on src: frontier joins never re-exchange O(E)
        .repartition(F.col("src"))
        .persist()
    )
    # normalized reset (id, rw); tiny — broadcast side of nothing, it only
    # ever appears as a union branch scaled by a driver literal
    reset = reset_df.filter(F.col("weight") > 0).select("id", "weight")
    total = reset.agg(F.sum("weight").alias("s")).collect()[0]["s"]
    if not total:
        raise ValueError("reset distribution has no positive mass")
    reset = reset.select("id", (F.col("weight") / F.lit(float(total))).alias("rw")).persist()
    # vertices with out-edges (non-dangling); dangling = touched minus these
    nondangling = strength.filter(F.col("strength") > 0).select(
        "id", F.lit(1).alias("_has_out")
    )

    state = reset.select("id", F.lit(0.0).alias("p"), F.col("rw").alias("r"))
    dmass = 0.0  # dangling mass pending re-injection via the reset term
    ckpt = None
    start = 0
    lineage: list[dict] = []
    if checkpoint_dir is not None:
        ckpt = CheckpointManager(checkpoint_dir, run_id or uuid.uuid4().hex[:12])
        latest = ckpt.latest_complete()
        if latest is not None:
            state, manifest = ckpt.load(spark, latest)
            dmass = float(manifest.get("dangling_pending", 0.0))
            lineage = ckpt.lineage()
            if manifest.get("converged"):
                return state.select("id", "estimate", "residual"), lineage
            start = latest + 1
            state = state.select(
                "id", F.col("estimate").alias("p"), F.col("residual").alias("r")
            )
    state = state.persist()

    for step in range(start, max_iter):
        t0 = time.time()
        frontier = state.filter(F.col("r") >= eps).select("id", "r")
        # settled rows keep sub-eps residual; frontier rows convert
        # (1-d)·r into estimate and zero their residual
        keep = state.select(
            "id",
            (
                F.col("p")
                + F.when(F.col("r") >= eps, (1.0 - d) * F.col("r")).otherwise(0.0)
            ).alias("p"),
            F.when(F.col("r") >= eps, 0.0).otherwise(F.col("r")).alias("r"),
        )
        contrib = (
            adj_norm.join(frontier.withColumnRenamed("id", "src"), "src")
            .select(
                F.col("dst").alias("id"),
                F.lit(0.0).alias("p"),
                (F.lit(d) * F.col("r") * F.col("wn")).alias("r"),
            )
        )
        resetin = reset.select(
            "id", F.lit(0.0).alias("p"), (F.lit(dmass) * F.col("rw")).alias("r")
        )
        new_state = (
            keep.unionByName(contrib)
            .unionByName(resetin)
            .groupBy("id")
            .agg(F.sum("p").alias("p"), F.sum("r").alias("r"))
            .localCheckpoint(eager=False)
        )

        # one action: per-block metrics over the new state (materializes
        # the checkpoint) + this round's dangling pushed mass (block -1)
        dangling_push = (
            state.filter(F.col("r") >= eps)
            .join(nondangling, "id", "left_outer")
            .filter(F.col("_has_out").isNull())
            .agg(F.sum(F.col("r") * F.lit(d)).alias("dm"))
            .select(
                F.lit(-1).alias("block"),
                F.lit(0).alias("rows"),
                F.lit(0).alias("next_frontier"),
                F.coalesce(F.col("dm"), F.lit(0.0)).alias("residual_l1"),
            )
        )
        stats = (
            new_state.withColumn("block", block_of(F.col("id"), P))
            .groupBy("block")
            .agg(
                F.count("*").alias("rows"),
                F.sum((F.col("r") >= eps).cast("long")).alias("next_frontier"),
                F.sum(F.abs(F.col("r"))).alias("residual_l1"),
            )
            .unionByName(dangling_push)
            .collect()
        )
        new_dmass = float(sum(r["residual_l1"] for r in stats if r["block"] == -1))
        next_frontier = int(sum(r["next_frontier"] for r in stats if r["block"] >= 0))
        residual_l1 = float(sum(r["residual_l1"] for r in stats if r["block"] >= 0))
        wall_ms = (time.time() - t0) * 1000
        # pending dangling mass re-enters residuals next round, so only a
        # frontier-free round with nothing pending is converged
        converged = next_frontier == 0 and new_dmass == 0.0

        meta = SuperstepCheckpoint(
            run_id=ckpt.run_id if ckpt else "in-memory",
            superstep=step,
            delta=residual_l1,
            converged=converged,
            wall_ms=wall_ms,
            partitions=[
                {
                    "block": r["block"],
                    "rows": r["rows"],
                    "frontier": r["next_frontier"],
                    "residual_l1": r["residual_l1"],
                }
                for r in stats
                if r["block"] >= 0
            ],
            extra={
                "algorithm": "ppr_forward_push",
                "eps": eps,
                "dangling_pending": new_dmass,
            },
        )
        old = state
        if ckpt is not None:
            ck_state = new_state.select(
                "id", F.col("p").alias("estimate"), F.col("r").alias("residual")
            )
            written = ckpt.write(ck_state, meta)
            free_local_checkpoint(new_state)
            state = written.select(
                "id", F.col("estimate").alias("p"), F.col("residual").alias("r")
            )
        else:
            state = new_state
            if not converged and (step + 1) % STATS_RESET_EVERY == 0:
                # bound localCheckpoint-carried sizeInBytes digit growth
                # (see fsio.truncate_stats)
                state = truncate_stats(new_state, "hipporag_push_state_")
                free_local_checkpoint(new_state)
        dmass = new_dmass
        old.unpersist()
        free_local_checkpoint(old)
        lineage.append(
            {"run_id": meta.run_id, "superstep": step, "frontier": next_frontier,
             "residual_l1": residual_l1, "converged": converged,
             "wall_ms": wall_ms, "partitions": meta.partitions}
        )
        if converged:
            break

    adj_norm.unpersist()
    reset.unpersist()
    return (
        state.select("id", F.col("p").alias("estimate"), F.col("r").alias("residual")),
        lineage,
    )
