"""Topological layering / longest-path depth over a DAG, with cycle
detection — an iterative max-plus relaxation job.

Not in the reference (its graph is undirected); added because DAG
processing (dependency graphs between source files, build targets, data
lineage) is a first-class workload for a link-graph engine over
source-code repositories, and the layering doubles as a scalable cycle
DETECTOR: a max-plus relaxation converges within longest-path+1 rounds on
a DAG and grows forever on a cycle, so exceeding ``max_iter`` (chosen >
any plausible depth) is a positive cycle signal, raised — never a silent
partial result (the scc.py lesson).

Algorithm: bulk-synchronous Bellman-Ford in the (max, +) semiring.
layer(v) = 0 for sources (no in-edges); layer(v) = 1 + max over
in-neighbors, reached at fixpoint. Frontier-sparse: only vertices whose
layer GREW last round feed the next join, so late supersteps touch the
deep tail only, not O(E). Integer-only updates → EXACT and identical at
any parallelism.

Scale shape per round: one frontier-to-edges equi-join against the
(static, persisted, src-pre-partitioned) edge list + one
map-side-combinable max agg + one full_outer state merge keyed on id;
convergence read from the same O(P) metrics action that materializes the
round. Supersteps checkpoint through the CheckpointManager contract.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpointing import CheckpointManager, SuperstepCheckpoint
from ..lifecycle import free_local_checkpoint
from ..graph.csr import block_of


def longest_path_layers(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 100,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Return (``layers(id, layer)``, lineage) for the directed graph
    ``edges(src, dst)``: ``layer`` = length of the longest path ending at
    the vertex (0 for sources). Every vertex incident to an edge appears.
    Raises RuntimeError when ``max_iter`` rounds pass without fixpoint —
    on a graph with a reachable cycle this is guaranteed to fire (the
    relaxation grows without bound), making the raise the cycle verdict."""
    P = num_blocks or spark.sparkContext.defaultParallelism
    e = edges.select("src", "dst").distinct().repartition(F.col("src")).persist()

    verts = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    state = verts.select(
        "id", F.lit(0).cast("long").alias("layer"), F.lit(True).alias("grew")
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
                return state.select("id", "layer"), lineage
            start = latest + 1
    state = state.persist()

    for step in range(start, max_iter):
        t0 = time.time()
        frontier = state.filter("grew").select("id", "layer")
        cand = (
            e.join(frontier, e.src == frontier.id)
            .groupBy(e.dst.alias("id"))
            .agg(F.max(frontier.layer + 1).alias("cand"))
        )
        new_state = (
            state.select("id", "layer")
            .join(cand, "id", "left_outer")
            .select(
                "id",
                F.greatest(
                    F.col("layer"), F.coalesce(F.col("cand"), F.lit(0).cast("long"))
                ).alias("layer"),
                (F.coalesce(F.col("cand"), F.lit(0).cast("long")) > F.col("layer"))
                .alias("grew"),
            )
            .localCheckpoint(eager=False)
        )

        stats = (
            new_state.withColumn("block", block_of(F.col("id"), P))
            .groupBy("block")
            .agg(
                F.count("*").alias("rows"),
                F.sum(F.col("grew").cast("long")).alias("changed"),
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
            extra={"algorithm": "longest_path_layers"},
        )
        old = state
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
        e.unpersist()
        raise RuntimeError(
            f"longest_path_layers did not converge within max_iter={max_iter}: "
            "the graph contains a cycle reachable from a source, or its "
            "longest path exceeds max_iter"
        )

    out = state.select("id", "layer")
    e.unpersist()
    return out, lineage
