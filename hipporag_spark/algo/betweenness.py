"""Seeded (sampled) betweenness centrality — Brandes accumulation from a
fixed seed set, as iterative DataFrame jobs.

Not in the reference (its igraph object answers betweenness single-node,
``igraph.betweenness``); added on the same edge-table infrastructure as
the BASELINE.json algorithms because exact betweenness is all-pairs
(O(V·E), impossible at 10^12 edges) while the standard scalable estimator
(Brandes & Pich 2007, "Centrality Estimation in Large Networks") runs the
two Brandes phases from a small pivot/seed set and sums the dependencies:

    bc(v) = Σ_{s ∈ seeds, v ≠ s} δ_s(v)
    δ_s(v) = Σ_{w : d(w) = d(v)+1, v~w} σ_s(v)/σ_s(w) · (1 + δ_s(w))

Phase 1 per seed: frontier BFS computing hop distance AND σ (shortest-
path counts — integer sums of predecessor σ, exact). Phase 2: dependency
accumulation layer by layer, deepest first; each layer is one keyed join
between adjacent BFS layers (O(edges-between-layers) work, never O(V²)).

Scale shape: the edge table is pre-partitioned on ``src`` once and reused
by every superstep of every seed (frontier joins never re-exchange O(E));
per-superstep driver work is one O(P)-row metrics action; supersteps per
seed = 2·eccentricity(seed), small on the small-world graphs betweenness
sampling targets. Determinism: distances/σ are integers; δ arithmetic is
fixed-order float64 per layer — identical at any parallelism up to float
associativity in the per-vertex sums (driver oracles compare at 6 dp).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpointing import CheckpointManager, SuperstepCheckpoint
from ..lifecycle import free_local_checkpoint
from ..graph.csr import block_of

__all__ = ["seeded_betweenness"]


def _bfs_with_sigma(
    spark: SparkSession, edges: DataFrame, seed: int, max_depth: int
) -> tuple[DataFrame, int]:
    """Forward Brandes phase: returns (``reached(id, dist, sigma)``,
    eccentricity). σ is the number of distinct shortest s→v paths
    (float64 column holding exact integers — counts can exceed int64 on
    dense graphs long before float64 loses integer precision at 2^53)."""
    reached = spark.createDataFrame(
        [(int(seed), 0, 1.0)], "id long, dist int, sigma double"
    ).localCheckpoint(eager=True)
    frontier = reached
    depth = 0
    while depth < max_depth:
        nxt = (
            frontier.join(edges, frontier.id == edges.src)
            .groupBy(edges.dst.alias("nid"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(reached, F.col("nid") == reached.id, "left_anti")
            .select(
                F.col("nid").alias("id"),
                F.lit(depth + 1).cast("int").alias("dist"),
                "sigma",
            )
            .localCheckpoint(eager=False)
        )
        n_new = nxt.count()
        if n_new == 0:
            free_local_checkpoint(nxt)
            break
        depth += 1
        old = reached
        reached = reached.unionByName(nxt).localCheckpoint(eager=True)
        free_local_checkpoint(old)
        free_local_checkpoint(nxt)
        frontier = reached.filter(F.col("dist") == depth)
    return reached, depth


def _accumulate(edges: DataFrame, reached: DataFrame, depth: int) -> DataFrame:
    """Backward Brandes phase: returns ``delta(id, delta)`` for every
    reached vertex (0.0 for the deepest layer). Layer L's dependency needs
    only layer L+1's — one join per layer, deepest first."""
    deltas = reached.filter(F.col("dist") == depth).select(
        "id", F.lit(0.0).alias("delta")
    )
    prev_layer = reached.filter(F.col("dist") == depth).join(
        deltas, "id"
    )  # (id, dist, sigma, delta)
    out = deltas
    for L in range(depth - 1, -1, -1):
        layer = reached.filter(F.col("dist") == L)
        succ = prev_layer.select(
            F.col("id").alias("w"),
            F.col("sigma").alias("w_sigma"),
            F.col("delta").alias("w_delta"),
        )
        dl = (
            layer.join(edges, layer.id == edges.src)
            .join(succ, edges.dst == succ.w)
            .groupBy(layer.id)
            .agg(
                F.sum(
                    F.col("sigma") / F.col("w_sigma") * (1.0 + F.col("w_delta"))
                ).alias("contrib")
            )
        )
        layer_delta = (
            layer.select("id", "sigma")
            .join(dl, "id", "left_outer")
            .select("id", F.coalesce("contrib", F.lit(0.0)).alias("delta"))
            .localCheckpoint(eager=True)
        )
        prev_layer = layer.join(layer_delta, "id")
        out = out.unionByName(layer_delta)
    return out


def seeded_betweenness(
    spark: SparkSession,
    adj: DataFrame,
    seeds: list[int],
    max_depth: int = 64,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Return (``bc(id, betweenness)``, lineage): the summed Brandes
    dependency of every vertex reached at positive distance from ≥1 seed
    (seeds contribute to OTHER vertices' scores; a seed appears in the
    output only if another seed's BFS reaches it). ``adj`` is the
    symmetric adjacency for undirected semantics (pass a directed edge
    table for directed betweenness). Unweighted (hop) shortest paths.

    ``checkpoint_dir`` checkpoints at SEED granularity: the accumulated
    partial bc after each seed is durable, and a killed run resumes from
    the first unprocessed seed (per-superstep BFS state is cheap to
    recompute relative to one parquet round-trip per superstep at this
    state size; the per-seed manifest records the BFS supersteps run).

    Raises ``RuntimeError`` if a seed's BFS has not exhausted its
    component within ``max_depth`` supersteps (truncated σ would silently
    corrupt every downstream dependency).
    """
    P = num_blocks or spark.sparkContext.defaultParallelism
    edges = adj.select("src", "dst").repartition(F.col("src")).persist()

    bc: DataFrame | None = None
    start = 0
    lineage: list[dict] = []
    ckpt = None
    if checkpoint_dir is not None:
        ckpt = CheckpointManager(checkpoint_dir, run_id or uuid.uuid4().hex[:12])
        latest = ckpt.latest_complete()
        if latest is not None:
            bc, manifest = ckpt.load(spark, latest)
            lineage = ckpt.lineage()
            if manifest.get("converged"):
                edges.unpersist()
                return bc, lineage
            start = latest + 1

    for si in range(start, len(seeds)):
        s = seeds[si]
        t0 = time.time()
        reached, depth = _bfs_with_sigma(spark, edges, s, max_depth)
        if depth >= max_depth:
            edges.unpersist()
            raise RuntimeError(
                f"seed {s}: BFS still growing at max_depth={max_depth}; "
                "truncated sigma would corrupt the dependency accumulation"
            )
        deltas = _accumulate(edges, reached, depth)
        contrib = deltas.filter(F.col("id") != int(s)).filter(F.col("delta") > 0.0)
        new_bc = (
            contrib
            if bc is None
            else bc.unionByName(contrib)
            .groupBy("id")
            .agg(F.sum("delta").alias("delta"))
        ).localCheckpoint(eager=False)

        stats = (
            new_bc.withColumn("block", block_of(F.col("id"), P))
            .groupBy("block")
            .agg(F.count("*").alias("rows"), F.sum("delta").alias("mass"))
            .collect()
        )
        wall_ms = (time.time() - t0) * 1000
        converged = si == len(seeds) - 1
        meta = SuperstepCheckpoint(
            run_id=ckpt.run_id if ckpt else "in-memory",
            superstep=si,
            delta=float(sum(r["mass"] or 0.0 for r in stats)),
            converged=converged,
            wall_ms=wall_ms,
            partitions=[
                {"block": r["block"], "rows": r["rows"], "mass": r["mass"]}
                for r in stats
            ],
            extra={
                "algorithm": "seeded_betweenness",
                "seed": int(s),
                "bfs_supersteps": depth,
            },
        )
        old_bc = bc
        if ckpt is not None:
            bc = ckpt.write(new_bc, meta)
            free_local_checkpoint(new_bc)
        else:
            bc = new_bc
        if old_bc is not None:
            free_local_checkpoint(old_bc)
        free_local_checkpoint(reached)
        lineage.append(
            {"run_id": meta.run_id, "superstep": si, "seed": int(s),
             "bfs_supersteps": depth, "converged": converged,
             "wall_ms": wall_ms, "partitions": meta.partitions}
        )

    edges.unpersist()
    return bc.select("id", F.col("delta").alias("betweenness")), lineage
