"""Strongly connected components of a DIRECTED graph (exact).

Not in the reference (igraph answers it single-node); completes the
directed-graph family next to HITS. Algorithm: iterative min-label
COLORING (Orzan 2004 / the standard distributed SCC scheme — the
Fleischer-Hendrickson-Pinar forward-backward idea run for ALL pivots in
parallel):

outer round, over the ACTIVE vertex set:
  T. trim to fixpoint: a vertex with no active in-edge OR no active
     out-edge cannot sit in a size-≥2 SCC — emit it as a singleton and
     deactivate. Trimming alone resolves the acyclic bulk of real link
     graphs (which are mostly DAG); without it, pure coloring removes
     only the ROOT SCC of each color per round — adversarially linear on
     a chain. Each trim round is two cheap semi-joins + one anti-join.
  A. forward coloring to fixpoint:  color(v) ← min(color(v),
     min_{u→v, u active} color(u)), init color(v)=v, with a
     pointer-jumping shortcut round (color ← color(color) — sound here
     because color(v) is always an active ancestor-or-self of v, and an
     ancestor's ancestor is an ancestor). After the fixpoint, color(v) =
     the smallest active vertex that reaches v.
  B. backward marking within color: roots are {c : color(c)=c}; propagate
     reachability-to-root ALONG REVERSED edges but only between
     same-color endpoints. The marked set of color c is exactly SCC(c):
     marked ⇒ v →* c within color c and c →* v (that's what color(v)=c
     means) ⇒ mutual; conversely every w ∈ SCC(c) has color c (any
     active ancestor of w is an ancestor of all of SCC(c), so w's min
     ancestor is c's min ancestor = c) and reaches c.
  C. emit marked vertices with component = color; deactivate them.

Every outer round removes the trimmed singletons plus one whole SCC per
color root — on real graphs a handful of outer rounds (a pure DAG is
fully consumed by trimming). Worst case is a chain of SCCs each hiding
the next, bounded by ``max_outer`` (the same way plain min-label CC is
bounded by the diameter).

Scale shape: inner supersteps are the :mod:`.components` idiom — edge
table persisted PRE-PARTITIONED on the probe key (forward copy on src,
backward copy on dst), union+aggregate state updates, one action per
superstep, integer-only labels (exact at any parallelism). Checkpointing
is per outer round: the state parquet carries (id, component NULLABLE,
color, active), so a killed job resumes at the next outer round with all
prior assignments intact.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpointing import CheckpointManager, SuperstepCheckpoint
from ..lifecycle import free_local_checkpoint
from ..graph.csr import block_of


def strongly_connected_components(
    spark: SparkSession,
    edges: DataFrame,
    vertex_ids: DataFrame,
    max_outer: int = 50,
    max_inner: int = 200,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Return (``components(id, component)``, lineage) — component = min
    vertex id of the SCC (a canonical deterministic id). ``edges`` is a
    directed ``(src, dst, ...)`` table (weights ignored, parallel edges
    fine); ``vertex_ids`` fixes the vertex set (isolated vertices are
    singleton SCCs)."""
    P = num_blocks or spark.sparkContext.defaultParallelism
    fwd = edges.select("src", "dst").distinct().repartition(F.col("src")).persist()
    bwd = fwd.repartition(F.col("dst")).persist()

    # assigned: accumulated (id, component); active: still undecided
    assigned = None  # DataFrame | None
    active = vertex_ids.select("id").persist()
    ckpt = None
    start_outer = 0
    lineage: list[dict] = []
    if checkpoint_dir is not None:
        ckpt = CheckpointManager(checkpoint_dir, run_id or uuid.uuid4().hex[:12])
        latest = ckpt.latest_complete()
        if latest is not None:
            state, manifest = ckpt.load(spark, latest)
            lineage = ckpt.lineage()
            assigned = state.filter(F.col("component").isNotNull()).select(
                "id", "component"
            )
            if manifest.get("converged"):
                return assigned, lineage
            active.unpersist()
            active = state.filter(F.col("component").isNull()).select("id").persist()
            start_outer = latest + 1

    def _log(outer, phase, step, changed, stats, wall_ms, converged=False):
        lineage.append(
            {
                "run_id": ckpt.run_id if ckpt else "in-memory",
                "superstep": len(lineage),
                "outer": outer,
                "phase": phase,
                "inner": step,
                "changed": changed,
                "converged": converged,
                "wall_ms": wall_ms,
                "partitions": stats,
            }
        )

    for outer in range(start_outer, max_outer):
        # ---- phase T: trim singleton SCCs to fixpoint ----
        for step in range(max_inner):
            t0 = time.time()
            act_edges = (
                fwd.join(active.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(active.withColumnRenamed("id", "dst"), "dst", "left_semi")
            )
            keep = (
                active.join(
                    act_edges.select(F.col("src").alias("id")), "id", "left_semi"
                ).join(act_edges.select(F.col("dst").alias("id")), "id", "left_semi")
            )
            trimmed = active.join(keep, "id", "left_anti").select(
                "id", F.col("id").alias("component")
            ).localCheckpoint(eager=True)
            n_trim = trimmed.count()
            _log(outer, "trim", step, -n_trim, [], (time.time() - t0) * 1000)
            if n_trim == 0:
                free_local_checkpoint(trimmed)
                break
            prev_assigned = assigned
            assigned = (
                trimmed if assigned is None else assigned.unionByName(trimmed)
            ).localCheckpoint(eager=True)
            free_local_checkpoint(prev_assigned)
            free_local_checkpoint(trimmed)
            old_active = active
            # eager checkpoint: `active` chains across trim rounds and
            # outer rounds; without lineage truncation the plan doubles
            # per round (active appears in act_edges AND keep)
            active = old_active.join(keep.select("id"), "id", "left_semi").localCheckpoint(
                eager=True
            )
            old_active.unpersist()
            free_local_checkpoint(old_active)

        # ---- phase A: forward min-label coloring to fixpoint ----
        colors = active.select("id", F.col("id").alias("color")).persist()
        for step in range(max_inner):
            t0 = time.time()
            # src is restricted to active via the colors join; inactive dst
            # rows drop in the left_outer from colors (active-only rows) —
            # exactly the components.py superstep shape. (A unionByName+
            # groupBy formulation here trips a Spark 4.1 Catalyst
            # NoSuchElementException when the chained plan is
            # localCheckpoint'ed; the join-based shape is the proven one.)
            nbr_min = (
                fwd.join(colors.select(F.col("id").alias("src"), "color"), "src")
                .groupBy("dst")
                .agg(F.min("color").alias("nbr"))
                .withColumnRenamed("dst", "id")
            )
            new_colors = colors.join(nbr_min, "id", "left_outer").select(
                "id",
                F.least(
                    F.col("color"), F.coalesce(F.col("nbr"), F.col("color"))
                ).alias("color"),
            )
            # pointer-jump shortcut: color ← color(color)
            parent = new_colors.select(
                F.col("id").alias("pid"), F.col("color").alias("pcolor")
            )
            new_colors = (
                new_colors.join(parent, new_colors.color == parent.pid, "left_outer")
                .select("id", F.coalesce("pcolor", "color").alias("color"))
                .localCheckpoint(eager=False)
            )
            stats = (
                colors.select("id", F.col("color").alias("old"))
                .join(new_colors.select("id", F.col("color").alias("new")), "id")
                .withColumn("block", block_of(F.col("id"), P))
                .groupBy("block")
                .agg(
                    F.count("*").alias("rows"),
                    F.sum((F.col("old") != F.col("new")).cast("long")).alias("changed"),
                )
                .collect()
            )
            changed = int(sum(r["changed"] for r in stats))
            _log(outer, "forward", step,
                 changed,
                 [{"block": r["block"], "rows": r["rows"], "changed": r["changed"]} for r in stats],
                 (time.time() - t0) * 1000)
            old = colors
            colors = new_colors
            old.unpersist()
            free_local_checkpoint(old)
            if changed == 0:
                break

        # ---- phase B: backward marking within color ----
        marked = (
            colors.filter(F.col("id") == F.col("color"))
            .select("id", "color")
            .localCheckpoint(eager=True)
        )
        prev_n = marked.count()
        for step in range(max_inner):
            t0 = time.time()
            # mark src if an out-edge reaches a marked dst of the SAME color
            upstream = (
                bwd.join(
                    marked.select(F.col("id").alias("dst"), F.col("color").alias("mcolor")),
                    "dst",
                )
                .select(F.col("src").alias("id"), F.col("mcolor").alias("color"))
            )
            cand = (
                upstream.join(colors, ["id", "color"], "left_semi")
                .unionByName(marked)
                .distinct()
                .localCheckpoint(eager=False)
            )
            stats = (
                cand.withColumn("block", block_of(F.col("id"), P))
                .groupBy("block")
                .agg(F.count("*").alias("rows"))
                .collect()
            )
            n_new = int(sum(r["rows"] for r in stats))
            grew = n_new > prev_n
            _log(outer, "backward", step, n_new - prev_n,
                 [{"block": r["block"], "rows": r["rows"]} for r in stats],
                 (time.time() - t0) * 1000)
            old = marked
            marked = cand
            prev_n = n_new
            free_local_checkpoint(old)
            if not grew:
                break

        # ---- phase C: emit + deactivate ----
        done = marked.select("id", F.col("color").alias("component"))
        # eager: `assigned` must not lazily reference marked/colors blocks
        # that are freed below
        prev_assigned = assigned
        assigned = (
            done if assigned is None else assigned.unionByName(done)
        ).localCheckpoint(eager=True)
        free_local_checkpoint(prev_assigned)
        new_active = active.join(done.select("id"), "id", "left_anti").localCheckpoint(
            eager=True
        )
        n_active = new_active.count()
        converged = n_active == 0
        t0 = time.time()
        if ckpt is not None:
            state = assigned.select("id", "component").unionByName(
                new_active.select("id", F.lit(None).cast("long").alias("component"))
            )
            meta = SuperstepCheckpoint(
                run_id=ckpt.run_id,
                superstep=outer,
                delta=float(n_active),
                converged=converged,
                wall_ms=(time.time() - t0) * 1000,
                partitions=[],
                extra={"algorithm": "scc", "outer": outer, "active_left": n_active},
            )
            written = ckpt.write(state, meta)
            free_local_checkpoint(assigned)
            assigned = written.filter(F.col("component").isNotNull()).select(
                "id", "component"
            )
        _log(outer, "emit", 0, -n_active, [], (time.time() - t0) * 1000,
             converged=converged)
        colors.unpersist()
        free_local_checkpoint(colors)
        free_local_checkpoint(marked)
        old_active = active
        active = new_active
        old_active.unpersist()
        free_local_checkpoint(old_active)
        if converged:
            break

    fwd.unpersist()
    bwd.unpersist()
    return assigned.select("id", "component"), lineage
