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
  B. backward min-label within color: restrict edges to same-color
     endpoints and propagate bcolor(src) ← min(bcolor(src), bcolor(dst))
     along REVERSED edges with the same pointer-jump shortcut as A
     (sound symmetrically: bcolor(v) is a same-class descendant-or-self,
     and a descendant's descendant is a descendant). The jump shortcuts
     whenever labels form pointer chains; when the min label propagates
     against the id ordering (e.g. a directed cycle numbered along its
     edges) parents stay self-pointers until the wave arrives and rounds
     degrade to O(SCC diameter) — bounded by ``max_inner`` and raising
     loudly on exhaustion, never silently partial. At the fixpoint
     bcolor(v) = the smallest same-class vertex v reaches. The color root c is the
     minimum id of its class (color(u)=c ⇒ c ≤ u, and color(c)=c), so
     marked = {v : bcolor(v) = color(v)} is exactly SCC(c): bcolor(v)=c
     ⇒ v →* c within class, and color(v)=c ⇒ c →* v ⇒ mutual;
     conversely every w ∈ SCC(c) has color c (any active ancestor of w
     is an ancestor of all of SCC(c), so w's min ancestor is c's min
     ancestor = c) and reaches c, so bcolor(w)=c.
  C. emit marked vertices with component = color; deactivate them.

Inner fixpoints are VERIFIED, never assumed: if forward coloring or
backward labeling exhausts ``max_inner`` with changes still flowing, or
the outer loop exhausts ``max_outer`` with vertices still active, the
job raises :class:`SCCNonConvergenceError` instead of emitting partial
(silently wrong) components (ADVICE r3). The checkpoint manifest written
before the raise still carries ``converged=False``, so a resume with a
larger budget continues from completed outer rounds.

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
from ..fsio import STATS_RESET_EVERY, truncate_stats
from ..lifecycle import free_local_checkpoint
from ..graph.csr import block_of


class SCCNonConvergenceError(RuntimeError):
    """An inner fixpoint (forward coloring / backward labeling) or the
    outer loop exhausted its iteration budget before converging. Raised
    instead of emitting partial components, which would be silently
    wrong (a truncated backward pass splits one SCC across ids)."""


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
            if changed != 0 and (step + 1) % STATS_RESET_EVERY == 0:
                # bound localCheckpoint-carried sizeInBytes digit growth
                # (see fsio.truncate_stats)
                colors = truncate_stats(new_colors, "hipporag_scc_fwd_")
                free_local_checkpoint(new_colors)
            old.unpersist()
            free_local_checkpoint(old)
            if changed == 0:
                break
        else:
            raise SCCNonConvergenceError(
                f"forward coloring still changing after max_inner={max_inner} "
                f"rounds (outer round {outer}); raise max_inner — emitting "
                "would split SCCs across colors"
            )

        # ---- phase B: backward min-label within color (pointer-jumped) ----
        # same-class edge table, built once per outer round and
        # pre-partitioned on the per-superstep probe key (dst)
        # eager localCheckpoint, NOT a lazy persist: this 3-way inner join
        # would otherwise be re-planned inside every bcolor superstep, and
        # Catalyst's join sizeInBytes estimate (PRODUCT of children) then
        # compounds round-over-round into astronomically-digited BigInts —
        # the measured planning-time pathology documented in algo/hits.py.
        # Truncating lineage here makes each superstep plan against a
        # constant-stats leaf, the exact components.py/phase-A shape
        # (jstack evidence: BigInteger.multiplyToomCook3 under
        # SizeInBytesOnlyStatsPlanVisitor.visitJoin).
        cedges = (
            bwd.join(
                colors.select(F.col("id").alias("src"), F.col("color").alias("scolor")),
                "src",
            )
            .join(
                colors.select(F.col("id").alias("dst"), F.col("color").alias("dcolor")),
                "dst",
            )
            .filter(F.col("scolor") == F.col("dcolor"))
            .select("src", "dst")
            .repartition(F.col("dst"))
            .localCheckpoint(eager=True)
        )
        bcolors = colors.select("id", F.col("id").alias("bcolor")).localCheckpoint(
            eager=True
        )
        for step in range(max_inner):
            t0 = time.time()
            nbr_min = (
                cedges.join(bcolors.select(F.col("id").alias("dst"), "bcolor"), "dst")
                .groupBy("src")
                .agg(F.min("bcolor").alias("nbr"))
                .withColumnRenamed("src", "id")
            )
            new_b = bcolors.join(nbr_min, "id", "left_outer").select(
                "id",
                F.least(
                    F.col("bcolor"), F.coalesce(F.col("nbr"), F.col("bcolor"))
                ).alias("bcolor"),
            )
            # pointer-jump shortcut: bcolor ← bcolor(bcolor)
            parent = new_b.select(
                F.col("id").alias("pid"), F.col("bcolor").alias("pb")
            )
            new_b = (
                new_b.join(parent, new_b.bcolor == parent.pid, "left_outer")
                .select("id", F.coalesce("pb", "bcolor").alias("bcolor"))
                .localCheckpoint(eager=False)
            )
            stats = (
                bcolors.select("id", F.col("bcolor").alias("old"))
                .join(new_b.select("id", F.col("bcolor").alias("new")), "id")
                .withColumn("block", block_of(F.col("id"), P))
                .groupBy("block")
                .agg(
                    F.count("*").alias("rows"),
                    F.sum((F.col("old") != F.col("new")).cast("long")).alias("changed"),
                )
                .collect()
            )
            changed = int(sum(r["changed"] for r in stats))
            _log(outer, "backward", step, changed,
                 [{"block": r["block"], "rows": r["rows"], "changed": r["changed"]}
                  for r in stats],
                 (time.time() - t0) * 1000)
            old = bcolors
            bcolors = new_b
            if changed != 0 and (step + 1) % STATS_RESET_EVERY == 0:
                # bound localCheckpoint-carried sizeInBytes digit growth
                # (see fsio.truncate_stats)
                bcolors = truncate_stats(new_b, "hipporag_scc_bwd_")
                free_local_checkpoint(new_b)
            old.unpersist()
            free_local_checkpoint(old)
            if changed == 0:
                break
        else:
            raise SCCNonConvergenceError(
                f"backward labeling still changing after max_inner={max_inner} "
                f"rounds (outer round {outer}); raise max_inner — emitting "
                "would truncate an SCC into partial components"
            )
        free_local_checkpoint(cedges)
        marked = (
            bcolors.join(colors, "id")
            .filter(F.col("bcolor") == F.col("color"))
            .select("id", "color")
            .localCheckpoint(eager=True)
        )
        bcolors.unpersist()
        free_local_checkpoint(bcolors)

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
    else:
        raise SCCNonConvergenceError(
            f"max_outer={max_outer} outer rounds exhausted with vertices "
            "still active; the result would silently omit them — raise "
            "max_outer (checkpointed rounds resume with assignments intact)"
        )

    fwd.unpersist()
    bwd.unpersist()
    return assigned.select("id", "component"), lineage
