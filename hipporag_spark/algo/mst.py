"""Minimum spanning forest via Borůvka rounds with star contraction.

Not in the reference (igraph answers ``spanning_tree`` single-node);
added because Borůvka is THE distributed MST algorithm (each round is
embarrassingly component-parallel and halves the component count, so
rounds ≤ log₂ V) and spanning structure is the standard backbone/
clustering primitive over a link graph at scale (single-linkage
clustering IS the MSF).

Determinism (SURVEY.md §7.3): edge keys are the total order
``(weight, a, b)`` — parallel edges collapse to their min key, every
component's outgoing-min is unique, so the forest is THE minimum
spanning forest under that order (unique even with tied weights) and
identical at any parallelism.

One Borůvka round, exactly as the DuckDB oracle replays it:

1. every live component picks its min outgoing edge key (two
   map-side-combinable ``min(struct)`` halves, keyed on component);
2. picked edges join the forest (dedup: an edge picked from both sides
   counts once);
3. components contract along picks by star contraction: parent(c) = the
   other endpoint's component of c's pick; the pick graph is a
   pseudoforest whose only cycles are mutual pairs, so breaking 2-cycles
   toward the smaller id (parent(c) = min(c, o(c)) iff o(o(c)) = c)
   makes it a forest of depth ≤ V, and pointer jumping
   (parent := parent(parent), log rounds) lands every component on its
   tree's root — the new label.

Scale shape per round: the edge relabel is two keyed joins against the
O(V) component map; the pick is a keyed agg; pointer jumping is
O(log V) self-joins of the O(#components) parent map — the edge list is
never shuffled on anything but its endpoint keys, hub skew spreads
across partitions, and the forest accumulator only ever grows by ≤ V−1
rows total. One metrics action per round doubles as the convergence
check. Non-fixpoint exhaustion raises (the scc.py lesson).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpointing import CheckpointManager, SuperstepCheckpoint
from ..fsio import truncate_stats
from ..lifecycle import free_local_checkpoint
from ..graph.csr import block_of


def _pointer_jump(parent: DataFrame, rounds: int) -> DataFrame:
    """parent(id → p) → root labels by repeated parent-of-parent.

    Each jump references the previous level TWICE (probe + build), so an
    unmaterialized chain doubles the plan per jump — 2^rounds copies of
    the parent subtree for Catalyst to analyze and execute (measured:
    73s → ~2s per Borůvka round on a 31-vertex graph). The level is an
    O(#components) map, so one tiny eager checkpoint per jump is the
    right trade at any scale."""
    parent = parent.localCheckpoint(eager=True)
    for _ in range(rounds):
        parent = (
            parent.alias("x")
            .join(
                parent.select(
                    F.col("id").alias("p"), F.col("p").alias("pp")
                ).alias("y"),
                "p",
            )
            .select(F.col("id"), F.col("pp").alias("p"))
            .localCheckpoint(eager=True)
        )
    return parent


def minimum_spanning_forest(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 50,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Return (``forest(a, b, weight)``, lineage): the minimum spanning
    forest of the undirected graph under ``edges(src, dst, weight)``
    (direction collapsed, parallel edges keep the min ``(weight, a, b)``
    key, self-loops dropped). Raises RuntimeError on iteration
    exhaustion."""
    P = num_blocks or spark.sparkContext.defaultParallelism
    e = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col("weight").cast("double").alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    verts = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .distinct()
    )
    n_verts = verts.count()
    jump_rounds = max(1, (n_verts - 1).bit_length())

    comp = verts.select("id", F.col("id").alias("label"))
    # empty frame CARRIES e's schema, so any orderable vertex type works
    # (dense long ids or raw strings alike)
    forest = e.select("a", "b", "w").limit(0)
    ckpt = None
    start = 0
    lineage: list[dict] = []
    if checkpoint_dir is not None:
        ckpt = CheckpointManager(checkpoint_dir, run_id or uuid.uuid4().hex[:12])
        latest = ckpt.latest_complete()
        if latest is not None:
            state, manifest = ckpt.load(spark, latest)
            lineage = ckpt.lineage()
            # one checkpointed frame holds both maps: rows with w NULL are
            # the component map (id, label), rows with w set are forest
            comp = state.filter(F.col("w").isNull()).select("id", "label")
            forest = state.filter(F.col("w").isNotNull()).select(
                F.col("id").alias("a"), F.col("label").alias("b"), "w"
            )
            if manifest.get("converged"):
                e.unpersist()
                return forest.select("a", "b", F.col("w").alias("weight")), lineage
            start = latest + 1
    comp = comp.persist()
    forest = forest.persist()
    prev_forest_rows = forest.count()

    for step in range(start, max_iter):
        t0 = time.time()
        ce = (
            e.join(comp.select(F.col("id").alias("a"), F.col("label").alias("ca")), "a")
            .join(comp.select(F.col("id").alias("b"), F.col("label").alias("cb")), "b")
            .filter(F.col("ca") != F.col("cb"))
        )
        cand = F.struct(F.col("w"), F.col("a"), F.col("b")).alias("k")
        picks = (
            ce.select(F.col("ca").alias("c"), cand, F.col("cb").alias("o"))
            .unionByName(ce.select(F.col("cb").alias("c"), cand, F.col("ca").alias("o")))
            .groupBy("c")
            .agg(F.min(F.struct(F.col("k"), F.col("o"))).alias("m"))
            .select(
                "c",
                F.col("m.k.w").alias("w"),
                F.col("m.k.a").alias("a"),
                F.col("m.k.b").alias("b"),
                F.col("m.o").alias("o"),
            )
            .persist()
        )
        new_edges = picks.select("a", "b", "w").distinct()

        # star contraction: break mutual pairs toward the min id, then jump
        mutual = picks.alias("p").join(
            picks.select(F.col("c").alias("o"), F.col("o").alias("oo")).alias("q"),
            "o",
        ).filter(F.col("oo") == F.col("c")).select("c")
        parent = (
            picks.join(mutual.withColumn("is_m", F.lit(True)), "c", "left_outer")
            .select(
                F.col("c").alias("id"),
                F.when(
                    F.col("is_m").isNotNull(), F.least(F.col("c"), F.col("o"))
                ).otherwise(F.col("o")).alias("p"),
            )
        )
        # finished components (no outgoing edge) keep themselves
        allc = comp.select(F.col("label").alias("id")).distinct()
        parent = (
            allc.join(parent, "id", "left_outer")
            .select("id", F.coalesce(F.col("p"), F.col("id")).alias("p"))
        )
        roots = _pointer_jump(parent, jump_rounds)
        new_comp = (
            comp.join(
                roots.select(F.col("id").alias("label"), F.col("p").alias("root")),
                "label",
            )
            .select("id", F.col("root").alias("label"))
        )
        new_forest = forest.unionByName(new_edges)

        merged_state = (
            new_comp.select("id", "label", F.lit(None).cast("double").alias("w"))
            .unionByName(
                new_forest.select(
                    F.col("a").alias("id"), F.col("b").alias("label"), "w"
                )
            )
            .localCheckpoint(eager=False)
        )
        stats = (
            merged_state.withColumn("block", block_of(F.col("id"), P))
            .groupBy("block")
            .agg(
                F.count("*").alias("rows"),
                F.sum(F.col("w").isNotNull().cast("long")).alias("forest_rows"),
            )
            .collect()
        )
        forest_rows = int(sum(r["forest_rows"] for r in stats))
        grew = forest_rows - prev_forest_rows
        prev_forest_rows = forest_rows
        wall_ms = (time.time() - t0) * 1000
        converged = grew == 0

        meta = SuperstepCheckpoint(
            run_id=ckpt.run_id if ckpt else "in-memory",
            superstep=step,
            delta=float(grew),
            converged=converged,
            wall_ms=wall_ms,
            partitions=[
                {"block": r["block"], "rows": r["rows"],
                 "forest_rows": r["forest_rows"]}
                for r in stats
            ],
            extra={"algorithm": "minimum_spanning_forest"},
        )
        old_comp, old_forest = comp, forest
        if ckpt is not None:
            state = ckpt.write(merged_state, meta)
            free_local_checkpoint(merged_state)
            comp = state.filter(F.col("w").isNull()).select("id", "label").persist()
            forest = state.filter(F.col("w").isNotNull()).select(
                F.col("id").alias("a"), F.col("label").alias("b"), "w"
            ).persist()
        else:
            # parquet round-trip, not localCheckpoint: (a) resets carried
            # sizeInBytes stats — the pointer jump SQUARES the estimate
            # per jump level and a checkpointed comp re-seeds the next
            # round with the product, the exact BigInteger digit-
            # compounding pathology fsio.truncate_stats documents
            # (measured here: a 3-round word-graph run stalled ~57s in
            # its FINAL round with zero active stages, all driver-side
            # planning); (b) truncates the forest's per-round union
            # lineage so later rounds never re-derive earlier picks
            comp = truncate_stats(new_comp, "hipporag_msf_comp_")
            forest = truncate_stats(new_forest, "hipporag_msf_forest_")
        picks.unpersist()
        old_comp.unpersist()
        old_forest.unpersist()
        free_local_checkpoint(old_comp)
        free_local_checkpoint(old_forest)
        lineage.append(
            {"run_id": meta.run_id, "superstep": step, "forest_edges": forest_rows,
             "grew": grew, "converged": converged, "wall_ms": wall_ms,
             "partitions": meta.partitions}
        )
        if converged:
            break
    else:
        e.unpersist()
        raise RuntimeError(
            f"minimum_spanning_forest did not converge within max_iter={max_iter}"
        )

    e.unpersist()
    return forest.select("a", "b", F.col("w").alias("weight")), lineage
