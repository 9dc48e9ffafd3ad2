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


def ppr_push_localized(
    spark: SparkSession,
    adj: DataFrame,
    strength: DataFrame,
    reset_df: DataFrame,
    damping: float = 0.5,
    eps: float = 1e-4,
    max_outer: int = 100,
    max_sweeps: int = 100_000,
    prefetch_hops: int = 2,
    max_local_edges: int = 4_000_000,
) -> tuple[DataFrame, list[dict]]:
    """Forward push with the push loop as a LOCAL CSR kernel — the wall-
    clock-honest form of :func:`ppr_forward_push` (same ACL semantics,
    same error bound, different schedule).

    The distributed loop above pays a fixed multi-second floor of
    DataFrame/action overhead per superstep — measured at sf0.1 it LOST
    to exact blocked PPR (21.0s vs 19.2s) despite touching 1.2% of V,
    because 14 supersteps of orchestration swamped the 98.8% work
    reduction. Here the orchestration cost is proportional to the
    GATHER depth instead: the touched neighborhood's edges are fetched
    into one partition (``prefetch_hops`` shells per fetch) and the
    entire synchronous push runs to local convergence inside ONE
    ``applyInPandas`` task per outer round — the frontier never leaves
    the executor. Outer rounds = ceil(push radius / prefetch_hops), each
    one edge-fetch action + one kernel task + one O(1) convergence
    probe on the single-partition state.

    Why this is safe at 100 TB: ACL's work bound caps the non-
    speculative gathered volume at O(1/((1-d)·eps)) EDGE TRAVERSALS —
    independent of graph size — so the local subgraph is bounded by the
    accuracy knob, not by E. The ``max_local_edges`` guard makes the
    bound operational: if the gathered set (e.g. a hub inside the
    speculative prefetch shell) outgrows one partition's memory, the run
    FALLS BACK to the distributed superstep loop, which has no such
    limit. The per-fetch scan is a broadcast semi-join against the raw
    adjacency (no shuffle of E — unlike the distributed loop there is no
    compile/repartition step at all; with a bucketed store the fetch
    partition-prunes).

    Boundary vertices (out-edges not yet gathered) accumulate residual
    but never push, preserving the invariant π = p + Σ_v r(v)·π_v at
    every sweep; at convergence every vertex — gathered or boundary —
    holds r < eps, the same certificate as the distributed engine.
    Deterministic at any parallelism: ids are canonically sorted in the
    kernel, sweeps are synchronous, and the gathered set evolves by pure
    r ≥ eps thresholds. Returns ``(scores(id, estimate, residual),
    lineage)`` over TOUCHED vertices only."""
    import numpy as np
    import pandas as pd

    d = float(damping)
    # RAW edges only — no strength pre-join, no repartition: every fetch is
    # a broadcast semi-join that scans adj as-is (the caller's persisted
    # frame at bench scale; a bucketed store would partition-prune), and
    # the kernel normalizes locally — it holds EVERY out-edge of every
    # expanded vertex, so strength(src) is a local sum. Pre-shuffling E by
    # src (the distributed loop's compile step) would cost more than the
    # whole localized run.
    raw_edges = adj.select("src", "dst", "weight")
    reset = reset_df.filter(F.col("weight") > 0).select("id", "weight")
    rrows = reset.groupBy("id").agg(F.sum("weight").alias("w")).collect()
    total = float(sum(r["w"] for r in rrows))
    if not total:
        raise ValueError("reset distribution has no positive mass")
    reset_ids = np.array(sorted(int(r["id"]) for r in rrows), dtype=np.int64)
    rw_by_id = {int(r["id"]): float(r["w"]) / total for r in rrows}
    reset_ws = np.array([rw_by_id[int(i)] for i in reset_ids], dtype=np.float64)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        edges = pdf[pdf["tag"] == 0]
        st_in = pdf[pdf["tag"] == 1]
        sched = pdf[pdf["tag"] == 2]
        ids = np.unique(
            np.concatenate(
                [
                    st_in["x"].to_numpy(np.int64),
                    sched["x"].to_numpy(np.int64),
                    edges["x"].to_numpy(np.int64),
                    edges["y"].to_numpy(np.int64),
                    reset_ids,
                ]
            )
        )
        n = len(ids)
        p = np.zeros(n)
        r = np.zeros(n)
        expanded = np.zeros(n, dtype=bool)
        has_out = np.zeros(n, dtype=bool)
        si = np.searchsorted(ids, st_in["x"].to_numpy(np.int64))
        p[si] = st_in["v1"].to_numpy(np.float64)
        r[si] = st_in["v2"].to_numpy(np.float64)
        expanded[si] = st_in["f1"].to_numpy(np.int64) > 0
        has_out[si] = st_in["f2"].to_numpy(np.int64) > 0
        expanded[np.searchsorted(ids, sched["x"].to_numpy(np.int64))] = True
        esrc = np.searchsorted(ids, edges["x"].to_numpy(np.int64))
        edst = np.searchsorted(ids, edges["y"].to_numpy(np.int64))
        ew = edges["v1"].to_numpy(np.float64)
        # local normalization: the gathered set contains the FULL
        # out-neighborhood of every expanded vertex, so the row sum here
        # equals the global strength
        strength_loc = np.bincount(esrc, weights=ew, minlength=n)
        ewn = ew / strength_loc[esrc]
        has_out[np.unique(esrc)] = True
        ridx = np.searchsorted(ids, reset_ids)
        for _ in range(max_sweeps):
            active = expanded & (r >= eps)
            if not active.any():
                break
            ra = np.where(active, r, 0.0)
            p += (1.0 - d) * ra
            pushed = d * ra[esrc] * ewn
            r = (
                r
                - ra
                + np.bincount(edst, weights=pushed, minlength=n)
            )
            dmass = d * ra[active & ~has_out].sum()
            if dmass > 0.0:
                r[ridx] += dmass * reset_ws
        else:
            raise RuntimeError(
                f"local push kernel exceeded max_sweeps={max_sweeps}"
            )
        keep = expanded | (p != 0.0) | (r != 0.0)
        return pd.DataFrame(
            {
                "id": ids[keep],
                "p": p[keep],
                "r": r[keep],
                "expanded": expanded[keep].astype(np.int64),
                "has_out": has_out[keep].astype(np.int64),
            }
        )

    state_schema = "id long, p double, r double, expanded long, has_out long"
    # NO coalesce here: a coalesce(1) over a LocalRelation defeats the
    # LocalTableScan broadcast fast path, and every round-0 fetch/anti-join
    # that broadcasts a child of this frame then pays a multi-second
    # broadcast-job penalty (measured ~5s per occurrence on local[32])
    state = spark.createDataFrame(
        [(int(i), 0.0, rw_by_id[int(i)], 0, 0) for i in reset_ids], state_schema
    )
    gathered: DataFrame | None = None
    gathered_edges = 0
    lineage: list[dict] = []
    freeable: list[DataFrame] = []

    for step in range(max_outer):
        t0 = time.time()
        need = state.filter(
            (F.col("expanded") == 0) & (F.col("r") >= eps)
        ).select("id")
        # fetch the need shell plus (prefetch_hops - 1) speculative shells,
        # one broadcast semi-join scan of adj per hop; each hop's result is
        # tiny (ACL-bounded) and eagerly pinned so the next shell derives
        # from materialized rows, never a re-scan
        shells = [need]
        sched_frames = []
        known = state.select("id")
        n_new_edges = 0
        overflow = False
        hops = max(1, prefetch_hops)
        for hop in range(hops):
            cur = shells[-1]
            e = (
                raw_edges.join(
                    F.broadcast(cur.withColumnRenamed("id", "src")), "src"
                )
                .select(
                    F.lit(0).alias("tag"), F.col("src").alias("x"),
                    F.col("dst").alias("y"), F.col("weight").alias("v1"),
                )
                .coalesce(1)
                .localCheckpoint(eager=True)
            )
            freeable.append(e)
            n_new_edges += e.count()
            sched_frames.append(cur)
            gathered = e if gathered is None else gathered.unionByName(e)
            if gathered_edges + n_new_edges > max_local_edges:
                overflow = True
                break
            if hop == hops - 1:
                break  # the final hop's outgoing shell is never fetched
            known = known.unionByName(cur).distinct()
            nxt = (
                e.select(F.col("y").alias("id")).distinct()
                .join(known, "id", "left_anti")
                .coalesce(1)
                .localCheckpoint(eager=True)
            )
            freeable.append(nxt)
            shells.append(nxt)
        gathered_edges += n_new_edges
        if overflow:
            # the touched neighborhood outgrew one partition — hand the
            # whole query to the distributed superstep loop
            for f in freeable:
                free_local_checkpoint(f)
            scores, fb_lin = ppr_forward_push(
                spark, adj, strength, reset_df, damping=damping, eps=eps,
                max_iter=max(200, max_outer),
            )
            lineage.append(
                {"superstep": step, "fallback": "distributed",
                 "gathered_edges": gathered_edges,
                 "max_local_edges": max_local_edges}
            )
            return scores, lineage + fb_lin
        # kernel input: edges (tag 0, x=src, y=dst, v1=weight), state rows
        # (tag 1, x=id, v1=p, v2=r, f1=expanded, f2=has_out), scheduled
        # ids (tag 2, x=id)
        edges_part = gathered.select(
            "tag", "x", "y", "v1",
            F.lit(0.0).alias("v2"), F.lit(0).alias("f1"), F.lit(0).alias("f2"),
        )
        state_part = state.select(
            F.lit(1).alias("tag"), F.col("id").alias("x"),
            F.lit(None).cast("long").alias("y"),
            F.col("p").alias("v1"), F.col("r").alias("v2"),
            F.col("expanded").alias("f1"), F.col("has_out").alias("f2"),
        )
        sched_part = None
        for s in sched_frames:
            part = s.select(
                F.lit(2).alias("tag"), F.col("id").alias("x"),
                F.lit(None).cast("long").alias("y"), F.lit(0.0).alias("v1"),
                F.lit(0.0).alias("v2"), F.lit(0).alias("f1"),
                F.lit(0).alias("f2"),
            )
            sched_part = part if sched_part is None else sched_part.unionByName(part)
        # NOTE no coalesce(1) before the groupBy: the no-key groupBy already
        # funnels everything into one kernel task, and a coalesce over a
        # plan containing a LocalRelation costs ~4s of broadcast-path
        # penalty per action (measured on local[32])
        new_state = (
            edges_part.unionByName(state_part).unionByName(sched_part)
            .groupBy()
            .applyInPandas(lambda pdf: kernel(pdf), state_schema)
            .coalesce(1)
            .localCheckpoint(eager=True)
        )
        freeable.append(new_state)
        n_need = new_state.filter(
            (F.col("expanded") == 0) & (F.col("r") >= eps)
        ).count()
        state = new_state
        wall_ms = (time.time() - t0) * 1000
        converged = n_need == 0
        lineage.append(
            {"superstep": step, "gathered_edges": gathered_edges,
             "new_edges": n_new_edges, "need": n_need,
             "converged": converged, "wall_ms": wall_ms}
        )
        if converged:
            break
    else:
        for f in freeable:
            free_local_checkpoint(f)
        raise RuntimeError(
            f"ppr_push_localized did not converge within max_outer={max_outer}"
        )

    # the result depends only on the final checkpointed state — release
    # every intermediate payload/state block now
    for f in freeable:
        if f is not state:
            free_local_checkpoint(f)
    out = state.select(
        "id", F.col("p").alias("estimate"), F.col("r").alias("residual")
    ).filter((F.col("estimate") != 0.0) | (F.col("residual") != 0.0))
    return out, lineage
