"""Personalized PageRank as an iterative DataFrame job.

Semantics are the reference's own explicit spec of what igraph prpack
computes for HippoRAG (``/root/reference/kotlin/src/main/kotlin/hipporag/
graph/SimpleGraph.kt:130-182``; invocation ``HippoRAG.py:1599-1606``,
damping default 0.5 ``config_utils.py:180-183``):

    reset  sanitized (NaN/neg → 0, HippoRAG.py:1598), normalized to Σ=1,
           uniform if Σ=0
    r0[v]  = 1/n
    r'[v]  = (1-d)·reset[v] + d·danglingMass·reset[v]
             + d·Σ_u r[u]·W[u,v]/strength(u)
    stop   when Σ|r'-r| < tol   (tol 1e-6, ≤100 iters)

Two physical engines, same math:

- ``engine="csr"`` (default): per-block CSR SpMV via a cogrouped
  ``applyInPandas`` — ranks and CSR blocks meet on ``block = src % P``;
  contributions are pre-aggregated by dst INSIDE each block (NumPy bincount
  = map-side combine; equivalently a salted two-phase aggregate with the
  src-block as salt), so the global ``groupBy(dst).sum`` sees ≤ P rows per
  key no matter how extreme the hub skew.
- ``engine="dataframe"``: pure Catalyst plan — join + explicit salted
  two-phase aggregation — kept as a cross-check and a plan the optimizer
  can reason about end-to-end.

Each superstep runs exactly one action (a per-block metrics aggregate that
also yields the L1 delta and next dangling mass), then optionally persists
state + manifest through the CheckpointManager (resume contract).

Float64 throughout; scores sum to 1 at convergence like the reference.
"""

from __future__ import annotations

import time
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpointing import CheckpointManager, SuperstepCheckpoint
from ..graph.csr import block_of, compile_csr

EDGES_PER_BLOCK = 25_000


def default_num_blocks(n_edges: int, parallelism: int = 0) -> int:
    """Block count is a DATA property (≈ EDGES_PER_BLOCK adjacency rows per
    block), independent of cluster size.

    Measured on local mode: 32 blocks on a 170k-edge graph made each PPR
    superstep 2.5× slower than 8 blocks (more tasks + pandas workers than
    actual work); conversely, tying blocks to cores makes two cluster sizes
    run *different* physical plans, which both hurts the larger one and
    invalidates scaling comparisons. Blocks ≫ cores is fine — tasks queue.
    """
    return int(max(1, n_edges // EDGES_PER_BLOCK + 1))


def sanitize_reset(reset_df: DataFrame) -> DataFrame:
    """NaN / negative reset entries → 0 (``HippoRAG.py:1598``)."""
    v = F.col("weight").cast("double")
    clean = F.when(F.isnan(v) | v.isNull() | (v < 0), F.lit(0.0)).otherwise(v)
    return reset_df.select("id", clean.alias("weight"))


def _prep_reset(vertex_ids: DataFrame, n: int, reset_df: DataFrame | None) -> DataFrame:
    """Normalized reset probabilities as ``(id, reset)``, Σ=1.

    Zero / absent reset → uniform (SimpleGraph.kt:139-140). The returned
    frame is sparse (only nonzero entries) and usually tiny → broadcast at
    the join site.
    """
    if reset_df is not None:
        clean = sanitize_reset(reset_df).filter(F.col("weight") > 0)
        total = clean.agg(F.sum("weight")).collect()[0][0]
        if total and total > 0:
            return clean.select("id", (F.col("weight") / F.lit(float(total))).alias("reset"))
    return vertex_ids.select("id", F.lit(1.0 / n).alias("reset"))


def _spmv_csr(ranks_blocked, csr, damping: float, schema="dst long, partial double"):
    """Cogrouped per-block SpMV with in-block dst pre-aggregation."""

    def kernel(ranks_pdf: pd.DataFrame, csr_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(ranks_pdf) == 0 or len(csr_pdf) == 0:
            return pd.DataFrame({"dst": pd.Series(dtype="int64"), "partial": pd.Series(dtype="float64")})
        rid = ranks_pdf["id"].to_numpy()
        rval = ranks_pdf["value"].to_numpy()
        order = np.argsort(rid, kind="mergesort")
        rid, rval = rid[order], rval[order]
        outs = []
        for _, row in csr_pdf.iterrows():
            src_ids = np.asarray(row["src_ids"], dtype=np.int64)
            indptr = np.asarray(row["indptr"], dtype=np.int64)
            dst_ids = np.asarray(row["dst_ids"], dtype=np.int64)
            w_norm = np.asarray(row["w_norm"], dtype=np.float64)
            pos = np.searchsorted(rid, src_ids)
            pos_c = np.clip(pos, 0, len(rid) - 1)
            hit = rid[pos_c] == src_ids
            src_val = np.where(hit, rval[pos_c], 0.0)
            edge_val = np.repeat(src_val, np.diff(indptr))
            contrib = damping * edge_val * w_norm
            # in-block combine by dst (the salt phase of the two-phase agg)
            uniq_dst, inv = np.unique(dst_ids, return_inverse=True)
            sums = np.bincount(inv, weights=contrib)
            nz = sums != 0.0
            outs.append(pd.DataFrame({"dst": uniq_dst[nz], "partial": sums[nz]}))
        if not outs:
            return pd.DataFrame({"dst": pd.Series(dtype="int64"), "partial": pd.Series(dtype="float64")})
        return pd.concat(outs, ignore_index=True)

    return ranks_blocked.groupby("block").cogroup(csr.groupby("block")).applyInPandas(
        lambda left, right: kernel(left, right), schema=schema
    )


def personalized_pagerank_batch(
    spark: SparkSession,
    adj: DataFrame,
    strength_df: DataFrame,
    vertex_ids: DataFrame,
    reset_df: DataFrame,
    n_vertices: int | None = None,
    damping: float = 0.5,
    tol: float = 1e-6,
    max_iter: int = 100,
    num_blocks: int | None = None,
    csr: DataFrame | None = None,
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
    check_every: int = 1,
    engine: str = "csr",
) -> tuple[DataFrame, list[dict]]:
    """Multi-source PPR: one superstep loop scores Q queries at once.

    ``engine="dataframe"`` replaces the pandas SpMV with a pure-JVM
    join + partial-aggregate plan (whole-stage codegen; no Arrow transfer
    of the Q×V rank table per superstep) — preferable when Q is large.

    ``check_every``: run the convergence/metrics aggregate every K-th
    superstep (checkpoints follow the same cadence). Power iteration is a
    contraction, so overshooting by up to K-1 supersteps only tightens the
    result — the tol-1e-6 contract holds; skipped steps cost one
    materialization job instead of two. (With dangling vertices present, a
    small per-query dangling aggregate still runs on skipped steps — the
    next step's teleport term needs it.)

    ``reset_df``: ``(query_id, id, weight)``. Returns ranks
    ``(query_id, id, value)``. Each query's math is independent and matches
    :func:`personalized_pagerank` exactly; batching amortizes the per-
    superstep scheduling/shuffle cost across queries (the reference loops
    per query, ``HippoRAG.py:409-426``). Convergence = every query's L1
    delta < tol; per-query dangling mass rides in a driver dict refreshed
    by the same single metrics action.
    """
    n = n_vertices if n_vertices is not None else vertex_ids.count()
    if n == 0:
        return spark.createDataFrame([], "query_id string, id long, value double"), []
    P = num_blocks or spark.sparkContext.defaultParallelism
    if engine == "dataframe":
        shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
        adj_norm = (
            adj.join(strength_df, adj.src == strength_df.id)
            .select("src", "dst", (F.col("weight") / F.col("strength")).alias("w_norm"))
            .repartition(shuffle_p, "src")
            .persist()
        )
    elif csr is None:
        csr = compile_csr(adj, strength_df, P)

    # per-query sanitized + normalized reset (sum=1 within each query)
    clean = reset_df.select(
        "query_id", "id",
        F.when(
            F.isnan(F.col("weight").cast("double"))
            | F.col("weight").isNull()
            | (F.col("weight") < 0),
            F.lit(0.0),
        ).otherwise(F.col("weight").cast("double")).alias("weight"),
    ).filter(F.col("weight") > 0)
    totals = clean.groupBy("query_id").agg(F.sum("weight").alias("total"))
    reset = clean.join(totals, "query_id").select(
        "query_id", "id", (F.col("weight") / F.col("total")).alias("reset")
    )
    # queries whose reset is entirely zero/invalid → uniform reset
    # (SimpleGraph.kt:139-140 per query)
    all_qids = reset_df.select("query_id").distinct()
    zero_q = all_qids.join(totals, "query_id", "left_anti")
    # loop-invariant inputs: EAGER localCheckpoint, not just persist — a
    # caller-supplied reset can carry an arbitrarily deep lineage (the
    # retrieval scoring pipeline), and every superstep's plan would drag it
    # through analysis again
    reset = reset.unionByName(
        zero_q.crossJoin(vertex_ids).select(
            "query_id", "id", F.lit(1.0 / n).alias("reset")
        )
    ).localCheckpoint(eager=True)
    qids = [r["query_id"] for r in all_qids.collect()]

    dangling_ids = vertex_ids.join(
        strength_df.filter(F.col("strength") > 0), "id", "left_anti"
    ).localCheckpoint(eager=True)
    n_dangling = dangling_ids.count()

    qdf = spark.createDataFrame([(q,) for q in qids], "query_id string")
    ranks = qdf.crossJoin(vertex_ids).select(
        "query_id", "id", F.lit(1.0 / n).alias("value")
    )
    dangling_mass = {q: n_dangling / n for q in qids}

    ckpt = None
    start_step = 0
    lineage: list[dict] = []
    if checkpoint_dir is not None:
        ckpt = CheckpointManager(checkpoint_dir, run_id or uuid.uuid4().hex[:12])
        latest = ckpt.latest_complete()
        if latest is not None:
            ranks, manifest = ckpt.load(spark, latest)
            lineage = ckpt.lineage()
            if manifest.get("converged"):
                return ranks, lineage
            start_step = latest + 1
            dangling_mass = manifest["dangling_mass"]
    ranks = ranks.persist()

    def kernel(ranks_pdf: pd.DataFrame, csr_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"query_id": pd.Series(dtype="object"), "dst": pd.Series(dtype="int64"),
             "partial": pd.Series(dtype="float64")}
        )
        if len(ranks_pdf) == 0 or len(csr_pdf) == 0:
            return empty
        qcat = pd.Categorical(ranks_pdf["query_id"])
        qlabels = list(qcat.categories)
        nq = len(qlabels)
        rid = ranks_pdf["id"].to_numpy()
        uniq_ids, inv_ids = np.unique(rid, return_inverse=True)
        V = np.zeros((len(uniq_ids), nq))
        V[inv_ids, qcat.codes] = ranks_pdf["value"].to_numpy()
        outs = []
        for _, row in csr_pdf.iterrows():
            src_ids = np.asarray(row["src_ids"], dtype=np.int64)
            indptr = np.asarray(row["indptr"], dtype=np.int64)
            dst_ids = np.asarray(row["dst_ids"], dtype=np.int64)
            w_norm = np.asarray(row["w_norm"], dtype=np.float64)
            pos = np.searchsorted(uniq_ids, src_ids)
            pos_c = np.clip(pos, 0, len(uniq_ids) - 1)
            hit = uniq_ids[pos_c] == src_ids
            src_val = np.where(hit[:, None], V[pos_c], 0.0)  # (n_src, nq)
            reps = np.diff(indptr)
            uniq_dst, inv = np.unique(dst_ids, return_inverse=True)
            n_edges = len(dst_ids)
            # chunk the query axis to bound the (n_edges × q_chunk)
            # intermediate — large query batches stay within task memory
            q_chunk = max(1, int(20_000_000 / max(1, n_edges)))
            for qs in range(0, nq, q_chunk):
                qe = min(nq, qs + q_chunk)
                edge_val = np.repeat(src_val[:, qs:qe], reps, axis=0)
                contrib = damping * edge_val * w_norm[:, None]
                sums = np.zeros((len(uniq_dst), qe - qs))
                for qi in range(qe - qs):
                    sums[:, qi] = np.bincount(inv, weights=contrib[:, qi], minlength=len(uniq_dst))
                nz_rows, nz_cols = np.nonzero(sums)
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": [qlabels[qs + c] for c in nz_cols],
                            "dst": uniq_dst[nz_rows],
                            "partial": sums[nz_rows, nz_cols],
                        }
                    )
                )
        return pd.concat(outs, ignore_index=True) if outs else empty

    converged = False
    for step in range(start_step, max_iter):
        t0 = time.time()
        # per-query teleport term enters the aggregation as extra rows
        # (full outer joins can't broadcast; this keeps one shuffle/step)
        base_df = spark.createDataFrame(
            [(q, (1.0 - damping) + damping * dangling_mass[q]) for q in qids],
            "query_id string, base double",
        )
        reset_rows = reset.join(F.broadcast(base_df), "query_id").select(
            "query_id",
            F.col("id").alias("dst"),
            (F.col("base") * F.col("reset")).alias("partial"),
        )
        if engine == "dataframe":
            contribs = adj_norm.join(ranks, adj_norm.src == ranks.id).select(
                "query_id",
                "dst",
                (F.lit(damping) * F.col("value") * F.col("w_norm")).alias("partial"),
            )
            # (query_id, dst) composite key spreads hub-dst rows; partial
            # aggregation (map-side combine) handles the rest
            partials = contribs
        else:
            ranks_blocked = ranks.withColumn("block", block_of(F.col("id"), P))
            partials = (
                ranks_blocked.groupby("block")
                .cogroup(csr.groupby("block"))
                .applyInPandas(lambda l, r: kernel(l, r), "query_id string, dst long, partial double")
            )
        new_ranks = (
            partials.unionByName(reset_rows)
            .groupBy("query_id", "dst")
            .agg(F.sum("partial").alias("value"))
            .withColumnRenamed("dst", "id")
            .persist()
        )

        is_check = (step - start_step) % check_every == check_every - 1 or step == max_iter - 1
        if not is_check:
            # cheap step: materialize only; refresh dangling mass if needed
            if n_dangling > 0:
                drows = (
                    new_ranks.join(dangling_ids, "id", "left_semi")
                    .groupBy("query_id")
                    .agg(F.sum("value").alias("dm"))
                    .collect()
                )
                dangling_mass = {q: 0.0 for q in qids}
                for r in drows:
                    dangling_mass[r["query_id"]] = r["dm"]
            old = ranks
            ranks = new_ranks.localCheckpoint(eager=True)
            new_ranks.unpersist()
            old.unpersist()
            lineage.append(
                {"run_id": ckpt.run_id if ckpt else "in-memory", "superstep": step,
                 "delta": None, "converged": False,
                 "wall_ms": (time.time() - t0) * 1000, "partitions": []}
            )
            continue

        joined = (
            ranks.select("query_id", "id", F.col("value").alias("old"))
            .join(
                new_ranks.select("query_id", "id", F.col("value").alias("new")),
                ["query_id", "id"], "full_outer",
            )
            .join(dangling_ids.select("id", F.lit(1).alias("is_dangling")), "id", "left_outer")
        )
        metrics_rows = (
            joined.withColumn("block", block_of(F.col("id"), P))
            .groupBy("query_id", "block")
            .agg(
                F.count("*").alias("rows"),
                F.sum(
                    F.abs(F.coalesce(F.col("new"), F.lit(0.0)) - F.coalesce(F.col("old"), F.lit(0.0)))
                ).alias("delta"),
                F.sum(
                    F.when(F.col("is_dangling") == 1, F.coalesce(F.col("new"), F.lit(0.0))).otherwise(0.0)
                ).alias("dangling_mass"),
            )
            .collect()
        )
        deltas: dict[str, float] = {q: 0.0 for q in qids}
        dangling_mass = {q: 0.0 for q in qids}
        for r in metrics_rows:
            deltas[r["query_id"]] += r["delta"]
            dangling_mass[r["query_id"]] += r["dangling_mass"]
        delta = max(deltas.values()) if deltas else 0.0
        wall_ms = (time.time() - t0) * 1000
        converged = delta < tol

        meta = SuperstepCheckpoint(
            run_id=ckpt.run_id if ckpt else "in-memory",
            superstep=step,
            delta=delta,
            converged=converged,
            wall_ms=wall_ms,
            partitions=[
                {"query_id": r["query_id"], "block": r["block"], "rows": r["rows"], "delta": r["delta"]}
                for r in metrics_rows
            ],
            extra={
                "engine": "csr-batch", "damping": damping, "n_vertices": n,
                "n_queries": len(qids), "dangling_mass": dangling_mass,
                "per_query_delta": deltas,
            },
        )
        old = ranks
        if ckpt is not None:
            ranks = ckpt.write(new_ranks, meta)
            new_ranks.unpersist()
        else:
            ranks = new_ranks.localCheckpoint(eager=True)
            new_ranks.unpersist()
        old.unpersist()
        lineage.append(
            {"run_id": meta.run_id, "superstep": step, "delta": delta,
             "converged": converged, "wall_ms": wall_ms, "partitions": meta.partitions}
        )
        if converged:
            break

    reset.unpersist()
    dangling_ids.unpersist()
    return ranks, lineage


def personalized_pagerank(
    spark: SparkSession,
    adj: DataFrame,
    strength_df: DataFrame,
    vertex_ids: DataFrame,
    n_vertices: int | None = None,
    reset_df: DataFrame | None = None,
    damping: float = 0.5,
    tol: float = 1e-6,
    max_iter: int = 100,
    num_blocks: int | None = None,
    engine: str = "csr",
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
    csr: DataFrame | None = None,
    salt_buckets: int = 16,
) -> tuple[DataFrame, list[dict]]:
    """Run PPR to convergence; returns (ranks ``(id, value)``, lineage).

    ``checkpoint_dir`` enables per-superstep durability + resume: if a prior
    run under the same ``run_id`` left complete supersteps, iteration
    continues from the latest one.
    """
    n = n_vertices if n_vertices is not None else vertex_ids.count()
    if n == 0:
        return spark.createDataFrame([], "id long, value double"), []
    P = num_blocks or spark.sparkContext.defaultParallelism

    # loop-invariant inputs: EAGER localCheckpoint (materialize + truncate
    # lineage) so per-superstep plans don't re-analyze the caller's lineage
    reset = _prep_reset(vertex_ids, n, reset_df).localCheckpoint(eager=True)
    # dangling set: vertices with zero strength (SimpleGraph.kt:158-165);
    # its rank mass is tracked as a DRIVER scalar, updated inside each
    # superstep's single metrics action (no extra job per iteration)
    dangling_ids = vertex_ids.join(
        strength_df.filter(F.col("strength") > 0), "id", "left_anti"
    ).localCheckpoint(eager=True)
    n_dangling = dangling_ids.count()

    if engine == "csr":
        if csr is None:
            csr = compile_csr(adj, strength_df, P)
    else:
        shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # hash-partition the static edge side on the join key and CACHE it:
        # the InMemoryRelation advertises HashPartitioning(src), so each
        # superstep's join shuffles only the rank vector (O(V)), never the
        # edges (O(E)) — same trick as the CSR block cache.
        adj_norm = (
            adj.join(strength_df, adj.src == strength_df.id)
            .select("src", "dst", (F.col("weight") / F.col("strength")).alias("w_norm"))
            .repartition(shuffle_p, "src")
            .persist()
        )

    ckpt = None
    start_step = 0
    ranks = vertex_ids.select("id", F.lit(1.0 / n).alias("value"))
    dangling_mass = n_dangling / n  # init ranks are uniform
    lineage: list[dict] = []
    if checkpoint_dir is not None:
        ckpt = CheckpointManager(checkpoint_dir, run_id or uuid.uuid4().hex[:12])
        latest = ckpt.latest_complete()
        if latest is not None:
            ranks, manifest = ckpt.load(spark, latest)
            lineage = ckpt.lineage()
            if manifest.get("converged"):
                return ranks, lineage
            start_step = latest + 1
            dangling_mass = manifest["dangling_mass"]
    ranks = ranks.persist()

    converged = False
    for step in range(start_step, max_iter):
        t0 = time.time()
        # the reset/teleport term rides INTO the aggregation as extra rows
        # (weight = base·reset) instead of a full-outer join afterwards — a
        # full outer can never broadcast, so this removes one O(V) shuffle
        # join per superstep
        base = (1.0 - damping) + damping * dangling_mass
        reset_rows = reset.select(F.col("id").alias("dst"), (F.lit(base) * F.col("reset")).alias("partial"))
        if engine == "csr":
            ranks_blocked = ranks.withColumn("block", block_of(F.col("id"), P))
            partials = _spmv_csr(ranks_blocked, csr, damping)
            new_ranks = (
                partials.unionByName(reset_rows)
                .groupBy("dst")
                .agg(F.sum("partial").alias("value"))
                .withColumnRenamed("dst", "id")
                .persist()
            )
        else:
            contribs = adj_norm.join(ranks, adj_norm.src == ranks.id).select(
                "dst",
                (F.lit(damping) * F.col("value") * F.col("w_norm")).alias("c"),
                F.pmod(F.col("src"), F.lit(salt_buckets)).alias("salt"),
            )
            # explicit salted two-phase aggregation (hub-dst skew mitigation)
            new_ranks = (
                contribs.groupBy("dst", "salt")
                .agg(F.sum("c").alias("c1"))
                .unionByName(reset_rows.withColumnRenamed("partial", "c1").withColumn("salt", F.lit(-1)))
                .groupBy("dst")
                .agg(F.sum("c1").alias("value"))
                .withColumnRenamed("dst", "id")
                .persist()
            )

        # SINGLE action per superstep: per-block metrics + L1 delta + the
        # NEXT superstep's dangling mass, in one aggregate
        joined = (
            ranks.select("id", F.col("value").alias("old"))
            .join(new_ranks.select("id", F.col("value").alias("new")), "id", "full_outer")
            .join(dangling_ids.select("id", F.lit(1).alias("is_dangling")), "id", "left_outer")
        )
        metrics_rows = (
            joined.withColumn("block", block_of(F.col("id"), P))
            .groupBy("block")
            .agg(
                F.count("*").alias("rows"),
                F.sum(F.abs(F.coalesce(F.col("new"), F.lit(0.0)) - F.coalesce(F.col("old"), F.lit(0.0)))).alias("delta"),
                F.sum(F.coalesce(F.col("new"), F.lit(0.0))).alias("mass"),
                F.sum(
                    F.when(F.col("is_dangling") == 1, F.coalesce(F.col("new"), F.lit(0.0))).otherwise(0.0)
                ).alias("dangling_mass"),
            )
            .collect()
        )
        delta = float(sum(r["delta"] for r in metrics_rows))
        dangling_mass = float(sum(r["dangling_mass"] for r in metrics_rows))
        wall_ms = (time.time() - t0) * 1000
        converged = delta < tol

        meta = SuperstepCheckpoint(
            run_id=ckpt.run_id if ckpt else "in-memory",
            superstep=step,
            delta=delta,
            converged=converged,
            wall_ms=wall_ms,
            partitions=[
                {"block": r["block"], "rows": r["rows"], "delta": r["delta"], "mass": r["mass"]}
                for r in metrics_rows
            ],
            extra={
                "engine": engine,
                "damping": damping,
                "n_vertices": n,
                "dangling_mass": dangling_mass,
            },
        )
        old = ranks
        if ckpt is not None:
            # parquet write/read truncates lineage AND is the durability point
            ranks = ckpt.write(new_ranks, meta)
            new_ranks.unpersist()
        else:
            # EAGER lineage truncation every superstep: without it the
            # logical plan grows by one join+agg layer per iteration and
            # Catalyst re-analysis goes quadratic (observed: ~100 stages per
            # superstep once old caches are dropped)
            ranks = new_ranks.localCheckpoint(eager=True)
            new_ranks.unpersist()
        old.unpersist()
        lineage.append(
            {
                "run_id": meta.run_id, "superstep": step, "delta": delta,
                "converged": converged, "wall_ms": wall_ms,
                "partitions": meta.partitions,
            }
        )
        if converged:
            break

    reset.unpersist()
    dangling_ids.unpersist()
    return ranks, lineage
