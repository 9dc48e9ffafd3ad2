"""Packed per-block graph representation for iterative jobs.

Round-1 profiling showed the row-per-vertex superstep spends ~2.5 s of fixed
cost per iteration (task scheduling + Arrow per-row transfer + 3 shuffle
stages + 2 actions) on microseconds of math — adding cores made PPR *slower*.
This module packs everything into block-granular rows so a superstep moves
O(P + P²) rows of NumPy arrays instead of O(V + E) scalar rows:

- ``vstate``   — one row per block: the block's sorted vertex ids and the
  local indices of its dangling (zero-strength) vertices.
- ``subblocks`` — one row per (src_block, dst_block) pair with edges between
  them, with **precompiled local indices**: ``src_idx[e]`` indexes the src
  block's id list, ``dst_uniq``/``dst_inv`` give an in-block group-by(dst)
  (the map-side combine), ``w`` is the strength-normalized weight
  (``SimpleGraph.kt:158-174`` semantics: w/strength(src)).

A PPR/CC superstep is then exactly one Spark job: cogroup(ranks, subblocks)
→ per-block SpMV emitting *sparse pre-aggregated* partials keyed by dst
block (≤ min(E, P·V) values total regardless of skew — the src-block is the
salt of a two-phase aggregate) → cogroup(partials, runstate) which applies
reset/teleport, computes the per-block L1 delta + dangling mass + mass
metrics *in the same pass*, and emits the next packed rank vector.

Both static sides are hash-partitioned on the block key and cached, so each
superstep shuffles only the O(P) packed rank rows and O(P²) partial rows.
At 10^12-edge scale P grows with the data (EDGES_PER_BLOCK per block) and
per-task memory stays bounded by the block size, never the graph size.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..nputil import make_spill_dir
from .csr import block_of

# the superstep's dominant data movement is the partial-rank shuffle:
# bytes/superstep = P_src_blocks × nq × V × 8 — LINEAR in block count, so
# bigger blocks directly cut the engine's bottleneck. Measured on the
# E=8M V=500k Q=8 scaling workload at local[8]: 250k/block (P=32) 45.6s →
# 500k (P=16) 33.3s → 1M (P=8) 24.7s — 1.85× from block size alone. The
# ceiling is per-task memory (E/P×~16B edge arrays are mmapped, but the
# nq × V/P × 8B rank slice is live per task) and parallelism (P must stay
# ≥ the executor count to fill the cluster — at 10^12 edges P ≈ 10^6, so
# the knob only matters in the small-graph regime where P ≈ cores).
EDGES_PER_BLOCK = int(os.environ.get("SPARK_GRAFT_EDGES_PER_BLOCK", "1000000"))

# spill-dir lifecycle (atexit removal + dead-owner orphan sweep) lives in
# nputil.make_spill_dir


# the concatenated per-src-block arrays written by _spill_blocks and mapped
# back by algo.ppr's superstep kernel (one np.load(mmap_mode="r") per worker
# process per block; all workers share the same physical page-cache pages)
BLOCK_SPILL_ARRAYS = ("dblks", "eoff", "uoff", "src_idx", "w", "inv", "uniq")

VSTATE_SCHEMA = "block int, ids array<long>, dang array<int>"
SUBBLOCK_SCHEMA = (
    "block int, dblk int, src_idx array<int>, dst_uniq array<int>, "
    "dst_inv array<int>, w array<double>"
)


# routed block labels are searched only while the whole label table is a
# trivial driver collect; past this, blocks ≫ cores and hash collisions
# stop mattering (each core runs many tasks per stage, so a 2-block task
# averages out instead of gating the stage)
_ROUTE_MAX_BLOCKS = int(os.environ.get("SPARK_GRAFT_ROUTE_MAX_BLOCKS", "4096"))


def route_labels(spark, num_blocks: int) -> list[int] | None:
    """Block labels whose shuffle placement is a BIJECTION onto the loop's
    ``num_blocks`` partitions.

    Why: the superstep loop scopes ``spark.sql.shuffle.partitions`` to P
    and groups by the block column, so task placement is
    ``pmod(murmur3(block), P)``. With raw labels 0..P-1 that's balls-in-
    bins — at P=33, several partitions carry 2-3 blocks while others are
    empty, and each stage's wall is gated by the heaviest task. The
    straggler costs ~(max_load-1)/(P/cores) of the stage: ~6% at 2 cores
    (16 task waves absorb it) but ~20%+ at 8 cores (4 waves) — measured
    here as exactly the N→4N efficiency gap of the blocked engine.

    Fix: pick P integer labels with pairwise-distinct ``pmod(hash, P)``
    (first-fit over a small candidate scan, coupon-collector ≈ P·ln P
    candidates). Hash values come FROM Spark (``F.hash`` = the
    Murmur3Hash(seed=42) that HashPartitioning uses), so the bijection is
    exact by construction and deterministic across sessions — resume-safe.
    Returns None (identity labels) past :data:`_ROUTE_MAX_BLOCKS`."""
    P = int(num_blocks)
    if P <= 1 or P > _ROUTE_MAX_BLOCKS:
        return None
    rows = (
        spark.range(64 * P)
        .select(F.pmod(F.hash(F.col("id").cast("int")), F.lit(P)).alias("p"))
        .collect()
    )
    first: dict[int, int] = {}
    for i, r in enumerate(rows):
        if r["p"] not in first:
            first[r["p"]] = i
            if len(first) == P:
                break
    if len(first) < P:  # astronomically unlikely in 64·P candidates
        return None
    return [first[b] for b in range(P)]


def label_col(raw, labels: list[int] | None):
    """Map a raw 0..P-1 block column to its routed label (identity when
    routing is off). The array literal constant-folds."""
    if labels is None:
        return raw
    return F.element_at(F.array(*[F.lit(int(x)) for x in labels]), raw + 1).cast("int")


def default_num_blocks(n_edges: int) -> int:
    """Block count is a DATA property (~EDGES_PER_BLOCK adjacency rows per
    block), independent of cluster size: two cluster sizes must run the
    same physical plan for scaling comparisons to mean anything. Blocks ≫
    cores is fine — tasks queue.

    The ceiling is rounded UP to a power of two so the per-stage task
    count divides evenly into power-of-two core/executor counts (the
    shapes clusters actually come in). Wave quantization is otherwise a
    real scaling tax exactly when blocks ≈ cores: 33 blocks over 8 cores
    is 5 task waves with the last one 7/8 idle (~20% of the stage), vs
    17/16.5 ≈ 3% over 2 cores — measured as a 2→8 efficiency loss. Powers
    of two keep every wave full at any power-of-two parallelism while
    staying purely data-derived."""
    need = int(max(1, -(-n_edges // EDGES_PER_BLOCK)))
    return 1 << (need - 1).bit_length()


@dataclass
class BlockGraph:
    """Compiled, cached block structure shared by every superstep of every
    algorithm run on the graph (compile once per GraphState)."""

    num_blocks: int
    n_vertices: int
    n_dangling: int
    vstate: DataFrame  # VSTATE_SCHEMA, partitioned+cached on block
    subblocks: DataFrame  # SUBBLOCK_SCHEMA, partitioned+cached on block
    # worker-readable directory of the per-src-block packed arrays; the
    # superstep kernel mmaps these ONCE per worker instead of moving the
    # static graph through the cogroup shuffle + Arrow every iteration
    # (round-2 profiling: re-deserializing the cached subblocks cost more
    # per superstep than the SpMV itself). In local mode the dir is shared
    # by construction; on a multi-executor cluster the same layout lives on
    # a shared store (or executor-local disk — hash partitioning gives each
    # executor a stable block working set, so the mmap cache still hits).
    spill_dir: str | None = None
    # routed block labels (see route_labels): labels[b] is the label of
    # raw block b; None = identity (routing off past _ROUTE_MAX_BLOCKS)
    labels: list[int] | None = None

    def fanout_labels(self) -> list[int]:
        return self.labels if self.labels is not None else list(range(self.num_blocks))

    def unpersist(self) -> None:
        from ..lifecycle import free_local_checkpoint
        from ..nputil import release_spill_dir

        free_local_checkpoint(self.vstate)
        free_local_checkpoint(self.subblocks)
        # the packed edge arrays too: re-index()/delete() in a long-lived
        # session would otherwise leak a full RAM-backed spill dir per
        # recompile until process atexit (round-2 ADVICE). Callers release
        # a BlockGraph only once no run can still mmap it.
        if self.spill_dir is not None:
            release_spill_dir(self.spill_dir)
            self.spill_dir = None


def compile_blocks(
    adj: DataFrame,
    strength_df: DataFrame,
    vertex_ids: DataFrame,
    num_blocks: int,
) -> BlockGraph:
    """adjacency + strength + vertex ids → cached :class:`BlockGraph`.

    One-time cost: two E-row equi-joins (edge endpoints → block-local
    indices) and two grouped packing passes. Every superstep afterwards
    reuses the cached arrays.
    """
    spark = adj.sparkSession
    P = int(num_blocks)
    labels = route_labels(spark, P)

    v = (
        vertex_ids.select("id")
        .join(strength_df, "id", "left_outer")
        .select("id", F.coalesce("strength", F.lit(0.0)).alias("strength"))
        .withColumn("block", label_col(block_of(F.col("id"), P), labels))
    )

    def build_vstate(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", kind="mergesort")
        ids = pdf["id"].to_numpy(dtype=np.int64)
        dang = np.nonzero(pdf["strength"].to_numpy() <= 0.0)[0].astype(np.int32)
        return pd.DataFrame(
            {"block": [int(pdf["block"].iloc[0])], "ids": [ids], "dang": [dang]}
        )

    # eager localCheckpoint, not just persist: a cache is looked up by
    # logical plan, so every superstep would re-ANALYZE the full upstream
    # lineage (extraction pipelines have huge expression trees — measured
    # ~2s/superstep of pure analysis). Checkpointing truncates the plan to
    # a LogicalRDD while keeping the block hash-partitioning.
    # partitioned by (block, P): with routed labels this is exactly one
    # block per partition, which the superstep loop's P-scoped shuffle
    # reuses without a re-exchange and without balls-in-bins stragglers
    vstate = (
        v.groupBy("block")
        .applyInPandas(build_vstate, VSTATE_SCHEMA)
        .repartition(P, "block")
        .localCheckpoint(eager=True)
    )

    # id → (block, local index) lookup used to precompile edge indices
    vmap = vstate.select(
        "block", F.posexplode("ids").alias("idx", "id")
    )

    normed = adj.join(strength_df, adj.src == strength_df.id).select(
        "src", "dst", (F.col("weight") / F.col("strength")).alias("w_norm")
    )
    e = (
        normed.join(
            vmap.select(
                F.col("id").alias("src"),
                F.col("block").alias("sblk"),
                F.col("idx").alias("sidx"),
            ),
            "src",
        )
        .join(
            vmap.select(
                F.col("id").alias("dst"),
                F.col("block").alias("dblk"),
                F.col("idx").alias("didx"),
            ),
            "dst",
        )
        .select("sblk", "dblk", "sidx", "didx", "w_norm")
    )

    def build_sub(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic edge order → deterministic float accumulation
        pdf = pdf.sort_values(["sidx", "didx"], kind="mergesort")
        didx = pdf["didx"].to_numpy(dtype=np.int64)
        uniq, inv = np.unique(didx, return_inverse=True)
        return pd.DataFrame(
            {
                "block": [int(pdf["sblk"].iloc[0])],
                "dblk": [int(pdf["dblk"].iloc[0])],
                "src_idx": [pdf["sidx"].to_numpy(dtype=np.int32)],
                "dst_uniq": [uniq.astype(np.int32)],
                "dst_inv": [inv.astype(np.int32)],
                "w": [pdf["w_norm"].to_numpy(dtype=np.float64)],
            }
        )

    subblocks = (
        e.groupBy("sblk", "dblk")
        .applyInPandas(build_sub, SUBBLOCK_SCHEMA)
        .repartition(P, "block")
        .localCheckpoint(eager=True)
    )

    n_vertices = 0
    n_dangling = 0
    for r in vstate.select(F.size("ids").alias("nv"), F.size("dang").alias("nd")).collect():
        n_vertices += r["nv"]
        n_dangling += r["nd"]

    spill_dir = _spill_blocks(subblocks)
    _spill_dangling(vstate, spill_dir)

    return BlockGraph(
        num_blocks=P,
        n_vertices=n_vertices,
        n_dangling=n_dangling,
        vstate=vstate,
        subblocks=subblocks,
        spill_dir=spill_dir,
        labels=labels,
    )


def _spill_blocks(subblocks: DataFrame) -> str:
    """Concatenate each src block's subblock arrays and write them as
    worker-mappable ``.npy`` files: ``blk{b}.{name}.npy`` for name in
    :data:`BLOCK_SPILL_ARRAYS`. Executed BY the executors (one task per src
    block, already hash-partitioned), so no block ever transits the driver.

    Per block: ``dblks[j]`` is the j-th destination block, edges
    ``eoff[j]:eoff[j+1]`` of ``src_idx``/``w``/``inv`` belong to it, and its
    distinct local dst indices are ``uniq[uoff[j]:uoff[j+1]]`` (``inv`` is
    relative to that slice). Blocks with no out-edges write no file."""
    spill_dir = make_spill_dir("hipporag_blocks_")

    def write_block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("dblk", kind="mergesort")
        blk = int(pdf["block"].iloc[0])
        arrs = {
            "dblks": pdf["dblk"].to_numpy(dtype=np.int32),
            "src_idx": np.concatenate(
                [np.asarray(a, dtype=np.int32) for a in pdf["src_idx"]]
            ),
            "w": np.concatenate([np.asarray(a, dtype=np.float64) for a in pdf["w"]]),
            "inv": np.concatenate(
                [np.asarray(a, dtype=np.int32) for a in pdf["dst_inv"]]
            ),
            "uniq": np.concatenate(
                [np.asarray(a, dtype=np.int32) for a in pdf["dst_uniq"]]
            ),
        }
        arrs["eoff"] = np.concatenate(
            [[0], np.cumsum([len(a) for a in pdf["src_idx"]])]
        ).astype(np.int64)
        arrs["uoff"] = np.concatenate(
            [[0], np.cumsum([len(a) for a in pdf["dst_uniq"]])]
        ).astype(np.int64)
        for name, arr in arrs.items():
            # np.save(path) appends ".npy" to non-.npy names — write via the
            # file object so the tmp → final rename stays atomic
            tmp = f"{spill_dir}/.blk{blk}.{name}.npy.tmp"
            with open(tmp, "wb") as fh:
                np.save(fh, arr)
            os.replace(tmp, f"{spill_dir}/blk{blk}.{name}.npy")
        return pd.DataFrame({"block": [blk], "nedges": [len(arrs["src_idx"])]})

    subblocks.groupBy("block").applyInPandas(
        write_block, "block int, nedges long"
    ).collect()
    return spill_dir


def _spill_dangling(vstate: DataFrame, spill_dir: str) -> None:
    """Write each block's dangling local indices as ``blk{b}.dang.npy``
    next to the edge arrays. The SpMV kernel needs them to compute the
    block's dangling rank mass IN the dataflow (kind=2 partial rows), which
    is what lets supersteps chain into one Spark job with no per-step
    driver synchronization (see ``algo.ppr._ppr_blocked``). Written even
    for blocks with no out-edges — they still hold dangling mass."""

    def write_d(pdf: pd.DataFrame) -> pd.DataFrame:
        blk = int(pdf["block"].iloc[0])
        dang = np.asarray(pdf["dang"].iloc[0], dtype=np.int32)
        tmp = f"{spill_dir}/.blk{blk}.dang.npy.tmp"
        with open(tmp, "wb") as fh:
            np.save(fh, dang)
        os.replace(tmp, f"{spill_dir}/blk{blk}.dang.npy")
        return pd.DataFrame({"block": [blk]})

    vstate.groupBy("block").applyInPandas(write_d, "block int").collect()


RUNSTATE_SCHEMA = (
    "block int, ids array<long>, dang array<int>, "
    "qidx array<int>, ridx array<array<int>>, rval array<array<double>>"
)


def build_runstate(
    bg: BlockGraph,
    reset_rows: DataFrame | None,
    qids: list[str],
    uniform_q: set[str],
    n: int,
) -> DataFrame:
    """Per-block reset state for one PPR run: sparse per-query reset entries
    resolved to block-local indices, cached for the superstep loop.

    ``reset_rows``: normalized sparse ``(query_id, id, reset)`` (Σ=1 per
    query). Queries in ``uniform_q`` get the uniform 1/n reset applied as a
    scalar inside the superstep kernel (no dense array materialized).
    """
    spark = bg.vstate.sparkSession
    P = bg.num_blocks
    qpos = {q: i for i, q in enumerate(qids)}

    if reset_rows is None:
        reset_rows = spark.createDataFrame([], "query_id string, id long, reset double")
    rb = reset_rows.withColumn(
        "block", label_col(block_of(F.col("id"), P), bg.labels)
    )

    def kernel(vst_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(vst_pdf) == 0:
            return pd.DataFrame(
                columns=["block", "ids", "dang", "qidx", "ridx", "rval"]
            )
        ids = np.asarray(vst_pdf["ids"].iloc[0], dtype=np.int64)
        qidx, ridx, rval = [], [], []
        if len(r_pdf):
            r_pdf = r_pdf.sort_values(["query_id", "id"], kind="mergesort")
            for q, grp in r_pdf.groupby("query_id", sort=True):
                rid = grp["id"].to_numpy(dtype=np.int64)
                pos = np.searchsorted(ids, rid)
                qidx.append(qpos[q])
                ridx.append(pos.astype(np.int32))
                rval.append(grp["reset"].to_numpy(dtype=np.float64))
        return pd.DataFrame(
            {
                "block": [int(vst_pdf["block"].iloc[0])],
                "ids": [ids],
                "dang": [np.asarray(vst_pdf["dang"].iloc[0], dtype=np.int32)],
                "qidx": [np.asarray(qidx, dtype=np.int32)],
                "ridx": [ridx],
                "rval": [rval],
            }
        )

    return (
        bg.vstate.groupby("block")
        .cogroup(rb.groupby("block"))
        .applyInPandas(kernel, RUNSTATE_SCHEMA)
        .repartition(P, "block")
        .localCheckpoint(eager=True)
    )
