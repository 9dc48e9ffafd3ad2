"""Deterministic random-walk generation (DeepWalk-style corpus sampling).

Not in the reference (HippoRAG scores with PPR directly; public practice
— DeepWalk/node2vec, Perozzi et al. 2014 — samples fixed-length walks
from every node and feeds them to an embedding trainer). Walk corpora
are the link-graph analog of the text pipeline's chunked training rows,
so this op belongs to both families: graph tier + training-data tier.

Classic walkers draw the next hop from an RNG; per SURVEY.md §7.3 every
operator here pins DETERMINISTIC semantics so results are exact and
partitioning-independent. The walker replaces the RNG with a keyed hash
draw (the same rehash-per-decision trick as ``ops/sampling.hash_split``):

    next(walk, t, v) = argmin_{u : v→u} H(walk_id ‖ ':' ‖ t ‖ ':' ‖ u)

Each (walk, step) re-ranks the out-neighbors with a fresh salt, so the
draw is uniform over neighbors in aggregate, independent across steps,
and reproducible bit-for-bit at any parallelism. A walk ENDS early at a
dangling vertex (no out-edges) — standard DeepWalk truncation.

``hash_fn="md5"`` (hex-string compare) exists for the DuckDB driver
oracle, which replays the identical argmin; the 100 TB default is
``xxhash64`` (8-byte JVM hash, no 32-char string materialization per
candidate edge).

Physical plan: the O(E) out-adjacency is deduped, pre-partitioned on
``src``, and cached ONCE; each of the ``length`` steps joins the O(W)
frontier (one row per live walk) against it and argmin-reduces per walk
via a two-phase ``min(struct(hash, dst))`` aggregate — map-side
combinable, no window, no sort. The loop runs ZERO driver actions: a
fixed-length walk needs no convergence test, so the whole corpus is one
declarative plan (depth = ``length`` joins) materialized by the caller's
single action. Frontier rows, not vertices, scale the work: W walks cost
O(W · avg_deg) candidate rows per step regardless of V.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _step_hash(fn: str, step: int, dst: Column) -> Column:
    salted = F.concat_ws(":", F.col("walk_id"), F.lit(str(step)), dst.cast("string"))
    if fn == "md5":
        return F.md5(salted.cast("binary"))
    if fn == "xxhash64":
        return F.xxhash64(salted)
    raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {fn!r}")


def random_walks(
    adj: DataFrame,
    seeds: DataFrame,
    length: int = 8,
    walks_per_seed: int = 1,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Return the walk corpus ``(walk_id, seed, step, vertex)`` — long
    format, one row per visited vertex, ``step`` 0..≤length (0 = seed;
    early rows only for walks that reached a dangling vertex).

    ``adj(src, dst, …)`` is the DIRECTED out-adjacency (any orderable
    vertex type — internal dense ids or raw strings); parallel edges are
    deduped (a hash draw over the neighbor SET). ``seeds`` has one
    ``vertex`` column; each seed starts ``walks_per_seed`` walks with
    ``walk_id = vertex ‖ '#' ‖ r`` so replicas diverge from step 1 (the
    hash is salted by walk_id)."""
    # vertex ids travel as strings (walk ids / hash salts are strings and
    # the corpus consumer is a sequence trainer); cast ONCE here so the
    # per-step join is a same-type equi-join, never an implicit
    # string↔bigint numeric-cast comparison
    edges = (
        adj.select(
            F.col("src").cast("string").alias("src"),
            F.col("dst").cast("string").alias("dst"),
        )
        .distinct()
        .repartition(F.col("src"))
        .persist()
    )
    replicas = seeds.sparkSession.range(walks_per_seed).select(
        F.col("id").cast("string").alias("r")
    )
    cur = (
        seeds.select(F.col("vertex").cast("string").alias("seed"))
        .distinct()
        .crossJoin(F.broadcast(replicas))
        .select(
            F.concat_ws("#", "seed", "r").alias("walk_id"),
            "seed",
            F.lit(0).alias("step"),
            F.col("seed").alias("vertex"),
        )
    )
    levels = [cur]
    for k in range(1, length + 1):
        h = _step_hash(hash_fn, k, F.col("dst"))
        cur = (
            cur.join(edges, cur.vertex == edges.src)
            .groupBy("walk_id", "seed")
            .agg(F.min(F.struct(h.alias("h"), F.col("dst").alias("d"))).alias("m"))
            .select(
                "walk_id", "seed", F.lit(k).alias("step"),
                F.col("m.d").cast("string").alias("vertex"),
            )
        )
        levels.append(cur)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
