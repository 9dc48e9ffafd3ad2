"""Deterministic random-walk generation (DeepWalk-style corpus sampling).

Not in the reference (HippoRAG scores with PPR directly; public practice
— DeepWalk/node2vec, Perozzi et al. 2014 — samples fixed-length walks
from every node and feeds them to an embedding trainer). Walk corpora
are the link-graph analog of the text pipeline's chunked training rows,
so this op belongs to both families: graph tier + training-data tier.

Classic walkers draw the next hop from an RNG; per SURVEY.md §7.3 every
operator here pins DETERMINISTIC semantics so results are exact and
partitioning-independent. The walker replaces the RNG with a keyed hash
draw over an INDEXED adjacency (the alias-table idea, hash-flavored):

    next(walk, t, v) = nbr(v)[ H(walk_id ‖ ':' ‖ t) mod deg(v) ]

where ``nbr(v)`` is v's out-neighbor list in ascending dst order. Each
(walk, step) rehashes with a fresh salt, so draws are uniform over
neighbors, independent across steps, and reproducible bit-for-bit at any
parallelism. A walk ENDS early at a dangling vertex (no out-edges) —
standard DeepWalk truncation.

The INDEX-LOOKUP draw is the scale-critical choice. The obvious
alternative — join the frontier to ALL out-edges of the current vertex
and argmin a per-neighbor hash — is degree-weighted: by the friendship
paradox walks concentrate on hubs, so each superstep joins
O(Σ_walks deg(v_t)) candidate rows. Measured on the synthetic repo graph
(E = 167k, V = 35k, 70k walks, local[32]) the argmin form exploded to
83M candidate rows per step — 260s for an 8-step corpus; the index form
probes exactly ONE row per live walk per step (~10s total, degree
distribution irrelevant). At 10^12 edges only the index form exists.

``hash_fn="md5"`` (first 8 hex chars as a 32-bit draw) exists for the
DuckDB driver oracle, which replays the identical index; the 100 TB
default is ``xxhash64``.

Physical plan: the adjacency is indexed once (one per-src window over E
— ascending dst), pre-partitioned on its probe keys ``(src, idx)`` and
cached, with the O(V) degree table pre-partitioned on ``src``; each of
the ``length`` steps shuffles only the O(W) frontier — first to fetch
deg (compute the draw), then to probe (src, idx) — never touching O(E).
Each frontier is EAGERLY materialized (one tiny action per step, the
same discipline as the convergence-checked iterative engines): step k
feeds both step k+1 and the final union, and within a single deferred
action the union's branches race and recompute the whole prefix chain —
lazy persist/localCheckpoint measured 112–350s for the 8-step corpus
where eager materialization runs it in ~10s.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _draw(fn: str, step: int, deg: Column) -> Column:
    """Deterministic uniform index in [0, deg) for (walk, step)."""
    salted = F.concat_ws(":", F.col("walk_id"), F.lit(str(step)))
    if fn == "md5":
        h = F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")
        return h % deg
    if fn == "xxhash64":
        return F.pmod(F.xxhash64(salted), deg)
    raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {fn!r}")


def random_walks(
    adj: DataFrame,
    seeds: DataFrame,
    length: int = 8,
    walks_per_seed: int = 1,
    hash_fn: str = "xxhash64",
    weighted: bool = False,
) -> DataFrame:
    """Return the walk corpus ``(walk_id, seed, step, vertex)`` — long
    format, one row per visited vertex, ``step`` 0..≤length (0 = seed;
    early rows only for walks that reached a dangling vertex).

    ``adj(src, dst, …)`` is the DIRECTED out-adjacency (any orderable
    vertex type — internal dense ids or raw strings); parallel edges are
    deduped (a draw over the neighbor SET). ``seeds`` has one ``vertex``
    column; each seed starts ``walks_per_seed`` walks with
    ``walk_id = vertex ‖ '#' ‖ r`` so replicas diverge from step 1 (the
    draw is salted by walk_id).

    ``weighted=True``: the next hop is drawn PROPORTIONALLY to the
    integral edge ``weight`` column (e.g. co-occurrence counts — the
    weight-respecting DeepWalk/node2vec sampling). Implementation is the
    word2vec unigram-table trick lifted to the indexed-adjacency draw:
    each edge occupies ``weight`` consecutive SLOTS of its source's
    index (one ``posexplode`` at build), the draw becomes
    ``slot = H(walk_id:step) mod W(v)`` with ``W(v)`` the total integer
    weight — still exactly ONE equi-join probe per live walk per step,
    hub-degree- AND weight-profile-independent, and still exactly
    replayable in SQL (``generate_series`` explode). Index size is
    Σ weight rows — the same table word2vec's sampler builds; weights
    must be positive integers (raises otherwise)."""
    # vertex ids travel as strings (walk ids / hash salts are strings and
    # the corpus consumer is a sequence trainer); cast ONCE here so the
    # per-step join is a same-type equi-join, never an implicit
    # string↔bigint numeric-cast comparison
    if weighted:
        und = (
            adj.select(
                F.col("src").cast("string").alias("src"),
                F.col("dst").cast("string").alias("dst"),
                F.col("weight").alias("w"),
            )
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
        bad = und.filter(
            (F.col("w") <= 0) | (F.col("w") != F.round("w"))
        ).limit(1).count()
        if bad:
            raise ValueError(
                "weighted random_walks requires positive integral edge weights"
            )
        und = und.withColumn("w", F.col("w").cast("long"))
        w = Window.partitionBy("src").orderBy("dst")
        # slot-expand: edge -> w consecutive slots; slot index = running
        # weight before this edge + offset within the edge
        cum = (
            und.withColumn(
                "hi",
                F.sum("w").over(w.rowsBetween(Window.unboundedPreceding, 0)),
            )
            .withColumn("lo", F.col("hi") - F.col("w"))
        )
        edges_idx = (
            cum.select(
                "src", "dst",
                F.explode(
                    F.sequence(F.col("lo"), F.col("hi") - 1)
                ).alias("idx"),
            )
            .repartition(F.col("src"), F.col("idx"))
            .persist()
        )
        deg = (
            und.groupBy("src")
            .agg(F.sum("w").alias("deg"))
            .repartition(F.col("src"))
            .persist()
        )
    else:
        und = adj.select(
            F.col("src").cast("string").alias("src"),
            F.col("dst").cast("string").alias("dst"),
        ).distinct()
        w = Window.partitionBy("src").orderBy("dst")
        edges_idx = (
            und.withColumn("idx", (F.row_number().over(w) - 1).cast("long"))
            .repartition(F.col("src"), F.col("idx"))
            .persist()
        )
        deg = (
            und.groupBy("src")
            .agg(F.count("*").alias("deg"))
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
        drawn = (
            cur.join(deg, cur.vertex == deg.src)
            .select(
                "walk_id", "seed", "vertex",
                _draw(hash_fn, k, F.col("deg")).alias("r"),
            )
        )
        cur = (
            drawn.join(
                edges_idx,
                (drawn.vertex == edges_idx.src) & (drawn.r == edges_idx.idx),
            )
            .select(
                "walk_id", "seed", F.lit(k).alias("step"),
                F.col("dst").alias("vertex"),
            )
            # EAGER: step k feeds both step k+1 and the final union, and
            # within one Spark action the union's branches race — a lazy
            # persist does not stop branch k from recomputing the whole
            # prefix chain (measured: lazy persist/localCheckpoint left
            # the 8-step corpus at 112–350s; eager O(W) materialization
            # runs it in ~10s). One tiny action per step is the same
            # discipline as every other iterative engine here.
            .localCheckpoint(eager=True)
        )
        levels.append(cur)
    # every level is eagerly localCheckpoint()ed, so the union's lineage no
    # longer references the adjacency index — release the per-call caches
    # (long-lived sessions otherwise accumulate one cached copy per call)
    edges_idx.unpersist()
    deg.unpersist()
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def ppr_monte_carlo(
    adj: DataFrame,
    seeds: DataFrame,
    walks_per_seed: int = 200,
    damping: float = 0.5,
    max_length: int = 16,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Monte-Carlo personalized PageRank from endpoint frequencies of
    restart-terminated walks (Fogaras et al. 2005 / Avrachenkov et al.):
    a walk continues from step t with probability ``damping`` (decided
    by a keyed hash draw, so the estimate is DETERMINISTIC for a given
    walk budget and reproducible at any parallelism) and its stopping
    vertex is one sample of the PPR distribution. Returns
    ``(id, est)`` with est = stopped-here fraction, an unbiased
    estimator whose error shrinks as 1/sqrt(walks_per_seed).

    This is the third PPR engine tier: exact blocked/broadcast power
    iteration (``algo/ppr``) for full vectors, forward push
    (``algo/ppr_push``) for one seed's neighborhood, and Monte-Carlo
    for cheap any-time estimates at extreme scale — walks cost
    O(walks · E[length]) probes TOTAL via the indexed-adjacency draw,
    independent of V and of hub degrees.

    Truncation at ``max_length`` (mass P(len > L) = damping^L — choose
    L for the target accuracy) assigns the rare surviving walks' mass to
    their last vertex, the standard truncated-walk estimator."""
    corpus = random_walks(
        adj, seeds, length=max_length, walks_per_seed=walks_per_seed,
        hash_fn=hash_fn,
    )
    # stop step: first t where the (walk, t) continue-draw fails, capped
    # by the walk's actual length (dangling truncation stops early too)
    stop_bucket = F.pmod(
        F.xxhash64(F.concat_ws("|", F.col("walk_id"), F.col("step"), F.lit("stop"))),
        F.lit(10_000),
    ) if hash_fn == "xxhash64" else (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("walk_id"), F.col("step"), F.lit("stop"))),
                1, 8,
            ), 16, 10,
        ).cast("long") % 10_000
    )
    cut = int(round(damping * 10_000))
    # the stop draw applies at EVERY visit including the seed itself:
    # P(stop at step t) = (1−damping)·damping^t, the exact geometric the
    # (1−α)Σα^t P(X_t=v) series integrates (a walk on a dangling-free
    # graph — e.g. any symmetric adjacency — never runs out of moves)
    marked = corpus.withColumn("stops", stop_bucket >= F.lit(cut))
    # per walk: the first stopping step, else the walk's last row
    stopped = (
        marked.groupBy("walk_id")
        .agg(
            F.min(F.when(F.col("stops"), F.struct("step", "vertex"))).alias("s"),
            F.max(F.struct("step", "vertex")).alias("last"),
        )
        .select(F.coalesce(F.col("s.vertex"), F.col("last.vertex")).alias("id"))
    )
    total = stopped.count()
    if total == 0:
        # empty seed set (or no surviving walks): an empty estimate frame,
        # never a division by zero producing NaN/Infinity rows
        return stopped.select(
            F.col("id"), F.lit(0.0).alias("est")
        ).limit(0)
    return (
        stopped.groupBy("id")
        .agg((F.count("*") / F.lit(float(total))).alias("est"))
    )
