"""Blocked brute-force KNN + synonymy edge construction.

Reference kernel: normalized dense matmul with blocked two-level top-k
(``/root/reference/src/hipporag/utils/embed_utils.py:6-94`` — torch, GPU,
query batches × key blocks). Spark-first re-expression:

- items are hashed into B blocks; queries are REPLICATED to every block
  (a crossJoin with the tiny block-id table — no shuffle of the big side),
- a cogrouped ``applyInPandas`` computes the per-block NumPy matmul and
  keeps only the per-block top-k (bounds memory exactly like the
  reference's ``KNN_for_blocks`` two-level top-k),
- a per-query global top-k merges the ≤ B·k partials
  (``Window.partitionBy(query)`` + ``row_number``).

Wall-clock scales as |Q|·|I| / cluster-size with per-task memory bounded by
(block size × dim); at 100 TB the same plan holds with B sized so a block
fits an executor. Embeddings are unit-norm ⇒ dot = cosine.

Synonymy edge semantics (``HippoRAG.py:821-882``): self-KNN over entity
embeddings, keep score ≥ 0.8, ≤ 100 neighbors per query, only queries with
> 2 alphanumeric chars; edge weight = cosine score.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..keys import entity_key
from ..nputil import scratch as _scratch

SYNONYMY_THRESHOLD = 0.8  # config_utils.py:160-163
SYNONYMY_TOPK = 2047  # config_utils.py:148-151
SYNONYMY_MAX_NEIGHBORS = 100  # HippoRAG.py:867-880


def knn(
    queries: DataFrame,
    items: DataFrame,
    k: int,
    num_blocks: int = 8,
    exclude_self: bool = False,
) -> DataFrame:
    """Exact top-k by cosine: ``(query_key, item_key, score, rank)``.

    queries/items: ``(key, embedding: array<float>)``.
    """
    items_b = items.select(
        F.col("key").alias("ikey"),
        F.col("embedding").alias("iemb"),
        F.pmod(F.xxhash64("key"), F.lit(num_blocks)).cast("int").alias("block"),
    )
    blocks = items_b.sparkSession.range(num_blocks).select(F.col("id").cast("int").alias("block"))
    # spread the query side BEFORE replication: a single-file scan is one
    # partition, and the ×num_blocks crossJoin expansion (the serialization-
    # heavy step) must not run on one core; spread by the CLUSTER width
    # (capped), not the block count — r1 capped at num_blocks and
    # under-parallelized the expansion
    spread = min(max(num_blocks, queries.sparkSession.sparkContext.defaultParallelism), 64)
    queries_r = (
        queries.select(F.col("key").alias("qkey"), F.col("embedding").alias("qemb"))
        .repartition(spread)
        .crossJoin(F.broadcast(blocks))
    )

    def block_topk(q_pdf: pd.DataFrame, i_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(q_pdf) == 0 or len(i_pdf) == 0:
            return pd.DataFrame({"qkey": [], "ikey": [], "score": []})
        nq, ni = len(q_pdf), len(i_pdf)
        d = len(i_pdf["iemb"].iloc[0])
        # float64 accumulation: scores must agree with engine-independent
        # double-precision oracles at 1e-6 rounding. All large temporaries
        # (Q, Iᵀ, the score chunk) live in reusable worker scratch buffers
        # (nputil.scratch): the kernel's fresh per-call allocations were
        # ~200MB of mmap'd first-touch pages, the exact pattern this host
        # intermittently stalls 10-100× (measured: the same bench KNN
        # swings 14s ↔ 131s run-to-run before this change).
        Q = _scratch(("knn_q",), (nq, d))
        for i, a in enumerate(q_pdf["qemb"].values):
            Q[i] = a
        IT = _scratch(("knn_it",), (d, ni))
        for i, a in enumerate(i_pdf["iemb"].values):
            IT[:, i] = a
        qkeys = q_pdf["qkey"].to_numpy()
        ikeys = i_pdf["ikey"].to_numpy()
        # self-exclusion happens AFTER the per-chunk top-k by taking k+1
        # candidates: a full nq×ni key-equality mask is O(nq·ni) STRING
        # compares and dominated the kernel ~10× over the matmul in
        # profiling
        take = k + 1 if exclude_self else k
        kk = min(take, ni)
        # chunk the query axis: bounds the score matrix to chunk×ni
        # (exactly the reference's blocked two-level top-k,
        # embed_utils.py:36-75 — batch_size there, chunk here). ~250k
        # elements ≈ 2MB keeps argpartition's index output (the one
        # temporary NumPy cannot write into a caller buffer) far below the
        # host's large-allocation stall threshold.
        chunk = max(1, int(250_000 / max(1, ni)))
        S = _scratch(("knn_s",), (chunk, ni))
        outs = []
        for s in range(0, nq, chunk):
            m = min(chunk, nq - s)
            Sm = S[:m]
            np.matmul(Q[s : s + m], IT, out=Sm)
            # top-kk = the kk LARGEST: partition at ni-kk and keep the tail
            # (avoids materializing -S)
            idx = (
                np.argpartition(Sm, ni - kk, axis=1)[:, ni - kk :]
                if kk < ni
                else np.broadcast_to(np.arange(ni), (m, ni))
            )
            rows = np.repeat(np.arange(m), idx.shape[1])
            cols = idx.ravel()
            qk = qkeys[s : s + m][rows]
            ik = ikeys[cols]
            scores = Sm[rows, cols]
            if exclude_self:
                keep = qk != ik  # chunk·(k+1) compares, not chunk·ni
                qk, ik, scores = qk[keep], ik[keep], scores[keep]
            outs.append(
                pd.DataFrame({"qkey": qk, "ikey": ik, "score": scores.astype(np.float64)})
            )
        return pd.concat(outs, ignore_index=True)

    partials = (
        queries_r.groupby("block")
        .cogroup(items_b.groupby("block"))
        .applyInPandas(lambda l, r: block_topk(l, r), "qkey string, ikey string, score double")
    )
    w = Window.partitionBy("qkey").orderBy(F.desc("score"), F.asc("ikey"))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qkey").alias("query_key"),
            F.col("ikey").alias("item_key"),
            "score",
            "rank",
        )
    )


def synonymy_candidates(
    query_store: DataFrame,
    item_store: DataFrame,
    threshold: float = SYNONYMY_THRESHOLD,
    top_k: int = SYNONYMY_TOPK,
    max_neighbors: int = SYNONYMY_MAX_NEIGHBORS,
    num_blocks: int = 8,
) -> DataFrame:
    """Per-query top-k candidate synonymy edges ``(src, dst, weight)`` in
    key space — queries from ``query_store`` against ``item_store`` items.

    Both stores are ``(hash_id, content, embedding)``. Query phrases need
    > 2 alphanumeric chars (``HippoRAG.py:864``); self-pairs excluded.
    The incremental engine calls this with delta-sized query or item sets:
    a query's exact global top-k is recoverable by unioning per-item-subset
    top-k lists and re-ranking (:func:`rerank_synonymy`) because any member
    of the global top-k is in its own subset's top-k.
    """
    qualified = query_store.filter(
        F.length(F.regexp_replace("content", "[^A-Za-z0-9]", "")) > 2
    ).select(F.col("hash_id").alias("key"), "embedding")
    nn = knn(
        qualified,
        item_store.select(F.col("hash_id").alias("key"), "embedding"),
        k=min(top_k, max_neighbors),
        num_blocks=num_blocks,
        exclude_self=True,
    )
    return nn.filter(F.col("score") >= threshold).select(
        F.col("query_key").alias("src"),
        F.col("item_key").alias("dst"),
        F.col("score").alias("weight"),
    )


def rerank_synonymy(
    candidates: DataFrame, max_neighbors: int = SYNONYMY_MAX_NEIGHBORS
) -> DataFrame:
    """Global per-query top-``max_neighbors`` over (possibly unioned)
    candidate lists, tie-broken exactly like :func:`knn`'s window
    (score desc, key asc) → ``(src, dst, weight, etype)``."""
    w = Window.partitionBy("src").orderBy(F.desc("weight"), F.asc("dst"))
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= max_neighbors)
        .drop("rank")
        .withColumn("etype", F.lit("synonymy"))
    )


def synonymy_edges(
    entity_store: DataFrame,
    threshold: float = SYNONYMY_THRESHOLD,
    top_k: int = SYNONYMY_TOPK,
    max_neighbors: int = SYNONYMY_MAX_NEIGHBORS,
    num_blocks: int = 8,
) -> DataFrame:
    """Entity self-KNN → key-space edges ``(src, dst, weight, etype)``.

    entity_store: ``(hash_id, content, embedding)`` (entity namespace).
    """
    cands = synonymy_candidates(
        entity_store,
        entity_store,
        threshold=threshold,
        top_k=top_k,
        max_neighbors=max_neighbors,
        num_blocks=num_blocks,
    )
    return rerank_synonymy(cands, max_neighbors)
