"""Similarity search over an embedding column (``array<float>``).

Two paths, mirroring the reference's exact-KNN kernel
(``/root/reference/src/hipporag/utils/embed_utils.py:6-94``) at pipeline
scale:

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  Expressed with ``zip_with``/``aggregate`` (JVM) so it is SQL-oracle
  matched; the query side broadcasts.
- ``lsh_topk``: random-hyperplane LSH bucketing as the scale path — only
  items sharing the query's sign-bucket are scored, trading recall for a
  1/2^planes candidate cut. Hyperplane components are deterministic
  pseudo-randoms derived from md5 (reproducible in any engine, no RNG
  state).

For exact KNN at corpus scale (queries == items) use
``retrieval.knn.knn`` — the blocked cogroup matmul.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact top-k neighbors per query: ``(query_id, vec_id, score, rank)``.

    ``embeddings``: (vec_id, embedding); ``queries``: (query_id, embedding).
    Broadcast the (small) query side; unit-norm ⇒ cosine = dot; scores
    rounded to 6dp (oracle float stability); ties → min vec_id.
    """
    q = queries.select(F.col("query_id"), F.col("embedding").alias("qemb"))
    scored = embeddings.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(_dot(F.col("embedding"), F.col("qemb")), 6).alias("score"),
    )
    scored = scored.filter(F.col("vec_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane(plane: int, dim: int):
    """Deterministic pseudo-random hyperplane component array (md5-derived,
    uniform in [-1, 1])."""
    return F.array(
        *[
            (
                F.conv(F.substring(F.md5(F.lit(f"plane:{plane}:{d}")), 1, 8), 16, 10)
                .cast("double")
                / F.lit(float(0x7FFFFFFF))
                - F.lit(1.0)
            )
            for d in range(dim)
        ]
    )


def lsh_bucket(emb_col, num_planes: int, dim: int):
    """Sign-pattern bucket id in [0, 2^num_planes)."""
    bucket = F.lit(0)
    for p in range(num_planes):
        bit = F.when(_dot(emb_col, hyperplane(p, dim)) >= 0, 1).otherwise(0)
        bucket = bucket * 2 + bit
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 3,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: score only within the query's LSH bucket.

    Same output shape as ``brute_force_topk``; at 100 TB the bucket column
    becomes the partition key of the stored index (partition-pruned scan
    per query batch).
    """
    items_b = embeddings.withColumn("bucket", lsh_bucket(F.col("embedding"), num_planes, dim))
    q_b = queries.select(
        "query_id", F.col("embedding").alias("qemb")
    ).withColumn("bucket", lsh_bucket(F.col("qemb"), num_planes, dim))
    scored = items_b.join(F.broadcast(q_b), "bucket").select(
        "query_id",
        "vec_id",
        F.round(_dot(F.col("embedding"), F.col("qemb")), 6).alias("score"),
    )
    scored = scored.filter(F.col("vec_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_index(
    embeddings: DataFrame,
    num_centroids: int = 16,
    lloyd_iters: int = 2,
    hash_fn: str = "xxhash64",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer + inverted lists — distributed Lloyd k-means,
    fully deterministic.

    Returns ``(centroids(cid, cemb), assigned(vec_id, embedding, cid))``.

    - Seeds: the ``num_centroids`` items with smallest ``hash(vec_id)``
      (content-addressed — identical at any cluster size, no RNG state),
      found by an adaptive hash-threshold filter: keep only rows whose
      hash falls below a cutoff sized for ~16·C expected survivors, then
      order just that O(C) candidate set. The full table is never sorted
      and never carries embeddings through a global ordering — at 100 TB
      the seeding cost is one count + one filtered scan. ``hash_fn`` =
      ``"xxhash64"`` (default) or ``"md5"`` (first 8 hex chars as a
      32-bit int — the DuckDB-replayable oracle mode, same convention as
      ``algo/walks``).
    - ``lloyd_iters`` k-means refinements, each one Spark pass: assign via
      broadcast centroid table + ``max_by`` argmax (cosine), then the
      element-wise member mean via ``posexplode`` + two-phase keyed
      aggregation (skew-safe: a hub centroid's rows spread over (cid, pos)
      composite keys), re-normalized to unit length. Means are rounded to
      9 dp BEFORE normalization: summation order differs across
      partitionings (and engines), and the 1e-9 grid absorbs the ~1e-16
      noise so centroid trajectories — hence assignments — are bit-stable
      at any parallelism and exactly replayable in the SQL oracle.
    - At 100 TB: ``cid`` is the storage partition key of the inverted
      lists; only the centroid table (C×dim doubles) ever reaches the
      driver.
    """
    items = embeddings.select("vec_id", "embedding")
    cents = _seed_centroids(items, num_centroids, hash_fn=hash_fn)
    for _ in range(lloyd_iters):
        assigned = _assign(items, cents)
        summed = (
            assigned.select("cid", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("v"), 9).alias("v"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
            .select("cid", F.transform("pv", lambda s: s["v"]).alias("cemb"))
        )
        norm = F.sqrt(_dot(F.col("cemb"), F.col("cemb")))
        cents = summed.select(
            "cid",
            F.transform("cemb", lambda x: x / norm).alias("cemb"),
        )
    return cents, _assign(items, cents)


def _seed_centroids(
    items: DataFrame, num_centroids: int, hash_fn: str = "xxhash64"
) -> DataFrame:
    """Deterministic seed selection with NO global sort.

    Uniform hash keys + an adaptive cutoff: only rows whose hash
    lands in the bottom ``frac`` of the int64 range survive the filter, so
    the subsequent ordering touches O(num_centroids) rows regardless of
    table size. ``frac`` starts at 16·C/n (≥16× expected survivors — the
    probability of an undershoot is Chernoff-negligible) and widens 4× on
    the rare undershoot; the loop is bounded by frac reaching 1.0, where
    the filter is a no-op and correctness degrades to the tiny-table case.
    """
    n = items.count()
    frac = min(1.0, (num_centroids * 16) / max(n, 1))
    if hash_fn == "md5":
        hcol = F.conv(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        lo, span = 0, 2**32
    elif hash_fn == "xxhash64":
        hcol = F.xxhash64(F.col("vec_id").cast("string"))
        lo, span = -(2**63), 2**64
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    hashed = items.withColumn("h", hcol)
    while True:
        cutoff = min(int(lo + frac * span), lo + span - 1)
        cand = hashed.filter(F.col("h") <= F.lit(cutoff))
        if frac >= 1.0 or cand.count() >= num_centroids:
            break
        frac = min(1.0, frac * 4)
    return (
        cand.orderBy("h", "vec_id")
        .limit(num_centroids)
        .select(
            F.row_number().over(Window.orderBy("h", "vec_id")).alias("cid"),
            F.col("embedding").alias("cemb"),
        )
    )


def _assign(items: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast cross-score + max_by argmax
    (cosine desc, cid asc — deterministic ties)."""
    scored = items.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "cid",
        _dot(F.col("embedding"), F.col("cemb")).alias("cs"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.first("embedding").alias("embedding"),
            F.max(F.struct(F.col("cs"), (-F.col("cid")).alias("nc"))).alias("m"),
        )
        .select("vec_id", "embedding", (-F.col("m.nc")).alias("cid"))
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 2,
    lloyd_iters: int = 2,
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` nearest inverted lists.

    Same output shape/rounding/tie rules as :func:`brute_force_topk`, so
    ``nprobe == num_centroids`` is EXACTLY the brute-force result (the
    pytest oracle). Pass a prebuilt ``index`` (from :func:`ivf_index`) to
    amortize the build across query batches.
    """
    cents, assigned = index if index is not None else ivf_index(
        embeddings, num_centroids, lloyd_iters
    )
    q = queries.select("query_id", F.col("embedding").alias("qemb"))
    probe_w = Window.partitionBy("query_id").orderBy(F.desc("qcs"), F.asc("cid"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select("query_id", "qemb", "cid", _dot(F.col("qemb"), F.col("cemb")).alias("qcs"))
        .withColumn("pr", F.row_number().over(probe_w))
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "qemb", "cid")
    )
    scored = assigned.join(F.broadcast(probes), "cid").select(
        "query_id",
        "vec_id",
        F.round(_dot(F.col("embedding"), F.col("qemb")), 6).alias("score"),
    )
    scored = scored.filter(F.col("vec_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
