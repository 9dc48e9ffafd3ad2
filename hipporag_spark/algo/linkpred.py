"""Link prediction scores over the edge table (exact, one relational job).

Classic neighborhood-overlap link predictors — common-neighbor count,
Jaccard coefficient, Adamic-Adar, preferential attachment — for every
NON-adjacent vertex pair that shares at least one neighbor. Not in the
reference (its igraph object exposes `similarity_jaccard` single-node;
BASELINE.json's link-graph family gets the distributed treatment here).

This is NOT an iterative job: it is a single declarative plan —
wedge enumeration (two-hop self-join through the shared neighbor),
per-pair aggregation, degree joins, adjacency anti-join — that Catalyst
plans end to end, so AQE handles skewed wedge centers at runtime.

Scale semantics (the part that matters at 10^12 edges):

- **Wedge work is Σ_w deg(w)·(deg(w)−1)/2** — inherent to the exact
  semantics, and quadratic in hub degree. ``max_center_degree`` caps the
  wedge centers considered (a hub shared by millions of pairs carries
  ~zero signal for every predictor here: its Adamic-Adar weight
  1/ln(deg) → 0, and its Jaccard contribution is diluted by the union);
  production link-prediction systems cap or sample hubs for exactly
  this reason. The cap changes the OUTPUT (documented, opt-in), so the
  driver oracle runs uncapped.
- **No driver-side loops, no broadcast of V-sized state.** Degrees join
  by key (shuffle-partitioned); nothing assumes the vertex set fits
  anywhere.
- **Determinism.** Common-neighbor counts and degrees are integers —
  exact at any parallelism. Adamic-Adar is a float sum whose addend
  order varies with partitioning; ties and comparisons in this module
  therefore always use integer keys (cn, then vertex ids), never the
  float.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def link_prediction_scores(
    adj: DataFrame,
    min_common: int = 1,
    max_center_degree: int | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """Return ``(u, v, common_neighbors, jaccard, adamic_adar,
    preferential_attachment)`` for every non-adjacent pair ``u < v`` with
    ``common_neighbors >= min_common``.

    ``adj`` is a symmetric adjacency (``graph.build.adjacency`` output or
    any ``(src, dst, …)`` table containing both directions of each
    undirected edge); weights are ignored — these are the standard
    unweighted predictors (NetworkX ``jaccard_coefficient`` /
    ``adamic_adar_index`` semantics).

    ``top_k``: keep only each u-side vertex's k best candidates, ranked
    by (common_neighbors desc, v asc) — integer-deterministic.
    """
    nbrs = adj.select("src", "dst").distinct()
    deg = nbrs.groupBy("src").agg(F.count("*").alias("deg")).withColumnRenamed("src", "id")

    centers = nbrs.join(deg.withColumnRenamed("id", "src"), "src")
    if max_center_degree is not None:
        centers = centers.filter(F.col("deg") <= max_center_degree)

    # wedge enumeration through the shared neighbor w = src; u < v halves
    # the pair space and canonicalizes the output key. deg(w) rides along
    # on the wedge row so the Adamic-Adar weight needs no second join.
    left = centers.select(
        F.col("src").alias("w"), F.col("dst").alias("u"), F.col("deg").alias("wdeg")
    )
    right = nbrs.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    wedges = left.join(right, "w").filter(F.col("u") < F.col("v"))

    pairs = wedges.groupBy("u", "v").agg(
        F.count("*").alias("common_neighbors"),
        F.sum(F.lit(1.0) / F.log(F.col("wdeg").cast("double"))).alias("adamic_adar"),
    )
    if min_common > 1:
        pairs = pairs.filter(F.col("common_neighbors") >= min_common)

    # drop pairs that are already edges (u<v matches one orientation of the
    # symmetric adjacency, so a single anti-join suffices)
    pairs = pairs.join(
        nbrs.select(F.col("src").alias("u"), F.col("dst").alias("v")),
        ["u", "v"],
        "left_anti",
    )

    scored = (
        pairs.join(deg.select(F.col("id").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("deg").alias("dv")), "v")
        .select(
            "u",
            "v",
            "common_neighbors",
            (
                F.col("common_neighbors").cast("double")
                / (F.col("du") + F.col("dv") - F.col("common_neighbors"))
            ).alias("jaccard"),
            "adamic_adar",
            (F.col("du") * F.col("dv")).cast("long").alias("preferential_attachment"),
        )
    )

    if top_k is not None:
        win = Window.partitionBy("u").orderBy(
            F.col("common_neighbors").desc(), F.col("v").asc()
        )
        scored = (
            scored.withColumn("_rk", F.row_number().over(win))
            .filter(F.col("_rk") <= top_k)
            .drop("_rk")
        )
    return scored
