"""Exact 1- and 2-hop neighborhood sizes (friend-of-friend reach).

Not in the reference; added because neighborhood-growth profiles are the
standard expansion probe (ball sizes ≈ effective diameter estimates) and
the friend-of-friend count is the canonical second-order feature for
ranking/recommendation over a link graph.

Semantics: n1(v) = |N(v)|, n2(v) = |{w ≠ v : dist(v, w) ≤ 2}| on the
simple undirected graph — exact distinct counts, so the two-hop pair
materialization is deduplicated by Spark's aggregate, never collected.

Scale shape: the wedge join fans out from the MIDDLE vertex, so its
volume is Σ deg(m)² — hubs dominate. Two first-class mitigations:
``max_mid_degree`` drops hub middles (documented estimator: callers get
a lower bound on n2; the standard neighborhood-sketch compromise), and
the distinct-pair aggregate is keyed on the source vertex so AQE's skew
split spreads residual hot keys. For counts-only at extreme scale,
``approx=True`` swaps the exact distinct for Spark's HyperLogLog++
(``approx_count_distinct``, rsd 5%) — the sketch path with no pair
shuffle at all (partial HLL buffers combine map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def two_hop_sizes(
    adj: DataFrame,
    max_mid_degree: int | None = None,
    approx: bool = False,
    hub_exact: bool = False,
) -> DataFrame:
    """Return ``(id, n1, n2)`` for every non-isolated vertex of the
    simple undirected graph under ``adj`` (symmetric adjacency or raw
    edges — direction and multiplicity are collapsed).

    ``hub_exact=True`` (with ``max_mid_degree``) restores exactness: the
    hub-middle wedges the cap dropped run as a SEPARATE union branch, so
    the answer equals the uncapped computation while the Σ deg(hub)²
    blow-up is confined to one branch that (a) only carries the few hub
    middles and (b) is keyed (v) into the same skew-splittable distinct
    aggregate. Without it the capped result is a documented lower
    bound."""
    und = adj.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()
    # identical subtrees below share one Exchange via Spark's reuse rule,
    # so the symmetric-neighbor shuffle is paid once per action
    nbrs = und.select("a", "b").unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )

    mid = nbrs
    hub_mid = None
    if max_mid_degree is not None:
        deg = nbrs.groupBy("a").agg(F.count("*").alias("deg"))
        keep = deg.filter(F.col("deg") <= max_mid_degree).select("a")
        # drop hub MIDDLES only: pairs through a hub are omitted (lower
        # bound unless hub_exact), but the hub itself still gets its own
        # n1/n2 rows
        mid = nbrs.join(keep, "a", "left_semi")
        if hub_exact:
            hub_mid = nbrs.join(keep, "a", "left_anti")

    def wedges(mid_df):
        return (
            nbrs.select(F.col("a").alias("v"), F.col("b").alias("m"))
            .join(mid_df.select(F.col("a").alias("m"), F.col("b").alias("w")), "m")
            .select("v", "w")
            .filter(F.col("v") != F.col("w"))
        )

    two = wedges(mid)
    if hub_mid is not None:
        two = two.unionAll(wedges(hub_mid))
    reach = nbrs.select(F.col("a").alias("v"), F.col("b").alias("w")).unionAll(two)
    cnt = (
        F.approx_count_distinct("w").alias("n2")
        if approx
        else F.countDistinct("w").alias("n2")
    )
    n2 = reach.groupBy(F.col("v").alias("id")).agg(cnt)
    n1 = nbrs.groupBy(F.col("a").alias("id")).agg(F.count("*").alias("n1"))
    out = n1.join(n2, "id").select("id", "n1", "n2")
    return out
