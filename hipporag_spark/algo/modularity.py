"""Newman modularity of a vertex partition — the standard quality score
for the communities that label propagation / components emit.

Not in the reference (igraph answers ``modularity`` single-node); added
so the engine can score its own community output at scale (the natural
companion to :mod:`.labelprop`, which optimizes nothing explicitly).

    Q = Σ_c [ m_c / m  −  γ · (d_c / 2m)² ]

over the simple undirected graph: m = |E|, m_c = intra-community edges,
d_c = Σ degree over the community, γ = resolution.

Scale shape: two keyed joins to tag edge endpoints with labels, one
map-side-combinable per-label agg, then a 1-row reduction — no iteration,
no driver-side data beyond the scalar. The per-label aggregate is the
only shuffle and is keyed on community id; AQE's skew split handles a
giant community.

READING THE SCORE: modularity here is the DIAGNOSTIC, not the
objective. The deterministic min-label-tie-break LPA in
:mod:`.labelprop` (pinned for exactness/replayability, not quality)
can fragment a graph badly — measured Q = −0.088 with 4,902
communities on the sf0.1 repo graph — and a negative Q then means the
LABELS are weak, not that this operator is broken (it is oracle-green
on hand-scored fixtures). Partitions from components or ground truth
score as expected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def modularity(edges: DataFrame, labels: DataFrame, resolution: float = 1.0) -> DataFrame:
    """Return a 1-row DataFrame ``(m, n_communities, modularity)`` scoring
    the partition ``labels(id, label)`` on the graph ``edges(src, dst)``
    (direction/multiplicity/self-loops collapsed to simple undirected
    pairs). Vertices missing from ``labels`` form singleton communities
    of their own id (harmless: they contribute no intra edges). Isolated
    vertices contribute a zero term to Q exactly, so only edge-touched
    communities are enumerated (and counted in ``n_communities``)."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    la = labels.select(F.col("id").alias("a"), F.col("label").alias("la"))
    lb = labels.select(F.col("id").alias("b"), F.col("label").alias("lb"))
    tagged = (
        und.join(la, "a", "left_outer")
        .join(lb, "b", "left_outer")
        .select(
            F.coalesce(F.col("la"), F.col("a")).alias("la"),
            F.coalesce(F.col("lb"), F.col("b")).alias("lb"),
        )
    )
    # per-community degree sum: each edge endpoint contributes 1 to its
    # community; intra edges contribute 2 endpoints to the same community
    ends = tagged.select(F.col("la").alias("label")).unionAll(
        tagged.select(F.col("lb").alias("label"))
    )
    per_c = (
        ends.groupBy("label")
        .agg(F.count("*").alias("d_c"))
        .join(
            tagged.filter(F.col("la") == F.col("lb"))
            .groupBy(F.col("la").alias("label"))
            .agg(F.count("*").alias("m_c")),
            "label",
            "left_outer",
        )
        .select(
            "label", "d_c", F.coalesce(F.col("m_c"), F.lit(0)).alias("m_c")
        )
    )
    m = und.agg(F.count("*").alias("m"))
    out = (
        per_c.crossJoin(F.broadcast(m))
        .select(
            F.col("m"),
            (
                F.col("m_c") / F.col("m")
                - F.lit(resolution)
                * F.pow(F.col("d_c") / (2.0 * F.col("m")), F.lit(2.0))
            ).alias("q_c"),
        )
        .groupBy("m")
        .agg(
            F.count("*").alias("n_communities"),
            F.sum("q_c").alias("modularity"),
        )
    )
    return out
