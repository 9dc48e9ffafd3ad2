"""Deterministic distributed maximal matching (locally-dominant edges).

Not in the reference; completes the symmetry-breaking family
(:mod:`.mis`, :mod:`.coloring`) — matchings are the classic primitive for
coarsening/contraction schedules and conflict-free pairing over a link
graph.

Algorithm (the parallel greedy of Preis / Israeli–Itai flavor, with a
PINNED total order): give every undirected edge the key
``(h(a,b), a, b)`` where ``h`` is the 32-bit md5 prefix of ``a‖'|'‖b``
(DuckDB-replayable, same convention as :mod:`.walks`). A round matches
every edge that is the MINIMUM-key incident edge of BOTH its endpoints
(locally dominant — a pure function of the live edge set, so the round
is deterministic and partitioning-independent), then removes all edges
touching matched vertices. Locally-dominant-by-a-total-order is exactly
the parallel execution of sequential greedy matching in ascending key
order, so the RESULT equals the sequential greedy matching regardless
of round structure — the oracle replays it round-for-round, and a
sequential fold verifies it in pytest. The hash order makes the
expected round count O(log n) (descending-run argument) where a
lexicographic key would degrade to path length.

Scale shape per round: one symmetrize-union, one map-side-combinable
min aggregate keyed on the vertex, two equi-joins to test dominance,
and two anti-joins to peel matched endpoints — all keyed, integer/hash
only, no windows. One O(1) count action per round doubles as the
convergence check; non-fixpoint exhaustion raises (the scc.py lesson).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _edge_key(a, b):
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", a.cast("string"), b.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def maximal_matching(
    spark: SparkSession,
    adj: DataFrame,
    max_iter: int = 200,
) -> tuple[DataFrame, list[dict]]:
    """Return (``matching(a, b)``, lineage): the greedy maximal matching
    of the simple undirected graph under ``adj`` in ascending
    ``(md5-32(a|b), a, b)`` edge order, computed in locally-dominant
    parallel rounds. ``a < b`` in every output row."""
    live = (
        adj.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .withColumn("h", _edge_key(F.col("a"), F.col("b")))
        .localCheckpoint(eager=True)
    )
    matched_parts: list[DataFrame] = []
    lineage: list[dict] = []
    prev = live
    for step in range(max_iter):
        t0 = time.time()
        key = F.struct(F.col("h"), F.col("a"), F.col("b"))
        inc = live.select(F.col("a").alias("v"), key.alias("k")).unionByName(
            live.select(F.col("b").alias("v"), key.alias("k"))
        )
        mins = inc.groupBy("v").agg(F.min("k").alias("mk"))
        dominant = (
            live.join(
                mins.select(F.col("v").alias("a"), F.col("mk").alias("ma")), "a"
            )
            .join(mins.select(F.col("v").alias("b"), F.col("mk").alias("mb")), "b")
            .filter((key == F.col("ma")) & (key == F.col("mb")))
            .select("a", "b", "h")
        )
        touched = dominant.select(F.col("a").alias("v")).unionByName(
            dominant.select(F.col("b").alias("v"))
        )
        new_live = (
            live.join(touched.select(F.col("v").alias("a")), "a", "left_anti")
            .join(touched.select(F.col("v").alias("b")), "b", "left_anti")
            .select("a", "b", "h")
            .localCheckpoint(eager=True)
        )
        dom = dominant.localCheckpoint(eager=True)
        matched_parts.append(dom)
        n_live = new_live.count()
        n_matched = dom.count()
        wall_ms = (time.time() - t0) * 1000
        lineage.append(
            {"superstep": step, "matched": n_matched, "live_edges": n_live,
             "converged": n_live == 0, "wall_ms": wall_ms}
        )
        from ..lifecycle import free_local_checkpoint

        free_local_checkpoint(prev)
        prev = new_live
        live = new_live
        if n_live == 0:
            break
        if n_matched == 0:
            raise RuntimeError(
                "maximal_matching round matched no edge with live edges "
                "remaining — dominance invariant violated"
            )
    else:
        raise RuntimeError(
            f"maximal_matching did not drain within max_iter={max_iter} rounds"
        )

    out = matched_parts[0].select("a", "b")
    for m in matched_parts[1:]:
        out = out.unionByName(m.select("a", "b"))
    return out, lineage
