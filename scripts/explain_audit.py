#!/usr/bin/env python
"""Plan-quality audit: print formatted physical plans for the flagship
operators and grep-check the properties that matter at 100 TB:

- parquet scans carry pruned ReadSchema (column pruning) and PushedFilters
- the static edge side of a PPR superstep is served from the cached,
  pre-partitioned relation (no per-superstep Exchange on O(E) data)
- aggregations are partial (map-side combine) before the final exchange
- the small dimension sides broadcast

Run: python scripts/explain_audit.py  (writes PLANS.md at repo root)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hipporag_spark.session import get_spark


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark(parallelism=8, shuffle_partitions=8, app_name="explain_audit")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    sections: list[tuple[str, str, list[str]]] = []

    # 1. pruned scan: token stats should read only (doc_id, text)
    from hipporag_spark.ops.textstats import token_stats

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    p = plan_of(token_stats(docs))
    sections.append(("token_stats scan pruning", p, ["ReadSchema: struct<doc_id:bigint,text:string>"]))

    # 2. filter pushdown reaches parquet
    q = docs.filter(F.col("lang") == "en").select("doc_id", "n_chars")
    p = plan_of(q)
    sections.append(("filter pushdown", p, ["PushedFilters: [IsNotNull(lang), EqualTo(lang,en)"]))

    # 3. PPR dataframe superstep: cached pre-partitioned edge side,
    #    salted partial aggregation
    from hipporag_spark.graph.build import adjacency, strength

    e = spark.range(2000).select(
        (F.col("id") % 97).alias("src"), (F.col("id") % 89 + 3).alias("dst"), F.lit(1.0).alias("weight")
    )
    adj = adjacency(e)
    st = strength(adj)
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj_norm = (
        adj.join(st, adj.src == st.id)
        .select("src", "dst", (F.col("weight") / F.col("strength")).alias("w_norm"))
        .repartition(shuffle_p, "src")
        .persist()
    )
    adj_norm.count()  # materialize cache
    ranks = spark.range(100).select(F.col("id"), F.lit(0.01).alias("value"))
    contribs = adj_norm.join(ranks, adj_norm.src == ranks.id).select(
        "dst",
        (F.lit(0.5) * F.col("value") * F.col("w_norm")).alias("c"),
        F.pmod(F.col("src"), F.lit(16)).alias("salt"),
    )
    step = (
        contribs.groupBy("dst", "salt").agg(F.sum("c").alias("c1"))
        .groupBy("dst").agg(F.sum("c1").alias("contrib"))
    )
    p = plan_of(step)
    sections.append(
        ("ppr dataframe superstep", p, ["InMemoryTableScan", "HashAggregate", "partial_sum"])
    )

    # 4. broadcast of small dim in relational join
    from hipporag_spark import driver_queries as dq

    p = plan_of(dq.q_rel_join_topk(spark, sf))
    sections.append(("rel_join_topk broadcast", p, ["BroadcastHashJoin"]))

    # 5. as-of join: window plan, NO inequality join operator anywhere
    p = plan_of(dq.q_asof_join(spark, sf))
    sections.append(
        ("asof_join window plan (no nested-loop/cartesian)", p,
         ["Window", "!BroadcastNestedLoopJoin", "!CartesianProduct"])
    )

    # 6. range join: bucketized equi (hash) join, not a cartesian filter
    p = plan_of(dq.q_range_join(spark, sf))
    sections.append(
        ("range_join bucketized equi-join", p,
         ["Join", "!BroadcastNestedLoopJoin", "!CartesianProduct"])
    )

    # 7. decontamination: eval shingle set broadcasts, no cartesian, no
    #    Python in the plan
    p = plan_of(dq.q_contamination(spark, sf))
    sections.append(
        ("decontamination broadcast eval side", p,
         ["BroadcastHashJoin", "!CartesianProduct", "!BroadcastNestedLoopJoin",
          "!ArrowEvalPython", "!BatchEvalPython"])
    )

    # 8. repetition filters: partial (map-side) aggregation before every
    #    exchange, all-JVM
    p = plan_of(dq.q_repetition(spark, sf))
    sections.append(
        ("repetition_filters partial aggs", p,
         ["partial_count", "!ArrowEvalPython", "!BatchEvalPython"])
    )

    # 9. PII redaction: a pure projection — zero Exchange, zero Python,
    #    scan reads only (doc_id, text)
    from hipporag_spark.ops.redact import redact_pii

    p = plan_of(redact_pii(docs))
    sections.append(
        ("pii_redaction zero-shuffle projection", p,
         ["ReadSchema: struct<doc_id:bigint,text:string>", "!Exchange",
          "!ArrowEvalPython", "!BatchEvalPython"])
    )

    # 10. duplicate-window profile: pruned scan + partial aggregation before
    #     the gram exchange; all-JVM
    from hipporag_spark.ops.dedup import dup_ngram_windows

    p = plan_of(dup_ngram_windows(docs, k=8, hash_grams=True))
    sections.append(
        ("dup_ngram_windows partial aggs + pruned scan", p,
         ["ReadSchema: struct<doc_id:bigint,text:string>", "partial_count",
          "!ArrowEvalPython", "!BatchEvalPython", "!CartesianProduct"])
    )

    # 11. link prediction: wedge join is an equi-join with partial
    #     aggregation, all-JVM, no cartesian anywhere
    from hipporag_spark.algo.linkpred import link_prediction_scores

    lp_adj = adjacency(e)
    p = plan_of(link_prediction_scores(lp_adj, max_center_degree=64, top_k=10))
    sections.append(
        ("link_prediction wedge equi-join, partial aggs", p,
         ["partial_count", "!CartesianProduct", "!BroadcastNestedLoopJoin",
          "!ArrowEvalPython", "!BatchEvalPython"])
    )

    # 12. HITS superstep: the per-round plan must contain NO cross join
    #     (the Catalyst sizeInBytes BigInt-compounding pathology — see
    #     algo/hits.py docstring) and aggregate partially, all-JVM
    hits_state = spark.range(100).select(
        "id", F.lit(1.0).alias("authority"), F.lit(1.0).alias("hub")
    )
    h_adj = e.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    hub_in = hits_state.select(F.col("id").alias("src"), (F.col("hub") / F.lit(1.0)).alias("h"))
    auth_raw = (
        h_adj.join(hub_in, "src")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.sum(F.col("weight") * F.col("h")).alias("authority"))
    )
    dense_auth = (
        auth_raw.unionByName(spark.range(100).select("id", F.lit(0.0).alias("authority")))
        .groupBy("id").agg(F.sum("authority").alias("authority"))
    )
    hub_raw = (
        h_adj.join(dense_auth.select(F.col("id").alias("dst"), F.col("authority").alias("a")), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum(F.col("weight") * F.col("a")).alias("hub"))
    )
    hits_step = (
        dense_auth.select("id", "authority", F.lit(0.0).alias("hub"))
        .unionByName(hub_raw.select("id", F.lit(0.0).alias("authority"), "hub"))
        .groupBy("id")
        .agg(F.sum("authority").alias("authority"), F.sum("hub").alias("hub"))
    )
    p = plan_of(hits_step)
    sections.append(
        ("hits superstep: no cross join, partial aggs, all-JVM", p,
         ["partial_sum", "!CartesianProduct", "!BroadcastNestedLoopJoin",
          "!ArrowEvalPython", "!BatchEvalPython"])
    )

    # 12b. Katz superstep: contribution sum is a partial (map-side)
    #      aggregate over the equi-join — no cross join, all-JVM
    katz_state = spark.range(100).select("id", F.lit(1.0).alias("katz"))
    k_adj = e.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    contrib = (
        k_adj.join(katz_state, k_adj.src == katz_state.id)
        .groupBy("dst")
        .agg(F.sum(F.col("weight") * F.col("katz")).alias("insum"))
    )
    katz_step = (
        katz_state.select("id")
        .join(contrib.withColumnRenamed("dst", "id"), "id", "left_outer")
        .select(
            "id",
            (F.lit(1.0) + F.lit(0.01) * F.coalesce(F.col("insum"), F.lit(0.0))).alias("katz"),
        )
    )
    p = plan_of(katz_step)
    sections.append(
        ("katz superstep: partial aggs, no cross join, all-JVM", p,
         ["partial_sum", "!CartesianProduct", "!BroadcastNestedLoopJoin",
          "!ArrowEvalPython", "!BatchEvalPython"])
    )

    # 12c. random-walk step (index-draw form): frontier → deg join to
    #      compute r = H(walk:t) mod deg, then ONE row probed per walk
    #      via the (src, idx) equi-join — O(walks) candidate rows, no
    #      per-neighbor fanout, no window in the per-step path, all-JVM
    from hipporag_spark.algo.walks import _draw
    from pyspark.sql import Window as _W

    w_und = adjacency(e).select("src", "dst").distinct()
    w_idx = w_und.withColumn(
        "idx",
        (F.row_number().over(_W.partitionBy("src").orderBy("dst")) - 1).cast("long"),
    )
    w_deg = w_und.groupBy("src").agg(F.count("*").alias("deg"))
    frontier = spark.range(50).select(
        F.col("id").cast("string").alias("walk_id"),
        F.col("id").cast("string").alias("seed"),
        (F.col("id") % 97).alias("vertex"),
    )
    drawn = frontier.join(w_deg, frontier.vertex == w_deg.src).select(
        "walk_id", "seed", "vertex", _draw("xxhash64", 3, F.col("deg")).alias("r")
    )
    walk_step = drawn.join(
        w_idx, (drawn.vertex == w_idx.src) & (drawn.r == w_idx.idx)
    ).select("walk_id", "seed", F.col("dst").alias("vertex"))
    p = plan_of(walk_step)
    sections.append(
        ("random-walk step: index-draw probe joins, no per-neighbor fanout agg", p,
         ["!CartesianProduct", "!BroadcastNestedLoopJoin",
          "!ArrowEvalPython", "!BatchEvalPython", "!SortAggregate"])
    )

    # 12e. k-truss support pass: degree-oriented wedge equi-join +
    #      left-semi closure + map-side combinable support agg — no
    #      cartesian, all-JVM
    from hipporag_spark.algo.truss import _support

    tr_edges = e.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()
    p = plan_of(_support(tr_edges))
    sections.append(
        ("k-truss support: wedge equi-join + semi closure, partial aggs", p,
         ["partial_count", "LeftSemi", "!CartesianProduct",
          "!BroadcastNestedLoopJoin", "!ArrowEvalPython", "!BatchEvalPython"])
    )

    # 12f. coreness h-operator round: state equi-join + per-vertex window
    #      rank + map-side max agg — integer-only, no cartesian, all-JVM
    from hipporag_spark.algo.coreness import coreness as _  # noqa: F401

    cn_edges = adjacency(e).select("src", "dst").distinct()
    cn_state = spark.range(97).select("id", F.lit(3).cast("long").alias("val"))
    nb = cn_edges.join(
        cn_state.select(F.col("id").alias("dst"), "val"), "dst"
    ).select(F.col("src").alias("id"), "val")
    wspec = _W.partitionBy("id").orderBy(F.col("val").desc())
    h_round = (
        nb.withColumn("rn", F.row_number().over(wspec))
        .groupBy("id")
        .agg(F.max(F.least(F.col("rn").cast("long"), F.col("val"))).alias("h"))
    )
    p = plan_of(h_round)
    sections.append(
        ("coreness h-operator round: equi-join + rank + max agg, all-JVM", p,
         ["!CartesianProduct", "!BroadcastNestedLoopJoin",
          "!ArrowEvalPython", "!BatchEvalPython"])
    )

    # 12g. bipartite projection: group-keyed self-equi-join + partial
    #      pair count — the quadratic hazard is keyed, never cartesian
    from hipporag_spark.graph.build import bipartite_project

    bip = spark.range(500).select(
        (F.col("id") % 50).cast("string").alias("src"),
        (F.col("id") % 97).cast("string").alias("dst"),
    )
    p = plan_of(bipartite_project(bip, min_weight=2, max_fanout=64))
    sections.append(
        ("bipartite projection: keyed self-join + partial pair count", p,
         ["partial_count", "!CartesianProduct", "!BroadcastNestedLoopJoin",
          "!ArrowEvalPython", "!BatchEvalPython"])
    )

    # 12d. MIS round: two semi-joins against the active set + a map-side
    #      combinable min-neighbor aggregate — no cartesian, no window,
    #      all-JVM (algo/mis.py's superstep body)
    mis_edges = adjacency(e).select("src", "dst")
    mis_active = spark.range(97).select("id")
    live = mis_edges.join(mis_active, mis_edges.src == mis_active.id, "left_semi").join(
        mis_active, mis_edges.dst == mis_active.id, "left_semi"
    )
    minnbr = live.groupBy("src").agg(F.min("dst").alias("mn"))
    mis_cand = (
        mis_active.join(minnbr, mis_active.id == minnbr.src, "left_outer")
        .filter(F.col("mn").isNull() | (F.col("id") < F.col("mn")))
        .select("id")
    )
    p = plan_of(mis_cand)
    sections.append(
        ("mis round: semi-joins + partial min-neighbor agg, all-JVM", p,
         ["partial_min", "LeftSemi", "!CartesianProduct",
          "!BroadcastNestedLoopJoin", "!ArrowEvalPython", "!BatchEvalPython",
          "!Window"])
    )

    # 12h. coloring ready-round (r5): the priority comparison is a
    #      precomputed edge FLAG — the round is semi-join + filter +
    #      anti-join, integer/boolean-only, no per-round hash evaluation,
    #      no cartesian, all-JVM
    col_nbrs = (
        adjacency(e).select("src", "dst")
        .filter(F.col("src") != F.col("dst")).distinct()
        .withColumn("prec", F.col("src") < F.col("dst"))
    )
    col_unc = spark.range(97).select("id")
    col_blockers = (
        col_nbrs.join(col_unc.withColumnRenamed("id", "src"), "src", "left_semi")
        .filter(F.col("prec"))
        .select(F.col("dst").alias("id"))
    )
    col_ready = col_unc.join(col_blockers, "id", "left_anti")
    p = plan_of(col_ready)
    sections.append(
        ("coloring ready-round: precomputed priority flag, semi+anti joins, all-JVM", p,
         ["LeftSemi", "LeftAnti", "!CartesianProduct",
          "!BroadcastNestedLoopJoin", "!ArrowEvalPython", "!BatchEvalPython",
          "!xxhash64", "!md5"])
    )

    # 12i. localized-push edge fetch (r5): a broadcast semi-join probes
    #      the RAW adjacency — the frontier broadcasts, the O(E) side is
    #      scanned in place with NO exchange (no compile/repartition step
    #      at all in this engine)
    pf_cur = spark.range(3).select(F.col("id").alias("src"))
    pf_fetch = e.select("src", "dst", "weight").join(F.broadcast(pf_cur), "src")
    p = plan_of(pf_fetch)
    import re as _re2

    no_big_exchange = "Exchange hashpartitioning" not in p
    pf_checks = ["BroadcastHashJoin"]
    if not no_big_exchange:
        pf_checks.append("__PUSH_FETCH_SHUFFLED_E__")  # absent → FAIL
    sections.append(
        ("localized-push fetch: broadcast probe of raw adjacency, no E exchange", p,
         pf_checks)
    )

    # 13. iterative edge reuse: with broadcast disabled (the at-scale
    #     regime where the state side no longer broadcasts), a CC
    #     superstep must NOT re-exchange the pre-partitioned O(E) edge
    #     side — the only Exchanges sit on the O(V) state side
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        cc_edges = adjacency(e).select("src", "dst").repartition(F.col("src")).persist()
        cc_edges.count()
        labels = spark.range(1000).select("id", F.col("id").alias("component"))
        nbr_min = (
            cc_edges.join(labels, cc_edges.src == labels.id)
            .groupBy("dst")
            .agg(F.min("component").alias("nbr"))
        )
        p = plan_of(nbr_min)
        # structural invariant: the SMJ's edge side goes Sort → (Filter) →
        # InMemoryTableScan with NO Exchange in between — the cached
        # hashpartitioning(src) satisfies the join requirement, so only
        # the O(V) labels side shuffles per superstep
        import re as _re

        edge_side_reused = bool(
            _re.search(
                r":- \* Sort \(\d+\)\n\s*:  \+- (?:\* Filter \(\d+\)\n\s*:     \+- )?InMemoryTableScan",
                p,
            )
        )
        checks = ["InMemoryTableScan", "SortMergeJoin"]
        if not edge_side_reused:
            checks.append("__EDGE_SIDE_REUSE_VIOLATED__")  # absent → FAIL
        sections.append(
            ("cc superstep: pre-partitioned edge side joins without re-exchange", p, checks)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)

    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    ok = True
    with open(out_path, "w") as f:
        f.write("# Physical plan audit (generated by scripts/explain_audit.py)\n")
        for name, plan, checks in sections:
            f.write(f"\n## {name}\n\n")
            for c in checks:
                # a leading "!" inverts: the fragment must NOT appear
                hit = c[1:] not in plan if c.startswith("!") else c in plan
                ok &= hit
                f.write(f"- check `{c}`: {'PASS' if hit else 'FAIL'}\n")
            f.write("\n```\n" + plan.strip()[:4000] + "\n```\n")
    print("PLANS.md written;", "ALL CHECKS PASS" if ok else "SOME CHECKS FAILED")


if __name__ == "__main__":
    main()
