"""Round-3 storage/lifecycle regressions:

- P > _K2_FANOUT_MAX: the JVM-aggregate dangling path must still see one
  kind=2 row per src block (round-2 ADVICE: num_blocks=0 emitted none →
  combine crash + silently dropped teleport mass).
- Result lifetime: a PPR result must stay readable after LATER runs
  (round-2 ADVICE: the deferred free invalidated the previous caller's
  still-lazy result).
- Checkpoint dirs as Hadoop-FS URIs (file://): resume must work when the
  manifest IO routes through the JVM FileSystem, not driver-local os.*.
- BlockGraph.unpersist removes its packed-array spill dir.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from hipporag_spark.algo.ppr import personalized_pagerank, personalized_pagerank_batch
from hipporag_spark.graph.blocked import compile_blocks
from hipporag_spark.graph.build import adjacency, strength

from oracles import ppr_reference, random_multigraph


def _graph(spark, n, m, seed):
    edges = random_multigraph(n, m, seed)
    e = spark.createDataFrame(edges, "src long, dst long, weight double")
    adj = adjacency(e).persist()
    st = strength(adj).persist()
    vids = spark.range(n).select(F.col("id"))
    return edges, adj, st, vids


def _to_np(ranks, n):
    out = np.zeros(n)
    for r in ranks.collect():
        out[r["id"]] = r["value"]
    return out


def test_ppr_beyond_k2_fanout_max(spark, monkeypatch):
    """Force the JVM-aggregate dangling-mass path (P > _K2_FANOUT_MAX) and
    check the result against the reference oracle — including real dangling
    vertices so the teleport mass actually matters."""
    import hipporag_spark.algo.ppr as ppr_mod

    monkeypatch.setattr(ppr_mod, "_K2_FANOUT_MAX", 2)
    n, m, seed = 50, 200, 13
    edges = random_multigraph(n, m, seed)
    # make vertices 45..49 dangling (no incident edges at all)
    edges = [(u, v, w) for (u, v, w) in edges if u < 45 and v < 45]
    e = spark.createDataFrame(edges, "src long, dst long, weight double")
    adj = adjacency(e).persist()
    st = strength(adj)
    vids = spark.range(n).select(F.col("id"))
    reset_df = spark.createDataFrame([(3, 0.5), (47, 0.5)], "id long, weight double")
    reset = np.zeros(n)
    reset[3], reset[47] = 0.5, 0.5
    ranks, lineage = personalized_pagerank(
        spark, adj, st, vids, n_vertices=n, reset_df=reset_df,
        damping=0.5, num_blocks=6,  # 6 > patched fanout max of 2
    )
    got = _to_np(ranks, n)
    want = ppr_reference(n, edges, reset, 0.5)
    assert np.allclose(got, want, atol=1e-6)
    assert lineage[-1]["converged"]
    adj.unpersist()


def test_result_survives_later_runs(spark):
    """Hold the FIRST run's lazy result, run more PPRs, then collect the
    first — must not raise CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND."""
    n = 40
    edges, adj, st, vids = _graph(spark, n, 160, seed=5)
    r1_df = spark.createDataFrame([(1, 1.0)], "id long, weight double")
    first, _ = personalized_pagerank(
        spark, adj, st, vids, n_vertices=n, reset_df=r1_df, num_blocks=4
    )
    # two later runs (blocked + broadcast) before first is ever collected
    r2_df = spark.createDataFrame([(2, 1.0)], "id long, weight double")
    personalized_pagerank(
        spark, adj, st, vids, n_vertices=n, reset_df=r2_df, num_blocks=4
    )[0].count()
    breset = spark.createDataFrame(
        [("qa", 3, 1.0), ("qb", 4, 1.0)], "query_id string, id long, weight double"
    )
    personalized_pagerank_batch(
        spark, adj, st, vids, breset, n_vertices=n, engine="broadcast"
    )[0].count()
    got = _to_np(first, n)
    reset = np.zeros(n)
    reset[1] = 1.0
    want = ppr_reference(n, edges, reset, 0.5)
    assert np.allclose(got, want, atol=1e-6)
    adj.unpersist()


def test_checkpoint_file_uri(spark, tmp_path):
    """checkpoint_dir as a file:// URI: kill mid-run, resume, converge."""
    n = 30
    edges, adj, st, vids = _graph(spark, n, 120, seed=9)
    reset_df = spark.createDataFrame([(1, 1.0)], "id long, weight double")
    ckdir = f"file://{tmp_path}/ck_uri"
    part1, lin1 = personalized_pagerank(
        spark, adj, st, vids, n_vertices=n, reset_df=reset_df, num_blocks=4,
        checkpoint_dir=ckdir, run_id="uriA", max_iter=3,
    )
    assert not lin1[-1]["converged"]
    from hipporag_spark.checkpointing import CheckpointManager

    mgr = CheckpointManager(ckdir, "uriA")
    assert mgr.latest_complete() == 2
    full, lin2 = personalized_pagerank(
        spark, adj, st, vids, n_vertices=n, reset_df=reset_df, num_blocks=4,
        checkpoint_dir=ckdir, run_id="uriA",
    )
    assert lin2[-1]["converged"]
    got = _to_np(full, n)
    reset = np.zeros(n)
    reset[1] = 1.0
    want = ppr_reference(n, edges, reset, 0.5)
    assert np.allclose(got, want, atol=1e-6)
    # the manifests really live under the URI's local path
    assert os.path.isdir(f"{tmp_path}/ck_uri/uriA")
    adj.unpersist()


def test_blockgraph_unpersist_removes_spill_dir(spark):
    n = 20
    edges, adj, st, vids = _graph(spark, n, 60, seed=2)
    bg = compile_blocks(adj, st, vids, 4)
    d = bg.spill_dir
    assert d is not None and os.path.isdir(d)
    bg.unpersist()
    assert not os.path.exists(d)
    assert bg.spill_dir is None
    adj.unpersist()
