"""Batched multi-source PPR must equal Q independent single-source runs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hipporag_spark.algo.ppr import personalized_pagerank, personalized_pagerank_batch
from hipporag_spark.graph.build import adjacency, strength

from oracles import ppr_reference, random_multigraph


@pytest.mark.parametrize(
    "engine,check_every,num_blocks",
    [
        ("csr", 1, 4),
        # num_blocks=1 exercises the fused single-block kernel, chained
        ("csr", 4, 1),
        ("dataframe", 3, 4),
        ("broadcast", 1, 4),
    ],
)
def test_batch_matches_single_and_oracle(spark, engine, check_every, num_blocks):
    n, m = 50, 220
    edges = random_multigraph(n, m, seed=19)
    e = spark.createDataFrame(edges, "src long, dst long, weight double")
    adj = adjacency(e).persist()
    st = strength(adj).persist()
    vids = spark.range(n).select(F.col("id"))

    resets = {
        "q1": {2: 1.0},
        "q2": {5: 0.25, 9: 0.75},
        "q3": {},  # all-zero → uniform
    }
    rows = [(q, i, w) for q, rs in resets.items() for i, w in rs.items()]
    rows.append(("q3", 0, 0.0))  # zero entry only
    reset_df = spark.createDataFrame(rows, "query_id string, id long, weight double")

    ranks, lineage = personalized_pagerank_batch(
        spark, adj, st, vids, reset_df, n_vertices=n, num_blocks=num_blocks,
        engine=engine, check_every=check_every,
    )
    got = {q: np.zeros(n) for q in resets}
    for r in ranks.collect():
        got[r["query_id"]][r["id"]] = r["value"]

    for q, rs in resets.items():
        rvec = np.zeros(n)
        for i, w in rs.items():
            rvec[i] = w
        want = ppr_reference(n, edges, rvec, 0.5)
        assert np.allclose(got[q], want, atol=1e-6), q

    assert lineage[-1]["converged"]
    # per-query lineage present
    qs_in_metrics = {p["query_id"] for p in lineage[-1]["partitions"]}
    assert qs_in_metrics == set(resets)
