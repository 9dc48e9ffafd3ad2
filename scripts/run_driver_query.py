#!/usr/bin/env python
"""spark-submit entry running ONE driver-gate query against an SF dir.

The cluster-topology complement of ``run_job.py``: where run_job exercises
the iterative engines, this runs any ``driver_queries.queries()`` entry —
the exact workloads the correctness gate hash-compares against DuckDB —
through whatever master the submission chose (``--master
spark://host:port`` for a real multi-executor standalone cluster). The
``hipporag_spark`` package must arrive via ``--py-files``.

Prints one JSON line: query name, result row count, and the number of
registered executor endpoints (so a cluster test can assert the work
really ran on >1 executor JVM, not a silently-degraded local fallback).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--query", required=True)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--output", required=True)
    args = p.parse_args()

    spark = SparkSession.builder.appName(f"hipporag_dq_{args.query}").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from hipporag_spark import driver_queries as dq

    df = dq.all_queries()[args.query](spark, args.sf_dir)
    df.write.mode("overwrite").parquet(args.output)
    n_rows = spark.read.parquet(args.output).count()
    # driver block-manager counts as one endpoint; executors are the rest
    n_endpoints = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
    print(
        json.dumps(
            {
                "query": args.query,
                "rows": n_rows,
                "block_manager_endpoints": n_endpoints,
                "executors": max(0, n_endpoints - 1),
                "master": spark.sparkContext.master,
            }
        )
    )


if __name__ == "__main__":
    main()
