"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship query — build the doc-word link graph from
``sf0.001/documents.parquet`` and run Personalized PageRank (the engine's
centerpiece, damping 0.5, L1 tol 1e-6) to produce ranked vertices.

``queries`` / ``oracle_sql``: one entry per implemented operator family
(SURVEY.md §2 + training-data pipeline ops); every query has a DuckDB
oracle — the iterative PPR job's is an unrolled fixed-point power method
(60 chained CTEs; NetworkX/NumPy oracles additionally live in tests/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hipporag_spark import driver_queries as _dq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _dq.q_ppr_docs(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _dq.all_queries()


def oracle_sql() -> dict[str, str]:
    return _dq.all_oracles()
