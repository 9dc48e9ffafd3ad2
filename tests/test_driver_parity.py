"""Spark ↔ DuckDB oracle parity at sf0.001 — mirrors the driver's
correctness gate (row count + schema names + order-insensitive values)."""

import math

import duckdb
import pytest

from hipporag_spark import driver_queries as dq

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

ORACLES = dq.all_oracles()
QUERIES = dq.all_queries()
# slow / oracle-less queries excluded here (ppr_docs covered in test_algorithms)
PAIRED = sorted(set(QUERIES) & set(ORACLES))


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def normalize(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append(round(v, 6))
            elif hasattr(v, "__float__") and not isinstance(v, (int, bool)):
                vals.append(round(float(v), 6))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", PAIRED)
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    duck_rows = ddb.execute(ORACLES[name]).fetchall()
    assert [c.lower() for c in sdf.columns] == [
        d[0].lower() for d in ddb.execute(ORACLES[name]).description
    ], f"{name}: column mismatch"
    a, b = normalize(spark_rows), normalize(duck_rows)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    assert a == b, f"{name}: value mismatch; first diff: " + str(
        next(((x, y) for x, y in zip(a, b) if x != y), None)
    )
