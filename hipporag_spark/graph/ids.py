"""Deterministic dense vertex ids, without a single-partition window.

``row_number().over(Window.orderBy(key))`` is the obvious way to mint dense
ids but collapses to ONE partition — a non-starter at 10^12 rows. Hash-based
ids (``xxhash64``) scale but collide (birthday bound ~2^32 keys for 64-bit).
This is the scalable deterministic construction:

1. range-repartition + sort by key (total order, distributed),
2. count rows per partition (tiny action: one long per partition),
3. broadcast the prefix-sum offsets; per-partition local index + offset.

The assigned id equals the row's **global rank in the sorted key order** —
independent of partition boundaries, hence identical across cluster sizes
(required by the scaling-efficiency + checkpoint-resume contracts,
SURVEY.md §4.2 item 6). Keys must be unique (vertex names are).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_dense_ids(df: DataFrame, key: str, num_partitions: int | None = None) -> DataFrame:
    """Return ``df`` + column ``id: long`` = global rank of ``key`` ascending."""
    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(p, F.col(key)).sortWithinPartitions(key)
    ordered = ordered.persist()

    counts = (
        ordered.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )  # ≤ p rows — a metadata-sized action
    by_pid = {r["pid"]: r["count"] for r in counts}
    offsets, acc = {}, 0
    for pid in range(p):
        offsets[pid] = acc
        acc += by_pid.get(pid, 0)

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += ", id long"

    def add_ids(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = offsets[pid]
        for pdf in it:
            n = len(pdf)
            pdf = pdf.assign(id=range(base, base + n))
            base += n
            yield pdf

    return ordered.mapInPandas(add_ids, schema=out_schema)
