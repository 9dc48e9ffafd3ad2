"""Deterministic dense vertex ids, without a single-partition window.

``row_number().over(Window.orderBy(key))`` is the obvious way to mint dense
ids but collapses to ONE partition — a non-starter at 10^12 rows. Hash-based
ids (``xxhash64``) scale but collide (birthday bound ~2^32 keys for 64-bit).
This is the scalable deterministic construction:

1. range-repartition by key (total order across partitions, distributed),
   freeze the partition assignment as a DATA column at an eager checkpoint,
2. count rows per partition (tiny action: one long per partition),
3. broadcast the prefix-sum offsets; per-partition local rank (a window
   PARTITIONED by the frozen pid — each partition sorts independently)
   + offset.

The assigned id equals ``start`` + the row's **global rank in the sorted key
order** — independent of partition boundaries, hence identical across
cluster sizes (required by the scaling-efficiency + checkpoint-resume
contracts, SURVEY.md §4.2 item 6). ``start`` is the append-only minting
hook: an incremental index ranks ONLY the new keys and offsets past the
existing id space (``HippoRAG.py:1022-1050`` — existing vertices keep their
indices, new ones extend the range). Keys must be unique (vertex names are).

Why the pid must be frozen as data: ``TaskContext.partitionId()`` /
``spark_partition_id()`` evaluate in whatever stage the operator finally
FUSES into — e.g. unioned downstream, partition indices are renumbered
across the union's children and no longer match the offsets computed here.
The eager ``localCheckpoint`` ends the stage exactly at the repartition, so
the recorded pid is the range-partition's own, whatever happens downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_dense_ids(
    df: DataFrame, key: str, num_partitions: int | None = None, start: int = 0
) -> DataFrame:
    """Return ``df`` + column ``id: long`` = ``start`` + global rank of
    ``key`` ascending."""
    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = (
        df.repartitionByRange(p, F.col(key))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    counts = ordered.groupBy("__pid").count().collect()  # ≤ p rows
    by_pid = {r["__pid"]: r["count"] for r in counts}
    offsets, acc = [], start
    for pid in sorted(by_pid):
        offsets.append((pid, acc))
        acc += by_pid[pid]
    offset_df = df.sparkSession.createDataFrame(
        offsets or [(0, start)], "__pid int, __offset long"
    )

    w = Window.partitionBy("__pid").orderBy(key)
    return (
        ordered.join(F.broadcast(offset_df), "__pid")
        .withColumn(
            "id", (F.row_number().over(w) - 1 + F.col("__offset")).cast("long")
        )
        .drop("__pid", "__offset")
    )
