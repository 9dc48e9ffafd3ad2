"""Token-budget packing: assign documents to fixed-capacity bins for
training-batch assembly.

Exact first-fit bin packing is inherently sequential; the distributed
form every large pipeline uses is *offset packing within shards*: shard
documents by a deterministic hash, order each shard, and cut bins at
capacity boundaries of the running token offset. Each shard packs
independently (embarrassingly parallel — one shuffle on the shard key,
then a per-shard window scan, the same plan shape as sessionization);
bins never cross shards, so a 1000-executor run needs no global
coordination. A document longer than ``capacity`` still lands in exactly
one bin (its own starting bin), mirroring how packers truncate/segment
oversize examples downstream.

Bin id = ``(shard, floor(start_offset / capacity))``, where
``start_offset`` is the exclusive running sum of token counts in
(deterministic) ``order_col`` order — fully relational, no state, and
reproducible by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_bucket


def pack_documents(
    docs: DataFrame,
    tokens_col: str,
    order_col: str,
    capacity: int,
    num_shards: int = 64,
    salt: str = "",
) -> DataFrame:
    """Add (shard, bin_id, start_offset) to each row. Rows with the same
    (shard, bin_id) together hold ≈``capacity`` tokens (the last doc of a
    bin may spill past the boundary; the next bin starts at the next
    capacity multiple ≤ its start offset)."""
    shard = (hash_bucket(F.col(order_col), salt) % num_shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_shard = docs.withColumn("shard", shard)
    start = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).alias("start_offset")
    out = with_shard.withColumn("start_offset", start)
    return out.withColumn(
        "bin_id", F.floor(F.col("start_offset") / F.lit(int(capacity))).cast("long")
    )
