"""Document chunking: fixed-width character windows with overlap.

The reference indexes whole passages; a large-scale pipeline feeding an
embedding or training stage needs documents split into bounded-size
chunks with overlap (the standard RAG/pre-training preprocessing step).
Expressed as pure JVM built-ins — ``sequence`` over chunk starts +
``explode`` + ``substring`` — so it rides whole-stage codegen with no
Python in the row path and no shuffle at all: chunking is a flat-map,
output partitioning inherits the scan. The explode factor is
``ceil(len/stride)``, bounded by the longest document; at 100 TB the
only sizing concern is downstream ``maxPartitionBytes`` on the exploded
rows, which Spark's scan splitting already handles.

Boundary semantics (pinned by the oracle): chunk starts at 0, stride,
2·stride, … strictly below the doc length; every chunk is
``substring(start, chunk_chars)``; the final chunk may be shorter;
an empty document yields no chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 512,
    overlap: int = 128,
) -> DataFrame:
    """Split each document into overlapping character windows. Returns
    (id_col, chunk_idx, chunk_text, chunk_len, n_chunks)."""
    if not 0 <= overlap < chunk_chars:
        raise ValueError("require 0 <= overlap < chunk_chars")
    stride = chunk_chars - overlap
    n = F.length(F.col(text_col))
    starts = F.sequence(
        F.lit(0),
        ((n - 1) / stride).cast("long") * stride,
        F.lit(stride),
    )
    exploded = docs.filter(n > 0).select(
        F.col(id_col),
        F.col(text_col),
        n.alias("__n"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.expr(f"substring({text_col}, __start + 1, {chunk_chars})").alias(
            "chunk_text"
        ),
        F.least(F.lit(chunk_chars), F.col("__n") - F.col("__start")).alias(
            "chunk_len"
        ),
        (((F.col("__n") - 1) / stride).cast("long") + 1).alias("n_chunks"),
    )
