"""Deterministic release of locally-checkpointed DataFrames.

``DataFrame.unpersist()`` is a silent no-op for a ``localCheckpoint``-ed
frame: the storage blocks belong to the *internal* checkpointed RDD
(wrapped by a ``LogicalRDD`` plan node), which is only released when the
driver's GC eventually collects the RDD object through py4j and the
ContextCleaner processes it. Iterative jobs that checkpoint every
superstep therefore accumulate every superstep's blocks for the life of
the session — measured here as multi-second degradation of ALL subsequent
jobs (storage scan + heap pressure), growing with each algorithm run.

``free_local_checkpoint`` releases the blocks immediately. The DataFrame
(and anything derived from it that has not been materialized elsewhere)
MUST NOT be used afterwards — reading it raises
``CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def free_local_checkpoint(df: DataFrame | None) -> None:
    """Release the storage blocks behind a localCheckpoint'd DataFrame.

    Safe no-op for plain (non-checkpointed) DataFrames and on any
    reflection failure — callers pair it with ``unpersist()`` for frames
    that might be either.
    """
    if df is None:
        return
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass
