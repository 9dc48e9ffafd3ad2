"""Streaming frequency counters — stateful per-key counts over an
unbounded stream, the building block for heavy-hitter monitoring
(vocabulary drift, hot-entity detection) on a continuously-ingesting
corpus.

The batch form (exact ``groupBy().count()``) is the correctness oracle:
``tests/test_streaming.py`` replays the same drops through both and
compares. Per micro-batch the operator emits ONE row per key that
appeared in the batch, carrying the key's cumulative count — an
append-only changelog a downstream top-k materializer (or an idempotent
MERGE sink, ``streaming/ingest.py``) folds by taking each key's max
count.

Scale shape: state is one long per distinct key, grouped BY the key —
per-group work is O(batch rows for that key) via one Arrow-batched
pandas call, and a hot key costs one state row regardless of volume.
For bounded-memory top-k at extreme cardinality, feed keys through
``ops/sampling.hash_bucket`` first (count-min-style bucketing) — the
changelog contract is unchanged.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COUNTER_OUT_SCHEMA = "key string, total long, batch_n long"
_COUNTER_STATE_SCHEMA = "total long"


def _count_fn(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n = sum(len(p) for p in pdfs)
    total = (state.get[0] if state.exists else 0) + n
    state.update((total,))
    return iter(
        (pd.DataFrame({"key": [key[0]], "total": [total], "batch_n": [n]}),)
    )


def count_stream(rows: DataFrame, key_col: str = "key") -> DataFrame:
    """Stateful streaming counter over ``rows``: emits, per micro-batch,
    one ``(key, total, batch_n)`` changelog row for every key seen in
    that batch, where ``total`` is the key's cumulative count across the
    whole stream."""
    from pyspark.sql import functions as F

    prepared = rows.select(F.col(key_col).cast("string").alias("key"))
    return prepared.groupBy("key").applyInPandasWithState(
        _count_fn,
        COUNTER_OUT_SCHEMA,
        _COUNTER_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
