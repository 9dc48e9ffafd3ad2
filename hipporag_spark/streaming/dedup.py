"""Streaming exact deduplication — the stateful first-seen filter.

The streaming form of ``ops/dedup.exact_dedup`` (which is the batch
oracle: ``tests/test_streaming.py`` runs both over the same drops and
compares). A continuously-ingesting corpus needs duplicates dropped
ACROSS micro-batches, not just within one — Spark's stock
``dropDuplicates`` on a stream keys its state the same way; this
operator is the explicit ``applyInPandasWithState`` form so the state
layout is ours: one marker row per distinct content hash, extendable
with TTL (``GroupStateTimeout``) when the dedup horizon is bounded.

Semantics (deterministic, replay-stable):

- rows are grouped by ``content_hash`` (any exact-identity key — md5 /
  sha256 of the normalized text, the ``keys.py`` convention);
- the FIRST occurrence ever seen passes through; every later occurrence
  (same batch or any later batch) is dropped;
- within one micro-batch the winner is the row with the smallest
  ``doc_id`` (a pinned tie-break, so replays and repartitionings emit
  the identical survivor — SURVEY.md §7.3), and the emitted row carries
  ``n_dupes_in_batch`` so downstream can audit collision volume.

Scale shape: state is one int per distinct hash — O(distinct docs),
the same asymptotics as any exact cross-batch dedup must pay; the
group-by key is the hash, so hot-key skew cannot exist (each group is
one document identity). Arrow-batched pandas, no per-row Python.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = "content_hash string, doc_id long, text string, n_dupes_in_batch long"
_DEDUP_STATE_SCHEMA = "seen long"


def _dedup_fn(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    n = len(rows)
    if state.exists:
        (seen,) = state.get
        state.update((seen + n,))
        return iter(())
    state.update((n,))
    winner = rows.sort_values("doc_id").iloc[0]
    out = pd.DataFrame(
        {
            "content_hash": [key[0]],
            "doc_id": [winner["doc_id"]],
            "text": [winner["text"]],
            "n_dupes_in_batch": [n - 1],
        }
    )
    return iter((out,))


def dedup_stream(docs: DataFrame) -> DataFrame:
    """Stateful streaming exact-dedup over a docs stream with columns
    ``(content_hash string, doc_id long, text string)``. Emits each
    distinct hash's first-seen row exactly once, ever."""
    prepared = docs.select("content_hash", "doc_id", "text")
    return prepared.groupBy("content_hash").applyInPandasWithState(
        _dedup_fn,
        DEDUP_OUT_SCHEMA,
        _DEDUP_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
