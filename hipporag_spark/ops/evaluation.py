"""Evaluation operators (SURVEY.md §2.5).

- Recall@k per query, averaged — ``/root/reference/src/hipporag/evaluation/
  retrieval_eval.py:24-74``; k list from ``HippoRAG.py:443``.
- Exact match over normalized answers, max over golds —
  ``evaluation/qa_eval.py:19-47``; normalizer ``utils/eval_utils.py:4-31``
  (lowercase, strip articles/punctuation, collapse whitespace).
- Token F1 (MRQA-style Counter intersection) — ``qa_eval.py:53-95`` — as a
  vectorized pandas UDF (multiset intersection needs per-row dict math).
"""

from __future__ import annotations

import collections

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import DoubleType

RECALL_KS = [1, 2, 5, 10, 20, 30, 50, 100, 150, 200]  # HippoRAG.py:443


def recall_at_k(results: DataFrame, gold: DataFrame, ks: list[int] = RECALL_KS) -> DataFrame:
    """``results``: (query_id, chunk_id, rank); ``gold``: (query_id,
    gold_chunk_ids: array<string>). Returns one row: avg Recall@k per k."""
    topk = results.groupBy("query_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("rank"), F.col("chunk_id")))
        ).alias("ordered")
    ).select(
        "query_id", F.transform("ordered", lambda s: s["chunk_id"]).alias("retrieved")
    )
    j = topk.join(gold, "query_id")
    aggs = []
    for k in ks:
        hit = F.size(
            F.array_intersect(F.slice("retrieved", 1, k), F.col("gold_chunk_ids"))
        ) / F.size("gold_chunk_ids")
        aggs.append(F.round(F.avg(hit), 4).alias(f"recall_at_{k}"))
    return j.agg(*aggs)


def normalize_answer(col):
    """eval_utils.py:4-31: lower, remove punctuation, remove articles,
    collapse whitespace."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^\w\s]", "")
    c = F.regexp_replace(c, r"\b(a|an|the)\b", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def exact_match(pred: DataFrame) -> DataFrame:
    """``pred``: (query_id, answer, gold_answers: array<string>) →
    (query_id, em) with em = max over golds of normalized equality."""
    return pred.select(
        "query_id",
        F.when(
            F.exists(
                F.transform("gold_answers", normalize_answer),
                lambda g: g == normalize_answer(F.col("answer")),
            ),
            1.0,
        ).otherwise(0.0).alias("em"),
    )


@pandas_udf(DoubleType())
def _f1_udf(answers: pd.Series, golds: pd.Series) -> pd.Series:
    import re

    def norm(s):
        s = s.lower()
        s = re.sub(r"[^\w\s]", "", s)
        s = re.sub(r"\b(a|an|the)\b", " ", s)
        return re.sub(r"\s+", " ", s).strip()

    def f1(pred, gold):
        pt, gt = norm(pred).split(), norm(gold).split()
        common = collections.Counter(pt) & collections.Counter(gt)
        n = sum(common.values())
        if n == 0:
            return 0.0
        p, r = n / len(pt), n / len(gt)
        return 2 * p * r / (p + r)

    return pd.Series(
        [
            max((f1(a, g) for g in gl), default=0.0)
            for a, gl in zip(answers, golds)
        ]
    )


def token_f1(pred: DataFrame) -> DataFrame:
    """(query_id, answer, gold_answers) → (query_id, f1), max over golds."""
    return pred.select(
        "query_id", F.round(_f1_udf(F.col("answer"), F.col("gold_answers")), 4).alias("f1")
    )
