"""QA reading stage: prompt assembly over top-k docs + answer parsing.

Reference: ``/root/reference/src/hipporag/HippoRAG.py:670-727`` — build a
prompt from the top ``qa_top_k=5`` retrieved passages, call the LLM, split
the response on ``Answer:``. The LLM is pluggable here (a callable
``prompt -> response``); the engine implements the deterministic parts:
prompt construction as a DataFrame aggregation and answer extraction as a
string operator. EM / token-F1 scoring lives in ``ops/evaluation.py``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QA_TOP_K = 5  # config qa_top_k


def assemble_prompts(
    retrieved: DataFrame, passages: DataFrame, questions: DataFrame, qa_top_k: int = QA_TOP_K
) -> DataFrame:
    """(query_id, prompt) — one prompt per query from its top-k passages.

    retrieved: (query_id, chunk_id, rank); passages: (chunk_id, passage);
    questions: (query_id, question).
    """
    top = retrieved.filter(F.col("rank") <= qa_top_k)
    docs = (
        top.join(passages, "chunk_id")
        .groupBy("query_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rank", "passage"))),
                    # the passage string carries its own title line (docs are
                    # "title\ntext", main.py:94-99); the reference prepends
                    # the marker to the WHOLE passage (HippoRAG.py:693-695)
                    lambda s: F.concat(F.lit("Wikipedia Title: "), s["passage"], F.lit("\n\n")),
                ),
                "",
            ).alias("context")
        )
    )
    return docs.join(questions, "query_id").select(
        "query_id",
        F.concat(
            F.col("context"),
            F.lit("Question: "),
            F.col("question"),
            F.lit("\nThought: "),
        ).alias("prompt"),
    )


def parse_answer(col):
    """Text after the FIRST 'Answer:' marker (``split('Answer:')[1]``,
    HippoRAG.py:719-723); no marker → the raw response (the reference's
    exception fallback)."""
    parts = F.split(col, "Answer:")
    return F.when(F.size(parts) >= 2, F.trim(F.element_at(parts, 2))).otherwise(
        F.trim(col)
    )


def qa_read(
    prompts: DataFrame, llm: Callable[[str], str] | None = None
) -> DataFrame:
    """(query_id, answer). ``llm`` maps prompt → raw response; the default
    deterministic stand-in echoes the question line (engine tests need the
    dataflow, not model quality)."""
    if llm is None:
        def llm(p: str) -> str:  # deterministic echo
            q = [l for l in p.splitlines() if l.startswith("Question: ")]
            return "Answer: " + (q[-1][len("Question: "):] if q else "")

    rows = prompts.collect()  # one row per query — LLM boundary
    spark = prompts.sparkSession
    out = [(r["query_id"], llm(r["prompt"])) for r in rows]
    df = spark.createDataFrame(out, "query_id string, response string")
    return df.select("query_id", parse_answer(F.col("response")).alias("answer"))
