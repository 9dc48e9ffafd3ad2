"""Benchmark decontamination: flag training documents whose n-grams
overlap an evaluation/benchmark set.

The standard pre-training hygiene step (public recipe used by GPT-3,
PaLM, Llama data pipelines): any train document sharing enough word
k-grams with an eval document is contaminated and must be dropped
before training. There is no analog in the reference (it never trains);
this belongs to the task mandate's training-data-pipeline family next to
the dedup operators in :mod:`.dedup`.

Scale shape (the part that matters at 100 TB): benchmarks are tiny —
thousands of docs vs billions — so the eval shingle set is built once,
deduplicated, and **broadcast**; the train side is a pure projection
(explode distinct shingles) followed by a broadcast-hash left join and a
map-side-combinable ``groupBy(doc_id)``. One shuffle total (the per-doc
aggregation), nothing keyed on the eval side, no skew surface: every
train shingle row carries its own doc_id and hub shingles ("the of and")
fan out across partitions naturally. The eval subset here is derived
deterministically from the same hash-bucket family as
:mod:`.sampling` (``md5(doc_id || salt) % 10000``) so tests, benches
and the DuckDB oracle reproduce it bit-for-bit; production callers pass
their real benchmark table instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import SHINGLE_K, shingles
from .sampling import hash_bucket

# eval subset = doc_ids hashing below this bucket (5% at small scale so
# the fixture actually has hits; real benchmarks are far smaller)
EVAL_BUCKET_CUT = 500
EVAL_SALT = "decontam"
DEFAULT_FLAG_THRESHOLD = 0.8


def eval_split(documents: DataFrame, cut: int = EVAL_BUCKET_CUT) -> DataFrame:
    """Deterministic stand-in benchmark set: md5-bucket of doc_id < cut."""
    return documents.where(hash_bucket(F.col("doc_id"), EVAL_SALT) < cut)


def contamination(
    documents: DataFrame,
    eval_docs: DataFrame | None = None,
    k: int = SHINGLE_K,
    flag_threshold: float = DEFAULT_FLAG_THRESHOLD,
) -> DataFrame:
    """Per train-doc n-gram overlap with the eval set.

    Returns ``(doc_id, n_shingles, n_contaminated, contamination,
    flagged)`` over ``documents`` MINUS the eval docs; ``contamination``
    is the fraction of the doc's distinct word ``k``-grams found anywhere
    in the eval set (rounded 6dp), ``flagged`` marks docs at or above
    ``flag_threshold``.
    """
    if eval_docs is None:
        eval_docs = eval_split(documents)
    train = documents.join(eval_docs.select("doc_id"), "doc_id", "left_anti")
    eval_sh = (
        eval_docs.select(F.explode(shingles(F.col("text"), k)).alias("s"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train_sh = train.select(
        "doc_id", F.explode(F.array_distinct(shingles(F.col("text"), k))).alias("s")
    )
    joined = train_sh.join(F.broadcast(eval_sh), "s", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6).alias(
                "contamination"
            ),
            (
                F.col("n_contaminated") / F.col("n_shingles")
                >= F.lit(float(flag_threshold))
            ).alias("flagged"),
        )
    )
