"""Deterministic stand-in embeddings (the engine's embedding boundary).

The reference calls an external embedding model and stores
``(hash_id, content, embedding: list<float32>)`` parquet tables
(``/root/reference/src/hipporag/embedding_store.py:109-120, 152-178``).
Model inference is outside engine scope (like the LLM); the engine contract
is everything downstream: storage schema, KNN, dot-product scoring,
min-max normalization. This module provides a deterministic, unit-norm,
content-addressed embedding so those paths are real and testable — each
vector is seeded by md5(text), so any executor (or the driver, for query
vectors) derives the identical embedding with no coordination.

Vectorized pandas UDF (Arrow batches); at scale this is exactly where a
real encoder (ONNX/Triton batch call) would slot in.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

DIM = 64


def embed_text(text: str, dim: int = DIM, instruction: str | None = None) -> np.ndarray:
    """``instruction`` is the dual-embedding seam: the reference encodes
    each query TWICE with different task instructions — ``query_to_fact``
    for fact scoring and ``query_to_passage`` for DPR
    (``HippoRAG.py:1254-1288``, ``prompts/linking.py:1-10``). A real encoder
    prepends the instruction; the deterministic stand-in folds it into the
    seed so the two vectors differ exactly like the reference's do."""
    key = text if instruction is None else f"{instruction}\n{text}"
    seed = int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


# the reference's task instructions (prompts/linking.py:1-10)
QUERY_TO_FACT = "Given a question, retrieve relevant triplet facts that matches this question."
QUERY_TO_PASSAGE = "Given a question, retrieve relevant documents that best answer the question."


# DataType object (not a DDL string): string return types are parsed at
# decoration time and would require an active SparkSession at import
@pandas_udf(ArrayType(FloatType()))
def embed_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: embed_text(t))


def with_embedding(df: DataFrame, text_col: str = "content") -> DataFrame:
    return df.withColumn("embedding", embed_udf(F.col(text_col)))


def embedding_store(df: DataFrame, text_col: str, prefix: str) -> DataFrame:
    """(hash_id, content, embedding) table — the reference's store schema
    (``embedding_store.py:109-115``)."""
    return df.select(
        F.concat(F.lit(prefix), F.md5(F.col(text_col))).alias("hash_id"),
        F.col(text_col).alias("content"),
    ).dropDuplicates(["hash_id"]).withColumn("embedding", embed_udf(F.col("content")))
