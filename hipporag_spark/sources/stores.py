"""Sources & sinks (SURVEY.md §2.1).

- ``read_corpus_json``: the reference's corpus format — a JSON array of
  ``{title, text}`` docs formatted as ``"title\\ntext"`` strings
  (``/root/reference/main.py:94-99``).
- ``EmbeddingStoreIO``: parquet round-trip of ``(hash_id, content,
  embedding)`` + the dedup-by-hash incremental upsert (anti-join) and the
  ref-counted delete — ``embedding_store.py:63-144`` re-expressed as joins.
- ``OpenIECache``: the extraction-result cache keyed by chunk hash —
  ``HippoRAG.py:884-1007`` (load / diff-missing / merge / save) as a
  parquet table + left_anti joins.

In production these write Iceberg tables (``writeTo(...).createOrReplace``)
— parquet paths here, same layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..keys import chunk_key

STORE_SCHEMA = "hash_id string, content string, embedding array<float>"
EXTRACTION_SCHEMA = (
    "chunk_id string, passage string, entities array<string>, "
    "triples array<struct<s:string,p:string,o:string>>, repo string, content_sha256 string"
)


def read_corpus_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON corpus → ``(title, text, doc)`` with doc = "title\\ntext"."""
    df = spark.read.option("multiLine", "true").json(path)
    return df.select(
        "title", "text", F.concat_ws("\n", F.col("title"), F.col("text")).alias("doc")
    )


class EmbeddingStoreIO:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def load(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], STORE_SCHEMA)

    def save(self, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self.path)

    def _rewrite(self, updated: DataFrame) -> DataFrame:
        """Two-phase swap: the updated plan still lazily READS self.path, so
        overwriting in place would be read-while-overwrite (works by luck
        locally, corrupts or errors on a cluster). Materialize to .tmp,
        re-read, then overwrite — same protocol as OpenIECache.merge_save;
        on Iceberg this whole dance is a single MERGE."""
        tmp = self.path + ".tmp"
        updated.write.mode("overwrite").parquet(tmp)
        self.spark.read.parquet(tmp).write.mode("overwrite").parquet(self.path)
        return self.load()

    def upsert(self, new_rows: DataFrame) -> DataFrame:
        """Insert only rows whose hash_id is absent (the reference's
        insert_strings: hash → anti-join → encode only missing → append,
        ``embedding_store.py:63-90``). Returns the updated store."""
        existing = self.load()
        missing = new_rows.join(existing.select("hash_id"), "hash_id", "left_anti")
        return self._rewrite(existing.unionByName(missing))

    def delete(self, hash_ids: DataFrame) -> DataFrame:
        """Remove by hash_id (left_anti rewrite ≡ MERGE…DELETE on Iceberg;
        ``embedding_store.py:130-144``)."""
        kept = self.load().join(hash_ids.select("hash_id"), "hash_id", "left_anti")
        return self._rewrite(kept)

    def get_rows(self, hash_ids: DataFrame) -> DataFrame:
        """Bulk point lookup = broadcast semi-join (``embedding_store.py:146-178``)."""
        return self.load().join(F.broadcast(hash_ids.select("hash_id")), "hash_id", "left_semi")


class OpenIECache:
    """Durable extraction cache: which chunks already have entities/triples."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def load(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], EXTRACTION_SCHEMA)

    def missing(self, corpus: DataFrame) -> DataFrame:
        """Chunks in ``corpus`` (repo_files shape) lacking cached extraction
        — the 'diff vs cache' anti-join (``HippoRAG.py:905-925``)."""
        keyed = corpus.withColumn("chunk_id", chunk_key("content"))
        return keyed.join(self.load().select("chunk_id"), "chunk_id", "left_anti").drop("chunk_id")

    def merge_save(self, new_extraction: DataFrame) -> DataFrame:
        """Merge new results with cache, new rows win on conflict
        (``HippoRAG.py:929-1007``)."""
        cached = self.load()
        keep_old = cached.join(new_extraction.select("chunk_id"), "chunk_id", "left_anti")
        merged = keep_old.unionByName(new_extraction).persist()
        merged.write.mode("overwrite").parquet(self.path + ".tmp")
        out = self.spark.read.parquet(self.path + ".tmp")
        out.write.mode("overwrite").parquet(self.path)
        return self.load()
