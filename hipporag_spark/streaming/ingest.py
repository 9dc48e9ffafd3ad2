"""Streaming incremental indexing.

The reference's ``index()`` is batch-incremental (hash-diff vs caches,
``HippoRAG.py:218-278``); its streaming analog here is a Structured
Streaming job: a file source watches a directory of repo_files parquet
drops, and ``foreachBatch`` applies the SAME batch ingest operators
(extract → anti-join vs cache → append edges/extraction) per micro-batch —
the recommended Spark pattern for stateful upsert sinks (foreachBatch gives
exactly-once per epoch with idempotent writes; our writes are idempotent
because everything is keyed by content hash).

At scale the sink tables are Iceberg and the anti-joins become MERGE; the
dataflow is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extract import extract
from ..graph.build import fact_edges, passage_edges

REPO_SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, content_sha256 string"
)


class StreamingIndexer:
    """Watches ``input_dir`` for new parquet files; maintains an extraction
    table and a key-space staged-edge table under ``state_dir``."""

    def __init__(self, spark: SparkSession, input_dir: str, state_dir: str):
        self.spark = spark
        self.input_dir = input_dir
        self.state_dir = state_dir
        self.extraction_path = f"{state_dir}/extraction"
        self.edges_path = f"{state_dir}/staged_edges"

    def _load(self, path: str, schema: str) -> DataFrame:
        try:
            return self.spark.read.parquet(path)
        except Exception:
            return self.spark.createDataFrame([], schema)

    def extraction(self) -> DataFrame:
        return self._load(
            self.extraction_path,
            "chunk_id string, passage string, entities array<string>, "
            "triples array<struct<s:string,p:string,o:string>>, repo string, content_sha256 string",
        )

    def staged_edges(self) -> DataFrame:
        return self._load(self.edges_path, "src string, dst string, weight double, etype string")

    def _process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        ex = extract(batch_df)
        # hash-diff vs the durable extraction table: only NEW chunks
        # produce edges (mirrors HippoRAG.py:759, 811 new-chunk guards).
        # localCheckpoint pins the anti-join RESULT — the lazy plan re-reads
        # the extraction parquet, which the append below is about to grow
        new_ex = ex.join(
            self.extraction().select("chunk_id"), "chunk_id", "left_anti"
        ).localCheckpoint(eager=True)
        if new_ex.count() == 0:
            return
        staged = fact_edges(new_ex).unionByName(passage_edges(new_ex))
        staged.write.mode("append").parquet(self.edges_path)
        new_ex.write.mode("append").parquet(self.extraction_path)

    def start(self, trigger_available_now: bool = True):
        stream = (
            self.spark.readStream.schema(REPO_SCHEMA)
            .option("maxFilesPerTrigger", 16)
            .parquet(self.input_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", f"{self.state_dir}/_stream_checkpoint")
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def edge_table(self) -> DataFrame:
        """Current merged edge view: parallel staged weights summed per
        (src, dst) — same canonicalization as the batch path."""
        return (
            self.staged_edges()
            .groupBy("src", "dst", "etype")
            .agg(F.sum("weight").alias("weight"))
            .select("src", "dst", "weight", "etype")
        )
