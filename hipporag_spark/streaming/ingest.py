"""Streaming incremental indexing.

The reference's ``index()`` is batch-incremental (hash-diff vs caches,
``HippoRAG.py:218-278``); its streaming analog here is a Structured
Streaming job: a file source watches a directory of repo_files parquet
drops, and ``foreachBatch`` applies the SAME batch ingest operators
(extract → anti-join vs cache → append edges/extraction) per micro-batch —
the recommended Spark pattern for stateful upsert sinks. foreachBatch is
at-least-once per epoch, so the sink makes replays idempotent by writing
each epoch to ``epoch=<id>`` subdirectories with dynamic-partition
OVERWRITE: a replayed epoch rewrites its own partition instead of
double-appending (on Iceberg: MERGE keyed by (chunk_id, epoch)).

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

    def _load_epoched(self, path: str, schema: str) -> DataFrame:
        df = self._load(path, schema + ", epoch long")
        return df.drop("epoch") if "epoch" in df.columns else df

    def extraction(self) -> DataFrame:
        return self._load_epoched(
            self.extraction_path,
            "chunk_id string, passage string, entities array<string>, "
            "triples array<struct<s:string,p:string,o:string>>, repo string, content_sha256 string",
        )

    def staged_edges(self) -> DataFrame:
        return self._load_epoched(
            self.edges_path, "src string, dst string, weight double, etype string"
        )

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
        # idempotent per epoch: each write targets ONLY this epoch's
        # partition (dynamic partitionOverwriteMode) — a replayed epoch
        # overwrites its own previous output instead of appending twice,
        # and a crash between the two writes leaves a partial epoch that
        # the replay simply rewrites
        # per-writer option, not session conf: foreachBatch runs on a CLONED
        # session whose conf the outer session can't reach
        staged = fact_edges(new_ex).unionByName(passage_edges(new_ex))
        for df, path in ((staged, self.edges_path), (new_ex, self.extraction_path)):
            (
                df.withColumn("epoch", F.lit(int(epoch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch")
                .parquet(path)
            )

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
