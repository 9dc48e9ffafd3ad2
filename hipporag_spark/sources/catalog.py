"""Iceberg-capable table I/O with a parquet fallback (SURVEY.md §2.1;
BASELINE.json input_hint names Iceberg tables as the production substrate).

``CatalogTableIO`` routes every mutation through one of two physical paths:

- **Iceberg** (when the runtime has the Iceberg Spark extensions): upsert is
  ``MERGE INTO … WHEN MATCHED THEN UPDATE … WHEN NOT MATCHED THEN INSERT``,
  delete is ``MERGE INTO … WHEN MATCHED THEN DELETE`` — single atomic
  snapshot commits, no read-rewrite race, partition pruning + metadata-only
  counts for free. This is the 100 TB path: the engine's aggregated graph
  tables (edges/adj/strength/refcounts) merge deltas in place instead of
  rewriting O(corpus) files.
- **Parquet fallback** (this sandbox — no Iceberg jars are installed):
  the same logical contract via anti-join + two-phase ``.tmp`` swap
  (write → re-read → overwrite), mirroring ``EmbeddingStoreIO``.

The capability check is a cheap class-load probe, done once per session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ICEBERG_CACHE: dict[str, bool] = {}


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the classpath AND a catalog
    is configured (``spark.sql.catalog.<name>``)."""
    key = spark.sparkContext.applicationId
    if key in _ICEBERG_CACHE:
        return _ICEBERG_CACHE[key]
    ok = False
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        )
        confs = spark.sparkContext.getConf().getAll()
        ok = any(k.startswith("spark.sql.catalog.") for k, _ in confs)
    except Exception:
        ok = False
    _ICEBERG_CACHE[key] = ok
    return ok


class CatalogTableIO:
    """Keyed table with MERGE-style upsert/delete.

    ``target``: an Iceberg table identifier (``catalog.db.table``) when
    Iceberg is available, else a parquet path.
    """

    def __init__(self, spark: SparkSession, target: str, key: str = "hash_id"):
        self.spark = spark
        self.target = target
        self.key = key
        self.use_iceberg = iceberg_available(spark) and "/" not in target

    # ---------------- read ----------------

    def load(self, schema: str | None = None) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(self.target)
        try:
            return self.spark.read.parquet(self.target)
        except Exception:
            if schema is None:
                raise
            return self.spark.createDataFrame([], schema)

    # ---------------- write paths ----------------

    def create_or_replace(self, df: DataFrame) -> None:
        if self.use_iceberg:
            df.writeTo(self.target).createOrReplace()
        else:
            df.write.mode("overwrite").parquet(self.target)

    def upsert(self, rows: DataFrame) -> None:
        """Insert-or-replace by key (``embedding_store.py:63-90``)."""
        if self.use_iceberg:
            rows.createOrReplaceTempView("_merge_src")
            cols = rows.columns
            sets = ", ".join(f"t.{c} = s.{c}" for c in cols if c != self.key)
            names = ", ".join(cols)
            vals = ", ".join(f"s.{c}" for c in cols)
            self.spark.sql(
                f"MERGE INTO {self.target} t USING _merge_src s "
                f"ON t.{self.key} = s.{self.key} "
                f"WHEN MATCHED THEN UPDATE SET {sets} "
                f"WHEN NOT MATCHED THEN INSERT ({names}) VALUES ({vals})"
            )
            return
        try:
            existing = self.load()
            kept = existing.join(
                rows.select(self.key), self.key, "left_anti"
            )
            updated = kept.unionByName(rows)
        except Exception:
            updated = rows
        self._two_phase_overwrite(updated)

    def delete_keys(self, keys: DataFrame) -> None:
        """Delete rows whose key appears in ``keys``
        (``embedding_store.py:130-144``)."""
        if self.use_iceberg:
            keys.createOrReplaceTempView("_delete_src")
            self.spark.sql(
                f"MERGE INTO {self.target} t USING _delete_src s "
                f"ON t.{self.key} = s.{self.key} WHEN MATCHED THEN DELETE"
            )
            return
        updated = self.load().join(keys.select(self.key), self.key, "left_anti")
        self._two_phase_overwrite(updated)

    def _two_phase_overwrite(self, updated: DataFrame) -> None:
        """Parquet cannot overwrite a path its own plan still reads —
        materialize via .tmp, re-read, overwrite (same protocol as
        ``EmbeddingStoreIO._rewrite``)."""
        tmp = self.target + ".tmp"
        updated.write.mode("overwrite").parquet(tmp)
        self.spark.read.parquet(tmp).write.mode("overwrite").parquet(self.target)
