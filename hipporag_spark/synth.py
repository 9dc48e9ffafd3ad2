"""Deterministic synthetic ``repo_files`` input table.

BASELINE.json ``input_hint`` fixes the input shape: an Iceberg/Parquet table of
source-code repositories ``(repo, path, commit, lang, content)``. This module
synthesizes that table **fully distributed** (``spark.range`` + deterministic
hash expressions — no driver-side data, no RNG state), so the same generator
that makes a 9-row pytest fixture would make a 10^12-row cluster input; every
column is a pure function of the row id, so output is identical at any
parallelism level.

Content grammar (intentionally trivial so extraction is exact and fast):

    module <modname>
    import <lib> ...          (1-4 lines; ~38%% of imports hit the hub lib
                               "libcore" -> power-law in-degree, skew fixture)
    def <fn> ...              (1-2 lines)

The deterministic extractor (extract.py) recovers from this exactly the
entities/triples an OpenIE pass yields in the reference
(``/root/reference/src/hipporag/information_extraction/openie_openai.py``):
per-chunk unique entity phrases and (subject, predicate, object) triples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .keys import content_sha256

N_ORGS = 7
N_REPOS = 23
N_PKGS = 13
N_LIBS = 47  # vocabulary of importable modules
HUB_LIB = "libcore"  # skewed entity: ~38% of all import edges
LANGS = ["python", "kotlin", "java", "md"]


def _h(tag: str, *cols) -> F.Column:
    """Deterministic non-negative 64-bit hash of (tag, cols)."""
    return F.abs(F.xxhash64(F.lit(tag), *cols))


def repo_files(spark: SparkSession, n_files: int, hub_fraction: float = 0.3) -> DataFrame:
    """Build the ``(repo, path, commit, lang, content, content_sha256)`` table.

    ``hub_fraction`` of files land in one hub repo (skew fixture per
    FIXTURES.md F1). Everything derives from ``id`` via xxhash64 — the
    generator is embarrassingly parallel and partition-count independent.
    """
    df = spark.range(n_files)  # distributed ids 0..n-1
    hub_cut = int(hub_fraction * 1000)

    repo = F.when(
        _h("hub", F.col("id")) % 1000 < hub_cut, F.lit("org0/hubrepo")
    ).otherwise(
        F.concat(
            F.lit("org"), (_h("org", F.col("id")) % N_ORGS).cast("string"),
            F.lit("/repo"), (_h("repo", F.col("id")) % N_REPOS).cast("string"),
        )
    )
    path = F.concat(
        F.lit("src/pkg"), (_h("pkg", F.col("id")) % N_PKGS).cast("string"),
        F.lit("/mod"), F.col("id").cast("string"), F.lit(".py"),
    )
    modname = F.concat(F.lit("mod"), F.col("id").cast("string"))

    n_imports = (_h("nimp", F.col("id")) % 4 + 1).cast("int")
    # import t: ~38% hub lib, else uniform over the lib vocabulary
    imports = F.transform(
        F.sequence(F.lit(0), n_imports - 1),
        lambda t: F.when(
            _h("imphub", F.col("id"), t) % 1000 < 380, F.lit(HUB_LIB)
        ).otherwise(
            F.concat(F.lit("lib"), (_h("imp", F.col("id"), t) % N_LIBS).cast("string"))
        ),
    )
    n_defs = (_h("ndef", F.col("id")) % 2 + 1).cast("int")
    defs = F.transform(
        F.sequence(F.lit(0), n_defs - 1),
        lambda t: F.concat(
            F.lit("fn"), F.col("id").cast("string"), F.lit("v"), t.cast("string")
        ),
    )

    content = F.concat_ws(
        "\n",
        F.concat(F.lit("module "), modname),
        F.array_join(F.transform(imports, lambda m: F.concat(F.lit("import "), m)), "\n"),
        F.array_join(F.transform(defs, lambda d: F.concat(F.lit("def "), d)), "\n"),
    )

    out = df.select(
        repo.alias("repo"),
        path.alias("path"),
        F.substring(F.sha2(F.concat(repo, F.lit(":"), path), 256), 1, 40).alias("commit"),
        F.element_at(
            F.array(*[F.lit(x) for x in LANGS]), (_h("lang", F.col("id")) % 4 + 1).cast("int")
        ).alias("lang"),
        content.alias("content"),
    )
    return out.withColumn("content_sha256", content_sha256("content"))


def write_repo_files(spark: SparkSession, n_files: int, path: str) -> None:
    """Persist the synthetic table as Parquet (Iceberg-shaped layout:
    partitioned by repo bucket would be ``bucketBy`` on a real catalog)."""
    repo_files(spark, n_files).write.mode("overwrite").parquet(path)
