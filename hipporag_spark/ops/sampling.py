"""Deterministic dataset splitting and stratified sampling.

A training-data pipeline needs reproducible train/val/test assignment
that is stable across runs, machines, and engine versions — which rules
out ``df.randomSplit`` (partitioning-dependent) and anything seeded by
runtime state. The standard answer is content-hash bucketing: bucket =
``md5(key || salt) mod B``; assignment is a PURE PROJECTION — no shuffle,
no state, embarrassingly parallel at any scale, and any engine that can
compute md5 reproduces it exactly (the DuckDB oracle does).

``md5`` is in both Spark's JVM built-ins and DuckDB; the first 8 hex
chars give 32 uniform bits, plenty for split fractions at 1/10000
granularity.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 10000) from md5 of the key (+ optional salt
    so independent splits of the same keys decorrelate)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _BUCKETS).alias(
        "bucket"
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Mapping[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Add a deterministic ``split`` column ('train'/'val'/... ) chosen by
    the key's hash bucket, with proportions ``weights`` (normalized).
    Same key + same salt → same split, forever, on any engine."""
    weights = dict(weights or {"train": 0.9, "val": 0.05, "test": 0.05})
    total = sum(weights.values())
    b = hash_bucket(F.col(key_col), salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cut = int(round(cum * _BUCKETS))
        clause = b < F.lit(cut)
        expr = F.when(clause, name) if expr is None else expr.when(clause, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn("split", expr)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    rate: float,
    salt: str = "",
) -> DataFrame:
    """Importance sampling by a per-row weight (the standard
    quality-weighted data selection step: keep high-quality documents at
    a higher rate), deterministically.

    Keep probability per row = ``min(1, rate · w / mean(w))`` — so the
    EXPECTED kept fraction is ≈ ``rate`` while rows are kept in
    proportion to weight — decided by the row key's hash bucket, so the
    decision is reproducible on any engine (the DuckDB oracle replays
    it). One map-side-combinable global agg for the mean (broadcast as a
    literal-sized 1-row side), then a pure projection/filter — no
    shuffle of the data itself, embarrassingly parallel at any scale.

    Bit-reproducibility note: the mean is computed as exact integer-sum ÷
    count when the weight column is integral (use integral weights when an
    external oracle must replay the cut — a float sum's value depends on
    reduction order)."""
    mean = df.agg(
        (F.sum(F.col(weight_col)).cast("double") / F.count(F.lit(1))).alias("w_mean")
    )
    b = hash_bucket(F.col(key_col), salt)
    p = F.least(
        F.lit(1.0), F.lit(rate) * F.col(weight_col).cast("double") / F.col("w_mean")
    )
    return (
        df.crossJoin(F.broadcast(mean))
        .filter(b < F.floor(p * _BUCKETS))
        .drop("w_mean")
    )


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: Mapping[str, float], salt: str = ""
) -> DataFrame:
    """Keep each row with its stratum's fraction, decided by the row's own
    hash bucket — deterministic, single-pass, no shuffle, no per-stratum
    count pass. Rows whose stratum is not in ``fractions`` are dropped.
    The realized rate converges to the fraction at 1/10000 granularity."""
    # bucket on the row identity: the concatenation of all column values,
    # stable for a fixed schema (callers wanting a narrower identity can
    # pre-project)
    rowkey = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in df.columns])
    b = hash_bucket(rowkey, salt)
    cut = None
    for sv, frac in fractions.items():
        clause = (F.col(strata_col) == sv) & (b < F.lit(int(round(frac * _BUCKETS))))
        cut = clause if cut is None else (cut | clause)
    return df.filter(cut if cut is not None else F.lit(False))
