"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` stages. The decode kernels themselves are STUBS in this
container (no image/audio libraries available — clearly marked below); the
Spark-side plumbing — schema, batching, partition sizing, UDF signatures —
is real and tested with a deterministic fake extractor.

At scale: binary payloads dominate bytes, so ``spark.sql.files.
maxPartitionBytes`` (not row counts) sizes tasks; feature extraction is the
GPU/CPU boundary where a real decoder (PIL/ffmpeg/torchvision) slots into
``decode_batch``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int,height:int,duration_ms:int,codec:string>"
)


def attach_fake_media(documents: DataFrame) -> DataFrame:
    """Synthesize a media table from documents (payload = utf-8 bytes of the
    text — a deterministic opaque blob standing in for image bytes)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            (F.pmod(F.col("doc_id"), F.lit(64)) * 16 + 16).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(48)) * 16 + 16).cast("int").alias("height"),
            (F.length(F.col("text")) * 10).cast("int").alias("duration_ms"),
            F.lit("fake/v1").alias("codec"),
        ).alias("meta"),
    )


def real_decode(kind: str, payload: bytes, meta) -> np.ndarray:
    """STUB — the actual decoder (PIL / libav / torchaudio) is not available
    in this container. A production deployment replaces this function; the
    mapInPandas plumbing around it is unchanged."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this environment"
    )


def fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'decoder' (md5-seeded) exercising the exact batch
    shapes a real extractor produces."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 16, use_real_decoder: bool = False) -> DataFrame:
    """media table → ``(media_id, kind, feature: array<float>, n_bytes)``.

    Arrow-batched ``mapInPandas``; one numpy matrix per batch (the shape a
    GPU extractor wants). Set ``use_real_decoder=True`` once a decode
    library is installed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_decoder:
                feats = [
                    real_decode(k, p, None) for k, p in zip(pdf["kind"], pdf["payload"])
                ]
            else:
                feats = [fake_features(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": pdf["payload"].map(len),
                }
            )

    return media.mapInPandas(
        run, schema="media_id long, kind string, feature array<float>, n_bytes long"
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame to decode
    ``(media_id, frame_idx, ts_ms)`` — pure relational explode of metadata,
    no decoding. The decode itself would map over this plan."""
    v = media.filter(F.col("kind") == "video")
    n_frames = F.greatest(F.floor(F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1))
    return v.select(
        "media_id",
        F.posexplode(F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms)).alias(
            "frame_idx", "ts_ms"
        ),
    )
