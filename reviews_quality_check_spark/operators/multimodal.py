"""Multimodal (image/audio/video) column operators.

Media is carried as opaque ``binary`` payloads with typed metadata
(schema.MEDIA_SCHEMA). Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each Python worker touches whole record batches, and
payload bytes never round-trip through the driver.

The actual codec calls are STUBBED (Pillow/librosa/ffmpeg are not in
this container): ``decode_image_features`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake extractor runs
so the Spark-side plumbing (schema, batching, partitioning, UDF
signatures) is real and testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "media_id long, kind string, feat_dim int, features array<float>, decode_ok boolean"
)


def _fake_features(payload: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: md5-seeded values in
    [-1, 1). Keeps tests meaningful (stable, content-dependent)."""
    if payload is None:
        payload = b""
    h = hashlib.md5(bytes(payload)).digest()
    return [((h[i % 16] / 255.0) * 2.0 - 1.0) for i in range(dim)]


def extract_media_features(
    df: DataFrame, dim: int = 8, fake: bool = False, batch_rows: int = 256
) -> DataFrame:
    """Decode payloads → fixed-dim feature vectors via mapInPandas.

    Real decode path is a stub: raises NotImplementedError (no media
    libraries in this environment). ``fake=True`` runs the deterministic
    fake extractor through the identical batch path.

    Scale notes: repartition by media_id spreads payload bytes evenly;
    maxRecordsPerBatch bounds Arrow batch memory (payloads can be MBs).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decoding requires Pillow/librosa/ffmpeg, not "
                    "available in this environment; pass fake=True for the "
                    "deterministic test extractor"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat_dim": dim,
                    "features": [_fake_features(p, dim) for p in pdf["payload"]],
                    "decode_ok": [p is not None for p in pdf["payload"]],
                }
            )
            yield out

    return (
        df.repartition(df.sparkSession.sparkContext.defaultParallelism, "media_id")
        .mapInPandas(run, schema=FEATURE_SCHEMA)
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Plan-side frame sampling for video rows: computes the frame
    timestamps to decode (pure expressions); the decode itself is the
    stubbed extractor. Output: one row per (media_id, frame_ts_ms)."""
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ts_ms"))
    )
