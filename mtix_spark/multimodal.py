"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio libraries, so the *decode kernels* are
stubbed (deterministic fake behind `fake=True`, NotImplementedError
otherwise) — but the Spark-side plumbing is real and tested: schemas,
Arrow-batched mapInPandas signatures, partitioning, and batch shapes are
exactly what a real decoder (PIL/torchaudio/ffmpeg) would slot into.

Design for 100 TB of media:
- binary payloads ride in their own column; metadata-only queries never read
  them (parquet column pruning — verified by ReadSchema in .explain).
- decode runs in mapInPandas with a capped Arrow batch (maxRecordsPerBatch)
  so a batch of payloads fits executor memory.
- feature outputs are fixed-width arrays → downstream joins/ANN reuse the
  similarity module unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 32
FEATURES_SCHEMA = f"media_id long, kind string, feature array<float>"
FRAME_SCHEMA = "media_id long, frame_idx int, frame_payload binary"


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake 'decoder': sha-seeded feature vector. Stands in for
    a real CNN/fbank featurizer; same signature, same output shape."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """payload -> fixed-width feature vector, Arrow-batched mapInPandas.

    With fake=False this is where a real decoder mounts; the Spark plumbing
    (batch iteration, schema, column pruning of untouched columns) is
    identical either way.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires PIL/torchaudio — not in this container"
                )
            feats = [
                _fake_decode_features(bytes(p)) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video frame sampling: 1→N rows per input (UDTF shape, mirrors the
    reference's subheading fan-out, /root/reference/src/mtix/predictors.py:200-203).
    Fake kernel emits one 16-byte 'frame' per sampled timestamp."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for mid, dur, payload in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"]
            ):
                if not fake:
                    raise NotImplementedError("real frame extraction requires ffmpeg")
                n = max(1, int(dur or 0) // every_ms)
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_payload"].append(
                        hashlib.blake2b(
                            bytes(payload) + i.to_bytes(4, "little"), digest_size=16
                        ).digest()
                    )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(kernel, FRAME_SCHEMA)


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — must NOT read `payload` (column pruning)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("width").alias("avg_width"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )


def synth_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.blake2b(f"media:{i}".encode(), digest_size=32).digest()
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 8 if kind == "image" else None,
                64 + i % 8 if kind == "image" else None,
                (1 + i % 5) * 1000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
