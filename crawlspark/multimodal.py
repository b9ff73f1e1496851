"""Multimodal (image/audio/video) column plumbing (session mandate).

Media travel as opaque ``binary`` columns with a typed metadata struct; the
Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested.  The actual codec step is STUBBED: the
sandbox ships no image/audio libraries, so ``decode_features`` either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
feature vector derived from the bytes (test mode).  Swapping in a real
decoder (PIL/ffmpeg) changes only ``_decode_one``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("url", StringType(), True),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("meta_format", StringType(), True),
        StructField("meta_bytes", LongType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_duration_ms", LongType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("payload_sha256", StringType(), False),
        StructField("features", ArrayType(FloatType()), True),
    ]
)

FEATURE_DIM = 16


def _decode_one(payload: bytes, kind: str, strict: bool) -> list[float] | None:
    """STUB decode/feature-extract.

    Real implementation would be: image → resize+embed (PIL/torch), audio →
    mel features, video → frame-sample+embed.  None of those libs exist in
    this container, so strict mode raises and test mode derives a
    deterministic pseudo-feature vector from the payload digest.
    """
    if payload is None:
        return None
    if strict:
        raise NotImplementedError(
            f"no {kind} codec available in this environment; "
            "install PIL/ffmpeg and replace multimodal._decode_one"
        )
    dig = hashlib.sha256(payload).digest()
    arr = np.frombuffer(dig[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return (arr / 65535.0).tolist()


def decode_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """mapInPandas feature extraction; Arrow batches keep payloads off the
    driver and bound worker memory (fat binary rows)."""

    def _batches(it):
        for pdf in it:
            feats = [
                _decode_one(p, k, strict)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "payload_sha256": [
                        hashlib.sha256(p).hexdigest() if p is not None else ""
                        for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return media.mapInPandas(_batches, FEATURES_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Pure built-in metadata projection (no payload decode)."""
    return media.select(
        "media_id",
        "kind",
        F.coalesce(F.col("meta_bytes"), F.length("payload").cast("long")).alias("n_bytes"),
        F.col("meta_format").alias("format"),
    )


def synthesize_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media:{i}".encode()).digest() * (1 + i % 4)
        kind = kinds[i % 3]
        rows.append(
            (
                i,
                f"https://media{i % 7}.example/m/{i}",
                kind,
                payload,
                {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                len(payload),
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                1000 * (i % 30) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
