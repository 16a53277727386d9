"""Multimodal column plumbing (engine extension).

Images/audio/video are opaque ``binary`` columns + typed metadata. The
decode/feature-extraction libraries are NOT in this container, so the
decode kernels are stubbed (deterministic fake or NotImplementedError)
while the Spark-side plumbing — schema, batch iteration with
mapInPandas, partition sizing — is real and tested.

At 100 TB: binary payloads dominate IO, so (a) metadata lives in
separate columns to keep pruned scans payload-free, (b) the decode
stage is mapInPandas with small ``maxRecordsPerBatch`` so Arrow batches
bound memory, (c) outputs are fixed-size feature vectors, never decoded
frames.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: byte-histogram
    features. Replace with PIL/torchaudio/ffmpeg decode in a real
    deployment (kernel boundary is exactly here)."""
    if payload is None:
        return [0.0] * dim
    counts = [0] * dim
    for b in payload:
        counts[b % dim] += 1
    total = max(len(payload), 1)
    return [c / total for c in counts]


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over media rows.

    Real decoders would sit inside ``process``; batch shape / schema /
    partitioning are production-real.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature": pdf["payload"].map(
                        lambda p: _fake_decode_features(p, dim)
                    ),
                }
            )
            yield out

    return df.mapInPandas(process, schema=FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (seeded payloads)."""
    rows = []
    for i in range(n):
        payload = bytes(((i * 7 + j * 13) % 251) for j in range(32 + (i % 5) * 16))
        kind = ("image", "audio", "video")[i % 3]
        rows.append((i, kind, f"application/x-fake-{kind}", payload, 64, 64, 1000))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
