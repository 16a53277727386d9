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


try:  # real decoder, if ever present in the runtime image
    from PIL import Image as _PILImage  # noqa: N813
except Exception:  # pragma: no cover - container has no PIL
    _PILImage = None


def _decode_image_real(payload: bytes, size: tuple[int, int]) -> list[float]:
    """Real image decode+resize kernel (PIL). Only reachable when PIL is
    installed; the container ships without it, so callers go through
    :func:`decode_image_features`, which falls back deterministically."""
    import io

    img = _PILImage.open(io.BytesIO(payload)).convert("L").resize(size)
    pixels = list(img.getdata())
    total = max(len(pixels), 1)
    return [p / 255.0 for p in pixels[: size[0]]] + [sum(pixels) / (255.0 * total)]


def decode_image_features(payload: bytes, size: tuple[int, int] = (8, 8)) -> list[float]:
    """Import-guarded image decode: PIL when available, else the
    deterministic byte-histogram fake (same output dim = size[0] + 1).

    The guard is the kernel boundary: swapping in a real decoder changes
    ONLY this function — schema, batching, and partitioning are already
    production-real.
    """
    if _PILImage is not None and payload:
        try:
            return _decode_image_real(payload, size)
        except Exception:
            pass  # non-image payload in a mixed table: fall through
    return _fake_decode_features(payload, size[0] + 1)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("offset_ms", LongType(), False),
        StructField("frame_payload", BinaryType(), True),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Explode video rows into ``n_frames`` evenly-spaced frames.

    Real plumbing, stubbed decode: frame offsets are exact
    (``round(i * duration / (n-1))``, clamped to ``duration``), and the
    per-frame payload is a deterministic slice of the video payload
    standing in for an ffmpeg seek+decode (which is not in this
    container). One input row → n output rows via mapInPandas, so a
    single 2-hour video never materializes as one huge Arrow cell list:
    each yielded batch holds at most the input batch × n_frames rows.

    At 100 TB the frame table is written partitioned by a coarse
    media_id bucket so downstream per-frame featurization reads
    co-located frames without a shuffle.
    """
    if n_frames < 1:
        raise ValueError("n_frames must be >= 1")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["kind"] == "video"]
            if vids.empty:
                continue
            out_rows = []
            for _, r in vids.iterrows():
                dur = int(r["duration_ms"] or 0)
                payload = r["payload"]
                for i in range(n_frames):
                    off = (
                        0
                        if n_frames == 1
                        else round(i * dur / (n_frames - 1))
                    )
                    if payload is None:
                        frame = None
                    else:
                        # deterministic stand-in for seek(off)+decode
                        step = max(len(payload) // n_frames, 1)
                        frame = bytes(payload[i * step : (i + 1) * step])
                    out_rows.append((int(r["media_id"]), i, off, frame))
            yield pd.DataFrame(
                out_rows,
                columns=["media_id", "frame_idx", "offset_ms", "frame_payload"],
            )

    return df.mapInPandas(process, schema=FRAME_SCHEMA)


VIDEO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def video_features(df: DataFrame, n_frames: int = 4, dim: int = 8) -> DataFrame:
    """Video featurization = frame sampling → per-frame decode →
    mean-pool, all expressed as DataFrame ops so Catalyst parallelizes
    across media rows. Mean-pool uses built-in higher-order functions
    (JVM-side), not Python."""
    frames = sample_frames(df, n_frames=n_frames)
    feats = frames.mapInPandas(
        _frame_feature_fn(dim),
        schema=StructType(
            [
                StructField("media_id", LongType(), False),
                StructField("feature", ArrayType(FloatType()), True),
            ]
        ),
    )
    # mean-pool per media_id: element-wise array sum via aggregate(zip_with)
    zero = F.array([F.lit(0.0)] * dim)
    return (
        feats.groupBy("media_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.aggregate(
                F.collect_list("feature"),
                zero,
                lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
            ).alias("_sum"),
        )
        .withColumn(
            "feature",
            F.transform(
                F.col("_sum"), lambda v: (v / F.col("n_frames")).cast("float")
            ),
        )
        .drop("_sum")
    )


def _frame_feature_fn(dim: int):
    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": pdf["frame_payload"].map(
                        lambda p: _fake_decode_features(p, dim)
                    ),
                }
            )

    return process


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (seeded payloads)."""
    rows = []
    for i in range(n):
        payload = bytes(((i * 7 + j * 13) % 251) for j in range(32 + (i % 5) * 16))
        kind = ("image", "audio", "video")[i % 3]
        rows.append((i, kind, f"application/x-fake-{kind}", payload, 64, 64, 1000))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
