"""Multimodal column plumbing (SURVEY §2.4 E6).

Images / audio / video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schema, partitioning, Arrow batch shape,
UDF signatures — is real and tested; the actual media decode is stubbed
(decode libs are not in this container) behind ``DecodeUnavailable`` or a
deterministic fake so the pipeline shape can be exercised end-to-end.

100 TB rule: blobs stay OUT of row storage in production — the blob column
carries an object-store path + byte-range, and ``mapInPandas`` workers fetch
lazily per batch. In-row binary is supported for small assets (< ~1 MB).
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
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical multimodal asset schema: out-of-row pointer + optional inline bytes
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("uri", StringType(), True),  # object-store path (prod path)
        StructField("data", BinaryType(), True),  # inline bytes (small assets)
        StructField("media_type", StringType(), True),  # e.g. image/png
        StructField("meta", StructType([
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("duration_ms", LongType(), True),
        ]), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised by the real decode path: media libraries are not installed."""


def decode_image(data: bytes) -> "object":
    """STUB — real implementation would decode via PIL/opencv."""
    raise DecodeUnavailable("image decode requires PIL/opencv (not in this container)")


def deterministic_fake_feature(data: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic stand-in featurizer: byte-histogram moments. Lets tests
    assert the full mapInPandas plumbing without media libs."""
    if not data:
        return [0.0] * dim
    acc = [0] * dim
    for i, byte in enumerate(data):
        acc[i % dim] += byte
    total = max(sum(acc), 1)
    return [round(a / total, 6) for a in acc]


def extract_features(assets: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the asset table.

    ``mapInPandas`` so each worker streams record batches — constant memory
    regardless of table size; partitioning of the input is preserved.
    """

    # self-contained closure: executors must not need this package importable
    # (cloudpickle serializes nested functions by value, module refs by name)
    def fake_feature(data, d=dim):
        if not data:
            return [0.0] * d
        acc = [0] * d
        for i, byte in enumerate(data):
            acc[i % d] += byte
        total = max(sum(acc), 1)
        return [round(a / total, 6) for a in acc]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["data"].map(lambda d: len(d) if d is not None else 0),
                    "feature": pdf["data"].map(fake_feature),
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video assets: one output row per sampled frame
    timestamp (decode stubbed; timestamps computed from metadata)."""
    v = assets.filter(F.col("modality") == "video")
    return v.select(
        "asset_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)).cast("long"),
                F.lit(every_ms).cast("long"),
            )
        ).alias("frame_ts_ms"),
    )


def synthetic_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic in-test asset table (binary payloads derived from ids)."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = bytes([(i * 7 + j) % 256 for j in range(64 + (i % 5) * 16)])
        rows.append(
            (
                i,
                modality,
                f"s3://bucket/assets/{modality}/{i}",
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[modality],
                (64, 48, 5000 if modality == "video" else None),
            )
        )
    # coalesce: 64 in-memory rows otherwise scatter across defaultParallelism
    # partitions, each spinning up its own Python worker in mapInPandas
    return spark.createDataFrame(rows, ASSET_SCHEMA).coalesce(4)
