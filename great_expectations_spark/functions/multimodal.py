"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode/feature-extraction libs (PIL/ffmpeg/etc.) are NOT in this
container, so the decode kernels are stubs: ``deterministic_fake=True``
produces a seeded, reproducible feature payload so the Spark-side plumbing
(schema, partition-preserving mapInPandas, Arrow batch shape) is fully real
and testable; ``deterministic_fake=False`` raises NotImplementedError at
the decode site.

Schema convention:
  media struct<data: binary, mime: string, width: int, height: int,
               duration_ms: int>
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

IMAGE_FEATURE_DIM = 16


def attach_media_metadata(
    df: DataFrame, binary_column: str, mime: str
) -> DataFrame:
    """Wrap a raw binary column with typed metadata (sizes unknown until
    decode; populated by the decode pass)."""
    return df.withColumn(
        f"{binary_column}_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )


def _decode_image_bytes(data: bytes, deterministic_fake: bool) -> List[float]:
    if not deterministic_fake:
        # Real implementation: PIL.Image.open(io.BytesIO(data)) → resize →
        # normalized pixel stats / embedding. Image libs absent here.
        raise NotImplementedError(
            "image decode requires PIL/opencv, not available in this "
            "environment; pass deterministic_fake=True for plumbing tests"
        )
    import hashlib

    import numpy as np

    digest = hashlib.blake2b(data or b"", digest_size=IMAGE_FEATURE_DIM * 2).digest()
    arr = np.frombuffer(digest, dtype=np.uint16).astype(np.float64)
    return list(arr / 65535.0)


def image_features(
    df: DataFrame,
    binary_column: str = "data",
    deterministic_fake: bool = True,
    batch_size_hint: int = 1024,
) -> DataFrame:
    """Per-image feature extraction over ``mapInPandas`` — Arrow batches
    in, Arrow batches out, partition-preserving (no shuffle). The fake
    decode is seeded by content so results are deterministic at any
    parallelism."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("features", T.ArrayType(T.DoubleType())),
            T.StructField("n_bytes", T.IntegerType()),
        ]
    )

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = pdf[binary_column].map(
                lambda b: _decode_image_bytes(
                    bytes(b) if b is not None else b"", deterministic_fake
                )
            )
            pdf["n_bytes"] = pdf[binary_column].map(
                lambda b: len(b) if b is not None else 0
            )
            yield pdf

    return df.mapInPandas(decode_batches, out_schema)


def frame_sample_plan(
    df: DataFrame,
    duration_column: str,
    every_ms: int = 1000,
) -> DataFrame:
    """Video frame-sampling plumbing: explode each row into frame
    timestamps (JVM-side sequence/explode); the actual frame decode joins
    on (row, frame_ts) in the real pipeline."""
    return df.withColumn(
        "frame_ts_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(duration_column) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ),
    )
