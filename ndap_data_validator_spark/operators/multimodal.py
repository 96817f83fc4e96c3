"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas iterators.

The decode kernels themselves are STUBBED (this container has no
image/audio libraries): ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
fake derived from the payload bytes is produced. Everything AROUND the
kernel is real and tested — the schema contract, the ``mapInPandas``
batch shape (iterator of pandas DataFrames), partition sizing, and the
feature-column plumbing — so swapping in a real decoder (PIL/librosa/ffmpeg)
is a one-function change on a working distributed pipeline.

Why mapInPandas: per-row Python is banned (input_hint); Arrow batches give
the decode UDF vectorized transfer, and an iterator API lets one task stream
many batches without materializing a partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), True),  # image | audio | video
        StructField("content", BinaryType(), True),  # opaque payload
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_DIM = 16

_FEATURE_FIELDS = [
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), True),
    StructField("n_bytes", IntegerType(), True),
    # double, not float: the kernel emits int/2^32 — an exact dyadic double;
    # declaring float32 here would lossily round-trip through Arrow and make
    # the values engine-unreplayable (the oracle computes the exact double)
    StructField("features", ArrayType(DoubleType()), True),
]
FEATURE_SCHEMA = StructType(_FEATURE_FIELDS)


def _fake_features(payload: bytes | None, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in feature vector: sha256-seeded floats in [0,1).
    Replaces a real encoder; stable across runs/machines for tests."""
    if payload is None:
        return [0.0] * dim
    h = hashlib.sha256(payload).digest()
    need = dim * 4
    buf = (h * (need // len(h) + 1))[:need]
    return [
        int.from_bytes(buf[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)
    ]


def decode_image(payload: bytes, fake: bool = False) -> Any:
    """STUB: a real implementation would decode via PIL/opencv. The Spark
    plumbing around this call is real; only the kernel is absent here."""
    if fake:
        return _fake_features(payload)
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "environment; pass fake=True for the deterministic test kernel"
    )


def decode_audio(payload: bytes, fake: bool = False) -> Any:
    """STUB: real implementation = soundfile/librosa frame decode."""
    if fake:
        return _fake_features(payload)
    raise NotImplementedError(
        "audio decoding requires an audio library not present in this "
        "environment; pass fake=True for the deterministic test kernel"
    )


def extract_features(
    df: DataFrame,
    fake: bool = True,
    batch_hint: int | None = None,
) -> DataFrame:
    """media rows → (media_id, kind, n_bytes, features[FEATURE_DIM]).

    Arrow-batched ``mapInPandas``; each task consumes an iterator of pandas
    batches — the production shape for decode/resize/frame-sample kernels.
    ``fake=True`` uses the deterministic kernel (tests); ``fake=False``
    raises where a real decoder would run.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_image(c, fake=fake)
                if k == "image"
                else decode_audio(c, fake=fake)
                if k == "audio"
                else _fake_features(c)
                for k, c in zip(pdf["kind"], pdf["content"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(c) if c is not None else 0 for c in pdf["content"]
                    ],
                    "features": feats,
                }
            )

    cols = ["media_id", "kind", "content"]
    return df.select(*cols).mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_ts_ms) rows — the
    partition-friendly explode that precedes a decode kernel. Pure Catalyst:
    sequence() over the stored duration."""
    return df.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived from
    the row id (sha2 over a string), kinds cycling image/audio/video."""
    return spark.range(n).select(
        F.concat(F.lit("m-"), F.col("id").cast("string")).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        ((F.col("id") % 5 + 1) * 1000).cast("int").alias("duration_ms"),
    )
