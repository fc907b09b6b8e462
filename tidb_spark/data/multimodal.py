"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libs in this container): each
decoder raises NotImplementedError unless ``fake=True``, in which case a
clearly-marked deterministic fake derived from the bytes stands in.  The
Spark-side plumbing — schema, partitioning, UDF signatures, Arrow batch
shape — is real and is what these operators exercise.

At scale: binary payloads dominate row size, so the decode stage uses
``mapInPandas`` (Arrow batches, zero-copy into pandas), repartitioned first
so batches are balanced; metadata-only queries never touch the binary column
(column pruning keeps it out of the scan).
"""

from __future__ import annotations

import hashlib
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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("byte_len", LongType()),
        StructField("content_sha", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Derive a MEDIA_SCHEMA DataFrame from a text fixture: the payload is
    the utf-8 bytes (an opaque blob as far as the pipeline is concerned)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.sha2(payload, 256).alias("content_sha"),
    )


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """DETERMINISTIC FAKE: feature vector from the payload digest.  Stands in
    for a real image/audio decoder, which is unavailable in this container."""
    digest = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(digest[(4 * i) % 28 : (4 * i) % 28 + 4], "big")
        / float(1 << 32)
        for i in range(dim)
    ]


def decode_features(
    media: DataFrame, *, dim: int = 8, fake: bool = False
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    ``fake=False`` raises NotImplementedError per batch — the honest stub;
    ``fake=True`` substitutes the deterministic digest-based fake so the
    pipeline shape (schema, batching, downstream joins) is testable."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image/audio decode requires codec libraries not present "
                    "in this container; pass fake=True for the deterministic "
                    "stand-in"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    # Fake dimensions derived from payload length.
                    "width": (pdf["byte_len"] % 640 + 16).astype("int32"),
                    "height": (pdf["byte_len"] % 480 + 16).astype("int32"),
                    "feature": [
                        _fake_decode(p, dim) for p in pdf["payload"]
                    ],
                }
            )
            yield out

    return media.repartition("media_id").mapInPandas(
        decode_batches, schema=FEATURE_SCHEMA
    )


def frame_sample(
    media: DataFrame, *, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """Video frame-sampling plumbing: emit (media_id, frame_no, frame_sha)
    rows.  The 'frames' are deterministic byte-slices standing in for real
    decoded frames; the explode/partition shape matches the real operator."""
    frames = F.transform(
        F.sequence(
            F.lit(0),
            F.least(
                (F.col("byte_len") / every_n_bytes).cast("int"),
                F.lit(max_frames - 1),
            ),
        ),
        lambda i: F.struct(
            i.alias("frame_no"),
            F.sha2(
                F.substring(
                    F.col("payload"), i * every_n_bytes + 1, every_n_bytes
                ),
                256,
            ).alias("frame_sha"),
        ),
    )
    return (
        media.where(F.col("media_type") == "video")
        .select("media_id", F.explode(frames).alias("f"))
        .select("media_id", "f.frame_no", "f.frame_sha")
    )
