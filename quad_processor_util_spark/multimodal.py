"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas.

The decode step itself is STUBBED (no image/audio libs in this container):
`decode_image_batch` raises NotImplementedError unless `fake=True`, in which
case a deterministic fake decoder (shape + checksum derived from the bytes)
exercises the full Spark-side contract — schema, partitioning, UDF
signature, Arrow batch shape — which is the part that matters at 100 TB.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("mime", StringType()),
    StructField("payload", BinaryType()),     # opaque bytes
    StructField("width", IntegerType()),      # typed metadata (nullable)
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("checksum", StringType()),
    StructField("feat_dim", IntegerType()),
    StructField("feature_hash", LongType()),
])


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic fake 'decode': checksum + pseudo feature vector stats."""
    h = hashlib.sha256(payload or b"").hexdigest()
    feat_dim = 16
    feature_hash = int(h[:15], 16)
    return h, feat_dim, feature_hash


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode/feature-extract over binary payloads via mapInPandas: one
    Arrow batch of (media_id, kind, payload) in, features out. Real decoders
    (PIL/librosa/ffmpeg) plug into `_decode` with the same signature."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires image/audio libs not present "
                    "in this container; run with fake=True for the plumbing"
                )
            rows = []
            for r in pdf.itertuples():
                payload = bytes(r.payload) if r.payload is not None else b""
                checksum, feat_dim, feature_hash = _fake_decode(payload)
                rows.append((r.media_id, r.kind, len(payload), checksum,
                             feat_dim, feature_hash))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "n_bytes", "checksum",
                         "feat_dim", "feature_hash"],
            )

    cols = media.select("media_id", "kind", "payload")
    return cols.mapInPandas(_decode, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: expand each video row into frame
    timestamps (pure expressions; the decode of each frame is the stubbed
    step). Demonstrates the explode-then-process partitioning shape."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                           F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
