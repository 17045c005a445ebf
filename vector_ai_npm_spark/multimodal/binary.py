"""Multimodal columns (north-star B30+): opaque binary payloads with
typed metadata, processed via Arrow-batched mapInPandas.

Design (SURVEY §2B B30): media are rows of
  (asset_id LONG, modality STRING, payload BINARY, meta STRUCT<...>)
partitioned by modality (partition pruning per media type) and bucketed
by asset_id at scale. Decode / feature-extract / resize / frame-sample
are mapInPandas stages: one Arrow batch of payloads in, one batch of
features out — the shape that keeps 100 TB of media off the driver and
amortizes codec startup per batch rather than per row.

This container has no image/audio codecs, so `decode_image` is a STUB:
the Spark-side plumbing (schema, batching, partitioning) is real and
tested; the pixel decode raises NotImplementedError unless
`fake_decoder=True`, which substitutes a deterministic header parse
(dims from the payload bytes) so tests can exercise the full path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_json", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("checksum", LongType()),
    ]
)


def synth_media(docs: DataFrame) -> DataFrame:
    """Fixture adapter: treat each document's utf-8 bytes as an opaque
    payload with a synthetic modality — real pipelines read
    (path, bytes) from parquet/tar shards the same way."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.to_json(F.struct("lang", "source", "n_chars")).alias("meta_json"),
    )


def decode_image(payload: bytes) -> tuple[int, int]:
    """STUB — the real implementation needs an image codec (PIL/opencv),
    which this container does not ship. The Spark plumbing around it is
    real; swap this function for the codec call in production."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this "
        "environment; use fake_decoder=True for the deterministic stand-in"
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in: derive fake dims from the payload bytes."""
    if not payload:
        return (0, 0)
    return (64 + payload[0] % 64, 64 + payload[-1] % 64)


def extract_features(media: DataFrame, fake_decoder: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow moves each partition through Python in batches; per-batch we'd
    initialize a codec once (the expensive part at scale) and stream
    rows through it.
    """
    decode = _fake_decode if fake_decoder else decode_image

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            dims = pdf["payload"].map(lambda b: decode(bytes(b)))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": dims.map(lambda d: d[0]).astype("int64"),
                    "height": dims.map(lambda d: d[1]).astype("int64"),
                    "checksum": pdf["payload"]
                    .map(lambda b: zlib.crc32(bytes(b)))
                    .astype("int64"),
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 32,
                 max_frames: int = 8) -> DataFrame:
    """'Frame sampling' plumbing demo: slice evenly-spaced windows out of
    each payload (stand-in for video frame extraction) — JVM-side
    byte-slicing via substring on binary, exploded to one row per frame."""
    idx = F.sequence(
        F.lit(0),
        F.least(
            F.lit(max_frames - 1),
            (F.length("payload") / every_n_bytes).cast("int"),
        ),
    )
    return media.select(
        "asset_id",
        "modality",
        F.posexplode(idx).alias("frame_no", "i"),
    ).select(
        "asset_id",
        "modality",
        F.col("frame_no").cast("long").alias("frame_no"),
        (F.col("i") * every_n_bytes).cast("long").alias("byte_offset"),
    )
