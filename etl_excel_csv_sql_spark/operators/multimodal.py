"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The container has no image/audio codecs, so the decode kernels are STUBS
(deterministic fakes / NotImplementedError) — but the Spark-side shape is
real and tested: schemas, Arrow batch flow through mapInPandas, typed
metadata structs, partitioning knobs. Swapping a real decoder in changes
only the inner function body.

Design for 100 TB of media:
- binary payloads stay in parquet/iceberg columns; never collect() them;
- mapInPandas streams Arrow batches → bounded executor memory regardless
  of row width (spark.sql.execution.arrow.maxRecordsPerBatch caps batch
  rows for fat media columns);
- derived features (dims, duration, embeddings) are narrow maps; heavy
  decode stages should repartition by size-bucket first so one 4K video
  doesn't straggle a partition of thumbnails.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Typed metadata schema attached to every media column.
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("byte_len", LongType(), True),
        StructField("magic", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def to_media_column(
    df: DataFrame, id_col: str, payload_col: str, media_type: str = "image"
) -> DataFrame:
    """Normalize any binary-bearing frame into the engine's media shape:
    (media_id, media_type, payload binary, byte_len, magic). ``magic`` is
    the first 4 bytes hex — enough to route by container format without
    decoding."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("byte_len"),
        F.hex(F.substring(payload, 1, 4)).alias("magic"),
    )


def _fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decoder: derives fake (w, h)
    from payload bytes. REAL IMPLEMENTATION REQUIRES a codec (PIL/opencv),
    absent in this container."""
    if payload is None:
        return (0, 0)
    h = 0
    for byte in payload[:64]:
        h = (h * 131 + byte) & 0x7FFFFFFF
    return (64 + h % 1920, 64 + (h >> 11) % 1080)


def extract_image_meta(df: DataFrame, strict: bool = False) -> DataFrame:
    """Decode image headers → (media_id, media_type, byte_len, magic,
    width, height) via mapInPandas (Arrow-batched; payload bytes never
    round-trip as Python row objects).

    ``strict=True`` raises NotImplementedError — the honest mode while the
    real decoder is absent; default uses the deterministic fake so the
    plumbing is end-to-end testable.
    """
    if strict:
        raise NotImplementedError(
            "image decoding requires a codec library (PIL/opencv) not "
            "present in this environment; plumbing is testable via strict=False"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf["payload"].map(_fake_decode_dims)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "magic": pdf["magic"],
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                }
            )

    return df.mapInPandas(batches, MEDIA_META_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_n_seconds: int = 5, duration_col: str = "byte_len"
) -> DataFrame:
    """Video frame-sampling *plan*: explode one row per sampled frame index
    (the decode itself is the stubbed kernel). Duration here is faked from
    byte_len pending a real demuxer. Shows the scale-correct shape: explode
    → repartition by (media_id % shards) before the heavy decode so long
    videos spread across executors."""
    n_frames = (F.col(duration_col) / F.lit(1_000_000 * every_n_seconds)).cast("int") + 1
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("sample_ts_s", F.col("frame_idx") * every_n_seconds)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("src_width", IntegerType(), True),
        StructField("src_height", IntegerType(), True),
        StructField("dst_width", IntegerType(), True),
        StructField("dst_height", IntegerType(), True),
    ]
)


def resize_images(
    df: DataFrame, max_side: int = 256, strict: bool = False
) -> DataFrame:
    """Aspect-preserving thumbnail resize via mapInPandas — payload in,
    payload out, plus source/target dims. The resize KERNEL is the stub
    (payload passes through; a real implementation swaps in PIL's
    ``thumbnail`` inside the batch loop); the Arrow batch flow, binary
    round-trip, and dimension arithmetic are real and tested.

    At 100 TB: this is the straggler-prone stage — repartition by a
    byte_len size bucket BEFORE it so a partition of 4K stills doesn't
    serialize behind thumbnails; output payloads shrink, so coalesce
    after.
    """
    if strict:
        raise NotImplementedError(
            "image resize requires a codec library (PIL/opencv) not "
            "present in this environment; plumbing is testable via strict=False"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf["payload"].map(_fake_decode_dims)
            sw = dims.map(lambda d: d[0])
            sh = dims.map(lambda d: d[1])
            scale = pd.concat([sw, sh], axis=1).max(axis=1).map(
                lambda side: min(1.0, max_side / side) if side else 0.0
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"],  # stub: real kernel re-encodes
                    "src_width": sw.astype("int32"),
                    "src_height": sh.astype("int32"),
                    "dst_width": (sw * scale).round().astype("int32"),
                    "dst_height": (sh * scale).round().astype("int32"),
                }
            )

    return df.mapInPandas(batches, RESIZED_SCHEMA)


AUDIO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("byte_len", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_s", IntegerType(), True),
    ]
)


def extract_audio_meta(df: DataFrame, strict: bool = False) -> DataFrame:
    """Audio feature extraction via mapInPandas: (sample_rate, n_samples,
    duration) per payload. The demux KERNEL is the stub (deterministic
    fake from header bytes — a real implementation reads the container
    header via soundfile/ffprobe); batching and typed output are real."""
    if strict:
        raise NotImplementedError(
            "audio demuxing requires an audio library (soundfile/ffmpeg) "
            "not present in this environment; plumbing is testable via "
            "strict=False"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rate = pdf["payload"].map(
                lambda p: 8000 * (1 + (sum(p[:16]) % 6)) if p is not None else 0
            )
            n_samples = pdf["byte_len"].fillna(0).astype("int64") * 4
            rate64 = rate.astype("int64")
            # rate == 0 (null payload) → duration 0, never n_samples / 1
            duration = (n_samples // rate64.where(rate64 > 0, 1)).where(
                rate64 > 0, 0
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": pdf["byte_len"],
                    "sample_rate": rate.astype("int32"),
                    "n_samples": n_samples,
                    "duration_s": duration.astype("int32"),
                }
            )

    return df.mapInPandas(batches, AUDIO_META_SCHEMA)
