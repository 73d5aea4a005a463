"""Multimodal column plumbing (graft-added).

The reference skips media downloads entirely (``telegram_scraper.py:84-99``
records only ``media_type`` strings); a 100TB training pipeline instead
carries media as opaque ``binary`` columns with typed metadata. This module
provides the REAL Spark-side machinery — schemas, Arrow-batched UDF
signatures, partition-aware batch shapes — with the codec step stubbed
behind a deterministic fake (the decode libraries are not in this container;
swap ``_decode_image_stub`` for a PIL/libvips call in production, the
surrounding plumbing is unchanged and tested).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), True),      # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),          # opaque bytes
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

IMAGE_FEATURE_FIELDS = [
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("payload_sha256", T.StringType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
]


def _decode_image_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decoder: derives a stable (width, height) and a
    16-dim feature vector from the payload bytes. Replace with a real codec
    (PIL.Image.open etc.) in production — signature stays identical.
    Raises NotImplementedError for payloads flagged as requiring a real
    codec (magic prefix b'REAL')."""
    if payload[:4] == b"REAL":
        raise NotImplementedError("real image decoding requires PIL/libvips on executors")
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feature = [b / 255.0 for b in h[:16]]
    return width, height, feature


def extract_image_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """media table → per-image features via Arrow-batched mapInPandas.
    Narrow plan (no shuffle); decode cost is batch-amortized; binary payloads
    cross the Arrow boundary zero-copy."""
    out_schema = T.StructType(
        [T.StructField("media_id", T.LongType(), False)] + IMAGE_FEATURE_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                w, h, feat = _decode_image_stub(data)
                recs.append({
                    "media_id": int(mid), "width": w, "height": h,
                    "n_bytes": len(data),
                    "payload_sha256": hashlib.sha256(data).hexdigest(),
                    "feature": feat,
                })
            yield pd.DataFrame(recs, columns=[f.name for f in out_schema.fields])

    img = media.where(F.col("media_type") == "image").select("media_id", "payload")
    return img.mapInPandas(run, schema=out_schema)


def sample_video_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plumbing: emits (media_id, frame_idx) rows for frames
    0, n, 2n … derived from the (stubbed) frame count in metadata. The frame
    decode itself would run in the same mapInPandas pattern as
    extract_image_features."""
    frames = F.coalesce(F.element_at("meta", F.lit("n_frames")).cast("int"), F.lit(0))
    idx = F.sequence(F.lit(0), F.greatest(frames - 1, F.lit(0)), F.lit(every_n))
    return (media.where(F.col("media_type") == "video")
            .select("media_id", F.explode(idx).alias("frame_idx")))


def media_profile(media: DataFrame) -> DataFrame:
    """Typed metadata rollup — size distribution per media_type."""
    return media.groupBy("media_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.length("payload")), 2).alias("avg_bytes"),
        F.max(F.length("payload")).alias("max_bytes"))


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize plumbing: Arrow-batched mapInPandas with the codec stubbed
    (deterministic fake payload = sha256 of (payload, w, h) bytes). Swap the
    stub for PIL's resize in production; schema/batching stay identical."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                if data[:4] == b"REAL":
                    raise NotImplementedError(
                        "real image resize requires PIL/libvips on executors")
                fake = hashlib.sha256(data + f"{width}x{height}".encode()).digest()
                recs.append({"media_id": int(mid), "width": width,
                             "height": height, "payload": fake})
            yield pd.DataFrame(recs, columns=[f.name for f in out_schema.fields])

    img = media.where(F.col("media_type") == "image").select("media_id", "payload")
    return img.mapInPandas(run, schema=out_schema)
