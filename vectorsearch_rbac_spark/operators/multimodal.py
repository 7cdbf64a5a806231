"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY.md §2 E13): image/audio/video travel as ``binary`` columns
with a metadata struct; decode / resize / frame-sample are ``mapInPandas``
stages so the heavy work is Arrow-batched and scales with partitions. The
decode kernels themselves are STUBBED (pillow/ffmpeg absent in this
environment by design): ``decode_stub=True`` produces deterministic fake
features sized like the real thing, so the Spark-side plumbing — schema,
batching, partitioning — is real and testable; swap ``_decode_image`` for a
real kernel on a cluster with the codec libs installed.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
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
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("codec", StringType()),
    ]
)


def synthesize_media(documents: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media table derived from documents (payload =
    text bytes) — stands in for a real binary ingest while exercising the
    exact schema/batch path."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 32).cast("int").alias("height"),
        (F.col("doc_id") % 30000).cast("int").alias("duration_ms"),
        F.lit("raw").alias("codec"),
    )


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode: deterministic pseudo-pixels from payload hash.

    Real deployment: replace with PIL.Image.open(BytesIO(payload)).
    """
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, n_bytes long"


def extract_features(media: DataFrame, feat_dim: int = 16) -> DataFrame:
    """Decode + pool features per media row, Arrow-batched.

    The per-batch loop is vectorizable numpy; partition count controls
    parallelism — at 100 TB this is a map-only stage with no shuffle.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nb = [], []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                img = _decode_image(bytes(payload), int(w), int(h))
                # mean-pool into feat_dim buckets over the flattened image
                flat = img.reshape(-1).astype(np.float64)
                chunks = np.array_split(flat, feat_dim)
                feats.append(np.array([c.mean() for c in chunks], dtype=np.float32))
                nb.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": nb,
                }
            )

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int = 64, out_h: int = 64) -> DataFrame:
    """Resize plumbing (stubbed kernel): emits payload of the resized size.

    Real deployment: PIL resize; here the output length is exact
    (out_w*out_h*3) so downstream sizing/packing logic is testable.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                img = _decode_image(bytes(payload), int(w), int(h))
                ys = np.linspace(0, img.shape[0] - 1, out_h).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, out_w).astype(int)
                out.append(img[ys][:, xs].tobytes())
            pdf = pdf.copy()
            pdf["payload"] = out
            pdf["width"] = out_w
            pdf["height"] = out_h
            yield pdf

    return media.mapInPandas(fn, schema=media.schema)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: explode each video row into frame rows at a
    fixed cadence (decode stubbed; frame payload = hash-derived bytes).
    Output schema: (media_id, frame_idx, ts_ms, payload)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "ts_ms": [], "payload": []}
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                for i, ts in enumerate(range(0, int(dur), every_ms)):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(ts)
                    rows["payload"].append(hashlib.md5(bytes(payload) + ts.to_bytes(4, "big")).digest())
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "video").mapInPandas(
        fn, schema="media_id long, frame_idx int, ts_ms int, payload binary"
    )
