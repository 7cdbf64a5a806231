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
    """STUB decode: deterministic pseudo-pixels from payload hash — pixel
    (y, x, c) = (seed + (pos+1)·2654435761) mod p mod 256 with pos the
    row-major offset and seed the 60-bit md5 of the payload. Pure integer
    arithmetic: one vectorized numpy op per image AND exactly replayable
    by the DuckDB oracle (the driver hash-checks the whole decode →
    grid-sample → pool pipeline, not just its row count).

    Real deployment: replace with PIL.Image.open(BytesIO(payload)).
    """
    seed = int(hashlib.md5(payload).hexdigest()[:15], 16)
    pos = np.arange(height * width * 3, dtype=np.int64)
    v = (seed + (pos + 1) * 2654435761) % 2147483647 % 256
    return v.reshape(height, width, 3).astype(np.uint8)


FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, n_bytes long"


def _decode_grid(payload: bytes, width: int, height: int, gw: int, gh: int) -> np.ndarray:
    """Decode + sample onto a fixed (gh, gw, 3) grid — the codec boundary.

    Real codecs (PIL/ffmpeg) are per-image C calls that release the GIL;
    what matters for the Spark hot path is that they return FIXED-size
    tensors so the rest of the batch is one stacked numpy op, not a
    per-row Python loop. Grid sampling is integer nearest-neighbor
    (y_i = i·(h−1) div (gh−1)) — exact, so the oracle replays it."""
    img = _decode_image(payload, width, height)
    ys = (np.arange(gh, dtype=np.int64) * (img.shape[0] - 1)) // max(gh - 1, 1)
    xs = (np.arange(gw, dtype=np.int64) * (img.shape[1] - 1)) // max(gw - 1, 1)
    return img[ys][:, xs]


def extract_features(media: DataFrame, feat_dim: int = 16, grid: int = 32) -> DataFrame:
    """Decode → fixed grid → ONE vectorized pooling op per Arrow batch.

    Only the decode itself is per-row (that's the codec's granularity);
    the feature math runs on the stacked (B, grid, grid, 3) tensor as a
    single reshape+mean — the batch-vectorized shape a real kernel must
    keep for mapInPandas to stay off the Python-per-row slow path. Map-only
    stage, no shuffle; partition count controls parallelism at 100 TB.
    """
    if (grid * grid * 3) % feat_dim != 0:
        raise ValueError(f"grid²·3 ({grid * grid * 3}) not divisible by feat_dim={feat_dim}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            grids = np.stack(
                [
                    _decode_grid(bytes(p), int(w), int(h), grid, grid)
                    for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
                ]
            )  # (B, grid, grid, 3) uint8
            flat = grids.reshape(len(pdf), feat_dim, -1).astype(np.float64)
            feats = flat.mean(axis=2).astype(np.float32)  # (B, feat_dim), one op
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": list(feats),
                    "n_bytes": pdf["payload"].map(len),
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
            if len(pdf) == 0:
                continue
            # vectorized explode: frame counts → np.repeat'd ids + one
            # concatenated ts lattice; only the per-frame decode stub (the
            # codec boundary) stays a comprehension
            counts = np.maximum((pdf["duration_ms"].to_numpy() + every_ms - 1) // every_ms, 0)
            mids = np.repeat(pdf["media_id"].to_numpy(), counts)
            idx = np.concatenate([np.arange(c) for c in counts]) if counts.sum() else np.array([], dtype=int)
            ts = idx * every_ms
            payloads = np.repeat(pdf["payload"].to_numpy(), counts)
            frames = [
                hashlib.md5(bytes(p) + int(t).to_bytes(4, "big")).digest()
                for p, t in zip(payloads, ts)
            ]
            yield pd.DataFrame(
                {"media_id": mids, "frame_idx": idx, "ts_ms": ts, "payload": frames}
            )

    return media.where(F.col("kind") == "video").mapInPandas(
        fn, schema="media_id long, frame_idx int, ts_ms int, payload binary"
    )


def window_audio_features(
    media: DataFrame, n_windows: int = 8, window: int = 256
) -> DataFrame:
    """Audio half of E13: stub PCM decode + fixed windowing + per-window
    energy — the (batch, windows, samples) tensor shape a real
    spectrogram/feature kernel consumes, with the decode stub kept in
    EXACT integer space so the DuckDB oracle replays every sample:
    s_t = (seed + (t+1)·2654435761) mod p mod 65536 − 32768 (seed = 60-bit
    md5 of the payload), energy_w = Σ_{t∈w} s_t² as int64.

    Real deployment: swap the lattice for soundfile/librosa frames — the
    windowing, batching, and schema stay identical. One mapInPandas op
    per batch (the sample lattice is a single broadcasted numpy op, no
    per-row Python beyond the seed hash — the codec boundary).
    """
    total = n_windows * window

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pos = np.arange(total, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seeds = np.array(
                [int(hashlib.md5(bytes(p)).hexdigest()[:15], 16) for p in pdf["payload"]],
                dtype=np.int64,
            )
            s = (seeds[:, None] + (pos[None, :] + 1) * 2654435761) % 2147483647 % 65536 - 32768
            energies = (s * s).reshape(len(pdf), n_windows, window).sum(axis=2)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "energies": list(energies),
                    "n_bytes": pdf["payload"].map(len),
                }
            )

    return media.mapInPandas(fn, schema="media_id long, kind string, energies array<long>, n_bytes long")
