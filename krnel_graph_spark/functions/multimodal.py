"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct; the
Spark-side machinery here — schemas, Arrow batch shapes, ``mapInPandas``
signatures, partition-size guidance — is real and tested. The actual codec
work (JPEG decode, resampling, frame extraction) requires image/audio
libraries that are NOT installed in this container, so each codec call is
stubbed behind ``_require_codec`` with a deterministic fake used by tests
(`fake=True`), clearly marked.

Design for 100 TB of media: binaries stay in parquet/iceberg as pages of a
``binary`` column; decode happens inside ``mapInPandas`` so bytes never hit
the driver, and ``spark.sql.files.maxPartitionBytes`` (not row count)
controls batch memory. Feature vectors come back as ``array<float>``
columns that feed the similarity/dedup operators above.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, media_type string, byte_len long, crc32 long, sha256 string"
)
IMAGE_FEATURES_SCHEMA = "doc_id long, width int, height int, features array<float>"


def attach_media_metadata(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Typed metadata for an opaque binary column — pure JVM expressions
    (length/crc/hash), no decode needed. This is the cheap scan-side pass a
    pipeline runs first to route/filter media."""
    b = F.col(binary_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("application/octet-stream").alias("media_type"),
        F.length(b).cast("long").alias("byte_len"),
        F.crc32(b).alias("crc32"),
        F.sha2(b, 256).alias("sha256"),
    )


def _require_codec(kind: str):
    """All real decoding is stubbed in this container — documented contract:
    plug Pillow / torchaudio / PyAV here."""
    raise NotImplementedError(
        f"{kind} decoding requires media libraries (Pillow/torchaudio/av) "
        "that are not installed in this container; pass fake=True for the "
        "deterministic stub used in tests"
    )


def _fake_decode_image(data: bytes, feat_dim: int) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in: dimensions and features derived from content
    hashes, so tests exercise real distribution/schema behavior."""
    digest = hashlib.sha256(data).digest()
    width = 64 + digest[0] % 64
    height = 64 + digest[1] % 64
    seed = int.from_bytes(digest[2:10], "big") % (2**32)
    rng = np.random.RandomState(seed)
    return width, height, rng.standard_normal(feat_dim).astype(np.float32)


def extract_image_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    feat_dim: int = 16,
    batch_size: int = 64,
    fake: bool = False,
) -> DataFrame:
    """Decode images and emit (width, height, feature-vector) rows via
    ``mapInPandas``. Batch shape and schema are production-real; only the
    pixel decode is stubbed (see module docstring)."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("data"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                rows = {"doc_id": [], "width": [], "height": [], "features": []}
                for doc_id, data in zip(chunk["doc_id"], chunk["data"]):
                    if not fake:
                        _require_codec("image")
                    w, h, feats = _fake_decode_image(bytes(data), feat_dim)
                    rows["doc_id"].append(doc_id)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["features"].append(feats)
                yield pd.DataFrame(rows)

    return src.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    every_n: int = 10,
    fake: bool = False,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame. Stub decode;
    real explode/partitioning semantics (a 1-minute video → ~180 rows, so
    output partitions re-balance via AQE after the explode)."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("data"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_sha256": []}
            for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
                if not fake:
                    _require_codec("video")
                data = bytes(data)
                n_frames = 1 + (zlib.crc32(data) % 30)
                for idx in range(0, n_frames, every_n):
                    frame = hashlib.sha256(data + idx.to_bytes(4, "big")).hexdigest()
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame_sha256"].append(frame)
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, schema="doc_id long, frame_idx int, frame_sha256 string")


def _fake_resize(data: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real thumbnail: content-derived bytes of
    a size proportional to the target area (so size-based partition math in
    tests is realistic)."""
    digest = hashlib.sha256(data + f"{width}x{height}".encode()).digest()
    n = max(16, (width * height) // 64)
    return (digest * (n // len(digest) + 1))[:n]


def resize_images(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    width: int = 224,
    height: int = 224,
    fake: bool = False,
) -> DataFrame:
    """Re-encode images to a target size via ``mapInPandas`` — the
    normalization step before feature extraction. Decode/encode is stubbed
    (see module docstring); the Spark-side contract — binary in, binary
    out, bytes never on the driver, output partitions sized by
    ``maxPartitionBytes`` — is real."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("data"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "data": [], "width": [], "height": []}
            for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
                if not fake:
                    _require_codec("image")
                rows["doc_id"].append(doc_id)
                rows["data"].append(_fake_resize(bytes(data), width, height))
                rows["width"].append(width)
                rows["height"].append(height)
            yield pd.DataFrame(rows)

    return src.mapInPandas(
        run, schema="doc_id long, data binary, width int, height int"
    )


def _fake_decode_audio(data: bytes, feat_dim: int) -> tuple[float, np.ndarray]:
    digest = hashlib.sha256(data).digest()
    duration = 1.0 + (digest[0] % 120)  # seconds
    seed = int.from_bytes(digest[4:12], "big") % (2**32)
    rng = np.random.RandomState(seed)
    return duration, rng.standard_normal(feat_dim).astype(np.float32)


def extract_audio_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    feat_dim: int = 16,
    fake: bool = False,
) -> DataFrame:
    """Audio → (duration, embedding) rows via ``mapInPandas``. The codec
    (torchaudio/librosa) is stubbed behind ``_require_codec``; batch shape
    and schema are production-real, mirroring the image path."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("data"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "duration_s": [], "features": []}
            for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
                if not fake:
                    _require_codec("audio")
                dur, feats = _fake_decode_audio(bytes(data), feat_dim)
                rows["doc_id"].append(doc_id)
                rows["duration_s"].append(dur)
                rows["features"].append(feats)
            yield pd.DataFrame(rows)

    return src.mapInPandas(
        run, schema="doc_id long, duration_s double, features array<float>"
    )
