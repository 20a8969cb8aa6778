"""Multimodal (image/audio/video) column plumbing.

Design: media travels as an opaque ``binary`` content column plus a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` so the JVM never copies
row-at-a-time and each batch amortizes Python crossing cost.

The decode kernels themselves are STUBBED (this container ships no
image/audio codecs): ``decode_image(..., fake=True)`` produces a
deterministic fake decode derived from the content hash, and ``fake=False``
raises NotImplementedError at the point a real libjpeg/ffmpeg call would go.
Everything Spark-side — schema, batching, partitioning, UDF signatures — is
real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# The canonical media row: opaque bytes + typed metadata (what a 100 TB
# training corpus actually stores; pixel decode happens at read time).
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image | audio | video
        StructField("format", StringType()),  # jpeg | png | wav | mp4 | ...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("meta", MEDIA_META_SCHEMA),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("content_sha", StringType()),
        StructField("mean_pixel", LongType()),  # deterministic-fake decode stat
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a media table from a text fixture: content = utf-8 bytes of the
    text (a stand-in for encoded image bytes), metadata derived
    deterministically from the id.  Used by tests and the inventory query so
    the plumbing runs on real DataFrames without codec libraries."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            (F.pmod(F.col(id_col), F.lit(64)) + 16).cast("int").alias("width"),
            (F.pmod(F.col(id_col), F.lit(48)) + 16).cast("int").alias("height"),
            F.lit(1).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake pixel decode: seed a counter-free PRNG from the
    content digest.  Replace the body with a real codec call in production."""
    digest = hashlib.sha256(content).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


def decode_image_features(df: DataFrame, fake: bool = True, batch_hint: int = 256) -> DataFrame:
    """Decode media content and emit per-image features via mapInPandas.

    Arrow streams batches of (media_id, content, meta) into Python; each batch
    is decoded vectorized-per-row and a compact feature frame is returned —
    the pattern for any real extract (CLIP embed, OCR, EXIF parse).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                content = bytes(content)
                w = int(meta["width"]) if meta is not None else 16
                h = int(meta["height"]) if meta is not None else 16
                if fake:
                    px = _fake_decode(content, w, h)
                    mean_pixel = int(px.mean())
                else:
                    raise NotImplementedError(
                        "real image decode requires a codec library (PIL/libjpeg) "
                        "not present in this environment"
                    )
                rows.append(
                    {
                        "media_id": int(media_id),
                        "byte_len": len(content),
                        "content_sha": hashlib.sha256(content).hexdigest(),
                        "mean_pixel": mean_pixel,
                        "width": w,
                        "height": h,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return df.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, target_w: int, target_h: int, fake: bool = True) -> DataFrame:
    """Resize stub: recomputes metadata and (fake-)re-encodes content.

    Real implementation would decode -> interpolate -> re-encode per batch;
    the Spark-side contract (same schema out, content bytes replaced) is what
    downstream stages depend on and is exercised by tests."""
    out_schema = MEDIA_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real resize requires an image codec")
            recs = []
            for media_id, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                content = bytes(content)
                px = _fake_decode(content, target_w, target_h)
                meta = dict(meta) if meta is not None else {}
                meta.update({"width": target_w, "height": target_h})
                recs.append({"media_id": int(media_id), "content": px.tobytes(), "meta": meta})
            yield pd.DataFrame(recs, columns=["media_id", "content", "meta"])

    return df.mapInPandas(run, out_schema)


def sample_video_frames(df: DataFrame, every_n: int = 10, fake: bool = True) -> DataFrame:
    """Frame-sampling stub for video media: emits one row per sampled frame
    (media_id, frame_idx, frame_sha) — the explode-shaped contract a video
    pipeline needs.  Real implementation would seek/decode via ffmpeg."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_sha", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame sampling requires ffmpeg")
            rows = []
            for media_id, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                n_frames = int(meta["n_frames"]) if meta is not None and meta["n_frames"] else 1
                for idx in range(0, n_frames, every_n):
                    fh = hashlib.sha256(bytes(content) + idx.to_bytes(4, "big")).hexdigest()
                    rows.append({"media_id": int(media_id), "frame_idx": idx, "frame_sha": fh})
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_sha"])

    return df.mapInPandas(run, schema)
