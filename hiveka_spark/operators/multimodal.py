"""Multimodal (image/audio/video) column plumbing.

Design: media travels as an opaque ``binary`` content column plus a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` so the JVM never copies
row-at-a-time and each batch amortizes Python crossing cost.

The decode kernels themselves are STUBBED (this container ships no
image/audio codecs): ``decode_image(..., fake=True)`` produces a
deterministic fake decode derived from the content hash.  ``fake=False``
takes an injectable codec callback (``decoder=``/``resizer=``/
``frame_sampler=``) so production binds PIL/ffmpeg through the SAME
mapInPandas plumbing; with no callback it raises NotImplementedError at the
point the real call would go.  Everything Spark-side — schema, batching,
partitioning, UDF signatures — is real and tested (including the injection
seam, via a toy codec in tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

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


def decode_image_features(
    df: DataFrame,
    fake: bool = True,
    batch_hint: int = 256,
    decoder: Callable[[bytes, dict | None], np.ndarray] | None = None,
) -> DataFrame:
    """Decode media content and emit per-image features via mapInPandas.

    Arrow streams batches of (media_id, content, meta) into Python; each batch
    is decoded vectorized-per-row and a compact feature frame is returned —
    the pattern for any real extract (CLIP embed, OCR, EXIF parse).

    ``decoder(content_bytes, meta_dict) -> HxWx3 uint8 array`` binds a real
    codec (e.g. PIL) through the same batched path; it wins over ``fake``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                content = bytes(content)
                w = int(meta["width"]) if meta is not None else 16
                h = int(meta["height"]) if meta is not None else 16
                if decoder is not None:
                    px = np.asarray(decoder(content, dict(meta) if meta is not None else None))
                    h, w = int(px.shape[0]), int(px.shape[1])
                    mean_pixel = int(px.mean())
                elif fake:
                    px = _fake_decode(content, w, h)
                    mean_pixel = int(px.mean())
                else:
                    raise NotImplementedError(
                        "real image decode requires a codec library (PIL/libjpeg) "
                        "not present in this environment; pass decoder= to bind one"
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


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    fake: bool = True,
    resizer: Callable[[bytes, dict | None, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize: recomputes metadata and re-encodes content.

    ``resizer(content, meta, target_w, target_h) -> bytes`` binds a real
    decode->interpolate->re-encode kernel (PIL) through the same batched
    path; without it, ``fake=True`` re-encodes deterministic fake pixels.
    The Spark-side contract (same schema out, content bytes replaced) is what
    downstream stages depend on and is exercised by tests."""
    out_schema = MEDIA_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if resizer is None and not fake:
                raise NotImplementedError(
                    "real resize requires an image codec; pass resizer= to bind one"
                )
            recs = []
            for media_id, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                content = bytes(content)
                meta = dict(meta) if meta is not None else {}
                if resizer is not None:
                    new_content = bytes(resizer(content, meta or None, target_w, target_h))
                else:
                    new_content = _fake_decode(content, target_w, target_h).tobytes()
                meta.update({"width": target_w, "height": target_h})
                recs.append({"media_id": int(media_id), "content": new_content, "meta": meta})
            yield pd.DataFrame(recs, columns=["media_id", "content", "meta"])

    return df.mapInPandas(run, out_schema)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 10,
    fake: bool = True,
    frame_sampler: Callable[[bytes, dict | None, int], "Iterator[tuple[int, bytes]]"] | None = None,
) -> DataFrame:
    """Frame sampling for video media: emits one row per sampled frame
    (media_id, frame_idx, frame_sha) — the explode-shaped contract a video
    pipeline needs.

    ``frame_sampler(content, meta, every_n) -> iterable of (frame_idx,
    frame_bytes)`` binds a real ffmpeg seek/decode through the same batched
    path; the fake path derives frame hashes from content+index."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_sha", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if frame_sampler is None and not fake:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg; pass frame_sampler= to bind one"
                )
            rows = []
            for media_id, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                content = bytes(content)
                meta_d = dict(meta) if meta is not None else None
                if frame_sampler is not None:
                    for idx, frame in frame_sampler(content, meta_d, every_n):
                        fh = hashlib.sha256(bytes(frame)).hexdigest()
                        rows.append(
                            {"media_id": int(media_id), "frame_idx": int(idx), "frame_sha": fh}
                        )
                else:
                    n_frames = int(meta["n_frames"]) if meta is not None and meta["n_frames"] else 1
                    for idx in range(0, n_frames, every_n):
                        fh = hashlib.sha256(content + idx.to_bytes(4, "big")).hexdigest()
                        rows.append({"media_id": int(media_id), "frame_idx": idx, "frame_sha": fh})
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_sha"])

    return df.mapInPandas(run, schema)
