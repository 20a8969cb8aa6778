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


def available_codecs() -> dict[str, Callable]:
    """Probe optional media libraries and return REAL decode callbacks for
    whichever are importable — the production binding for the injection seam
    on every decode function here.

    - ``image``: PIL (``pip install pillow``) — bytes -> HxWx3 uint8 RGB.
    - ``audio``: stdlib ``wave`` — WAV bytes -> (frames x channels int array,
      sample_rate).  Always present (stdlib), so the audio path is a real
      codec even in this container.
    - ``video``: the ``ffmpeg`` BINARY on PATH (no pip bindings needed) —
      bytes -> sampled (frame_idx, png_bytes) pairs via one subprocess per
      clip; absent from this container, bound automatically where installed.

    Fakes stay the deterministic test path; NotImplementedError only fires
    when a decode is requested for a modality whose library is genuinely
    absent and no callback was injected.
    """
    import shutil

    out: dict[str, Callable] = {}
    try:  # pragma: no cover - PIL not in this container
        import io

        from PIL import Image

        def pil_decoder(content: bytes, meta: dict | None) -> np.ndarray:
            return np.asarray(Image.open(io.BytesIO(content)).convert("RGB"))

        def pil_resizer(content: bytes, meta: dict | None, w: int, h: int) -> bytes:
            img = Image.open(io.BytesIO(content)).convert("RGB").resize((w, h))
            buf = io.BytesIO()
            img.save(buf, format=(meta or {}).get("format", "PNG").upper())
            return buf.getvalue()

        out["image"] = pil_decoder
        out["image_resize"] = pil_resizer
    except ImportError:
        pass
    try:
        import io
        import wave

        def wav_decoder(content: bytes, meta: dict | None) -> tuple[np.ndarray, int]:
            with wave.open(io.BytesIO(content)) as w:
                frames = w.readframes(w.getnframes())
                dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[w.getsampwidth()]
                arr = np.frombuffer(frames, dtype=dtype).reshape(-1, w.getnchannels())
                return arr, w.getframerate()

        out["audio"] = wav_decoder
    except ImportError:  # pragma: no cover - wave is stdlib
        pass
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg:  # pragma: no cover - ffmpeg not in this container

        def ffmpeg_frame_sampler(
            content: bytes, meta: dict | None, every_n: int
        ) -> "Iterator[tuple[int, bytes]]":
            """Sample every_n-th frame as PNG bytes: one ffmpeg process per
            clip (select filter does the stride INSIDE ffmpeg — only sampled
            frames are decoded to completion and written)."""
            import os
            import re
            import subprocess
            import tempfile

            with tempfile.TemporaryDirectory() as td:
                src = os.path.join(td, "in.bin")
                with open(src, "wb") as fh:
                    fh.write(content)
                pattern = os.path.join(td, "f%06d.png")
                subprocess.run(
                    [
                        ffmpeg, "-v", "error", "-i", src,
                        "-vf", f"select=not(mod(n\\,{every_n}))",
                        "-fps_mode", "vfr", pattern,
                    ],
                    check=True,
                    capture_output=True,
                )
                for name in sorted(os.listdir(td)):
                    m = re.fullmatch(r"f(\d{6})\.png", name)
                    if m:
                        with open(os.path.join(td, name), "rb") as fh:
                            # ffmpeg numbers outputs from 1; selected frame k
                            # is source frame (k-1)*every_n
                            yield (int(m.group(1)) - 1) * every_n, fh.read()

        out["video"] = ffmpeg_frame_sampler
    return out


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
    """Deterministic fake pixel decode: tile the sha256 digest of the content
    across the pixel buffer.  Replace the body with a real codec call in
    production.

    Digest-tiling (not a PRNG) on purpose: pixel k = digest[k % 32], so every
    derived statistic is plain integer arithmetic on the 32 digest bytes and a
    SQL oracle can replay it exactly — that's what gives x22 a full value-hash
    check instead of a rows-only one."""
    digest = hashlib.sha256(content).digest()
    n = height * width * 3
    reps = -(-n // len(digest))
    return np.frombuffer((digest * reps)[:n], dtype=np.uint8).reshape(height, width, 3)


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
    With ``fake=False`` and no explicit decoder, a probed PIL binding from
    :func:`available_codecs` is used when present.
    """
    if decoder is None and not fake:
        decoder = available_codecs().get("image")

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
                    # exact integer mean (floor), oracle-replayable: sum // size
                    mean_pixel = int(px.astype(np.int64).sum() // px.size)
                elif fake:
                    px = _fake_decode(content, w, h)
                    mean_pixel = int(px.astype(np.int64).sum() // px.size)
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
    downstream stages depend on and is exercised by tests.  With
    ``fake=False`` and no explicit resizer, a probed PIL binding from
    :func:`available_codecs` is used when present."""
    if resizer is None and not fake:
        resizer = available_codecs().get("image_resize")
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


def synthesize_wav_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build an audio media table whose content is a GENUINE RIFF/WAVE
    container (stdlib ``wave`` writer): mono, 8-bit PCM, 16 kHz, with
    n_samples = id % 400 + 100 uint8 samples tiling the sha256 digest of the
    text.  Real container + digest-tiled payload means the decode exercises
    an actual codec while every derived feature stays integer arithmetic a
    SQL oracle can replay (same trick as the image fake)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            recs = []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                mid = int(mid)
                n = mid % 400 + 100
                digest = hashlib.sha256(str(text).encode("utf-8")).digest()
                reps = -(-n // len(digest))
                samples = (digest * reps)[:n]
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(1)
                    w.setframerate(16000)
                    w.writeframes(samples)
                recs.append(
                    {
                        "media_id": mid,
                        "content": buf.getvalue(),
                        "meta": {
                            "media_type": "audio",
                            "format": "wav",
                            "width": None,
                            "height": None,
                            "n_frames": n,
                            "sample_rate": 16000,
                        },
                    }
                )
            yield pd.DataFrame(recs, columns=["media_id", "content", "meta"])

    return df.select(F.col(id_col).cast("long").alias(id_col), text_col).mapInPandas(
        run, MEDIA_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("n_samples", LongType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("mean_abs", LongType()),  # floor(mean |sample|), integer-exact
    ]
)


def decode_audio_features(
    df: DataFrame,
    decoder: Callable[[bytes, dict | None], "tuple[np.ndarray, int]"] | None = None,
) -> DataFrame:
    """Decode audio content and emit per-clip features via mapInPandas.

    Unlike the image path this runs a REAL codec by default: the stdlib
    ``wave`` binding from :func:`available_codecs` parses actual WAV bytes
    (RIFF header, sample width, channels) — no fake needed.  ``decoder``
    overrides it (e.g. soundfile/librosa for non-WAV formats).
    ``mean_abs`` is exact integer arithmetic (sum(|s|) // n) so any oracle
    can replay it."""
    decoder = decoder or available_codecs()["audio"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                content = bytes(content)
                arr, rate = decoder(content, dict(meta) if meta is not None else None)
                arr = np.asarray(arr)
                rows.append(
                    {
                        "media_id": int(media_id),
                        "byte_len": len(content),
                        "n_samples": int(arr.shape[0]),
                        "n_channels": int(arr.shape[1]) if arr.ndim > 1 else 1,
                        "sample_rate": int(rate),
                        "mean_abs": int(np.abs(arr.astype(np.int64)).sum() // max(arr.size, 1)),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return df.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


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
    path; the fake path derives frame hashes from content+index.  With
    ``fake=False`` and no explicit sampler, the probed ffmpeg binding from
    :func:`available_codecs` is used when the binary is on PATH (same
    dispatch pattern as the image/audio paths)."""
    if frame_sampler is None and not fake:
        frame_sampler = available_codecs().get("video")
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


def synthesize_pcm16_media(df: DataFrame, id_col: str) -> DataFrame:
    """Build an audio media table of GENUINE 16-bit STEREO RIFF/WAVE
    containers (stdlib ``wave`` writer) — the arm :func:`synthesize_wav_media`
    (8-bit mono) leaves untested: signed little-endian int16 samples,
    interleaved channels, 4-byte frames.  Frame f / channel c carries
    sample ((id * 31 + (2f + c) * 7) % 65536) - 32768 over
    n_frames = id % 300 + 50 at 8 kHz — pure integer arithmetic, so a SQL
    oracle replays every decoded sample (gate x92), while the decode still
    exercises the real codec end to end (header, sampwidth=2, channel
    de-interleave, negative-sample sign handling)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            recs = []
            for mid in pdf[id_col]:
                mid = int(mid)
                nf = mid % 300 + 50
                samples = np.array(
                    [((mid * 31 + i * 7) % 65536) - 32768 for i in range(nf * 2)],
                    dtype=np.int16,
                )
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(2)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(samples.tobytes())  # little-endian int16
                recs.append(
                    {
                        "media_id": mid,
                        "content": buf.getvalue(),
                        "meta": {
                            "media_type": "audio",
                            "format": "wav",
                            "width": None,
                            "height": None,
                            "n_frames": nf,
                            "sample_rate": 8000,
                        },
                    }
                )
            yield pd.DataFrame(recs, columns=["media_id", "content", "meta"])

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, MEDIA_SCHEMA
    )


AUDIO_SIGNATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("prefix_hex", StringType()),
    ]
)


def audio_prefix_signature(
    df: DataFrame,
    prefix_samples: int = 64,
    decoder: Callable[[bytes, dict | None], "tuple[np.ndarray, int]"] | None = None,
) -> DataFrame:
    """Content-derived audio fingerprint: the hex of the first
    ``prefix_samples`` decoded PCM SAMPLES, each NORMALIZED to
    little-endian int32 (through the real codec — container bytes never
    enter the key, so a re-containerized or length-trimmed copy of the
    same recording keys identically while any byte-level container diff
    would not).  The ``<i4`` normalization (round-14 advice) pins the
    byte layout: raw ``arr.tobytes()`` depends on the decoder's native
    dtype width AND the host's endianness, so the same recording decoded
    on a big-endian executor (or via a codec returning a different
    integer width for the same PCM values) would key differently across
    a heterogeneous cluster.  The key is sliced in SAMPLES before
    widening (round-15 review): a byte-count slice of the widened buffer
    would quietly shrink coverage 4x, so clips between 17 and 63 samples
    that previously keyed losslessly on their full payload would collide
    on a 16-sample prefix.  Widening is injective, so the key stays
    LOSSLESS — distinct recordings can never collide on a truncated low
    byte.  The audio-side analog of x49's image content hash; clips
    shorter than the prefix key on their full normalized payload."""
    decoder = decoder or available_codecs()["audio"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"]
            ):
                content = bytes(content)
                arr, _rate = decoder(content, dict(meta) if meta is not None else None)
                arr = np.asarray(arr).reshape(-1)
                # fixed-width little-endian sample bytes, NOT a low-byte
                # truncation (lossless at any decoder width — round-13
                # advice) and NOT native layout (host/dtype-portable —
                # round-14 advice); sliced in SAMPLES before widening so
                # normalization never shrinks coverage (round-15 review)
                pre = arr[:prefix_samples].astype("<i4").tobytes()
                rows.append(
                    {
                        "media_id": int(media_id),
                        "n_samples": int(arr.shape[0]),
                        "prefix_hex": pre.hex(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_SIGNATURE_SCHEMA.fields]
            )

    return df.mapInPandas(run, AUDIO_SIGNATURE_SCHEMA)
