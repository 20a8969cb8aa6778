"""Multimodal column plumbing: schema, mapInPandas batching, stub gating."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hiveka_spark.catalog import table
from hiveka_spark.operators import multimodal as M

from .conftest import SF_SMOKE


def _media(spark, n=20):
    docs = table(spark, SF_SMOKE, "documents").limit(n)
    return M.synthesize_media(docs, "doc_id", "text"), docs


def test_media_schema(spark):
    media, _ = _media(spark)
    assert [f.name for f in media.schema.fields] == ["media_id", "content", "meta"]
    meta_names = [f.name for f in media.schema["meta"].dataType.fields]
    assert meta_names == ["media_type", "format", "width", "height", "n_frames", "sample_rate"]


def test_decode_features_match_driver_hash(spark):
    media, docs = _media(spark)
    feats = {r["media_id"]: r for r in M.decode_image_features(media).collect()}
    for row in docs.select("doc_id", "text").collect():
        content = row["text"].encode("utf-8")
        f = feats[row["doc_id"]]
        assert f["byte_len"] == len(content)
        assert f["content_sha"] == hashlib.sha256(content).hexdigest()
        assert 0 <= f["mean_pixel"] <= 255


def test_decode_deterministic(spark):
    media, _ = _media(spark, n=5)
    a = sorted(M.decode_image_features(media).collect(), key=lambda r: r["media_id"])
    b = sorted(M.decode_image_features(media).collect(), key=lambda r: r["media_id"])
    assert [r["mean_pixel"] for r in a] == [r["mean_pixel"] for r in b]


def test_real_decode_raises_not_implemented(spark):
    media, _ = _media(spark, n=2)
    with pytest.raises(Exception) as ei:
        M.decode_image_features(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_injected_decoder_through_same_path(spark):
    """VERDICT r1 #7: fake=False + an injected toy codec must run through the
    identical mapInPandas plumbing (schema, batching) instead of raising."""
    import numpy as np

    media, docs = _media(spark, n=6)

    def toy_decoder(content, meta):
        # "decode" = tile the byte values into a 4x4x3 image
        arr = np.frombuffer((content * 48)[:48], dtype=np.uint8)
        return arr.reshape(4, 4, 3)

    feats = {
        r["media_id"]: r
        for r in M.decode_image_features(media, fake=False, decoder=toy_decoder).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        content = row["text"].encode("utf-8")
        f = feats[row["doc_id"]]
        # dimensions come from the DECODER's output, not the metadata
        assert (f["width"], f["height"]) == (4, 4)
        want = int(np.frombuffer((content * 48)[:48], dtype=np.uint8).mean())
        assert f["mean_pixel"] == want
        assert f["content_sha"] == hashlib.sha256(content).hexdigest()


def test_injected_resizer_and_frame_sampler(spark):
    media, _ = _media(spark, n=4)

    def toy_resizer(content, meta, w, h):
        return content[: w * h]  # deterministic truncation stand-in

    out = M.resize_images(media, 4, 2, fake=False, resizer=toy_resizer).collect()
    for r in out:
        assert r["meta"]["width"] == 4 and r["meta"]["height"] == 2
        assert len(bytes(r["content"])) <= 8

    def toy_sampler(content, meta, every_n):
        for i in range(0, 3):
            yield i * every_n, content + bytes([i])

    frames = M.sample_video_frames(
        media, every_n=5, fake=False, frame_sampler=toy_sampler
    ).collect()
    per = {}
    for r in frames:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 5, 10] for v in per.values())


def test_resize_rewrites_meta_and_content(spark):
    media, _ = _media(spark, n=5)
    out = M.resize_images(media, 8, 6).collect()
    for r in out:
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 6
        assert len(bytes(r["content"])) == 8 * 6 * 3


def test_frame_sampling_counts(spark):
    media, _ = _media(spark, n=5)
    vids = media.withColumn(
        "meta",
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("fake").alias("format"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.lit(25).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )
    out = M.sample_video_frames(vids, every_n=10).collect()
    per = {}
    for r in out:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 10, 20] for v in per.values())


def test_wav_synth_decodes_through_real_codec(spark):
    """ADVICE r4: the audio surface exercised end-to-end — synthesize_wav_media
    emits genuine RIFF/WAVE containers and decode_audio_features parses them
    with the stdlib wave binding from available_codecs(); features must match
    the digest-tiling arithmetic exactly."""
    docs = table(spark, SF_SMOKE, "documents").limit(10)
    media = M.synthesize_wav_media(docs, "doc_id", "text")
    feats = {r["media_id"]: r for r in M.decode_audio_features(media).collect()}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(feats) == set(src)
    for doc_id, text in src.items():
        n = doc_id % 400 + 100
        digest = hashlib.sha256(str(text).encode("utf-8")).digest()
        reps = -(-n // len(digest))
        samples = (digest * reps)[:n]
        r = feats[doc_id]
        assert r["n_samples"] == n
        assert r["n_channels"] == 1
        assert r["sample_rate"] == 16000
        assert r["byte_len"] == 44 + n  # canonical PCM header + data
        assert r["mean_abs"] == sum(samples) // n


def test_available_codecs_audio_binding_present():
    """stdlib wave is always importable: the audio codec binding must be a
    REAL codec (no fake path for audio)."""
    codecs = M.available_codecs()
    assert "audio" in codecs
    import io
    import wave as _w

    buf = io.BytesIO()
    with _w.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x01\x00\x02\x00\x03\x00\x04\x00")  # 2 frames stereo s16
    arr, rate = codecs["audio"](buf.getvalue(), None)
    assert rate == 8000 and arr.shape == (2, 2)
    assert arr.tolist() == [[1, 2], [3, 4]]


import shutil


@pytest.mark.skipif(shutil.which("ffmpeg") is None, reason="ffmpeg not on PATH")
def test_ffmpeg_frame_sampler_binding(spark):  # pragma: no cover - env-gated
    """Where ffmpeg IS installed: generate a 12-frame test clip, sample every
    5th frame through the probed binding via the same mapInPandas plumbing."""
    import subprocess
    import tempfile

    codecs = M.available_codecs()
    assert "video" in codecs
    with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
        subprocess.run(
            ["ffmpeg", "-v", "error", "-y", "-f", "lavfi",
             "-i", "testsrc=duration=0.5:size=64x64:rate=24", "-frames:v", "12",
             f.name],
            check=True,
        )
        content = open(f.name, "rb").read()
    media = spark.createDataFrame(
        [(1, content, ("video", "mp4", 64, 64, 12, None))],
        M.MEDIA_SCHEMA,
    )
    out = M.sample_video_frames(media, every_n=5, fake=False).collect()
    assert [r["frame_idx"] for r in out] == [0, 5, 10]
    assert all(len(r["frame_sha"]) == 64 for r in out)


def test_video_real_path_raises_without_ffmpeg(spark):
    """Without ffmpeg and without an injected sampler, fake=False must raise
    NotImplementedError at decode time (the honest seam), not silently fake."""
    if shutil.which("ffmpeg"):
        pytest.skip("ffmpeg present: real binding takes over")
    media = M.synthesize_media(
        table(spark, SF_SMOKE, "documents").limit(3), "doc_id", "text"
    )
    with pytest.raises(Exception, match="ffmpeg|NotImplemented"):
        M.sample_video_frames(media, every_n=2, fake=False).collect()


def test_x116_prefix_groups_trimmed_copies(spark):
    """Clips synthesized from the same source digest at different lengths
    share a prefix fingerprint; different sources never collide; keep-first
    keeper is the group's min id."""
    from hiveka_spark.queries import REGISTRY, _ensure_loaded
    from hiveka_spark.queries.extensions import _X116_GROUP

    _ensure_loaded()
    from .conftest import SF_SMOKE

    rows = REGISTRY["x116_audio_prefix_dedup"].fn(spark, SF_SMOKE).collect()
    assert rows
    # full groups have exactly _X116_GROUP members despite distinct lengths
    full = [r for r in rows if r.n_clips == _X116_GROUP]
    assert full
    for r in rows:
        assert r.n_dups == r.n_clips - 1
        assert r.keeper_id % _X116_GROUP == 0 or r.n_clips < _X116_GROUP
        assert len(r.prefix_hex) == 512  # 64 samples x 4 bytes x 2 hex


def test_x148_multimodal_curation_stage_invariants(spark):
    """The capstone's per-stage contracts, asserted directly on the gate
    output: image dedup kills BOTH injected copies (content = caption
    bytes), audio dedup kills only the +100000 copy (same payload AND
    same sample count) while +100001 survives as genuinely different
    audio content — and the caption stage then excludes it from the
    export (caption dup), with dense per-modality sequence numbers over
    the approved rows."""
    from hiveka_spark.queries.curation_ext import (
        _X148_OFF_BOTH,
        _X148_OFF_IMG,
        _X148_QUALITY_MIN,
        x148_multimodal_curation,
    )

    from .conftest import SF_SMOKE

    rows = x148_multimodal_curation(spark, SF_SMOKE).collect()
    img = [r for r in rows if r.modality == "image"]
    aud = [r for r in rows if r.modality == "audio"]
    assert all(r.media_id < _X148_OFF_BOTH for r in img)
    assert not any(
        _X148_OFF_BOTH <= r.media_id < _X148_OFF_IMG for r in aud
    ), "+OFF_BOTH audio copy must die in content dedup"
    survivors = [r for r in aud if r.media_id >= _X148_OFF_IMG]
    assert survivors, "+OFF_IMG audio copies must survive content dedup"
    assert all(
        r.caption_ok == 0 and r.seq == -1 for r in survivors
    ), "caption dedup must exclude the surviving copy from the export"
    for mod_rows in (img, aud):
        ok = sorted(r.seq for r in mod_rows if r.caption_ok == 1)
        assert ok == list(range(1, len(ok) + 1)), "seq not dense"
        assert all(
            r.quality_score >= _X148_QUALITY_MIN
            for r in mod_rows
            if r.caption_ok == 1
        )
        assert any(r.caption_ok == 0 for r in mod_rows), (
            "quality floor filtered nothing — fixture degenerate"
        )
