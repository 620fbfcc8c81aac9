"""Multimodal binary-column operators: the Arrow plumbing AND the
pure-numpy codecs (PPM / WAV / ppmseq) are load-bearing; compressed
formats (JPEG/MP4-class) remain the documented stub boundary."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from w3_data_etl_pipeline_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthetic_media(spark, 60).persist()


# ------------------------------------------------------------- codecs


def test_ppm_roundtrip():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(13, 21, 3), dtype=np.uint8)
    raw = mm.encode_ppm(px)
    assert raw.startswith(b"P6\n21 13\n255\n")
    back = mm.decode_ppm(raw)
    assert back.shape == (13, 21, 3) and np.array_equal(back, px)
    with pytest.raises(ValueError):
        mm.decode_ppm(raw[:-1])  # truncated body
    with pytest.raises(ValueError):
        mm.decode_ppm(b"JFIF....")  # wrong magic


def test_wav_roundtrip():
    rng = np.random.default_rng(11)
    samples = rng.integers(-32768, 32768, size=800, dtype=np.int16)
    raw = mm.encode_wav(samples, 16000)
    back, rate = mm.decode_wav(raw)
    assert rate == 16000 and np.array_equal(back, samples)
    with pytest.raises(ValueError):
        mm.decode_wav(b"RIFFxxxxNOPE")


def test_ppmseq_split():
    rng = np.random.default_rng(13)
    frames = [
        rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8) for _ in range(5)
    ]
    raw = b"".join(mm.encode_ppm(f) for f in frames)
    parts = mm.split_ppmseq(raw)
    assert len(parts) == 5
    for part, f in zip(parts, frames):
        assert np.array_equal(mm.decode_ppm(part), f)


def test_compressed_codec_boundary():
    # unknown formats stay the documented NotImplementedError seam
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"\x00", "synthetic/v1")
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"\x00" * 8, "video/mp4")
    # image/jpeg is now a REAL baseline decoder (operators/jpeg.py):
    # truncated bytes are a PARSE error, not a missing codec
    with pytest.raises(ValueError):
        mm.decode_media(b"\xff\xd8\xff", "image/jpeg")


# ------------------------------------------------------- generators


def test_synthetic_media_real_bytes(media):
    assert media.schema.simpleString() == mm.MEDIA_SCHEMA.simpleString()
    rows = media.collect()
    assert {r["kind"] for r in rows} == {"image", "audio", "video"}
    for r in rows:
        raw, meta = bytes(r["bytes"]), r["meta"]
        if r["kind"] == "image":
            px = mm.decode_ppm(raw)
            assert px.shape == (meta["height"], meta["width"], 3)
        elif r["kind"] == "audio":
            samples, rate = mm.decode_wav(raw)
            assert rate == meta["sample_rate"]
            assert len(samples) == rate * meta["duration_ms"] // 1000
        else:
            assert len(mm.split_ppmseq(raw)) == meta["n_frames"]
        # the generic decode entry point handles every generated row
        assert mm.decode_media(raw, meta["format"]).dtype == np.uint8


def test_synthetic_media_fake_mode(spark):
    fake = mm.synthetic_media(spark, 12, real=False)
    r = fake.first()
    assert isinstance(r["bytes"], bytearray | bytes) and len(r["bytes"]) == 16 * 64
    assert r["meta"]["format"] == "synthetic/v1"


# -------------------------------------------------------- operators


def test_extract_features_real_decode(media):
    out = mm.extract_features(media, decoder=mm.decode_media)
    rows = out.collect()
    assert len(rows) == media.count()
    for r in rows[:8]:
        v = np.array(r["feature"])
        assert v.shape == (mm.FEATURE_DIM,)
        assert abs(float(v.sum()) - 1.0) < 1e-5  # normalized histogram
        assert r["n_bytes"] > 0
    # deterministic across runs
    a = {r["media_id"]: tuple(r["feature"]) for r in rows}
    b = {
        r["media_id"]: tuple(r["feature"])
        for r in mm.extract_features(media, decoder=mm.decode_media).collect()
    }
    assert a == b


def test_features_feed_similarity(spark, media):
    """The media features plug straight into the ANN operator."""
    from w3_data_etl_pipeline_spark.operators.similarity import cosine_topk

    feats = mm.extract_features(media, decoder=mm.decode_media).withColumnRenamed(
        "media_id", "vec_id"
    )
    qv = feats.filter(F.col("vec_id") == 0).select("feature").head()[0]
    top = cosine_topk(feats, "feature", "vec_id", list(qv), k=5).collect()
    assert top[0]["vec_id"] == 0 and abs(top[0]["cosine"] - 1.0) < 1e-6


def test_resize_real_pixels(media):
    out = {r["media_id"]: r for r in mm.resize_images(media, max_side=24).collect()}
    src = {
        r["media_id"]: r for r in media.filter(F.col("kind") == "image").collect()
    }
    assert set(out) == set(src)
    for mid, r in out.items():
        m = src[mid]["meta"]
        assert max(r["width"], r["height"]) <= 24
        px = mm.decode_ppm(bytes(r["bytes"]))
        assert px.shape == (r["height"], r["width"], 3)
        # nearest-neighbor reference on the source pixels
        sp = mm.decode_ppm(bytes(src[mid]["bytes"]))
        ys = (np.arange(r["height"]) * m["height"]) // r["height"]
        xs = (np.arange(r["width"]) * m["width"]) // r["width"]
        assert np.array_equal(px, sp[ys][:, xs])


def test_resize_stub_fallback(spark):
    fake = mm.synthetic_media(spark, 12, real=False)
    out = mm.resize_images(fake, max_side=224).collect()
    assert len(out) == fake.filter(F.col("kind") == "image").count()
    for r in out:
        assert max(r["width"], r["height"]) <= 224 and len(r["bytes"]) >= 1


def test_frame_sampling_real_frames(media):
    out = mm.sample_frames(media, every_n=7)
    vids = {
        r["media_id"]: r
        for r in media.filter(F.col("kind") == "video").collect()
    }
    got = out.collect()
    by_vid: dict[int, list] = {}
    for r in got:
        by_vid.setdefault(r["media_id"], []).append(r)
    assert set(by_vid) == set(vids)
    for mid, rows in by_vid.items():
        nf = vids[mid]["meta"]["n_frames"]
        assert len(rows) == len(range(0, nf, 7))  # exact fan-out
        frames = mm.split_ppmseq(bytes(vids[mid]["bytes"]))
        for r in rows:
            # each sampled frame is the REAL container frame, decodable
            assert bytes(r["bytes"]) == frames[r["frame_idx"]]
            assert mm.decode_ppm(bytes(r["bytes"])).shape == (4, 4, 3)
