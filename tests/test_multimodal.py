"""Multimodal binary-column operators: schema/batch plumbing is real,
codecs are stubbed (none installed in this image)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from w3_data_etl_pipeline_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthetic_media(spark, 60).persist()


def test_synthetic_media_schema(media):
    assert media.schema.simpleString() == mm.MEDIA_SCHEMA.simpleString()
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    r = media.first()
    assert isinstance(r["bytes"], bytearray | bytes) and len(r["bytes"]) == 16 * 64


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"\x00", "synthetic/v1")


def test_extract_features(media):
    out = mm.extract_features(media)
    rows = out.collect()
    assert len(rows) == media.count()
    for r in rows[:5]:
        v = np.array(r["feature"])
        assert v.shape == (mm.FEATURE_DIM,)
        assert abs(float(v.sum()) - 1.0) < 1e-5  # normalized histogram
        assert r["n_bytes"] == 1024
    # deterministic across runs
    a = {r["media_id"]: tuple(r["feature"]) for r in rows}
    b = {r["media_id"]: tuple(r["feature"]) for r in mm.extract_features(media).collect()}
    assert a == b


def test_features_feed_similarity(spark, media):
    """The media features plug straight into the ANN operator."""
    from w3_data_etl_pipeline_spark.operators.similarity import cosine_topk

    feats = mm.extract_features(media).withColumnRenamed("media_id", "vec_id")
    qv = feats.filter(F.col("vec_id") == 0).select("feature").head()[0]
    top = cosine_topk(feats, "feature", "vec_id", list(qv), k=5).collect()
    assert top[0]["vec_id"] == 0 and abs(top[0]["cosine"] - 1.0) < 1e-6


def test_resize_geometry(media):
    out = mm.resize_images(media, max_side=224).collect()
    assert len(out) == media.filter(F.col("kind") == "image").count()
    src = {r["media_id"]: r for r in media.filter(F.col("kind") == "image").collect()}
    for r in out:
        m = src[r["media_id"]]["meta"]
        assert max(r["width"], r["height"]) <= 224
        # aspect ratio preserved within integer rounding
        if m["width"] >= m["height"]:
            assert r["width"] == min(224, m["width"])
        assert len(r["bytes"]) >= 1


def test_frame_sampling_fanout(media):
    out = mm.sample_frames(media, every_n=25)
    vids = {r["media_id"]: r["meta"]["n_frames"] for r in media.filter(F.col("kind") == "video").collect()}
    got = out.groupBy("media_id").agg(F.count("*").alias("n"), F.max("frame_ms").alias("mx")).collect()
    assert {r["media_id"] for r in got} == set(vids)
    for r in got:
        nf = vids[r["media_id"]]
        assert r["n"] == len(range(0, nf, 25))  # exact fan-out per video
