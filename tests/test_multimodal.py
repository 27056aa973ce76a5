"""Multimodal plumbing tests: schema, decode fault isolation, feature
shape, content dedup, frame-sample plan (decode codec stubbed)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from posmspark import multimodal


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.synth_media_df(spark).cache()


def test_schema_shape(media):
    assert media.schema == multimodal.MEDIA_SCHEMA
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "video"}


def test_extract_features(spark, media):
    feats = multimodal.extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    ok = [r for r in rows.values() if r["decode_ok"]]
    assert len(ok) == 50  # all real fake-images decode
    for r in ok:
        assert len(r["feature"]) == multimodal.FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
    # corrupt payload routed, not task-fatal
    bad = rows["imgBAD"]
    assert not bad["decode_ok"] and "unknown image codec" in bad["decode_err"]
    # videos have no decoder -> routed too
    vid = rows["vid0000"]
    assert not vid["decode_ok"]


def test_features_deterministic(spark, media):
    a = multimodal.extract_features(media).filter("decode_ok")
    b = multimodal.extract_features(media).filter("decode_ok")
    da = {r["media_id"]: r["feature"] for r in a.collect()}
    db = {r["media_id"]: r["feature"] for r in b.collect()}
    assert da == db


def test_dedupe_by_content(spark, media):
    out = multimodal.dedupe_by_content(media)
    rows = out.collect()
    # seeds repeat every 7 images with 3 sizes -> some payloads collide
    assert sum(r["n_copies"] for r in rows) == media.count()
    assert any(r["n_copies"] > 1 for r in rows)
    total_unique = len(rows)
    assert total_unique < media.count()


def test_frame_sample_plan(spark, media):
    plan = multimodal.frame_sample_plan(media, every_ms=1000)
    per_vid = {r["media_id"]: r["n"] for r in
               plan.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    # vid0000 duration 3000ms -> ts 0,1000,2000 = 3 frames
    assert per_vid["vid0000"] == 3
    # vid0009 duration 7500ms -> 0..7000 = 8 frames
    assert per_vid["vid0009"] == 8


def test_resize_images_roundtrip_and_fault_routing(spark):
    """Resize op: deterministic nearest-neighbor downsample with the
    payload-in/payload-out contract; corrupt payloads route to
    resize_ok=False instead of failing the task."""
    from posmspark.multimodal import (_decode_image_bytes, resize_images,
                                      synth_media_df)

    media = synth_media_df(spark)
    out = {r["media_id"]: r
           for r in resize_images(media, 16, 16).collect()}
    ok = [r for r in out.values() if r["resize_ok"]]
    assert len(ok) > 0
    for r in ok:
        img = _decode_image_bytes(bytes(r["payload"]))
        assert img.shape == (16, 16)
    assert out["imgBAD"]["resize_ok"] is False
    assert "ValueError" in out["imgBAD"]["resize_err"]
    # video rows route to errors, not crashes
    vids = [r for r in out.values() if r["kind"] == "video"]
    assert vids and all(not r["resize_ok"] for r in vids)
    # deterministic across runs
    out2 = {r["media_id"]: bytes(r["payload"]) if r["payload"] else None
            for r in resize_images(media, 16, 16).collect()}
    assert all((bytes(r["payload"]) if r["payload"] else None) == out2[m]
               for m, r in out.items())
