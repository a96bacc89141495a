"""Multimodal plumbing tests: the fake codec exercises the real Spark-side
schema/batching; real codecs are stubbed (NotImplementedError)."""

from __future__ import annotations

import pytest


def test_image_features(spark):
    from final_ocr_spark.operators.multimodal import gen_fake_media, image_features

    media = gen_fake_media(spark, 25, seed=42)
    feats = image_features(media).collect()
    assert len(feats) == 20  # 4 of 5 are images
    ok = [r for r in feats if r["error"] is None]
    assert len(ok) == 20
    for r in ok:
        assert r["width"] >= 8 and r["height"] >= 8
        assert 0 <= r["mean_luma"] <= 255
        assert r["phash"] is not None


def test_video_frame_sampling(spark):
    from final_ocr_spark.operators.multimodal import gen_fake_media, sample_video_frames

    media = gen_fake_media(spark, 25, seed=42)
    frames = sample_video_frames(media, every_n=5).collect()
    assert frames  # videos exist (1 of 5)
    for r in frames:
        assert r["frame"][:7] == b"FAKEIMG"
        assert r["frame_idx"] % 5 == 0


def test_frames_feed_back_into_image_features(spark):
    """The UDTF output is itself decodable — the pipeline composes."""
    from final_ocr_spark.operators.multimodal import (
        gen_fake_media, image_features, sample_video_frames,
    )
    from pyspark.sql import functions as F

    media = gen_fake_media(spark, 25, seed=42)
    frames = sample_video_frames(media, every_n=10)
    as_media = frames.select(
        (F.col("media_id") * 1000 + F.col("frame_idx")).alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("frame").alias("content"),
        F.lit("image/x-fake").alias("mime"),
        F.lit(None).cast("string").alias("meta"),
    )
    feats = image_features(as_media).collect()
    assert feats and all(r["error"] is None for r in feats)


def test_real_codec_raises_not_implemented():
    from final_ocr_spark.operators.multimodal import decode_image

    with pytest.raises((NotImplementedError, ValueError)):
        decode_image(b"\x89PNG\r\n\x1a\n not actually decodable here")


def test_determinism(spark):
    from final_ocr_spark.operators.multimodal import gen_fake_media, image_features

    a = sorted(map(tuple, image_features(gen_fake_media(spark, 10, seed=1)).collect()))
    b = sorted(map(tuple, image_features(gen_fake_media(spark, 10, seed=1)).collect()))
    assert a == b
