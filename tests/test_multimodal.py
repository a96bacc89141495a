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


def _fakeimg(pix: bytes, w: int, h: int) -> bytes:
    return b"FAKEIMG %d %d " % (w, h) + pix


def test_image_near_dups_planted(spark):
    """Planted perceptual near-dups: a copy with a few perturbed non-sample
    pixels hashes identically (hamming 0); a copy with two flipped SAMPLE
    pixels lands at small hamming; an unrelated image stays out."""
    import numpy as np

    from final_ocr_spark.operators.multimodal import (
        MEDIA_SCHEMA, _decode_fake_image, _phash64, image_near_dups,
    )

    w = h = 32
    rng = np.random.RandomState(7)
    # bimodal pixels: every sampled cell far from the mean, so small luma
    # noise cannot flip hash bits
    base = (rng.randint(0, 2, size=(h, w)) * 255).astype(np.uint8)
    near = base.copy()
    near[1, 1] ^= 4  # not on the 8x8 sample grid at 32x32 (grid = 0,4,8,...)
    far = base.copy()
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    far[ys[0], xs[0]] ^= 255  # flip two sampled cells => hamming ~2
    far[ys[3], xs[5]] ^= 255
    other = (rng.randint(0, 2, size=(h, w)) * 255).astype(np.uint8)

    rows = [
        (0, "image", _fakeimg(base.tobytes(), w, h), "image/x-fake", None),
        (1, "image", _fakeimg(near.tobytes(), w, h), "image/x-fake", None),
        (2, "image", _fakeimg(far.tobytes(), w, h), "image/x-fake", None),
        (3, "image", _fakeimg(other.tobytes(), w, h), "image/x-fake", None),
        (4, "image", b"FAKEIMG 4 4 xx", "image/x-fake", None),  # truncated
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {
        (r["key_a"], r["key_b"]): r["hamming"]
        for r in image_near_dups(media, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs and 1 <= pairs[(0, 2)] <= 3
    assert all(3 not in p and 4 not in p for p in pairs)
    # python-twin cross-check of the planted hamming
    ph = [_phash64(_decode_fake_image(_fakeimg(a.tobytes(), w, h)))
          for a in (base, far)]
    assert pairs[(0, 2)] == bin((ph[0] ^ ph[1]) & (2**64 - 1)).count("1")


def test_audio_features_and_quarantine(spark):
    """Audio branch plumbing: features + fingerprint for good clips,
    per-row quarantine for truncated/garbage payloads, python-twin
    cross-check of rms/zero-crossings/afp."""
    import numpy as np

    from final_ocr_spark.operators.multimodal import (
        MEDIA_SCHEMA, _afp64, audio_features, gen_fake_audio,
    )

    media = gen_fake_audio(spark, 6, seed=5)
    bad = spark.createDataFrame(
        [(100, "audio", b"FAKEAUD 8000 500 xx", "audio/x-fake", None),
         (101, "audio", b"garbage", "audio/x-fake", None),
         (102, "image", b"FAKEIMG 2 2 abcd", "image/x-fake", None)],
        MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r
           for r in audio_features(media.unionByName(bad)).collect()}
    assert 102 not in got  # non-audio rows never enter the branch
    assert got[100]["error"] and got[100]["afp"] is None
    # non-FAKEAUD bytes route to the guarded real-decoder seam, which is
    # honest about the missing library instead of claiming bad input
    assert got[101]["error"] and "soundfile" in got[101]["error"]
    ok = got[0]
    assert ok["error"] is None and ok["sample_rate"] == 8000
    assert ok["duration_s"] == ok["n_samples"] / 8000
    # python twin on clip 0
    raw = media.filter("media_id = 0").collect()[0]["content"]
    head = bytes(raw).split(b" ", 3)
    wave = np.frombuffer(bytes(raw).split(b" ", 3)[3], dtype="<i2")
    assert int(head[2]) == ok["n_samples"] == wave.size
    w = wave.astype(np.float64)
    assert ok["rms"] == float(np.sqrt(np.mean(w * w)))
    assert ok["zero_crossings"] == int(np.count_nonzero(np.diff(np.signbit(w))))
    assert ok["afp"] == _afp64(wave)


def test_audio_near_dups_planted(spark):
    """A gain-scaled copy of a clip fingerprints identically (the afp is
    amplitude-invariant); lightly-noised copies land within the radius;
    different tones stay out."""
    import numpy as np

    from final_ocr_spark.operators.multimodal import (
        MEDIA_SCHEMA, audio_near_dups, gen_fake_audio,
    )

    base_rows = gen_fake_audio(spark, 4, seed=11).collect()
    extra = []
    for r in base_rows[:1]:
        raw = bytes(r["content"])
        head, sr_b, n_b, pcm = raw.split(b" ", 3)
        wave = np.frombuffer(pcm, dtype="<i2")
        half = (wave.astype(np.float64) * 0.5).astype("<i2")  # gain change
        extra.append((50, "audio",
                      b"FAKEAUD " + sr_b + b" " + n_b + b" " + half.tobytes(),
                      "audio/x-fake", None))
    media = spark.createDataFrame(base_rows + extra, MEDIA_SCHEMA)
    pairs = {(r["key_a"], r["key_b"]): r["hamming"]
             for r in audio_near_dups(media, max_hamming=3).collect()}
    assert pairs.get((0, 50)) == 0
    assert all({p[0], p[1]} != {1, 2} for p in pairs)


def test_video_near_dups_trim_robust(spark):
    """Frame-set MinHash: a TRIMMED copy of a video (last fifth of frames
    dropped) still pairs with its original at high estimated Jaccard; an
    exact copy pairs at 1.0; unrelated videos stay out."""
    from final_ocr_spark.operators.multimodal import (
        MEDIA_SCHEMA, gen_fake_media, video_near_dups,
    )

    vids = [r for r in gen_fake_media(spark, 60, seed=21).collect()
            if r["kind"] == "video"]
    assert len(vids) >= 4
    base = vids[0]
    raw = bytes(base["content"])
    head = raw.split(b" ", 4)
    n, w, h = int(head[1]), int(head[2]), int(head[3])
    pix = head[4]
    keep = max(n - n // 5, 1)
    trimmed = (b"FAKEVID %d %d %d " % (keep, w, h)) + pix[: keep * w * h]
    extra = [
        (500, "video", trimmed, "video/x-fake", None),
        (501, "video", raw, "video/x-fake", None),     # exact copy
    ]
    media = spark.createDataFrame(vids + extra, MEDIA_SCHEMA)
    pairs = {
        (r["key_a"], r["key_b"]): r["est_jaccard"]
        for r in video_near_dups(
            media, every_n=2, jaccard_threshold=0.5
        ).collect()
    }
    b = base["media_id"]
    assert pairs.get((b, 501)) == 1.0
    assert (b, 500) in pairs and pairs[(b, 500)] >= 0.5
    others = {v["media_id"] for v in vids[1:]}
    assert all(not ({p[0], p[1]} <= others) for p in pairs)


def test_preprocess_images_cascade(spark):
    """preprocess_images runs the REAL raster cascade (CLAHE → NLM → Otsu →
    conditional upscale) over mixed FAKEIMG + PNG payloads, re-encodes as
    PNG, and quarantines junk per row — matching a driver-side run of the
    same kernels exactly."""
    import numpy as np

    from final_ocr_spark.extract.raster import (
        png_decode, png_encode, preprocess_page)
    from final_ocr_spark.operators.multimodal import (
        MEDIA_SCHEMA, gen_fake_media, preprocess_images)

    rng = np.random.RandomState(99)
    png_img = rng.randint(0, 256, (24, 18), dtype=np.uint8)
    extra = [
        (900, "image", png_encode(png_img), "image/png", None),
        (901, "image", b"\x89PNG\r\n\x1a\ngarbage-after-magic", "image/png", None),
        (902, "image", b"not an image at all", None, None),
    ]
    media = gen_fake_media(spark, 10, seed=3).unionByName(
        spark.createDataFrame(extra, MEDIA_SCHEMA)
    )
    rows = {
        r["media_id"]: r
        for r in preprocess_images(media, target_height=32).collect()
    }
    # junk rows quarantined, never task failures
    assert rows[901]["error"] is not None and rows[901]["content"] is None
    assert rows[902]["error"] is not None

    # the PNG row must match a driver-side run of the identical cascade
    got = png_decode(rows[900]["content"])
    exp = preprocess_page(png_img, target_height=32)
    assert np.array_equal(got, exp)
    assert (rows[900]["height"], rows[900]["width"]) == exp.shape

    # every ok FAKEIMG row decodes to a binary-or-interpolated PNG of the
    # declared size
    ok = [r for r in rows.values() if r["error"] is None and r["media_id"] < 900]
    assert ok
    for r in ok:
        out = png_decode(r["content"])
        assert out.shape == (r["height"], r["width"])


def test_preprocess_images_variants_differ(spark):
    """ocr.py's (clip 3.0, otsu) and ocr2.py's (clip 2.0, adaptive) configs
    are both reachable and produce different bytes on the same input."""
    from final_ocr_spark.operators.multimodal import gen_fake_media, preprocess_images

    media = gen_fake_media(spark, 5, seed=11).filter("kind = 'image'").limit(2)
    a = {r["media_id"]: bytes(r["content"]) for r in preprocess_images(
        media, clip_limit=3.0, threshold="otsu", target_height=16).collect()}
    b = {r["media_id"]: bytes(r["content"]) for r in preprocess_images(
        media, clip_limit=2.0, threshold="adaptive", target_height=16).collect()}
    assert set(a) == set(b) and a
    assert any(a[k] != b[k] for k in a)
