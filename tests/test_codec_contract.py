"""Executable contract for the image-codec seam (decode_image).

The sandbox has no cv2/PIL, so the engine runs on a deterministic FAKEIMG
codec; a real cluster swaps in cv2. This file IS the swap-safety proof:
every assertion is written against an abstract (encode, payload) pair and
parametrized over all codecs importable in the current environment — run
it unchanged on a cluster with cv2 installed and the real branch gets the
identical contract:

  C1  decode returns np.ndarray, dtype uint8, ndim 2, shape (h, w)
  C2  decode is a pure function of the bytes (byte-identical on repeat)
  C3  lossless encode -> decode round trip is pixel-identical
  C4  undecodable input RAISES — never None, never silent garbage
      (cv2.imread's None-on-failure, reference ocr.py:18, must become an
      exception so image_features' per-row quarantine catches it)
  C5  downstream features (phash, mean/std luma) depend only on pixels —
      so swapping codecs cannot move feature values for identical images

No Spark session needed: the seam is pure Python, exactly like the
reference's manual-text bypass isolates its parser from the scanner.
"""

from __future__ import annotations

import numpy as np
import pytest

from final_ocr_spark.operators.multimodal import _phash64, decode_image


def _fake_encode(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    return b"FAKEIMG %d %d " % (w, h) + arr.tobytes()


def _stdlib_png_encode(arr: np.ndarray) -> bytes:
    from final_ocr_spark.extract.raster import png_encode

    return png_encode(arr)


def _codecs():
    """(name, lossless_encode, truncated_payload_builder) per available codec."""
    cases = [
        ("fakeimg", _fake_encode,
         lambda arr: _fake_encode(arr)[:-1]),  # drop last pixel byte
        # REAL format, decoded by the stdlib-zlib codec (extract/raster.py)
        # — available in every environment, so the seam contract runs on
        # actual image bytes even where cv2 is absent
        ("stdlib-png", _stdlib_png_encode,
         lambda arr: _stdlib_png_encode(arr)[:40]),  # truncated mid-IDAT
    ]
    # Compressed TIFF paths (lossless, so the full C1-C5 contract applies;
    # JPEG is deliberately absent — lossy, C3 cannot hold)
    from final_ocr_spark.extract.raster import tiff_encode

    for comp in ("lzw", "deflate", "packbits"):
        cases.append((
            f"stdlib-tiff-{comp}",
            lambda arr, c=comp: tiff_encode(arr, compression=c),
            # cut before the IFD: offsets point past the payload
            lambda arr, c=comp: tiff_encode(arr, compression=c)[:30],
        ))
    try:  # pragma: no cover - cv2 absent in sandbox, present on a cluster
        import cv2

        def _png_encode(arr: np.ndarray) -> bytes:
            ok, buf = cv2.imencode(".png", arr)
            assert ok
            return buf.tobytes()

        cases.append(("cv2-png", _png_encode, lambda arr: b"\x89PNG\r\n\x1a\n garbage"))
    except ImportError:
        pass
    return cases


CODECS = _codecs()
IDS = [c[0] for c in CODECS]


def _ref_image(w: int = 23, h: int = 17, seed: int = 5) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w), dtype=np.uint8)


@pytest.mark.parametrize("name,encode,_trunc", CODECS, ids=IDS)
def test_c1_dtype_shape(name, encode, _trunc):
    arr = _ref_image()
    out = decode_image(encode(arr))
    assert isinstance(out, np.ndarray)
    assert out.dtype == np.uint8
    assert out.ndim == 2
    assert out.shape == arr.shape  # (h, w) — height first, like cv2


@pytest.mark.parametrize("name,encode,_trunc", CODECS, ids=IDS)
def test_c2_deterministic(name, encode, _trunc):
    payload = encode(_ref_image())
    a, b = decode_image(payload), decode_image(payload)
    assert a.tobytes() == b.tobytes()


@pytest.mark.parametrize("name,encode,_trunc", CODECS, ids=IDS)
def test_c3_lossless_roundtrip(name, encode, _trunc):
    arr = _ref_image()
    assert np.array_equal(decode_image(encode(arr)), arr)


@pytest.mark.parametrize("name,encode,trunc", CODECS, ids=IDS)
def test_c4_bad_input_raises_never_none(name, encode, trunc):
    with pytest.raises(Exception):
        decode_image(trunc(_ref_image()))
    # decode of valid input is never None (asserted implicitly by C1; the
    # None case is what cv2.imread does on failure and is forbidden here)
    assert decode_image(encode(_ref_image())) is not None


def test_c4_unknown_format_raises_not_implemented_without_codecs():
    """In a codec-less container, bytes in a format the in-engine codecs
    don't cover (WebP here) must raise loudly with install guidance — not
    crash with an attribute error on None."""
    try:
        import cv2  # noqa: F401
        pytest.skip("cv2 present: unknown formats go to the real decoder")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="not installed"):
        decode_image(b"RIFF\x24\x00\x00\x00WEBPVP8 not really a webp")


def test_c4b_malformed_known_format_raises_value_error():
    """Malformed bytes in a format the in-engine codecs DO cover (JPEG
    signature, no scan) raise ValueError — the quarantine path — rather
    than falling through to the cv2 seam."""
    with pytest.raises(ValueError, match="JPEG"):
        decode_image(b"\xff\xd8\xff\xe0 not really a jpeg")


@pytest.mark.parametrize("name,encode,_trunc", CODECS, ids=IDS)
def test_c5_features_are_pixel_functions(name, encode, _trunc):
    """phash/mean/std computed through the codec equal those computed on the
    raw array — a codec swap cannot move feature values."""
    arr = _ref_image(w=40, h=31, seed=9)
    dec = decode_image(encode(arr))
    assert _phash64(dec) == _phash64(arr)
    assert float(dec.mean()) == float(arr.mean())
    assert float(dec.std()) == float(arr.std())


def test_fake_codec_matches_pinned_example():
    """One frozen byte-level example so the FAKEIMG wire format itself can
    never drift silently (it is the executable spec for golden q26/q27)."""
    arr = np.arange(6, dtype=np.uint8).reshape(2, 3)
    payload = _fake_encode(arr)
    assert payload == b"FAKEIMG 3 2 \x00\x01\x02\x03\x04\x05"
    assert np.array_equal(decode_image(payload), arr)
