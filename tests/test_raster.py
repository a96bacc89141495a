"""Raster kernel tests: PNG codec round-trips + hand-built decode fixtures,
and per-pixel spec-twin differentials for CLAHE / NLM / Otsu / bicubic /
adaptive threshold — the twins are independent loop implementations of the
same published formulas, so a vectorization bug cannot hide behind itself.
No Spark session needed: everything here is worker-side numpy."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from final_ocr_spark.extract.raster import (
    PNG_MAGIC,
    adaptive_threshold_gaussian,
    binarize_otsu,
    bt601_gray,
    clahe,
    conditional_upscale,
    nl_means_denoise,
    otsu_threshold,
    png_decode,
    png_decode_gray,
    png_encode,
    preprocess_page,
    resize_cubic,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png(width, height, color_type, raw_rows, extra_chunks=()):
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = PNG_MAGIC + _chunk(b"IHDR", ihdr)
    for c in extra_chunks:
        out += c
    out += _chunk(b"IDAT", zlib.compress(raw_rows))
    return out + _chunk(b"IEND", b"")


class TestPngCodec:
    def test_roundtrip_gray_all_filters(self):
        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, (23, 31), dtype=np.uint8)
        for ft in range(5):
            assert np.array_equal(png_decode(png_encode(img, filter_type=ft)), img)

    def test_roundtrip_rgb_all_filters(self):
        rng = np.random.RandomState(8)
        img = rng.randint(0, 256, (11, 13, 3), dtype=np.uint8)
        for ft in range(5):
            assert np.array_equal(png_decode(png_encode(img, filter_type=ft)), img)

    def test_gray_alpha_decode(self):
        # hand-built color-type-4 (gray+alpha): alpha must be dropped by
        # png_decode_gray
        g = np.array([[10, 200], [90, 30]], dtype=np.uint8)
        a = np.array([[255, 128], [0, 7]], dtype=np.uint8)
        rows = b""
        for y in range(2):
            rows += b"\x00" + bytes(
                v for pair in zip(g[y], a[y]) for v in pair
            )
        data = _png(2, 2, 4, rows)
        assert np.array_equal(png_decode_gray(data), g)

    def test_palette_decode(self):
        # color type 3 with a 4-entry palette
        palette = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 10, 20, 30])
        rows = b"\x00" + bytes([3, 1]) + b"\x00" + bytes([0, 2])
        data = _png(2, 2, 3, rows, extra_chunks=(_chunk(b"PLTE", palette),))
        rgb = png_decode(data)
        assert rgb.shape == (2, 2, 3)
        assert list(rgb[0, 0]) == [10, 20, 30]
        assert list(rgb[1, 1]) == [0, 255, 0]

    def test_rejections(self):
        with pytest.raises(ValueError):
            png_decode(b"not a png at all")
        # 16-bit depth rejected
        ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
        bad = PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(
            b"IDAT", zlib.compress(b"\x00\x00\x00")
        ) + _chunk(b"IEND", b"")
        with pytest.raises(ValueError):
            png_decode(bad)
        # truncated IDAT payload
        img = np.zeros((4, 4), dtype=np.uint8)
        good = png_encode(img)
        with pytest.raises(ValueError):
            png_decode(good[:40])

    def test_bt601_exact_fixed_point(self):
        rgb = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255],
                         [255, 255, 255]]], dtype=np.uint8)
        got = bt601_gray(rgb)[0]
        exp = [(4899 * 255 + 8192) >> 14, (9617 * 255 + 8192) >> 14,
               (1868 * 255 + 8192) >> 14, 255]
        assert list(got) == exp


class TestOtsu:
    def test_differential_vs_bruteforce(self):
        rng = np.random.RandomState(3)
        for _ in range(10):
            img = rng.randint(0, 256, (17, 19), dtype=np.uint8)
            hist = np.bincount(img.ravel(), minlength=256).astype(float)
            total = hist.sum()
            best_t, best_s = 0, -1.0
            for t in range(256):
                w0 = hist[: t + 1].sum()
                w1 = total - w0
                if w0 == 0 or w1 == 0:
                    continue
                m0 = (hist[: t + 1] * np.arange(t + 1)).sum() / w0
                m1 = (hist[t + 1:] * np.arange(t + 1, 256)).sum() / w1
                s = w0 * w1 * (m0 - m1) ** 2
                if s > best_s:
                    best_s, best_t = s, t
            assert otsu_threshold(img) == best_t

    def test_bimodal_separates(self):
        img = np.zeros((20, 20), dtype=np.uint8)
        img[:, 10:] = 200
        img[:, :10] = 40
        t, binary = binarize_otsu(img)
        assert 40 <= t < 200
        assert set(np.unique(binary)) == {0, 255}
        assert (binary[:, 10:] == 255).all() and (binary[:, :10] == 0).all()


def _clahe_twin(img, clip_limit, grid):
    """Per-pixel loop spec twin of clahe() — same published formulas,
    independently written."""
    tiles_y, tiles_x = grid
    h, w = img.shape
    pad_y = (-h) % tiles_y
    pad_x = (-w) % tiles_x
    padded = np.pad(img, ((0, pad_y), (0, pad_x)), mode="reflect") if (
        pad_y or pad_x
    ) else img
    ph, pw = padded.shape
    th, tw = ph // tiles_y, pw // tiles_x
    area = th * tw
    clip = max(int(clip_limit * area / 256.0), 1)
    luts = {}
    for ty in range(tiles_y):
        for tx in range(tiles_x):
            tile = padded[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
            hist = [0] * 256
            for v in tile.ravel():
                hist[v] += 1
            excess = sum(max(c - clip, 0) for c in hist)
            hist = [min(c, clip) for c in hist]
            batch, residual = excess // 256, excess % 256
            hist = [c + batch for c in hist]
            if residual:
                step = max(256 // residual, 1)
                i, left = 0, residual
                while left > 0 and i < 256:
                    hist[i] += 1
                    left -= 1
                    i += step
            cdf, run = [], 0
            for c in hist:
                run += c
                cdf.append(run)
            luts[ty, tx] = [
                int(min(max(np.rint(v * 255.0 / area), 0), 255)) for v in cdf
            ]
    out = np.zeros((h, w), dtype=np.uint8)
    for y in range(h):
        tyf = (y + 0.5) / th - 0.5
        ty1 = int(np.floor(tyf))
        ya = tyf - ty1
        ty2 = min(max(ty1 + 1, 0), tiles_y - 1)
        ty1 = min(max(ty1, 0), tiles_y - 1)
        for x in range(w):
            txf = (x + 0.5) / tw - 0.5
            tx1 = int(np.floor(txf))
            xa = txf - tx1
            tx2 = min(max(tx1 + 1, 0), tiles_x - 1)
            tx1 = min(max(tx1, 0), tiles_x - 1)
            v = img[y, x]
            val = (
                luts[ty1, tx1][v] * (1 - ya) * (1 - xa)
                + luts[ty1, tx2][v] * (1 - ya) * xa
                + luts[ty2, tx1][v] * ya * (1 - xa)
                + luts[ty2, tx2][v] * ya * xa
            )
            out[y, x] = int(min(max(np.rint(val), 0), 255))
    return out


class TestClahe:
    def test_differential_vs_spec_twin(self):
        rng = np.random.RandomState(11)
        # non-divisible sizes exercise the reflect-101 padding path
        for shape, grid, clip in [((23, 37), (4, 4), 3.0),
                                  ((32, 32), (8, 8), 2.0),
                                  ((19, 45), (3, 5), 40.0)]:
            img = rng.randint(0, 256, shape, dtype=np.uint8)
            assert np.array_equal(
                clahe(img, clip_limit=clip, grid=grid),
                _clahe_twin(img, clip, grid),
            ), (shape, grid, clip)

    def test_constant_image_stays_constant(self):
        img = np.full((64, 48), 77, dtype=np.uint8)
        out = clahe(img)
        assert len(np.unique(out)) == 1

    def test_contrast_expands_on_low_contrast_input(self):
        rng = np.random.RandomState(5)
        img = rng.randint(118, 138, (64, 64)).astype(np.uint8)
        out = clahe(img, clip_limit=4.0)
        assert out.std() > img.std() * 1.5

    def test_too_small_image_rejected(self):
        with pytest.raises(ValueError):
            clahe(np.zeros((4, 4), dtype=np.uint8), grid=(8, 8))


def _nlm_twin(img, h, template_size, search_size):
    """Naive per-pixel NLM — same σ=0 Buades weights, same reflect-101
    border, same offset accumulation order (exact-match contract: patch
    SSDs are integers, so float results are bit-identical)."""
    th, sh = template_size // 2, search_size // 2
    pad = th + sh
    p = np.pad(img.astype(np.float64), pad, mode="reflect")
    hh, ww = img.shape
    out = np.zeros((hh, ww), dtype=np.uint8)
    area = float(template_size * template_size)
    for y in range(hh):
        for x in range(ww):
            cy, cx = y + pad, x + pad
            wsum = 0.0
            acc = 0.0
            for dy in range(-sh, sh + 1):
                for dx in range(-sh, sh + 1):
                    ssd = 0.0
                    for ty in range(-th, th + 1):
                        for tx in range(-th, th + 1):
                            d = (p[cy + ty, cx + tx]
                                 - p[cy + dy + ty, cx + dx + tx])
                            ssd += d * d
                    w = np.exp(-(ssd / area) / (h * h))
                    wsum += w
                    acc += w * p[cy + dy, cx + dx]
            out[y, x] = int(min(max(np.rint(acc / wsum), 0), 255))
    return out


class TestNlMeans:
    def test_differential_vs_naive_twin(self):
        rng = np.random.RandomState(13)
        img = rng.randint(0, 256, (12, 10), dtype=np.uint8)
        got = nl_means_denoise(img, h=10.0, template_size=3, search_size=5)
        exp = _nlm_twin(img, 10.0, 3, 5)
        assert np.array_equal(got, exp)

    def test_uniform_image_unchanged(self):
        img = np.full((30, 20), 99, dtype=np.uint8)
        assert np.array_equal(nl_means_denoise(img), img)

    def test_reduces_noise_on_noisy_constant(self):
        rng = np.random.RandomState(17)
        img = np.clip(
            128 + rng.randn(40, 40) * 12, 0, 255
        ).astype(np.uint8)
        out = nl_means_denoise(img, h=10.0)
        assert out.std() < img.std() * 0.8

    def test_even_window_rejected(self):
        with pytest.raises(ValueError):
            nl_means_denoise(np.zeros((8, 8), dtype=np.uint8), template_size=4)


def _resize_twin(img, out_w, out_h):
    """Naive per-output-pixel bicubic — same a=−0.75 kernel, same
    half-pixel mapping, same separable row-then-column pass order."""
    a = -0.75

    def kern(t):
        t = abs(t)
        if t <= 1:
            return ((a + 2) * t - (a + 3)) * t * t + 1
        if t < 2:
            return ((a * t - 5 * a) * t + 8 * a) * t - 4 * a
        return 0.0

    def axis(arr, out_len, ax):
        n = arr.shape[ax]
        scale = n / out_len
        moved = np.moveaxis(arr, ax, 0)
        out = np.zeros((out_len,) + moved.shape[1:])
        for o in range(out_len):
            fx = (o + 0.5) * scale - 0.5
            ix = int(np.floor(fx))
            fr = fx - ix
            for k in range(-1, 3):
                tap = min(max(ix + k, 0), n - 1)
                out[o] += kern(k - fr) * moved[tap]
        return np.moveaxis(out, 0, ax)

    f = axis(img.astype(np.float64), out_h, 0)
    f = axis(f, out_w, 1)
    return np.clip(np.rint(f), 0, 255).astype(np.uint8)


class TestResizeCubic:
    def test_identity_is_exact(self):
        rng = np.random.RandomState(19)
        img = rng.randint(0, 256, (15, 22), dtype=np.uint8)
        assert np.array_equal(resize_cubic(img, 22, 15), img)

    def test_differential_vs_naive_twin(self):
        rng = np.random.RandomState(23)
        img = rng.randint(0, 256, (9, 14), dtype=np.uint8)
        for out_w, out_h in [(28, 18), (7, 5), (14, 27)]:
            got = resize_cubic(img, out_w, out_h)
            exp = _resize_twin(img, out_w, out_h)
            # identical formulas; float summation order differs only in the
            # einsum vs loop accumulation of the SAME 4 addends — still
            # bit-equal in practice, but allow the half-ULP rint boundary
            assert int(np.abs(got.astype(int) - exp.astype(int)).max()) <= 1
            assert (got != exp).mean() < 0.01

    def test_constant_preserved(self):
        img = np.full((10, 10), 200, dtype=np.uint8)
        assert (resize_cubic(img, 25, 33) == 200).all()

    def test_conditional_upscale_rule(self):
        rng = np.random.RandomState(29)
        small = rng.randint(0, 256, (50, 80), dtype=np.uint8)
        up = conditional_upscale(small, target_height=100)
        # reference rule: int(width * (target/height)) — ocr.py:38
        assert up.shape == (100, int(80 * (100 / 50)))
        big = rng.randint(0, 256, (120, 60), dtype=np.uint8)
        assert conditional_upscale(big, target_height=100) is big


def _adaptive_twin(img, block_size, c):
    """Direct per-pixel Gaussian-window mean (2-D weights, edge padding)."""
    sigma = 0.3 * ((block_size - 1) * 0.5 - 1.0) + 0.8
    r = block_size // 2
    x = np.arange(block_size, dtype=np.float64) - r
    k1 = np.exp(-(x * x) / (2 * sigma * sigma))
    k1 /= k1.sum()
    p = np.pad(img.astype(np.float64), r, mode="edge")
    hh, ww = img.shape
    out = np.zeros((hh, ww), dtype=np.uint8)
    for y in range(hh):
        for x0 in range(ww):
            win = p[y:y + block_size, x0:x0 + block_size]
            # separable order mirrored: rows first, then the column kernel
            m = k1 @ (win @ k1)
            out[y, x0] = 0 if img[y, x0] > np.rint(m) - c else 255
    return out


class TestAdaptiveThreshold:
    def test_differential_vs_naive_twin(self):
        rng = np.random.RandomState(31)
        img = rng.randint(0, 256, (16, 14), dtype=np.uint8)
        got = adaptive_threshold_gaussian(img, block_size=5, c=2.0)
        exp = _adaptive_twin(img, 5, 2.0)
        assert (got != exp).mean() < 0.02  # rint-boundary ties only

    def test_inverted_semantics(self):
        # bright page with dark ink: ink (below local mean) must become 255
        img = np.full((30, 30), 220, dtype=np.uint8)
        img[10:20, 10:20] = 30
        out = adaptive_threshold_gaussian(img)
        assert out[15, 15] == 255
        assert out[2, 2] == 0

    def test_even_block_rejected(self):
        with pytest.raises(ValueError):
            adaptive_threshold_gaussian(np.zeros((8, 8), dtype=np.uint8),
                                        block_size=4)


class TestPreprocessPage:
    def test_cascade_shapes_and_determinism(self):
        rng = np.random.RandomState(37)
        img = rng.randint(0, 256, (40, 30), dtype=np.uint8)
        out1 = preprocess_page(img, target_height=80)
        out2 = preprocess_page(img, target_height=80)
        assert np.array_equal(out1, out2)
        assert out1.shape == (80, int(30 * (80 / 40)))

    def test_otsu_vs_adaptive_variants(self):
        rng = np.random.RandomState(41)
        img = rng.randint(0, 256, (24, 24), dtype=np.uint8)
        a = preprocess_page(img, threshold="otsu", target_height=24)
        b = preprocess_page(img, threshold="adaptive", target_height=24)
        assert a.shape == b.shape
        assert not np.array_equal(a, b)  # the two reference variants differ

    def test_no_upscale_when_tall_enough(self):
        rng = np.random.RandomState(43)
        img = rng.randint(0, 256, (120, 50), dtype=np.uint8)
        out = preprocess_page(img, target_height=100)
        assert out.shape == (120, 50)
        assert set(np.unique(out)) <= {0, 255}  # binary, no interpolation

    def test_unknown_threshold_rejected(self):
        with pytest.raises(ValueError):
            preprocess_page(np.zeros((16, 16), dtype=np.uint8),
                            threshold="magic")
