"""JPEG codec tests: encoder/decoder cross-verification plus independent
anchors that a shared encode/decode bug cannot satisfy — the published
zigzag matrix re-pinned as a literal, the IDCT against a per-pixel cosine
twin, and a hand-assembled DC-only stream whose expected pixels are
computed analytically. Pure numpy; no Spark session."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from final_ocr_spark.extract.jpeg import (
    _C,
    _DC_LUMA,
    _AC_LUMA,
    ZIGZAG,
    jpeg_decode,
    jpeg_encode,
)


class TestAnchors:
    def test_zigzag_matches_published_matrix(self):
        # T.81 Figure A.6, written here as the 8×8 "order visited" matrix —
        # an independent transcription of the spec table
        order = np.array([
            [0, 1, 5, 6, 14, 15, 27, 28],
            [2, 4, 7, 13, 16, 26, 29, 42],
            [3, 8, 12, 17, 25, 30, 41, 43],
            [9, 11, 18, 24, 31, 40, 44, 53],
            [10, 19, 23, 32, 39, 45, 52, 54],
            [20, 22, 33, 38, 46, 51, 55, 60],
            [21, 34, 37, 47, 50, 56, 59, 61],
            [35, 36, 48, 49, 57, 58, 62, 63],
        ])
        expect = np.empty(64, dtype=np.int64)
        expect[order.ravel()] = np.arange(64)  # zigzag idx → raster idx
        assert np.array_equal(ZIGZAG, expect)

    def test_idct_basis_vs_cosine_twin(self):
        # C[u,x] = a(u) cos((2x+1)uπ/16) per the spec formula, re-derived
        # with explicit loops, and orthonormality CᵀC = I
        twin = np.zeros((8, 8))
        for u in range(8):
            a = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
            for x in range(8):
                twin[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16)
        assert np.allclose(_C, twin, atol=1e-15)
        assert np.allclose(_C.T @ _C, np.eye(8), atol=1e-14)

    def test_hand_assembled_dc_only_stream(self):
        """Minimal 8×8 grayscale stream built byte-by-byte in this test:
        quant[0]=16, DC category 4 value +8 (standard-table code 101 +
        magnitude 1000), EOB (1010) — IDCT of a DC-only block is flat
        DC·q/8, so every pixel must be 128 + 8·16/8 = 144."""
        def seg(marker, body):
            return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

        qt = bytes([16] * 64)
        dqt = seg(0xDB, bytes([0x00]) + qt)
        sof = seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        dc_bits, dc_vals = _DC_LUMA
        ac_bits, ac_vals = _AC_LUMA
        dht = seg(0xC4, bytes([0x00] + dc_bits + dc_vals)) + seg(
            0xC4, bytes([0x10] + ac_bits + ac_vals)
        )
        sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        # entropy: 101 1000 1010 + 1-pad → 1011 0001 0101 1111
        entropy = bytes([0b10110001, 0b01011111])
        data = b"\xff\xd8" + dqt + sof + dht + sos + entropy + b"\xff\xd9"
        out = jpeg_decode(data)
        assert out.shape == (8, 8)
        assert (out == 144).all()


class TestRoundTrip:
    def test_flat_images_exact(self):
        for v in (0, 77, 128, 255):
            img = np.full((24, 16), v, np.uint8)
            assert np.array_equal(jpeg_decode(jpeg_encode(img, quality=90)), img)

    def test_smooth_gradient_near_lossless_q95(self):
        x = np.linspace(0, 255, 64)
        img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
        out = jpeg_decode(jpeg_encode(img, quality=95))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    def test_noise_bounded_error_q90(self):
        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, (40, 56), dtype=np.uint8)
        out = jpeg_decode(jpeg_encode(img, quality=90))
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.mean() < 8  # lossy, but sane

    def test_rgb_444_blockwise_flat_exact(self):
        rng = np.random.RandomState(5)
        base = rng.randint(80, 176, (2, 2, 3)).astype(np.float64)
        img = np.kron(base, np.ones((16, 16, 1))).astype(np.uint8)
        out = jpeg_decode(jpeg_encode(img, quality=95))
        assert out.shape == img.shape
        assert np.array_equal(out, img)

    def test_rgb_420_subsampled(self):
        rng = np.random.RandomState(6)
        base = rng.randint(80, 176, (2, 2, 3)).astype(np.float64)
        img = np.kron(base, np.ones((16, 16, 1))).astype(np.uint8)
        out = jpeg_decode(jpeg_encode(img, quality=95, subsample=True))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1

    def test_odd_dimensions(self):
        rng = np.random.RandomState(9)
        for shape in [(13, 19), (8, 9), (1, 1), (17, 8)]:
            img = rng.randint(0, 256, shape, dtype=np.uint8)
            assert jpeg_decode(jpeg_encode(img, quality=90)).shape == shape
        rgb = rng.randint(0, 256, (11, 7, 3), dtype=np.uint8)
        assert jpeg_decode(jpeg_encode(rgb, quality=90)).shape == (11, 7, 3)
        assert jpeg_decode(
            jpeg_encode(rgb, quality=90, subsample=True)
        ).shape == (11, 7, 3)

    def test_restart_markers_do_not_change_pixels(self):
        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, (24, 40), dtype=np.uint8)
        plain = jpeg_decode(jpeg_encode(img, quality=85))
        for dri in (1, 2, 7):
            with_rst = jpeg_decode(
                jpeg_encode(img, quality=85, restart_interval=dri)
            )
            assert np.array_equal(plain, with_rst), dri
        # and the DRI stream really contains restart markers
        blob = jpeg_encode(img, quality=85, restart_interval=1)
        assert any(
            blob[i] == 0xFF and 0xD0 <= blob[i + 1] <= 0xD7
            for i in range(len(blob) - 1)
        )

    def test_deterministic_bytes(self):
        rng = np.random.RandomState(13)
        img = rng.randint(0, 256, (16, 24), dtype=np.uint8)
        assert jpeg_encode(img, quality=80) == jpeg_encode(img, quality=80)


class TestRejections:
    def test_not_a_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            jpeg_decode(b"GIF89a whatever")

    def test_sequential_scan_with_sof2_marker_rejected(self):
        # a baseline stream relabeled SOF2 carries an Ss=0,Se=63 scan —
        # illegal in progressive mode (DC scans must have Se=0)
        img = np.zeros((8, 8), np.uint8)
        blob = bytearray(jpeg_encode(img))
        i = blob.find(b"\xff\xc0")
        blob[i + 1] = 0xC2  # rewrite SOF0 → SOF2
        with pytest.raises(ValueError, match="Se=0"):
            jpeg_decode(bytes(blob))

    def test_lossless_sof_rejected(self):
        img = np.zeros((8, 8), np.uint8)
        blob = bytearray(jpeg_encode(img))
        i = blob.find(b"\xff\xc0")
        blob[i + 1] = 0xC3  # SOF3 lossless
        with pytest.raises(ValueError, match="SOF3"):
            jpeg_decode(bytes(blob))

    def test_truncated_entropy(self):
        rng = np.random.RandomState(15)
        img = rng.randint(0, 256, (32, 32), dtype=np.uint8)
        blob = jpeg_encode(img, quality=90)
        with pytest.raises(ValueError):
            jpeg_decode(blob[: len(blob) // 2])

    def test_eoi_without_scan(self):
        with pytest.raises(ValueError, match="EOI before any scan"):
            jpeg_decode(b"\xff\xd8\xff\xd9")

    def test_missing_sos(self):
        with pytest.raises(ValueError, match="no SOS"):
            jpeg_decode(b"\xff\xd8\xff\xe0\x00\x04ab")


class TestProgressive:
    """SOF2 progressive coding. The encoder's progressive mode carries the
    SAME quantized coefficients as its baseline mode, so a correct decoder
    must return pixel-identical output for both — a differential no shared
    encoder/decoder bug in the banding/refinement logic can satisfy (the
    baseline path is independently anchored by the hand-built stream and
    the IDCT spec twin above)."""

    @pytest.mark.parametrize("shape,color,sub", [
        ((8, 8), False, False),
        ((21, 13), False, False),
        ((48, 64), True, False),
        ((47, 63), True, True),   # odd dims + 4:2:0 (AC scans skip MCU pad)
        ((129, 200), True, True),
    ])
    def test_pixels_identical_to_baseline(self, shape, color, sub):
        rng = np.random.RandomState(sum(shape))
        img = rng.randint(
            0, 256, shape + ((3,) if color else ()), dtype=np.uint8
        )
        for q in (50, 90):
            base = jpeg_decode(jpeg_encode(img, quality=q, subsample=sub))
            prog = jpeg_decode(
                jpeg_encode(img, quality=q, subsample=sub, progressive=True)
            )
            assert np.array_equal(base, prog), q

    def test_stream_is_really_progressive(self):
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        blob = jpeg_encode(img, progressive=True)
        assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob
        assert blob.count(b"\xff\xda") == 6   # gray scan script
        rgb = np.zeros((8, 8, 3), np.uint8)
        assert jpeg_encode(rgb, progressive=True).count(b"\xff\xda") == 10

    def test_restart_markers_do_not_change_pixels(self):
        rng = np.random.RandomState(21)
        img = rng.randint(0, 256, (24, 40), dtype=np.uint8)
        plain = jpeg_decode(jpeg_encode(img, quality=85, progressive=True))
        for dri in (1, 3, 7):
            blob = jpeg_encode(
                img, quality=85, restart_interval=dri, progressive=True
            )
            assert np.array_equal(plain, jpeg_decode(blob)), dri
            assert any(
                blob[i] == 0xFF and 0xD0 <= blob[i + 1] <= 0xD7
                for i in range(len(blob) - 1)
            )

    def test_truncated_scan_script_raises(self):
        # dropping the trailing scans + EOI must quarantine, not return a
        # silently half-refined image
        img = np.random.RandomState(23).randint(0, 256, (16, 16), np.uint8)
        blob = jpeg_encode(img, quality=85, progressive=True)
        third_sos = blob.index(
            b"\xff\xda", blob.index(b"\xff\xda", blob.index(b"\xff\xda") + 2) + 2
        )
        with pytest.raises(ValueError):
            jpeg_decode(blob[:third_sos])

    def test_decode_image_handles_progressive(self):
        from final_ocr_spark.operators.multimodal import decode_image

        rng = np.random.RandomState(25)
        img = rng.randint(0, 256, (20, 30), dtype=np.uint8)
        out = decode_image(jpeg_encode(img, quality=90, progressive=True))
        assert np.array_equal(out, jpeg_decode(jpeg_encode(img, quality=90)))
