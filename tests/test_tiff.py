"""TIFF 6.0 codec tests: strip decode across the compression schemes a
Common-Crawl-adjacent scanner corpus actually contains (none / LZW /
Deflate / PackBits, Predictor 2), plus the writer used as fixture source.

The reference's scan glob includes ``*.tiff`` (ocr2.py:569) and its decode
is cv2.imread; this engine decodes the same formats in pure numpy/stdlib
so the quarantine semantics are testable in-sandbox. Encoder and decoder
are developed against the TIFF 6.0 spec independently (§9 PackBits, §13
LZW with the sample-code early-change width schedule, §14 Predictor 2),
so a round-trip failing would indicate a real spec divergence, and
decode is additionally pinned against fixed byte snapshots below.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from final_ocr_spark.extract.raster import (
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    tiff_decode,
    tiff_encode,
    tiff_encode_tiled,
)

COMPRESSIONS = ["none", "lzw", "deflate", "packbits"]


def _rng(seed: int = 11) -> np.random.Generator:
    return np.random.default_rng(seed)


class TestRoundTrip:
    @pytest.mark.parametrize("comp", COMPRESSIONS)
    @pytest.mark.parametrize("predictor", [False, True])
    def test_gray(self, comp, predictor):
        img = _rng().integers(0, 256, (13, 17), dtype=np.uint8)
        enc = tiff_encode(img, compression=comp, predictor=predictor)
        dec = tiff_decode(enc)
        assert dec.dtype == np.uint8 and dec.shape == (13, 17)
        assert np.array_equal(dec, img)

    @pytest.mark.parametrize("comp", COMPRESSIONS)
    @pytest.mark.parametrize("predictor", [False, True])
    def test_rgb(self, comp, predictor):
        img = _rng(3).integers(0, 256, (9, 11, 3), dtype=np.uint8)
        dec = tiff_decode(tiff_encode(img, compression=comp,
                                      predictor=predictor))
        assert dec.shape == (9, 11, 3)
        assert np.array_equal(dec, img)

    @pytest.mark.parametrize("comp", ["lzw", "packbits", "deflate"])
    def test_runs_image(self, comp):
        """Long runs: PackBits repeat path, LZW long-match chains."""
        img = np.zeros((40, 57), dtype=np.uint8)
        img[:, ::7] = 255
        assert np.array_equal(tiff_decode(tiff_encode(img, compression=comp)),
                              img)

    def test_lzw_width_schedule_and_clear(self):
        """Random 75 KB forces the 9->10->11->12-bit transitions and the
        Clear-at-4094 table reset — the two places an off-by-one between
        encoder and decoder width schedules would corrupt output."""
        img = _rng(7).integers(0, 256, (256, 300), dtype=np.uint8)
        enc = tiff_encode(img, compression="lzw")
        assert np.array_equal(tiff_decode(enc), img)

    def test_lzw_kwkwk(self):
        """The code==len(table) (KwKwK) case: 'abab...' emits a code for a
        string not yet in the decoder table."""
        img = np.frombuffer((b"ab" * 600)[:1170], dtype=np.uint8)
        img = img.reshape(30, 39).copy()
        assert np.array_equal(
            tiff_decode(tiff_encode(img, compression="lzw")), img)

    def test_deterministic_encode(self):
        img = _rng(5).integers(0, 256, (8, 8), dtype=np.uint8)
        for comp in COMPRESSIONS:
            a = tiff_encode(img, compression=comp)
            b = tiff_encode(img, compression=comp)
            assert a == b


class TestPackBits:
    def test_literal_longer_than_128(self):
        raw = bytes(range(256)) * 2  # no runs: literals must chunk at 128
        assert _packbits_decode(_packbits_encode(raw)) == raw

    def test_run_longer_than_128(self):
        raw = b"\x55" * 400  # runs chunk at 128
        enc = _packbits_encode(raw)
        assert len(enc) < 10
        assert _packbits_decode(enc) == raw

    def test_noop_128_skipped(self):
        # 0x80 is a spec no-op; decoder must skip it
        assert _packbits_decode(b"\x80\x00A\x80") == b"A"

    def test_truncated_literal_raises(self):
        with pytest.raises(ValueError, match="PackBits literal"):
            _packbits_decode(b"\x05AB")  # claims 6 literal bytes, has 2

    def test_truncated_repeat_raises(self):
        with pytest.raises(ValueError, match="PackBits repeat"):
            _packbits_decode(b"\xfe")  # repeat marker with no byte


class TestLzwUnit:
    def test_empty(self):
        assert _lzw_decode(_lzw_encode(b"")) == b""

    def test_single_byte(self):
        assert _lzw_decode(_lzw_encode(b"Q")) == b"Q"

    def test_code_before_clear_raises(self):
        # first 9-bit code = 0 (a literal) without a preceding ClearCode
        with pytest.raises(ValueError, match="before Clear"):
            _lzw_decode(b"\x00\x00\x00")

    def test_out_of_range_code_raises(self):
        # Clear (256) then code 300 (not yet in table), MSB-aligned 9-bit
        acc = ((256 << 9) | 300) << 6  # left-align 18 bits into 3 bytes
        buf = acc.to_bytes(3, "big")
        with pytest.raises(ValueError, match="bad first LZW code"):
            _lzw_decode(buf)


class TestDecodeGuards:
    def test_unsupported_compression_raises(self):
        img = np.zeros((4, 4), dtype=np.uint8)
        enc = tiff_encode(img)
        old = struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 1, 0)
        new = struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 4, 0)
        patched = enc.replace(old, new)  # 4 = G4 fax
        assert patched != enc
        with pytest.raises(ValueError, match="compression 4"):
            tiff_decode(patched)

    def test_jpeg_compression_with_raw_payload_raises(self):
        # compression 7 is supported now, but the strip must be a JPEG
        img = np.zeros((4, 4), dtype=np.uint8)
        enc = tiff_encode(img)
        old = struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 1, 0)
        new = struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 7, 0)
        patched = enc.replace(old, new)
        assert patched != enc
        with pytest.raises(ValueError, match="SOI"):
            tiff_decode(patched)

    def test_legacy_deflate_32946(self):
        """Old-style Deflate code (32946) decodes same as 8."""
        img = _rng(9).integers(0, 256, (6, 7), dtype=np.uint8)
        enc = tiff_encode(img, compression="deflate")
        old = struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 8, 0)
        new = struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 32946, 0)
        patched = enc.replace(old, new)
        assert patched != enc
        assert np.array_equal(tiff_decode(patched), img)

    def test_planar_configuration_raises(self):
        """PlanarConfiguration=2 (separate R/G/B planes) must quarantine,
        not decode garbled chunky data."""
        img = np.zeros((4, 4, 3), dtype=np.uint8)
        enc = tiff_encode(img)
        # append is wrong (IFD must stay sorted); patch 277's neighbor
        # instead: rewrite XResolution (282) into PlanarConfiguration (284)
        old = struct.pack("<HHI", 282, 3, 1) + struct.pack("<HH", 72, 0)
        new = struct.pack("<HHI", 284, 3, 1) + struct.pack("<HH", 2, 0)
        patched = enc.replace(old, new)
        assert patched != enc
        with pytest.raises(ValueError, match="planar"):
            tiff_decode(patched)

    def test_dimension_cap_raises(self):
        """A lying header claiming a gigapixel image must refuse before
        allocating the output array."""
        img = np.zeros((4, 4), dtype=np.uint8)
        enc = tiff_encode(img)
        old = struct.pack("<HHI", 256, 3, 1) + struct.pack("<HH", 4, 0)
        new = struct.pack("<HHI", 256, 3, 1) + struct.pack("<HH", 65535, 0)
        patched = enc.replace(old, new)
        old = struct.pack("<HHI", 257, 3, 1) + struct.pack("<HH", 4, 0)
        new = struct.pack("<HHI", 257, 3, 1) + struct.pack("<HH", 65535, 0)
        patched = patched.replace(old, new)
        with pytest.raises(ValueError, match="decode cap"):
            tiff_decode(patched)

    def test_unknown_predictor_raises(self):
        img = np.zeros((4, 4), dtype=np.uint8)
        enc = tiff_encode(img, compression="deflate", predictor=True)
        old = struct.pack("<HHI", 317, 3, 1) + struct.pack("<HH", 2, 0)
        new = struct.pack("<HHI", 317, 3, 1) + struct.pack("<HH", 3, 0)
        patched = enc.replace(old, new)  # 3 = floating-point predictor
        assert patched != enc
        with pytest.raises(ValueError, match="predictor 3"):
            tiff_decode(patched)

    def test_bad_deflate_strip_raises(self):
        img = np.zeros((4, 4), dtype=np.uint8)
        enc = bytearray(tiff_encode(img, compression="deflate"))
        enc[8] ^= 0xFF  # corrupt first byte of the zlib stream
        with pytest.raises(ValueError, match="deflate"):
            tiff_decode(bytes(enc))

    def test_encode_rejects_unknown_compression(self):
        with pytest.raises(ValueError, match="unknown compression"):
            tiff_encode(np.zeros((2, 2), dtype=np.uint8), compression="jpeg")


class TestTiled:
    """Tile layout (TIFF 6.0 §15): per-tile compression, zero-padded
    edge tiles cropped on assembly, predictor applied at tile width."""

    @pytest.mark.parametrize("comp", COMPRESSIONS)
    @pytest.mark.parametrize("predictor", [False, True])
    def test_gray_ragged_edges(self, comp, predictor):
        img = _rng(21).integers(0, 256, (33, 47), dtype=np.uint8)
        enc = tiff_encode_tiled(img, tile=(16, 16), compression=comp,
                                predictor=predictor)
        assert np.array_equal(tiff_decode(enc), img)

    @pytest.mark.parametrize("comp", COMPRESSIONS)
    def test_rgb_predictor(self, comp):
        img = _rng(23).integers(0, 256, (25, 19, 3), dtype=np.uint8)
        enc = tiff_encode_tiled(img, tile=(16, 16), compression=comp,
                                predictor=True)
        assert np.array_equal(tiff_decode(enc), img)

    def test_exact_fit_tiles(self):
        img = _rng(25).integers(0, 256, (32, 48), dtype=np.uint8)
        enc = tiff_encode_tiled(img, tile=(16, 16), compression="deflate")
        assert np.array_equal(tiff_decode(enc), img)

    def test_single_tile_inline_values(self):
        # n=1: TileOffsets/ByteCounts fit the 4-byte IFD slot inline
        img = _rng(27).integers(0, 256, (10, 12), dtype=np.uint8)
        enc = tiff_encode_tiled(img, tile=(16, 16), compression="lzw")
        assert np.array_equal(tiff_decode(enc), img)

    def test_tile_count_mismatch_raises(self):
        img = _rng(29).integers(0, 256, (33, 47), dtype=np.uint8)
        enc = tiff_encode_tiled(img, tile=(16, 16))
        # shrink the claimed image to one tile: count no longer matches
        old = struct.pack("<HHI", 256, 3, 1) + struct.pack("<HH", 47, 0)
        new = struct.pack("<HHI", 256, 3, 1) + struct.pack("<HH", 16, 0)
        patched = enc.replace(old, new)
        assert patched != enc
        with pytest.raises(ValueError, match="tile count"):
            tiff_decode(patched)

    def test_tile_bomb_raises(self):
        """A tile whose decompressed size exceeds tile_w*tile_h must
        raise, not grow without bound."""
        img = np.zeros((16, 16), dtype=np.uint8)
        enc = tiff_encode_tiled(img, tile=(16, 16), compression="deflate")
        bomb = zlib.compress(b"\x00" * (1 << 20))
        # single tile: payload sits at offset 8 with inline byte count
        ifd_off = struct.unpack_from("<I", enc, 4)[0]
        body = enc[ifd_off:]
        old_payload_len = ifd_off - 8
        old325 = struct.pack("<HHI", 325, 4, 1) + struct.pack(
            "<I", old_payload_len)
        new325 = struct.pack("<HHI", 325, 4, 1) + struct.pack(
            "<I", len(bomb))
        assert old325 in body
        patched = (enc[:4] + struct.pack("<I", 8 + len(bomb)) + bomb
                   + body.replace(old325, new325))
        with pytest.raises(ValueError, match="exceeds image size"):
            tiff_decode(patched)


def _handmade_tiff(comp_code: int, payload: bytes, w: int = 4,
                   h: int = 4) -> bytes:
    """Minimal gray TIFF with an arbitrary strip payload — for crafting
    inputs tiff_encode refuses to produce (bombs, padded strips)."""
    ifd_off = 8 + len(payload)
    entries = []

    def entry(tag, typ, count, value):
        entries.append(struct.pack("<HHI", tag, typ, count) + value)

    short = lambda v: struct.pack("<HH", v, 0)  # noqa: E731
    long_ = lambda v: struct.pack("<I", v)  # noqa: E731
    entry(256, 3, 1, short(w))
    entry(257, 3, 1, short(h))
    entry(258, 3, 1, short(8))
    entry(259, 3, 1, short(comp_code))
    entry(262, 3, 1, short(1))
    entry(273, 4, 1, long_(8))
    entry(277, 3, 1, short(1))
    entry(278, 3, 1, short(h))
    entry(279, 4, 1, long_(len(payload)))
    return (b"II*\x00" + struct.pack("<I", ifd_off) + payload
            + struct.pack("<H", len(entries)) + b"".join(entries)
            + b"\x00\x00\x00\x00")


class TestDecompressionBombs:
    """Crafted tiny strips must raise once output exceeds what the header
    promises — never OOM the executor (crawled media is untrusted)."""

    def test_packbits_bomb(self):
        # 2 KB of repeat markers expanding to 128 KB for a 16-byte image
        with pytest.raises(ValueError, match="exceeds image size"):
            tiff_decode(_handmade_tiff(32773, b"\x81\xff" * 1000))

    def test_deflate_bomb(self):
        with pytest.raises(ValueError, match="exceeds image size"):
            tiff_decode(_handmade_tiff(8, zlib.compress(b"\x00" * (1 << 20))))

    def test_lzw_bomb(self):
        with pytest.raises(ValueError, match="exceeds image size"):
            tiff_decode(_handmade_tiff(5, _lzw_encode(b"\x00" * (1 << 20))))

    def test_padded_uncompressed_final_strip_tolerated(self):
        # sloppy writers pad the last strip; extra bytes are dropped
        img = tiff_decode(_handmade_tiff(1, b"\x07" * 16 + b"\x00" * 16))
        assert img.shape == (4, 4) and (img == 7).all()


class TestPinnedBytes:
    """Golden byte pins: decode must stay bit-stable across refactors
    (the per-url byte-identity invariant extends to the codec layer)."""

    def test_packbits_pinned(self):
        # 3x4 gray: rows [0,0,0,0],[7,7,9,9],[1,2,3,4] packbits-encoded
        img = np.array([[0, 0, 0, 0], [7, 7, 9, 9], [1, 2, 3, 4]],
                       dtype=np.uint8)
        enc = tiff_encode(img, compression="packbits")
        assert np.array_equal(tiff_decode(enc), img)
        strip = _packbits_encode(img.tobytes())
        assert strip == b"\xfd\x00\xff\x07\xff\x09\x03\x01\x02\x03\x04"

    def test_lzw_pinned(self):
        # codes 256(Clear) 65 66 258('AB') 257(EOI), 9-bit MSB-packed:
        # 100000000 001000001 001000010 100000010 100000001 + 3 pad bits
        enc = _lzw_encode(b"ABAB")
        assert _lzw_decode(enc) == b"ABAB"
        assert enc.hex() == "801048502808"


class TestDecodeImageSeam:
    """Compressed TIFFs now decode in-engine (no cv2 fall-through)."""

    @pytest.mark.parametrize("comp", ["lzw", "deflate", "packbits"])
    def test_gray_compressed_inline(self, comp):
        from final_ocr_spark.operators.multimodal import decode_image

        img = _rng(13).integers(0, 256, (12, 10), dtype=np.uint8)
        out = decode_image(tiff_encode(img, compression=comp))
        assert np.array_equal(out, img)

    def test_rgb_goes_through_bt601(self):
        from final_ocr_spark.extract.raster import bt601_gray
        from final_ocr_spark.operators.multimodal import decode_image

        img = _rng(17).integers(0, 256, (8, 9, 3), dtype=np.uint8)
        out = decode_image(tiff_encode(img, compression="lzw"))
        assert np.array_equal(out, bt601_gray(img))

    def test_jpeg_in_tiff_still_quarantines(self):
        """Compression 7 must keep raising (ValueError via the cv2 seam
        being absent -> NotImplementedError, or ValueError quarantine)."""
        img = np.zeros((4, 4), dtype=np.uint8)
        enc = tiff_encode(img)
        old = struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 1, 0)
        new = struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 7, 0)
        patched = enc.replace(old, new)
        from final_ocr_spark.operators.multimodal import decode_image

        with pytest.raises((ValueError, NotImplementedError)):
            decode_image(patched)


class TestJpegInTiff:
    """New-style JPEG-in-TIFF (compression 7, TTN2): per-strip/tile JPEG
    streams, optional shared JPEGTables (tag 347) splice. Expected pixels
    are rebuilt independently per chunk via jpeg_encode→jpeg_decode (the
    codec is lossy, so equality is against the JPEG round-trip of each
    band, not the source image)."""

    @staticmethod
    def _strip_expected(img, rps, quality=90):
        from final_ocr_spark.extract.jpeg import jpeg_decode, jpeg_encode

        h = img.shape[0]
        bands = [img[y0:y0 + rps] for y0 in range(0, h, rps)]
        dec = [jpeg_decode(jpeg_encode(b, quality=quality)) for b in bands]
        return np.concatenate(dec, axis=0)

    @pytest.mark.parametrize("shared", [False, True])
    def test_gray_strips(self, shared):
        from final_ocr_spark.extract.raster import tiff_encode_jpeg

        img = _rng(31).integers(0, 256, (37, 24), dtype=np.uint8)
        enc = tiff_encode_jpeg(img, rows_per_strip=16, shared_tables=shared)
        out = tiff_decode(enc)
        assert out.shape == (37, 24)
        assert np.array_equal(out, self._strip_expected(img, 16))

    @pytest.mark.parametrize("shared", [False, True])
    def test_rgb_strips(self, shared):
        from final_ocr_spark.extract.raster import tiff_encode_jpeg

        img = _rng(33).integers(0, 256, (21, 16, 3), dtype=np.uint8)
        enc = tiff_encode_jpeg(img, rows_per_strip=8, shared_tables=shared)
        out = tiff_decode(enc)
        assert out.shape == (21, 16, 3)
        assert np.array_equal(out, self._strip_expected(img, 8))

    def test_single_strip_inline_values(self):
        from final_ocr_spark.extract.raster import tiff_encode_jpeg

        img = _rng(35).integers(0, 256, (12, 10), dtype=np.uint8)
        out = tiff_decode(tiff_encode_jpeg(img))
        assert np.array_equal(out, self._strip_expected(img, 12))

    @pytest.mark.parametrize("shared", [False, True])
    def test_gray_tiled_ragged_edges(self, shared):
        from final_ocr_spark.extract.jpeg import jpeg_decode, jpeg_encode
        from final_ocr_spark.extract.raster import tiff_encode_jpeg

        img = _rng(37).integers(0, 256, (20, 27), dtype=np.uint8)
        enc = tiff_encode_jpeg(img, tile=(16, 16), shared_tables=shared)
        out = tiff_decode(enc)
        expected = np.zeros((32, 32), dtype=np.uint8)
        for ty in range(2):
            for tx in range(2):
                pad = np.zeros((16, 16), dtype=np.uint8)
                y0, x0 = ty * 16, tx * 16
                y1, x1 = min(y0 + 16, 20), min(x0 + 16, 27)
                pad[: y1 - y0, : x1 - x0] = img[y0:y1, x0:x1]
                expected[y0:y0 + 16, x0:x0 + 16] = jpeg_decode(
                    jpeg_encode(pad, quality=90))
        assert np.array_equal(out, expected[:20, :27])

    def test_old_style_jpeg_refused(self):
        enc = _handmade_tiff(6, b"\xff\xd8\xff\xd9")
        with pytest.raises(ValueError, match="old-style"):
            tiff_decode(enc)

    def test_malformed_jpeg_tables_raises(self):
        from final_ocr_spark.extract.jpeg import jpeg_encode
        from final_ocr_spark.extract.raster import (
            _jpeg_split_tables,
            tiff_encode_jpeg,
        )

        img = _rng(39).integers(0, 256, (16, 12), dtype=np.uint8)
        enc = tiff_encode_jpeg(img, rows_per_strip=8, shared_tables=True)
        tables, _ = _jpeg_split_tables(jpeg_encode(img[:8], quality=90))
        idx = enc.rindex(tables)
        bad = enc[:idx] + b"\x00\x00" + enc[idx + 2:]
        with pytest.raises(ValueError, match="JPEGTables"):
            tiff_decode(bad)

    def test_gigapixel_sof_in_chunk_raises_before_alloc(self):
        # a strip's JPEG claiming 65535×65535 in its SOF must raise on the
        # pre-walk (layout-slot bound), not allocate plane storage
        from final_ocr_spark.extract.raster import tiff_encode_jpeg

        img = _rng(41).integers(0, 256, (12, 10), dtype=np.uint8)
        enc = bytearray(tiff_encode_jpeg(img))
        sof = bytes(enc).index(b"\xff\xc0")
        enc[sof + 5:sof + 9] = b"\xff\xff\xff\xff"
        with pytest.raises(ValueError, match="layout slot"):
            tiff_decode(bytes(enc))

    def test_decode_image_seam(self):
        # compression-7 files now decode in-engine through the image seam
        from final_ocr_spark.extract.jpeg import jpeg_decode, jpeg_encode
        from final_ocr_spark.extract.raster import bt601_gray, tiff_encode_jpeg
        from final_ocr_spark.operators.multimodal import decode_image

        img = _rng(43).integers(0, 256, (14, 11, 3), dtype=np.uint8)
        out = decode_image(tiff_encode_jpeg(img))
        assert np.array_equal(
            out, bt601_gray(jpeg_decode(jpeg_encode(img, quality=90))))
