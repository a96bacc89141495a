"""WAV/RIFF PCM codec tests: round-trips across sample widths and channel
layouts, quarantine guards, and the decode_audio seam contract — the audio
analogue of tests/test_tiff.py. Encoder and decoder are written against
the RIFF/WAVE spec independently, so a round-trip failure indicates a
real divergence; stereo downmix is pinned to the exact expression the
soundfile branch uses (``mean(axis=1).astype(int16)``)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from final_ocr_spark.extract.wav import wav_decode, wav_encode


def _rng(seed: int = 51) -> np.random.Generator:
    return np.random.default_rng(seed)


class TestRoundTrip:
    def test_mono_16bit(self):
        wave = _rng().integers(-32768, 32768, 441, dtype=np.int16)
        sr, out = wav_decode(wav_encode(wave, 44100))
        assert sr == 44100
        assert np.array_equal(out, wave)

    def test_stereo_downmix_matches_soundfile_expression(self):
        wave = _rng(3).integers(-32768, 32768, (200, 2), dtype=np.int16)
        sr, out = wav_decode(wav_encode(wave, 16000))
        assert sr == 16000
        assert np.array_equal(out, wave.mean(axis=1).astype(np.int16))

    def test_mono_8bit_offset_binary(self):
        # 8-bit stores the high byte offset-binary; decode returns it
        # re-centered and re-scaled to int16 range
        wave = _rng(5).integers(-32768, 32768, 100, dtype=np.int16)
        sr, out = wav_decode(wav_encode(wave, 8000, bits=8))
        expected = ((wave.astype(np.int32) >> 8).astype(np.int16)) << 8
        assert np.array_equal(out, expected)

    def test_odd_length_8bit_data_chunk_is_padded(self):
        # RIFF chunks are word-aligned: odd-sized data gets a pad byte
        wave = _rng(7).integers(-32768, 32768, 33, dtype=np.int16)
        enc = wav_encode(wave, 8000, bits=8)
        assert len(enc) % 2 == 0
        sr, out = wav_decode(enc)
        assert out.size == 33

    def test_float32_format(self):
        f = (_rng(9).random(64) * 2 - 1).astype("<f4")
        fmt = struct.pack("<HHIIHH", 3, 1, 22050, 22050 * 4, 4, 32)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", f.nbytes) + f.tobytes())
        enc = b"RIFF" + struct.pack("<I", len(body)) + body
        sr, out = wav_decode(enc)
        assert sr == 22050
        expected = np.clip(f.astype(np.float64) * 32768.0,
                           -32768, 32767).astype(np.int16)
        assert np.array_equal(out, expected)

    def test_extensible_pcm(self):
        from final_ocr_spark.extract.wav import _EXT_GUID_SUFFIX

        wave = _rng(11).integers(-32768, 32768, 50, dtype=np.int16)
        ext = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
        ext += struct.pack("<HHI", 22, 16, 0)[:4]  # cbSize=22, valid bits=16
        ext += struct.pack("<I", 0)  # channel mask
        ext += struct.pack("<H", 1) + _EXT_GUID_SUFFIX  # SubFormat = PCM
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(ext)) + ext
                + b"data" + struct.pack("<I", wave.nbytes) + wave.tobytes())
        enc = b"RIFF" + struct.pack("<I", len(body)) + body
        sr, out = wav_decode(enc)
        assert sr == 8000 and np.array_equal(out, wave)


class TestGuards:
    def test_bad_signature(self):
        with pytest.raises(ValueError, match="signature"):
            wav_decode(b"RIFX" + b"\x00" * 40)

    def test_missing_data_chunk(self):
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        with pytest.raises(ValueError, match="missing data"):
            wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)

    def test_truncated_data_chunk(self):
        wave = np.zeros(10, dtype=np.int16)
        enc = wav_encode(wave, 8000)
        with pytest.raises(ValueError, match="truncated data"):
            wav_decode(enc[:-4])

    def test_compressed_codec_refused(self):
        # format tag 85 = MP3-in-WAV: quarantine, don't guess
        wave = np.zeros(10, dtype=np.int16)
        enc = wav_encode(wave, 8000)
        old = struct.pack("<HH", 1, 1)
        bad = enc.replace(b"fmt " + struct.pack("<I", 16) + old,
                          b"fmt " + struct.pack("<I", 16)
                          + struct.pack("<HH", 85, 1), 1)
        assert bad != enc
        with pytest.raises(ValueError, match="format tag 85"):
            wav_decode(bad)

    def test_zero_channels_rejected(self):
        wave = np.zeros(10, dtype=np.int16)
        enc = wav_encode(wave, 8000)
        old = struct.pack("<HH", 1, 1)
        bad = enc.replace(old, struct.pack("<HH", 1, 0), 1)
        with pytest.raises(ValueError, match="channel count"):
            wav_decode(bad)


class TestDecodeAudioSeam:
    def test_wav_through_decode_audio(self):
        from final_ocr_spark.operators.multimodal import decode_audio

        wave = _rng(13).integers(-32768, 32768, 800, dtype=np.int16)
        sr, out = decode_audio(wav_encode(wave, 44100))
        assert sr == 44100 and np.array_equal(out, wave)

    def test_fakeaud_still_decodes(self):
        from final_ocr_spark.operators.multimodal import decode_audio

        wave = np.arange(-5, 5, dtype="<i2")
        payload = b"FAKEAUD 8000 10 " + wave.tobytes()
        sr, out = decode_audio(payload)
        assert sr == 8000 and np.array_equal(out, wave)

    def test_non_wav_still_hits_soundfile_seam(self):
        from final_ocr_spark.operators.multimodal import decode_audio

        with pytest.raises(NotImplementedError, match="WAV/RIFF PCM"):
            decode_audio(b"ID3\x04\x00rest-of-an-mp3")
