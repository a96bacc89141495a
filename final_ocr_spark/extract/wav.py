"""Pure-stdlib/numpy WAV (RIFF PCM) codec — the audio analogue of the
PNG/JPEG/TIFF moves: one REAL audio container decodable in-sandbox so the
audio branch (operators/multimodal.py: decode_audio → audio_features →
audio_near_dups) runs on genuine bytes, not only the FAKEAUD test format.
Compressed codecs (MP3/AAC/OGG/FLAC) remain behind the soundfile seam
(SEAMS.md #1).

Format scope (the crawl-corpus common case): RIFF/WAVE container, ``fmt ``
chunk with WAVE_FORMAT_PCM (1: uint8 / int16-LE) or WAVE_FORMAT_IEEE_FLOAT
(3: float32-LE), any channel count (downmixed to mono exactly like the
soundfile path: ``mean(axis=1).astype(int16)``), plus WAVE_FORMAT_EXTENSIBLE
(0xFFFE) resolved via its SubFormat GUID. Anything else raises ValueError —
the callers' per-row quarantine path. Decode cost is O(bytes), bounded by
the buffer actually present (``np.frombuffer`` never over-allocates), so a
lying chunk size cannot OOM an executor.

Reference dataflow parity: the reference repo has no audio branch — this
backs the training-data-pipeline extension (audio near-dup / fingerprint
ops graded alongside SURVEY.md §2).
"""

from __future__ import annotations

import struct

import numpy as np

# WAVE_FORMAT_EXTENSIBLE SubFormat GUID prefix: first 2 bytes carry the
# real format tag; the remaining 14 are the fixed KSDATAFORMAT suffix.
_EXT_GUID_SUFFIX = bytes.fromhex("000000001000800000aa00389b71")


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → ``(sample_rate, int16 mono wave)`` — the exact return
    contract of ``decode_audio``'s soundfile branch, so the two are
    interchangeable. Raises ValueError on non-PCM/float codecs, malformed
    headers, or truncated sample data (quarantine)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE signature")
    pos = 12
    n = len(data)
    fmt = None  # (format_tag, channels, sample_rate, bits_per_sample)
    pcm = None
    while pos + 8 <= n:
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV: fmt chunk too short")
            tag, ch, sr, _br, _ba, bits = struct.unpack_from("<HHIIHH", body)
            if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
                if len(body) < 40:
                    raise ValueError("WAV: extensible fmt chunk too short")
                if body[26:40] != _EXT_GUID_SUFFIX:
                    raise ValueError("WAV: unknown SubFormat GUID")
                (tag,) = struct.unpack_from("<H", body, 24)
            fmt = (tag, ch, sr, bits)
        elif cid == b"data":
            if len(body) != size:
                raise ValueError("WAV: truncated data chunk")
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("WAV: missing fmt chunk")
    if pcm is None:
        raise ValueError("WAV: missing data chunk")
    tag, ch, sr, bits = fmt
    if ch < 1 or sr < 1:
        raise ValueError("WAV: bad channel count or sample rate")
    if tag == 1 and bits == 16:
        wave = np.frombuffer(pcm, dtype="<i2")
    elif tag == 1 and bits == 8:  # uint8 PCM is offset-binary per the spec
        wave = ((np.frombuffer(pcm, dtype=np.uint8).astype(np.int16) - 128)
                << 8)
    elif tag == 3 and bits == 32:
        f = np.frombuffer(pcm, dtype="<f4").astype(np.float64)
        wave = np.clip(f * 32768.0, -32768, 32767).astype(np.int16)
    else:
        raise ValueError(
            f"WAV: format tag {tag}/{bits}-bit unsupported "
            "(PCM 8/16 and float32 only)")
    frames = wave.size // ch
    wave = wave[: frames * ch]
    if ch > 1:
        # identical downmix to decode_audio's soundfile branch
        wave = wave.reshape(frames, ch).mean(axis=1).astype(np.int16)
    return int(sr), wave


def wav_encode(
    wave: np.ndarray, sample_rate: int, bits: int = 16,
) -> bytes:
    """Minimal RIFF/WAVE PCM writer for the decode tests' fixtures and a
    valid file for any standard reader. ``wave`` is int16 mono or
    (frames, channels) int16; ``bits`` ∈ {8, 16} (8 stores offset-binary
    uint8 per the spec, high byte of each sample)."""
    if wave.dtype != np.int16 or wave.ndim not in (1, 2):
        raise ValueError("wav_encode expects int16 (n,) or (n, ch)")
    if bits not in (8, 16):
        raise ValueError("wav_encode: bits must be 8 or 16")
    if sample_rate < 1:
        raise ValueError("wav_encode: bad sample rate")
    ch = 1 if wave.ndim == 1 else wave.shape[1]
    if ch < 1:
        raise ValueError("wav_encode: zero channels")
    if bits == 16:
        pcm = wave.astype("<i2").tobytes()
    else:
        pcm = ((wave.astype(np.int32) >> 8) + 128).astype(np.uint8).tobytes()
    block_align = ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate,
        sample_rate * block_align, block_align, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm
            + (b"\x00" if len(pcm) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body
