"""Baseline JPEG codec (ITU-T T.81 sequential DCT) in pure numpy + stdlib.

The reference's scan corpus is ``*.jpg / *.jpeg`` first (ocr2.py:569) and
its decode ran through cv2 — absent here. Baseline JPEG is a fully public
specification (ITU-T T.81 / ISO 10918-1), so this module implements the
decode path directly, plus an encoder used by the tests as an independent
fixture source:

decode (``jpeg_decode``):
* markers: SOI, APPn/COM (skipped), DQT (8-bit tables), SOF0 (baseline;
  SOF1 extended-sequential accepted — same entropy coding), SOF2
  (progressive), DHT, DRI, SOS, EOI; lossless / arithmetic / 12-bit
  raise ValueError (the callers' quarantine path);
* entropy decode: canonical Huffman per spec §F.2 (MINCODE/MAXCODE/VALPTR
  tables), byte-stuffing (FF 00) and restart-marker (RST0-7) handling,
  DC prediction reset per restart interval;
* progressive (§G.2): per-component coefficient stores accumulate across
  scans — DC first/refine (point transform + one-bit refinement), AC
  first/refine with EOB runs and the positional correction-bit walk
  (structured after the public libjpeg jdphuff.c reading of figures
  G.7/G.10), interleaved DC scans + single-component banded AC scans on
  the component's own (non-MCU-padded) block grid;
* dequantize → de-zigzag → 8×8 IDCT as an exact float64 matrix product
  (the textbook type-III DCT — vectorized over ALL blocks of a component
  in one einsum, no per-pixel Python);
* chroma upsampling by sample replication (nearest) for any integral
  sampling-factor ratio (4:4:4, 4:2:2, 4:2:0 covered), JFIF YCbCr→RGB
  (R = Y + 1.402·(Cr−128), …), clamp + round-half-even to uint8.

encode (``jpeg_encode``): 4:4:4 or 4:2:0, Annex-K example quantization
tables scaled by the libjpeg quality curve, Annex-K standard Huffman
tables, optional restart interval, optional progressive mode (the
standard libjpeg scan script; same quantized coefficients as baseline,
so both modes must decode pixel-identically — a differential the tests
pin) — enough to produce spec-conformant streams any decoder reads,
giving the tests encoder/decoder cross-verification on top of
hand-assembled golden streams (a shared-bug round-trip can't hide: the
test suite pins the zigzag order, the IDCT against a per-pixel spec
twin, and a hand-built DC-only stream to analytically-computed pixels).

Determinism: like extract/raster.py, this is the CANONICAL in-engine JPEG
path — identical output everywhere, no import-dependent switches. libjpeg
implementations use fixed-point fast IDCTs that can differ by ±1 gray
level from the exact float transform; this module pins the exact one.

Scale shape: decode cost is dominated by the per-symbol Huffman loop
(pure Python over ~1-6 bytes/symbol) — roughly seconds for a multi-MP
scan, amortized across executor cores inside the same Arrow-batched
``mapInPandas`` stages as every other codec (operators/multimodal.py);
the pixel math is whole-image numpy.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order (spec Figure A.6): zigzag index → (row, col) raster index
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# exact 8-point DCT-II basis matrix: C[u, x] = a(u)·cos((2x+1)uπ/16)
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.25) if _u else np.sqrt(0.125)
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# Annex K.1 example quantization tables (the de-facto standard)
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 standard Huffman tables: (BITS counts per length 1..16, values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


# ---------------------------------------------------------------------------
# Huffman machinery (spec §C.2 table build, §F.2.2 decode)

class _HuffDecoder:
    __slots__ = ("mincode", "maxcode", "valptr", "values")

    def __init__(self, bits: list[int], values: list[int]) -> None:
        # canonical code assignment (Figure C.2)
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.values = list(values)
        code = 0
        k = 0
        for ln in range(1, 17):
            n = bits[ln - 1]
            if n:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += n
                k += n
                self.maxcode[ln] = code - 1
            code <<= 1
        if k != len(values):
            raise ValueError("DHT: BITS/HUFFVAL length mismatch")


class _BitReader:
    """Entropy-coded-segment bit reader: FF00 unstuffing, stops at any
    marker (the caller consumes RSTn explicitly)."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        p = self.pos
        if p >= len(d):
            raise ValueError("JPEG: bitstream truncated")
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else None
            if nxt == 0x00:
                self.pos = p + 2
            else:
                # a real marker: spec behavior is to feed 1-bits (§F.2.2.5
                # is about EOB runs; practically decoders pad) — but a
                # well-formed baseline stream never reads past its data,
                # so treat it as truncation
                raise ValueError("JPEG: hit marker inside entropy data")
        else:
            self.pos = p + 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.buf >> self.nbits) & ((1 << n) - 1)

    def byte_align(self) -> None:
        self.buf = 0
        self.nbits = 0

    def decode(self, h: _HuffDecoder) -> int:
        code = self.bit()
        ln = 1
        while code > h.maxcode[ln]:
            if ln >= 16:
                raise ValueError("JPEG: bad Huffman code")
            code = (code << 1) | self.bit()
            ln += 1
        return h.values[h.valptr[ln] + code - h.mincode[ln]]


def _extend(v: int, t: int) -> int:
    """Spec §F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


# ---------------------------------------------------------------------------
# decode

def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline/extended-sequential (SOF0/SOF1) or progressive (SOF2) JPEG
    bytes → uint8 (h, w) grayscale or (h, w, 3) RGB. Raises ValueError on
    other coding processes or malformed streams (quarantine)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    n = len(data)
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    progressive = False
    state = None  # (hmax, vmax, mcux, mcuy, store, geom) — set at first SOS

    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if state is None:
                raise ValueError("JPEG: EOI before any scan")
            return _reconstruct(frame, qtables, state)
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if pos + 2 > n:
            raise ValueError("JPEG: truncated segment header")
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2:pos + seglen]
        segend = pos + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("JPEG: 16-bit quant tables unsupported")
                qtables[tq] = np.frombuffer(
                    body[i + 1:i + 65], dtype=np.uint8
                ).astype(np.int64)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog.
            if frame is not None:
                raise ValueError("JPEG: multiple SOF markers")
            prec = body[0]
            if prec != 8:
                raise ValueError(f"JPEG: {prec}-bit precision unsupported")
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            comps = []
            for c in range(nc):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                tq = body[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG: SOF{marker - 0xC0} (lossless/arith) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs = body[1 + 2 * c]
                tt = body[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if state is None:
                state = _alloc_state(frame)
            if progressive:
                pos = _progressive_scan(
                    data, segend, frame, scan, (ss, se, ah, al), state,
                    huff_dc, huff_ac, restart_interval,
                )
            else:
                pos = _sequential_scan(
                    data, segend, frame, scan, state, huff_dc, huff_ac,
                    restart_interval,
                )
            continue
        pos = segend
    raise ValueError(
        "JPEG: truncated (no EOI)" if state is not None
        else "JPEG: no SOS marker"
    )


def _alloc_state(frame):
    """Per-component coefficient stores + geometry for scan decoding.

    Returns (hmax, vmax, mcux, mcuy, store, geom) where store[cid] is an
    (mcux·hs · mcuy·vs, 64) int32 zigzag-coefficient array covering the
    MCU-padded block grid, and geom[cid] = (hs, vs, bw, wblocks, hblocks):
    bw is the padded grid's blocks-per-row; wblocks/hblocks the component's
    OWN block grid (spec A.1.1: non-interleaved scans code ceil(cw/8) ×
    ceil(ch/8) blocks — the MCU padding blocks are coded only by
    interleaved scans)."""
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("JPEG: zero dimensions")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax == 0 or vmax == 0:
        raise ValueError("JPEG: zero sampling factor")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    store = {}
    geom = {}
    for cid, hs, vs, _tq in comps:
        if hs == 0 or vs == 0:
            raise ValueError("JPEG: zero sampling factor")
        bw, bh = mcux * hs, mcuy * vs
        store[cid] = np.zeros((bw * bh, 64), dtype=np.int32)
        cw = -(-(w * hs) // hmax)
        ch = -(-(h * vs) // vmax)
        geom[cid] = (hs, vs, bw, -(-cw // 8), -(-ch // 8))
    return hmax, vmax, mcux, mcuy, store, geom


def _consume_rst(r: _BitReader) -> None:
    """Byte-align and consume the expected RSTn marker."""
    r.byte_align()
    p = r.pos
    d = r.data
    if p + 1 >= len(d) or d[p] != 0xFF or not (0xD0 <= d[p + 1] <= 0xD7):
        raise ValueError("JPEG: expected restart marker")
    r.pos = p + 2


def _skip_to_marker(data: bytes, p: int) -> int:
    """Position of the next real marker (skipping stuffed FF00 bytes and
    stray RSTn) — where the post-scan parse resumes."""
    n = len(data)
    while p + 1 < n:
        if (data[p] == 0xFF and data[p + 1] != 0x00
                and not (0xD0 <= data[p + 1] <= 0xD7)):
            return p
        p += 1
    raise ValueError("JPEG: truncated after scan")


def _scan_units(scan_comps, geom, mcux, mcuy):
    """Yield one restart unit at a time: a list of (cid, block_index) pairs.
    Interleaved (ns>1): unit = MCU over the padded grid. Non-interleaved:
    unit = one block of the component's own grid."""
    if len(scan_comps) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for cid in scan_comps:
                    hs, vs, bw, _wb, _hb = geom[cid]
                    for by in range(vs):
                        for bx in range(hs):
                            unit.append(
                                (cid, (my * vs + by) * bw + mx * hs + bx)
                            )
                yield unit
    else:
        cid = scan_comps[0]
        _hs, _vs, bw, wblocks, hblocks = geom[cid]
        for by in range(hblocks):
            for bx in range(wblocks):
                yield [(cid, by * bw + bx)]


def _sequential_scan(data, pos, frame, scan, state, huff_dc, huff_ac, dri):
    """Decode one sequential (SOF0/SOF1) scan — interleaved or single-
    component — into the coefficient store. Returns the next-marker pos."""
    _h, _w, comps = frame
    hmax, vmax, mcux, mcuy, store, geom = state
    by_id = {c[0]: c for c in comps}
    tabs = {}
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"JPEG: scan references unknown component {cs}")
        if td not in huff_dc or ta not in huff_ac:
            raise ValueError("JPEG: missing Huffman table")
        tabs[cs] = (huff_dc[td], huff_ac[ta])

    r = _BitReader(data, pos)
    pred = {cs: 0 for cs, _td, _ta in scan}
    scan_ids = [cs for cs, _td, _ta in scan]
    for unit_index, unit in enumerate(_scan_units(scan_ids, geom, mcux, mcuy)):
        if dri and unit_index and unit_index % dri == 0:
            _consume_rst(r)
            pred = {cs: 0 for cs in pred}
        for cid, bi in unit:
            blk = store[cid][bi]
            hdc, hac = tabs[cid]
            t = r.decode(hdc)
            diff = _extend(r.bits(t), t) if t else 0
            pred[cid] += diff
            blk[0] = pred[cid]
            k = 1
            while k < 64:
                rs = r.decode(hac)
                rr, ss = rs >> 4, rs & 0xF
                if ss == 0:
                    if rr == 15:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += rr
                if k > 63:
                    raise ValueError("JPEG: AC index overflow")
                blk[k] = _extend(r.bits(ss), ss)
                k += 1
    return _skip_to_marker(data, r.pos)


def _progressive_scan(data, pos, frame, scan, band, state, huff_dc, huff_ac,
                      dri):
    """Decode one progressive (SOF2) scan per spec §G.2 into the coefficient
    store: DC first/refine (Ss=0), AC first/refine (band Ss..Se, single
    component). The refinement semantics mirror the public libjpeg
    jdphuff.c structure (the de-facto executable reading of figures
    G.7/G.10). Returns the next-marker pos."""
    ss_, se_, ah, al = band
    _h, _w, comps = frame
    hmax, vmax, mcux, mcuy, store, geom = state
    by_id = {c[0]: c for c in comps}
    dc_scan = ss_ == 0
    if dc_scan and se_ != 0:
        raise ValueError("JPEG: progressive DC scan must have Se=0")
    if not dc_scan and len(scan) != 1:
        raise ValueError("JPEG: progressive AC scan must be single-component")
    if se_ > 63 or ss_ > se_:
        raise ValueError("JPEG: bad spectral band")

    tabs = {}
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"JPEG: scan references unknown component {cs}")
        if dc_scan:
            if ah == 0 and td not in huff_dc:
                raise ValueError("JPEG: missing DC Huffman table")
            tabs[cs] = huff_dc.get(td)  # unused when Ah>0 (refine is 1 bit)
        else:
            if ta not in huff_ac:
                raise ValueError("JPEG: missing AC Huffman table")
            tabs[cs] = huff_ac[ta]

    r = _BitReader(data, pos)
    pred = {cs: 0 for cs, _td, _ta in scan}
    eobrun = 0
    scan_ids = [cs for cs, _td, _ta in scan]
    for unit_index, unit in enumerate(_scan_units(scan_ids, geom, mcux, mcuy)):
        if dri and unit_index and unit_index % dri == 0:
            _consume_rst(r)
            pred = {cs: 0 for cs in pred}
            eobrun = 0
        for cid, bi in unit:
            blk = store[cid][bi]
            if dc_scan:
                if ah == 0:  # DC first: point-transformed diff coding
                    t = r.decode(tabs[cid])
                    diff = _extend(r.bits(t), t) if t else 0
                    pred[cid] += diff
                    blk[0] = pred[cid] << al
                else:  # DC refine: one appended bit per block
                    if r.bit():
                        blk[0] = int(blk[0]) | (1 << al)
            elif ah == 0:
                eobrun = _ac_first(r, blk, ss_, se_, al, tabs[cid], eobrun)
            else:
                eobrun = _ac_refine(r, blk, ss_, se_, al, tabs[cid], eobrun)
    return _skip_to_marker(data, r.pos)


def _ac_first(r, blk, ss_, se_, al, hac, eobrun):
    """AC successive-approximation FIRST scan for one block (G.1.2.2):
    band-limited run-length coding with EOB runs; values enter shifted
    left by Al. Returns the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss_
    while k <= se_:
        rs = r.decode(hac)
        rr, sbits = rs >> 4, rs & 0xF
        if sbits == 0:
            if rr != 15:
                eb = 1 << rr
                if rr:
                    eb += r.bits(rr)
                return eb - 1  # current block is the first of the run
            k += 16  # ZRL
            continue
        k += rr
        if k > se_:
            raise ValueError("JPEG: AC index outside band")
        blk[k] = _extend(r.bits(sbits), sbits) << al
        k += 1
    return 0


def _ac_refine(r, blk, ss_, se_, al, hac, eobrun):
    """AC successive-approximation REFINEMENT scan for one block (G.1.2.3):
    newly-significant coefficients arrive as ±1·2^Al; every already-nonzero
    coefficient passed (including the post-EOB tail) consumes a correction
    bit. Structure mirrors libjpeg jdphuff.c decode_mcu_AC_refine. Returns
    the updated EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss_
    if eobrun == 0:
        while k <= se_:
            rs = r.decode(hac)
            rr, sbits = rs >> 4, rs & 0xF
            if sbits == 0:
                if rr != 15:
                    eobrun = 1 << rr
                    if rr:
                        eobrun += r.bits(rr)
                    break  # rest of block handled by the EOB tail below
                newval = 0  # ZRL: pass 16 zero-history coefficients
            else:
                if sbits != 1:
                    raise ValueError("JPEG: refinement magnitude > 1")
                newval = p1 if r.bit() else m1
            # advance over rr zero-history coefficients, appending a
            # correction bit to each nonzero-history one passed
            while k <= se_:
                c = int(blk[k])
                if c != 0:
                    if r.bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if newval and k <= se_:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        # EOB tail: correction bits for remaining nonzero coefficients
        while k <= se_:
            c = int(blk[k])
            if c != 0 and r.bit() and (c & p1) == 0:
                blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(frame, qtables, state):
    """Dequantize, de-zigzag, IDCT, upsample, color-convert — whole-
    component vectorized (one einsum per component)."""
    h, w, comps = frame
    hmax, vmax, mcux, mcuy, store, _geom = state
    planes = []
    for cid, hs, vs, tq in comps:
        if tq not in qtables:
            raise ValueError("JPEG: missing quant table")
        q = qtables[tq]
        dq = store[cid].astype(np.float64) * q[np.newaxis, :]
        raster = np.zeros_like(dq)
        raster[:, ZIGZAG] = dq
        blocks = raster.reshape(-1, 8, 8)
        # IDCT: f = Cᵀ F C  (exact type-III DCT, level shift +128)
        pix = np.einsum("ur,nuv,vc->nrc", _C, blocks, _C) + 128.0
        bw = mcux * hs  # blocks per row
        bh = mcuy * vs
        plane = (
            pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample by replication to the full sampling grid
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise ValueError(f"JPEG: {len(planes)}-component images unsupported")
    y, cb, cr = planes
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encode (test-fixture source; also a usable sink)

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def pad_align(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _encode_tables(bits, values):
    """(BITS, HUFFVAL) → dict symbol → (code, length)."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return table


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """The libjpeg quality curve (public recipe): 50 → base tables."""
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int64)


def _mag(v: int) -> tuple[int, int]:
    """signed value → (SSSS bit count, magnitude code)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, v if v > 0 else v + (1 << t) - 1


def _encode_blocks(wtr, blocks, q, dct_c, dc_tab, ac_tab, pred):
    """Forward-DCT, quantize, and entropy-code a (n, 8, 8) block stack
    against predictor ``pred`` (returned updated)."""
    f = np.einsum("ur,nrc,vc->nuv", dct_c, blocks - 128.0, dct_c)
    # zigzag scan: zz[i] = raster[ZIGZAG[i]]; q is in RASTER order here, so
    # the divisor for zigzag slot i is q[ZIGZAG[i]]
    zz = f.reshape(-1, 64)[:, ZIGZAG]
    qz = np.rint(zz / q[ZIGZAG]).astype(np.int64)
    for row in qz:
        diff = int(row[0]) - pred
        pred = int(row[0])
        t, code = _mag(diff)
        c, ln = dc_tab[t]
        wtr.write(c, ln)
        if t:
            wtr.write(code, t)
        run = 0
        last_nz = 63
        while last_nz > 0 and row[last_nz] == 0:
            last_nz -= 1
        for k in range(1, 64):
            v = int(row[k])
            if k > last_nz:
                c, ln = ac_tab[0x00]  # EOB
                wtr.write(c, ln)
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_tab[0xF0]  # ZRL
                wtr.write(c, ln)
                run -= 16
            t, code = _mag(v)
            c, ln = ac_tab[(run << 4) | t]
            wtr.write(c, ln)
            wtr.write(code, t)
            run = 0
    return pred


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) → (n, 8, 8) block stack in
    MCU raster order."""
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


# --- progressive-scan emitters (encoder side of spec §G.1.2) ---------------

def _enc_dc_first(wtr, dcval, al, pred, dc_tab):
    """DC first scan, one block: diff-code the point-transformed DC
    (arithmetic shift — G.1.2.1). Returns the updated predictor."""
    v = int(dcval) >> al
    t, code = _mag(v - pred)
    c, ln = dc_tab[t]
    wtr.write(c, ln)
    if t:
        wtr.write(code, t)
    return v


def _enc_ac_first(wtr, row, ss_, se_, al, ac_tab):
    """AC first scan, one block: run-length code the band's point-
    transformed values; per-block EOB flush (EOB run length always 1 —
    the Annex-K standard tables carry no multi-block EOBn symbols)."""
    vals = []
    for k in range(ss_, se_ + 1):
        v = int(row[k])
        mag = abs(v) >> al
        vals.append(mag if v >= 0 else -mag)
    last = -1
    for i, v in enumerate(vals):
        if v:
            last = i
    run = 0
    for i in range(last + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_tab[0xF0]  # ZRL
            wtr.write(c, ln)
            run -= 16
        t, code = _mag(v)
        c, ln = ac_tab[(run << 4) | t]
        wtr.write(c, ln)
        wtr.write(code, t)
        run = 0
    if last < len(vals) - 1:
        c, ln = ac_tab[0x00]  # EOB, run of 1
        wtr.write(c, ln)


def _enc_ac_refine(wtr, row, ss_, se_, al, ac_tab):
    """AC refinement scan, one block (G.1.2.3, the libjpeg jcphuff.c
    shape): newly-significant coefficients (shifted magnitude exactly 1)
    emit (run,1)+sign; already-nonzero coefficients buffer a correction
    bit, flushed right after the next emitted symbol (or the block's EOB)
    — matching the decoder's positional walk."""
    absv = [abs(int(row[k])) >> al for k in range(ss_, se_ + 1)]
    eob = -1
    for i, t in enumerate(absv):
        if t == 1:
            eob = i
    run = 0
    br: list[int] = []
    for i, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        while run > 15 and i <= eob:
            c, ln = ac_tab[0xF0]  # ZRL
            wtr.write(c, ln)
            run -= 16
            for b in br:
                wtr.write(b, 1)
            br = []
        if t > 1:  # history coefficient: correction bit only
            br.append(t & 1)
            continue
        c, ln = ac_tab[(run << 4) | 1]
        wtr.write(c, ln)
        wtr.write(0 if int(row[ss_ + i]) < 0 else 1, 1)
        for b in br:
            wtr.write(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        c, ln = ac_tab[0x00]  # EOB (run 1) + its buffered correction bits
        wtr.write(c, ln)
        for b in br:
            wtr.write(b, 1)


def jpeg_encode(
    img: np.ndarray, quality: int = 90, subsample: bool = False,
    restart_interval: int = 0, progressive: bool = False,
) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB → JFIF bytes.
    ``subsample=True`` writes 4:2:0 chroma (2×2 box-average); otherwise
    4:4:4. Annex-K tables scaled by the public quality curve.
    ``progressive=True`` writes SOF2 with the standard libjpeg scan script
    (spectral selection + two successive-approximation levels); the
    quantized coefficients are identical to the baseline encoding, so a
    correct decoder returns pixel-identical output for both modes — the
    tests pin exactly that."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("jpeg_encode expects uint8 (h,w) or (h,w,3)")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("jpeg_encode: empty image")
    ql = _scaled_quant(_QUANT_LUMA, quality)
    qc = _scaled_quant(_QUANT_CHROMA, quality)

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        quants = [ql]
    else:
        rgb = img.astype(np.float64)
        r_, g_, b_ = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
        cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128.0
        cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128.0
        if subsample:
            # pad to even, 2×2 box average
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        quants = [ql, qc, qc]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # pad each plane to its MCU-aligned size (edge replication)
    padded = []
    for pl, (hs, vs) in zip(planes, samp):
        want_h, want_w = mcuy * vs * 8, mcux * hs * 8
        ph, pw = pl.shape
        padded.append(np.pad(
            pl, ((0, want_h - ph), (0, want_w - pw)), mode="edge"
        ))

    dc_tabs = [_encode_tables(*_DC_LUMA)] + (
        [] if gray else [_encode_tables(*_DC_CHROMA)] * 2
    )
    ac_tabs = [_encode_tables(*_AC_LUMA)] + (
        [] if gray else [_encode_tables(*_AC_CHROMA)] * 2
    )

    # pre-block each plane for fast slicing
    blocked = []
    for pl, (hs, vs) in zip(padded, samp):
        bw = mcux * hs
        blocked.append((_to_blocks(pl).reshape(mcuy * vs, bw, 8, 8), hs, vs))

    if not progressive:
        # quantized zigzag coefficients per component, in MCU visit order
        wtr = _BitWriter()
        pred = [0] * len(planes)
        mcu_index = 0
        rst = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_index and (
                    mcu_index % restart_interval == 0
                ):
                    wtr.pad_align()
                    wtr.out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) % 8
                    pred = [0] * len(planes)
                for ci, (blocks, hs, vs) in enumerate(blocked):
                    for by in range(vs):
                        for bx in range(hs):
                            blk = blocks[my * vs + by, mx * hs + bx][np.newaxis]
                            pred[ci] = _encode_blocks(
                                wtr, blk, quants[ci], _C, dc_tabs[ci],
                                ac_tabs[ci], pred[ci],
                            )
                mcu_index += 1
        wtr.pad_align()

    # assemble the stream
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT stores table elements in ZIGZAG order (spec B.2.4.1)
    out += seg(0xDB, bytes([0x00]) + bytes(ql[ZIGZAG].tolist()))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qc[ZIGZAG].tolist()))
    ncomp = 1 if gray else 3
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for ci in range(ncomp):
        hs, vs = samp[ci]
        tq = 0 if ci == 0 else 1
        sof += bytes([ci + 1, (hs << 4) | vs, tq])
    out += seg(0xC2 if progressive else 0xC0, bytes(sof))

    def dht(tc, th, spec):
        bits, vals = spec
        return seg(0xC4, bytes([(tc << 4) | th] + bits + vals))

    out += dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
    if not gray:
        out += dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    if not progressive:
        sos = bytearray([ncomp])
        for ci in range(ncomp):
            td = ta = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (td << 4) | ta])
        sos += bytes([0, 63, 0])
        out += seg(0xDA, bytes(sos))
        out += wtr.out
        out += b"\xff\xd9"
        return bytes(out)

    # --- progressive: quantized coefficient stacks + the scan script -----
    qzs = []
    geom_map = {}
    for ci, ((blocks4d, hs, vs), q) in enumerate(zip(blocked, quants)):
        bs = blocks4d.reshape(-1, 8, 8)
        f = np.einsum("ur,nrc,vc->nuv", _C, bs - 128.0, _C)
        zz = f.reshape(-1, 64)[:, ZIGZAG]
        qzs.append(np.rint(zz / q[ZIGZAG]).astype(np.int64))
        cw = -(-(w * hs) // hmax)
        ch = -(-(h * vs) // vmax)
        geom_map[ci] = (hs, vs, mcux * hs, -(-cw // 8), -(-ch // 8))

    # the standard libjpeg scan script (jcparam.c): DC first at Al=1, luma
    # AC split 1-5 / 6-63 at Al=2, refinements down to Al=0
    if gray:
        script = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    else:
        script = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2), ([2], 1, 63, 0, 1), ([1], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2), ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([2], 1, 63, 1, 0), ([1], 1, 63, 1, 0), ([0], 1, 63, 1, 0),
        ]

    for scan_ci, ss_, se_, ah, al in script:
        sos = bytearray([len(scan_ci)])
        for ci in scan_ci:
            td = ta = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (td << 4) | ta])
        sos += bytes([ss_, se_, (ah << 4) | al])
        out += seg(0xDA, bytes(sos))

        wtr = _BitWriter()
        pred = {ci: 0 for ci in scan_ci}
        rst = 0
        for ui, unit in enumerate(
            _scan_units(scan_ci, geom_map, mcux, mcuy)
        ):
            if restart_interval and ui and ui % restart_interval == 0:
                wtr.pad_align()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = {ci: 0 for ci in pred}
            for ci, bi in unit:
                row = qzs[ci][bi]
                if ss_ == 0:
                    if ah == 0:
                        pred[ci] = _enc_dc_first(
                            wtr, row[0], al, pred[ci], dc_tabs[ci]
                        )
                    else:
                        wtr.write((int(row[0]) >> al) & 1, 1)
                elif ah == 0:
                    _enc_ac_first(wtr, row, ss_, se_, al, ac_tabs[ci])
                else:
                    _enc_ac_refine(wtr, row, ss_, se_, al, ac_tabs[ci])
        wtr.pad_align()
        out += wtr.out

    out += b"\xff\xd9"
    return bytes(out)
