"""Pure-numpy raster kernels for the scanned-page branch + a stdlib PNG codec.

The reference's image preprocessing (preprocess_image, ocr.py:10-43 and
ocr2.py:77-125) is a fixed cascade of four published algorithms:

    grayscale → CLAHE(clip 3.0 or 2.0, 8×8 tiles) → non-local-means
    denoise(h=10) → Otsu threshold (ocr.py) / adaptive Gaussian threshold
    (ocr2.py, block 11, C 2, inverted) → conditional bicubic upscale to
    height 2000

Those kernels were previously reachable only through cv2, which is absent
from this container — leaving the raster dataflow stubbed. Every one of
them is a published algorithm with a public specification, so this module
implements them on numpy directly:

* **CLAHE** — Zuiderveld 1994 ("Contrast Limited Adaptive Histogram
  Equalization", Graphics Gems IV), with OpenCV's concrete choices
  replicated from its public source: reflect-101 padding to a tile-grid
  multiple, integer clip limit ``max(int(clip*tileArea/256), 1)``, the
  two-phase excess redistribution (uniform batch + residual stepping),
  per-tile LUT ``round(cdf * 255/tileArea)``, and bilinear interpolation
  of the four surrounding tile LUTs with edge clamping.
* **Non-local means** — Buades, Coll, Morel 2005, the classic formulation
  with σ=0: patch distance = mean squared difference over the template
  window, weight = exp(−d²/h²), reflect-101 borders, 7×7 template / 21×21
  search defaults (the cv2 defaults the reference relies on). Vectorized
  over search offsets: each offset is one whole-image shifted SSD +
  box-filter pass — O(search² · pixels), no per-pixel Python.
* **Otsu** — exhaustive between-class-variance argmax (first maximum on
  ties, matching OpenCV's strict-greater scan); binarization is
  ``pixel > t → 255``.
* **Adaptive Gaussian threshold** — per-pixel mean under a Gaussian kernel
  (σ = 0.3·((ksize−1)/2 − 1) + 0.8, OpenCV's documented formula for
  unspecified sigma), inverted binary: ``pixel > mean − C → 0 else 255``.
* **Bicubic resize** — the Keys kernel with a = −0.75 (OpenCV's
  INTER_CUBIC constant), half-pixel-center source mapping
  ``src = (dst + 0.5)·scale − 0.5``, separable 4-tap passes, edge-clamped
  taps, round-half-even to uint8.
* **BT.601 grayscale** — OpenCV's exact fixed-point form:
  ``(4899·R + 9617·G + 1868·B + 8192) >> 14``.

Determinism contract: these numpy kernels are the engine's CANONICAL
implementations — identical bytes on every platform, no import-dependent
behavior switches (a cv2-if-available branch would make corpus output
depend on executor image contents). cv2 remains only where a real codec is
genuinely required (JPEG/TIFF decode, multimodal.decode_image's seam).
Numerical caveat vs cv2: interpolation here is float64 + round-half-even
where recent OpenCV uses per-kernel fixed-point; outputs may differ by ±1
gray level in interpolated positions. The algorithms, parameters, and
composition order are the reference's; the tests pin this module against
independent per-pixel spec twins and committed goldens, not against cv2.

PNG codec (``png_encode`` / ``png_decode``): RFC 2083 / ISO 15948 using
only stdlib ``zlib`` + ``struct`` — 8-bit gray / gray+alpha / RGB / RGBA /
palette, non-interlaced, all five row filters on decode. This makes the
image-decode seam executable on REAL image bytes in-sandbox (PNG is the
one raster format whose decode is pure zlib); JPEG stays behind the cv2
seam (SEAMS.md #1).

Scale shape: everything here is per-image worker-side compute inside the
existing Arrow-batched ``mapInPandas`` stages (operators/multimodal.py) —
no shuffle, no driver involvement; cost is O(pixels) per image except NLM's
documented O(search²·pixels).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG codec (stdlib zlib only)

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §6.6), vectorized over a row."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa = np.abs(p - a16)
    pb = np.abs(p - b16)
    pc = np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array: (h, w) for grayscale/palette-gray output
    channels collapsed below, (h, w, ch) otherwise.

    Supports the web-corpus common case: bit depth 8, color types
    0/2/3/4/6, non-interlaced. Raises ValueError on anything else (the
    callers' per-row quarantine path) — never returns None (decode_image
    seam contract)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = []
    palette = None
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("PNG: truncated chunk")
        pos += 12 + length  # length + type + payload + CRC (CRC not verified)
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"PNG: unsupported bit depth {bit_depth}")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"PNG: unsupported color type {color_type}")
    if interlace != 0:
        raise ValueError("PNG: interlaced images unsupported")
    if not idat:
        raise ValueError("PNG: no IDAT data")
    raw = zlib.decompress(b"".join(idat))
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG: IDAT size mismatch")

    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if f == 0:  # None
            pass
        elif f == 2:  # Up
            row += prev
        elif f == 3:  # Average — a-term is sequential in x per spec
            up = prev.astype(np.uint16)
            for x in range(stride):
                left = int(row[x - ch]) if x >= ch else 0
                row[x] = (int(row[x]) + ((left + int(up[x])) >> 1)) & 0xFF
        elif f == 1:  # Sub — sequential in x
            for x in range(ch, stride):
                row[x] = (int(row[x]) + int(row[x - ch])) & 0xFF
        elif f == 4:  # Paeth — sequential in x
            for x in range(stride):
                a = int(row[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG: bad filter type {f}")
        out[y] = row
        prev = row

    if color_type == 0:
        return out
    img = out.reshape(height, width, ch)
    if color_type == 3:
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        return palette[img[:, :, 0]]
    return img


def png_encode(img: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB array → PNG bytes.

    Deterministic: fixed zlib level 6, one IDAT chunk, the same row filter
    throughout (``filter_type`` 0/1/2/3/4 — non-zero values exist so tests
    can exercise every decode unfilter path)."""
    if img.dtype != np.uint8:
        raise ValueError("png_encode expects uint8")
    if img.ndim == 2:
        color_type, ch = 0, 1
        h, w = img.shape
        flat = img
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, ch = 2, 3
        h, w = img.shape[:2]
        flat = img.reshape(h, w * 3)
    else:
        raise ValueError("png_encode supports (h,w) gray or (h,w,3) RGB")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"bad filter type {filter_type}")

    stride = w * ch
    rows = []
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row = flat[y]
        left = np.zeros(stride, dtype=np.uint8)
        left[ch:] = row[:-ch]
        upleft = np.zeros(stride, dtype=np.uint8)
        upleft[ch:] = prev[:-ch]
        if filter_type == 0:
            enc = row
        elif filter_type == 1:
            enc = row - left
        elif filter_type == 2:
            enc = row - prev
        elif filter_type == 3:
            enc = row - (
                (left.astype(np.uint16) + prev.astype(np.uint16)) >> 1
            ).astype(np.uint8)
        else:
            enc = row - _paeth(left, prev, upleft)
        rows.append(bytes([filter_type]) + enc.tobytes())
        prev = row

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(rows), 6)
    return (
        PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def bt601_gray(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3+) uint8 RGB(A) → (h, w) uint8 luma, OpenCV's exact
    fixed-point BT.601 form: (4899·R + 9617·G + 1868·B + 2^13) >> 14 —
    so a real-cluster cv2 decode and this path agree bit-for-bit on the
    grayscale conversion. Alpha (if present) is ignored, matching
    IMREAD_GRAYSCALE."""
    r = rgb[:, :, 0].astype(np.uint32)
    g = rgb[:, :, 1].astype(np.uint32)
    b = rgb[:, :, 2].astype(np.uint32)
    return ((4899 * r + 9617 * g + 1868 * b + (1 << 13)) >> 14).astype(np.uint8)


def png_decode_gray(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w) uint8 grayscale (the decode_image seam shape):
    gray/gray+alpha pass through (alpha dropped), color goes through
    :func:`bt601_gray`."""
    img = png_decode(data)
    if img.ndim == 2:
        return img
    if img.shape[2] == 2:  # gray + alpha
        return np.ascontiguousarray(img[:, :, 0])
    return bt601_gray(img)


# ---------------------------------------------------------------------------
# P4: Otsu threshold

def otsu_threshold(img: np.ndarray) -> int:
    """Otsu's threshold over a uint8 image: the t maximizing between-class
    variance with class 0 = pixels ≤ t (first maximum on ties — OpenCV's
    strict-greater scan keeps the earliest maximizer)."""
    hist = np.bincount(img.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        raise ValueError("otsu_threshold: empty image")
    idx = np.arange(256, dtype=np.float64)
    w0 = np.cumsum(hist)
    w1 = total - w0
    cum_mean = np.cumsum(hist * idx)
    grand = cum_mean[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        m0 = cum_mean / w0
        m1 = (grand - cum_mean) / w1
        sigma = w0 * w1 * (m0 - m1) ** 2
    sigma[~np.isfinite(sigma)] = -1.0
    return int(np.argmax(sigma))  # argmax returns the FIRST maximum


def binarize_otsu(img: np.ndarray) -> tuple[int, np.ndarray]:
    """(threshold, binary) — binary = 255 where pixel > t else 0 (the
    THRESH_BINARY+THRESH_OTSU semantics of ocr.py:33)."""
    t = otsu_threshold(img)
    return t, np.where(img > t, 255, 0).astype(np.uint8)


# ---------------------------------------------------------------------------
# P2: CLAHE

def clahe(
    img: np.ndarray, clip_limit: float = 3.0, grid: tuple[int, int] = (8, 8)
) -> np.ndarray:
    """Contrast-limited adaptive histogram equalization (Zuiderveld 1994)
    with OpenCV's concrete integer choices — see module docstring. uint8
    in, uint8 out, same shape."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("clahe expects a 2-D uint8 image")
    tiles_y, tiles_x = grid
    h, w = img.shape
    if h < tiles_y or w < tiles_x:
        raise ValueError("clahe: image smaller than the tile grid")
    # pad bottom/right to a grid multiple with reflect-101 (OpenCV's
    # copyMakeBorder BORDER_REFLECT_101 default)
    pad_y = (-h) % tiles_y
    pad_x = (-w) % tiles_x
    padded = np.pad(img, ((0, pad_y), (0, pad_x)), mode="reflect") if (
        pad_y or pad_x
    ) else img
    ph, pw = padded.shape
    tile_h, tile_w = ph // tiles_y, pw // tiles_x
    tile_area = tile_h * tile_w
    clip = max(int(clip_limit * tile_area / 256.0), 1)

    # per-tile histograms: reshape to (tiles_y, tile_h, tiles_x, tile_w)
    t = padded.reshape(tiles_y, tile_h, tiles_x, tile_w)
    hists = np.zeros((tiles_y, tiles_x, 256), dtype=np.int64)
    for ty in range(tiles_y):
        for tx in range(tiles_x):
            hists[ty, tx] = np.bincount(
                t[ty, :, tx, :].ravel(), minlength=256
            )

    # clip + redistribute (OpenCV's two-phase scheme: uniform batch, then
    # +1 to every residualStep-th bin until the excess is gone)
    luts = np.empty((tiles_y, tiles_x, 256), dtype=np.uint8)
    scale = 255.0 / tile_area
    for ty in range(tiles_y):
        for tx in range(tiles_x):
            hist = hists[ty, tx]
            excess = int(np.maximum(hist - clip, 0).sum())
            clipped = np.minimum(hist, clip)
            if excess:
                batch = excess // 256
                residual = excess - batch * 256
                clipped = clipped + batch
                if residual:
                    step = max(256 // residual, 1)
                    bins = np.arange(0, 256, step)[:residual]
                    clipped[bins] += 1
            cdf = np.cumsum(clipped)
            # round-half-even like cvRound; saturate to uint8
            luts[ty, tx] = np.clip(np.rint(cdf * scale), 0, 255).astype(
                np.uint8
            )

    # bilinear interpolation of the 4 surrounding tile LUTs, evaluated on
    # the ORIGINAL (unpadded) pixel grid with tile-index clamping at edges
    ys = np.arange(h, dtype=np.float64)
    xs = np.arange(w, dtype=np.float64)
    tyf = (ys + 0.5) / tile_h - 0.5
    txf = (xs + 0.5) / tile_w - 0.5
    ty1 = np.floor(tyf).astype(np.int64)
    tx1 = np.floor(txf).astype(np.int64)
    ya = (tyf - ty1)[:, None]
    xa = (txf - tx1)[None, :]
    ty2 = np.clip(ty1 + 1, 0, tiles_y - 1)
    tx2 = np.clip(tx1 + 1, 0, tiles_x - 1)
    ty1 = np.clip(ty1, 0, tiles_y - 1)
    tx1 = np.clip(tx1, 0, tiles_x - 1)

    src = img[:h, :w]
    ty1c = ty1[:, None]
    ty2c = ty2[:, None]
    tx1c = tx1[None, :]
    tx2c = tx2[None, :]
    v11 = luts[ty1c, tx1c, src].astype(np.float64)
    v12 = luts[ty1c, tx2c, src].astype(np.float64)
    v21 = luts[ty2c, tx1c, src].astype(np.float64)
    v22 = luts[ty2c, tx2c, src].astype(np.float64)
    out = (
        v11 * (1 - ya) * (1 - xa)
        + v12 * (1 - ya) * xa
        + v21 * ya * (1 - xa)
        + v22 * ya * xa
    )
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# P3: non-local means denoise

def nl_means_denoise(
    img: np.ndarray,
    h: float = 10.0,
    template_size: int = 7,
    search_size: int = 21,
) -> np.ndarray:
    """Non-local means (Buades et al. 2005, σ=0 weights): each pixel is the
    weighted mean of same-patch-looking pixels in its search window,
    w = exp(−‖patch−patch'‖²_mean / h²). Defaults are the cv2
    fastNlMeansDenoising sizes the reference uses (7×7 template, 21×21
    search, h=10 — ocr.py:30). Vectorized per search offset; reflect-101
    borders. Cost: O(search² · pixels) — the documented heavy kernel; on a
    real cluster swap in cv2's LUT-accelerated variant if profiling says so
    (same parameters, slightly different weight table)."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("nl_means_denoise expects a 2-D uint8 image")
    if template_size % 2 == 0 or search_size % 2 == 0:
        raise ValueError("window sizes must be odd")
    th = template_size // 2
    sh = search_size // 2
    pad = th + sh
    fimg = img.astype(np.float64)
    p = np.pad(fimg, pad, mode="reflect")
    hgt, wid = img.shape
    inv_h2 = 1.0 / (h * h)
    tpl_area = float(template_size * template_size)

    wsum = np.zeros((hgt, wid), dtype=np.float64)
    acc = np.zeros((hgt, wid), dtype=np.float64)
    # box-filter via 2-D cumulative sums: ssd window sums in O(pixels)
    for dy in range(-sh, sh + 1):
        for dx in range(-sh, sh + 1):
            # shifted full padded plane, aligned so index (i,j) of `diff`
            # is centered at image pixel (i-th-pad ... ) — we keep the
            # template margin around the image region
            a = p[pad - th:pad + hgt + th, pad - th:pad + wid + th]
            b = p[pad - th + dy:pad + hgt + th + dy,
                  pad - th + dx:pad + wid + th + dx]
            d2 = (a - b) ** 2
            # integral image over the template window
            ii = np.cumsum(np.cumsum(d2, axis=0), axis=1)
            ii = np.pad(ii, ((1, 0), (1, 0)))
            t = template_size
            ssd = (
                ii[t:, t:] - ii[:-t, t:] - ii[t:, :-t] + ii[:-t, :-t]
            )  # (hgt, wid): template-window SSD centered per pixel
            wgt = np.exp(-(ssd / tpl_area) * inv_h2)
            ctr = p[pad + dy:pad + hgt + dy, pad + dx:pad + wid + dx]
            wsum += wgt
            acc += wgt * ctr
    return np.clip(np.rint(acc / wsum), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# P6: bicubic resize

def _cubic_weights(frac: np.ndarray, a: float = -0.75) -> np.ndarray:
    """4-tap Keys cubic kernel weights for per-output fractional offsets;
    a = −0.75 is OpenCV's INTER_CUBIC constant. Returns (n, 4)."""
    t0 = 1.0 + frac  # distance to tap at floor-1
    t1 = frac        # floor
    t2 = 1.0 - frac  # floor+1
    t3 = 2.0 - frac  # floor+2

    def near(t):  # |t| <= 1
        return ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0

    def far(t):  # 1 < |t| < 2
        return ((a * t - 5.0 * a) * t + 8.0 * a) * t - 4.0 * a

    return np.stack([far(t0), near(t1), near(t2), far(t3)], axis=1)


def _resize_cubic_axis(img: np.ndarray, out_len: int, axis: int) -> np.ndarray:
    n = img.shape[axis]
    scale = n / out_len
    xs = (np.arange(out_len, dtype=np.float64) + 0.5) * scale - 0.5
    ix = np.floor(xs).astype(np.int64)
    frac = xs - ix
    w = _cubic_weights(frac)  # (out_len, 4)
    taps = np.clip(
        ix[:, None] + np.arange(-1, 3)[None, :], 0, n - 1
    )  # (out_len, 4), edge-clamped (BORDER_REPLICATE semantics)
    moved = np.moveaxis(img, axis, 0)  # (n, ...)
    gathered = moved[taps]  # (out_len, 4, ...)
    out = np.einsum("ot,ot...->o...", w, gathered)
    return np.moveaxis(out, 0, axis)


def resize_cubic(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Bicubic (a=−0.75) resize of a 2-D uint8 image to (out_h, out_w):
    half-pixel-center mapping, separable 4-tap passes in float64,
    edge-clamped taps, round-half-even back to uint8 — the INTER_CUBIC
    recipe of ocr.py:40."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("resize_cubic expects a 2-D uint8 image")
    if out_w < 1 or out_h < 1:
        raise ValueError("output size must be >= 1")
    f = img.astype(np.float64)
    f = _resize_cubic_axis(f, out_h, axis=0)
    f = _resize_cubic_axis(f, out_w, axis=1)
    return np.clip(np.rint(f), 0, 255).astype(np.uint8)


def conditional_upscale(
    img: np.ndarray, target_height: int = 2000
) -> np.ndarray:
    """ocr.py:36-41's rule verbatim: if height < target, bicubic-upscale by
    scale = target/height (width rounded via int(), matching the
    reference's ``int(width * scale_factor)``); otherwise unchanged."""
    h, w = img.shape
    if h >= target_height:
        return img
    scale = target_height / h
    return resize_cubic(img, int(w * scale), target_height)


# ---------------------------------------------------------------------------
# P4 variant: adaptive Gaussian threshold (ocr2.py:107's second class)

def adaptive_threshold_gaussian(
    img: np.ndarray, block_size: int = 11, c: float = 2.0
) -> np.ndarray:
    """Inverted adaptive threshold: 255 where pixel ≤ (Gaussian-window
    mean − c), else 0 — ADAPTIVE_THRESH_GAUSSIAN_C + THRESH_BINARY_INV
    with OpenCV's sigma-from-ksize formula (module docstring), replicate
    borders, the per-pixel mean rounded half-even before the compare."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("adaptive_threshold_gaussian expects 2-D uint8")
    if block_size % 2 == 0 or block_size < 3:
        raise ValueError("block_size must be odd and >= 3")
    sigma = 0.3 * ((block_size - 1) * 0.5 - 1.0) + 0.8
    r = block_size // 2
    x = np.arange(block_size, dtype=np.float64) - r
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    k /= k.sum()
    p = np.pad(img.astype(np.float64), r, mode="edge")
    # separable Gaussian mean
    m = np.apply_along_axis(lambda row: np.convolve(row, k, mode="valid"), 1, p)
    m = np.apply_along_axis(lambda col: np.convolve(col, k, mode="valid"), 0, m)
    mean = np.rint(m)
    return np.where(img.astype(np.float64) > mean - c, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# the composed reference cascade

def preprocess_page(
    gray: np.ndarray,
    *,
    clip_limit: float = 3.0,
    denoise_h: float = 10.0,
    threshold: str = "otsu",
    target_height: int = 2000,
    denoise: bool = True,
) -> np.ndarray:
    """The reference's full preprocessing cascade over an already-grayscale
    page (preprocess_image, ocr.py:10-43): CLAHE → NLM denoise → threshold
    → conditional upscale. ``threshold='otsu'`` is ocr.py's variant;
    ``'adaptive'`` is ocr2.py:107-113's (Gaussian block 11, C 2, inverted).
    ``clip_limit`` defaults to ocr.py's 3.0; pass 2.0 for ocr2.py:93's
    variant — the two reference files disagree (SURVEY §2 P2) and the
    engine pins the choice per call instead of per import."""
    if threshold not in ("otsu", "adaptive"):
        raise ValueError(f"unknown threshold mode {threshold!r}")
    img = clahe(gray, clip_limit=clip_limit)
    if denoise:
        img = nl_means_denoise(img, h=denoise_h)
    if threshold == "otsu":
        _, img = binarize_otsu(img)
    else:
        img = adaptive_threshold_gaussian(img)
    return conditional_upscale(img, target_height=target_height)


# ---------------------------------------------------------------------------
# TIFF codec (baseline subset: uncompressed 8-bit, the scanner default)

_TIFF_II = b"II*\x00"
_TIFF_MM = b"MM\x00*"


def _packbits_decode(buf: bytes, max_out: int | None = None) -> bytes:
    """Apple PackBits run-length decode (TIFF 6.0 §9). ``max_out`` bounds
    the decoded size (decompression-bomb guard for untrusted crawl bytes —
    output must never exceed what the image header promises)."""
    out = bytearray()
    i = 0
    n = len(buf)
    while i < n:
        b = buf[i]
        i += 1
        if b < 128:  # literal run of b+1 bytes
            j = i + b + 1
            if j > n:
                raise ValueError("TIFF: PackBits literal overruns strip")
            out += buf[i:j]
            i = j
        elif b > 128:  # repeat next byte 257-b times
            if i >= n:
                raise ValueError("TIFF: PackBits repeat overruns strip")
            out += bytes([buf[i]]) * (257 - b)
            i += 1
        # b == 128: no-op
        if max_out is not None and len(out) > max_out:
            raise ValueError("TIFF: PackBits strip exceeds image size")
    return bytes(out)


def _lzw_decode(buf: bytes, max_out: int | None = None) -> bytes:
    """TIFF 6.0 §13 LZW decode: MSB-first variable-width codes starting at
    9 bits, ClearCode 256 / EOI 257, and the spec's sample-code width
    schedule — codes widen when the table reaches 2^width − 1 entries (the
    'early change' every mainstream writer, libtiff included, uses).
    ``max_out`` bounds the decoded size (decompression-bomb guard)."""
    out = bytearray()
    acc = 0
    accbits = 0
    pos = 0
    n = len(buf)
    width = 9
    table: list[bytes] = []
    prev = b""
    have_prev = False

    while True:
        while accbits < width:
            if pos >= n:
                if have_prev or table:
                    return bytes(out)  # tolerated: missing EOI at strip end
                raise ValueError("TIFF: LZW strip truncated")
            acc = (acc << 8) | buf[pos]
            pos += 1
            accbits += 8
        accbits -= width
        code = (acc >> accbits) & ((1 << width) - 1)
        if code == 256:  # Clear
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            have_prev = False
            continue
        if code == 257:  # EndOfInformation
            return bytes(out)
        if not table:
            raise ValueError("TIFF: LZW code before Clear")
        if not have_prev:
            if code >= len(table):
                raise ValueError("TIFF: bad first LZW code")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError("TIFF: LZW code out of range")
            table.append(prev + entry[:1])
        out += entry
        if max_out is not None and len(out) > max_out:
            raise ValueError("TIFF: LZW strip exceeds image size")
        prev = entry
        have_prev = True
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1


def _undo_predictor2(raw: bytes, width: int, spp: int) -> bytes:
    """Predictor=2 (horizontal differencing, TIFF 6.0 §14): rows store
    per-channel deltas; integrate along the row modulo 256."""
    arr = np.frombuffer(raw, dtype=np.uint8)
    rows = len(arr) // (width * spp)
    if rows * width * spp != len(arr):
        raise ValueError("TIFF: predictor data not row-aligned")
    a = arr.reshape(rows, width, spp).astype(np.int64)
    return (a.cumsum(axis=1) % 256).astype(np.uint8).tobytes()


_TIFF_MAX_PIXELS = 1 << 26  # 67 MP — past any sane scan (600dpi A4 ≈ 35 MP)


def tiff_decode(data: bytes) -> np.ndarray:
    """TIFF 6.0 decode: 8-bit grayscale (PhotometricInterpretation 0/1) or
    RGB (2), strip OR tile layout (§15), first IFD only — the scanner
    subset of the reference's ``.tiff`` glob (ocr2.py:569). Compressions:
    none (1), LZW (5, early-change per the spec's sample code), Deflate
    (8 / legacy 32946), PackBits (32773), new-style JPEG (7, per TTN2 —
    per-strip/tile abbreviated streams spliced with the shared JPEGTables
    tag 347 and decoded by extract/jpeg.py); Predictor 2 (horizontal
    differencing) honored in both layouts for the lossless codecs.
    Old-style JPEG (6), G3/G4 fax, and planar (PlanarConfiguration=2)
    files raise ValueError (quarantine/cv2-seam path). Returns (h, w) or
    (h, w, 3) uint8."""
    if data[:4] == _TIFF_II:
        en = "<"
    elif data[:4] == _TIFF_MM:
        en = ">"
    else:
        raise ValueError("not a TIFF: bad signature")

    def u16(off):
        return struct.unpack_from(en + "H", data, off)[0]

    def u32(off):
        return struct.unpack_from(en + "I", data, off)[0]

    ifd = u32(4)
    if ifd + 2 > len(data):
        raise ValueError("TIFF: truncated IFD offset")
    n_entries = u16(ifd)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n_entries):
        e = ifd + 2 + 12 * i
        if e + 12 > len(data):
            raise ValueError("TIFF: truncated IFD")
        tags[u16(e)] = (u16(e + 2), u32(e + 4), e + 8)  # (type, count, value-slot)

    _SIZES = {1: 1, 2: 1, 3: 2, 4: 4}

    def values(tag, default=None):
        if tag not in tags:
            if default is None:
                raise ValueError(f"TIFF: missing tag {tag}")
            return default
        typ, count, slot = tags[tag]
        size = _SIZES.get(typ)
        if size is None:
            raise ValueError(f"TIFF: unsupported type {typ} for tag {tag}")
        total = size * count
        off = slot if total <= 4 else u32(slot)
        if off + total > len(data):
            raise ValueError("TIFF: value out of bounds")
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
        return list(struct.unpack_from(en + fmt * count, data, off))

    width = values(256)[0]
    height = values(257)[0]
    if width * height > _TIFF_MAX_PIXELS:
        raise ValueError("TIFF: image dimensions exceed decode cap")
    compression = values(259, [1])[0]
    if compression == 6:
        # TIFF 6.0 §22 old-style JPEG: officially deprecated by TTN2, no
        # two writers agree on it — refuse rather than guess.
        raise ValueError("TIFF: old-style JPEG (compression 6) unsupported")
    if compression not in (1, 5, 7, 8, 32946, 32773):
        raise ValueError(f"TIFF: compression {compression} unsupported")
    predictor = values(317, [1])[0]
    if predictor not in (1, 2) or (compression == 7 and predictor != 1):
        raise ValueError(f"TIFF: predictor {predictor} unsupported")
    if values(284, [1])[0] != 1:  # PlanarConfiguration: chunky only
        raise ValueError("TIFF: planar configuration unsupported")
    photometric = values(262, [1])[0]
    spp = values(277, [1])[0]
    bps = values(258, [8] * spp)
    if any(b != 8 for b in bps):
        raise ValueError(f"TIFF: bits-per-sample {bps} unsupported (8 only)")
    allowed_photo = (0, 1, 2, 6) if compression == 7 else (0, 1, 2)
    if photometric not in allowed_photo or spp not in (1, 3):
        raise ValueError(
            f"TIFF: photometric {photometric}/spp {spp} unsupported"
        )

    jpeg_tables: bytes | None = None
    if compression == 7 and 347 in tags:
        # JPEGTables (TTN2): an abbreviated SOI…tables…EOI stream whose
        # DQT/DHT segments apply to every strip/tile stream in the file.
        typ, count, slot = tags[347]
        if typ != 7:  # UNDEFINED
            raise ValueError("TIFF: JPEGTables must be type UNDEFINED")
        toff = slot if count <= 4 else u32(slot)
        if toff + count > len(data):
            raise ValueError("TIFF: JPEGTables out of bounds")
        jpeg_tables = bytes(data[toff:toff + count])
        if (len(jpeg_tables) < 4 or jpeg_tables[:2] != b"\xff\xd8"
                or jpeg_tables[-2:] != b"\xff\xd9"):
            raise ValueError("TIFF: malformed JPEGTables stream")

    def decode_jpeg_chunk(chunk: bytes, max_h: int, max_w: int) -> np.ndarray:
        """One compression-7 strip/tile: splice shared JPEGTables (if any)
        after the chunk's SOI, decode, and bound the result by the layout
        slot the header promised (bomb guard — the JPEG stream's own SOF
        dims could otherwise claim anything). Returns (h, w, spp) uint8."""
        from final_ocr_spark.extract.jpeg import jpeg_decode

        if chunk[:2] != b"\xff\xd8":
            raise ValueError("TIFF: JPEG strip/tile missing SOI")
        if jpeg_tables is not None:
            chunk = jpeg_tables[:-2] + chunk[2:]
        # Pre-walk to the SOF and check its dims BEFORE jpeg_decode
        # allocates plane storage — a 200-byte chunk claiming 65535×65535
        # must raise here, not OOM an executor.
        p = 2
        while p + 4 <= len(chunk):
            if chunk[p] != 0xFF:
                break  # malformed — let jpeg_decode raise the real error
            m = chunk[p + 1]
            if m in (0x01,) or 0xD0 <= m <= 0xD8:
                p += 2
                continue
            if m == 0xDA:
                break
            seglen = struct.unpack_from(">H", chunk, p + 2)[0]
            if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
                if p + 9 > len(chunk):
                    break
                sh, sw = struct.unpack_from(">HH", chunk, p + 5)
                if sh > max_h or sw > max_w:
                    raise ValueError(
                        "TIFF: JPEG chunk larger than its layout slot")
                break
            p += 2 + seglen
        tile = jpeg_decode(bytes(chunk))
        tspp = 1 if tile.ndim == 2 else tile.shape[2]
        if tspp != spp:
            raise ValueError(
                f"TIFF: JPEG stream has {tspp} components, header says {spp}")
        th, tw = tile.shape[:2]
        if th > max_h or tw > max_w:
            raise ValueError("TIFF: JPEG chunk larger than its layout slot")
        return tile.reshape(th, tw, spp)

    def decompress(chunk: bytes, max_out: int) -> bytes:
        """One strip/tile — decoded size hard-bounded so a crafted chunk
        cannot expand past what the header promises (untrusted crawl
        bytes decode inside executor workers — bombs must raise, not OOM)."""
        if compression == 1:
            # tolerated: padded final strip from sloppy writers
            return bytes(chunk[:max_out])
        if compression == 32773:
            return _packbits_decode(chunk, max_out=max_out)
        if compression == 5:
            return _lzw_decode(chunk, max_out=max_out)
        d = zlib.decompressobj()  # 8 / 32946: zlib-wrapped Deflate
        try:
            dec = d.decompress(chunk, max_out)
        except zlib.error as exc:
            raise ValueError(f"TIFF: bad deflate strip: {exc}") from None
        if d.unconsumed_tail and d.decompress(d.unconsumed_tail, 1):
            raise ValueError("TIFF: deflate strip exceeds image size")
        return dec

    need = width * height * spp

    if 322 in tags or 324 in tags:  # tile layout (TIFF 6.0 §15)
        tile_w = values(322)[0]
        tile_h = values(323)[0]
        if tile_w <= 0 or tile_h <= 0:
            raise ValueError("TIFF: bad tile dimensions")
        offsets = values(324)
        counts = values(325)
        across = -(-width // tile_w)
        down = -(-height // tile_h)
        if len(offsets) != len(counts) or len(offsets) != across * down:
            raise ValueError("TIFF: tile count mismatch")
        tile_bytes = tile_w * tile_h * spp
        img = np.zeros((height, width, spp), dtype=np.uint8)
        for idx, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(data):
                raise ValueError("TIFF: tile out of bounds")
            if compression == 7:
                tile = decode_jpeg_chunk(data[off:off + cnt], tile_h, tile_w)
                if tile.shape[:2] != (tile_h, tile_w):
                    # TIFF 6.0 §15: tiles (edge tiles included) are always
                    # encoded at full tile size
                    raise ValueError("TIFF: JPEG tile dimensions mismatch")
            else:
                dec = decompress(data[off:off + cnt], tile_bytes)
                if predictor == 2:
                    dec = _undo_predictor2(dec, tile_w, spp)
                if len(dec) < tile_bytes:
                    raise ValueError("TIFF: tile data short")
                tile = np.frombuffer(dec, dtype=np.uint8).reshape(
                    tile_h, tile_w, spp)
            ty, tx = divmod(idx, across)
            y0, x0 = ty * tile_h, tx * tile_w
            y1, x1 = min(y0 + tile_h, height), min(x0 + tile_w, width)
            img[y0:y1, x0:x1] = tile[: y1 - y0, : x1 - x0]
        arr = img.reshape(-1)
    else:  # strip layout
        offsets = values(273)
        counts = values(279)
        if len(offsets) != len(counts):
            raise ValueError("TIFF: strip offsets/counts mismatch")
        # Per-strip bound: rows-per-strip (tag 278; writers may use
        # 2^32-1 for "one strip") worth of rows.
        rows_per_strip = min(values(278, [height])[0], height)
        if compression == 7:
            parts: list[np.ndarray] = []
            remaining = height
            for off, cnt in zip(offsets, counts):
                if off + cnt > len(data):
                    raise ValueError("TIFF: strip out of bounds")
                if remaining <= 0:
                    raise ValueError("TIFF: pixel data overlong")
                expected = min(rows_per_strip, remaining)
                strip = decode_jpeg_chunk(
                    data[off:off + cnt], rows_per_strip, width)
                # sloppy writers pad the final strip to full height;
                # tolerate >= expected and crop, like the raw-strip path
                if strip.shape[1] != width or strip.shape[0] < expected:
                    raise ValueError("TIFF: JPEG strip dimensions mismatch")
                parts.append(strip[:expected])
                remaining -= expected
            if remaining > 0:
                raise ValueError("TIFF: pixel data short")
            arr = np.concatenate(parts, axis=0).reshape(-1)
        else:
            strip_max = rows_per_strip * width * spp
            buf = bytearray()
            for off, cnt in zip(offsets, counts):
                if off + cnt > len(data):
                    raise ValueError("TIFF: strip out of bounds")
                dec = decompress(data[off:off + cnt], strip_max)
                if predictor == 2:
                    dec = _undo_predictor2(dec, width, spp)
                buf += dec
                if len(buf) > need + strip_max:
                    raise ValueError("TIFF: pixel data overlong")
            if len(buf) < need:
                raise ValueError("TIFF: pixel data short")
            arr = np.frombuffer(bytes(buf[:need]), dtype=np.uint8)

    if spp == 1:
        img = arr.reshape(height, width)
        if photometric == 0:  # WhiteIsZero: invert to the usual polarity
            img = (255 - img.astype(np.int16)).astype(np.uint8)
        return img
    return arr.reshape(height, width, 3)


def _packbits_encode(raw: bytes) -> bytes:
    """PackBits run-length encode (TIFF 6.0 §9 writer convention)."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        j = i
        while j + 1 < n and raw[j + 1] == raw[i] and j - i < 127:
            j += 1
        runlen = j - i + 1
        if runlen >= 2:
            out += bytes([257 - runlen, raw[i]])
            i = j + 1
        else:
            k = i
            while k < n and k - i < 128:
                if k + 2 < n and raw[k] == raw[k + 1] == raw[k + 2]:
                    break
                k += 1
            out += bytes([k - i - 1]) + raw[i:k]
            i = k
    return bytes(out)


def _lzw_encode(raw: bytes) -> bytes:
    """TIFF LZW encode, width schedule symmetric with ``_lzw_decode``
    (early change; Clear emitted at table code 4094 like libtiff)."""
    out = bytearray()
    acc = 0
    accbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, accbits
        acc = (acc << width) | code
        accbits += width
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)

    emit(256)  # Clear
    d = {bytes([i]): i for i in range(256)}
    next_code = 258
    w = b""
    for ch in raw:
        wk = w + bytes([ch])
        if wk in d:
            w = wk
            continue
        emit(d[w])
        d[wk] = next_code
        next_code += 1
        if next_code - 1 >= (1 << width) - 1 and width < 12:
            width += 1
        w = bytes([ch])
        if next_code >= 4094:
            emit(256)
            d = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
    if w:
        emit(d[w])
    emit(257)  # EOI
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


_TIFF_COMPRESSIONS = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773}


def _tiff_compress(raw: bytes, compression: str) -> bytes:
    if compression == "none":
        return raw
    if compression == "packbits":
        return _packbits_encode(raw)
    if compression == "lzw":
        return _lzw_encode(raw)
    return zlib.compress(raw, 6)


def _tiff_predict2(img: np.ndarray) -> bytes:
    """Forward Predictor-2 (horizontal differencing) for the writer."""
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    a = img.reshape(h, w, spp).astype(np.int64)
    diff = a.copy()
    diff[:, 1:, :] -= a[:, :-1, :]
    return (diff % 256).astype(np.uint8).tobytes()


def tiff_encode(
    img: np.ndarray, compression: str = "none", predictor: bool = False,
) -> bytes:
    """Minimal single-strip little-endian TIFF writer for (h, w) gray or
    (h, w, 3) RGB uint8 — the decode tests' fixture source and a valid
    file for any standard reader. ``compression`` ∈ none/lzw/deflate/
    packbits; ``predictor`` applies horizontal differencing (tag 317=2)
    before compression."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("tiff_encode expects uint8 (h,w) or (h,w,3)")
    if img.ndim == 3 and img.shape[2] != 3:
        raise ValueError("tiff_encode RGB needs 3 channels")
    if compression not in _TIFF_COMPRESSIONS:
        raise ValueError(f"tiff_encode: unknown compression {compression!r}")
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else 3
    photometric = 1 if spp == 1 else 2
    raw = _tiff_predict2(img) if predictor else img.tobytes()
    pixels = _tiff_compress(raw, compression)
    # layout: header(8) + pixel data + IFD
    pix_off = 8
    ifd_off = pix_off + len(pixels)
    entries = []

    def entry(tag, typ, count, value):
        entries.append(struct.pack("<HHI", tag, typ, count) + value)

    def short(v):
        return struct.pack("<HH", v, 0)

    def long_(v):
        return struct.pack("<I", v)

    n_entries = 11 + (1 if predictor else 0)
    bps_value = ifd_off + 2 + 12 * n_entries + 4  # after table + next-IFD ptr
    entry(256, 3, 1, short(w))
    entry(257, 3, 1, short(h))
    if spp == 1:
        entry(258, 3, 1, short(8))
    else:
        entry(258, 3, 3, long_(bps_value))
    entry(259, 3, 1, short(_TIFF_COMPRESSIONS[compression]))
    entry(262, 3, 1, short(photometric))
    entry(273, 4, 1, long_(pix_off))     # one strip
    entry(277, 3, 1, short(spp))
    entry(278, 3, 1, short(h))           # rows per strip = all
    entry(279, 4, 1, long_(len(pixels)))
    entry(282, 3, 1, short(72))          # XResolution (required-ish; SHORT ok)
    entry(283, 3, 1, short(72))
    if predictor:
        entry(317, 3, 1, short(2))
    assert len(entries) == n_entries
    # IFD entries must be sorted by tag (TIFF 6.0 requirement)
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + b"\x00\x00\x00\x00"
    tail = struct.pack("<HHH", 8, 8, 8) if spp == 3 else b""
    return b"II*\x00" + struct.pack("<I", ifd_off) + pixels + ifd + tail


def tiff_encode_tiled(
    img: np.ndarray,
    tile: tuple[int, int] = (16, 16),
    compression: str = "none",
    predictor: bool = False,
) -> bytes:
    """Tiled-layout TIFF writer (TIFF 6.0 §15) for (h, w) gray or
    (h, w, 3) RGB uint8 — the tiled-decode tests' fixture source. Edge
    tiles are zero-padded to full tile size per the spec; each tile is
    compressed independently."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("tiff_encode_tiled expects uint8 (h,w) or (h,w,3)")
    if img.ndim == 3 and img.shape[2] != 3:
        raise ValueError("tiff_encode_tiled RGB needs 3 channels")
    if compression not in _TIFF_COMPRESSIONS:
        raise ValueError(
            f"tiff_encode_tiled: unknown compression {compression!r}")
    tw, th = tile
    if tw <= 0 or th <= 0:
        raise ValueError("tiff_encode_tiled: bad tile size")
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else 3
    photometric = 1 if spp == 1 else 2
    full = img.reshape(h, w, spp)
    across = -(-w // tw)
    down = -(-h // th)
    tiles: list[bytes] = []
    for ty in range(down):
        for tx in range(across):
            pad = np.zeros((th, tw, spp), dtype=np.uint8)
            y0, x0 = ty * th, tx * tw
            y1, x1 = min(y0 + th, h), min(x0 + tw, w)
            pad[: y1 - y0, : x1 - x0] = full[y0:y1, x0:x1]
            raw = _tiff_predict2(pad) if predictor else pad.tobytes()
            tiles.append(_tiff_compress(raw, compression))

    n = len(tiles)
    pix = b"".join(tiles)
    offs: list[int] = []
    pos = 8
    for t in tiles:
        offs.append(pos)
        pos += len(t)
    # external value arrays for 324/325 when n > 1 (4-byte slot otherwise)
    ext_324 = 8 + len(pix)
    ext_325 = ext_324 + (4 * n if n > 1 else 0)
    ifd_off = ext_325 + (4 * n if n > 1 else 0)
    entries = []

    def entry(tag, typ, count, value):
        entries.append(struct.pack("<HHI", tag, typ, count) + value)

    def short(v):
        return struct.pack("<HH", v, 0)

    def long_(v):
        return struct.pack("<I", v)

    n_entries = 12 + (1 if predictor else 0)
    bps_value = ifd_off + 2 + 12 * n_entries + 4
    entry(256, 3, 1, short(w))
    entry(257, 3, 1, short(h))
    if spp == 1:
        entry(258, 3, 1, short(8))
    else:
        entry(258, 3, 3, long_(bps_value))
    entry(259, 3, 1, short(_TIFF_COMPRESSIONS[compression]))
    entry(262, 3, 1, short(photometric))
    entry(277, 3, 1, short(spp))
    entry(282, 3, 1, short(72))
    entry(283, 3, 1, short(72))
    if predictor:
        entry(317, 3, 1, short(2))
    entry(322, 3, 1, short(tw))
    entry(323, 3, 1, short(th))
    if n == 1:
        entry(324, 4, 1, long_(offs[0]))
        entry(325, 4, 1, long_(len(tiles[0])))
    else:
        entry(324, 4, n, long_(ext_324))
        entry(325, 4, n, long_(ext_325))
    assert len(entries) == n_entries
    ext = b""
    if n > 1:
        ext = (struct.pack(f"<{n}I", *offs)
               + struct.pack(f"<{n}I", *(len(t) for t in tiles)))
    ifd = (struct.pack("<H", len(entries)) + b"".join(entries)
           + b"\x00\x00\x00\x00")
    tail = struct.pack("<HHH", 8, 8, 8) if spp == 3 else b""
    return b"II*\x00" + struct.pack("<I", ifd_off) + pix + ext + ifd + tail


def _jpeg_split_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a full JPEG interchange stream into ``(tables_stream,
    abbreviated_stream)`` per TTN2: DQT/DHT segments move into an
    SOI…tables…EOI stream (the JPEGTables tag-347 body); everything else
    — SOF, DRI, the SOS and its entropy data — stays in the abbreviated
    per-strip/tile stream."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("_jpeg_split_tables: missing SOI")
    tabs = bytearray()
    out = bytearray(b"\xff\xd8")
    pos = 2
    n = len(stream)
    while pos + 4 <= n:
        if stream[pos] != 0xFF:
            raise ValueError("_jpeg_split_tables: expected marker")
        m = stream[pos + 1]
        if m == 0xDA:  # SOS: entropy data through EOI stays per-chunk
            out += stream[pos:]
            break
        seglen = struct.unpack_from(">H", stream, pos + 2)[0]
        seg = stream[pos:pos + 2 + seglen]
        if m in (0xDB, 0xC4):
            tabs += seg
        else:
            out += seg
        pos += 2 + seglen
    return b"\xff\xd8" + bytes(tabs) + b"\xff\xd9", bytes(out)


def tiff_encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    rows_per_strip: int | None = None,
    shared_tables: bool = False,
    tile: tuple[int, int] | None = None,
) -> bytes:
    """New-style JPEG-in-TIFF writer (compression 7, TTN2) — the decode
    tests' fixture source and a valid file for libtiff-family readers.
    Strip layout by default (``rows_per_strip`` rows per chunk, whole
    image if None); ``tile=(tw, th)`` switches to tile layout with
    zero-padded edge tiles per TIFF 6.0 §15. ``shared_tables=True``
    moves DQT/DHT into one shared JPEGTables (tag 347) stream and writes
    abbreviated per-chunk streams, exercising the decoder's splice path."""
    from final_ocr_spark.extract.jpeg import jpeg_encode

    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("tiff_encode_jpeg expects uint8 (h,w) or (h,w,3)")
    if img.ndim == 3 and img.shape[2] != 3:
        raise ValueError("tiff_encode_jpeg RGB needs 3 channels")
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else 3
    photometric = 1 if spp == 1 else 6  # jpeg_encode emits YCbCr for color

    chunks: list[np.ndarray] = []
    if tile is not None:
        tw, th = tile
        if tw <= 0 or th <= 0:
            raise ValueError("tiff_encode_jpeg: bad tile size")
        full = img.reshape(h, w, spp)
        for ty in range(-(-h // th)):
            for tx in range(-(-w // tw)):
                pad = np.zeros((th, tw, spp), dtype=np.uint8)
                y0, x0 = ty * th, tx * tw
                y1, x1 = min(y0 + th, h), min(x0 + tw, w)
                pad[: y1 - y0, : x1 - x0] = full[y0:y1, x0:x1]
                chunks.append(pad if spp == 3 else pad[:, :, 0])
    else:
        rps = h if rows_per_strip is None else int(rows_per_strip)
        if rps <= 0:
            raise ValueError("tiff_encode_jpeg: bad rows_per_strip")
        chunks = [img[y0:y0 + rps] for y0 in range(0, h, rps)]

    streams = [jpeg_encode(c, quality=quality) for c in chunks]
    tables = b""
    if shared_tables:
        split = [_jpeg_split_tables(s) for s in streams]
        tables = split[0][0]
        if any(t != tables for t, _ in split):
            # same quality → same Annex-K-scaled tables for every chunk
            raise ValueError("tiff_encode_jpeg: chunk table streams differ")
        streams = [s for _, s in split]

    n = len(streams)
    pix = b"".join(streams)
    offs: list[int] = []
    pos = 8
    for s in streams:
        offs.append(pos)
        pos += len(s)
    # external value areas, in file order: offsets[], counts[], tables, bps
    ext = b""
    ext_off_arr = pos
    if n > 1:
        ext += struct.pack(f"<{n}I", *offs)
        pos += 4 * n
    ext_cnt_arr = pos
    if n > 1:
        ext += struct.pack(f"<{n}I", *(len(s) for s in streams))
        pos += 4 * n
    tab_off = pos
    ext += tables
    pos += len(tables)
    ifd_off = pos

    entries: list[bytes] = []

    def entry(tag, typ, count, value):
        entries.append(struct.pack("<HHI", tag, typ, count) + value)

    def short(v):
        return struct.pack("<HH", v, 0)

    def long_(v):
        return struct.pack("<I", v)

    n_entries = (10 if tile is not None else 9) + (1 if tables else 0)
    bps_value = ifd_off + 2 + 12 * n_entries + 4
    entry(256, 3, 1, short(w))
    entry(257, 3, 1, short(h))
    if spp == 1:
        entry(258, 3, 1, short(8))
    else:
        entry(258, 3, 3, long_(bps_value))
    entry(259, 3, 1, short(7))
    entry(262, 3, 1, short(photometric))
    if tile is None:
        if n == 1:
            entry(273, 4, 1, long_(offs[0]))
        else:
            entry(273, 4, n, long_(ext_off_arr))
    entry(277, 3, 1, short(spp))
    if tile is None:
        entry(278, 4, 1, long_(h if rows_per_strip is None
                               else int(rows_per_strip)))
        if n == 1:
            entry(279, 4, 1, long_(len(streams[0])))
        else:
            entry(279, 4, n, long_(ext_cnt_arr))
    else:
        entry(322, 3, 1, short(tile[0]))
        entry(323, 3, 1, short(tile[1]))
        if n == 1:
            entry(324, 4, 1, long_(offs[0]))
            entry(325, 4, 1, long_(len(streams[0])))
        else:
            entry(324, 4, n, long_(ext_off_arr))
            entry(325, 4, n, long_(ext_cnt_arr))
    if tables:
        entry(347, 7, len(tables), long_(tab_off))
    assert len(entries) == n_entries
    ifd = (struct.pack("<H", len(entries)) + b"".join(entries)
           + b"\x00\x00\x00\x00")
    tail = struct.pack("<HHH", 8, 8, 8) if spp == 3 else b""
    return b"II*\x00" + struct.pack("<I", ifd_off) + pix + ext + ifd + tail
