"""PDF/scanned-page branch: XY-cut layout segmentation + reading-order assembly.

Generalizes the reference's OCR stage: Tesseract ``--psm 6`` assumes a uniform
text block (ocr.py:67); real layouts need region segmentation first. We
implement the classic recursive XY-cut over token bounding boxes (split on the
widest whitespace valley, vertical cuts before horizontal, leaf regions in
left-to-right/top-to-bottom order), then per-region line clustering and
token assembly — the multi-line continuation-merge semantics of the
reference's live item state machine (ocr.py:823-848, SURVEY G5) appear here as
hyphenation line-merging.

Real PDF decoding / Tesseract are unavailable in this sandbox (SURVEY §7); the
branch consumes a deterministic token/layout text format so the *algorithm* is
real and tested while the decoder is swappable:

    %PDFTOK 1
    <token> <x0> <y0> <x1> <y1>
    ...

Coordinates are floats, y grows downward. Pure function of bytes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

PDFTOK_MAGIC = b"%PDFTOK 1"

# minimum whitespace valley widths (in the synthetic unit space ~ points);
# the x gap must exceed any plausible inter-word space — column gutters are
# wide — or normal word spacing triggers spurious column splits
MIN_X_GAP = 40.0
MIN_Y_GAP = 14.0
PARA_GAP_FACTOR = 1.8  # vertical gap > factor×median line height ⇒ new block


@dataclass(frozen=True)
class Token:
    text: str
    x0: float
    y0: float
    x1: float
    y1: float


def parse_pdftok(data: bytes) -> list[Token]:
    """Parse the token/layout payload; malformed lines are skipped per-row.

    Non-finite coordinates (``float()`` happily parses 'nan'/'inf') are
    skipped too: NaN boxes make comparison-based geometry ill-defined —
    a NaN midpoint fails BOTH sides of a cut and NaN sort keys break
    ordering transitivity — so they are rejected at the seam, identically
    in this spec path and the numpy fast path (fuzz-pinned).
    """
    toks: list[Token] = []
    text = data.decode("utf-8", errors="replace")
    for line in text.splitlines()[1:]:  # skip magic line
        parts = line.rsplit(None, 4)
        if len(parts) != 5:
            continue
        try:
            t = Token(parts[0], float(parts[1]), float(parts[2]),
                      float(parts[3]), float(parts[4]))
        except ValueError:
            continue
        if t.text and all(math.isfinite(v) for v in (t.x0, t.y0, t.x1, t.y1)):
            toks.append(t)
    return toks


def _largest_gap(intervals: list[tuple[float, float]], min_gap: float) -> float | None:
    """Widest uncovered gap between sorted merged intervals; None if < min_gap."""
    if len(intervals) < 2:
        return None
    ivs = sorted(intervals)
    merged = [list(ivs[0])]
    for a, b in ivs[1:]:
        if a <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], b)
        else:
            merged.append([a, b])
    best_w, best_mid = 0.0, None
    for (a0, a1), (b0, _b1) in zip(merged, merged[1:]):
        w = b0 - a1
        if w > best_w:
            best_w, best_mid = w, (a1 + b0) / 2.0
    if best_mid is not None and best_w >= min_gap:
        return best_mid
    return None


def _xycut(tokens: list[Token], depth: int = 0) -> list[list[Token]]:
    """Recursive XY-cut → leaf regions in reading order (columns left→right,
    then rows top→bottom within a column)."""
    if not tokens or depth > 12:
        return [tokens] if tokens else []
    # vertical cut first (multi-column layouts), then horizontal
    xmid = _largest_gap([(t.x0, t.x1) for t in tokens], MIN_X_GAP)
    if xmid is not None:
        left = [t for t in tokens if (t.x0 + t.x1) / 2.0 < xmid]
        right = [t for t in tokens if (t.x0 + t.x1) / 2.0 >= xmid]
        if left and right:
            return _xycut(left, depth + 1) + _xycut(right, depth + 1)
    ymid = _largest_gap([(t.y0, t.y1) for t in tokens], MIN_Y_GAP)
    if ymid is not None:
        top = [t for t in tokens if (t.y0 + t.y1) / 2.0 < ymid]
        bot = [t for t in tokens if (t.y0 + t.y1) / 2.0 >= ymid]
        if top and bot:
            return _xycut(top, depth + 1) + _xycut(bot, depth + 1)
    return [tokens]


def _assemble_region(tokens: list[Token]) -> list[str]:
    """Cluster tokens into lines by y-center, order tokens by x, merge
    hyphenated line breaks, split paragraphs on large vertical gaps.

    Returns a list of paragraph strings.
    """
    if not tokens:
        return []
    toks = sorted(tokens, key=lambda t: ((t.y0 + t.y1) / 2.0, t.x0))
    lines: list[list[Token]] = []
    cur: list[Token] = [toks[0]]
    for t in toks[1:]:
        prev = cur[-1]
        cy_prev = (prev.y0 + prev.y1) / 2.0
        cy = (t.y0 + t.y1) / 2.0
        h = max(prev.y1 - prev.y0, 1.0)
        if abs(cy - cy_prev) <= 0.5 * h:
            cur.append(t)
        else:
            lines.append(cur)
            cur = [t]
    lines.append(cur)

    line_texts: list[str] = []
    line_tops: list[float] = []
    line_bots: list[float] = []
    for ln in lines:
        ln_sorted = sorted(ln, key=lambda t: t.x0)
        line_texts.append(" ".join(t.text for t in ln_sorted))
        line_tops.append(min(t.y0 for t in ln))
        line_bots.append(max(t.y1 for t in ln))

    heights = sorted(b - a for a, b in zip(line_tops, line_bots))
    med_h = heights[len(heights) // 2] if heights else 10.0

    paragraphs: list[str] = []
    buf = ""
    for i, lt in enumerate(line_texts):
        gap = line_tops[i] - line_bots[i - 1] if i > 0 else 0.0
        new_para = i > 0 and gap > PARA_GAP_FACTOR * max(med_h, 1.0)
        if new_para:
            if buf:
                paragraphs.append(buf)
            buf = lt
        elif not buf:
            buf = lt
        elif buf.endswith("-"):
            # hyphenation merge (reference continuation-join analog, G5)
            buf = buf[:-1] + lt
        else:
            buf = buf + " " + lt
    if buf:
        paragraphs.append(buf)
    return [" ".join(p.split()) for p in paragraphs if p.strip()]


# --------------------------------------------------------------------------
# numpy fast path.  The pure-Python functions above are the REFERENCE SPEC:
# profiling showed PDF docs at ~10% of the corpus taking ~36% of extraction
# time, almost all in _xycut/_largest_gap tuple churn.  The array form below
# is bit-identical by construction (same IEEE-double operations in the same
# order; lexsort == tuple-sort for the merge; np.argmax == first-max like the
# `>` loop) and is differential-fuzzed against the spec in
# tests/test_layout_xycut.py.
# --------------------------------------------------------------------------


def _parse_pdftok_arrays(data: bytes):
    """parse_pdftok, array form: (texts, x0, y0, x1, y1). Same skip rules.

    Clean documents (the overwhelming majority) bulk-convert all four
    coordinate columns in one numpy call; any line numpy can't parse drops
    the whole document to a per-line loop that replicates ``float()``'s
    acceptance exactly — so skip behavior matches parse_pdftok on every
    input (differential-fuzzed incl. malformed payloads).
    """
    texts: list[str] = []
    raw: list[list[str]] = []
    for line in data.decode("utf-8", errors="replace").splitlines()[1:]:
        parts = line.rsplit(None, 4)
        if len(parts) != 5 or not parts[0]:
            continue
        texts.append(parts[0])
        raw.append(parts[1:])
    try:
        arr = np.asarray(raw, dtype=np.float64).reshape(-1, 4)
        finite = np.isfinite(arr).all(axis=1)
        if not finite.all():
            arr = arr[finite]
            texts = [t for t, ok in zip(texts, finite.tolist()) if ok]
    except ValueError:
        # some line numpy can't parse: redo per-line with float()'s exact
        # acceptance, skipping (not failing) the offending lines
        texts = []
        keep: list[list[float]] = []
        for line in data.decode("utf-8", errors="replace").splitlines()[1:]:
            parts = line.rsplit(None, 4)
            if len(parts) != 5 or not parts[0]:
                continue
            try:
                c = [float(parts[1]), float(parts[2]),
                     float(parts[3]), float(parts[4])]
            except ValueError:
                continue
            if not all(math.isfinite(v) for v in c):
                continue
            texts.append(parts[0])
            keep.append(c)
        arr = np.array(keep, dtype=np.float64).reshape(-1, 4)
    return texts, arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3]


def _largest_gap_np(s: np.ndarray, e: np.ndarray, min_gap: float):
    """_largest_gap on start/end arrays: lexsort == sorted(tuples); running
    max == interval merge; first strict max == the `w > best_w` loop."""
    if s.size < 2:
        return None
    o = np.lexsort((e, s))
    ss, ee = s[o], e[o]
    cm = np.maximum.accumulate(ee)
    gaps = ss[1:] - cm[:-1]          # >0 exactly at merged-interval boundaries
    bmask = gaps > 0
    if not bmask.any():
        return None
    w = gaps[bmask]
    i = int(np.argmax(w))
    if w[i] >= min_gap:
        return (cm[:-1][bmask][i] + ss[1:][bmask][i]) / 2.0
    return None


def _xycut_idx(idx, x0, y0, x1, y1, depth: int = 0) -> list:
    """_xycut on an index array; regions preserve original token order."""
    if idx.size == 0:
        return []
    if depth > 12:
        return [idx]
    xmid = _largest_gap_np(x0[idx], x1[idx], MIN_X_GAP)
    if xmid is not None:
        lm = (x0[idx] + x1[idx]) / 2.0 < xmid
        left, right = idx[lm], idx[~lm]
        if left.size and right.size:
            return (_xycut_idx(left, x0, y0, x1, y1, depth + 1)
                    + _xycut_idx(right, x0, y0, x1, y1, depth + 1))
    ymid = _largest_gap_np(y0[idx], y1[idx], MIN_Y_GAP)
    if ymid is not None:
        tm = (y0[idx] + y1[idx]) / 2.0 < ymid
        top, bot = idx[tm], idx[~tm]
        if top.size and bot.size:
            return (_xycut_idx(top, x0, y0, x1, y1, depth + 1)
                    + _xycut_idx(bot, x0, y0, x1, y1, depth + 1))
    return [idx]


def _assemble_region_idx(texts, x0, y0, x1, y1, idx) -> list[str]:
    """_assemble_region over an index array (plain-float lists inside the
    sequential line-clustering loop; string logic verbatim from the spec)."""
    n = idx.size
    if n == 0:
        return []
    rx0 = x0[idx].tolist()
    ry0 = y0[idx].tolist()
    ry1 = y1[idx].tolist()
    rtx = [texts[i] for i in idx.tolist()]
    cy = [(a + b) / 2.0 for a, b in zip(ry0, ry1)]
    order = sorted(range(n), key=lambda i: (cy[i], rx0[i]))

    lines: list[list[int]] = []
    cur: list[int] = [order[0]]
    for i in order[1:]:
        p = cur[-1]
        h = max(ry1[p] - ry0[p], 1.0)
        if abs(cy[i] - cy[p]) <= 0.5 * h:
            cur.append(i)
        else:
            lines.append(cur)
            cur = [i]
    lines.append(cur)

    line_texts: list[str] = []
    line_tops: list[float] = []
    line_bots: list[float] = []
    for ln in lines:
        ln_sorted = sorted(ln, key=lambda i: rx0[i])
        line_texts.append(" ".join(rtx[i] for i in ln_sorted))
        line_tops.append(min(ry0[i] for i in ln))
        line_bots.append(max(ry1[i] for i in ln))

    heights = sorted(b - a for a, b in zip(line_tops, line_bots))
    med_h = heights[len(heights) // 2] if heights else 10.0

    paragraphs: list[str] = []
    buf = ""
    for i, lt in enumerate(line_texts):
        gap = line_tops[i] - line_bots[i - 1] if i > 0 else 0.0
        new_para = i > 0 and gap > PARA_GAP_FACTOR * max(med_h, 1.0)
        if new_para:
            if buf:
                paragraphs.append(buf)
            buf = lt
        elif not buf:
            buf = lt
        elif buf.endswith("-"):
            buf = buf[:-1] + lt
        else:
            buf = buf + " " + lt
    if buf:
        paragraphs.append(buf)
    return [" ".join(p.split()) for p in paragraphs if p.strip()]


def extract_pdf_tokens_ref(data: bytes) -> tuple[str, list[tuple[int, int, str]], int]:
    """Reference-spec (pure-Python) form of extract_pdf_tokens — kept as the
    differential-fuzz oracle for the numpy fast path."""
    tokens = parse_pdftok(data)
    regions = _xycut(tokens)
    paragraphs: list[str] = []
    for region in regions:
        paragraphs.extend(_assemble_region(region))
    return _layout_output(paragraphs)


def _layout_output(paragraphs: list[str]):
    parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0
    for i, p in enumerate(paragraphs):
        kind = "title" if i == 0 else "paragraph"
        parts.append(p)
        spans.append((pos, pos + len(p), kind))
        pos += len(p) + 1
    return "\n".join(parts), spans, len(parts)


def extract_pdf_tokens(data: bytes) -> tuple[str, list[tuple[int, int, str]], int]:
    """bytes → (extracted_text, block spans, n_blocks). Same contract as
    extract_html: paragraphs joined by '\\n', spans offset into the text."""
    texts, x0, y0, x1, y1 = _parse_pdftok_arrays(data)
    regions = _xycut_idx(np.arange(len(texts), dtype=np.int64), x0, y0, x1, y1)
    paragraphs: list[str] = []
    for region in regions:
        paragraphs.extend(_assemble_region_idx(texts, x0, y0, x1, y1, region))
    return _layout_output(paragraphs)
