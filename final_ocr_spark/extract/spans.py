"""Record-level span labeling over extracted text.

Generalizes the reference's record-parsing regex cascades (SURVEY §2.5
R1-R12): instead of materializing header fields, we label spans in the
extracted text with kinds ``date`` / ``id`` / ``amount`` (FIXTURES.md §2) —
first-match-wins order pinned exactly like the reference's pattern cascades
(ocr.py:176-198; ocr2.py:33-69 pre-compiled pattern lists).

Patterns are compiled once per Python worker at module import (the reference's
"Pre-compile regex patterns for better performance", ocr2.py:33).
"""

from __future__ import annotations

import re

# order matters: longer/stricter first so first-match-wins is deterministic
DATE_RE = re.compile(
    r"\b(\d{4}-\d{2}-\d{2}|\d{1,2}[-/]\d{1,2}[-/]\d{2,4})\b"
)
# invoice-number analog (R1): long digit runs, optionally with inner dashes
ID_RE = re.compile(r"\b\d{6,}\b|\b\d{2,4}-\d{2,4}-\d{2,4}\b")
# money analog (R5/R10): currency-ish numbers w/ thousand separators/decimals
AMOUNT_RE = re.compile(
    r"(?:[$€£]\s?)\d{1,3}(?:[,.\s]\d{3})*(?:[.,]\d{1,2})?"
    r"|\b\d{1,3}(?:,\d{3})+(?:\.\d{1,2})?\b"
    r"|\b\d+\.\d{2}\b"
)


# every char any of the three patterns can consume: digits, currency marks,
# separators. One cheap pass over this class finds the only regions where the
# heavy patterns can match at all — letters (most of a document) are skipped
# at C speed instead of being probed by three alternation patterns.
# TWO window classes: the heavy patterns use Unicode-aware \d, so the window
# must cover every Unicode digit — with ASCII [0-9] alone, a date/id written
# in Arabic-Indic or fullwidth digits fell outside every window and its span
# was silently dropped (round-2 review finding; pinned by
# test_spans_unicode_digits_match_naive). But the \d class scans 2× slower
# (measured 0.066 s → 0.135 s per 2000 prescans), so pure-ASCII documents —
# which provably contain no Unicode digits — dispatch to the ASCII class via
# str.isascii() (~40 ns, C-level).
_WINDOW_RE_ASCII = re.compile(r"[0-9$][0-9$,./\s-]*")
_WINDOW_RE_UNI = re.compile(r"[\d$€£][\d$€£,./\s-]*")


def label_value_spans(text: str) -> list[tuple[int, int, str]]:
    """Non-overlapping value spans; precedence date > id > amount, then
    earlier-start wins (deterministic tie-break).

    Two structural speedups, both output-identical (fuzz-verified against
    the naive form):
    * the three patterns scan only maximal candidate WINDOWS found by one
      simple char-class pass (any match consists solely of window-class
      chars, so every match lies inside a window; windows are padded ±1 char
      so \\b at the edges evaluates against the true neighbors);
    * matches from ONE finditer are mutually disjoint and start-sorted, so a
      priority group only needs overlap checks against the static merged
      accepted set of higher priorities — no per-span list inserts (the
      insert form profiled O(n²) on value-dense documents)."""
    import bisect

    n = len(text)
    window_re = _WINDOW_RE_ASCII if text.isascii() else _WINDOW_RE_UNI
    windows = [
        (max(m.start() - 1, 0), min(m.end() + 1, n))
        for m in window_re.finditer(text)
    ]
    out: list[tuple[int, int, str]] = []
    accepted: list[tuple[int, int]] = []  # sorted, disjoint
    astarts: list[int] = []
    for rx, kind in [(DATE_RE, "date"), (ID_RE, "id"), (AMOUNT_RE, "amount")]:
        new: list[tuple[int, int]] = []
        for ws, we in windows:
            for m in rx.finditer(text, ws, we):
                s, e = m.span()
                i = bisect.bisect_right(astarts, s)
                if (i > 0 and accepted[i - 1][1] > s) or (
                    i < len(astarts) and astarts[i] < e
                ):
                    continue
                new.append((s, e))
                out.append((s, e, kind))
        if new:
            accepted = sorted(accepted + new)  # timsort: two sorted runs
            astarts = [a[0] for a in accepted]
    out.sort()
    return out
