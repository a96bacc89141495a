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


def label_value_spans(text: str) -> list[tuple[int, int, str]]:
    """Non-overlapping value spans; precedence date > id > amount, then
    earlier-start wins (deterministic tie-break). Accepted intervals are kept
    in a bisect-maintained sorted list so overlap checks are O(log n), not a
    linear scan (value-dense documents made this quadratic)."""
    import bisect

    cands: list[tuple[int, int, int, str]] = []
    for prio, (rx, kind) in enumerate(
        [(DATE_RE, "date"), (ID_RE, "id"), (AMOUNT_RE, "amount")]
    ):
        for m in rx.finditer(text):
            cands.append((m.start(), m.end(), prio, kind))
    cands.sort(key=lambda c: (c[2], c[0]))  # priority, then position
    starts: list[int] = []
    ends: list[int] = []
    out: list[tuple[int, int, str]] = []
    for s, e, _p, kind in cands:
        i = bisect.bisect_right(starts, s)
        if (i > 0 and ends[i - 1] > s) or (i < len(starts) and starts[i] < e):
            continue
        starts.insert(i, s)
        ends.insert(i, e)
        out.append((s, e, kind))
    out.sort()
    return out
