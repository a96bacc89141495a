"""Mojibake repair: undo UTF-8 text mis-decoded as windows-1252/latin-1.

The single most common encoding corruption in web corpora: a page's UTF-8
bytes were decoded with an 8-bit charset somewhere upstream, turning every
non-ASCII character into 2-3 junk characters ("é" → "Ã©", "’" → "â€™",
"€" → "â‚¬"). The text survives — the corruption is a pure, invertible
re-coding — so the repair is: re-encode the junk with the charset that
caused it, decode the recovered bytes as UTF-8, and accept the result only
when the round trip is exact and strictly shrinking (UTF-8 mojibake always
expands one character into 2-4, so a genuine repair always shortens the
string; genuine Latin-script text almost never forms valid multi-byte UTF-8
when re-encoded, so it fails the strict decode and passes through
untouched). This is the core of ftfy's ``fix_encoding`` (public library,
re-derived from the codec definitions; no ftfy code used), restricted to
the dominant windows-1252/latin-1 family.

Charset detail: the misdecoder in the wild is effectively
"sloppy windows-1252" — bytes 0x80-0x9F take their cp1252 meanings ("€",
curly quotes, dashes) but the five bytes cp1252 leaves undefined
(0x81 8D 8F 90 9D) pass through as C1 control characters (latin-1
behavior). The repair therefore re-encodes via latin-1 after translating
the 27 cp1252-specific characters back to their 0x80-0x9F bytes — one
table, both charsets covered, mixed occurrences included.

Scale shape: an Arrow-batched pandas UDF (stdlib codecs, deterministic on
every platform) with an ASCII fast path — repair is the identity on pure
ASCII, which is the large majority of extracted web text, so the Python
work touches only the non-ASCII minority of each batch. Detection
(``has_mojibake``) is a pure regexp Column for scan-fused corpus profiling.

Reference provenance: the reference repo normalizes OCR *character*
confusions table-wise (reference ocr.py:170-196 `_canonical`); this is the
web-corpus analog at the *encoding* layer, which the reference never needed
because its inputs were images, not mis-decoded bytes.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# chars the cp1252 misdecoder produced from bytes 0x80-0x9F, mapped back to
# the latin-1 codepoint of that byte so one latin-1 encode recovers ALL
# high bytes (cp1252-specific chars AND the five latin-1 pass-through ones).
_CP1252_TO_BYTE = {}
for _b in range(0x80, 0xA0):
    try:
        _ch = bytes([_b]).decode("cp1252")
    except UnicodeDecodeError:  # 0x81 8D 8F 90 9D: latin-1 pass-through
        continue
    _CP1252_TO_BYTE[ord(_ch)] = chr(_b)

# telltale shapes of UTF-8 sequences as seen through the misdecoder: a
# lead byte's 8-bit view followed by the right NUMBER of continuation-byte
# views (0x80-0xBF as latin-1 -- incl. C1 controls -- or as cp1252).
# Length-matched 3/4-byte rules stay specific for CJK/emoji mojibake.
_CONT_CLASS = "".join(sorted(
    {chr(b) for b in range(0x80, 0xC0)}
    | set(bytes(range(0x80, 0xC0)).decode("cp1252", errors="ignore"))
))
_MOJIBAKE_RE = (
    f"[\u00c2-\u00df][{_CONT_CLASS}]"            # 2-byte seq: lead + 1 cont
    f"|[\u00e0-\u00ef][{_CONT_CLASS}]{{2}}"      # 3-byte seq: lead + 2 cont
    f"|[\u00f0-\u00f4][{_CONT_CLASS}]{{3}}"      # 4-byte seq: lead + 3 cont
)


def has_mojibake(text_col) -> Column:
    """Boolean Column: does the text contain a UTF-8-as-8-bit mojibake
    signature (an 8-bit view of a UTF-8 lead byte + continuation byte)?
    Pure regexp — codegen, scan-fused; use for corpus profiling and as a
    cheap pre-filter. Conservative: matches real mojibake reliably, may
    rarely match genuine text like "Ã—" used as a symbol."""
    col = text_col if isinstance(text_col, Column) else F.col(text_col)
    return col.rlike(_MOJIBAKE_RE)


_SEQ_RUN_RE = re.compile(f"(?:{_MOJIBAKE_RE})+")
_SEQ_ONE_RE = re.compile(_MOJIBAKE_RE)


def _strict_whole(out: str) -> str | None:
    """Whole-string repair: every byte of the re-encoding must form valid
    UTF-8 (ASCII included), so only fully-consistent mojibake passes — the
    safest mode, and the one that handles exotic scripts best."""
    try:
        raw = out.translate(_CP1252_TO_BYTE).encode("latin-1")
    except UnicodeEncodeError:
        return None  # chars outside the 8-bit family (CJK, emoji, …)
    try:
        dec = raw.decode("utf-8")
    except UnicodeDecodeError:
        return None  # not valid UTF-8 underneath: genuine 8-bit text
    # a real repair is strictly shrinking (multi-byte seqs collapse);
    # equality means pure-ASCII content, impossible here
    if len(dec) >= len(out) or "�" in dec:
        return None
    return dec


def _segmentwise(out: str) -> str:
    """Fallback for PARTIALLY damaged mojibake (e.g. a continuation byte's
    NBSP view collapsed by whitespace normalization breaks the whole-string
    decode): repair each maximal run of complete mojibake sequences
    independently. Riskier than whole-string mode — a genuine "ß–" bigram
    re-encodes to valid UTF-8 — so lone sequences are accepted only when
    they decode into the blocks real-world cp1252 mojibake actually
    produces (Latin-1 supplement via C2/C3 leads, punctuation/currency via
    the E2 lead); multi-sequence runs carry their own evidence."""

    def sub(m: re.Match) -> str:
        seg = m.group(0)
        n_seqs = len(_SEQ_ONE_RE.findall(seg))
        lead = seg[0]
        if n_seqs < 2 and lead not in ("Â", "Ã", "â"):
            return seg
        try:
            dec = seg.translate(_CP1252_TO_BYTE).encode("latin-1").decode("utf-8")
        except UnicodeError:  # overlong/surrogate edge: leave untouched
            return seg
        return seg if "�" in dec else dec

    return _SEQ_RUN_RE.sub(sub, out)


def _repair_value(v: str | None, max_passes: int) -> str | None:
    if v is None or v.isascii():
        return v
    out = v
    for _ in range(max_passes):
        dec = _strict_whole(out)
        if dec is None:
            dec = _segmentwise(out)
        if dec == out:
            break
        out = dec
        if out.isascii():
            break
    return out


def repair_mojibake(text_col, max_passes: int = 3) -> Column:
    """Column expression: repair windows-1252/latin-1 mojibake in a string
    column, recursively up to ``max_passes`` (double-encoded text — mojibake
    of mojibake — needs one pass per layer). Strings that are not mojibake
    of this family pass through byte-identical; nulls pass through.
    Deterministic pure function (stdlib codecs only)."""
    if max_passes < 1:
        raise ValueError("max_passes must be >= 1")

    @pandas_udf("string")
    def _fix(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield s.map(lambda v: _repair_value(v, max_passes))

    col = text_col if isinstance(text_col, Column) else F.col(text_col)
    return _fix(col)
