"""Sentence segmentation as codegen Columns + the exploded sentence table.

Sentence units power the corpus ops paragraph/doc granularity can't:
sentence-level dedup of syndicated ledes, quote/citation mining, and
sequence packing that prefers sentence boundaries. The splitter here is the
classic protected-split recipe, kept ENTIRELY in Column expressions so it
fuses into the scan (zero Python):

1. protect non-terminal periods by rewriting them to a sentinel char —
   known abbreviations (``Dr. Mr. etc. e.g.``), decimal numbers
   (``3.14``), single-initial runs (``J. K. Rowling``), dotted acronyms
   (``U.S.A.``);
2. split on sentence-final punctuation (``. ! ?`` plus closing quotes)
   followed by whitespace;
3. restore the sentinel to ``.`` in each piece.

Heuristic by design (all sentence splitters are): the protected classes
are the documented contract, a pure-Python twin (:func:`split_sentences`)
implements the same passes and is differential-pinned against the Column
form in tests, and hypothesis fuzz asserts the no-loss invariant — the
concatenation of pieces reproduces the input text modulo the split
whitespace.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SENTINEL = "\x01"

# common non-terminal abbreviations (case as written; matched case-sensitively
# so sentence-final 'no.' vs the abbreviation 'No. 5' stay distinguishable
# where casing distinguishes them)
_ABBREVS = [
    "Mr", "Mrs", "Ms", "Dr", "Prof", "Sr", "Jr", "St", "Gen", "Rep", "Sen",
    "Gov", "Lt", "Col", "Capt", "Sgt", "Rev", "Hon",
    "Inc", "Ltd", "Corp", "Co", "LLC",
    "vs", "etc", "approx", "dept", "est", "min", "max",
    "Fig", "fig", "Vol", "vol", "No", "pp", "ch", "sec", "ed", "eds",
    "Jan", "Feb", "Mar", "Apr", "Jun", "Jul", "Aug", "Sep", "Sept",
    "Oct", "Nov", "Dec", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun",
    "a.m", "p.m", "e.g", "i.e", "cf", "al",  # 'et al.'
]

# ordered protect passes: (pattern, replacement) — $-style for Java,
# \\g<n>-style equivalents handled by _protect_py
_PROTECT = [
    # abbreviation followed by '.' (the '.' becomes the sentinel)
    (r"\b(" + "|".join(a.replace(".", r"\.") for a in _ABBREVS) + r")\.",
     r"$1" + _SENTINEL),
    # decimals / version numbers: 3.14, 1.2.3
    (r"(\d)\.(?=\d)", r"$1" + _SENTINEL),
    # dotted single initials/acronyms: J. K. Rowling, U.S.A. — a single
    # uppercase letter followed by '.' then NOT end-of-text whitespace+lower
    (r"\b([A-Z])\.(?=[A-Z\s])", r"$1" + _SENTINEL),
]

# two fixed-width lookbehind alternatives (Python re rejects variable-width
# lookbehind; Java accepts both forms). Java \s/\b/\w are ASCII-ONLY by
# default while Python's are Unicode (the pinned bpe.py pitfall) — an NBSP
# between sentences (&nbsp;, ubiquitous in HTML) would split Python-side
# but not JVM-side — so the Spark forms carry the (?U) Unicode flag.
_SPLIT_RE = r"(?<=[.!?])\s+|(?<=[.!?][\"'’”)\]])\s+"
_SPLIT_RE_SPARK = "(?U)" + _SPLIT_RE
# Python \s additionally matches the C0 control separators U+001C-001F
# (White_Space=No in Unicode, so Java (?U)\s does NOT) — the Python twin
# narrows its \s to Java's semantics so the differential contract holds on
# every code point (review-caught, test-pinned)
_JAVA_WS = r"(?:(?![\x1c-\x1f])\s)"
_SPLIT_RE_PY = _SPLIT_RE.replace(r"\s", _JAVA_WS)


def _protect_java(col: Column) -> Column:
    for pat, rep in _PROTECT:
        col = F.regexp_replace(col, "(?U)" + pat, rep)
    return col


def split_sentences(text: str | None) -> list[str] | None:
    """Pure-Python twin of the Column splitter (same three passes) —
    differential-pinned in tests."""
    if text is None:
        return None
    out = text
    for pat, rep in _PROTECT:
        out = re.sub(pat, rep.replace("$1", r"\g<1>"), out)
    pieces = re.split(_SPLIT_RE_PY, out)
    # whitespace-only pieces are not sentences (the documented contract);
    # "whitespace" means Java-(?U) whitespace here, like the Column form
    return [
        p.replace(_SENTINEL, ".")
        for p in pieces
        if not re.fullmatch(_JAVA_WS + "*", p)
    ]


def sentences(text_col) -> Column:
    """Column: text → array<string> of sentences. Scan-fused Column
    expressions, zero Python (the protect/split passes are codegen; the
    restore/filter HOF lambdas are interpreted JVM-side but reference only
    the lambda variable — no re-evaluation blowup, see PLANS.md Catalyst
    pitfalls). null → null, whitespace-only text → empty array."""
    col = text_col if isinstance(text_col, Column) else F.col(text_col)
    protected = _protect_java(col)
    pieces = F.split(protected, _SPLIT_RE_SPARK)
    return F.filter(
        F.transform(
            pieces, lambda p: F.replace(p, F.lit(_SENTINEL), F.lit("."))
        ),
        # NOT F.trim: it strips ASCII spaces only (pinned pitfall) — a
        # "\n" or NBSP piece must drop exactly like Python .strip() does
        lambda p: ~p.rlike(r"(?U)^\s*$"),
    )


def sentence_count(text_col) -> Column:
    """Column: number of detected sentences."""
    return F.array_size(sentences(text_col))


def explode_sentences(
    docs: DataFrame, key: str = "url", text_col: str = "text"
) -> DataFrame:
    """(key, sent_idx, sentence) rows — the sentence table for
    sentence-level dedup/mining. posexplode keeps document order; the doc
    text itself never appears in the output rows (each sentence does), so
    downstream shuffles carry sentence-sized strings at most."""
    return docs.select(
        F.col(key),
        F.posexplode(sentences(F.col(text_col))).alias("sent_idx", "sentence"),
    )
