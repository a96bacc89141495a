"""Unicode text normalization: the canonical pre-pass before hashing,
dedup, tokenization, or fingerprinting a multilingual web corpus.

The same visible text arrives from the web in many byte forms — NFC vs
NFD ('é' precomposed vs 'e'+U+0301), fullwidth/compatibility forms
(ﬁ ligature, ２０２４), case variants — and every downstream exact-match
operator (dedup_exact fingerprints, decontamination gram hashes, vocab
stats) silently fragments without a pinned normalization. Spark has no
built-in Unicode normalizer, so this is an Arrow-batched pandas UDF over
``unicodedata`` (stdlib, deterministic across platforms) with an ASCII
fast path: normalization is the identity on pure-ASCII strings, and web
corpora are majority-ASCII post-extraction, so the Python-level work runs
only on the non-ASCII minority of each batch.

Engine-independent check: DuckDB's ``nfc_normalize`` is the NFC oracle
(tests/test_normalize.py compares both engines byte-for-byte).
"""

from __future__ import annotations

import unicodedata
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def _normalize_series(
    s: pd.Series, form: str, lowercase: bool, strip_accents: bool
) -> pd.Series:
    def one(v):
        if v is None:
            return None
        out = v
        # ASCII fast path: all four forms are the identity on ASCII, and
        # accent stripping has nothing to strip — only casefold applies
        if not out.isascii():
            out = unicodedata.normalize(form, out)
            if strip_accents:
                decomp = unicodedata.normalize("NFD", out)
                out = "".join(c for c in decomp
                              if unicodedata.category(c) != "Mn")
                # re-normalize to the requested composed form after removal
                if form in ("NFC", "NFKC"):
                    out = unicodedata.normalize(form, out)
        if lowercase:
            out = out.casefold()
        return out

    return s.map(one)


def normalize_text(
    text_col, form: str = "NFC", lowercase: bool = False,
    strip_accents: bool = False,
) -> Column:
    """Column expression: Unicode-normalize a string column.

    ``form`` ∈ NFC/NFD/NFKC/NFKD; ``lowercase`` applies full casefold
    (ß→ss — the dedup-correct fold, unlike lower()); ``strip_accents``
    removes combining marks via NFD decomposition (café→cafe).
    Deterministic pure function; nulls pass through.
    """
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}")

    @pandas_udf("string")
    def _norm(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield _normalize_series(s, form, lowercase, strip_accents)

    col = text_col if isinstance(text_col, Column) else F.col(text_col)
    return _norm(col)
