"""Writing-system (script) detection as pure codegen Columns.

The cheap, language-agnostic sibling of extract/langid.py: langid answers
"which language" with Python n-gram work; script detection answers "which
writing system" with nothing but per-range character counts — and that is
often the question a corpus gate actually needs (a doc whose ``lang`` says
'en' but whose dominant script is Cyrillic is mislabeled or spam; a
multilingual pipeline shards by script before picking per-script
tokenizers). Everything here is regexp_replace+length Column arithmetic —
whole-stage codegen, scan-fused, zero Python — over a bounded head sample
(``sample_chars``) so cost is flat per row regardless of document size.

Ranges are the Unicode block ranges of the major scripts (public Unicode
standard); Han counts for CJK, with Kana/Hangul split out so
Japanese/Korean vs Chinese remains distinguishable downstream.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# script → character-class of its principal Unicode blocks
_SCRIPT_CLASSES: dict[str, str] = {
    "latin": "A-Za-z\\u00C0-\\u024F\\u1E00-\\u1EFF",
    "cyrillic": "\\u0400-\\u04FF\\u0500-\\u052F",
    "greek": "\\u0370-\\u03FF\\u1F00-\\u1FFF",
    "arabic": "\\u0600-\\u06FF\\u0750-\\u077F",
    "hebrew": "\\u0590-\\u05FF",
    "devanagari": "\\u0900-\\u097F",
    "han": "\\u4E00-\\u9FFF\\u3400-\\u4DBF",
    "kana": "\\u3040-\\u309F\\u30A0-\\u30FF",
    "hangul": "\\uAC00-\\uD7AF\\u1100-\\u11FF",
    "thai": "\\u0E00-\\u0E7F",
}

# "letters" = union of all tracked script classes (the ratio denominator:
# digits/punct/space are script-neutral and must not dilute the signal)
_ALL_LETTERS = "".join(_SCRIPT_CLASSES.values())


def _count_in_class(col: Column, cls: str) -> Column:
    return F.length(F.regexp_replace(col, f"[^{cls}]", ""))


def script_ratios(text_col, sample_chars: int = 4096) -> Column:
    """Column: struct of per-script letter ratios (0..1, over tracked
    letters only) + ``letters`` (the denominator). All-codegen; null text →
    null struct fields via the usual null propagation."""
    col = text_col if isinstance(text_col, Column) else F.col(text_col)
    head = F.substring(col, 1, sample_chars)
    letters = _count_in_class(head, _ALL_LETTERS)
    fields = [letters.alias("letters")]
    for name, cls in _SCRIPT_CLASSES.items():
        fields.append(
            # three-way: ratio / 0.0 for letterless text / NULL for null
            # text ("null > 0" is null and would otherwise fall into the
            # 0.0 branch, making null docs indistinguishable from
            # digits-only docs — review-caught)
            F.when(letters > 0, _count_in_class(head, cls) / letters)
            .when(letters.isNotNull(), F.lit(0.0))
            .alias(name)
        )
    return F.struct(*fields)


def dominant_script(text_col, sample_chars: int = 4096) -> Column:
    """Column: name of the script with the most letters in the head sample,
    or 'unknown' when no tracked letters appear. Ties break alphabetically
    ascending on the script name (deterministic): array_max compares the
    (count, name) struct lexicographically, so equal counts pick the
    lexicographically LARGEST name — we invert by ordering on (count,
    negated rank) instead, keeping the struct trick fully codegen."""
    col = text_col if isinstance(text_col, Column) else F.col(text_col)
    head = F.substring(col, 1, sample_chars)
    names = sorted(_SCRIPT_CLASSES)  # alphabetic; rank i
    entries = [
        F.struct(
            _count_in_class(head, _SCRIPT_CLASSES[name]).alias("n"),
            F.lit(len(names) - i).alias("inv_rank"),  # earlier name wins ties
            F.lit(name).alias("name"),
        )
        for i, name in enumerate(names)
    ]
    best = F.array_max(F.array(*entries))
    return F.when(best.getField("n") > 0, best.getField("name")).otherwise(
        F.lit("unknown")
    )


def script_lang_mismatch(text_col, lang_col) -> Column:
    """Column: true when the declared ISO-639-1 lang is irreconcilable with
    the dominant script — the cheap mislabel/spam flag (e.g. lang='en' but
    Cyrillic text). Only clear-cut pairs flag; unknown scripts/langs never
    flag (conservative)."""
    lang = lang_col if isinstance(lang_col, Column) else F.col(lang_col)
    script = dominant_script(text_col)
    # which scripts are LEGITIMATE for a language (coarse, conservative)
    expected = F.create_map(
        *[F.lit(x) for pair in {
            "en": "latin", "fr": "latin", "de": "latin", "es": "latin",
            "it": "latin", "pt": "latin", "nl": "latin", "pl": "latin",
            "tr": "latin", "vi": "latin", "id": "latin", "sv": "latin",
            "ru": "cyrillic", "uk": "cyrillic", "bg": "cyrillic",
            "sr": "cyrillic",
            "el": "greek", "ar": "arabic", "fa": "arabic", "ur": "arabic",
            "he": "hebrew", "hi": "devanagari", "mr": "devanagari",
            "ne": "devanagari", "th": "thai", "ko": "hangul",
            "zh": "han", "ja": "kana",
        }.items() for x in pair]
    )
    want = expected[F.lower(lang)]
    # ja legitimately mixes kana+han: either dominant script is fine
    ja_ok = (F.lower(lang) == "ja") & script.isin("kana", "han")
    return (
        want.isNotNull()
        & (script != F.lit("unknown"))
        & (script != want)
        & ~ja_ok
    ).cast("boolean")
