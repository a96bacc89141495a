"""Per-document format dispatch + best-of fallback cascade.

Maps the reference's content-type dispatch (the extension glob, ocr2.py:569-575)
and its best-of-K text recovery (retry cascade keeping the longest result,
ocr.py:76-92; 3-config argmax at ocr2.py:157-183): we sniff the payload
(PDFTOK magic vs HTML), run the matching branch, and fall back to the
pre-extracted ``text`` column when the branch yields something shorter — the
same ``max_by(candidate, len(candidate))`` selection rule with the same
quality score the reference used (``len(text)``, ocr.py:79).

Errors never propagate: a failing document yields an ``error`` string and a
null text (reference: print-and-continue at ocr2.py:549-551).
"""

from __future__ import annotations

from final_ocr_spark.extract.html_main import extract_html
from final_ocr_spark.extract.langid import detect_lang
from final_ocr_spark.extract.layout_xycut import PDFTOK_MAGIC, extract_pdf_tokens
from final_ocr_spark.extract.spans import label_value_spans

# fallback threshold: mirrors the reference's `len(text) < 100` retry gate
# (ocr.py:76) — if the primary branch recovers less than this and the
# pre-extracted text column is longer, prefer the column.
MIN_PRIMARY_CHARS = 100


def extract_document(
    html: bytes | None, text_fallback: str | None, lang_in: str | None
) -> dict:
    """One document → extracted record dict (schema.EXTRACTED_SCHEMA fields,
    minus url). Pure, deterministic, never raises."""
    try:
        if html is None or len(html) == 0:
            if text_fallback:
                body = " ".join(str(text_fallback).split())
                spans = [(0, len(body), "paragraph")] if body else []
                kind = "textcol"
            else:
                return {
                    "extracted_text": None, "spans": [], "lang": lang_in,
                    "n_blocks": 0, "n_chars": 0, "doc_kind": "empty",
                    "error": "empty-document",
                }
        elif html[: len(PDFTOK_MAGIC)] == PDFTOK_MAGIC:
            body, spans, _n = extract_pdf_tokens(html)
            kind = "pdf"
        else:
            body, spans, _n = extract_html(html)
            kind = "html"

        # best-of fallback cascade (argmax by length, reference semantics)
        if (
            kind != "textcol"
            and len(body) < MIN_PRIMARY_CHARS
            and text_fallback
            and len(" ".join(str(text_fallback).split())) > len(body)
        ):
            body = " ".join(str(text_fallback).split())
            spans = [(0, len(body), "paragraph")] if body else []
            kind = kind + "+textcol"

        value_spans = label_value_spans(body)
        all_spans = sorted(spans + value_spans)
        lang = lang_in if lang_in else detect_lang(body)
        return {
            "extracted_text": body,
            "spans": [
                {"start": int(s), "end": int(e), "kind": k} for s, e, k in all_spans
            ],
            "lang": lang,
            "n_blocks": len(spans),
            "n_chars": len(body),
            "doc_kind": kind,
            "error": None,
        }
    except Exception as exc:  # per-row quarantine — never fail the task
        return {
            "extracted_text": None, "spans": [], "lang": lang_in,
            "n_blocks": 0, "n_chars": 0, "doc_kind": "error",
            "error": f"{type(exc).__name__}: {exc}"[:500],
        }
