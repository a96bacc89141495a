"""Generate the pinned golden fixtures (run once; output is committed).

Mirrors the reference's golden-output discipline (SURVEY §0 fact 2): fixtures
are produced by the deterministic pipeline once and frozen; any later change
to extraction semantics must update them *deliberately*.

Uses the pure-Python path (gen_page_row + extract_document) so the Spark e2e
test doubles as a Spark-vs-pure-Python equivalence proof.

Usage: python -m tests.make_goldens
"""

from __future__ import annotations

import json
import pathlib

SEED = 42
N_DOCS = 64
GOLDEN = pathlib.Path(__file__).parent / "golden" / "extracted_sample.json"


def build_goldens() -> dict:
    from final_ocr_spark.extract.dispatch import extract_document
    from final_ocr_spark.sources.synthetic_pages import gen_page_row

    # latest-wins per url (dedup A6) — same rule the Spark operator applies
    latest: dict[str, dict] = {}
    for i in range(N_DOCS):
        row = gen_page_row(SEED, i)
        if row["url"] not in latest or row["warc_ts"] > latest[row["url"]]["warc_ts"]:
            latest[row["url"]] = row

    out = {}
    for url in sorted(latest):
        row = latest[url]
        rec = extract_document(row["html"], row["text"], row["lang"])
        out[url] = {
            "extracted_text": rec["extracted_text"],
            "spans": rec["spans"],
            "lang": rec["lang"],
            "doc_kind": rec["doc_kind"],
        }
    return out


if __name__ == "__main__":
    goldens = build_goldens()
    GOLDEN.parent.mkdir(parents=True, exist_ok=True)
    # canonical JSON: sort_keys + ensure_ascii=False (mirrors ocr2.py:699-704)
    GOLDEN.write_text(
        json.dumps(goldens, sort_keys=True, ensure_ascii=False, indent=1),
        encoding="utf-8",
    )
    print(f"wrote {GOLDEN} ({len(goldens)} urls)")
