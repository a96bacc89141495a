"""page_metadata: head-metadata extraction over the pages table.

A separate Arrow-batched stage from :func:`extract_pages` on purpose — the
metadata prescan is ~10× cheaper than full content extraction, and the two
outputs serve different consumers (indexing/filter gates vs the training
corpus). Running metadata alone reads ONLY (url, html) — column pruning
keeps text/lang out of the scan entirely.

Scale shape: scan → one mapInPandas stage, zero shuffles. The output is a
slim table (a dozen short strings per url); downstream gates
(:func:`indexable_pages`) are plain Column filters over it.

Reference analog: the per-document header-field regex cascade
(ocr.py:176-198) — generalized from OCR text lines to DOM metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# column order is the UDF output contract — keep in sync with _META_SCHEMA
_META_COLUMNS = [
    "url",
    "title",
    "description",
    "canonical_url",
    "lang_attr",
    "og_title",
    "og_site_name",
    "og_type",
    "published_time",
    "noindex",
    "nofollow",
    "h1_count",
    "charset",
    "charset_source",
    "error",
]

_META_SCHEMA = (
    "url string, title string, description string, canonical_url string, "
    "lang_attr string, og_title string, og_site_name string, og_type string, "
    "published_time string, noindex boolean, nofollow boolean, h1_count int, "
    "charset string, charset_source string, error string"
)


def _meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # worker-side import: compiled regexes load once per Python worker
    from final_ocr_spark.extract.metadata import parse_metadata

    for pdf in batches:
        urls = pdf["url"].tolist()
        htmls = pdf["html"].tolist()
        n = len(urls)
        cols: dict[str, list] = {name: [None] * n for name in _META_COLUMNS}
        for i in range(n):
            try:
                rec = parse_metadata(htmls[i])
                err = None
            except Exception as e:  # per-row quarantine, never a task failure
                rec = parse_metadata(None)
                err = f"{type(e).__name__}: {e}"[:500]
            rec["url"] = urls[i]
            rec["error"] = err
            for name in _META_COLUMNS:
                cols[name][i] = rec[name]
        # booleans stay non-null even for quarantined rows (rec defaults)
        yield pd.DataFrame(cols, columns=_META_COLUMNS)


def page_metadata(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) → per-url metadata table (schema above).

    Pure map stage: no shuffle, no state; every input url produces exactly
    one output row (null-html rows yield all-null fields, error=null —
    accounted, not dropped)."""
    return pages.select("url", "html").mapInPandas(_meta_batches, schema=_META_SCHEMA)


def indexable_pages(
    pages: DataFrame, meta: DataFrame, *, respect_canonical: bool = False
) -> DataFrame:
    """Filter pages to those whose metadata allows indexing/training use.

    Drops rows whose metadata says ``noindex`` and, with
    ``respect_canonical=True``, rows that declare a canonical url DIFFERENT
    from their own (duplicate-content hint — the canonical copy stays).

    Join shape: the metadata gate columns are slim (url + boolean + one
    string); the join is an equi-join on url. When ``meta`` derives from a
    small crawl slice Spark broadcasts it under AQE; at corpus scale both
    sides are url-partitioned tables and this is the standard co-located
    equi-join — the html payload crosses the exchange once, which is why the
    gate belongs BEFORE extraction in the pipeline."""
    gate = meta.select("url", "noindex", "canonical_url")
    cond = ~F.col("noindex")
    if respect_canonical:
        cond = cond & (
            F.col("canonical_url").isNull()
            | (F.col("canonical_url") == F.col("url"))
        )
    keep = gate.filter(cond).select("url")
    return pages.join(keep, on="url", how="left_semi")
