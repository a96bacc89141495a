"""The flagship operator: pages → extracted, Arrow-batched, zero per-row Python.

Replaces the reference's sequential per-file loop (ocr2.py:589-597) with
partition parallelism: one ``mapInPandas`` stage runs the pure-Python
extraction core (final_ocr_spark.extract) over Arrow record batches.

Physical plan shape (SURVEY §4.4):

    scan pages (column-pruned: url, html, text, lang [+warc_ts for dedup])
      → optional latest-wins dedup (shuffle on url)
      → salted repartition(P, xxhash64(url, salt)) — spreads compute-skewed
        hosts/documents that AQE's size-based skew split cannot see
      → mapInPandas extract (Python worker, Arrow batches)
      → result

The cheap guards (null/empty html AND null text ⇒ skip) stay as Column
expressions *outside* the UDF so Catalyst pushes them into the scan
(reference analog: existence check before decode, ocr.py:54-62 — SURVEY §4.1).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from final_ocr_spark.schema import EXTRACTED_COLUMNS, EXTRACTED_SCHEMA


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # import inside the worker so the pure-Python core (and its compiled
    # regexes) loads once per Python worker process, not per batch
    from final_ocr_spark.extract.dispatch import extract_document

    for pdf in batches:
        recs = []
        urls = pdf["url"].tolist()
        htmls = pdf["html"].tolist()
        texts = pdf["text"].tolist() if "text" in pdf else [None] * len(urls)
        langs = pdf["lang"].tolist() if "lang" in pdf else [None] * len(urls)
        for url, html, text, lang in zip(urls, htmls, texts, langs):
            rec = extract_document(
                bytes(html) if html is not None else None,
                text if isinstance(text, str) else None,
                lang if isinstance(lang, str) else None,
            )
            rec["url"] = url
            recs.append(rec)
        yield pd.DataFrame(recs, columns=EXTRACTED_COLUMNS)


def extract_pages(
    pages: DataFrame,
    *,
    dedup: bool = True,
    partitions: int | None = None,
    salt_buckets: int = 8,
    drop_empty: bool = False,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → extracted table.

    ``dedup=True`` applies latest-wins per url first (SURVEY A6) so each url
    is extracted exactly once. ``salt_buckets`` spreads one hot host's pages
    over several partitions (compute-skew salting, SURVEY §4.3).

    ``drop_empty=False`` (default) keeps fully-null rows as quarantined
    ``doc_kind='empty'`` output rows — every input url is accounted for in
    the output table. Set True to filter them before the UDF (the pushdown
    guard, reference analog ocr.py:54-62) when row accounting is not needed.
    """
    df = pages
    if dedup:
        from final_ocr_spark.operators.dedup import dedup_latest

        df = dedup_latest(df, key="url", order_col="warc_ts")

    # column pruning: the UDF needs exactly these four
    df = df.select("url", "html", "text", "lang")

    if drop_empty:
        # cheap guard before the expensive stage (Column expr ⇒ pushdown)
        df = df.filter(F.col("html").isNotNull() | F.col("text").isNotNull())

    if partitions:
        # salted repartition: hash(url) alone would put all of one host's
        # pages (same hash bucket under host-partitioned layouts) together;
        # xxhash64(url, salt) with a per-row deterministic salt spreads them.
        salt = F.pmod(F.xxhash64(F.col("url"), F.lit("s")), F.lit(salt_buckets))
        df = df.repartition(partitions, F.xxhash64("url"), salt)

    return df.mapInPandas(_extract_batches, schema=EXTRACTED_SCHEMA)
