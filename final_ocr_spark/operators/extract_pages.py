"""The flagship operator: pages → extracted, Arrow-batched, zero per-row Python.

Replaces the reference's sequential per-file loop (ocr2.py:589-597) with
partition parallelism: one ``mapInPandas`` stage runs the pure-Python
extraction core (final_ocr_spark.extract) over Arrow record batches.

Physical plan shape — **extract first, dedup after** (SURVEY §4.4, revised
after profiling):

    scan pages (column-pruned: url, warc_ts, html, text, lang)
      → [optional salted repartition — only when the input layout is skewed;
         scan splits already provide parallelism for well-laid-out tables]
      → mapInPandas extract (Python worker, Arrow batches; warc_ts passthrough)
      → optional latest-wins dedup on the EXTRACTED output

Why dedup after extraction: dedup needs a hash(url) shuffle either way, but
the extracted output is ~4× smaller than the html payload — at 100 TB input
that is the difference between shuffling 100 TB and shuffling ~25 TB. The
cost is re-extracting duplicate urls (a few % of rows); extraction is
deterministic per row, so the final table is identical either way. Measured
in-sandbox: dedup-first shuffles the blob column twice (window + salt) and
spends more JVM time than the extraction itself.

The cheap guards (null checks) stay as Column expressions *outside* the UDF
so Catalyst pushes them into the scan (reference analog: existence check
before decode, ocr.py:54-62 — SURVEY §4.1).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from final_ocr_spark.schema import EXTRACTED_COLUMNS, EXTRACTED_SCHEMA


def _extract_batches(
    batches: Iterator[pd.DataFrame], _latency_acc=None
) -> Iterator[pd.DataFrame]:
    # import inside the worker so the pure-Python core (and its compiled
    # regexes) loads once per Python worker process, not per batch
    from final_ocr_spark.extract.dispatch import extract_document

    if _latency_acc is not None:
        from time import perf_counter

        from final_ocr_spark.plans.latency import record_ms

    for pdf in batches:
        _t0 = perf_counter() if _latency_acc is not None else 0.0
        urls = pdf["url"].tolist()
        n = len(urls)
        tss = pdf["warc_ts"].tolist() if "warc_ts" in pdf else [None] * n
        htmls = pdf["html"].tolist()
        texts = pdf["text"].tolist() if "text" in pdf else [None] * n
        langs = pdf["lang"].tolist() if "lang" in pdf else [None] * n
        # columnar batch build (dict-of-lists) — constructing pandas from a
        # list of per-row dicts measured ~0.5 ms/doc, comparable to the
        # extraction itself (and is literally the reference's variant-B
        # columnar batch, ocr2.py:25-51)
        cols: dict[str, list] = {name: [None] * n for name in EXTRACTED_COLUMNS}
        for i in range(n):
            rec = extract_document(
                bytes(htmls[i]) if htmls[i] is not None else None,
                texts[i] if isinstance(texts[i], str) else None,
                langs[i] if isinstance(langs[i], str) else None,
            )
            rec["url"] = urls[i]
            rec["warc_ts"] = tss[i]
            for name in EXTRACTED_COLUMNS:
                cols[name][i] = rec[name]
        if _latency_acc is not None:
            record_ms(_latency_acc, (perf_counter() - _t0) * 1000.0)
        yield pd.DataFrame(cols, columns=EXTRACTED_COLUMNS)


def extract_pages(
    pages: DataFrame,
    *,
    dedup: bool = True,
    partitions: int | None = None,
    salt_buckets: int = 8,
    drop_empty: bool = False,
    latency_acc=None,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → extracted table.

    ``dedup=True`` applies latest-wins per url on the extracted output
    (SURVEY A6) so each url appears exactly once. ``partitions`` forces a
    salted repartition BEFORE extraction — use it when the input layout
    clusters hot hosts (compute skew the scan splits won't spread); leave
    None to inherit scan/source parallelism with zero pre-shuffle.

    ``drop_empty=False`` (default) keeps fully-null rows as quarantined
    ``doc_kind='empty'`` output rows — every input url is accounted for in
    the output table. Set True to filter them before the UDF (the pushdown
    guard, reference analog ocr.py:54-62) when row accounting is not needed.

    ``latency_acc`` (from plans/latency.py:latency_histogram) records a
    per-Arrow-batch UDF-latency histogram for p50/p99 reporting
    (BASELINE.md protocol #4); None (default) keeps the hot loop untouched.
    """
    # column pruning: the UDF needs exactly these five
    df = pages.select("url", "warc_ts", "html", "text", "lang")

    if drop_empty:
        # cheap guard before the expensive stage (Column expr ⇒ pushdown)
        df = df.filter(F.col("html").isNotNull() | F.col("text").isNotNull())

    if partitions:
        # salted repartition: xxhash64(url) alone would keep one hot host's
        # pages together under host-clustered layouts; the deterministic salt
        # spreads them over `salt_buckets` partitions (compute-skew salting,
        # SURVEY §4.3 — invisible to AQE's size-based skew detection)
        salt = F.pmod(F.xxhash64(F.col("url"), F.lit("s")), F.lit(salt_buckets))
        df = df.repartition(partitions, F.xxhash64("url"), salt)

    if latency_acc is not None:
        def _fn(it, _acc=latency_acc):
            return _extract_batches(it, _acc)
    else:
        _fn = _extract_batches
    ext = df.mapInPandas(_fn, schema=EXTRACTED_SCHEMA)

    if dedup:
        from final_ocr_spark.operators.dedup import dedup_latest

        # shuffle the *extracted* rows (≈4× smaller than html) — latest-wins
        # per url; deterministic tiebreak inside dedup_latest
        ext = dedup_latest(ext, key="url", order_col="warc_ts")

    return ext


def quarantine_report(ext: DataFrame) -> DataFrame:
    """(error_class, doc_kind, n_docs, sample_error, sample_urls) rollup
    over an extracted table — the operational view of what extraction
    rejected and why (error is null rows are the healthy corpus and are
    excluded). One map-side-combinable aggregation whose state is BOUNDED
    per group (count + min/max exemplars — collect_set over a hot error
    class would hold millions of urls in aggregation state at corpus
    scale). Grouping is on the NORMALIZED class — the prefix before any
    ':' — because raw messages embed per-document detail (offsets, byte
    values: `ValueError: ... at offset 91234`), which would make a
    raw-message groupBy corpus-proportional; one full raw message per
    class survives as ``sample_error``."""
    error_class = F.regexp_extract("error", r"^([^:]*)", 1)
    return (
        ext.filter(F.col("error").isNotNull())
        .groupBy(error_class.alias("error_class"), "doc_kind")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("error").alias("sample_error"),
            F.array_distinct(
                F.array(F.min("url"), F.max("url"))
            ).alias("sample_urls"),
        )
        .orderBy(F.desc("n_docs"))
    )
