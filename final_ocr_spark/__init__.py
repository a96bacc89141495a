"""final_ocr_spark — a PySpark-native web-scale document-content extraction engine.

Generalizes the reference single-machine invoice-OCR dataflow
(/root/reference/ocr.py:1221 `process_invoice_image`;
/root/reference/ocr2.py:559 `process_invoices`) into a cluster-scale
main-content extractor over Common-Crawl-style page tables:

    pages(url string, warc_ts timestamp, html binary, text string, lang string)
        -> extracted(url string, extracted_text string,
                     spans array<struct<start:int,end:int,kind:string>>,
                     lang string)

All per-document compute runs inside Arrow-batched pandas UDF stages
(``mapInPandas``) — zero per-row Python at the Spark layer. Everything else
(filters, cascades, joins, rollups, dedup) is declarative DataFrame/SQL so
Catalyst handles pushdown, pruning, and AQE.
"""

__version__ = "0.1.0"
