"""Fixed engine schemas (SURVEY §1.4).

The reference's schema is fixed by code, not inferred (ocr2.py:25-51 columnar
dict-of-lists; ocr.py:1091-1095 fixed column order); we pin ours the same way
as StructType constants. Missing fields are null, never errors.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Mandated input shape (BASELINE.json input_hint).
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

SPAN_TYPE = StructType(
    [
        StructField("start", IntegerType(), False),
        StructField("end", IntegerType(), False),
        StructField("kind", StringType(), False),
    ]
)

# Output contract (FIXTURES.md §2): byte-identity on extracted_text per url.
EXTRACTED_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),  # lineage + late dedup key
        StructField("extracted_text", StringType(), True),
        StructField("spans", ArrayType(SPAN_TYPE), True),
        StructField("lang", StringType(), True),
        # quality/diagnostic columns (generalizes the reference's
        # completeness_score fixture, invoice_analysis_20250921_124128.json:148)
        StructField("n_blocks", IntegerType(), True),
        StructField("n_chars", IntegerType(), True),
        StructField("doc_kind", StringType(), True),  # 'html' | 'pdf' | 'empty'
        StructField("error", StringType(), True),  # per-row quarantine, never task fail
    ]
)

# Arrow-friendly pandas column order for the extraction UDF output.
EXTRACTED_COLUMNS = [f.name for f in EXTRACTED_SCHEMA.fields]

# Manifest table for checkpoint/resume (SURVEY §4.3).
MANIFEST_SCHEMA = StructType(
    [
        StructField("partition_id", IntegerType(), False),
        StructField("status", StringType(), False),  # 'done'
        StructField("row_count", LongType(), True),
        StructField("byte_count", LongType(), True),
        StructField("app_id", StringType(), True),
        StructField("code_version", StringType(), True),
        StructField("input_snapshot", StringType(), True),
    ]
)
