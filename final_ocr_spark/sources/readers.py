"""Input connectors (SURVEY §2.1 S1-S3).

The reference's only source is a directory glob of image files
(ocr2.py:569-575). Two cluster-grade equivalents:

* ``read_pages_table`` — the mandated shape: a parquet/Iceberg-layout table
  of pages (the engine's primary input).
* ``read_binary_files`` — raw-file ingest parity: ``binaryFile`` format with
  a path glob, mapped into the pages schema (one file = one document, path =
  url, modificationTime = warc_ts). The existence/readability guard S3 is a
  Column expression so it pushes into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_pages_table(spark: SparkSession, path: str) -> DataFrame:
    """Primary source: pages(url, warc_ts, html, text, lang) parquet dir."""
    return spark.read.parquet(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str = "*.{html,htm,pdf}"
) -> DataFrame:
    """Raw-file ingest (S1/S2): one file = one page row.

    The reference's sequential glob loop becomes scan parallelism; its
    per-file existence check (S3, ocr.py:54-56) becomes the isNotNull guard
    which Catalyst pushes down.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    ).filter(F.col("html").isNotNull())
