"""Incremental extraction via Structured Streaming (SURVEY §2.8).

The reference is pure batch; its incremental analog is "process the files
that appeared since last run" — exactly ``Trigger.AvailableNow`` over a file
source: each invocation drains all new input files, checkpoints progress, and
stops. The extraction UDF is the SAME ``_extract_batches`` the batch operator
uses; streaming changes only the source/sink plumbing.

Dedup semantics in streaming: exact latest-wins needs global state per url,
which is unbounded; instead we ``dropDuplicates`` within a ``warc_ts``
watermark (bounded state) and leave corpus-level latest-wins to the batch
dedup operator downstream — the standard lambda-ish split, stated honestly.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from final_ocr_spark.operators.extract_pages import _extract_batches
from final_ocr_spark.schema import EXTRACTED_SCHEMA, PAGES_SCHEMA


def stream_extract_pages(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    watermark: str = "1 hour",
    dedup_within_watermark: bool = True,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """readStream(pages parquet dir) → extract → writeStream(parquet).

    ``available_now=True`` drains everything currently present then stops —
    the incremental batch-resume mode. Set False with
    ``max_files_per_trigger`` for a continuous micro-batch pipeline.
    """
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_dir)

    if dedup_within_watermark:
        pages = pages.withWatermark("warc_ts", watermark).dropDuplicates(["url", "warc_ts"])

    ext = pages.mapInPandas(_extract_batches, schema=EXTRACTED_SCHEMA)

    writer = (
        ext.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
