"""Structured Streaming extraction: AvailableNow drains new files, checkpoints
progress, and produces the same extraction results as the batch operator."""

from __future__ import annotations


def test_stream_extract_available_now(spark, tmp_path):
    from final_ocr_spark.sources.synthetic_pages import gen_pages
    from final_ocr_spark.streaming.stream_extract import stream_extract_pages

    in_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "extracted_out")
    ckpt = str(tmp_path / "ckpt")

    # first micro-corpus lands
    gen_pages(spark, 60, seed=42, partitions=2).write.mode("append").parquet(in_dir)
    q = stream_extract_pages(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == 60

    # more files arrive; a second AvailableNow run drains ONLY the new ones
    # (same seed, disjoint doc-id range — different seeds can collide on
    # (url, warc_ts) because each seed redraws the hot-host distribution)
    gen_pages(spark, 40, seed=42, start=60, partitions=2).write.mode("append").parquet(in_dir)
    q2 = stream_extract_pages(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    n2 = spark.read.parquet(out_dir).count()
    assert n2 == 100

    # streamed extraction text matches the batch operator per url
    from final_ocr_spark.operators.extract_pages import extract_pages

    batch = {
        r["url"]: r["extracted_text"]
        for r in extract_pages(gen_pages(spark, 60, seed=42, partitions=2), dedup=False).collect()
    }
    streamed = {
        r["url"]: r["extracted_text"]
        for r in spark.read.parquet(out_dir).collect()
        if r["url"] in batch
    }
    assert streamed == batch
