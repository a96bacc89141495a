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


def test_host_quota_state_survives_micro_batches(spark, tmp_path):
    """applyInPandasWithState per-host quota: a host that used its quota in
    run 1 must emit NOTHING in run 2 — the counter lives in the state store,
    not in the micro-batch."""
    from final_ocr_spark.sources.synthetic_pages import gen_pages
    from final_ocr_spark.streaming.stateful import (
        host_quota_batch, host_quota_stream, with_host)

    in_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "gated_out")
    ckpt = str(tmp_path / "ckpt")

    first = gen_pages(spark, 80, seed=42, partitions=2)
    first.write.mode("append").parquet(in_dir)
    q = host_quota_stream(spark, in_dir, out_dir, ckpt, quota=5)
    q.awaitTermination(120)

    got1 = spark.read.parquet(out_dir)
    per_host1 = {r["host"]: r["n"] for r in
                 got1.groupBy("host").agg(__import__("pyspark").sql.functions
                                          .count("*").alias("n")).collect()}
    assert per_host1 and all(n <= 5 for n in per_host1.values())

    # second wave: same hosts return — quota must be enforced ACROSS runs
    gen_pages(spark, 80, seed=42, start=80, partitions=2).write.mode(
        "append").parquet(in_dir)
    q2 = host_quota_stream(spark, in_dir, out_dir, ckpt, quota=5)
    q2.awaitTermination(120)

    got2 = spark.read.parquet(out_dir)
    from pyspark.sql import functions as F
    per_host2 = {r["host"]: r["n"] for r in
                 got2.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 5 for n in per_host2.values())  # never exceeds, ever

    # total per host == min(quota, total arrivals per host) — state counted
    both = gen_pages(spark, 80, seed=42, partitions=2).unionByName(
        gen_pages(spark, 80, seed=42, start=80, partitions=2))
    arrivals = {r["host"]: r["n"] for r in with_host(both).groupBy("host")
                .agg(F.count("*").alias("n")).collect()}
    for host, n in arrivals.items():
        assert per_host2.get(host, 0) == min(5, n), host

    # batch backfill form agrees on counts
    batch_counts = {r["host"]: r["n"] for r in
                    host_quota_batch(both, quota=5).groupBy("host")
                    .agg(F.count("*").alias("n")).collect()}
    assert batch_counts == per_host2


def test_host_quota_stream_multi_chunk_determinism(spark, tmp_path):
    """Round-2 review regression: with Arrow batches far smaller than a
    host's group, the quota must still select the globally (warc_ts, url)
    earliest rows — per-chunk selection would depend on Arrow chunking."""
    from pyspark.sql import functions as F

    from final_ocr_spark.sources.synthetic_pages import gen_pages
    from final_ocr_spark.streaming.stateful import host_quota_batch, host_quota_stream

    in_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "gated_out")
    ckpt = str(tmp_path / "ckpt")
    gen_pages(spark, 120, seed=7, partitions=1).write.parquet(in_dir)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        q = host_quota_stream(spark, in_dir, out_dir, ckpt, quota=4)
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    got = {(r["host"], r["url"]) for r in spark.read.parquet(out_dir).collect()}
    want = {(r["host"], r["url"]) for r in
            host_quota_batch(spark.read.parquet(in_dir), quota=4).collect()}
    assert got == want


def test_stream_extract_drops_in_batch_duplicates(spark, tmp_path):
    """The watermarked dropDuplicates must collapse exact (url, warc_ts)
    duplicates inside a micro-batch; corpus-level latest-wins across far
    apart re-crawls stays a batch-dedup concern (module docstring)."""
    from final_ocr_spark.sources.synthetic_pages import gen_pages
    from final_ocr_spark.streaming.stream_extract import stream_extract_pages

    in_dir = str(tmp_path / "pages_in")
    pages = gen_pages(spark, 30, seed=3, partitions=1)
    pages.write.mode("append").parquet(in_dir)
    pages.write.mode("append").parquet(in_dir)  # the whole corpus duplicated
    q = stream_extract_pages(
        spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    # the dedup key is (url, warc_ts): the doubled corpus collapses back to
    # one row per original page (the generator itself plants same-url
    # re-crawls with different warc_ts — those legitimately survive)
    assert out.count() == 30
    assert out.select("url", "warc_ts").distinct().count() == 30
