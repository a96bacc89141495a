"""extract_pages operator-level extras (latency accumulator)."""


def test_latency_histogram_accumulator(spark):
    """BASELINE.md protocol #4: per-batch UDF latency via a BOUNDED
    histogram accumulator (48 buckets at any corpus size)."""
    from final_ocr_spark.operators.extract_pages import extract_pages
    from final_ocr_spark.plans.latency import (
        bucket_of, latency_histogram, percentiles,
    )
    from final_ocr_spark.sources.synthetic_pages import gen_pages

    acc = latency_histogram(spark.sparkContext)
    extract_pages(gen_pages(spark, 300, seed=3), dedup=False,
                  latency_acc=acc).count()
    stats = percentiles(acc.value)
    assert stats["batches"] > 0
    assert stats["p50"] is not None and stats["p99"] >= stats["p50"] > 0

    # bucket math: monotone, bounded, conservative upper-edge estimate
    assert bucket_of(0.5) == 0 and bucket_of(1.0) == 0
    assert bucket_of(1e9) == 47
    last = -1
    for ms in (1.1, 2, 5, 10, 100, 1000, 2500):
        b = bucket_of(ms)
        assert b >= last
        last = b
    assert percentiles([0] * 48) == {
        "batches": 0, "overflow": 0, "p50": None, "p99": None,
    }
    # overflow bucket has no upper edge: report None, not an underestimate
    over = [0] * 48
    over[47] = 10
    st = percentiles(over)
    assert st["p50"] is None and st["p99"] is None and st["overflow"] == 10


def test_quarantine_report(spark):
    import datetime

    from final_ocr_spark.operators.extract_pages import (
        extract_pages,
        quarantine_report,
    )

    ts = datetime.datetime(2026, 1, 1)
    rows = [
        ("http://ok.com/1", ts, b"<html><body><p>fine page with plenty of "
         b"text to extract</p></body></html>", None, None),
        ("http://null.com/1", ts, None, None, None),
        ("http://null.com/2", ts, None, None, None),
    ]
    pages = spark.createDataFrame(
        [(u, t, bytearray(b) if b else None, x, l) for u, t, b, x, l in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    rep = quarantine_report(extract_pages(pages, dedup=True)).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r["error_class"] == "empty-document" and r["n_docs"] == 2
    assert r["sample_error"] == "empty-document"
    assert set(r["sample_urls"]) == {"http://null.com/1", "http://null.com/2"}


def test_quarantine_report_normalizes_error_classes(spark):
    # raw messages embed per-doc detail ('X: at offset N'); the groupBy
    # must be on the class prefix or the report is corpus-proportional
    import pyspark.sql.functions as F

    from final_ocr_spark.operators.extract_pages import quarantine_report

    ext = spark.createDataFrame(
        [(f"http://e.com/{i}", f"ValueError: bad byte at offset {i}")
         for i in range(50)] + [("http://ok.com/1", None)],
        "url string, error string",
    ).withColumn("doc_kind", F.lit("html"))
    rep = quarantine_report(ext).collect()
    assert len(rep) == 1
    assert rep[0]["error_class"] == "ValueError" and rep[0]["n_docs"] == 50
    assert rep[0]["sample_error"].startswith("ValueError: bad byte")
