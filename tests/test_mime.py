"""Magic-byte MIME sniffing — signature goldens, textiness fallbacks,
split-multibyte head, and the zero-UDF/zero-exchange plan shape."""

import gzip

import pytest
from pyspark.sql import functions as F

from final_ocr_spark.operators.mime import route_for_mime, sniff_mime, sniff_pages

CASES = [
    ("pdf", b"%PDF-1.7 blah", "extract_pdf"),
    ("pdftok", b"%PDFTOK 1\nword 1 2 3 4", "extract_pdf"),
    ("png", bytes.fromhex("89504E470D0A1A0A") + b"x", "image"),
    ("jpeg", b"\xff\xd8\xff\xe0JFIF", "image"),
    ("gif", b"GIF89a\x01\x00", "image"),
    ("tiff", b"II*\x00rest", "image"),
    ("tiff", b"MM\x00*rest", "image"),
    ("bmp", b"BM\x00\x00", "image"),
    ("webp", b"RIFF\x00\x00\x00\x00WEBPVP8 ", "image"),
    ("wav", b"RIFF\x00\x00\x00\x00WAVEfmt ", "audio"),
    ("mp3", b"ID3\x04tag", "audio"),
    ("ogg", b"OggS\x00", "audio"),
    ("flac", b"fLaC\x00", "audio"),
    ("mp4", b"\x00\x00\x00\x18ftypmp42", "video"),
    ("webm", b"\x1a\x45\xdf\xa3ebml", "video"),
    ("gzip", gzip.compress(b"hello"), "archive"),
    ("zip", b"PK\x03\x04zzz", "archive"),
    ("zstd", bytes.fromhex("28B52FFD") + b"z", "archive"),
    ("html", b"  <!DOCTYPE html><html>", "extract_html"),
    ("html", b"\xef\xbb\xbf<html lang=en>", "extract_html"),
    ("html", b"<div class=x>hi</div>", "extract_html"),
    ("text", "plain prose without markup — é and ünïcode".encode(),
     "extract_html"),
    ("binary", b"\x00\x01\x02\xfe\xff\x80\x81garbage", "quarantine"),
]


@pytest.fixture(scope="module")
def sniffed(spark):
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, (_, b, _) in enumerate(CASES)]
        + [(900, None), (901, bytearray(b""))],
        "id int, html binary",
    )
    return {r["id"]: (r["mime"], r["doc_route"])
            for r in sniff_pages(df).collect()}


def test_signatures_and_routes(sniffed):
    for i, (label, _, route) in enumerate(CASES):
        assert sniffed[i] == (label, route), (i, CASES[i][0])


def test_null_and_empty(sniffed):
    assert sniffed[900] == (None, None)
    assert sniffed[901] == (None, None)


def test_multibyte_split_at_head_boundary(spark):
    # 1 KB cut lands mid-é: the trimmed revalidation must still call it text
    body = (b"x" * 1023) + "é".encode() + " more text".encode()
    df = spark.createDataFrame([(bytearray(body),)], "html binary")
    assert df.select(sniff_mime("html").alias("m")).first()["m"] == "text"


def test_plan_pure_codegen(spark):
    df = spark.createDataFrame([(bytearray(b"x"),)], "html binary")
    plan = sniff_pages(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan


def test_route_unknown_label_null(spark):
    df = spark.createDataFrame([("nonsense",), (None,)], "m string")
    got = [r["r"] for r in df.select(route_for_mime("m").alias("r")).collect()]
    assert got == [None, None]


def test_pipeline_mime_gate(spark):
    """mime_gate sheds media payloads before extraction; html and text-only
    rows pass through."""
    import datetime

    from final_ocr_spark.pipeline import corpus_pipeline

    ts = datetime.datetime(2026, 1, 1)
    body = ("<html><body><p>genuine page with plenty of readable english "
            "prose so every quality gate is satisfied here today</p>"
            "</body></html>").encode()
    rows = [
        ("http://a.com/html", ts, body, None, None),
        ("http://a.com/png", ts,
         bytes.fromhex("89504E470D0A1A0A") + b"fakeimg", None, None),
        ("http://a.com/textonly", ts, None,
         "plain text fallback row with enough english words to pass the "
         "quality gates of the corpus pipeline easily", None),
    ]
    pages = spark.createDataFrame(
        [(u, t, bytearray(b) if b else None, x, l) for u, t, b, x, l in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = corpus_pipeline(
        pages, min_quality=0.0, gopher=False, redact=False,
        near_dup=False, mime_gate=True,
    )
    urls = {r["url"] for r in out.select("url").collect()}
    assert "http://a.com/png" not in urls
    assert {"http://a.com/html", "http://a.com/textonly"} <= urls
