"""WARC ingestion source: framing round-trip, HTTP handling, quarantine."""

from __future__ import annotations

import gzip

from final_ocr_spark.sources.warc import (
    _dechunk,
    _http_body,
    iter_warc_records,
    read_warc,
    write_warc_bytes,
)

_RECS = [
    {"url": "warcinfo:one", "date": "2017-03-06T04:02:06Z",
     "body": b"software: test", "warc_type": "warcinfo"},
    {"url": "http://a.example/x", "date": "2017-03-06T04:02:06Z",
     "body": b"<html><body><p>hello alpha this paragraph is long enough to keep</p></body></html>"},
    {"url": "http://b.example/y", "date": "2017-03-06T04:02:07Z",
     "body": b"<html><body><p>hello beta chunked and also long enough to keep</p></body></html>",
     "chunked": True},
    {"url": "http://c.example/z", "date": "not-a-date",
     "body": b"<html>bad date still a page</html>", "http_status": 404},
]


def test_iter_warc_records_roundtrip_both_compressions():
    for gz in (True, False):
        blob = write_warc_bytes(_RECS, per_record_gzip=gz)
        recs = list(iter_warc_records(blob))
        assert [r["warc-type"] for r in recs] == [
            "warcinfo", "response", "response", "response"
        ]
        assert recs[1]["warc-target-uri"] == "http://a.example/x"
        # payload is raw HTTP; body recovered via _http_body
        assert _http_body(recs[1]["payload"]) == _RECS[1]["body"]
        assert _http_body(recs[2]["payload"]) == _RECS[2]["body"]  # de-chunked


def test_dechunk_edge_cases():
    assert _dechunk(b"5\r\nhello\r\n0\r\n\r\n") == b"hello"
    # two chunks with extension on the first
    assert _dechunk(b"3;ext=1\r\nabc\r\n2\r\nde\r\n0\r\n\r\n") == b"abcde"
    # broken framing: returned as-is
    junk = b"zz\r\nnothex"
    assert _dechunk(junk) == junk


def test_iter_warc_records_bad_framing_raises():
    try:
        list(iter_warc_records(b"NOT-A-WARC\r\n\r\npayload"))
    except ValueError as e:
        assert "WARC version" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_read_warc_end_to_end(spark, tmp_path):
    (tmp_path / "seg-00000.warc.gz").write_bytes(write_warc_bytes(_RECS))
    (tmp_path / "seg-00001.warc").write_bytes(
        write_warc_bytes(
            [{"url": "http://d.example/w", "date": "2017-03-07T00:00:00Z",
              "body": b"<html>plain file</html>"}],
            per_record_gzip=False,
        )
    )
    (tmp_path / "broken.warc").write_bytes(b"garbage that is not warc\r\n\r\nx")

    out = read_warc(spark, str(tmp_path)).collect()
    pages = {r["url"]: r for r in out if r["error"] is None}
    errs = [r for r in out if r["error"] is not None]

    # warcinfo skipped; 3 responses from .gz + 1 from plain = 4 pages
    assert set(pages) == {
        "http://a.example/x", "http://b.example/y",
        "http://c.example/z", "http://d.example/w",
    }
    assert bytes(pages["http://a.example/x"]["html"]) == _RECS[1]["body"]
    assert bytes(pages["http://b.example/y"]["html"]) == _RECS[2]["body"]
    assert pages["http://a.example/x"]["warc_ts"] is not None
    # malformed WARC-Date nulls the timestamp, keeps the page (ANSI-safe)
    assert pages["http://c.example/z"]["warc_ts"] is None
    assert pages["http://a.example/x"]["text"] is None
    assert pages["http://a.example/x"]["lang"] is None
    # whole-file quarantine row for the broken archive
    assert len(errs) == 1 and "broken.warc" in errs[0]["url"]
    assert "warc-parse" in errs[0]["error"]


def test_read_warc_composes_with_extract(spark, tmp_path):
    (tmp_path / "seg.warc.gz").write_bytes(write_warc_bytes(_RECS))
    from final_ocr_spark.operators.extract_pages import extract_pages

    pages = read_warc(spark, str(tmp_path)).filter("error is null").drop("error")
    ext = extract_pages(pages, dedup=True, partitions=2)
    rows = {r["url"]: r for r in ext.collect()}
    assert "hello alpha" in rows["http://a.example/x"]["extracted_text"]


def test_corrupt_gzip_quarantines_not_raises(spark, tmp_path):
    # truncated member + corrupt bytes with a gzip magic: both must become
    # quarantine rows, never task failures (gzip raises EOFError/OSError/
    # zlib.error, not ValueError — regression pin for the except clause)
    good = write_warc_bytes(_RECS[:2])
    (tmp_path / "trunc.warc.gz").write_bytes(good[: len(good) // 2])
    (tmp_path / "corrupt.warc.gz").write_bytes(b"\x1f\x8b" + b"\x00" * 40)
    out = read_warc(spark, str(tmp_path)).collect()
    errs = {r["url"]: r["error"] for r in out if r["error"] is not None}
    assert len(errs) == 2
    assert all(e.startswith("warc-parse:") for e in errs.values())


def test_missing_target_uri_skipped():
    recs = list(iter_warc_records(write_warc_bytes([
        {"url": None, "date": "2024-01-01T00:00:00Z", "body": b"<html>x</html>"},
        _RECS[1],
    ])))
    assert len(recs) == 2 and "warc-target-uri" not in recs[0]
    from final_ocr_spark.sources.warc import _record_rows

    rows = list(_record_rows("p", write_warc_bytes([
        {"url": None, "date": "2024-01-01T00:00:00Z", "body": b"<html>x</html>"},
        _RECS[1],
    ]), ("response",)))
    assert [r["url"] for r in rows] == ["http://a.example/x"]


def test_content_encoding_bodies_decoded():
    import gzip as _gz
    body = b"<html><body><p>compressed body that must decode</p></body></html>"
    blob = write_warc_bytes([
        {"url": "http://g.example/", "date": "2024-01-01T00:00:00Z",
         "body": body, "content_encoding": "gzip"},
        {"url": "http://d.example/", "date": "2024-01-01T00:00:00Z",
         "body": body, "content_encoding": "deflate"},
    ])
    recs = list(iter_warc_records(blob))
    assert _http_body(recs[0]["payload"]) == body
    assert _http_body(recs[1]["payload"]) == body
    # undecodable claimed-gzip body: wire bytes pass through
    raw = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot-gzip-at-all"
    assert _http_body(raw) == b"not-gzip-at-all"


def test_streaming_parse_records_span_decompress_slices(monkeypatch):
    # whole-file gzip (one member) with records far larger than the feed
    # slice: the incremental parser must reassemble records across chunk
    # boundaries byte-identically
    import gzip as _gz

    from final_ocr_spark.sources import warc as warc_mod

    big = [
        {"url": f"http://s.example/{i}", "date": "2024-01-01T00:00:00Z",
         "body": (f"<p>{'x' * 7919}{i}</p>").encode()}
        for i in range(30)
    ]
    blob = _gz.compress(write_warc_bytes(big, per_record_gzip=False))
    monkeypatch.setattr(warc_mod, "_GZ_SLICE", 1024)
    recs = list(warc_mod.iter_warc_records(blob))
    assert [r["warc-target-uri"] for r in recs] == [r["url"] for r in big]
    assert all(
        _http_body(rec["payload"]) == r["body"] for rec, r in zip(recs, big)
    )


def test_streaming_parse_multi_member_small_slices(monkeypatch):
    # per-record gzip members (CC convention) with a tiny feed slice: member
    # boundaries land mid-slice and must reset the decompressor correctly
    from final_ocr_spark.sources import warc as warc_mod

    big = [
        {"url": f"http://m.example/{i}", "date": "2024-01-01T00:00:00Z",
         "body": (f"<p>{'y' * 4093}{i}</p>").encode()}
        for i in range(20)
    ]
    blob = write_warc_bytes(big, per_record_gzip=True)
    monkeypatch.setattr(warc_mod, "_GZ_SLICE", 512)
    recs = list(warc_mod.iter_warc_records(blob))
    assert [r["warc-target-uri"] for r in recs] == [r["url"] for r in big]
    assert all(
        _http_body(rec["payload"]) == r["body"] for rec, r in zip(recs, big)
    )


def test_write_wet_roundtrip(spark, tmp_path):
    """df → write_wet → read_warc(conversion) reproduces url/ts/text exactly
    (incl. non-ASCII), skips null-text rows, and writes a per-file manifest
    + _SUCCESS."""
    import json
    from datetime import datetime

    from final_ocr_spark.sources.warc import write_wet

    rows = [
        ("http://a.example/1", datetime(2024, 5, 1, 12, 0, 0), "hello wet one"),
        ("http://b.example/2", datetime(2024, 5, 1, 12, 0, 1),
         "héllo wörld — ünïcode ✓\nsecond line"),
        ("http://c.example/3", None, "null ts gets the epoch stamp"),
        ("http://d.example/skip", datetime(2024, 5, 1), None),  # skipped
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string"
    ).repartition(3)
    out = str(tmp_path / "wet")
    manifest = write_wet(df, out)

    assert (tmp_path / "wet" / "_SUCCESS").exists()
    disk = json.loads((tmp_path / "wet" / "manifest.json").read_text())
    assert disk == manifest
    assert sum(m["records"] for m in manifest) == 3
    assert sum(m["skipped"] for m in manifest) == 1
    for m in manifest:
        if m["file"]:
            assert m["file"].endswith(".warc.gz") and m["bytes"] > 0

    back = read_warc(spark, out, warc_types=("conversion",))
    got = {r["url"]: r for r in back.collect()}
    assert set(got) == {
        "http://a.example/1", "http://b.example/2", "http://c.example/3"
    }
    assert all(r["error"] is None and r["html"] is None for r in got.values())
    assert got["http://a.example/1"]["text"] == "hello wet one"
    assert got["http://a.example/1"]["warc_ts"] == datetime(2024, 5, 1, 12, 0, 0)
    assert got["http://b.example/2"]["text"] == rows[1][2]
    assert got["http://c.example/3"]["warc_ts"] == datetime(1970, 1, 1)


def test_write_wet_composes_with_extraction(spark, tmp_path):
    """The flagship flow: pages → extract_pages → write_wet → read back —
    extracted text byte-identical through the WET round trip."""
    from final_ocr_spark.operators.extract_pages import extract_pages
    from final_ocr_spark.sources.synthetic_pages import gen_pages
    from final_ocr_spark.sources.warc import write_wet

    ext = extract_pages(gen_pages(spark, 60, seed=5), dedup=True)
    docs = ext.filter("error is null and length(extracted_text) > 0").selectExpr(
        "url", "warc_ts", "extracted_text AS text"
    )
    want = {r["url"]: r["text"] for r in docs.collect()}
    out = str(tmp_path / "wet")
    manifest = write_wet(docs, out)
    assert sum(m["records"] for m in manifest) == len(want)
    back = {
        r["url"]: r["text"]
        for r in read_warc(spark, out, warc_types=("conversion",)).collect()
    }
    assert back == want


def test_write_wat_roundtrip(spark, tmp_path):
    """pages → write_wat → read_warc(metadata): JSON envelope carries head
    metadata + resolved outlinks; null-html pages skipped and counted."""
    import json
    from datetime import datetime

    from final_ocr_spark.sources.warc import write_wat

    html = (
        "<html><head><title>WAT page</title>"
        '<meta name="description" content="a test page">'
        '<link rel="canonical" href="http://a.example/canon">'
        '<base href="http://a.example/dir/"></head>'
        '<body><a href="sub/x">rel link</a>'
        '<a href="http://b.example/y" rel="nofollow">nf link</a>'
        '<a href="javascript:void(0)">skipme</a></body></html>'
    ).encode()
    rows = [
        ("http://a.example/1", datetime(2024, 5, 1, 12, 0, 0), html),
        ("http://c.example/none", datetime(2024, 5, 1), None),  # skipped
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    ).repartition(2)
    out = str(tmp_path / "wat")
    manifest = write_wat(pages, out)
    assert (tmp_path / "wat" / "_SUCCESS").exists()
    assert sum(m["records"] for m in manifest) == 1
    assert sum(m["skipped"] for m in manifest) == 1

    back = read_warc(spark, out, warc_types=("metadata",)).collect()
    assert len(back) == 1 and back[0]["url"] == "http://a.example/1"
    env = json.loads(back[0]["text"])["Envelope"]
    assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == "http://a.example/1"
    hm = env["Payload-Metadata"]["HTML-Metadata"]
    assert hm["Head"]["Title"] == "WAT page"
    metas = {m["name"]: m["content"] for m in hm["Head"]["Metas"]}
    assert metas["description"] == "a test page"
    assert metas["canonical_url"] == "http://a.example/canon"
    links = {l["url"]: l for l in hm["Links"]}
    # <base href> resolution + scheme filter + nofollow rel
    assert set(links) == {"http://a.example/dir/sub/x", "http://b.example/y"}
    assert links["http://a.example/dir/sub/x"]["text"] == "rel link"
    assert "rel" not in links["http://a.example/dir/sub/x"]
    assert links["http://b.example/y"]["rel"] == "nofollow"


def test_write_wat_json_queryable(spark, tmp_path):
    """The WAT output is directly consumable Spark-side via
    get_json_object — the downstream link-graph ingestion path."""
    from datetime import datetime

    import pyspark.sql.functions as F

    from final_ocr_spark.sources.warc import write_wat

    pages = spark.createDataFrame(
        [(f"http://h{i}.example/p", datetime(2024, 1, 1),
          f'<html><head><title>t{i}</title></head><body>'
          f'<a href="http://t.example/{i}">go</a></body></html>'.encode())
         for i in range(6)],
        "url string, warc_ts timestamp, html binary",
    )
    out = str(tmp_path / "wat2")
    write_wat(pages, out)
    got = (
        read_warc(spark, out, warc_types=("metadata",))
        .select(
            "url",
            F.get_json_object(
                "text", "$.Envelope.Payload-Metadata.HTML-Metadata.Links[0].url"
            ).alias("first_link"),
        )
        .collect()
    )
    assert len(got) == 6
    for r in got:
        i = r["url"].split("http://h")[1].split(".")[0]
        assert r["first_link"] == f"http://t.example/{i}"


def test_write_warc_archive_and_cdx_random_access(spark, tmp_path):
    """pages → write_warc → (a) full read_warc round-trip, (b) CDX index
    random access: seek each (offset, length), decode ONE member, get the
    exact page back with a verifying sha1 digest."""
    import base64
    import hashlib
    import json
    from datetime import datetime

    from final_ocr_spark.sources.warc import read_warc_record, write_warc

    rows = [
        (f"http://h{i}.example/p{i}", datetime(2024, 6, 1, 0, 0, i),
         f"<html><body>page {i} — ünïcode ✓</body></html>".encode())
        for i in range(7)
    ] + [("http://skip.example/null", datetime(2024, 6, 1), None)]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    ).repartition(3)
    out = str(tmp_path / "archive")
    manifest = write_warc(pages, out)

    assert (tmp_path / "archive" / "_SUCCESS").exists()
    disk = json.loads((tmp_path / "archive" / "manifest.json").read_text())
    assert disk["skipped"] == 1
    assert sum(m["records"] for m in manifest) == 7

    # (a) bulk round trip through the ingest path
    back = read_warc(spark, out, glob="part-*.warc.gz").collect()
    got = {r["url"]: bytes(r["html"]) for r in back if r["error"] is None}
    for url, ts, body in rows[:7]:
        assert got[url] == body

    # (b) random access through the index — the point of the CDX
    import duckdb

    idx = duckdb.sql(
        f"select * from '{out}/cdx/*.parquet' order by url"
    ).fetchall()
    assert len(idx) == 7
    cols = [d[0] for d in duckdb.sql(
        f"select * from '{out}/cdx/*.parquet' limit 0").description]
    for row in idx:
        e = dict(zip(cols, row))
        rec = read_warc_record(
            f"{out}/{e['filename']}", e["offset"], e["length"])
        assert rec["url"] == e["url"]
        want = dict((u, b) for u, _, b in rows[:7])[e["url"]]
        assert rec["html"] == want
        d = "sha1:" + base64.b32encode(hashlib.sha1(want).digest()).decode()
        assert rec["digest"] == d == e["digest"]


def test_write_warc_bytes_deterministic(tmp_path):
    """gzip members are mtime-pinned: two serializations of the same record
    are byte-identical (retry/speculation safety for CDX offsets)."""
    from final_ocr_spark.sources.warc import write_warc_bytes

    rec = {"url": "http://x.example/", "date": "2024-01-01T00:00:00Z",
           "body": b"<html>x</html>"}
    assert write_warc_bytes([rec]) == write_warc_bytes([rec])
