from __future__ import annotations

import codecs

import pytest

from final_ocr_spark.extract.metadata import (
    decode_html,
    parse_metadata,
    sniff_charset,
)

FULL_PAGE = b"""<!DOCTYPE html>
<html lang="en-GB">
<head>
  <meta charset="utf-8">
  <title> The   Grand
  Title </title>
  <meta name="description" content="A page about  things.">
  <meta name="ROBOTS" content="NOINDEX, nofollow">
  <link rel="canonical" href="https://example.com/canonical">
  <meta property="og:title" content="OG Grand Title">
  <meta property="og:site_name" content="Example Site">
  <meta property="og:type" content="article">
  <meta property="article:published_time" content="2021-03-04T05:06:07Z">
  <script type="application/ld+json">
    {"@type": "Article", "datePublished": "1999-01-01T00:00:00Z"}
  </script>
</head>
<body>
  <h1>First</h1><h1>Second</h1>
  <time datetime="1990-12-31">old</time>
</body>
</html>"""


class TestSniffCharset:
    def test_bom_beats_meta(self):
        raw = codecs.BOM_UTF16_LE + "<meta charset='latin-1'>".encode("utf-16-le")
        assert sniff_charset(raw) == ("utf-16-le", "bom")

    def test_utf8_bom(self):
        assert sniff_charset(codecs.BOM_UTF8 + b"<html>") == ("utf-8-sig", "bom")

    def test_meta_charset(self):
        assert sniff_charset(b"<html><meta charset=windows-1251>") == (
            "cp1251",  # codecs.lookup canonical name
            "meta",
        )

    def test_meta_http_equiv_content_type(self):
        raw = (
            b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=Shift_JIS">'
        )
        codec, source = sniff_charset(raw)
        assert source == "meta" and codec == codecs.lookup("shift_jis").name

    def test_latin1_label_maps_to_windows_1252(self):
        # the browser behavior: latin-1/iso-8859-1 labels decode as cp1252
        assert sniff_charset(b"<meta charset='ISO-8859-1'>")[0] == "cp1252"

    def test_xml_declaration(self):
        raw = b'<?xml version="1.0" encoding="EUC-JP"?><page/>'
        codec, source = sniff_charset(raw)
        assert source == "xml" and codec == codecs.lookup("euc-jp").name

    def test_unknown_label_falls_through_to_default(self):
        assert sniff_charset(b"<meta charset='no-such-charset'>") == (
            "utf-8",
            "default",
        )

    def test_utf7_refused(self):
        assert sniff_charset(b"<meta charset='utf-7'>") == ("utf-8", "default")

    def test_declaration_outside_prescan_window_ignored(self):
        raw = b"<!--" + b"x" * 1200 + b"--><meta charset='windows-1251'>"
        assert sniff_charset(raw) == ("utf-8", "default")

    def test_empty(self):
        assert sniff_charset(b"") == ("utf-8", "default")


class TestDecodeHtml:
    def test_windows_1252_round_trip(self):
        body = "<meta charset=windows-1252><p>café — naïve</p>"
        text, codec, source = decode_html(body.encode("windows-1252"))
        assert "café — naïve" in text
        assert codec == "cp1252" and source == "meta"

    def test_utf16_bom_round_trip(self):
        body = "<title>日本語</title>"
        text, codec, source = decode_html(codecs.BOM_UTF16_LE + body.encode("utf-16-le"))
        assert "日本語" in text
        assert source == "bom"
        assert not text.startswith("﻿")  # BOM consumed, not leaked

    def test_utf8_sig_strips_bom(self):
        text, codec, _ = decode_html(codecs.BOM_UTF8 + b"<p>hi</p>")
        assert text == "<p>hi</p>" and codec == "utf-8-sig"

    def test_garbage_never_raises(self):
        text, _, _ = decode_html(bytes(range(256)) * 8)
        assert isinstance(text, str)

    def test_truncated_utf16_never_raises(self):
        # odd-length utf-16 payload: errors='replace' absorbs the tail
        raw = codecs.BOM_UTF16_LE + "abc".encode("utf-16-le") + b"\x41"
        text, _, _ = decode_html(raw)
        assert "abc" in text


class TestParseMetadata:
    def test_full_page(self):
        m = parse_metadata(FULL_PAGE)
        assert m["title"] == "The Grand Title"  # whitespace collapsed
        assert m["description"] == "A page about things."
        assert m["canonical_url"] == "https://example.com/canonical"
        assert m["lang_attr"] == "en-GB"
        assert m["og_title"] == "OG Grand Title"
        assert m["og_site_name"] == "Example Site"
        assert m["og_type"] == "article"
        # meta article:published_time beats JSON-LD beats <time>
        assert m["published_time"] == "2021-03-04T05:06:07Z"
        assert m["noindex"] is True and m["nofollow"] is True
        assert m["h1_count"] == 2
        assert m["charset"] == "utf-8" and m["charset_source"] == "meta"

    def test_jsonld_date_when_no_meta(self):
        page = FULL_PAGE.replace(b'property="article:published_time"', b'property="x"')
        assert parse_metadata(page)["published_time"] == "1999-01-01T00:00:00Z"

    def test_time_datetime_last_resort(self):
        page = (
            FULL_PAGE.replace(b'property="article:published_time"', b'property="x"')
            .replace(b"datePublished", b"dateX")
        )
        assert parse_metadata(page)["published_time"] == "1990-12-31"

    def test_first_wins_on_duplicates(self):
        page = (
            b"<title>one</title><title>two</title>"
            b'<meta name="description" content="d1">'
            b'<meta name="description" content="d2">'
        )
        m = parse_metadata(page)
        assert m["title"] == "one" and m["description"] == "d1"

    def test_robots_none_token(self):
        m = parse_metadata(b'<meta name="robots" content="NONE">')
        assert m["noindex"] is True and m["nofollow"] is True

    def test_robots_absent_means_indexable(self):
        m = parse_metadata(b"<title>t</title>")
        assert m["noindex"] is False and m["nofollow"] is False

    def test_canonical_rel_token_list(self):
        m = parse_metadata(b'<link rel="alternate canonical" href="/c">')
        assert m["canonical_url"] == "/c"

    def test_unquoted_and_uppercase_attrs(self):
        m = parse_metadata(b"<META NAME=description CONTENT=hello><TITLE>T</TITLE>")
        assert m["description"] == "hello" and m["title"] == "T"

    def test_truncated_title_flushed(self):
        assert parse_metadata(b"<title>cut off by craw")["title"] == "cut off by craw"

    def test_charset_applies_to_fields(self):
        body = "<meta charset=windows-1252><title>café</title>"
        m = parse_metadata(body.encode("windows-1252"))
        assert m["title"] == "café"

    def test_none_and_junk(self):
        m = parse_metadata(None)
        assert m["title"] is None and m["noindex"] is False
        m = parse_metadata(b"\x00\xff\xfe junk \x80<<<>>>")
        assert isinstance(m, dict)  # tolerant, never raises

    def test_entity_in_title_decoded(self):
        assert parse_metadata(b"<title>a &amp; b</title>")["title"] == "a & b"


@pytest.fixture(scope="module")
def meta_df(spark):
    from final_ocr_spark.operators.metadata import page_metadata

    rows = [
        ("u1", FULL_PAGE),
        ("u2", b"<html lang=fr><title>Deux</title><body><h1>x</h1></body></html>"),
        ("u3", None),
        ("u4", b"\x00\x01binary junk\xff"),
        ("u5", "<meta charset=windows-1252><title>café</title>".encode(
            "windows-1252")),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = page_metadata(df)
    return out, {r["url"]: r.asDict() for r in out.collect()}


class TestPageMetadataOperator:
    def test_every_url_accounted(self, meta_df):
        _, by_url = meta_df
        assert set(by_url) == {"u1", "u2", "u3", "u4", "u5"}
        assert all(r["error"] is None for r in by_url.values())

    def test_values(self, meta_df):
        _, by_url = meta_df
        assert by_url["u1"]["title"] == "The Grand Title"
        assert by_url["u1"]["noindex"] is True
        assert by_url["u2"]["lang_attr"] == "fr"
        assert by_url["u2"]["h1_count"] == 1
        assert by_url["u3"]["title"] is None and by_url["u3"]["noindex"] is False
        assert by_url["u5"]["title"] == "café"
        assert by_url["u5"]["charset"] == "cp1252"

    def test_single_python_stage_no_shuffle(self, meta_df):
        out, _ = meta_df
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert plan.count("MapInPandas") == 1

    def test_indexable_pages_gate(self, spark, meta_df):
        from final_ocr_spark.operators.metadata import indexable_pages

        out, _ = meta_df
        pages = spark.createDataFrame(
            [("u1",), ("u2",), ("u3",), ("u4",), ("u5",)], "url string"
        )
        kept = {r.url for r in indexable_pages(pages, out).collect()}
        assert kept == {"u2", "u3", "u4", "u5"}  # u1 is noindex

    def test_indexable_respect_canonical(self, spark):
        from final_ocr_spark.operators.metadata import (
            indexable_pages,
            page_metadata,
        )

        rows = [
            ("https://example.com/canonical",
             b'<link rel=canonical href="https://example.com/canonical">'),
            ("https://example.com/dup",
             b'<link rel=canonical href="https://example.com/canonical">'),
            ("https://example.com/plain", b"<title>t</title>"),
        ]
        df = spark.createDataFrame(rows, "url string, html binary")
        kept = {
            r.url
            for r in indexable_pages(
                df, page_metadata(df), respect_canonical=True
            ).collect()
        }
        assert kept == {"https://example.com/canonical", "https://example.com/plain"}
