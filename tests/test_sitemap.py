"""Sitemap ingestion: urlset/sitemapindex/gz/plain-text parse, quarantine,
lastmod W3C-datetime handling, robots.txt Sitemap: discovery."""

from __future__ import annotations

import gzip
from datetime import datetime

import pytest

from final_ocr_spark.sources.sitemap import parse_sitemaps, sitemaps_from_robots

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'

URLSET = f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset {NS}>
  <url><loc>https://a.com/page1</loc><lastmod>2024-03-05T10:20:30+00:00</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>https://a.com/page2</loc><lastmod>2024-03-06</lastmod></url>
  <url><loc> https://a.com/page3 </loc><lastmod>not-a-date</lastmod>
       <priority>junk</priority></url>
  <url><lastmod>2024-01-01</lastmod></url>
</urlset>"""

INDEX = f"""<?xml version="1.0"?>
<sitemapindex {NS}>
  <sitemap><loc>https://a.com/sitemap-1.xml.gz</loc>
           <lastmod>2024-02-01</lastmod></sitemap>
  <sitemap><loc>https://a.com/sitemap-2.xml.gz</loc></sitemap>
</sitemapindex>"""

TEXT_SITEMAP = "# comment\nhttps://t.com/1\n\nhttps://t.com/2\n"


def _rows(spark, bodies, **kw):
    df = spark.createDataFrame(bodies, "sitemap_url string, body binary")
    return parse_sitemaps(df, **kw).collect()


def test_urlset_parse(spark):
    out = _rows(spark, [("https://a.com/sitemap.xml", URLSET.encode())])
    by_loc = {r["loc"]: r for r in out}
    # loc-less <url> entries are skipped; 3 rows, no error rows
    assert set(by_loc) == {
        "https://a.com/page1", "https://a.com/page2", "https://a.com/page3"
    }
    assert all(r["error"] is None and r["kind"] == "url" for r in out)
    p1 = by_loc["https://a.com/page1"]
    assert p1["lastmod"] == datetime(2024, 3, 5, 10, 20, 30)
    assert p1["changefreq"] == "daily" and p1["priority"] == 0.8
    assert by_loc["https://a.com/page2"]["lastmod"] == datetime(2024, 3, 6)
    # junk lastmod/priority → raw kept, typed null (ANSI-safe try_ casts)
    p3 = by_loc["https://a.com/page3"]
    assert p3["lastmod"] is None and p3["lastmod_raw"] == "not-a-date"
    assert p3["priority"] is None


def test_sitemapindex_and_gz(spark):
    out = _rows(
        spark,
        [
            ("https://a.com/sitemap.xml", INDEX.encode()),
            ("https://a.com/szipped.xml.gz", gzip.compress(URLSET.encode())),
        ],
    )
    kinds = {(r["sitemap_url"], r["kind"]) for r in out}
    assert ("https://a.com/sitemap.xml", "sitemap") in kinds
    assert ("https://a.com/szipped.xml.gz", "url") in kinds
    children = [r for r in out if r["kind"] == "sitemap"]
    assert {r["loc"] for r in children} == {
        "https://a.com/sitemap-1.xml.gz", "https://a.com/sitemap-2.xml.gz"
    }


def test_plain_text_and_quarantine(spark):
    out = _rows(
        spark,
        [
            ("https://t.com/sitemap.txt", TEXT_SITEMAP.encode()),
            ("https://bad.com/s.xml", b"<urlset><url><loc>x</loc>"),  # truncated
            ("https://bad.com/gz", b"\x1f\x8b\x00garbage"),
            ("https://bad.com/empty", b""),
            ("https://bad.com/other-root", b"<rss><item/></rss>"),
        ],
    )
    by_src = {}
    for r in out:
        by_src.setdefault(r["sitemap_url"], []).append(r)
    assert [r["loc"] for r in by_src["https://t.com/sitemap.txt"]] == [
        "https://t.com/1", "https://t.com/2"
    ]
    # one quarantine row per malformed sitemap — never a task failure
    for src, frag in [
        ("https://bad.com/s.xml", "xml:"),
        ("https://bad.com/gz", "gzip:"),
        ("https://bad.com/empty", "empty"),
        ("https://bad.com/other-root", "unknown root"),
    ]:
        (row,) = by_src[src]
        assert row["loc"] is None and frag in row["error"], src


def test_max_urls_cap(spark):
    body = (
        f'<urlset {NS}>'
        + "".join(f"<url><loc>https://m.com/{i}</loc></url>" for i in range(20))
        + "</urlset>"
    )
    out = _rows(spark, [("https://m.com/s.xml", body.encode())], max_urls=5)
    assert len(out) == 5
    with pytest.raises(ValueError):
        _rows(spark, [("u", b"<urlset/>")], max_urls=0)
    with pytest.raises(ValueError):
        _rows(spark, [("u", b"<urlset/>")], max_urls=100_000)


def test_sitemaps_from_robots(spark):
    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /x\nSitemap: https://a.com/s1.xml\n"
                      "sitemap:\thttps://a.com/s2.xml\n"),
            ("b.com", "User-agent: *\nAllow: /\n"),
            ("c.com", None),
        ],
        "host string, robots_txt string",
    )
    got = {(r["host"], r["sitemap_url"]) for r in sitemaps_from_robots(robots).collect()}
    assert got == {
        ("a.com", "https://a.com/s1.xml"),
        ("a.com", "https://a.com/s2.xml"),
    }


def test_bom_and_fractional_lastmod(spark):
    """Review-caught: a UTF-8 BOM must not demote XML to the text-sitemap
    branch, and W3C fractional-second lastmod values must still parse."""
    body = (
        "﻿<?xml version=\"1.0\"?>"
        f'<urlset {NS}><url><loc>https://bom.com/p</loc>'
        "<lastmod>2024-01-05T10:00:00.123+00:00</lastmod></url></urlset>"
    ).encode("utf-8")
    (row,) = _rows(spark, [("https://bom.com/s.xml", body)])
    assert row["error"] is None and row["loc"] == "https://bom.com/p"
    assert row["lastmod"] == datetime(2024, 1, 5, 10, 0, 0)
