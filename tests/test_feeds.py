"""RSS/Atom feed ingestion — format goldens, quarantine, date cascade,
and HTML feed discovery."""

import gzip
from datetime import datetime

from final_ocr_spark.sources.feeds import (
    _parse_one,
    discover_feeds,
    feeds_from_html,
    parse_feeds,
)

RSS = b"""<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Example Blog</title>
  <item><title>Post one</title><link>http://e.com/1</link>
    <guid>tag:1</guid><pubDate>Mon, 05 Jan 2024 10:00:00 GMT</pubDate>
    <description>first &amp; best</description></item>
  <item><title>Post two</title><link>http://e.com/2</link>
    <pubDate>Tue, 06 Jan 2024 11:30:00 +0000</pubDate></item>
</channel></rss>"""

ATOM = b"""<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Atom Site</title>
  <entry><title>Entry A</title>
    <link rel="alternate" href="http://a.com/a"/>
    <link rel="enclosure" href="http://a.com/a.mp3"/>
    <id>urn:a</id><published>2024-02-01T08:00:00Z</published>
    <summary>sum A</summary></entry>
  <entry><title>Entry B</title><link href="http://a.com/b"/>
    <updated>2024-02-02T09:15:00+01:00</updated></entry>
</feed>"""

RDF = b"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns="http://purl.org/rss/1.0/"
         xmlns:dc="http://purl.org/dc/elements/1.1/">
  <channel rdf:about="http://r.com"><title>RDF Feed</title></channel>
  <item><title>R1</title><link>http://r.com/1</link>
    <dc:date>2024-03-01T00:00:00Z</dc:date></item>
</rdf:RDF>"""


def test_parse_rss_golden():
    rows = _parse_one(RSS, 100)
    assert [r[0] for r in rows] == ["rss", "rss"]
    kind, ft, title, link, guid, pub, summary, err = rows[0]
    assert (ft, title, link, guid) == ("Example Blog", "Post one",
                                       "http://e.com/1", "tag:1")
    assert pub == "Mon, 05 Jan 2024 10:00:00 GMT"
    assert summary == "first & best" and err is None


def test_parse_atom_golden():
    rows = _parse_one(ATOM, 100)
    assert [r[0] for r in rows] == ["atom", "atom"]
    assert rows[0][3] == "http://a.com/a"  # alternate link, not enclosure
    assert rows[0][5] == "2024-02-01T08:00:00Z"
    assert rows[1][5] == "2024-02-02T09:15:00+01:00"  # updated fallback


def test_parse_rdf_and_quarantine_and_cap():
    rows = _parse_one(RDF, 100)
    assert rows[0][:4] == ("rdf", "RDF Feed", "R1", "http://r.com/1")
    assert _parse_one(b"", 100)[0][-1] == "empty body"
    assert _parse_one(b"not xml at all", 100)[0][-1].startswith("xml:")
    assert _parse_one(b"<html></html>", 100)[0][-1] == "unknown root <html>"
    assert _parse_one(b"<rss><channel/></rss>", 100)[0][-1] == "no items"
    capped = _parse_one(RSS, 1)
    assert len(capped) == 1 and capped[0][2] == "Post one"


def test_gzip_and_bom():
    rows = _parse_one(gzip.compress(b"\xef\xbb\xbf" + RSS), 100)
    assert len(rows) == 2 and rows[0][7] is None


def test_spark_parse_feeds_date_cascade(spark):
    df = spark.createDataFrame(
        [
            ("http://e.com/rss", bytearray(RSS)),
            ("http://a.com/atom", bytearray(ATOM)),
            ("http://bad.example/feed", bytearray(b"<oops")),
            ("http://junkdate.example/rss", bytearray(
                b"<rss><channel><title>J</title><item><title>x</title>"
                b"<pubDate>someday soon</pubDate></item></channel></rss>")),
        ],
        "feed_url string, body binary",
    )
    out = {(r["feed_url"], r["title"]): r for r in parse_feeds(df).collect()}
    assert out[("http://e.com/rss", "Post one")]["published"] == \
        datetime(2024, 1, 5, 10, 0, 0)
    assert out[("http://e.com/rss", "Post two")]["published"] == \
        datetime(2024, 1, 6, 11, 30, 0)
    assert out[("http://a.com/atom", "Entry A")]["published"] == \
        datetime(2024, 2, 1, 8, 0, 0)
    # +01:00 offset lands in session UTC
    assert out[("http://a.com/atom", "Entry B")]["published"] == \
        datetime(2024, 2, 2, 8, 15, 0)
    assert out[("http://bad.example/feed", None)]["error"].startswith("xml:")
    junk = out[("http://junkdate.example/rss", "x")]
    assert junk["published"] is None
    assert junk["published_raw"] == "someday soon"  # raw survives


def test_discover_and_spark_discovery(spark):
    html = (
        '<html><head><link rel="alternate" type="application/rss+xml" '
        'href="/feed.xml"><link rel="alternate" '
        'type="application/atom+xml" href="http://x.com/atom">'
        '<link rel="stylesheet" href="/s.css"></head>'
        '<body><link rel="alternate" type="application/rss+xml" '
        'href="/ignored-after-head"></body></html>'
    ).encode()
    got = discover_feeds("http://site.com/page", html)
    assert got == [
        ("http://site.com/feed.xml", "application/rss+xml"),
        ("http://x.com/atom", "application/atom+xml"),
    ]
    assert discover_feeds("http://site.com", None) == []

    pages = spark.createDataFrame(
        [("http://site.com/page", bytearray(html)),
         ("http://plain.com/", bytearray(b"<html><head></head></html>"))],
        "url string, html binary",
    )
    rows = feeds_from_html(pages).collect()
    assert {r["feed_url"] for r in rows} == {
        "http://site.com/feed.xml", "http://x.com/atom"
    }


def test_namespaced_siblings_do_not_clobber():
    # review-caught: podcast/WordPress items carry <atom:link/> (no text)
    # and <media:title> after the real fields — first non-null must win
    body = (
        b'<rss version="2.0" xmlns:atom="http://www.w3.org/2005/Atom" '
        b'xmlns:media="http://search.yahoo.com/mrss/"><channel>'
        b"<title>Pod</title>"
        b"<item><title>Ep 1</title><link>http://x.com/ep1</link>"
        b'<atom:link rel="enclosure" href="http://x.com/ep1.mp3"/>'
        b"<media:title>thumb title</media:title>"
        b"<description>real</description>"
        b"<media:description>alt</media:description></item>"
        b"</channel></rss>"
    )
    rows = _parse_one(body, 10)
    kind, ft, title, link, guid, pub, summary, err = rows[0]
    assert title == "Ep 1" and link == "http://x.com/ep1"
    assert summary == "real" and err is None
