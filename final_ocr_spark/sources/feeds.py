"""RSS/Atom feed ingestion: fetched feed bodies → item URL rows.

The third leg of the crawl-discovery suite (robots.txt gate says what NOT
to fetch, sitemaps say what a host wants fetched wholesale, feeds say what
is NEW) — the standard freshness signal for recrawl scheduling: feed items
carry publish timestamps and land minutes after publication, where
sitemaps often lag.

Input is a table of fetched feed bodies ``(feed_url, body binary)`` (gzip
sniffed, BOM tolerated — same ingest stance as sources/sitemap.py). Output
is one row per item:

    (feed_url, kind, feed_title, title, link, guid, published_raw,
     published, summary, error)

``kind`` ∈ {'rss', 'atom', 'rdf'}. Malformed XML quarantines into ONE
error row per feed (the read_warc error contract); per-feed item caps stop
hostile megafeeds from blowing up a task batch. ``published`` is parsed
Spark-side with an ANSI-safe ``try_to_timestamp`` cascade over BOTH date
families found in the wild — RFC 822 (RSS pubDate: ``Mon, 05 Jan 2024
10:00:00 GMT``/``+0000``) and W3C/RFC 3339 (Atom published/updated) — so
junk dates stay null with the raw string preserved.

Scale shape: one Arrow-batched ``mapInPandas`` stage, 1→N rows per feed;
feed discovery from page HTML (``feeds_from_html``) is a slim head-scan
stage of the same shape as operators/metadata.py.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from final_ocr_spark.sources._ingest import gunzip_and_strip_bom

# RFC 822 (RSS) then RFC 3339/W3C (Atom), most-specific first. Spark 3+
# forbids 'E' (weekday) in PARSE patterns, so the redundant "Mon, " prefix
# is regexp-stripped before the cascade. 'zzz' catches named zones
# (GMT/UT); XXXX catches +0000; XXX catches +00:00.
_PUBLISHED_FORMATS = [
    "dd MMM yyyy HH:mm:ss zzz",
    "dd MMM yyyy HH:mm:ss XXXX",
    "d MMM yyyy HH:mm:ss zzz",
    "d MMM yyyy HH:mm:ss XXXX",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mmXXX",
    "yyyy-MM-dd",
]

_DEFAULT_MAX_ITEMS = 10_000

_COLS = ["feed_url", "kind", "feed_title", "title", "link", "guid",
         "published_raw", "summary", "error"]


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1] if "}" in tag else tag


def _text(el) -> str | None:
    v = "".join(el.itertext()).strip()
    return v or None


def _rss_items(channel, max_items: int):
    feed_title = None
    items = []
    for child in channel:
        name = _localname(child.tag)
        if name == "title" and feed_title is None:
            feed_title = _text(child)
        elif name == "item" and len(items) < max_items:
            items.append(child)
    return feed_title, items


def _parse_rss_item(item) -> tuple:
    # first NON-NULL wins everywhere: items routinely carry namespaced
    # siblings with the same localname (<atom:link rel=enclosure/> has no
    # text, <media:title>/<itunes:title> follow the real <title>) — a
    # last-wins overwrite nulls the link / clobbers the title
    # (review-caught, test-pinned)
    title = link = guid = pub = summary = None
    for f in item:
        name = _localname(f.tag)
        if name == "title" and title is None:
            title = _text(f)
        elif name == "link" and link is None:
            link = _text(f)
        elif name == "guid" and guid is None:
            guid = _text(f)
        elif name in ("pubDate", "date") and pub is None:  # dc:date in RSS 1.0
            pub = _text(f)
        elif name == "description" and summary is None:
            summary = _text(f)
    return title, link, guid, pub, summary


def _parse_atom_entry(entry) -> tuple:
    title = link = guid = pub = updated = summary = None
    for f in entry:
        name = _localname(f.tag)
        if name == "title" and title is None:  # first-wins (media:title etc.)
            title = _text(f)
        elif name == "link":
            rel = f.get("rel") or "alternate"
            if rel == "alternate" and link is None:
                link = (f.get("href") or "").strip() or None
        elif name == "id":
            guid = _text(f)
        elif name == "published":
            pub = _text(f)
        elif name == "updated":
            updated = _text(f)
        elif name in ("summary", "content") and summary is None:
            summary = _text(f)
    return title, link, guid, pub or updated, summary


def _parse_one(body: bytes | None, max_items: int) -> list[tuple]:
    """Rows for one feed body: (kind, feed_title, title, link, guid,
    published_raw, summary, error). Never raises."""
    import xml.etree.ElementTree as ET

    def err(msg: str) -> list[tuple]:
        return [(None, None, None, None, None, None, None, msg)]

    body, ingest_err = gunzip_and_strip_bom(body)
    if ingest_err is not None:
        return err(ingest_err)
    try:
        root = ET.fromstring(body)
    except ET.ParseError as e:
        return err(f"xml: {e}")
    rootname = _localname(root.tag)
    out: list[tuple] = []
    if rootname == "rss":
        channel = next(
            (c for c in root if _localname(c.tag) == "channel"), None
        )
        if channel is None:
            return err("rss without <channel>")
        feed_title, items = _rss_items(channel, max_items)
        for it in items:
            out.append(("rss", feed_title, *_parse_rss_item(it), None))
    elif rootname == "RDF":
        # RSS 1.0: <channel> and <item>s are siblings under the RDF root
        feed_title = None
        for c in root:
            name = _localname(c.tag)
            if name == "channel" and feed_title is None:
                t = next((f for f in c if _localname(f.tag) == "title"), None)
                feed_title = _text(t) if t is not None else None
            elif name == "item" and len(out) < max_items:
                out.append(("rdf", feed_title, *_parse_rss_item(c), None))
    elif rootname == "feed":
        feed_title = None
        for c in root:
            name = _localname(c.tag)
            if name == "title" and feed_title is None:
                feed_title = _text(c)
            elif name == "entry" and len(out) < max_items:
                out.append(("atom", feed_title, *_parse_atom_entry(c), None))
    else:
        return err(f"unknown root <{rootname}>")
    return out or err("no items")


def parse_feeds(
    feeds: DataFrame,
    url_col: str = "feed_url",
    body_col: str = "body",
    max_items: int = _DEFAULT_MAX_ITEMS,
) -> DataFrame:
    """(feed_url, kind, feed_title, title, link, guid, published_raw,
    published, summary, error) rows from fetched feed bodies. Module doc
    has the full contract."""
    if max_items < 1:
        raise ValueError("max_items must be >= 1")
    slim = feeds.select(
        F.col(url_col).alias("_src"), F.col(body_col).cast("binary").alias("_body")
    )

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for src, body in zip(pdf["_src"].tolist(), pdf["_body"].tolist()):
                body = bytes(body) if body is not None else None
                for kind, ft, t, ln, g, pub, sm, e in _parse_one(body, max_items):
                    rows.append((src, kind, ft, t, ln, g, pub, sm, e))
            yield pd.DataFrame(rows, columns=_COLS)

    raw = slim.mapInPandas(
        _fn, schema=", ".join(f"{c} string" for c in _COLS)
    )
    # strip fractional seconds (any length) before the fixed-width cascade —
    # same rationale as sitemap lastmod — and the RFC 822 weekday prefix
    # ('E' is a format-only symbol since Spark 3); raw string survives
    clean = F.regexp_replace(
        F.regexp_replace("published_raw", r"^[A-Za-z]{3},\s*", ""),
        r"\.\d+", "",
    )
    published = F.coalesce(
        *[F.try_to_timestamp(clean, F.lit(f)) for f in _PUBLISHED_FORMATS]
    )
    return raw.select(
        "feed_url", "kind", "feed_title", "title", "link", "guid",
        "published_raw", published.alias("published"), "summary", "error",
    )


class _FeedLinkParser(HTMLParser):
    """<link rel=alternate type=rss/atom href=...> collector (head scan)."""

    _TYPES = ("application/rss+xml", "application/atom+xml")

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.found: list[tuple[str, str]] = []  # (href, type)

    def handle_starttag(self, tag: str, attrs_list) -> None:
        if tag != "link":
            return
        attrs = dict(attrs_list)
        rel = (attrs.get("rel") or "").lower()
        typ = (attrs.get("type") or "").lower().strip()
        href = (attrs.get("href") or "").strip()
        if "alternate" in rel and typ in self._TYPES and href:
            self.found.append((href, typ))

    def handle_endtag(self, tag: str) -> None:
        if tag in ("head", "html"):  # feeds live in <head>; stop early
            raise StopIteration


def discover_feeds(url: str, raw: bytes | None) -> list[tuple[str, str]]:
    """Pure function: page html → [(absolute feed url, mime type)] from
    ``<link rel=alternate>`` declarations. Relative hrefs resolve against
    the page url; parse stops at </head>. Never raises."""
    if raw is None:
        return []
    from urllib.parse import urljoin

    from final_ocr_spark.extract.metadata import decode_html

    text, _, _ = decode_html(bytes(raw))
    p = _FeedLinkParser()
    try:
        p.feed(text[:262_144])  # feeds declare in head; bound the scan
        p.close()
    except StopIteration:
        pass
    except Exception:
        pass
    out = []
    for href, typ in p.found:
        try:
            absu = urljoin(url, href)
        except ValueError:
            continue
        if absu.startswith(("http://", "https://")):
            out.append((absu, typ))
    return out


def feeds_from_html(pages: DataFrame) -> DataFrame:
    """(url, feed_url, feed_type) rows from page ``<link rel=alternate>``
    declarations — the standard feed-discovery path. One slim 1→N
    mapInPandas stage over (url, html); the blob never shuffles."""
    slim = pages.select("url", "html").filter(F.col("html").isNotNull())

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, raw in zip(pdf["url"].tolist(), pdf["html"].tolist()):
                for absu, typ in discover_feeds(url, raw):
                    rows.append((url, absu, typ))
            yield pd.DataFrame(rows, columns=["url", "feed_url", "feed_type"])

    return slim.mapInPandas(
        _fn, schema="url string, feed_url string, feed_type string"
    )
