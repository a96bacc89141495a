"""Sitemap ingestion: sitemaps.org XML (and plain-text) sitemaps → URL rows.

The crawl-discovery companion to the robots.txt gate (operators/robots.py):
robots says what NOT to fetch; sitemaps say what a host WANTS fetched, with
freshness hints — the standard seed source for recrawl scheduling and for
auditing corpus coverage against what hosts advertise.

Input is a table of fetched sitemap bodies ``(sitemap_url, body)`` (body
``binary`` — sitemaps ship as .xml, .xml.gz, or plain text, and the sniff
is on bytes). Output is one row per referenced URL:

    (sitemap_url, loc, kind, lastmod_raw, lastmod, changefreq, priority,
     error)

``kind`` is 'url' (a page, from <urlset>) or 'sitemap' (a child sitemap,
from <sitemapindex> — the caller fetches those and feeds them back; the
fetch loop stays with the caller because this engine does no network I/O).
Malformed XML quarantines into ONE error row per sitemap instead of
failing the task — the same per-input-row error contract as read_warc.
``lastmod`` is parsed Spark-side with ``try_to_timestamp`` over the W3C
datetime profiles (ANSI-safe: unparseable stays null, raw string kept).

Scale shape: one Arrow-batched ``mapInPandas`` stage, 1→N rows per sitemap,
bounded output batches; the spec's 50k-URL-per-sitemap ceiling is enforced
(``max_urls``) so a hostile megafile cannot blow up one task's batch. XML
parsing is stdlib ElementTree on the decompressed bytes (sitemaps are ≤50 MB
uncompressed by spec; the whole-body parse is the public recipe).

Plain-text sitemaps (one URL per line) are detected by the absence of an
XML declaration/root '<' and emit kind='url' rows with null metadata.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from final_ocr_spark.sources._ingest import gunzip_and_strip_bom

# W3C datetime (the sitemaps.org lastmod format family), most-specific first
_LASTMOD_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mmXXX",
    "yyyy-MM-dd",
]

_SPEC_MAX_URLS = 50_000


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1] if "}" in tag else tag


def _parse_one(src: str, body: bytes | None, max_urls: int):
    """Rows for one sitemap body: (loc, kind, lastmod, changefreq, priority,
    error). Never raises — malformed input yields one error row."""
    import xml.etree.ElementTree as ET

    body, ingest_err = gunzip_and_strip_bom(body)
    if ingest_err is not None:
        return [(None, None, None, None, None, ingest_err)]
    stripped = body.lstrip()
    if not stripped.startswith(b"<"):
        # plain-text sitemap: one URL per line (sitemaps.org allows it)
        out = []
        for ln in body.decode("utf-8", "replace").splitlines():
            ln = ln.strip()
            if ln and not ln.startswith("#"):
                out.append((ln, "url", None, None, None, None))
                if len(out) >= max_urls:
                    break
        return out or [(None, None, None, None, None, "no urls in text sitemap")]
    try:
        root = ET.fromstring(body)
    except ET.ParseError as e:
        return [(None, None, None, None, None, f"xml: {e}")]
    rootname = _localname(root.tag)
    if rootname == "sitemapindex":
        kind, childname = "sitemap", "sitemap"
    elif rootname == "urlset":
        kind, childname = "url", "url"
    else:
        return [(None, None, None, None, None, f"unknown root <{rootname}>")]
    out = []
    for child in root:
        if _localname(child.tag) != childname:
            continue
        loc = lastmod = changefreq = priority = None
        for field in child:
            name, val = _localname(field.tag), (field.text or "").strip()
            if name == "loc":
                loc = val or None
            elif name == "lastmod":
                lastmod = val or None
            elif name == "changefreq":
                changefreq = val or None
            elif name == "priority":
                priority = val or None
        if loc:
            out.append((loc, kind, lastmod, changefreq, priority, None))
            if len(out) >= max_urls:
                break
    return out


def parse_sitemaps(
    sitemaps: DataFrame,
    url_col: str = "sitemap_url",
    body_col: str = "body",
    max_urls: int = _SPEC_MAX_URLS,
) -> DataFrame:
    """(sitemap_url, loc, kind, lastmod_raw, lastmod, changefreq, priority,
    error) rows from a table of fetched sitemap bodies. See module doc."""
    if not 0 < max_urls <= _SPEC_MAX_URLS:
        raise ValueError(
            f"max_urls must be in 1..{_SPEC_MAX_URLS} (the spec ceiling), got {max_urls}"
        )
    slim = sitemaps.select(
        F.col(url_col).alias("_src"), F.col(body_col).cast("binary").alias("_body")
    )

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for src, body in zip(pdf["_src"].tolist(), pdf["_body"].tolist()):
                body = bytes(body) if body is not None else None
                for loc, kind, lm, cf, pr, err in _parse_one(src, body, max_urls):
                    rows.append((src, loc, kind, lm, cf, pr, err))
            yield pd.DataFrame(
                rows,
                columns=[
                    "sitemap_url", "loc", "kind", "lastmod_raw",
                    "changefreq", "_priority_raw", "error",
                ],
            )

    raw = slim.mapInPandas(
        _fn,
        schema=(
            "sitemap_url string, loc string, kind string, lastmod_raw string, "
            "changefreq string, _priority_raw string, error string"
        ),
    )
    # W3C datetime allows fractional seconds of any length
    # (2024-01-05T10:00:00.123+00:00); Spark's fixed-width fraction patterns
    # can't express "any number of digits", so strip the fraction before the
    # cascade (sub-second precision is meaningless for recrawl scheduling;
    # the raw string survives in lastmod_raw)
    lastmod_clean = F.regexp_replace("lastmod_raw", r"\.\d+", "")
    lastmod = F.coalesce(
        *[F.try_to_timestamp(lastmod_clean, F.lit(f)) for f in _LASTMOD_FORMATS]
    )
    return raw.select(
        "sitemap_url", "loc", "kind", "lastmod_raw",
        lastmod.alias("lastmod"),
        "changefreq",
        # priority is '0.0'..'1.0' by spec; junk → null, ANSI-safe
        F.expr("try_cast(_priority_raw AS double)").alias("priority"),
        "error",
    )


def sitemaps_from_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """(host, sitemap_url) rows from ``Sitemap:`` directives in a per-host
    robots.txt table (operators/robots.py's rule-table shape) — the standard
    sitemap discovery path. Directive is case-insensitive, lives outside
    agent groups, and may repeat. Pure Column regexp work, scan-local."""
    urls = F.expr(
        f"regexp_extract_all({body_col}, '(?im)^[ \\\\t]*sitemap:[ \\\\t]*(\\\\S+)', 1)"
    )
    return (
        robots.select(F.col(host_col).alias("host"), F.explode(urls).alias("sitemap_url"))
        .filter(F.col("sitemap_url") != "")
    )
