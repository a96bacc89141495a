"""Charset sniffing + document-metadata extraction (pure core, no Spark).

Two concerns the main-content extractor deliberately does NOT handle:

* **Charset sniffing** — ``extract_html`` pins utf-8-with-replacement (its
  goldens freeze that contract), but real Common-Crawl pages declare
  windows-1252 / latin-1 / shift_jis / utf-16 in BOMs, XML declarations and
  ``<meta charset>`` tags. :func:`sniff_charset` implements a WHATWG-style
  prescan over the first ``_PRESCAN_BYTES`` bytes; :func:`decode_html`
  decodes with the sniffed codec (errors=replace — decoding never raises).

* **Head metadata** — title, meta description, canonical link, robots
  directives, Open Graph fields, ``<html lang>``, publication time (meta →
  JSON-LD → <time datetime>), h1 count. The reference's analog is its
  per-document header-field regex cascade (ocr.py:176-198 invoice-number /
  date extraction — first-match-wins priority order); here the cascade runs
  over DOM metadata instead of OCR text lines.

Both are deterministic pure functions of the input bytes: no clocks, no
env, no network. Malformed input degrades to partial metadata, never an
exception (mirroring ``extract_html``'s tolerant-parse contract).
"""

from __future__ import annotations

import codecs
import re
from html.parser import HTMLParser

# WHATWG "encoding sniffing algorithm" prescans 1024 bytes; we follow suit.
_PRESCAN_BYTES = 1024

# BOM table — longest match first (utf-32 BOMs contain the utf-16 ones).
_BOMS: tuple[tuple[bytes, str], ...] = (
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)

# <meta charset="..."> | <meta ... content="text/html; charset=..."> |
# <?xml ... encoding="..."?> — ASCII-compatible prescan, case-insensitive,
# tolerant of unquoted values (RE2-safe: no backrefs/lookbehind).
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,200}?charset\s*=\s*[\"']?([a-zA-Z0-9_\-]{2,32})", re.IGNORECASE
)
_XML_DECL_RE = re.compile(
    rb"<\?xml[^>]{0,200}?encoding\s*=\s*[\"']([a-zA-Z0-9_\-]{2,32})[\"']",
    re.IGNORECASE,
)

# Labels the WHATWG spec maps away from their namesake codec; the one that
# matters in practice: pages that say latin-1/iso-8859-1 are decoded as
# windows-1252 by every browser (the superset; 0x80-0x9F are real chars).
_LABEL_OVERRIDES = {
    "iso-8859-1": "windows-1252",
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "ascii": "windows-1252",
    "us-ascii": "windows-1252",
}


def _resolve_codec(label: str) -> str | None:
    """Charset label → Python codec name, or None if unknown/undecodable."""
    norm = label.strip().lower()
    norm = _LABEL_OVERRIDES.get(norm, norm)
    try:
        info = codecs.lookup(norm)
    except LookupError:
        return None
    # utf-7 is a spec-mandated refusal (it can smuggle markup past filters)
    if info.name in ("utf-7",):
        return None
    return info.name


def sniff_charset(raw: bytes) -> tuple[str, str]:
    """bytes → (python_codec_name, source) — source ∈ {'bom','meta','xml','default'}.

    Priority is the browser order: BOM beats in-document declarations beats
    the utf-8 default. Unknown labels fall through to the default rather
    than erroring (a wrong declaration is a data problem, not a job
    failure)."""
    for bom, codec in _BOMS:
        if raw.startswith(bom):
            return codec, "bom"
    head = raw[:_PRESCAN_BYTES]
    m = _META_CHARSET_RE.search(head)
    if m:
        codec = _resolve_codec(m.group(1).decode("ascii", "replace"))
        if codec:
            return codec, "meta"
    m = _XML_DECL_RE.search(head)
    if m:
        codec = _resolve_codec(m.group(1).decode("ascii", "replace"))
        if codec:
            return codec, "xml"
    return "utf-8", "default"


def decode_html(raw: bytes) -> tuple[str, str, str]:
    """bytes → (text, codec, source). Never raises: errors='replace', and a
    codec that fails structurally (truncated utf-16 tail etc.) falls back to
    utf-8-replace. BOM codecs consume their BOM (utf-8-sig strips it;
    explicit-endian utf-16/32 skip it manually)."""
    codec, source = sniff_charset(raw)
    body = raw
    if source == "bom" and codec != "utf-8-sig":
        for bom, c in _BOMS:
            if c == codec:
                body = raw[len(bom):]
                break
    try:
        return body.decode(codec, errors="replace"), codec, source
    except Exception:
        # errors='replace' covers malformed *data*; this branch covers
        # malformed *state* (e.g. a codec rejecting odd-length input outright)
        return raw.decode("utf-8", errors="replace"), "utf-8", "fallback"


_JSONLD_DATE_RE = re.compile(r'"datePublished"\s*:\s*"([^"]{4,64})"')

_ROBOTS_SPLIT_RE = re.compile(r"[,\s]+")


class _MetaParser(HTMLParser):
    """Streaming tolerant parse → first-wins metadata fields.

    Never requires balanced tags; a truncated document yields whatever was
    seen before the cut. All fields are first-occurrence-wins (deterministic
    under repeated/conflicting tags, matching the reference's
    first-match-wins regex cascades, ocr.py:176-185)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.fields: dict[str, str | None] = {
            "title": None,
            "description": None,
            "canonical_url": None,
            "lang_attr": None,
            "og_title": None,
            "og_site_name": None,
            "og_type": None,
            "published_time": None,
        }
        self.robots_tokens: set[str] = set()
        self.h1_count = 0
        self._title_parts: list[str] | None = None
        self._jsonld_depth = 0
        self._jsonld_date: str | None = None
        self._time_datetime: str | None = None

    def _set(self, key: str, value: str | None) -> None:
        if value is None:
            return
        value = " ".join(value.split())
        if value and self.fields[key] is None:
            self.fields[key] = value

    # -- hooks -----------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        a = dict(attrs)  # html.parser lowercases attr names; last dup wins
        if tag == "html":
            self._set("lang_attr", a.get("lang"))
        elif tag == "title":
            if self.fields["title"] is None and self._title_parts is None:
                self._title_parts = []
        elif tag == "meta":
            name = (a.get("name") or "").strip().lower()
            prop = (a.get("property") or "").strip().lower()
            content = a.get("content")
            if name == "description":
                self._set("description", content)
            elif name == "robots" and content:
                self.robots_tokens.update(
                    t for t in _ROBOTS_SPLIT_RE.split(content.strip().lower()) if t
                )
            elif prop == "og:title":
                self._set("og_title", content)
            elif prop == "og:site_name":
                self._set("og_site_name", content)
            elif prop == "og:type":
                self._set("og_type", content)
            elif prop == "article:published_time":
                self._set("published_time", content)
        elif tag == "link":
            rels = (a.get("rel") or "").strip().lower().split()
            if "canonical" in rels:
                self._set("canonical_url", a.get("href"))
        elif tag == "script":
            if (a.get("type") or "").strip().lower() == "application/ld+json":
                self._jsonld_depth += 1
        elif tag == "time":
            dt = a.get("datetime")
            if dt and self._time_datetime is None:
                self._time_datetime = " ".join(dt.split()) or None
        elif tag == "h1":
            self.h1_count += 1

    def handle_endtag(self, tag: str) -> None:
        if tag == "title" and self._title_parts is not None:
            self._set("title", "".join(self._title_parts))
            self._title_parts = None
        elif tag == "script" and self._jsonld_depth:
            self._jsonld_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._title_parts is not None:
            self._title_parts.append(data)
        elif self._jsonld_depth and self._jsonld_date is None:
            m = _JSONLD_DATE_RE.search(data)
            if m:
                self._jsonld_date = m.group(1)

    def close(self) -> None:  # flush an unclosed <title> on truncated docs
        super().close()
        if self._title_parts is not None:
            self._set("title", "".join(self._title_parts))
            self._title_parts = None


_EMPTY_FIELDS = dict(_MetaParser().fields)


def parse_metadata(raw: bytes | None) -> dict:
    """bytes → flat metadata dict (every key present, absent values None).

    ``published_time`` priority: ``article:published_time`` meta → JSON-LD
    ``datePublished`` → first ``<time datetime>`` — the specific-to-generic
    cascade (same shape as the reference's id cascade, ocr.py:176-185). The
    value is the raw declared string; timestamp normalization belongs to the
    Column layer (``try_to_timestamp`` downstream) where the engine's pinned
    format order applies."""
    out: dict = dict(_EMPTY_FIELDS)
    out.update(
        {"noindex": False, "nofollow": False, "h1_count": 0,
         "charset": None, "charset_source": None}
    )
    if raw is None:
        return out
    raw = bytes(raw)
    text, codec, source = decode_html(raw)
    out["charset"], out["charset_source"] = codec, source

    p = _MetaParser()
    try:
        p.feed(text)
        p.close()
    except Exception:
        # html.parser very rarely raises; keep whatever fields accumulated
        pass

    out.update(p.fields)
    if out["published_time"] is None:
        out["published_time"] = p._jsonld_date or p._time_datetime
    out["noindex"] = "noindex" in p.robots_tokens or "none" in p.robots_tokens
    out["nofollow"] = "nofollow" in p.robots_tokens or "none" in p.robots_tokens
    out["h1_count"] = p.h1_count
    return out
