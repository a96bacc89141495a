"""URL canonicalization for web corpora: the dedup key a crawl pipeline
groups by before any content hashing (the same page is fetched as
``HTTP://WWW.Site.com/p/``, ``http://site.com/p?utm_source=x`` …).

All pure Column expressions (codegen, scan-local). Every regex is RE2-safe
(no lookaround/backrefs) so the DuckDB oracle runs the same patterns.

Pinned normalization (each step deterministic, order matters):
  1. trim whitespace; non-URLs (no ``scheme://``) pass through trimmed;
  2. scheme and host lowercased; one leading ``www.`` stripped;
  3. default ports dropped (``:80`` for http, ``:443`` for https);
  4. fragment dropped;
  5. tracking params dropped (``utm_*``, ``gclid``, ``fbclid``, ``ref``),
     remaining params sorted (byte order) — parameter order never survives;
  6. trailing slashes stripped, empty path → ``/``.

``registered_domain`` is the last-two-labels heuristic with a pinned set of
second-level public suffixes (co/com/net/org/gov/ac/edu) promoting to
three labels — a deterministic approximation of the public-suffix list
(the full PSL is a data file, not an algorithm; callers can substitute).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"

# THE shared authority-extraction regex (group 1 = authority): one
# definition so the host a gate joins on and the host an operator groups by
# cannot silently diverge (links.host_graph and robots_verdicts import
# this; streaming.stateful.with_host keeps its own pinned lowercase-scheme
# variant with an 'unknown' fallback — a different, oracle-pinned contract)
HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_TRACKING_RE = r"^(?:utm_[^=]*|gclid|fbclid|ref)="
_SLD = ("co", "com", "net", "org", "gov", "ac", "edu")


def url_parts(url) -> dict[str, Column]:
    """scheme/host/port/path/query as Columns ('' when absent)."""
    u = F.trim(url)
    auth = F.regexp_extract(u, _URL_RE, 2)
    # IPv6 literals bracket the host ([::1]); the colon split must not eat
    # them, so bracketed authorities take the whole [...] as host
    v6 = F.regexp_extract(auth, r"^(\[[^\]]*\])", 1)
    host = F.when(v6 != "", v6).otherwise(F.regexp_extract(auth, r"^([^:]*)", 1))
    return {
        "scheme": F.lower(F.regexp_extract(u, _URL_RE, 1)),
        "host": F.lower(host),
        "port": F.regexp_extract(auth, r"[^:](?::([0-9]+))$", 1),
        "path": F.regexp_extract(u, _URL_RE, 3),
        "query": F.regexp_extract(u, _URL_RE, 4),
    }


def normalize_url(url) -> Column:
    """Canonical URL per the module's pinned rules; non-URLs pass through
    trimmed."""
    u = F.trim(url)
    p = url_parts(url)
    host = F.regexp_replace(p["host"], r"^www\.", "")
    default_port = (
        (p["port"] == "")
        | ((p["scheme"] == "http") & (p["port"] == "80"))
        | ((p["scheme"] == "https") & (p["port"] == "443"))
    )
    port_part = F.when(default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), p["port"])
    )
    path = F.regexp_replace(p["path"], r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.filter(
        F.split(p["query"], "&"),
        lambda kv: (kv != "") & ~kv.rlike(_TRACKING_RE),
    )
    qs = F.array_join(F.array_sort(params), "&")
    query_part = F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs))
    canon = F.concat(
        p["scheme"], F.lit("://"), host, port_part, path, query_part
    )
    return F.when(p["scheme"] == "", u).otherwise(canon)


def registered_domain(host_col) -> Column:
    """Registrable domain of a (already-lowercased) hostname: last two
    labels, or three when the second-to-last is a pinned second-level
    public suffix (co.uk-style)."""
    parts = F.split(host_col, r"\.")
    n = F.size(parts)
    second = F.element_at(parts, -2)
    take3 = (n >= 3) & second.isin(*_SLD)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    return F.when(n <= 1, host_col).otherwise(F.when(take3, last3).otherwise(last2))
