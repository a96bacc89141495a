"""URL blocklist filtering: drop documents by domain list / path patterns.

The standard first gate of a web-corpus pipeline (C4 and successors filter
on a domain blocklist plus URL token patterns before any content work).
Filtering on the url column is ~free next to extraction, so it runs BEFORE
the Python stage and rides the scan.

Scale shape:

* the domain blocklist joins as a BROADCAST left-anti join on
  ``registered_domain(host)`` — blocklists are O(10^5-10^6) rows (tiny next
  to 10^12 docs) and a shuffle here would be the single worst join in the
  pipeline. ``F.broadcast`` pins the hint rather than trusting the
  autoBroadcastJoinThreshold against a 10^12-row probe side.
* pattern rules are one combined RE2-safe regex in a single codegen stage
  (scan-local, no shuffle, no Python).

Reference analog: the glob filter that decides which files enter the batch
loop (ocr2.py:569-575) — membership decided before any expensive per-doc
work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from final_ocr_spark.functions.urls import registered_domain, url_parts

# Pinned default URL-token patterns (public C4-style hygiene: session junk,
# calendar crawler traps, obvious non-content endpoints). RE2-safe; each
# alternative pre-wrapped (never splice bare alternations — see SNIPPETS).
DEFAULT_URL_PATTERNS = (
    r"(?:[?&;]sessionid=)",
    r"(?:/calendar/\d{4}/\d{1,2}(?:/|$))",
    r"(?:/(?:wp-login|xmlrpc)\.php)",
    r"(?:/cgi-bin/)",
    r"(?:\.(?:css|js|ico|woff2?)$)",
)


def filter_blocked_urls(
    df: DataFrame,
    blocked_domains: DataFrame | list[str] | None = None,
    url_col: str = "url",
    patterns: tuple[str, ...] = DEFAULT_URL_PATTERNS,
) -> DataFrame:
    """Drop rows whose url matches a blocked registered domain or a pattern.

    ``blocked_domains``: a one-column DataFrame (``domain``) or a plain list
    of registered domains (``example.com``); subdomains are blocked with
    their parent (``a.b.example.com`` → registered domain ``example.com``).
    ``patterns``: RE2-safe regexes OR-combined into one ``rlike`` — pass
    ``()`` to disable. Deterministic; row order preserved within partitions.
    """
    out = df
    if patterns:
        combined = "|".join(f"(?:{p})" for p in patterns)
        # explicit null policy (both gates): a null url carries no blocking
        # evidence and is KEPT — without the isNull branch, rlike's
        # three-valued logic would silently drop null-url rows here while
        # the anti-join below kept them
        out = out.filter(
            F.col(url_col).isNull() | ~F.col(url_col).rlike(combined)
        )
    if blocked_domains is not None:
        if isinstance(blocked_domains, list):
            spark = df.sparkSession
            blocked = spark.createDataFrame(
                [(d,) for d in blocked_domains], "domain string"
            )
        else:
            blocked = blocked_domains.select(
                F.col(blocked_domains.columns[0]).alias("domain")
            )
        host = url_parts(F.col(url_col))["host"]  # already lowercased
        dom = registered_domain(host)
        out = (
            out.withColumn("_rd", dom)
            .join(
                F.broadcast(blocked.select(F.lower("domain").alias("_rd")).distinct()),
                "_rd",
                "left_anti",
            )
            .drop("_rd")
        )
    return out
