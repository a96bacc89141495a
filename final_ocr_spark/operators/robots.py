"""robots.txt evaluation: gate crawl pages on per-host robots rules.

The crawl-side sibling of the metadata noindex gate (operators/metadata.py):
robots.txt says *fetch or not*, meta robots says *index or not* — a
compliant corpus pipeline honors both. Rule semantics are delegated to the
stdlib ``urllib.robotparser`` (the original REP: per-agent groups, ordered
first-match-wins prefix rules, '*' group fallback, percent-encoding
normalization) so the engine's verdicts are bit-for-bit what every Python
crawler using the stdlib gets — and the stdlib itself is the differential
oracle in tests.

Scale shape: robots bodies are per-HOST (one small text per host —
crawlers fetch /robots.txt once per host), so the rule table is tiny
relative to the pages table and broadcast-joins onto pages by host; the
verdict is one Arrow-batched stage over (url, body) with a per-host parser
cache (pages arrive host-clustered from any real crawl layout, so the
cache hits almost always). Hosts with no robots row — or an unfetchable/
empty body — default to ALLOWED, the standard crawler convention.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from final_ocr_spark.functions.urls import HOST_RE as _HOST_RE


def robots_allowed(url: str, body: str | None, agent: str = "*") -> bool:
    """One verdict, stdlib semantics. None/empty/unparseable body → True."""
    if body is None or not body.strip():
        return True
    import urllib.robotparser

    rp = urllib.robotparser.RobotFileParser()
    rp.parse(body.splitlines())
    return rp.can_fetch(agent, url)


def _verdict_batches(
    batches: Iterator[pd.DataFrame], agent: str
) -> Iterator[pd.DataFrame]:
    import urllib.robotparser

    parsers: dict[str, urllib.robotparser.RobotFileParser | None] = {}
    for pdf in batches:
        urls = pdf["url"].tolist()
        hosts = pdf["_host"].tolist()
        bodies = pdf["_robots"].tolist()
        out = [True] * len(urls)
        for i, (u, h, b) in enumerate(zip(urls, hosts, bodies)):
            if not isinstance(b, str) or not b.strip():
                continue  # no robots → allowed
            # per-host parser cache: robots parse once per host per worker,
            # not once per row (bodies are identical within a host by
            # construction of the robots table)
            rp = parsers.get(h)
            if rp is None:
                rp = urllib.robotparser.RobotFileParser()
                try:
                    rp.parse(b.splitlines())
                except Exception:
                    rp = None  # unparseable → allowed (crawler convention)
                parsers[h] = rp
            if rp is not None:
                try:
                    out[i] = bool(rp.can_fetch(agent, u))
                except Exception:
                    out[i] = True
        yield pd.DataFrame({"url": urls, "robots_allowed": out})


def robots_verdicts(
    pages: DataFrame,
    robots: DataFrame,
    *,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """(url, robots_allowed) verdict per page.

    ``robots`` is the per-host rule table ``(host, robots_txt)`` — one row
    per host, the text of its /robots.txt (null/missing = no robots). The
    join is a broadcast-friendly left join on host: the robots table is
    O(#hosts), orders of magnitude smaller than pages; the html payload is
    never part of this plan (column pruning keeps only url)."""
    r = robots.select(
        F.lower(F.col(host_col)).alias("_host"),
        F.col(body_col).alias("_robots"),
    )
    p = pages.select(
        "url", F.lower(F.regexp_extract("url", _HOST_RE, 1)).alias("_host")
    )
    joined = p.join(F.broadcast(r), "_host", "left")

    def _fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _verdict_batches(it, agent)

    return joined.mapInPandas(_fn, schema="url string, robots_allowed boolean")


def apply_robots(
    pages: DataFrame,
    robots: DataFrame,
    *,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Filter pages to those robots.txt allows for ``agent`` — schema
    preserved; a left-semi join on url against the allowed verdicts, placed
    (like the other gates) BEFORE extraction so disallowed rows never reach
    the Python stage."""
    allowed = (
        robots_verdicts(
            pages, robots, agent=agent, host_col=host_col, body_col=body_col
        )
        .filter(F.col("robots_allowed"))
        .select("url")
    )
    return pages.join(allowed, "url", "left_semi")


def crawl_delays(
    robots: DataFrame,
    *,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """(host, crawl_delay) seconds per host from ``Crawl-delay`` directives
    (stdlib semantics: the agent's group wins over '*'; ``Request-rate``
    is converted to seconds-per-request when no Crawl-delay is given).
    Hosts without a directive get null — the scheduler's default applies.

    One Arrow stage over the O(#hosts) rule table; the result is the
    broadcast-sized dimension ``schedule_frontier(host_delays=...)`` takes.
    """

    def _fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import urllib.robotparser

        for pdf in it:
            hosts = pdf[host_col].tolist()
            bodies = pdf[body_col].tolist()
            delays: list[float | None] = [None] * len(hosts)
            for i, b in enumerate(bodies):
                if not isinstance(b, str) or not b.strip():
                    continue
                rp = urllib.robotparser.RobotFileParser()
                try:
                    rp.parse(b.splitlines())
                    d = rp.crawl_delay(agent)
                    if d is None:
                        rr = rp.request_rate(agent)
                        if rr is not None and rr.requests:
                            d = rr.seconds / rr.requests
                    delays[i] = float(d) if d is not None else None
                except Exception:
                    continue  # unparseable → no delay info
            yield pd.DataFrame(
                {"host": [h.lower() if isinstance(h, str) else h
                          for h in hosts],
                 "crawl_delay": delays}
            )

    return robots.select(host_col, body_col).mapInPandas(
        _fn, schema="host string, crawl_delay double"
    )
