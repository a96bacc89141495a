"""robots.txt gate tests — differential against the stdlib parser on a
fuzzed rule/url matrix, plus operator-level join/default behavior."""

from __future__ import annotations

import urllib.robotparser

import pytest
from pyspark.sql import functions as F

from final_ocr_spark.operators.robots import (
    apply_robots,
    robots_allowed,
    robots_verdicts,
)

# stdlib semantics are ORDERED first-match-wins (not Google's
# longest-match), so the Allow exception must precede its Disallow
ROBOTS_A = """
User-agent: *
Allow: /private/ok.html
Disallow: /private/
Disallow: /tmp

User-agent: specialbot
Disallow: /
"""

ROBOTS_B = """
User-agent: greedybot
Disallow:

User-agent: *
Disallow: /search
Crawl-delay: 10
"""


class TestRobotsAllowed:
    @pytest.mark.parametrize(
        "url,agent,want",
        [
            ("https://a.com/public/x", "*", True),
            ("https://a.com/private/x", "*", False),
            ("https://a.com/tmpfile", "*", False),       # prefix, not dir
            ("https://a.com/", "specialbot", False),     # agent group
            ("https://a.com/public/x", "specialbot", False),
        ],
    )
    def test_verdicts(self, url, agent, want):
        assert robots_allowed(url, ROBOTS_A, agent) is want

    def test_matches_stdlib_on_fuzzed_matrix(self):
        paths = ["/", "/private/", "/private/ok.html", "/priv", "/tmp/x",
                 "/tmp", "/a%20b", "/a b", "/search?q=1", "/search/deep",
                 "/Search", "/private/ok.html?x=1", "//double", "/%7Euser"]
        agents = ["*", "specialbot", "greedybot", "MyCrawler/1.0"]
        for body in (ROBOTS_A, ROBOTS_B):
            rp = urllib.robotparser.RobotFileParser()
            rp.parse(body.splitlines())
            for p in paths:
                for a in agents:
                    url = f"https://h.example{p}"
                    assert robots_allowed(url, body, a) == rp.can_fetch(a, url), (
                        body[:30], p, a,
                    )

    def test_missing_or_blank_body_allows(self):
        assert robots_allowed("https://a.com/x", None) is True
        assert robots_allowed("https://a.com/x", "   \n") is True


@pytest.fixture(scope="module")
def gated(spark):
    pages = spark.createDataFrame(
        [
            ("https://a.com/public/1", b"x"),
            ("https://a.com/private/1", b"x"),
            ("https://a.com/private/ok.html", b"x"),
            ("https://b.com/search?q=1", b"x"),
            ("https://b.com/page", b"x"),
            ("https://norobots.com/anything", b"x"),
        ],
        "url string, html binary",
    )
    robots = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.com", ROBOTS_B), ("empty.com", None)],
        "host string, robots_txt string",
    )
    return pages, robots


class TestRobotsOperators:
    def test_verdict_rows(self, gated):
        pages, robots = gated
        got = {r.url: r.robots_allowed for r in robots_verdicts(pages, robots).collect()}
        assert got == {
            "https://a.com/public/1": True,
            "https://a.com/private/1": False,
            "https://a.com/private/ok.html": True,   # Allow overrides
            "https://b.com/search?q=1": False,
            "https://b.com/page": True,
            "https://norobots.com/anything": True,   # no robots row
        }

    def test_agent_specific_group(self, gated):
        pages, robots = gated
        got = {
            r.url: r.robots_allowed
            for r in robots_verdicts(pages, robots, agent="specialbot").collect()
        }
        assert got["https://a.com/public/1"] is False  # Disallow: /
        assert got["https://b.com/page"] is True       # falls to * group

    def test_apply_preserves_schema_and_filters(self, gated):
        pages, robots = gated
        out = apply_robots(pages, robots)
        assert out.columns == pages.columns
        assert {r.url for r in out.collect()} == {
            "https://a.com/public/1",
            "https://a.com/private/ok.html",
            "https://b.com/page",
            "https://norobots.com/anything",
        }

    def test_broadcast_join_plan(self, gated, tmp_path):
        pages, robots = gated
        # parquet-backed pages: column pruning is observable in ReadSchema
        # (an in-memory relation always prints its full schema)
        p = str(tmp_path / "pages")
        pages.write.parquet(p)
        pq = pages.sparkSession.read.parquet(p)
        plan = (
            robots_verdicts(pq, robots)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        # the html payload must not reach the scan (pruned to url)
        assert "html" not in plan
