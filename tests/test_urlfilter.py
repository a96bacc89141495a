"""URL blocklist filtering: domain anti-join + pattern gate + plan shape."""

from __future__ import annotations

from final_ocr_spark.operators.urlfilter import (
    DEFAULT_URL_PATTERNS,
    filter_blocked_urls,
)

_ROWS = [
    ("http://good.example/article/1", "keep"),
    ("http://www.spam.example/page", "blocked-domain"),
    ("http://sub.deep.spam.example/x", "blocked-subdomain"),
    ("https://ok.example/p?sessionid=abc123", "blocked-pattern"),
    ("https://ok.example/calendar/2019/07/", "blocked-calendar"),
    ("https://ok.example/static/site.css", "blocked-asset"),
    ("https://ok.example/wp-login.php", "blocked-endpoint"),
    ("not a url at all", "keep-nonurl"),
]


def _df(spark):
    return spark.createDataFrame(_ROWS, "url string, tag string")


def test_domain_and_pattern_filtering(spark):
    out = filter_blocked_urls(
        _df(spark), blocked_domains=["spam.example", "other.example"]
    )
    tags = sorted(r["tag"] for r in out.collect())
    assert tags == ["keep", "keep-nonurl"]


def test_patterns_only_and_domains_only(spark):
    pat_only = filter_blocked_urls(_df(spark), blocked_domains=None)
    assert sorted(r["tag"] for r in pat_only.collect()) == [
        "blocked-domain", "blocked-subdomain", "keep", "keep-nonurl"
    ]
    dom_only = filter_blocked_urls(
        _df(spark), blocked_domains=["spam.example"], patterns=()
    )
    assert sorted(r["tag"] for r in dom_only.collect()) == [
        "blocked-asset", "blocked-calendar", "blocked-endpoint",
        "blocked-pattern", "keep", "keep-nonurl",
    ]


def test_blocklist_dataframe_and_case(spark):
    bl = spark.createDataFrame([("SPAM.example",)], "domain string")
    out = filter_blocked_urls(_df(spark), blocked_domains=bl, patterns=())
    assert "blocked-domain" not in {r["tag"] for r in out.collect()}


def test_domain_join_is_broadcast(spark):
    out = filter_blocked_urls(_df(spark), blocked_domains=["spam.example"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the 10^12-row probe side must never shuffle for this join; the only
    # exchange allowed is the blocklist side's distinct (domain/_rd columns)
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "url" not in m.group(1), m.group(0)


def test_default_patterns_are_re2_safe():
    # no lookaround/backrefs — the same patterns must run under RE2-style
    # engines (and Spark's Java regex) — and each is pre-wrapped
    for p in DEFAULT_URL_PATTERNS:
        assert p.startswith("(?:") and "(?=" not in p and "(?<" not in p and "\\1" not in p


def test_null_url_kept_by_both_gates(spark):
    df = spark.createDataFrame(
        [(None, "null-url"), ("http://good.example/a", "keep")],
        "url string, tag string",
    )
    out = filter_blocked_urls(df, blocked_domains=["spam.example"])
    assert sorted(r["tag"] for r in out.collect()) == ["keep", "null-url"]
