"""build_frontier: composition of canonicalize → robots → seen-bloom →
rank-priority → host cap. Each piece has its own oracle elsewhere; these
tests pin the COMPOSITION semantics."""

from __future__ import annotations

import pytest

from final_ocr_spark.operators.frontier import build_frontier


def _cands(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_frontier_canonicalizes_and_dedups(spark):
    out = {
        r["url"]
        for r in build_frontier(
            _cands(
                spark,
                [
                    "https://www.a.com/x/?utm_source=feed",
                    "https://a.com:443/x",      # same after canonicalization
                    "https://a.com/y?b=2&a=1",
                    "https://a.com/y?a=1&b=2",  # same (sorted query)
                ],
            )
        ).collect()
    }
    assert out == {"https://a.com/x", "https://a.com/y?a=1&b=2"}


def test_frontier_full_composition(spark):
    robots = spark.createDataFrame(
        [("blocked.com", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    # exact history: /seen/1 crawled already
    seen = _cands(spark, ["https://a.com/seen/1"])
    from final_ocr_spark.operators.bloom import build_bloom

    bloom = build_bloom(seen, key="url", n_items=100).localCheckpoint()
    ranks = spark.createDataFrame(
        [("a.com", 0.7), ("b.com", 0.3)], "id string, rank double"
    )
    cands = _cands(
        spark,
        [
            "https://a.com/new/1",
            "https://a.com/seen/1",        # in history → dropped
            "https://blocked.com/page",    # robots-disallowed → dropped
            "https://b.com/p",
            "https://unranked.org/q",      # no rank row → priority 0
        ],
    )
    rows = {
        r["url"]: r
        for r in build_frontier(
            cands,
            robots=robots,
            seen_bloom=bloom,
            seen_urls=seen,
            host_ranks=ranks,
        ).collect()
    }
    assert set(rows) == {
        "https://a.com/new/1", "https://b.com/p", "https://unranked.org/q"
    }
    assert rows["https://a.com/new/1"]["host"] == "a.com"
    assert rows["https://a.com/new/1"]["priority"] == 0.7
    assert rows["https://b.com/p"]["priority"] == 0.3
    assert rows["https://unranked.org/q"]["priority"] == 0.0


def test_frontier_bloom_without_history_is_conservative(spark):
    """maybe-seen rows drop when no exact history is supplied — never a
    refetch; definitely-new rows always survive (no false negatives)."""
    from final_ocr_spark.operators.bloom import build_bloom

    seen = _cands(spark, [f"https://s.com/{i}" for i in range(50)])
    bloom = build_bloom(seen, key="url", n_items=100).localCheckpoint()
    cands = _cands(
        spark,
        [f"https://s.com/{i}" for i in range(50)]       # all seen
        + [f"https://fresh.com/{i}" for i in range(50)],  # all new
    )
    out = {r["url"] for r in build_frontier(cands, seen_bloom=bloom).collect()}
    assert not any(u.startswith("https://s.com/") for u in out)
    # all-but-fpp of the fresh urls survive (fpp=1% of 50 → ~0-2 lost)
    fresh = [u for u in out if u.startswith("https://fresh.com/")]
    assert len(fresh) >= 47


def test_frontier_exact_history_only(spark):
    seen = _cands(spark, ["https://www.h.com/a/"])  # canonicalized on join
    out = {
        r["url"]
        for r in build_frontier(
            _cands(spark, ["https://h.com/a", "https://h.com/b"]),
            seen_urls=seen,
        ).collect()
    }
    assert out == {"https://h.com/b"}


def test_frontier_host_cap(spark):
    cands = _cands(
        spark,
        [f"https://hot.com/{i:03d}" for i in range(40)]
        + ["https://cold.com/only"],
    )
    out = build_frontier(cands, per_host_cap=10).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r["url"])
    assert len(by_host["hot.com"]) == 10
    # deterministic: first 10 in url order
    assert sorted(by_host["hot.com"]) == [
        f"https://hot.com/{i:03d}" for i in range(10)
    ]
    assert by_host["cold.com"] == ["https://cold.com/only"]


def test_frontier_robots_gate_on_raw_urls(spark):
    """Robots rules are keyed by the AS-PUBLISHED host and path; the gate
    must run before canonicalization (review-caught: www-keyed rules and
    trailing-slash Disallow prefixes were silently bypassed)."""
    robots = spark.createDataFrame(
        [("www.example.com", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string",
    )
    out = {
        r["url"]
        for r in build_frontier(
            _cands(
                spark,
                [
                    "https://www.example.com/private/1",  # rule host = www...
                    "https://www.example.com/public/1",
                ],
            ),
            robots=robots,
        ).collect()
    }
    # disallowed url dropped even though canonicalization strips www
    assert out == {"https://example.com/public/1"}


def test_frontier_rank_join_normalizes_www_hosts(spark):
    """pagerank ids keep the authority as crawled (www included); the
    priority join must still hit (review-caught: every www host ranked 0)."""
    ranks = spark.createDataFrame(
        [("www.big.com", 0.6), ("big.com", 0.2), ("other.org", 0.2)],
        "id string, rank double",
    )
    rows = {
        r["url"]: r["priority"]
        for r in build_frontier(
            _cands(spark, ["https://www.big.com/a", "https://nowhere.net/b"]),
            host_ranks=ranks,
        ).collect()
    }
    # www + apex ranks sum onto the canonical host
    assert rows["https://big.com/a"] == pytest.approx(0.8)
    assert rows["https://nowhere.net/b"] == 0.0


def test_frontier_drops_hostless_candidates(spark):
    out = build_frontier(
        _cands(spark, ["/relative/path", "not a url", "https://ok.com/x"])
    ).collect()
    assert [r["url"] for r in out] == ["https://ok.com/x"]
