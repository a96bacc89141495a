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


def test_schedule_frontier_waves(spark):
    """At most per_host_per_wave urls of one host share a wave; ordering is
    priority-desc; crawl-delay stretches a host's stride."""
    from final_ocr_spark.operators.frontier import schedule_frontier

    rows = (
        [(f"http://hot.com/{i}", "hot.com", float(10 - i)) for i in range(6)]
        + [(f"http://slow.com/{i}", "slow.com", float(5 - i)) for i in range(3)]
        + [("http://one.com/x", "one.com", 1.0)]
    )
    fr = spark.createDataFrame(rows, "url string, host string, priority double")

    sched = {r["url"]: r["wave"] for r in schedule_frontier(fr).collect()}
    # per host: rank order by priority desc → wave = rank (k=1, stride 1)
    for i in range(6):
        assert sched[f"http://hot.com/{i}"] == i
    for i in range(3):
        assert sched[f"http://slow.com/{i}"] == i
    assert sched["http://one.com/x"] == 0

    # k=2: two urls of a host per wave
    sched2 = {r["url"]: r["wave"]
              for r in schedule_frontier(fr, per_host_per_wave=2).collect()}
    assert [sched2[f"http://hot.com/{i}"] for i in range(6)] == [0, 0, 1, 1, 2, 2]

    # crawl-delay: slow.com asks 5s, waves are 1s apart → stride 5;
    # unknown hosts stride 1; hostile delay capped
    delays = spark.createDataFrame(
        [("slow.com", 5.0), ("hot.com", None), ("evil.com", 1e12)],
        "host string, crawl_delay double",
    )
    sched3 = {r["url"]: r["wave"]
              for r in schedule_frontier(fr, host_delays=delays).collect()}
    assert [sched3[f"http://slow.com/{i}"] for i in range(3)] == [0, 5, 10]
    assert [sched3[f"http://hot.com/{i}"] for i in range(3)] == [0, 1, 2]

    # wave invariant: within any (host, wave), count <= k
    from collections import Counter
    c = Counter((r["url"].split("/")[2], r["wave"])
                for r in schedule_frontier(fr, per_host_per_wave=2).collect())
    assert max(c.values()) <= 2


def test_schedule_frontier_plan_single_exchange(spark):
    """No global sort: one hash exchange on host feeds the window."""
    from final_ocr_spark.operators.frontier import schedule_frontier

    fr = spark.createDataFrame(
        [("http://a.com/1", "a.com", 1.0)],
        "url string, host string, priority double",
    )
    plan = schedule_frontier(fr)._jdf.queryExecution().executedPlan().toString()
    import re
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "rangepartitioning" not in plan  # a global sort would use one


def test_crawl_delays_stdlib_semantics(spark):
    from final_ocr_spark.operators.robots import crawl_delays

    robots = spark.createDataFrame(
        [
            ("Slow.com", "User-agent: *\nCrawl-delay: 7\nDisallow: /x"),
            ("rate.com", "User-agent: *\nRequest-rate: 2/10"),
            ("agent.com",
             "User-agent: *\nCrawl-delay: 9\n\nUser-agent: mybot\nCrawl-delay: 2"),
            ("none.com", "User-agent: *\nDisallow: /private"),
            ("blank.com", None),
        ],
        "host string, robots_txt string",
    )
    got = {r["host"]: r["crawl_delay"] for r in crawl_delays(robots).collect()}
    assert got["slow.com"] == 7.0          # host lowercased
    assert got["rate.com"] == 5.0          # 10s / 2 requests
    assert got["none.com"] is None and got["blank.com"] is None
    assert got["agent.com"] == 9.0         # '*' group for default agent
    got2 = {r["host"]: r["crawl_delay"]
            for r in crawl_delays(robots, agent="mybot").collect()}
    assert got2["agent.com"] == 2.0        # specific agent group wins


def test_delayed_host_never_parallel_within_wave(spark):
    # review-caught: a host with a declared Crawl-delay gets ONE url per
    # wave even when per_host_per_wave > 1
    from final_ocr_spark.operators.frontier import schedule_frontier

    fr = spark.createDataFrame(
        [(f"http://slow.com/{i}", "slow.com", float(9 - i)) for i in range(4)]
        + [(f"http://fast.com/{i}", "fast.com", float(9 - i)) for i in range(4)],
        "url string, host string, priority double",
    )
    delays = spark.createDataFrame([("slow.com", 5.0)],
                                   "host string, crawl_delay double")
    got = {r["url"]: r["wave"] for r in schedule_frontier(
        fr, per_host_per_wave=2, host_delays=delays).collect()}
    assert [got[f"http://slow.com/{i}"] for i in range(4)] == [0, 5, 10, 15]
    assert [got[f"http://fast.com/{i}"] for i in range(4)] == [0, 0, 1, 1]
