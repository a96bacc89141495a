"""Link analysis tests: outlink parsing, host graph, PageRank differential
vs a straight numpy power iteration (same formula, same constants)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from final_ocr_spark.operators.links import (
    extract_outlinks,
    host_graph,
    pagerank,
    parse_outlinks,
)

PAGE = b"""<html><head><base href="https://example.com/dir/"></head><body>
<a href="page2">rel one</a>
<a href="/abs">abs path</a>
<a href="https://other.org/x?q=1#frag">Other <b>site</b></a>
<a href="mailto:x@y.z">mail</a>
<a href="javascript:void(0)">js</a>
<a href="ftp://files.example.com/f">ftp</a>
<a rel="NOFOLLOW sponsored" href="https://paid.example.net/">ad</a>
<a href="">empty</a>
<a name="anchor-only">no href</a>
</body></html>"""


class TestParseOutlinks:
    def test_resolution_and_filtering(self):
        links = parse_outlinks("https://example.com/dir/page1", PAGE)
        urls = [u for u, _, _ in links]
        assert urls == [
            "https://example.com/dir/page2",       # base-relative
            "https://example.com/abs",             # root-relative
            "https://other.org/x?q=1",             # fragment stripped
            "https://paid.example.net/",           # kept, flagged nofollow
        ]

    def test_anchor_text_and_nofollow(self):
        links = parse_outlinks("https://example.com/", PAGE)
        by_url = {u: (a, nf) for u, a, nf in links}
        assert by_url["https://other.org/x?q=1"] == ("Other site", False)
        assert by_url["https://paid.example.net/"] == ("ad", True)

    def test_base_fallback_is_page_url(self):
        links = parse_outlinks(
            "https://example.com/a/b", b'<a href="c">x</a>'
        )
        assert links == [("https://example.com/a/c", "x", False)]

    def test_relative_base_resolves_against_page_url(self):
        # the HTML spec resolves <base href> against the document URL, so a
        # relative base ("/en/") must not strand hrefs scheme-less (they
        # were silently dropped before the fix)
        html = b'<head><base href="/en/"></head><a href="x.html">x</a>'
        links = parse_outlinks("https://example.com/a/b", html)
        assert links == [("https://example.com/en/x.html", "x", False)]

    def test_max_links_cap_and_no_text_bleed(self):
        html = b"".join(
            b'<a href="/p%d">t%d</a>' % (i, i) for i in range(10)
        )
        links = parse_outlinks("https://e.com/", html, max_links=3)
        assert [a for _, a, _ in links] == ["t0", "t1", "t2"]

    def test_unclosed_anchor_bounded(self):
        html = b'<a href="/x">start ' + b"y " * 2000
        (_, anchor, _) = parse_outlinks("https://e.com/", html)[0]
        assert len(anchor) <= 500

    def test_new_anchor_implicitly_closes_previous(self):
        html = b'<a href="/one">first <a href="/two">second</a>'
        links = parse_outlinks("https://e.com/", html)
        assert [(u.rsplit("/", 1)[1], a) for u, a, _ in links] == [
            ("one", "first"), ("two", "second")
        ]

    def test_junk_and_none(self):
        assert parse_outlinks("https://e.com/", None) == []
        assert parse_outlinks("https://e.com/", b"\x00\xffgarbage<<<") == []

    def test_charset_sniffed_anchor(self):
        html = "<meta charset=windows-1252><a href='/x'>café</a>".encode("cp1252")
        assert parse_outlinks("https://e.com/", html)[0][1] == "café"


@pytest.fixture(scope="module")
def edge_rows(spark):
    pages = spark.createDataFrame(
        [
            ("https://a.com/1",
             b'<a href="https://b.com/x">b</a><a href="https://c.com/y">c</a>'
             b'<a href="/self">self</a>'),
            ("https://b.com/1", b'<a href="https://c.com/z">c</a>'),
            ("https://c.com/1",
             b'<a rel=nofollow href="https://a.com/q">paid</a>'),
            ("https://d.com/1", None),
        ],
        "url string, html binary",
    )
    return extract_outlinks(pages)


class TestOutlinksOperator:
    def test_edges(self, edge_rows):
        got = {(r.url, r.target_url, r.nofollow) for r in edge_rows.collect()}
        assert ("https://a.com/1", "https://b.com/x", False) in got
        assert ("https://a.com/1", "https://a.com/self", False) in got
        assert ("https://c.com/1", "https://a.com/q", True) in got
        assert len(got) == 5  # null-html page yields nothing

    def test_no_shuffle_single_stage(self, edge_rows):
        plan = edge_rows._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and plan.count("MapInPandas") == 1

    def test_host_graph(self, edge_rows):
        g = {
            (r.src_host, r.dst_host): r.weight
            for r in host_graph(edge_rows).collect()
        }
        # self-edge a.com→a.com dropped; nofollow c.com→a.com dropped
        assert g == {("a.com", "b.com"): 1, ("a.com", "c.com"): 1,
                     ("b.com", "c.com"): 1}
        g2 = host_graph(edge_rows, drop_nofollow=False).collect()
        assert {( r.src_host, r.dst_host) for r in g2} == {
            ("a.com", "b.com"), ("a.com", "c.com"), ("b.com", "c.com"),
            ("c.com", "a.com")}


def _numpy_pagerank(edges, n_ids, iterations=20, damping=0.85):
    """Straight dense power iteration — the independent oracle."""
    ids = sorted(n_ids)
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    W = np.zeros((n, n))
    for s, d, w in edges:
        W[idx[s], idx[d]] += w
    outw = W.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dangling = r[outw == 0].sum()
        contrib = np.zeros(n)
        nz = outw > 0
        contrib = (r[nz, None] * W[nz] / outw[nz, None]).sum(axis=0)
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return dict(zip(ids, r))


class TestPagerank:
    def test_matches_numpy_power_iteration(self, spark):
        rng = np.random.RandomState(7)
        ids = [f"h{i}" for i in range(25)]
        edges = []
        for _ in range(120):
            s, d = rng.randint(0, 25, 2)
            if s != d:
                edges.append((ids[s], ids[d], int(rng.randint(1, 5))))
        # dedup (s,d) keeping summed weights, as host_graph would produce
        agg: dict = {}
        for s, d, w in edges:
            agg[(s, d)] = agg.get((s, d), 0) + w
        edges = [(s, d, w) for (s, d), w in agg.items()]

        df = spark.createDataFrame(
            edges, "src_host string, dst_host string, weight long"
        )
        got = {r.id: r.rank for r in pagerank(df, iterations=20).collect()}
        touched = {s for s, _, _ in edges} | {d for _, d, _ in edges}
        want = _numpy_pagerank(edges, touched, iterations=20)
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    def test_dangling_mass_redistributed(self, spark):
        # b has no out-edges: its rank must flow back, sum stays 1
        df = spark.createDataFrame(
            [("a", "b", 1)], "src_host string, dst_host string, weight long"
        )
        got = {r.id: r.rank for r in pagerank(df, iterations=30).collect()}
        want = _numpy_pagerank([("a", "b", 1)], {"a", "b"}, iterations=30)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12)
        assert got["b"] > got["a"]

    def test_unweighted(self, spark):
        df = spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("a", "c")], "src_host string, dst_host string"
        )
        got = {
            r.id: r.rank
            for r in pagerank(df, weight=None, iterations=15).collect()
        }
        want = _numpy_pagerank(
            [("a", "b", 1), ("b", "a", 1), ("a", "c", 1)],
            {"a", "b", "c"}, iterations=15,
        )
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12)

    def test_bad_iterations(self, spark):
        df = spark.createDataFrame(
            [("a", "b", 1)], "src_host string, dst_host string, weight long"
        )
        with pytest.raises(ValueError, match="iterations"):
            pagerank(df, iterations=0)

    def test_residual_observes_convergence(self, spark):
        """with_residual=True emits the final-round L1 movement as a
        constant column — on the standard fixture 20 fixed rounds are
        genuinely converged (delta < 1e-8), and the delta matches the
        numpy twin's exactly; ranks are unchanged by the instrumentation."""
        rng = np.random.RandomState(7)
        ids = [f"h{i}" for i in range(25)]
        agg: dict = {}
        for _ in range(120):
            s, d = rng.randint(0, 25, 2)
            if s != d:
                agg[(ids[s], ids[d])] = agg.get((ids[s], ids[d]), 0) + 1
        edges = [(s, d, w) for (s, d), w in agg.items()]
        df = spark.createDataFrame(
            edges, "src_host string, dst_host string, weight long"
        )
        rows = pagerank(df, iterations=20, with_residual=True).collect()
        deltas = {r["l1_delta"] for r in rows}
        assert len(deltas) == 1  # constant across rows
        delta = deltas.pop()
        assert 0.0 <= delta < 1e-8  # fixed 20 rounds observably converged

        touched = {s for s, _, _ in edges} | {d for _, d, _ in edges}
        w19 = _numpy_pagerank(edges, touched, iterations=19)
        w20 = _numpy_pagerank(edges, touched, iterations=20)
        want_delta = sum(abs(w20[k] - w19[k]) for k in w20)
        assert delta == pytest.approx(want_delta, abs=1e-12)
        # ranks identical to the uninstrumented run
        got = {r.id: r.rank for r in rows}
        for k in w20:
            assert got[k] == pytest.approx(w20[k], abs=1e-12)


class TestAnchorTextCorpus:
    def _edges(self, spark):
        from final_ocr_spark.operators.links import extract_outlinks  # noqa

        rows = []
        # 3 pages call T "alpha site", 2 call it "beta", 1 calls it "gamma"
        for i in range(3):
            rows.append((f"https://s{i}.com/p", "https://t.com/", "alpha site", False))
        for i in range(2):
            rows.append((f"https://u{i}.com/p", "https://t.com/", "beta", False))
        rows.append(("https://v.com/p", "https://t.com/", "gamma", False))
        # one hub repeats an anchor 5x: must count once (distinct by url)
        rows += [("https://hub.com/p", "https://t.com/", "alpha site", False)] * 5
        # nofollow and empty anchors dropped
        rows.append(("https://x.com/p", "https://t.com/", "paid", True))
        rows.append(("https://y.com/p", "https://t.com/", "", False))
        return spark.createDataFrame(
            rows, "url string, target_url string, anchor_text string, nofollow boolean"
        )

    def test_topk_and_counts(self, spark):
        from final_ocr_spark.operators.links import anchor_text_corpus

        out = anchor_text_corpus(self._edges(spark), top_k=2).collect()
        assert len(out) == 1
        r = out[0]
        assert r.target_url == "https://t.com/"
        got = [(a.anchor, a.n_pages) for a in r.anchors]
        assert got == [("alpha site", 4), ("beta", 2)]  # rank order, hub=1
        # n_inlinks covers ALL anchors incl. the trimmed "gamma"
        assert r.n_inlinks == 7

    def test_spam_anchor_target_cap(self, spark):
        from final_ocr_spark.operators.links import anchor_text_corpus

        rows = [
            (f"https://s{i}.com/", f"https://t{t}.com/", "click here", False)
            for t in range(5) for i in range(5 - t)  # t0 gets 5 pages … t4 gets 1
        ]
        df = spark.createDataFrame(
            rows, "url string, target_url string, anchor_text string, nofollow boolean"
        )
        out = anchor_text_corpus(df, max_targets_per_anchor=2)
        assert {r.target_url for r in out.collect()} == {
            "https://t0.com/", "https://t1.com/"
        }
