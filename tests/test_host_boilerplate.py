"""host_boilerplate_dedup: per-host frequent-line (site chrome) removal.

Oracle: an independent DuckDB formulation grouping on the LINE STRING
(hash-free) with the same integer cross-multiplied ratio test.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from final_ocr_spark.operators.dedup import host_boilerplate_dedup

NAV = "Home | Products | About Us | Contact | Careers"
COOKIE = "We use cookies to enhance your browsing experience"
QUOTE = "To be or not to be that is the question for tonight"


def _corpus():
    rows = []
    # host a: 6 pages, NAV on all 6 (ratio 1.0), COOKIE on 2 (ratio 1/3),
    # QUOTE on 1 (ratio 1/6)
    for i in range(6):
        parts = [NAV, f"host-a unique article body number {i} with detail"]
        if i < 2:
            parts.append(COOKIE)
        if i == 0:
            parts.append(QUOTE)
        rows.append((f"https://a.com/{i}", "a.com", "\n".join(parts)))
    # host b: only 3 pages (< min_pages) — its universal line is SAFE
    for i in range(3):
        rows.append(
            (f"https://b.com/{i}", "b.com",
             f"{NAV}\nhost-b distinct article text number {i} here")
        )
    # the cross-host QUOTE also on one b page: never frequent per-host
    rows.append((f"https://b.com/q", "b.com", f"{QUOTE}\nb quote page body"))
    # null text page on host a (counts in the denominator, passes through)
    rows.append(("https://a.com/null", "a.com", None))
    return rows


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "url string, host string, text string")
    return {
        r["url"]: (r["text"], r["n_lines_dropped"])
        for r in host_boilerplate_dedup(df, **kw).collect()
    }


def test_host_boilerplate_matches_duckdb_oracle(spark):
    rows = _corpus()
    got = _run(spark, rows, min_ratio=0.4, min_pages=5, min_chars=15)
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["url", "host", "text"]))
    oracle = con.execute(
        """
        WITH d AS (SELECT url, host, text,
                          string_split(coalesce(text,''), chr(10)) AS ls
                   FROM docs),
        occ AS (
          SELECT host, url,
                 unnest(ls) AS line,
                 generate_subscripts(ls, 1) - 1 AS pos
          FROM d
        ),
        lng AS (SELECT * FROM occ WHERE length(line) >= 15),
        np AS (SELECT host, count(*) AS npages FROM d GROUP BY host),
        lp AS (SELECT host, line, count(DISTINCT url) AS nwith
               FROM lng GROUP BY host, line),
        boiler AS (
          SELECT lp.host, lp.line FROM lp JOIN np USING (host)
          WHERE np.npages >= 5
            AND lp.nwith * 1000000 >= 400000 * np.npages
        ),
        kills AS (
          SELECT url, list(DISTINCT pos) AS kill
          FROM lng JOIN boiler USING (host, line) GROUP BY url
        )
        SELECT d.url,
               CASE WHEN k.kill IS NULL THEN d.text
                    ELSE array_to_string([ls[i+1] FOR i IN range(0, len(ls))
                                          IF NOT list_contains(k.kill, i)],
                                         chr(10))
               END AS text,
               CASE WHEN k.kill IS NULL THEN 0 ELSE len(k.kill) END AS n
        FROM d LEFT JOIN kills k USING (url)
        """
    ).fetchall()
    assert len(oracle) == len(got)
    for url, text, n in oracle:
        assert got[url] == (text, n), url


def test_host_boilerplate_pinned_semantics(spark):
    out = _run(spark, _corpus(), min_ratio=0.4, min_pages=5, min_chars=15)
    # NAV (6/7 of host a incl. the null page) goes from EVERY a page — zero
    # copies kept, the body survives
    for i in range(6):
        text, n = out[f"https://a.com/{i}"]
        assert NAV not in text and "unique article body" in text
        assert n >= 1
    # COOKIE is on 2/7 a-pages (< 0.4) — kept
    assert COOKIE in out["https://a.com/0"][0]
    # host b is under min_pages: its universal NAV is safe
    for i in range(3):
        assert NAV in out[f"https://b.com/{i}"][0]
    # the cross-host quote never reaches per-host frequency — kept on both
    assert QUOTE in out["https://a.com/0"][0]
    assert QUOTE in out["https://b.com/q"][0]
    # null text passes through
    assert out["https://a.com/null"] == (None, 0)


def test_host_boilerplate_in_page_repeats(spark):
    """A nav line printed twice on one page counts ONCE toward the ratio
    (distinct pages) but BOTH copies are removed when it qualifies."""
    rows = [(f"https://x.com/{i}", "x.com",
             f"{NAV}\npage {i} body line with enough characters\n{NAV}")
            for i in range(5)]
    out = _run(spark, rows, min_ratio=0.9, min_pages=5, min_chars=15)
    for i in range(5):
        text, n = out[f"https://x.com/{i}"]
        assert NAV not in text and n == 2


def test_host_boilerplate_rejects_bad_ratio(spark):
    df = spark.createDataFrame(
        [("u", "h", "t")], "url string, host string, text string"
    )
    with pytest.raises(ValueError):
        host_boilerplate_dedup(df, min_ratio=0.0)


def test_host_boilerplate_plan_is_slim(spark):
    """Line strings may exist only between Generate(posexplode) and the
    hashing Project — never in an exchange or aggregation node."""
    df = spark.createDataFrame(
        _corpus(), "url string, host string, text string"
    )
    plan = (
        host_boilerplate_dedup(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for ln in plan.splitlines():
        if "Exchange" in ln or "HashAggregate" in ln:
            assert "line#" not in ln, ln
