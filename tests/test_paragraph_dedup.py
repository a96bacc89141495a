"""paragraph_dedup: corpus-level repeated-paragraph removal.

Oracle: an independent DuckDB formulation (unnest-with-ordinality + window
first-occurrence) over the same rows — different engine, different plan,
same pinned semantics.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from final_ocr_spark.operators.dedup import paragraph_dedup

BOILER = "This website uses cookies to improve your experience ok"
LICENSE = "Content licensed under CC-BY 4.0 terms apply to every page"


def _corpus():
    return [
        # d1 is first (min key) — keeps both boilerplate paras
        ("d1", f"{BOILER}\nunique one body text that is long enough\n{LICENSE}"),
        # d2 repeats both — loses both, keeps its unique middle
        ("d2", f"{BOILER}\nsecond doc body text that is long enough\n{LICENSE}"),
        # d3 repeats boiler twice INSIDE the doc — in-doc repeat also dropped
        ("d3", f"{BOILER}\n{BOILER}\nthird doc body text long enough here"),
        # d4: short segments (headline, blank) never participate
        ("d4", "tiny\n\ntiny\nfourth doc body text that is long enough"),
        # d5: null text passes through
        ("d5", None),
        # d6: nothing shared
        ("d6", "completely unique fifth document paragraph long enough"),
    ]


def test_paragraph_dedup_matches_duckdb_oracle(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_paras_dropped"])
        for r in paragraph_dedup(df, key="doc_id", min_chars=30).collect()
    }

    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    oracle = con.execute(
        """
        WITH paras AS (
          SELECT doc_id,
                 unnest(string_split(text, chr(10))) AS para,
                 generate_subscripts(string_split(text, chr(10)), 1) - 1 AS pos
          FROM docs
        ),
        marked AS (
          SELECT doc_id, pos, para,
                 CASE WHEN length(para) >= 30 THEN
                   row_number() OVER (PARTITION BY CASE WHEN length(para) >= 30
                                                        THEN para END
                                      ORDER BY doc_id, pos)
                 ELSE 1 END AS occ
          FROM paras
        )
        SELECT doc_id,
               string_agg(para, chr(10) ORDER BY pos) FILTER (WHERE occ = 1) AS text,
               count(*) FILTER (WHERE occ > 1) AS n_dropped
        FROM marked GROUP BY doc_id
        """
    ).fetchall()
    for doc_id, text, n_dropped in oracle:
        assert got[doc_id][0] == (text or ""), doc_id
        assert got[doc_id][1] == n_dropped, doc_id
    # null-text row: untouched, zero drops
    assert got["d5"] == (None, 0)


def test_paragraph_dedup_pinned_semantics(spark):
    df = spark.createDataFrame(_corpus(), "doc_id string, text string")
    out = {
        r["doc_id"]: r for r in paragraph_dedup(df, key="doc_id", min_chars=30).collect()
    }
    # first occurrence (d1) keeps everything
    assert out["d1"]["text"].count(BOILER) == 1
    assert out["d1"]["text"].count(LICENSE) == 1
    assert out["d1"]["n_paras_dropped"] == 0
    # later docs lose the repeated paragraphs but keep their own body
    assert BOILER not in out["d2"]["text"] and LICENSE not in out["d2"]["text"]
    assert "second doc body" in out["d2"]["text"]
    assert out["d2"]["n_paras_dropped"] == 2
    # in-doc repeat: d3 keeps exactly zero copies (d1 owns the paragraph)
    assert out["d3"]["text"].count(BOILER) == 0
    assert out["d3"]["n_paras_dropped"] == 2
    # short lines unaffected even when repeated
    assert out["d4"]["text"] == _corpus()[3][1]
    assert out["d4"]["n_paras_dropped"] == 0
    # untouched docs byte-identical
    assert out["d6"]["text"] == _corpus()[5][1]
    # row count preserved
    assert len(out) == 6


def test_paragraph_dedup_plan_is_slim(spark):
    """The hash-side aggregation must not carry paragraph strings: the only
    exchanges allowed to carry `para` are none — para is pruned before every
    shuffle (the rebuild reads the original text column in place)."""
    df = spark.createDataFrame(_corpus(), "doc_id string, text string")
    plan = (
        paragraph_dedup(df, key="doc_id", min_chars=30)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the paragraph string may exist only between Generate(posexplode) and the
    # Project that hashes it — never in a shuffle or aggregation node
    for line in plan.splitlines():
        if "Exchange" in line or "HashAggregate" in line:
            assert "para" not in line, line
