"""duplicate_span_dedup: exact-substring (duplicated >=n-token span) removal.

Two independent oracles:
* a DuckDB formulation grouping on the gram STRING (hash-free — would also
  catch a 64-bit gram-hash collision);
* a pure-Python spec, fuzzed over small-vocabulary random corpora (small
  vocab forces heavy gram collisions and overlapping duplicated regions).
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from final_ocr_spark.operators.spans import duplicate_span_dedup

SPAN = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _corpus():
    return [
        # d1 owns the span (min key) — untouched
        ("d1", f"{SPAN} and some unique trailing words"),
        # d2 embeds the same 10-token span mid-document — span removed
        ("d2", f"intro words here {SPAN} tail words"),
        # d3 repeats a span INSIDE itself — second copy removed
        ("d3", f"{SPAN} bridge words between copies {SPAN}"),
        # d4 shorter than gram_n: never participates
        ("d4", "tiny doc"),
        # d5 null text passes through
        ("d5", None),
        # d6 case differs — EXACT semantics, no match
        ("d6", "Alpha Beta Gamma Delta Epsilon unrelated body words here now"),
    ]


def _oracle_sql(n: int) -> str:
    return f"""
    WITH d AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(coalesce(text,''), '\\s+'),
                         w -> w != '') AS ws
      FROM docs
    ),
    g AS (
      SELECT doc_id,
             unnest([{{'pos': i + {n} - 2,
                      'gram': array_to_string(ws[i:i+{n}-1], chr(31))}}
                     FOR i IN range(1, greatest(len(ws) - {n} + 2, 1))],
                    recursive := true)
      FROM d
    ),
    m AS (
      SELECT doc_id, pos,
             row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS occ
      FROM g
    ),
    cov AS (
      SELECT doc_id, unnest(range(pos - {n} + 1, pos + 1)) AS ki
      FROM m WHERE occ > 1
    ),
    kills AS (
      SELECT doc_id, list(DISTINCT ki) AS kill FROM cov GROUP BY doc_id
    )
    SELECT d.doc_id,
           CASE WHEN k.kill IS NULL THEN d.text
                ELSE array_to_string([ws[i+1] FOR i IN range(0, len(ws))
                                      IF NOT list_contains(k.kill, i)], ' ')
           END AS text,
           CASE WHEN k.kill IS NULL THEN 0 ELSE len(k.kill) END AS n_dropped
    FROM d LEFT JOIN kills k USING (doc_id)
    """


def _spec(rows: list[tuple[str, str | None]], n: int) -> dict[str, tuple]:
    """Pure-Python reference: keep-first duplicated-gram cover removal."""
    toks = {k: (t.split() if t else []) for k, t in rows}
    occurrences: dict[tuple, list[tuple[str, int]]] = {}
    for k, ws in toks.items():
        for i in range(max(len(ws) - n + 1, 0)):
            occurrences.setdefault(tuple(ws[i : i + n]), []).append((k, i + n - 1))
    kill: dict[str, set[int]] = {}
    for occ in occurrences.values():
        if len(occ) < 2:
            continue
        first = min(occ)
        for k, pos in occ:
            if (k, pos) != first:
                kill.setdefault(k, set()).update(range(pos - n + 1, pos + 1))
    out = {}
    for k, t in rows:
        ks = kill.get(k, set())
        if not ks:
            out[k] = (t, 0)
        else:
            ws = toks[k]
            out[k] = (" ".join(w for i, w in enumerate(ws) if i not in ks), len(ks))
    return out


def test_duplicate_span_dedup_matches_duckdb_oracle(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_tokens_dropped"])
        for r in duplicate_span_dedup(df, key="doc_id", gram_n=5).collect()
    }
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    for doc_id, text, n_dropped in con.execute(_oracle_sql(5)).fetchall():
        assert got[doc_id] == (text, n_dropped), doc_id


def test_duplicate_span_dedup_pinned_semantics(spark):
    df = spark.createDataFrame(_corpus(), "doc_id string, text string")
    out = {
        r["doc_id"]: r
        for r in duplicate_span_dedup(df, key="doc_id", gram_n=5).collect()
    }
    # first occurrence keeps everything — byte-identical passthrough
    assert out["d1"]["text"] == _corpus()[0][1]
    assert out["d1"]["n_tokens_dropped"] == 0
    # later doc loses exactly the 10 duplicated tokens, keeps its own words
    assert out["d2"]["text"] == "intro words here tail words"
    assert out["d2"]["n_tokens_dropped"] == 10
    # d1 owns the span globally — d3 loses BOTH copies (same global
    # keep-first convention as paragraph_dedup), keeps its own bridge
    assert out["d3"]["text"] == "bridge words between copies"
    assert out["d3"]["n_tokens_dropped"] == 20
    # below-threshold / null / case-mismatch rows untouched
    assert out["d4"]["text"] == "tiny doc"
    assert out["d5"]["text"] is None and out["d5"]["n_tokens_dropped"] == 0
    assert out["d6"]["text"] == _corpus()[5][1]
    assert len(out) == 6


def test_duplicate_span_dedup_fuzz_vs_spec(spark):
    """Small vocab + random lengths → dense overlapping duplicated regions;
    the Spark plan must agree with the pure-Python spec exactly."""
    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(8)]
    rows = [
        (f"d{i:03d}", " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_tokens_dropped"])
        for r in duplicate_span_dedup(df, key="doc_id", gram_n=4).collect()
    }
    want = _spec(rows, 4)
    for k in want:
        # empty-token docs: Spark rebuild never triggers (no grams) — text
        # passes through as-is including ''
        assert got[k] == want[k], k


def test_duplicate_span_dedup_long_gram_default(spark):
    """gram_n=50 (the Lee-et-al threshold) exercises the extended rotation
    table: a planted 60-token duplicated span is removed, sub-50-token
    overlaps are not."""
    words = [f"tok{i}" for i in range(60)]
    span60 = " ".join(words)
    span40 = " ".join(words[:40])
    rows = [
        ("a", f"{span60} unique a tail"),
        ("b", f"b head {span60} b tail"),  # 60-token dup — removed
        ("c", f"c head {span40} c tail"),  # only 40 shared — kept
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {
        r["doc_id"]: r for r in duplicate_span_dedup(df, gram_n=50).collect()
    }
    assert out["a"]["text"] == rows[0][1]
    assert out["b"]["text"] == "b head b tail"
    assert out["b"]["n_tokens_dropped"] == 60
    assert out["c"]["text"] == rows[2][1]


def test_duplicate_span_dedup_rejects_bad_gram(spark):
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with pytest.raises(ValueError):
        duplicate_span_dedup(df, gram_n=1)
    with pytest.raises(ValueError):
        duplicate_span_dedup(df, gram_n=64).collect()


def test_duplicate_span_dedup_plan_is_slim(spark):
    """Token strings may exist only between Generate(posexplode) and the
    Project that hashes them — never in an exchange or aggregation node."""
    df = spark.createDataFrame(_corpus(), "doc_id string, text string")
    plan = (
        duplicate_span_dedup(df, key="doc_id", gram_n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for line in plan.splitlines():
        if "Exchange" in line or "HashAggregate" in line:
            assert " w#" not in line and "text#" not in line, line
