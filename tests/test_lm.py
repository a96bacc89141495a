"""Stupid-Backoff bigram LM: differential vs a pure-Python scorer on the
same tokenization, in-domain vs gibberish ranking, degenerate docs, and
both join strategies."""

from __future__ import annotations

import math
import random
import re

import pytest
from pyspark.sql import functions as F

from final_ocr_spark.operators.lm import score_bigram_lm, train_bigram_lm

REF = [
    ("r0", "the cat sat on the mat and the cat slept"),
    ("r1", "the dog sat on the rug and the dog barked"),
    ("r2", "a cat and a dog sat together on the mat"),
]

PROBES = [
    ("p0", "the cat sat on the mat"),        # in-domain
    ("p1", "zyx qwv plk jhg fds"),           # out-of-domain gibberish
    ("p2", "the"),                           # 1 token: no transitions
    ("p3", ""),                              # empty
]


def _tok(s):
    return [w for w in re.sub(r"[^\w\s]+", " ", s.lower()).split() if w]


def _py_score(ref_texts, text, alpha=0.4):
    uni, big = {}, {}
    n = 0
    for t in ref_texts:
        ws = _tok(t)
        n += len(ws)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for v, w in zip(ws, ws[1:]):
            big[(v, w)] = big.get((v, w), 0) + 1
    v_sz = len(uni)
    ws = _tok(text)
    if len(ws) < 2:
        return None
    tot = 0.0
    for v, w in zip(ws, ws[1:]):
        if (v, w) in big:
            tot += math.log(big[(v, w)] / uni[v])
        else:
            tot += math.log(alpha * (uni.get(w, 0) + 1) / (n + v_sz))
    return tot / (len(ws) - 1)


@pytest.fixture(scope="module")
def lm(spark):
    ref = spark.createDataFrame(REF, "doc_id string, text string")
    return train_bigram_lm(ref).localCheckpoint()


def test_score_matches_python_reference(lm, spark):
    probes = spark.createDataFrame(PROBES, "doc_id string, text string")
    got = {r.doc_id: r.lm_logprob for r in score_bigram_lm(probes, lm).collect()}
    ref_texts = [t for _, t in REF]
    for doc_id, text in PROBES:
        exp = _py_score(ref_texts, text)
        if exp is None:
            assert got[doc_id] is None
        else:
            assert got[doc_id] == pytest.approx(exp, rel=1e-12)


def test_in_domain_beats_gibberish(lm, spark):
    probes = spark.createDataFrame(PROBES[:2], "doc_id string, text string")
    out = {r.doc_id: r.lm_ppl for r in score_bigram_lm(probes, lm).collect()}
    assert out["p0"] < out["p1"]


def test_shuffle_join_path_matches_broadcast(lm, spark):
    probes = spark.createDataFrame(PROBES, "doc_id string, text string")
    a = {r.doc_id: r.lm_logprob for r in score_bigram_lm(probes, lm).collect()}
    b = {
        r.doc_id: r.lm_logprob
        for r in score_bigram_lm(probes, lm, broadcast_lm=False).collect()
    }
    assert a == b


def test_broadcast_plan_shape(lm, spark):
    probes = spark.createDataFrame(PROBES, "doc_id string, text string")
    plan = (
        score_bigram_lm(probes, lm)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_rejects_lm_without_totals(lm, spark):
    broken = lm.filter(F.col("h") >= 0)
    probes = spark.createDataFrame(PROBES[:1], "doc_id string, text string")
    with pytest.raises(ValueError, match="totals"):
        score_bigram_lm(probes, broken)


def test_merge_equals_joint_training(lm, spark):
    from final_ocr_spark.operators.lm import merge_bigram_lm

    extra = [
        ("x0", "the cat sat on a new shiny mat"),
        ("x1", "every dog barked at the new cat"),
    ]
    lm_b = train_bigram_lm(
        spark.createDataFrame(extra, "doc_id string, text string")
    )
    joint = train_bigram_lm(
        spark.createDataFrame(REF + extra, "doc_id string, text string")
    )
    merged = merge_bigram_lm(lm, lm_b)
    j = {(r.h, r.is_bigram): r.n for r in joint.collect()}
    m = {(r.h, r.is_bigram): r.n for r in merged.collect()}
    assert j == m

    # and scoring through the merged table equals scoring through joint
    probes = spark.createDataFrame(PROBES, "doc_id string, text string")
    sj = {r.doc_id: r.lm_logprob for r in score_bigram_lm(probes, joint.localCheckpoint()).collect()}
    sm = {r.doc_id: r.lm_logprob for r in score_bigram_lm(probes, merged.localCheckpoint()).collect()}
    assert sj == sm


def test_perplexity_buckets_rank_matches_duckdb(spark):
    """Exact-rank mode vs an independent DuckDB window formulation with the
    same integer cross-multiplied band test and (ppl, key) tiebreak."""
    import duckdb
    import pandas as pd

    from final_ocr_spark.operators.lm import perplexity_buckets

    rng = random.Random(5)
    rows = [
        (f"u{i:03d}", rng.choice(["en", "fr"]), round(rng.uniform(10, 900), 3))
        for i in range(90)
    ]
    rows += [("u900", "en", None), ("u901", "de", 55.0)]  # null ppl; tiny lang
    df = spark.createDataFrame(rows, "url string, lang string, lm_ppl double")
    got = {
        r["url"]: r["lm_bucket"]
        for r in perplexity_buckets(df, mode="rank").collect()
    }
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["url", "lang", "lm_ppl"]))
    oracle = con.execute(
        """
        SELECT url,
               CASE WHEN lm_ppl IS NULL THEN NULL
                    WHEN r * 1000000 <= 333333 * n THEN 'head'
                    WHEN r * 1000000 <= 666667 * n THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM (
          SELECT url, lm_ppl,
                 row_number() OVER (PARTITION BY lang ORDER BY lm_ppl, url) AS r,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM docs WHERE lm_ppl IS NOT NULL
          UNION ALL
          SELECT url, lm_ppl, NULL, NULL FROM docs WHERE lm_ppl IS NULL
        )
        """
    ).fetchall()
    assert len(oracle) == len(got)
    for url, bucket in oracle:
        assert got[url] == bucket, url


def test_perplexity_buckets_approx_agrees_on_separated_data(spark):
    """On well-separated ppl values the approx cutoffs assign the same
    buckets as exact rank; within-language fractions come out ~1/3 each."""
    from final_ocr_spark.operators.lm import perplexity_buckets

    rows = [(f"u{i:03d}", "en", float(i)) for i in range(300)]
    df = spark.createDataFrame(rows, "url string, lang string, lm_ppl double")
    exact = {r["url"]: r["lm_bucket"]
             for r in perplexity_buckets(df, mode="rank").collect()}
    approx = {r["url"]: r["lm_bucket"]
              for r in perplexity_buckets(df, mode="approx").collect()}
    diff = sum(1 for u in exact if exact[u] != approx[u])
    assert diff <= 2, diff  # only band-edge rows may move
    from collections import Counter
    c = Counter(approx.values())
    assert abs(c["head"] - 100) <= 2 and abs(c["middle"] - 100) <= 2


def test_perplexity_buckets_end_to_end_with_lm(lm, spark):
    """Composed with score_bigram_lm: in-domain docs land in a better band
    than gibberish within the same language."""
    from final_ocr_spark.operators.lm import perplexity_buckets, score_bigram_lm

    probes = [(f"g{i}", " ".join(f"zx{j}q" for j in range(i, i + 12)))
              for i in range(8)]
    probes += [(f"d{i}", "the cat sat on the mat and the dog sat on the rug")
               for i in range(4)]
    df = spark.createDataFrame(probes, "doc_id string, text string") \
        .withColumn("lang", F.lit("en"))
    scored = score_bigram_lm(df, lm, key="doc_id")
    out = {r["doc_id"]: r["lm_bucket"]
           for r in perplexity_buckets(scored, key="doc_id", mode="rank").collect()}
    # head is the lowest-ppl 1/3 band: only in-domain docs reach it (the
    # 333333-ppm band edge admits 3 of the 4 tied d-docs; the 4th lands
    # exactly on rank 4 > 3.999996 — middle)
    assert sum(out[f"d{i}"] == "head" for i in range(4)) == 3
    assert all(out[f"d{i}"] != "tail" for i in range(4))
    assert all(out[f"g{i}"] in ("middle", "tail") for i in range(8))


def test_perplexity_buckets_rejects_bad_args(spark):
    from final_ocr_spark.operators.lm import perplexity_buckets

    df = spark.createDataFrame([("u", "en", 1.0)],
                               "url string, lang string, lm_ppl double")
    with pytest.raises(ValueError):
        perplexity_buckets(df, fractions=(0.5, 0.5))
    with pytest.raises(ValueError):
        perplexity_buckets(df, mode="exact")


def test_perplexity_buckets_null_lang_group(spark):
    """Review-caught: approx mode must band the null-language group like
    any other (plain equi-join sent every null-lang doc to 'tail')."""
    from final_ocr_spark.operators.lm import perplexity_buckets

    rows = [(f"e{i}", "en", float(i)) for i in range(30)]
    rows += [(f"n{i}", None, float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "url string, lang string, lm_ppl double")
    for mode in ("approx", "rank"):
        out = {r["url"]: r["lm_bucket"]
               for r in perplexity_buckets(df, mode=mode).collect()}
        # the best null-lang docs are head, not tail
        assert out["n0"] == "head" and out["n29"] == "tail", mode
        assert out["e0"] == "head" and out["e29"] == "tail", mode
