"""Stupid-Backoff bigram LM: differential vs a pure-Python scorer on the
same tokenization, in-domain vs gibberish ranking, degenerate docs, and
both join strategies."""

from __future__ import annotations

import math
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
