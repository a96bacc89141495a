"""DSIR-style importance resampling (operators/importance.py): pure-Python
differential twin (gram buckets and md5 from the same primitives), target-
affinity sanity, determinism, and the broadcast plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from final_ocr_spark.operators.importance import (
    _py_gumbel,
    hashed_gram_logprobs,
    importance_resample,
    importance_weights,
)

_NF = 64  # tiny hashed vocab → real collisions exercised

_TARGET = [
    ("t1", "the committee approved the harbor dredging budget"),
    ("t2", "the council approved the library budget after debate"),
    ("t3", "members debated the harbor budget amendment"),
]
_RAW = [
    ("r1", "the committee approved the budget for the harbor"),   # target-like
    ("r2", "council members debated the library budget"),         # target-like
    ("r3", "quarterly snowfall totals exceeded the ridge median"),
    ("r4", "avalanche survey teams reported wind crusting depth"),
    ("r5", "bicycle repair notes and a broken spoke wrench"),
    ("r6", ""),                                                    # gramless
]


def _twin_weights(spark, raw_df, target_df):
    """Recompute log importance per doc in Python floats: gram BUCKETS come
    from the operator's own hashed-gram primitive (xxhash64 is Spark-only),
    probabilities/smoothing/sums are reimplemented independently."""
    from final_ocr_spark.operators.classify import _gram_bucket_rows

    def dist(df, key):
        rows = _gram_bucket_rows(df, key, "text", _NF, 2).collect()
        counts = {}
        for r in rows:
            counts[r["b"]] = counts.get(r["b"], 0) + 1
        tot = sum(counts.values())
        return {
            b: math.log((counts.get(b, 0) + 1.0) / (tot + float(_NF)))
            for b in range(_NF)
        }

    lp_t = dist(target_df, "doc_id")
    lp_r = dist(raw_df, "doc_id")
    rows = _gram_bucket_rows(raw_df, "doc_id", "text", _NF, 2).collect()
    w = {}
    for r in rows:
        w[r["k"]] = w.get(r["k"], 0.0) + (lp_t[r["b"]] - lp_r[r["b"]])
    return w


@pytest.fixture()
def frames(spark):
    raw = spark.createDataFrame(_RAW, "doc_id string, text string")
    target = spark.createDataFrame(_TARGET, "doc_id string, text string")
    return raw, target


def test_weights_match_python_twin(spark, frames):
    raw, target = frames
    got = {
        r["doc_id"]: r["log_importance"]
        for r in importance_weights(
            raw, target, key="doc_id", n_features=_NF
        ).collect()
    }
    want = _twin_weights(spark, raw, target)
    assert set(got) == {d for d, _ in _RAW}
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9)
    assert got["r6"] == 0.0  # gramless → distribution-neutral


def test_logprobs_sum_to_one(spark, frames):
    _, target = frames
    lp = hashed_gram_logprobs(target, "doc_id", "text", n_features=_NF)
    total = lp.select(F.sum(F.exp("logp"))).first()[0]
    assert total == pytest.approx(1.0, abs=1e-9)


def test_resample_matches_gumbel_topk_twin(spark, frames):
    raw, target = frames
    sel = importance_resample(
        raw, target, 3, key="doc_id", n_features=_NF, salt="s1"
    )
    got = [r["doc_id"] for r in sel.collect()]
    assert len(got) == 3 and len(set(got)) == 3

    # gramless docs (r6) are excluded from the candidate set: weight 0.0
    # would outrank real docs, whose log ratios are negative in expectation
    w = _twin_weights(spark, raw, target)
    scored = sorted(
        ((w[d] + _py_gumbel(d, "s1"), d) for d, _ in _RAW if d in w),
        key=lambda t: (-t[0], t[1]),
    )
    assert got == [d for _, d in scored[:3]]

    # even selecting "everything", the gramless doc never appears
    all_sel = {r["doc_id"] for r in importance_resample(
        raw, target, len(_RAW), key="doc_id", n_features=_NF, salt="s1"
    ).collect()}
    assert all_sel == {d for d, _ in _RAW} - {"r6"}

    # deterministic under the same salt, different under another
    again = [r["doc_id"] for r in importance_resample(
        raw, target, 3, key="doc_id", n_features=_NF, salt="s1"
    ).collect()]
    assert again == got
    other = {r["doc_id"] for r in importance_resample(
        raw, target, 3, key="doc_id", n_features=_NF, salt="s2"
    ).collect()}
    assert isinstance(other, set)  # selection exists; may or may not differ


def test_target_like_docs_outweigh_noise(spark, frames):
    raw, target = frames
    got = {
        r["doc_id"]: r["log_importance"]
        for r in importance_weights(
            raw, target, key="doc_id", n_features=_NF
        ).collect()
    }
    like = min(got["r1"], got["r2"])
    noise = max(got["r3"], got["r4"], got["r5"])
    assert like > noise  # the whole point of DSIR


def test_guards(spark, frames):
    raw, target = frames
    with pytest.raises(ValueError, match="n must be"):
        importance_resample(raw, target, 0, key="doc_id")
    with pytest.raises(ValueError, match="temperature"):
        importance_resample(raw, target, 1, key="doc_id", temperature=0.0)
    with pytest.raises(ValueError, match="word_ngrams"):
        hashed_gram_logprobs(target, "doc_id", "text", word_ngrams=3)


def test_plan_shape_broadcast_ratio_and_topk(spark, frames):
    """The per-doc weight sum must join the ratio table via a BROADCAST
    join (the corpus side never shuffles for it), and the top-n selection
    must be TakeOrderedAndProject, never a global Sort+Exchange."""
    raw, target = frames
    sel = importance_resample(raw, target, 2, key="doc_id", n_features=_NF)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
