"""Hashed n-gram NB-linear classifier: train/score round trip, differential
score check against a pure-Python reimplementation over Spark-fetched gram
buckets, degenerate inputs, and the broadcast plan shape."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from final_ocr_spark.operators.classify import (
    _gram_bucket_rows,
    score_ngram_linear,
    train_ngram_nb,
)

NF = 1 << 12  # small feature space so tests exercise collisions too

SPAM_WORDS = ["buy", "cheap", "pills", "casino", "winner", "free"]
HAM_WORDS = ["the", "weather", "report", "notes", "meeting", "garden"]


def _corpus(spark, n=40, seed=3):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        y = i % 2
        words = rng.choices(SPAM_WORDS if y else HAM_WORDS, k=30)
        rows.append((f"d{i}", " ".join(words), y))
    return spark.createDataFrame(rows, "doc_id string, text string, label int")


def test_train_score_separates_classes(spark):
    labeled = _corpus(spark)
    w = train_ngram_nb(labeled, n_features=NF).localCheckpoint()
    scored = score_ngram_linear(labeled, w, n_features=NF).collect()
    for r in scored:
        assert (r.score > 0.5) == (r.label == 1), (r.doc_id, r.score, r.label)


def test_score_matches_python_reference(spark):
    labeled = _corpus(spark, n=20)
    w = train_ngram_nb(labeled, n_features=NF).localCheckpoint()
    weights = {r.b: r.weight for r in w.collect()}
    bias = weights.pop(-1)

    probe = spark.createDataFrame(
        [
            ("p0", "buy cheap pills now"),
            ("p1", "the weather report notes"),
            ("p2", ""),  # zero grams -> sigmoid(bias)
            ("p3", "!!! ..."),  # punctuation-only -> zero grams too
        ],
        "doc_id string, text string",
    )
    # gram->bucket mapping comes from the SAME Spark hashing the scorer uses
    buckets = {
        k: [r.b for r in g]
        for k, g in __import__("itertools").groupby(
            sorted(
                _gram_bucket_rows(probe, "doc_id", "text", NF, 2).collect(),
                key=lambda r: r.k,
            ),
            key=lambda r: r.k,
        )
    }
    got = {
        r.doc_id: r.score
        for r in score_ngram_linear(probe, w, n_features=NF).collect()
    }
    for doc in ("p0", "p1", "p2", "p3"):
        s = sum(weights.get(b, 0.0) for b in buckets.get(doc, [])) + bias
        assert got[doc] == pytest.approx(1.0 / (1.0 + math.exp(-s)), rel=1e-12)
    assert got["p2"] == got["p3"] == pytest.approx(1.0 / (1.0 + math.exp(-bias)))


def test_bigrams_affect_features(spark):
    df = spark.createDataFrame(
        [("a", "x y"), ("b", "y x")], "doc_id string, text string"
    )
    rows = _gram_bucket_rows(df, "doc_id", "text", NF, 2).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.k, []).append(r.b)
    # same unigrams, different bigram bucket -> multisets differ
    assert sorted(per_doc["a"]) != sorted(per_doc["b"])
    uni = _gram_bucket_rows(df, "doc_id", "text", NF, 1).collect()
    per_uni = {}
    for r in uni:
        per_uni.setdefault(r.k, []).append(r.b)
    assert sorted(per_uni["a"]) == sorted(per_uni["b"])


def test_label_and_ngram_validation(spark):
    df = spark.createDataFrame(
        [("a", "x", 2)], "doc_id string, text string, label int"
    )
    with pytest.raises(ValueError, match="0/1"):
        train_ngram_nb(df)
    ok = spark.createDataFrame(
        [("a", "x", 1)], "doc_id string, text string, label int"
    )
    with pytest.raises(ValueError, match="word_ngrams"):
        train_ngram_nb(ok, word_ngrams=3)
    with pytest.raises(ValueError, match="word_ngrams"):
        score_ngram_linear(ok, train_ngram_nb(ok), word_ngrams=3)


def test_weights_join_is_broadcast(spark):
    labeled = _corpus(spark, n=10)
    w = train_ngram_nb(labeled, n_features=NF).localCheckpoint()
    plan = (
        score_ngram_linear(labeled, w, n_features=NF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
