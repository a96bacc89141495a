"""Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003) + overlap pairs.

The selection stage is differential-tested against a straightforward pure-
Python winnower over the SAME Spark-produced shingle hashes (the hash stage
itself is pinned by test_dedup.py::test_shingle_rows_match_array_form), and
the paper's guarantee — a shared run of >= window + k - 1 words yields a
shared fingerprint — is exercised with a planted containment corpus.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from final_ocr_spark.operators.dedup import (
    shingle_hash_rows,
    winnow_fingerprints,
    winnow_overlap,
)

K = 5
W = 4


def _docs_df(spark, docs: dict[str, str]):
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(docs.items())], "doc_id string, text string"
    )


def _py_winnow(hashes: list[int], window: int) -> set[int]:
    """Reference selection: min of every full window of consecutive k-gram
    hashes (tie direction is irrelevant to the selected-VALUE set)."""
    return {
        min(hashes[i : i + window]) for i in range(len(hashes) - window + 1)
    }


def _words(n: int, rng: random.Random) -> str:
    return " ".join(f"w{rng.randrange(5000)}" for _ in range(n))


def test_selection_matches_python_reference(spark):
    rng = random.Random(11)
    docs = {f"d{i}": _words(rng.randrange(3, 120), rng) for i in range(40)}
    # adversarial extras: repeated words (hash ties inside a window), exact
    # boundary lengths around the no-full-window threshold
    docs["tie"] = "x y x y x y x y x y x y"
    docs["thresh"] = " ".join(f"t{i}" for i in range(W + K - 1))  # exactly 1 window
    docs["short"] = "a b c"  # < k words: no shingles at all
    df = _docs_df(spark, docs)

    rows = (
        shingle_hash_rows(df, key="doc_id", text_col="text", shingle_k=K, with_pos=True)
        .orderBy("k", "pos")
        .collect()
    )
    per_doc: dict[str, list[int]] = {}
    for r in rows:
        per_doc.setdefault(r.k, []).append(r.h)

    expected = {
        k: _py_winnow(hs, W) for k, hs in per_doc.items() if len(hs) >= W
    }
    got: dict[str, set[int]] = {}
    for r in winnow_fingerprints(df, shingle_k=K, window=W).collect():
        got.setdefault(r.k, set()).add(r.fp)

    assert got == expected
    assert "short" not in got and "thresh" in got and len(got["thresh"]) == 1


def test_containment_guarantee_and_overlap(spark):
    rng = random.Random(7)
    span = _words(40, rng)  # 40 shared words >> W + K - 1 = 8
    docs = {
        "host": _words(150, rng) + " " + span + " " + _words(150, rng),
        "quote": span,
        "noise1": _words(200, rng),
        "noise2": _words(200, rng),
    }
    df = _docs_df(spark, docs)

    fps = winnow_fingerprints(df, shingle_k=K, window=W)
    by_doc = {
        k: {r.fp for r in g}
        for k, g in __import__("itertools").groupby(
            sorted(fps.collect(), key=lambda r: r.k), key=lambda r: r.k
        )
    }
    # hard guarantee: the 40-word shared span forces >= 1 shared fingerprint
    assert by_doc["host"] & by_doc["quote"]

    pairs = {
        (r.key_a, r.key_b): r
        for r in winnow_overlap(
            df, shingle_k=K, window=W, containment_threshold=0.5
        ).collect()
    }
    assert ("host", "quote") in pairs
    r = pairs[("host", "quote")]
    # quote is wholly contained in host: nearly all of its fingerprints are
    # shared (boundary windows may differ) — containment_b must be high
    # while host's own containment stays low (host is 8x longer)
    assert r.containment_b > 0.7
    assert r.containment_a < 0.5
    assert all("noise" not in a and "noise" not in b for a, b in pairs)


def test_hot_fingerprint_cap_bounds_pairs(spark):
    # 10 identical docs share every fingerprint; cap=3 keeps only the first
    # 3 keys per fingerprint -> pairs only within {c0,c1,c2}
    text = " ".join(f"z{i % 17}" for i in range(60))
    docs = {f"c{i}": text for i in range(10)}
    out = winnow_overlap(
        _docs_df(spark, docs), shingle_k=K, window=W, bucket_cap=3
    ).collect()
    keys = {k for r in out for k in (r.key_a, r.key_b)}
    assert keys == {"c0", "c1", "c2"}
    assert len(out) == 3  # C(3,2)


def test_no_cartesian_in_plan(spark):
    df = _docs_df(spark, {"a": "one two three four five six seven eight nine ten"})
    plan = winnow_overlap(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_window_validation(spark):
    df = _docs_df(spark, {"a": "x"})
    with pytest.raises(ValueError):
        winnow_fingerprints(df, window=0)


def test_containment_dedup_drops_contained_side(spark):
    from final_ocr_spark.operators.dedup import containment_dedup

    rng = random.Random(13)
    container = _words(150, rng)
    contained = " ".join(container.split()[40:90])
    docs = {
        "big": container,
        "quote": contained,
        "other": _words(120, rng),
    }
    out = containment_dedup(
        _docs_df(spark, docs), containment_threshold=0.6
    ).collect()
    keys = sorted(r.doc_id for r in out)
    assert keys == ["big", "other"]

    # identical docs: mutual 1.0 containment -> exactly one (deterministic:
    # the larger key) is dropped
    twins = _docs_df(spark, {"t1": container, "t2": container})
    out2 = sorted(r.doc_id for r in containment_dedup(twins).collect())
    assert out2 == ["t1"]
