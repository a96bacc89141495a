"""Hashed-projection document embedder (operators/embed.py): differential
against a pure-Python twin that shares only the hash primitive, plus the
text → embed → semantic_dedup end-to-end pipeline with the key-only-explode
plan shape preserved."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from final_ocr_spark.operators.embed import embed_hashed_ngrams

_TEXTS = [
    ("d1", "The harbor lights flickered, and the harbor lights dimmed!"),
    ("d2", "café au lait — übergroße Straße 'quotes' and   spaces"),
    ("d3", "one two three four five six seven eight nine ten"),
    ("d4", ""),              # gramless → NULL embedding
    ("d5", "!!! ... ???"),   # punctuation-only → gramless too
    ("d6", "word"),          # single unigram
]


def _twin_embeddings(spark, df, dim, word_ngrams):
    """Pure-Python projection twin: gram rows + both hashes come FROM Spark
    (xxhash64 is Spark-only — pitfalls ledger), everything the operator
    adds on top (pmod slotting, sign, occurrence accumulation, dense
    assembly, L2 normalization, null-for-gramless) is recomputed in
    Python floats."""
    from final_ocr_spark.operators.classify import _gram_rows

    rows = (
        _gram_rows(df, "doc_id", "text", word_ngrams)
        .select(
            "k",
            F.xxhash64("g").alias("h_idx"),
            F.xxhash64(F.lit("±"), F.col("g")).alias("h_sign"),
        )
        .collect()
    )
    acc: dict[str, list[float]] = {}
    for r in rows:
        v = acc.setdefault(r["k"], [0.0] * dim)
        v[r["h_idx"] % dim] += -1.0 if r["h_sign"] < 0 else 1.0
    out = {}
    for k, v in acc.items():
        n = math.sqrt(sum(x * x for x in v))
        out[k] = [x / n for x in v] if n > 0 else None
    return out


@pytest.mark.parametrize("dim,word_ngrams", [(32, 2), (64, 1)])
def test_matches_python_twin(spark, dim, word_ngrams):
    df = spark.createDataFrame(_TEXTS, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["embedding"]
        for r in embed_hashed_ngrams(
            df, key="doc_id", dim=dim, word_ngrams=word_ngrams
        ).collect()
    }
    want = _twin_embeddings(spark, df, dim, word_ngrams)
    assert set(got) == {t[0] for t in _TEXTS}
    assert got["d4"] is None and got["d5"] is None  # gramless → NULL, loud
    for k, w in want.items():
        assert got[k] is not None and len(got[k]) == dim
        for a, b in zip(got[k], w):
            assert a == pytest.approx(b, abs=1e-6)  # float32 cast slack
        assert sum(x * x for x in got[k]) == pytest.approx(1.0, abs=1e-5)


def test_deterministic_and_occurrence_sensitive(spark):
    df = spark.createDataFrame(
        [("a", "alpha beta gamma"), ("b", "alpha beta gamma"),
         ("c", "alpha beta gamma alpha beta gamma")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["embedding"]
        for r in embed_hashed_ngrams(df, key="doc_id", dim=32).collect()
    }
    assert got["a"] == got["b"]  # same text → bit-identical vector
    # doubling every gram count rescales pre-norm; post-norm the DIRECTION
    # differs only through the extra boundary bigram — vectors stay close
    # but c is a distinct document (bigram 'gamma alpha' exists only in c)
    assert got["a"] != got["c"]
    cos = sum(x * y for x, y in zip(got["a"], got["c"]))
    assert cos > 0.9


def test_zero_norm_embeds_null_not_ansi_error(spark):
    """Sign-cancellation corner (review-caught): 'w54' and 'w83' hash to the
    same slot at dim=64 with opposite signs, so at word_ngrams=1 the doc
    'w54 w83' projects to the all-zero vector. The operator must emit a
    NULL embedding — before the guard, the x/norm transform raised
    DIVIDE_BY_ZERO under ANSI mode (Spark 4 default) and aborted the job."""
    df = spark.createDataFrame(
        [("zero", "w54 w83"), ("ok", "alpha beta gamma")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["embedding"]
        for r in embed_hashed_ngrams(
            df, key="doc_id", dim=64, word_ngrams=1
        ).collect()
    }
    assert got["zero"] is None
    assert got["ok"] is not None
    assert sum(x * x for x in got["ok"]) == pytest.approx(1.0, abs=1e-5)


def test_guards(spark):
    df = spark.createDataFrame([("a", "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="dim"):
        embed_hashed_ngrams(df, key="doc_id", dim=4)
    with pytest.raises(ValueError, match="word_ngrams"):
        embed_hashed_ngrams(df, key="doc_id", word_ngrams=3)


def test_text_to_semantic_dedup_end_to_end(spark):
    """The r3 gap closed: semantic dedup runs TEXT-in with no caller
    vectors — embed → semantic_dedup collapses planted paraphrase groups,
    and the blocking explode still carries keys only (never the vectors)."""
    from final_ocr_spark.operators.similarity import embedding_near_dups, semantic_dedup

    base = (
        "the committee approved the new harbor dredging budget after a "
        "long public session where residents raised concerns about noise "
        "schedules and the seasonal closure of the east boat ramp"
    )
    other = (
        "quarterly snowfall totals across the northern observation ridge "
        "exceeded the historical median while wind crusting limited the "
        "usable depth reported by the avalanche survey teams"
    )
    docs = [
        ("g1a", base),
        ("g1b", base.replace("noise", "noise levels")),   # near-paraphrase
        ("g1c", base + " the vote passed"),               # near-paraphrase
        ("g2a", other),
        ("g2b", other.replace("median", "median value")),
        ("solo", "entirely unrelated short note about a bicycle repair"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    emb = embed_hashed_ngrams(df, key="doc_id", dim=128).filter(
        F.col("embedding").isNotNull()
    )
    kept = {
        r["doc_id"]
        for r in semantic_dedup(
            emb, threshold=0.8, id_col="doc_id", bits=4
        ).collect()
    }
    assert kept == {"g1a", "g2a", "solo"}  # min-key survivor per group

    # plan shape: the LSH blocking explode must not carry the embedding
    pairs = embedding_near_dups(
        emb, threshold=0.8, id_col="doc_id", bits=4
    )
    plan = pairs._jdf.queryExecution().toString()
    gen = [
        l for l in plan.splitlines()
        if "Generate explode" in l and "Exchange" not in l
    ]
    assert gen, "explode node missing from plan"
    assert all("embedding#" not in l for l in gen), gen


def test_zero_vector_null_without_normalize(spark):
    """The zero-vector → NULL contract is unconditional: with
    normalize=False the sign-cancelled doc must ALSO embed as NULL (a raw
    zero vector has no direction; downstream cosine divides by its norm —
    review-caught: the NULL-ing used to live only in the normalize
    branch)."""
    df = spark.createDataFrame(
        [("zero", "w54 w83"), ("ok", "alpha beta gamma")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["embedding"]
        for r in embed_hashed_ngrams(
            df, key="doc_id", dim=64, word_ngrams=1, normalize=False
        ).collect()
    }
    assert got["zero"] is None
    assert got["ok"] is not None and any(x != 0 for x in got["ok"])
