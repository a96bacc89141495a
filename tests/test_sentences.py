"""Sentence segmentation — goldens, Python/Column differential, no-loss
fuzz, and the exploded table."""

from hypothesis import given, settings
from hypothesis import strategies as st

from final_ocr_spark.operators.sentences import (
    explode_sentences,
    sentence_count,
    sentences,
    split_sentences,
)

GOLDENS = [
    ("Hello world. How are you? Fine!",
     ["Hello world.", "How are you?", "Fine!"]),
    ("Dr. Smith met Mr. Jones at 3.14 p.m. yesterday. They talked.",
     ["Dr. Smith met Mr. Jones at 3.14 p.m. yesterday.", "They talked."]),
    ("J. K. Rowling wrote it. U.S.A. is big.",
     ["J. K. Rowling wrote it.", "U.S.A. is big."]),
    ('He said "stop." Then left.',
     ['He said "stop."', "Then left."]),
    ("Version 1.2.3 shipped. See Fig. 4 for details.",
     ["Version 1.2.3 shipped.", "See Fig. 4 for details."]),
    ("e.g. apples, i.e. fruit. Next sentence.",
     ["e.g. apples, i.e. fruit.", "Next sentence."]),
    ("No punctuation here", ["No punctuation here"]),
    ("", []),
]


def test_goldens_python():
    for text, want in GOLDENS:
        assert split_sentences(text) == want, text
    assert split_sentences(None) is None


def test_column_matches_python(spark):
    texts = [t for t, _ in GOLDENS] + [
        "Mixed! Content? With... ellipsis. And trailing  ",
        "Multi\nline. Breaks\n\nhere. End.",
        # NBSP / ideographic space between sentences: Java \s is ASCII-only
        # without (?U) — these pin the Unicode flag (review-caught)
        "Hi. Next sentence.",
        "First one.　Second one.",
        "Tab.\tthen more.   ",
        "   ",  # whitespace-only → empty both sides
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["id", "t"])
    got = {r["id"]: r["s"]
           for r in df.select("id", sentences("t").alias("s")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == split_sentences(t), t


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8",
                                      exclude_characters="\x01"),
               max_size=120))
def test_no_loss_invariant(text):
    pieces = split_sentences(text)
    # concatenation reproduces the input minus the inter-sentence
    # whitespace the split consumed and whitespace-only pieces (whitespace
    # in the Java-(?U) sense — the engine-shared contract)
    import re

    from final_ocr_spark.operators.sentences import _JAVA_WS, _SPLIT_RE_PY
    joined = "".join(pieces)
    want = "".join(
        p for p in re.split(_SPLIT_RE_PY, text)
        if not re.fullmatch(_JAVA_WS + "*", p)
    ).replace("\x01", "")
    assert joined == want


def test_explode_and_count(spark):
    docs = spark.createDataFrame(
        [("u1", "One. Two! Three?"), ("u2", "Only one"), ("u3", None)],
        ["url", "text"],
    )
    rows = explode_sentences(docs).collect()
    got = {}
    for r in rows:
        got.setdefault(r["url"], []).append((r["sent_idx"], r["sentence"]))
    assert got["u1"] == [(0, "One."), (1, "Two!"), (2, "Three?")]
    assert got["u2"] == [(0, "Only one")]
    assert "u3" not in got  # null text explodes to nothing

    counts = {r["url"]: r["n"] for r in docs.select(
        "url", sentence_count("text").alias("n")).collect()}
    assert counts == {"u1": 3, "u2": 1, "u3": None}


def test_plan_no_python(spark):
    df = spark.createDataFrame([("x.",)], ["t"])
    plan = df.select(sentences("t"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan
