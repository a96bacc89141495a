"""Gopher repetition signals + C4 line cleaning — hand-computed goldens."""

from pyspark.sql import functions as F

from final_ocr_spark.operators.repetition import (
    c4_features,
    gopher_repetition_keep,
    repetition_features,
    run_stats,
    word_ngrams,
    words_of,
)


def _one(spark, text, cols):
    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(*[c.alias(k) for k, c in cols.items()]).collect()[0].asDict()


def test_run_stats_basic(spark):
    df = spark.createDataFrame([(["b", "a", "b", "c", "b", "a"],)], ["arr"])
    r = df.select(run_stats(F.col("arr")).alias("s")).collect()[0]["s"].asDict()
    # sorted: a a b b b c → dup: a(2×1)+b(3×1)=5 chars; best run b:3 → 3 chars
    assert r == {"dup_chars": 5, "best_run": 3, "best_chars": 3}


def test_run_stats_empty_and_singleton(spark):
    df = spark.createDataFrame([([],), (["xyz"],)], "arr: array<string>")
    rows = [r["s"].asDict() for r in df.select(run_stats(F.col("arr")).alias("s")).collect()]
    assert rows[0] == {"dup_chars": 0, "best_run": 0, "best_chars": 0}
    assert rows[1] == {"dup_chars": 0, "best_run": 1, "best_chars": 3}


def test_run_stats_tie_breaks_lexicographically_smallest(spark):
    # 'aa' and 'zz' both occur twice; best must be the smallest gram (aa)
    df = spark.createDataFrame([(["zz", "aa", "zz", "aa", "mm"],)], ["arr"])
    r = df.select(run_stats(F.col("arr")).alias("s")).collect()[0]["s"].asDict()
    assert r["best_run"] == 2 and r["best_chars"] == 4


def test_word_ngrams(spark):
    df = spark.createDataFrame([("one two three four",), ("a b",), ("solo",)], ["t"])
    out = df.select(word_ngrams(words_of(F.col("t")), 3).alias("g")).collect()
    assert out[0]["g"] == ["one two three", "two three four"]
    assert out[1]["g"] == []
    assert out[2]["g"] == []


def test_repetition_features_lines_and_paras(spark):
    text = "hello world.\nhello world.\n\n  hello   world.  \npad line here"
    f = _one(spark, text, repetition_features(F.col("text")))
    # lines: ['hello world.', 'hello world.', 'hello   world.', 'pad line here']
    assert f["n_lines"] == 4
    assert f["n_distinct_lines"] == 3
    assert f["dup_line_chars"] == 24  # 'hello world.' ×2 ×12 chars
    assert f["line_chars"] == 12 + 12 + 14 + 13
    # paragraphs (ws-collapsed): ['hello world. hello world.',
    #                             'hello world. pad line here']
    assert f["n_paras"] == 2
    assert f["n_distinct_paras"] == 2
    assert f["dup_para_chars"] == 0


def test_repetition_features_ngram_counts(spark):
    text = "x y x y x y"  # 2-grams: 'x y'×3, 'y x'×2
    f = _one(spark, text, repetition_features(F.col("text"), top_ns=(2,), dup_ns=(2,)))
    assert f["top2gram_chars"] == 9  # 'x y' 3 occurrences × 3 chars
    assert f["dup2gram_chars"] == 9 + 6  # both grams duplicated


def test_gopher_keep_flags(spark):
    clean = " ".join(f"w{i}" for i in range(100))
    spam = "buy now " * 50
    df = spark.createDataFrame([(1, clean), (2, spam)], ["i", "text"])
    got = {r["i"]: r["k"] for r in
           df.select("i", gopher_repetition_keep(F.col("text")).alias("k")).collect()}
    assert got == {1: True, 2: False}


def test_c4_features(spark):
    text = ("This is a good long sentence.\n"
            "too short.\n"
            "no terminal punctuation here at all\n"
            "Please enable javascript to continue viewing.\n"
            "Another proper sentence with enough words!\n")
    f = _one(spark, text, c4_features(F.col("text")))
    assert f["n_lines"] == 5
    assert f["n_kept"] == 2
    assert f["clean_text"] == ("This is a good long sentence.\n"
                               "Another proper sentence with enough words!")
    assert not f["has_lorem"] and not f["has_curly"]
    assert f["doc_keep"] is False  # only 2 kept lines < 3


def test_c4_doc_flags(spark):
    ok = "One good sentence right here.\n" * 3 + "Lorem ipsum dolor sit amet."
    f = _one(spark, ok, c4_features(F.col("text")))
    assert f["has_lorem"] and f["doc_keep"] is False
    f2 = _one(spark, "Good sentence number one here.\n" * 4, c4_features(F.col("text")))
    assert f2["doc_keep"] is True
