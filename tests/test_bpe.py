"""BPE training/encoding — the Sennrich-paper example, an indexed-vs-naive
differential, encode round-trip properties, and the Spark surface."""

from hypothesis import given, settings
from hypothesis import strategies as st

from final_ocr_spark.operators.bpe import (
    _EOW,
    _merge_word,
    encode_word,
    learn_merges,
    pre_tokenize,
)


def test_sennrich_paper_example():
    # Sennrich et al. 2016 §3.2 toy dictionary: the famous first merges
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_merges(wc, 4, min_pair_count=1)
    # highest-frequency pair is ('e','s') from newest+widest (9), then
    # ('es','t') 9, then ('est','</w>') 9, then ('l','o') 7
    assert merges[:4] == [("e", "s"), ("es", "t"), ("est", _EOW), ("l", "o")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert encode_word("lowest", ranks) == ["lo", "w", "est</w>"]


def _naive_learn(wc, n, min_pair_count=2):
    # full-recount reference implementation (O(dict) per merge)
    words = {i: tuple(w) + (_EOW,) for i, (w, _) in enumerate(wc) if w}
    counts = {i: c for i, (w, c) in enumerate(wc) if w}
    merges = []
    for _ in range(n):
        pc = {}
        for i, sym in words.items():
            for p in zip(sym, sym[1:]):
                pc[p] = pc.get(p, 0) + counts[i]
        if not pc or max(pc.values()) < min_pair_count:
            break
        top = max(pc.values())
        best = min(p for p, c in pc.items() if c == top)
        merges.append(best)
        words = {i: _merge_word(s, best) for i, s in words.items()}
    return merges


@settings(max_examples=40, deadline=None)
@given(
    wc=st.lists(
        st.tuples(st.text(alphabet="abcde", min_size=1, max_size=6),
                  st.integers(1, 9)),
        min_size=1, max_size=12,
    ),
    n=st.integers(1, 15),
)
def test_indexed_matches_naive(wc, n):
    assert learn_merges(wc, n) == _naive_learn(wc, n)


@settings(max_examples=60, deadline=None)
@given(w=st.text(alphabet="abcdef", min_size=1, max_size=10))
def test_encode_roundtrip(w):
    # whatever the merges, joining the pieces and stripping the sentinel
    # reproduces the word exactly
    merges = learn_merges([(w, 3), ("abacus", 2), ("fed", 5)], 20,
                          min_pair_count=1)
    ranks = {p: i for i, p in enumerate(merges)}
    toks = encode_word(w, ranks)
    assert "".join(toks).replace(_EOW, "") == w
    assert toks[-1].endswith(_EOW)


def test_pretokenize_matches_column_rule(spark):
    import pyspark.sql.functions as F

    from final_ocr_spark.operators.bpe import _PRETOK_RE_SPARK, _SPLIT_RE_SPARK

    samples = [
        "Price: 1,234.56 USD!", "foo-bar baz_qux 42", "  ", "a.b,c",
        # non-ASCII: Java \w is ASCII-only without (?U) — these pin the flag
        "café olé", "naïve — résumé", "日本語のテキスト!", "Ωμέγα_σ",
        "عربى ١٢٣", "Straße über",
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["t"])
    spark_words = [
        [w for w in r["w"] if w]
        for r in df.select(
            F.split(F.trim(F.regexp_replace(
                "t", _PRETOK_RE_SPARK, r" $1 ")), _SPLIT_RE_SPARK).alias("w")
        ).collect()
    ]
    assert spark_words == [pre_tokenize(s) for s in samples]


def test_unicode_words_train_and_encode_consistently(spark):
    # the review-caught bug: training fragments must be the encoder's words
    from final_ocr_spark.operators.bpe import bpe_encode, train_bpe, word_frequencies

    corpus = spark.createDataFrame(
        [("café café café olé",), ("résumé café naïve",)], ["text"])
    wf = {r["word"]: r["count"] for r in word_frequencies(corpus, "text").collect()}
    assert wf["café"] == 4  # whole word, not 'caf' + 'é'
    merges = train_bpe(corpus, "text", n_merges=50, min_pair_count=2)
    toks = spark.createDataFrame([("café",)], ["text"]).select(
        bpe_encode("text", merges).alias("t")).first()["t"]
    assert toks == ["café" + _EOW]  # trained merges apply to the real word


def test_spark_train_and_count(spark):
    from final_ocr_spark.operators.bpe import (
        bpe_encode,
        bpe_token_count,
        train_bpe,
        word_frequencies,
    )

    corpus = spark.createDataFrame(
        [("the lowest lower low",), ("newest new newer the the",),
         (None,)],
        ["text"],
    )
    wf = {r["word"]: r["count"]
          for r in word_frequencies(corpus, "text").collect()}
    assert wf["the"] == 3 and wf["low"] == 1

    merges = train_bpe(corpus, "text", n_merges=30, min_pair_count=2)
    assert merges.columns == ["rank", "left", "right"]
    assert merges.count() > 0

    out = corpus.select(
        bpe_encode("text", merges).alias("toks"),
        bpe_token_count("text", merges).alias("n"),
    ).collect()
    for r in out:
        if r["toks"] is None:
            assert r["n"] is None
            continue
        assert r["n"] == len(r["toks"])
        # every word's last piece carries the sentinel; round trip exact
        text = "".join(r["toks"]).replace(_EOW, " ").strip()
        assert all(t for t in r["toks"])
        assert text  # non-empty rows encode to non-empty pieces

    # 'the' occurs 3x — trained merges should compress it to one token
    one = spark.createDataFrame([("the",)], ["text"]).select(
        bpe_encode("text", merges).alias("t")).first()["t"]
    assert one == ["the" + _EOW]


def test_word_frequencies_cap_deterministic(spark):
    corpus = spark.createDataFrame(
        [("b b c c a a",)], ["text"]
    )
    top2 = [r["word"] for r in
            word_frequencies_cap_helper(corpus).collect()]
    assert top2 == ["a", "b"]  # equal counts → word asc


def word_frequencies_cap_helper(corpus):
    from final_ocr_spark.operators.bpe import word_frequencies

    return word_frequencies(corpus, "text", max_words=2)


def test_bpe_decode_round_trip(spark):
    """decode(encode(text)) == the canonical pre-tokenized view (lowercased,
    digit/punct runs spaced) — for ASCII, digits/punct, and non-ASCII; the
    ids variant round-trips through the vocab and drops specials."""
    from pyspark.sql import functions as F

    from final_ocr_spark.operators.bpe import (
        bpe_decode, bpe_decode_ids, bpe_encode, bpe_encode_ids, bpe_vocab,
        pre_tokenize, train_bpe,
    )

    texts = [
        "The river bank, and the DATA bank merge here 42 times!",
        "café naïve — 3.14 żółć",
        "plain words only",
    ]
    corpus = spark.createDataFrame([(t,) for t in texts], ["text"])
    merges = train_bpe(corpus, n_merges=40)
    got = corpus.select(
        "text", bpe_decode(bpe_encode("text", merges)).alias("rt")
    ).collect()
    for r in got:
        assert r["rt"] == " ".join(pre_tokenize(r["text"].lower()))

    vocab = bpe_vocab(corpus, merges, specials=("<pad>", "<eos>", "<unk>"))
    ids_rt = corpus.select(
        "text",
        bpe_decode_ids(
            F.concat(  # planted specials must vanish from the decode
                bpe_encode_ids("text", merges, vocab, unk_id=2),
                F.array(F.lit(1), F.lit(0)),
            ),
            vocab,
        ).alias("rt"),
    ).collect()
    for r in ids_rt:
        assert r["rt"] == " ".join(pre_tokenize(r["text"].lower()))


def test_decode_ids_keeps_merged_punctuation_pieces(spark):
    """Special-token dropping is exact-match on the named specials, never a
    shape heuristic: a corpus where '<' is a frequent standalone word
    produces merged pieces like '<</w>' which must SURVIVE decode
    (review-caught: startswith('<')/endswith('>') deleted them)."""
    from pyspark.sql import functions as F

    from final_ocr_spark.operators.bpe import (
        bpe_decode_ids, bpe_encode_ids, bpe_vocab, pre_tokenize, train_bpe,
    )

    texts = [f"value a < b and c < d in row {i}" for i in range(10)]
    corpus = spark.createDataFrame([(t,) for t in texts], ["text"])
    merges = train_bpe(corpus, n_merges=30)
    vocab = bpe_vocab(corpus, merges, specials=("<pad>", "<eos>", "<unk>"))
    got = corpus.select(
        "text",
        bpe_decode_ids(
            F.concat(
                bpe_encode_ids("text", merges, vocab, unk_id=2),
                F.array(F.lit(1)),  # planted <eos> still vanishes
            ),
            vocab,
        ).alias("rt"),
    ).collect()
    for r in got:
        assert r["rt"] == " ".join(pre_tokenize(r["text"].lower()))
        assert "<" in r["rt"]
