"""Benchmark decontamination."""

from final_ocr_spark.operators.decontaminate import contaminated_keys, decontaminate

TRAIN = [
    (1, "alpha bravo charlie delta echo foxtrot golf hotel india juliett "
        "kilo lima mike november oscar papa quebec romeo sierra tango"),
    (2, "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"),
    (3, "totally unrelated words about gardens and rivers and mountains and "
        "forests and valleys and meadows and lakes and streams and hills plus "
        "some more filler words to get enough length here overall today"),
]

# benchmark contains a verbatim 14-word span of TRAIN doc 1 (≥ one 13-gram),
# with different casing/punctuation — tokenization must still catch it
BENCH = [
    (101, "Bravo, Charlie DELTA echo foxtrot golf hotel india juliett kilo "
          "lima mike november oscar!"),
]


def test_contaminated_keys_and_decontaminate(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["doc_id", "text"])
    hits = {r["doc_id"]: r["n_hits"] for r in
            contaminated_keys(train, bench, n=13).collect()}
    assert set(hits) == {1}
    assert hits[1] == 2  # 14 shared words → two 13-grams
    clean = sorted(r["doc_id"] for r in decontaminate(train, bench, n=13).collect())
    assert clean == [2, 3]


def test_decontaminate_no_overlap_is_identity(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(9, "entirely fresh benchmark sentence with its own distinct words "
             "spanning enough tokens to form several grams of length thirteen")],
        ["doc_id", "text"])
    assert decontaminate(train, bench, n=13).count() == 3


def test_contamination_report_per_benchmark_doc(spark):
    """Every benchmark doc gets a row: 101 overlaps train doc 1 (2 of its
    grams hit, 1 corpus doc), a clean doc shows zeros, and a gramless
    (< n words) doc shows n_grams=0 rather than vanishing."""
    from final_ocr_spark.operators.decontaminate import contamination_report

    train = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    bench = spark.createDataFrame(
        BENCH + [
            (102, "entirely fresh benchmark sentence with its own distinct "
                  "words spanning enough tokens to form several grams of "
                  "length thirteen"),
            (103, "too short to gram"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in
            contamination_report(train, bench, n=13).collect()}
    assert set(rows) == {101, 102, 103}
    r101 = rows[101]
    assert r101["n_grams"] == 2 and r101["n_grams_hit"] == 2
    assert r101["hit_ratio"] == 1.0 and r101["n_corpus_docs"] == 1
    r102 = rows[102]
    assert r102["n_grams"] > 0 and r102["n_grams_hit"] == 0
    assert r102["hit_ratio"] == 0.0 and r102["n_corpus_docs"] == 0
    r103 = rows[103]
    assert (r103["n_grams"], r103["n_grams_hit"], r103["n_corpus_docs"]) \
        == (0, 0, 0)
