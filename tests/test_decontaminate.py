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
