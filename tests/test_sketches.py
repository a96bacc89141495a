"""Count-min sketch: one-sided error + exactness on sparse streams."""

import hashlib
from collections import Counter

from pyspark.sql import functions as F

from final_ocr_spark.operators.sketches import cms_build, cms_lookup


def test_cms_estimates_upper_bound_and_python_parity(spark):
    tokens = (["alpha"] * 50 + ["beta"] * 20 + ["gamma"] * 5 +
              [f"noise{i}" for i in range(300)])
    df = spark.createDataFrame([(t,) for t in tokens], ["tok"])
    cms = cms_build(df, "tok", depth=4)
    terms = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",), ("absent",)], ["term"])
    got = {r["term"]: r["est_count"] for r in
           cms_lookup(cms, terms, "term", depth=4).collect()}

    # pure-python replica of the exact same sketch
    table = [Counter() for _ in range(4)]
    for t in tokens:
        for d in range(4):
            b = hashlib.md5(f"cms:{d}{t}".encode()).hexdigest()[:2]
            table[d][b] += 1
    want = {}
    for term in ["alpha", "beta", "gamma", "absent"]:
        want[term] = min(
            table[d][hashlib.md5(f"cms:{d}{term}".encode()).hexdigest()[:2]]
            for d in range(4))
    assert got == want
    truth = Counter(tokens)
    for term in got:
        assert got[term] >= truth[term]  # CMS never underestimates


def test_cms_table_is_bounded(spark):
    df = spark.createDataFrame([(f"t{i}",) for i in range(5000)], ["tok"])
    cms = cms_build(df, "tok", depth=4)
    assert cms.count() <= 4 * 256
