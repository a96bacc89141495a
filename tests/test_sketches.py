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


def test_heavy_hitters_exact_topk_on_zipf(spark):
    """MG candidates + exact recount must equal the brute-force exact top-k
    on a skewed (Zipf-ish) token stream, including exact counts."""
    import random

    from final_ocr_spark.operators.sketches import heavy_hitters

    rng = random.Random(5)
    toks = []
    for i in range(60):
        toks += [f"hot{i}"] * (400 // (i + 1))       # Zipf head
    toks += [f"tail{j}" for j in range(4000)]          # singleton tail
    rng.shuffle(toks)
    df = spark.createDataFrame([(t,) for t in toks], ["term"]).repartition(8)

    got = [(r["term"], r["cnt"], r["rank"]) for r in
           heavy_hitters(df, "term", k=10, counters=500)
           .orderBy("rank").collect()]

    from collections import Counter
    exact = Counter(toks).most_common()
    exact.sort(key=lambda kv: (-kv[1], kv[0]))
    want = [(t, c, i + 1) for i, (t, c) in enumerate(exact[:10])]
    assert got == want


def test_heavy_hitters_mg_guarantee(spark):
    """Every token with count > n/counters must be returned when k is
    large enough — the MG superset guarantee across partition merges."""
    from final_ocr_spark.operators.sketches import heavy_hitters

    toks = ["alpha"] * 300 + ["beta"] * 200 + [f"noise{i}" for i in range(500)]
    df = spark.createDataFrame([(t,) for t in toks], ["term"]).repartition(16)
    n = len(toks)
    counters = 50  # threshold n/counters = 20 < 200,300
    got = {r["term"]: r["cnt"] for r in
           heavy_hitters(df, "term", k=5, counters=counters).collect()}
    assert got.get("alpha") == 300 and got.get("beta") == 200


def test_heavy_hitters_no_full_vocab_shuffle(spark):
    """The exact-count aggregation input must be candidate-pruned via a
    broadcast semi-join (never a full-vocab shuffle)."""
    from final_ocr_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame([("a",), ("b",)], ["term"])
    plan = (heavy_hitters(df, "term", k=1, counters=10)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
