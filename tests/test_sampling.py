"""Deterministic sampling + stratified caps."""

import hashlib

from final_ocr_spark.operators.sampling import deterministic_sample, stratified_cap


def _expected_keep(key, rate, salt=""):
    h = hashlib.md5((salt + str(key)).encode()).hexdigest()[:4]
    return int(h, 16) < round(rate * 65536)


def test_deterministic_sample_matches_reference_hash(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], ["k"])
    got = sorted(r["k"] for r in deterministic_sample(df, "k", 0.25).collect())
    want = sorted(i for i in range(500) if _expected_keep(i, 0.25))
    assert got == want
    # roughly the requested rate
    assert 0.15 < len(got) / 500 < 0.35


def test_deterministic_sample_stable_and_salted(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], ["k"])
    a = set(r["k"] for r in deterministic_sample(df, "k", 0.3, salt="a").collect())
    a2 = set(r["k"] for r in
             deterministic_sample(df.repartition(7), "k", 0.3, salt="a").collect())
    b = set(r["k"] for r in deterministic_sample(df, "k", 0.3, salt="b").collect())
    assert a == a2          # partitioning-independent
    assert a != b           # different salt → different sample
    assert deterministic_sample(df, "k", 1.0).count() == 300
    assert deterministic_sample(df, "k", 0.0).count() == 0


def test_stratified_cap_exact_and_salted_agree(spark):
    rows = [(f"g{i % 3}", i) for i in range(100)]
    df = spark.createDataFrame(rows, ["g", "k"])
    naive = stratified_cap(df, "g", ["k"], 5)
    salted = stratified_cap(df, "g", ["k"], 5, salt_buckets=8)
    want = {("g0", (0, 3, 6, 9, 12)), ("g1", (1, 4, 7, 10, 13)),
            ("g2", (2, 5, 8, 11, 14))}

    def as_set(d):
        out = {}
        for r in d.collect():
            out.setdefault(r["g"], []).append(r["k"])
        return {(g, tuple(sorted(ks))) for g, ks in out.items()}

    assert as_set(naive) == want
    assert as_set(salted) == want
