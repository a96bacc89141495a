"""Bloom-filter membership operator."""

from pyspark.sql import functions as F

from final_ocr_spark.operators.bloom import (
    bloom_params,
    build_bloom,
    merge_blooms,
    split_new_vs_maybe_seen,
    with_bloom_membership,
)


def test_bloom_params_standard_sizing():
    m, k = bloom_params(1000, 0.01)
    # textbook: ~9.59 bits/item, k ~ 7 at 1% fpp
    assert 9000 <= m <= 10300
    assert k == 7


def test_no_false_negatives_and_bounded_fpp(spark):
    n = 2000
    seen = spark.createDataFrame(
        [(f"https://h{i}.example.com/p{i}",) for i in range(n)], ["url"])
    bloom = build_bloom(seen, "url", n_items=n, fpp=0.01)

    # every inserted key must test positive — no false negatives, ever
    tagged = with_bloom_membership(seen, bloom, "url")
    assert tagged.filter(~F.col("maybe_seen")).count() == 0

    # a disjoint probe set false-positives at ~fpp (allow generous slack)
    probe = spark.createDataFrame(
        [(f"https://new{i}.example.org/q{i}",) for i in range(n)], ["url"])
    fp = with_bloom_membership(probe, bloom, "url") \
        .filter(F.col("maybe_seen")).count()
    assert fp / n < 0.05, fp


def test_split_new_vs_maybe_seen(spark):
    hist = spark.createDataFrame([(f"u{i}",) for i in range(500)], ["url"])
    bloom = build_bloom(hist, "url", n_items=500, fpp=0.01)
    batch = spark.createDataFrame(
        [(f"u{i}",) for i in range(450, 550)], ["url"])  # 50 old + 50 new
    new, maybe = split_new_vs_maybe_seen(batch, bloom, "url")
    new_urls = {r["url"] for r in new.collect()}
    maybe_urls = {r["url"] for r in maybe.collect()}
    assert new_urls | maybe_urls == {f"u{i}" for i in range(450, 550)}
    assert not (new_urls & maybe_urls)
    # correctness-critical direction: nothing historical may land in "new"
    assert all(int(u[1:]) >= 500 for u in new_urls)
    # and the exact-join side stays small: all 50 true overlaps + few fps
    assert 50 <= len(maybe_urls) <= 60


def test_merge_blooms_equals_union_build(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], ["url"])
    b = spark.createDataFrame([(f"b{i}",) for i in range(300)], ["url"])
    m, k = bloom_params(600, 0.01)
    merged = merge_blooms(
        build_bloom(a, "url", m_bits=m, k_hashes=k),
        build_bloom(b, "url", m_bits=m, k_hashes=k),
    )
    direct = build_bloom(a.unionByName(b), "url", m_bits=m, k_hashes=k)
    got = {(r["word_idx"], r["bits"]) for r in merged.collect()}
    want = {(r["word_idx"], r["bits"]) for r in direct.collect()}
    assert got == want


def test_membership_plan_is_broadcast(spark):
    """The filter side must broadcast — a shuffle join against a few-KB
    bitmap table would be the wrong plan at any scale."""
    df = spark.createDataFrame([("u1",), ("u2",)], ["url"])
    bloom = build_bloom(df, "url", n_items=10, fpp=0.01)
    out = with_bloom_membership(df, bloom, "url")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_empty_history_bootstrap(spark):
    """A filter over ZERO history must answer definitely-new for everything
    (incremental-ingest bootstrap), not crash on missing metadata."""
    empty = spark.createDataFrame([], "url string")
    bloom = build_bloom(empty, "url", n_items=100, fpp=0.01)
    batch = spark.createDataFrame([("u1",), ("u2",)], ["url"])
    new, maybe = split_new_vs_maybe_seen(batch, bloom, "url")
    assert new.count() == 2 and maybe.count() == 0


def test_merge_mismatched_params_raises(spark):
    a = spark.createDataFrame([("x",)], ["url"])
    import pytest as _pytest
    with _pytest.raises(ValueError, match="different"):
        merge_blooms(
            build_bloom(a, "url", n_items=100, fpp=0.01),
            build_bloom(a, "url", n_items=100000, fpp=0.01),
        )


def test_partial_sizing_rejected(spark):
    import pytest as _pytest
    df = spark.createDataFrame([("x",)], ["url"])
    with _pytest.raises(ValueError, match="BOTH"):
        build_bloom(df, "url", n_items=10, k_hashes=3)
