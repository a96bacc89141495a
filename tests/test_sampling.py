"""Deterministic sampling + stratified caps."""

import hashlib

from pyspark.sql import functions as F

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


def _mix_corpus(spark, sizes={"en": 4000, "de": 1000, "fr": 500}):
    rows = [
        (f"{lang}-{i}", lang, 10 + (i % 7))
        for lang, n in sizes.items()
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id string, lang string, tokens int")


def test_mixture_sample_hits_target_shares(spark):
    from final_ocr_spark.operators.sampling import mixture_sample

    # auto budget: fr is binding at equal thirds (500/(1/3)=1500) — en/de
    # down-sample to ~500 each, fr keeps everything
    out = mixture_sample(
        _mix_corpus(spark), "lang", {"en": 1, "de": 1, "fr": 1}, key="doc_id"
    )
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts["fr"] == 500  # binding group keeps all
    for lang in ("en", "de"):  # binomial tolerance around 500
        assert abs(counts[lang] - 500) < 90, counts


def test_mixture_sample_explicit_budget_token_weighted_and_zero_weight(spark):
    from final_ocr_spark.operators.sampling import mixture_sample

    df = _mix_corpus(spark)
    out = mixture_sample(
        df, "lang", {"en": 3, "de": 1}, key="doc_id",
        budget=20000, size_col="tokens",
    )
    agg = {
        r["lang"]: r["t"]
        for r in out.groupBy("lang").agg(F.sum("tokens").alias("t")).collect()
    }
    assert "fr" not in agg  # zero-weight group dropped
    # en target 15000 tokens, de target 5000 (of ~13000 available each)
    assert abs(agg["en"] - 15000) < 1600, agg
    assert abs(agg["de"] - 5000) < 900, agg


def test_mixture_sample_deterministic_and_oracle(spark):
    import duckdb
    from final_ocr_spark.operators.sampling import mixture_sample

    df = _mix_corpus(spark, {"en": 600, "de": 300})
    out = mixture_sample(df, "lang", {"en": 1, "de": 1}, key="doc_id",
                         salt="s1")
    ids = sorted(r["doc_id"] for r in out.collect())
    # stable under repartitioning
    ids2 = sorted(
        r["doc_id"]
        for r in mixture_sample(
            df.repartition(13), "lang", {"en": 1, "de": 1},
            key="doc_id", salt="s1",
        ).collect()
    )
    assert ids == ids2
    # byte-identical oracle: same md5 rule in DuckDB. Budget = min over
    # groups of actual/share = 600 (de binding: 300/(1/2)); en rate 0.5.
    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    oracle = sorted(
        r[0]
        for r in con.execute(
            """
            WITH stats AS (
              SELECT lang, count(*)::DOUBLE AS actual, 0.5 AS share
              FROM docs GROUP BY lang
            ),
            b AS (SELECT min(actual / share) AS budget FROM stats),
            rates AS (
              SELECT lang,
                     CAST(round(least(1.0, share * budget / actual) * 65536)
                          AS INT) AS thr
              FROM stats, b
            )
            SELECT doc_id FROM docs JOIN rates USING (lang)
            WHERE thr >= 65536
               OR substring(md5('s1' || doc_id), 1, 4) < printf('%04x', thr)
            """
        ).fetchall()
    )
    assert ids == oracle


def test_mixture_sample_zero_size_group_dropped_and_ansi_safe(spark):
    """A group whose size_col sums to 0 must not poison the auto budget
    (min over actual/share would hit 0 → everything else dropped), must not
    ride along for free under an explicit budget, and must not divide by
    zero under ANSI mode (review finding, round 3)."""
    from final_ocr_spark.operators.sampling import mixture_sample

    rows = [(f"en{i}", "en", 10) for i in range(100)]
    rows += [(f"zz{i}", "zz", 0) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id string, lang string, tokens int")

    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        auto = mixture_sample(
            df, "lang", {"en": 1, "zz": 1}, key="doc_id", size_col="tokens"
        )
        langs = {r["lang"] for r in auto.select("lang").distinct().collect()}
        assert langs == {"en"}  # zz dropped, en NOT collapsed to nothing
        assert auto.count() == 100  # en is binding → keeps everything

        capped = mixture_sample(
            df, "lang", {"en": 1, "zz": 1}, key="doc_id",
            size_col="tokens", budget=500,
        )
        assert capped.filter(F.col("lang") == "zz").count() == 0
        assert 0 < capped.filter(F.col("lang") == "en").count() <= 100
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_deterministic_split_matches_python_twin_and_is_exhaustive(spark):
    """deterministic_split == the hashlib twin per key; splits are disjoint
    and exhaustive; shares approach the fractions; the plan is scan-local
    (no Exchange)."""
    import hashlib

    from final_ocr_spark.operators.sampling import deterministic_split

    keys = [f"https://x{i}.example/{i}" for i in range(4000)]
    df = spark.createDataFrame([(k,) for k in keys], ["url"]).repartition(7)
    fracs = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = deterministic_split(df, "url", fracs, salt="s1")

    # twin: cumulative bounds in sorted-name order over the 16-bit bucket
    names = sorted(fracs)
    bounds, acc = [], 0.0
    for n in names:
        acc += fracs[n]
        bounds.append((n, int(round(acc * (1 << 16)))))
    bounds[-1] = (bounds[-1][0], 1 << 16)

    def twin(k):
        b = int(hashlib.md5(("s1" + k).encode()).hexdigest()[:4], 16)
        for n, hi in bounds:
            if b < hi:
                return n
        raise AssertionError("unassigned")

    got = {r["url"]: r["split"] for r in out.collect()}
    assert len(got) == len(keys)                      # exhaustive
    assert got == {k: twin(k) for k in keys}          # engine-exact
    shares = {n: sum(1 for v in got.values() if v == n) / len(keys)
              for n in names}
    assert abs(shares["train"] - 0.8) < 0.03
    assert abs(shares["val"] - 0.1) < 0.02
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan

    import pytest

    with pytest.raises(ValueError, match="sum to 1"):
        deterministic_split(df, "url", {"a": 0.5, "b": 0.4})


def test_shuffle_order_deterministic_and_uniform(spark):
    """shuffle_order: same (key, salt) → same sort key across sessions and
    partitionings; different salts give a different order; ordering by it
    is a reproducible permutation."""
    from final_ocr_spark.operators.sampling import shuffle_order

    df = spark.createDataFrame(
        [(f"doc{i:04d}",) for i in range(500)], ["url"]
    )
    a = [r["url"] for r in
         df.orderBy(shuffle_order("url", "epoch1"), "url").collect()]
    b = [r["url"] for r in
         df.repartition(13)
           .orderBy(shuffle_order("url", "epoch1"), "url").collect()]
    c = [r["url"] for r in
         df.orderBy(shuffle_order("url", "epoch2"), "url").collect()]
    assert a == b                       # partitioning-independent
    assert sorted(a) == sorted(c)       # same rows...
    assert a != c                       # ...different epoch order
    assert a != sorted(a)               # actually shuffled


def test_deterministic_split_null_keys_get_null_split(spark):
    """Null keys must land in a NULL split, not silently pile into the
    lexicographically-last split name (review-caught)."""
    from final_ocr_spark.operators.sampling import deterministic_split

    df = spark.createDataFrame(
        [("k1",), ("k2",), (None,), (None,)], ["url"]
    )
    rows = deterministic_split(
        df, "url", {"train": 0.9, "val": 0.1}
    ).collect()
    by_key = {r["url"]: r["split"] for r in rows if r["url"] is not None}
    nulls = [r["split"] for r in rows if r["url"] is None]
    assert all(v in ("train", "val") for v in by_key.values())
    assert nulls == [None, None]


def test_temperature_mixture_alpha1_keeps_all_and_drops_null_group(spark):
    """alpha=1 is natural proportions: with the auto budget every non-null
    row survives (rate 1 everywhere); NULL-group rows are dropped."""
    from final_ocr_spark.operators.sampling import temperature_mixture

    df = _mix_corpus(spark, {"en": 400, "de": 100}).unionByName(
        spark.createDataFrame(
            [("x-1", None, 10), ("x-2", None, 10)],
            "doc_id string, lang string, tokens int",
        )
    )
    out = temperature_mixture(df, "lang", "doc_id", alpha=1.0)
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == sorted(
        f"{g}-{i}" for g, n in (("en", 400), ("de", 100)) for i in range(n)
    )


def test_temperature_mixture_matches_python_twin(spark):
    """Differential vs a pure-Python twin at alpha=0.5: sqrt is IEEE
    correctly-rounded in both engines, so shares/rates/thresholds are
    bit-identical and the kept set must match exactly. Also pinned stable
    under repartitioning."""
    import hashlib
    import math

    from final_ocr_spark.operators.sampling import temperature_mixture

    sizes = {"en": 1200, "de": 300, "fr": 80}
    df = _mix_corpus(spark, sizes)
    out = temperature_mixture(df, "lang", "doc_id", alpha=0.5, salt="t1")
    got = sorted(r["doc_id"] for r in out.collect())
    got2 = sorted(
        r["doc_id"]
        for r in temperature_mixture(
            df.repartition(13), "lang", "doc_id", alpha=0.5, salt="t1"
        ).collect()
    )
    assert got == got2

    pw = {g: math.sqrt(float(n)) for g, n in sizes.items()}
    # left-fold over NAME-SORTED groups — the operator's driver-free
    # normalization sorts the (group, weight) pairs inside one aggregation
    # buffer and folds left, so the total is order-independent and this
    # twin reproduces it addition-for-addition
    tot = 0.0
    for g in sorted(pw):
        tot += pw[g]
    share = {g: pw[g] / tot for g in sizes}
    budget = min(float(n) / share[g] for g, n in sizes.items())
    want = []
    for g, n in sizes.items():
        rate = min(1.0, share[g] * budget / float(n))
        thr = round(rate * 65536)  # banker's — matches F.bround
        for i in range(n):
            k = f"{g}-{i}"
            h = int(hashlib.md5(("t1" + k).encode()).hexdigest()[:4], 16)
            if thr >= 65536 or h < thr:
                want.append(k)
    assert got == sorted(want)
    # sanity: the flattening actually happened — fr keeps all, en thinned
    by = {}
    for k in got:
        by[k.split("-")[0]] = by.get(k.split("-")[0], 0) + 1
    assert by["fr"] == 80
    assert by["en"] < 1200


def test_temperature_mixture_is_driver_free(spark, monkeypatch):
    """No driver action precedes the keep rule: building the sampled
    DataFrame must not call collect/first/toPandas (group cardinality is
    caller-controlled — group=host would pull millions of skinny rows
    through a driver collect), and the normalization total rides the plan
    as a 1-row aggregate cross-joined back, mixture_sample's shape."""
    import pyspark.sql.dataframe as D

    from final_ocr_spark.operators.sampling import temperature_mixture

    df = _mix_corpus(spark, {"en": 40, "de": 10})

    def boom(self, *a, **k):
        raise AssertionError("driver-side action inside temperature_mixture")

    monkeypatch.setattr(D.DataFrame, "collect", boom)
    monkeypatch.setattr(D.DataFrame, "first", boom)
    monkeypatch.setattr(D.DataFrame, "toPandas", boom)
    out = temperature_mixture(df, "lang", "doc_id", alpha=0.5, salt="t1")
    plan = out._jdf.queryExecution().toString()
    monkeypatch.undo()
    assert "CollectLimit" not in plan
    assert out.count() > 0  # the lazy plan actually executes


def test_temperature_mixture_alpha0_uniform_and_validation(spark):
    """alpha=0 targets uniform shares: the smallest group binds the auto
    budget and keeps everything; bigger groups thin toward its size.
    Token-weighted mode and the alpha validation are exercised too."""
    import pytest

    from final_ocr_spark.operators.sampling import temperature_mixture

    df = _mix_corpus(spark)  # en 4000 / de 1000 / fr 500
    out = temperature_mixture(df, "lang", "doc_id", alpha=0.0)
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts["fr"] == 500
    for lang in ("en", "de"):
        assert abs(counts[lang] - 500) < 90, counts

    toks = temperature_mixture(
        df, "lang", "doc_id", alpha=0.0, budget=9000, size_col="tokens"
    )
    agg = {
        r["lang"]: r["t"]
        for r in toks.groupBy("lang").agg(F.sum("tokens").alias("t")).collect()
    }
    for lang in ("en", "de", "fr"):  # 3000 tokens each, binomial tolerance
        assert abs(agg[lang] - 3000) < 700, agg

    with pytest.raises(ValueError):
        temperature_mixture(df, "lang", "doc_id", alpha=-0.1)
