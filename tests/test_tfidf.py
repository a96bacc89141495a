"""TF-IDF top terms — cross-checked against an independent DuckDB
formulation over the same documents (sketch_words tokenization mirror)."""

from pyspark.sql import functions as F

from final_ocr_spark.operators.text_stats import tf_idf_top_terms

DOCS = [
    (1, "the cat sat on the mat the cat"),
    (2, "the dog chased the cat around the yard"),
    (3, "quantum computing uses qubits for parallel computation"),
    (4, "the yard had a mat and a dog"),
    (5, "Cats, dogs; and QUANTUM cats!"),
]

# mirrors sketch_words' documented DuckDB form (punct runs -> space,
# lowercase, whitespace split, empties dropped)
DUCK_SQL = """
WITH toks AS (
  SELECT id,
         unnest(list_filter(string_split_regex(
           lower(regexp_replace(text, '[^\\w\\s]+', ' ', 'g')), '\\s+'),
           w -> w != '')) AS term
  FROM docs
),
tf AS (
  SELECT id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY id, term
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS doc_freq FROM tf GROUP BY term
),
scored AS (
  SELECT id, tf.term, tf, doc_freq,
         tf * (ln((5 + 1.0) / (doc_freq + 1.0)) + 1.0) AS tf_idf
  FROM tf JOIN dfreq ON tf.term = dfreq.term
)
SELECT id, term, tf, doc_freq, tf_idf,
       row_number() OVER (PARTITION BY id ORDER BY tf_idf DESC, term) AS rank
FROM scored
QUALIFY rank <= 3
ORDER BY id, rank
"""


def test_tfidf_matches_duckdb(spark):
    import duckdb

    df = spark.createDataFrame(DOCS, ["id", "text"])
    got = sorted(
        tuple(r) for r in tf_idf_top_terms(df, "id", "text", k=3).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)
    want = sorted(tuple(r) for r in con.execute(DUCK_SQL).fetchall())
    assert len(got) == len(want)
    for g, w in zip(got, want):
        # integer/string fields exact; the double with tolerance — Spark
        # and DuckDB round() tie-break differently (repo pitfall, r1)
        assert g[:4] == w[:4] and g[5] == w[5], (g, w)
        assert abs(g[4] - w[4]) < 1e-8, (g, w)


def test_tfidf_rare_term_outranks_common(spark):
    df = spark.createDataFrame(DOCS, ["id", "text"])
    top = {r["term"] for r in tf_idf_top_terms(df, "id", "text", k=1)
           .filter("id = 3").collect()}
    assert top and "the" not in top


def test_tfidf_min_doc_freq_filters(spark):
    df = spark.createDataFrame(DOCS, ["id", "text"])
    out = tf_idf_top_terms(df, "id", "text", k=10, min_doc_freq=2)
    assert out.filter("doc_freq < 2").count() == 0
    # 'cat' appears in docs 1 and 2 -> survives (doc 5 has 'cats')
    assert out.filter("term = 'cat'").count() > 0


def test_tfidf_tokenization_matches_sketch_words(spark):
    """tf-idf terms must be joinable against gram/vocab tables: identical
    token sets to the canonical sketch_words definition."""
    from final_ocr_spark.operators.dedup import sketch_words

    df = spark.createDataFrame(
        [(1, "Don't copy; e.g. café 日本語 naïve-looking!")], ["id", "text"])
    canon = set(df.select(F.explode(sketch_words(F.col("text")))
                          .alias("t")).toPandas()["t"])
    tfidf_terms = {r["term"] for r in
                   tf_idf_top_terms(df, "id", "text", k=100).collect()}
    assert tfidf_terms == canon


def test_tfidf_is_lazy_no_eager_action(spark):
    """Building the plan must not execute the input (the n_docs count rides
    the plan as a broadcast 1-row aggregate, not a driver .first())."""
    calls = {"n": 0}

    from pyspark.sql import DataFrame as _DF
    orig = _DF.first

    def counting_first(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    _DF.first = counting_first
    try:
        df = spark.createDataFrame(DOCS, ["id", "text"])
        out = tf_idf_top_terms(df, "id", "text", k=3)  # plan only
        assert calls["n"] == 0
        assert out.count() > 0
    finally:
        _DF.first = orig


def test_tfidf_reserved_key_name_rejected(spark):
    import pytest

    df = spark.createDataFrame([(1, "x")], ["term", "text"])
    with pytest.raises(ValueError, match="collides"):
        tf_idf_top_terms(df, "term", "text")
