"""TF-IDF top terms — cross-checked against an independent DuckDB
formulation over the same documents."""

from pyspark.sql import functions as F

from final_ocr_spark.operators.text_stats import tf_idf_top_terms

DOCS = [
    (1, "the cat sat on the mat the cat"),
    (2, "the dog chased the cat around the yard"),
    (3, "quantum computing uses qubits for parallel computation"),
    (4, "the yard had a mat and a dog"),
    (5, "Cats, dogs; and QUANTUM cats!"),
]

DUCK_SQL = """
WITH toks AS (
  SELECT id,
         regexp_replace(regexp_replace(lower(unnest(
           list_filter(string_split_regex(trim(text), '\\s+'), t -> t != ''))),
           '^[^0-9a-z_]+', '', 'g'), '[^0-9a-z_]+$', '', 'g') AS term
  FROM docs
),
tf AS (
  SELECT id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE term != '' GROUP BY id, term
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS doc_freq FROM tf GROUP BY term
),
scored AS (
  SELECT id, tf.term, tf, doc_freq,
         tf * (ln((5 + 1.0) / (doc_freq + 1.0)) + 1.0) AS tf_idf
  FROM tf JOIN dfreq ON tf.term = dfreq.term
)
SELECT id, term, tf, doc_freq, round(tf_idf, 9) AS tf_idf,
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
    assert got == want


def test_tfidf_rare_term_outranks_common(spark):
    df = spark.createDataFrame(DOCS, ["id", "text"])
    top = {r["term"] for r in tf_idf_top_terms(df, "id", "text", k=1)
           .filter("id = 3").collect()}
    # every term in doc 3 is unique to it except 'quantum' (also doc 5) and
    # 'for'; the top-1 must be one of its tf=1 idf-max terms, never 'the'
    assert top and "the" not in top


def test_tfidf_min_doc_freq_filters(spark):
    df = spark.createDataFrame(DOCS, ["id", "text"])
    out = tf_idf_top_terms(df, "id", "text", k=10, min_doc_freq=2)
    assert out.filter("doc_freq < 2").count() == 0
    # 'cat' appears in docs 1, 2, 5 -> survives
    assert out.filter("term = 'cat'").count() > 0


def test_tfidf_two_shuffle_plan(spark):
    """Both aggregations must show partial/final pairs (map-side combine) —
    the property that keeps shuffle volume at distinct-key cardinality."""
    df = spark.createDataFrame(DOCS, ["id", "text"])
    plan = (tf_idf_top_terms(df, "id", "text", k=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "partial_count" in plan  # map-side combine present
    assert "NestedLoop" not in plan and "Cartesian" not in plan
