"""Unicode normalization operator — cross-checked against DuckDB's
nfc_normalize and against stdlib ground truth."""

import unicodedata

from pyspark.sql import functions as F

from final_ocr_spark.operators.normalize import _normalize_series, normalize_text

SAMPLES = [
    "café",            # NFD e + combining acute -> NFC é
    "éclair",           # precomposed é
    "ﬁnance",           # ﬁ ligature (NFKC -> fi)
    "２０２４",  # fullwidth 2024
    "Straße",           # ß (casefold -> ss)
    "ascii only text 123",
    "",
    "mixed Å ring",   # A + combining ring -> Å
]


def test_nfc_matches_duckdb_oracle(spark):
    import duckdb

    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)],
                               ["id", "t"])
    got = {r["id"]: r["n"] for r in df.select(
        "id", normalize_text("t", form="NFC").alias("n")).collect()}
    con = duckdb.connect()
    for i, s in enumerate(SAMPLES):
        want = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
        assert got[i] == want, (i, s)


def test_forms_match_stdlib(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)],
                               ["id", "t"])
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        got = {r["id"]: r["n"] for r in df.select(
            "id", normalize_text("t", form=form).alias("n")).collect()}
        for i, s in enumerate(SAMPLES):
            assert got[i] == unicodedata.normalize(form, s), (form, i)


def test_accent_strip_and_casefold(spark):
    rows = [(1, "Café STRAßE"), (2, "café"), (3, None)]
    df = spark.createDataFrame(rows, ["id", "t"])
    got = {r["id"]: r["n"] for r in df.select("id", normalize_text(
        "t", form="NFC", lowercase=True, strip_accents=True).alias("n")
    ).collect()}
    assert got[1] == "cafe strasse"   # accent gone, ß casefolded to ss
    assert got[2] == "cafe"
    assert got[3] is None


def test_normalization_unifies_dedup_fingerprints(spark):
    """The point of the operator: byte-different, visually-identical texts
    must collapse to ONE exact-dedup group after normalization."""
    from final_ocr_spark.operators.dedup import dedup_exact

    rows = [(1, "caf\u00e9 menu"), (2, "cafe\u0301 menu")]  # NFC vs NFD
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assert dedup_exact(df, text_col="text").count() == 2  # fragments raw
    norm = df.withColumn("text", normalize_text("text", form="NFC"))
    assert dedup_exact(norm, text_col="text").count() == 1


def test_ascii_fast_path_is_identity():
    import pandas as pd

    s = pd.Series(["plain ascii", "MORE TEXT 42", None])
    out = _normalize_series(s, "NFKC", lowercase=False, strip_accents=True)
    assert list(out[:2]) == ["plain ascii", "MORE TEXT 42"]
    assert out[2] is None


def test_invalid_form_rejected():
    import pytest

    with pytest.raises(ValueError, match="form"):
        normalize_text("t", form="NFX")
