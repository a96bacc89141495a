"""Table-driven tests for the scalar-function layer (R1-R12, V1-V2, R5).

The R5 cases are the reference's number-format matrix (SURVEY §2.5 R5;
FIXTURES.md §3): EU/US separators, lone-comma decimal, thousands-only,
float64 artifacts.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from final_ocr_spark.functions.numbers import normalize_number
from final_ocr_spark.functions.parsing import (
    extract_date_str,
    extract_id,
    extract_total_amount,
    normalize_date,
)
from final_ocr_spark.functions.validate import net_repair, totals_additivity_ok

R5_CASES = [
    ("1.234,56", 1234.56),   # EU
    ("1,234.56", 1234.56),   # US
    ("37,75", 37.75),        # lone comma decimal
    ("1,234", 1234.0),       # thousands-only comma
    ("1.234", 1234.0),       # EU thousands dot
    ("209.00", 209.0),
    ("$ 6,204.19", 6204.19),
    ("762.4400000000001", 762.4400000000001),  # float64 artifact preserved
    ("12.345.678,90", 12345678.9),
    ("abc", None),
    ("", None),
    ("-42,50", -42.5),
]


def test_normalize_number_table(spark):
    df = spark.createDataFrame([(s,) for s, _ in R5_CASES], ["s"])
    got = {r["s"]: r["v"] for r in df.select("s", normalize_number(F.col("s")).alias("v")).collect()}
    for s, want in R5_CASES:
        if want is None:
            assert got[s] is None, s
        else:
            assert got[s] == pytest.approx(want), s


DATE_CASES = [
    ("04/13/2013", dt.date(2013, 4, 13)),  # falls through to M/d (golden order)
    ("13/04/2013", dt.date(2013, 4, 13)),  # day-first wins when valid
    ("01/02/2013", dt.date(2013, 2, 1)),   # ambiguous → day-first (pinned)
    ("2013-04-13", dt.date(2013, 4, 13)),
    ("31-12-2021", dt.date(2021, 12, 31)),
    ("99/99/9999", None),
]


def test_normalize_date_pinned_order(spark):
    df = spark.createDataFrame([(s,) for s, _ in DATE_CASES], ["s"])
    got = {r["s"]: r["d"] for r in df.select("s", normalize_date(F.col("s")).alias("d")).collect()}
    for s, want in DATE_CASES:
        assert got[s] == want, s


def test_cascades(spark):
    rows = [
        ("Invoice no: 51109338 Date of issue: 04/13/2013 Total $ 6,204.19",),
        ("no ids here at all",),
    ]
    df = spark.createDataFrame(rows, ["t"])
    out = df.select(
        extract_id(F.col("t")).alias("id"),
        extract_date_str(F.col("t")).alias("ds"),
        extract_total_amount(F.col("t")).alias("amt"),
    ).collect()
    assert out[0]["id"] == "51109338"
    assert out[0]["ds"] == "04/13/2013"
    assert out[0]["amt"] == "6,204.19"
    assert out[1]["id"] is None and out[1]["ds"] is None and out[1]["amt"] is None


def test_net_repair_and_additivity(spark):
    rows = [(3.0, 209.0, 627.0), (3.0, 209.0, 999.0)]
    df = spark.createDataFrame(rows, ["qty", "price", "net"])
    got = df.select(net_repair(F.col("qty"), F.col("price"), F.col("net")).alias("n")).collect()
    assert got[0]["n"] == 627.0      # consistent → untouched
    assert got[1]["n"] == 627.0      # repaired to round(qty*price,2)

    df2 = spark.createDataFrame([(5640.17, 564.02, 6204.19), (100.0, 10.0, 200.0)], ["n", "v", "g"])
    ok = df2.select(totals_additivity_ok(F.col("n"), F.col("v"), F.col("g")).alias("ok")).collect()
    assert ok[0]["ok"] is True and ok[1]["ok"] is False
