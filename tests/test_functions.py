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


def test_v4_v5_sanity_rules(spark):
    from final_ocr_spark.functions.validate import sane_quantity, suspicious_magnitude

    df = spark.createDataFrame(
        [(3.0, 209.0), (300000.0, 209.0), (2.0, 9_876_543.0), (None, None)],
        ["qty", "amt"],
    )
    got = df.select(
        sane_quantity(F.col("qty")).alias("q"),
        suspicious_magnitude(F.col("amt")).alias("s"),
    ).collect()
    assert [r["q"] for r in got] == [3.0, 1.0, 2.0, 1.0]  # cap → default 1
    assert [r["s"] for r in got] == [False, False, True, False]  # null → False


def test_v6_entity_swap_is_config_gated(spark):
    from final_ocr_spark.functions.validate import entity_swap_repair

    df = spark.createDataFrame(
        [("Becker GmbH", "Alice Ltd"), ("Widget Co", "Bob Inc")],
        ["s_name", "c_name"],
    )
    seller = {"name": F.col("s_name")}
    client = {"name": F.col("c_name")}

    # OFF by default: inputs pass through untouched
    s_off, c_off = entity_swap_repair(seller, client)
    got = df.select(s_off["name"].alias("s"), c_off["name"].alias("c")).collect()
    assert [(r["s"], r["c"]) for r in got] == [
        ("Becker GmbH", "Alice Ltd"), ("Widget Co", "Bob Inc")]

    # enabled: the trigger row swaps, others untouched (ocr.py:1044-1061)
    s_on, c_on = entity_swap_repair(seller, client, enabled=True)
    got = df.select(s_on["name"].alias("s"), c_on["name"].alias("c")).collect()
    assert [(r["s"], r["c"]) for r in got] == [
        ("Alice Ltd", "Becker GmbH"), ("Widget Co", "Bob Inc")]


def test_r8_r9_variant_fields(spark):
    from final_ocr_spark.functions.parsing import (
        clean_product_name, extract_discount, extract_phone)

    df = spark.createDataFrame(
        [
            ("Seller:\nAcme\nPhone: +48 123-456 789\nMain St 5",
             "CLEARANCE! Fast Dell Desktop 3.00 each 209.00 total 627.00 10% vat",),
            ("no phone line here", "plain widget DISCOUNT $ 12,50 tail",),
        ],
        ["party", "item"],
    )
    got = df.select(
        extract_phone(F.col("party")).alias("ph"),
        extract_discount(F.col("item")).alias("disc"),
        clean_product_name(F.col("item")).alias("name"),
    ).collect()
    assert got[0]["ph"] == "+48 123-456 789"
    assert got[1]["ph"] is None
    assert got[1]["disc"] == "12,50"  # case-insensitive, raw token (R5 cleans)
    # number+unit tokens ('3.00 each') dropped, keyword tail ('total ...')
    # dropped, whitespace collapsed (ocr2.py:553-565)
    assert got[0]["name"] == "CLEARANCE! Fast Dell Desktop 209.00"
    assert got[1]["name"] == "plain widget"
