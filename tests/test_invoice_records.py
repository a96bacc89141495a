"""Invoice-record parsing parity with the reference's golden semantics.

The fixture values are the reference's own goldens (SURVEY §5.1: invoice
51109338 — item row `1 ; CLEARANCE! Fast Dell Desktop ; 3 ; 209 ; 627 ; 10% ;
689.7`, summary net 5,640.17 / VAT 564.02 / gross 6,204.19) — the
manual-text-bypass analog (ocr.py:1232-1261)."""

from __future__ import annotations

import datetime as dt

import pytest

INVOICE_TEXT = """Invoice no: 51109338
Date of issue: 04/13/2013
Seller: Patel Inc Client: Becker-Moore
ITEMS
No. Description Qty Price Net VAT Gross
1. CLEARANCE! Fast Dell Desktop Computer PC 3.00 each 209.00 627.00 10% 689.70
2. Dell Optiplex Desktop Computer
Windows 10 Refurbished 2.00 each 1,223.49 2,446.98 10% 2,691.68
3. Gaming PC Desktop Tower 1.00 each 2,566.19 2,566.19 10% 2,822.81
SUMMARY
Total $ 5,640.17 $ 564.02 $ 6,204.19
"""


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(1, INVOICE_TEXT)], ["doc_id", "text"])


def test_items_parsed_with_golden_values(spark, docs):
    from final_ocr_spark.operators.invoice_records import parse_invoice_documents

    items = {r["item_no"]: r for r in parse_invoice_documents(docs).collect()}
    assert set(items) == {1, 2, 3}
    r1 = items[1]
    assert r1["invoice_no"] == "51109338"
    assert r1["invoice_date"] == dt.date(2013, 4, 13)  # M/d fallthrough (R3)
    assert r1["description"] == "CLEARANCE! Fast Dell Desktop Computer PC"
    assert r1["quantity"] == 3.0
    assert r1["unit_price"] == 209.0
    assert r1["net_worth"] == 627.0
    assert r1["vat_percentage"] == "10%"
    assert r1["gross_worth"] == pytest.approx(689.7)


def test_continuation_line_merged(spark, docs):
    """G5: item 2's description spans two physical lines."""
    from final_ocr_spark.operators.invoice_records import parse_invoice_documents

    items = {r["item_no"]: r for r in parse_invoice_documents(docs).collect()}
    assert "Windows 10 Refurbished" in items[2]["description"]
    assert items[2]["net_worth"] == pytest.approx(2446.98)


def test_net_repair_fires_on_bad_net(spark):
    """V1: inconsistent net is overwritten with round(qty*price, 2)."""
    from final_ocr_spark.operators.invoice_records import parse_invoice_documents

    bad = INVOICE_TEXT.replace("627.00", "699.00")
    docs = (
        parse_invoice_documents(
            __import__("pyspark").sql.SparkSession.getActiveSession().createDataFrame(
                [(1, bad)], ["doc_id", "text"]
            )
        )
        .collect()
    )
    r1 = [r for r in docs if r["item_no"] == 1][0]
    assert r1["net_worth"] == 627.0  # repaired


def test_totals_additivity_gate(spark, docs):
    from final_ocr_spark.operators.invoice_records import parse_invoice_totals

    t = parse_invoice_totals(docs).collect()[0]
    assert t["summary_row_accepted"] is True
    assert t["net_worth"] == pytest.approx(5640.17)
    assert t["vat"] == pytest.approx(564.02)
    assert t["gross_worth"] == pytest.approx(6204.19)


def test_totals_fallback_to_items(spark):
    """V3: broken summary row falls back to totals-from-items."""
    from final_ocr_spark.operators.invoice_records import parse_invoice_totals

    bad = INVOICE_TEXT.replace("$ 6,204.19", "$ 9,999.99")
    docs = __import__("pyspark").sql.SparkSession.getActiveSession().createDataFrame(
        [(1, bad)], ["doc_id", "text"]
    )
    t = parse_invoice_totals(docs).collect()[0]
    assert t["summary_row_accepted"] is False
    assert t["net_worth"] == pytest.approx(627.0 + 2446.98 + 2566.19)
