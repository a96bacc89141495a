"""S4/S5 xlsx sinks (stdlib zip+XML round-trip) and the S9 localized report."""

from __future__ import annotations

import xml.etree.ElementTree as ET
import zipfile

import pytest

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _read_sheet(path, idx=1):
    with zipfile.ZipFile(path) as z:
        xml = z.read(f"xl/worksheets/sheet{idx}.xml")
    root = ET.fromstring(xml)
    rows = []
    for row in root.iter(f"{_NS}row"):
        cells = []
        for c in row.iter(f"{_NS}c"):
            t = c.find(f"{_NS}is/{_NS}t")
            v = c.find(f"{_NS}v")
            cells.append(t.text if t is not None else (v.text if v is not None else None))
        rows.append(cells)
    return rows


def _sheet_names(path):
    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read("xl/workbook.xml"))
    return [s.get("name") for s in root.iter(f"{_NS}sheet")]


def test_s4_three_section_workbook(spark, tmp_path):
    from final_ocr_spark.sources.xlsx import write_invoice_workbook

    header = spark.createDataFrame([("51109338", "2013-04-13")], ["invoice_no", "date"])
    items = spark.createDataFrame(
        [(1, "Dell Desktop", 3.0, 209.0), (2, "Mouse & Pad <x>", 1.0, 9.5)],
        ["item_no", "description", "qty", "price"],
    )
    summary = spark.createDataFrame([(5640.17, 564.02, 6204.19)], ["net", "vat", "gross"])
    path = str(tmp_path / "invoice.xlsx")
    write_invoice_workbook(path, header, items, summary)

    assert _sheet_names(path) == ["Invoice"]
    rows = _read_sheet(path)
    # stacked sections with title rows and a blank row between
    assert rows[0] == ["Header"]
    assert rows[1] == ["invoice_no", "date"]
    assert rows[2] == ["51109338", "2013-04-13"]
    assert ["Items"] in rows and ["Summary"] in rows
    ix = rows.index(["Items"])
    assert rows[ix + 2][1] == "Dell Desktop"
    assert rows[ix + 3][1] == "Mouse & Pad <x>"  # XML-escaping round-trips
    assert float(rows[rows.index(["Summary"]) + 2][2]) == 6204.19  # numeric cell


def test_s5_two_sheet_workbook(spark, tmp_path):
    from final_ocr_spark.sources.xlsx import write_two_sheet_workbook

    inv = spark.createDataFrame([("a", 2)], ["doc", "n_items"])
    items = spark.createDataFrame([("a", 1), ("a", 2)], ["doc", "item_no"])
    path = str(tmp_path / "batch.xlsx")
    write_two_sheet_workbook(path, inv, items)
    assert _sheet_names(path) == ["Invoices", "Items"]
    assert len(_read_sheet(path, 2)) == 3  # header + 2 item rows


def test_report_sink_refuses_bulk(spark, tmp_path):
    from final_ocr_spark.sources.xlsx import df_to_rows

    big = spark.range(50)
    with pytest.raises(ValueError, match="refused"):
        df_to_rows(big, max_rows=10)


def test_s9_localized_report(spark, tmp_path):
    from final_ocr_spark.operators.invoice_records import parse_invoice_documents
    from final_ocr_spark.sources.report import render_invoice_reports, save_reports

    docs = spark.createDataFrame(
        [(7, "Invoice no: 10000007\nITEMS\n1. widget 2 each 100 200 10% 220\n"
              "2. gadget 1 each 50 50 10% 55\nSUMMARY\n")],
        ["doc_id", "text"],
    )
    items = parse_invoice_documents(docs)
    headers = spark.createDataFrame(
        [(7, "Acme GmbH", None)],
        "doc_key long, seller_name string, seller_phone string",
    )

    ar = render_invoice_reports(items, headers, locale="ar").collect()[0]["report"]
    assert "تقرير تحليل الفاتورة" in ar
    assert "1. المنتج: widget" in ar and "2. المنتج: gadget" in ar
    assert "الكمية: 2.0 | السعر: 100.0 | الإجمالي: 220.0" in ar
    assert "هاتف البائع: غير محدد" in ar  # null → localized not-specified
    assert "الإجمالي: 275.0" in ar  # doc total = 220 + 55

    en = render_invoice_reports(items, headers, locale="en").collect()[0]["report"]
    assert "Invoice Analysis Report" in en and "not specified" in en

    n = save_reports(render_invoice_reports(items, headers, locale="ar"),
                     str(tmp_path / "reports"))
    assert n == 1
    txt = (tmp_path / "reports" / "7.txt").read_text(encoding="utf-8")
    assert txt == ar


def test_xlsx_control_chars_and_quoted_sheet_names(tmp_path):
    """Round-2 review regression: C0 control chars must be encoded
    _x000C_-style (XML 1.0 cannot carry them even escaped) and sheet names
    containing double quotes must not break the name attribute."""
    from final_ocr_spark.sources.xlsx import write_xlsx

    p = str(tmp_path / "ctl.xlsx")
    write_xlsx(p, {'Q3 "final"': [["head"], ["page\x0cbreak & <tag>"]]})
    # workbook.xml parses and the quoted name round-trips
    assert _sheet_names(p) == ['Q3 "final"']
    # worksheet parses; control char encoded, markup escaped
    rows = _read_sheet(p)
    assert rows[1][0] == "page_x000C_break & <tag>"
