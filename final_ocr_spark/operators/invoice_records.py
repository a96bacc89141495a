"""Invoice-style record parsing as declarative DataFrame ops — the reference's
effective item/totals dataflow (SURVEY §2.4-2.6) re-expressed Spark-first.

This is the *record* branch of the engine: given document text shaped like

    Invoice no: 51109338
    Date of issue: 04/13/2013
    ITEMS
    1. CLEARANCE! Fast Dell Desktop 3.00 each 209.00 627.00 10% 689.70
    ...
    SUMMARY
    Total $ 5,640.17 $ 564.02 $ 6,204.19

it reproduces the reference's live semantics (the bug-adjusted pipeline that
produced the goldens, SURVEY §2.9 design rule):

* G2/G3 — section split via regexp (ITEMS…SUMMARY cascade, ocr.py:645-649)
* G5 — multi-line continuation merge as the ORACLE-CHECKABLE window form:
  forward-fill item numbers over line order, then group-concat
  (ocr.py:823-848's state machine, SURVEY's Window equivalent)
* G4 — header/divider line filter (ocr.py:766-770)
* R7 — rich item-line parse: number extraction with positional net/gross
  (last-two-numbers rule, ocr.py:436-448), VAT ``(\\d+)%`` default 10%
  (ocr.py:425-426)
* V1 — net repair |net−qty·price|>0.1 → round(qty·price,2) (ocr.py:450-456)
* R6-arithmetic — gross = net·(1+vat/100) (ocr.py:290-294)
* R11/V2 — totals-row parse + additivity gate (ocr.py:876-946)
* V3/A1 — totals-from-items fallback aggregation (ocr.py:979-994)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from final_ocr_spark.functions.numbers import normalize_number
from final_ocr_spark.functions.parsing import extract_date_str, extract_id, normalize_date
from final_ocr_spark.functions.validate import net_repair

# R7's number token: optional thousands groups + optional decimals.
# ALWAYS embed the grouped form — a bare top-level alternation spliced into a
# larger pattern silently splits the whole regex.
_NUM = r"(?:\d{1,3}(?:,\d{3})*(?:\.\d+)?|\d+(?:\.\d+)?)"
# G4 line filter (ocr.py:766-770)
_SKIP_LINE = r"^(No\.|Description|Qty|Price|Amount|---|\|)"


def parse_invoice_documents(docs: DataFrame, key: str = "doc_id", text_col: str = "text") -> DataFrame:
    """documents(key, text) → one row per parsed item with repaired values.

    All Column expressions — exploded lines travel through a window
    (forward-fill of item numbers = the reference's continuation merge) and
    regex projections; zero Python in the plan.
    """
    d = docs.select(
        F.col(key).alias("k"),
        F.col(text_col).alias("t"),
        extract_id(F.col(text_col)).alias("invoice_no"),
        normalize_date(extract_date_str(F.col(text_col))).alias("invoice_date"),
    )
    # G2/G3: items section = between ITEMS and SUMMARY (cascade w/ open end)
    items_sec = F.coalesce(
        F.nullif(F.regexp_extract("t", r"(?s)ITEMS\s*(.*?)\s*(?:SUMMARY|Total)", 1), F.lit("")),
        F.nullif(F.regexp_extract("t", r"(?s)ITEMS\s*(.*)", 1), F.lit("")),
    )
    lines = d.select(
        "k", "invoice_no", "invoice_date",
        F.posexplode(F.split(items_sec, r"\n")).alias("line_no", "line"),
    ).filter(
        (F.trim("line") != "") & ~F.col("line").rlike(_SKIP_LINE)
    )

    # G5 window form: every line starting with "<n>." OPENS an item (the
    # reference's state machine makes a new item per numbered line even when
    # the printed number repeats — so the group key is the running count of
    # opens, NOT the number's value); continuation lines join the latest open
    # item via the running sum, then group-concat in line order.
    item_no = F.nullif(F.regexp_extract("line", r"^\s*(\d+)[.)]\s", 1), F.lit(""))
    w = (
        Window.partitionBy("k").orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = (
        lines.withColumn("item_no_raw", item_no)
        .withColumn("occ", F.sum(item_no.isNotNull().cast("int")).over(w))
        .filter(F.col("occ") >= 1)
    )
    # collect_list is unordered — sort by line_no before joining (A4 analog)
    ordered_lines = F.transform(
        F.array_sort(F.collect_list(F.struct("line_no", "line"))),
        lambda s: s.getField("line"),
    )
    merged = filled.groupBy("k", "invoice_no", "invoice_date", "occ").agg(
        # exactly one line per group carries the printed item number
        F.max("item_no_raw").alias("item_no"),
        F.array_join(ordered_lines, " ").alias("item_text"),
        F.min("line_no").alias("first_line"),
    )

    # R7: all number tokens in order; positional rule — after the anchor
    # "<qty> each <price>", net/gross are the last two numbers.
    # NB: python API, not F.expr — SQL string literals eat regex backslashes
    nums = F.regexp_extract_all("item_text", F.lit(f"({_NUM})"), 1)
    qty = normalize_number(
        F.regexp_extract("item_text", rf"({_NUM})\s+each\b", 1)
    )
    price = normalize_number(
        F.regexp_extract("item_text", rf"each\s+({_NUM})", 1)
    )
    vat_pct = F.coalesce(
        F.nullif(F.regexp_extract("item_text", r"(\d+)\s*%", 1), F.lit("")).try_cast("double"),
        F.lit(10.0),  # reference default "10%" (ocr.py:426)
    )
    net_raw = normalize_number(F.element_at(nums, -2))
    gross_raw = normalize_number(F.element_at(nums, -1))
    # description = text between the item-no prefix and the qty anchor
    desc = F.trim(
        F.regexp_extract("item_text", rf"^\s*\d+[.)]\s*(.*?)\s+{_NUM}\s+each\b", 1)
    )

    net = net_repair(qty, price, net_raw)  # V1
    gross = F.when(
        F.abs(gross_raw - F.round(net * (1 + vat_pct / 100.0), 2)) <= 0.1, gross_raw
    ).otherwise(F.round(net * (1 + vat_pct / 100.0), 2))  # R6 arithmetic gate

    return merged.select(
        F.col("k").alias("doc_key"),
        "invoice_no",
        "invoice_date",
        F.col("item_no").cast("int").alias("item_no"),
        desc.alias("description"),
        qty.alias("quantity"),
        price.alias("unit_price"),
        net.alias("net_worth"),
        F.concat(vat_pct.cast("int").cast("string"), F.lit("%")).alias("vat_percentage"),
        gross.alias("gross_worth"),
    )


def parse_invoice_totals(docs: DataFrame, key: str = "doc_id", text_col: str = "text") -> DataFrame:
    """R11/V2/V3: summary totals row with additivity gate, falling back to
    totals-from-items aggregation (the reference's repair ladder)."""
    items = parse_invoice_documents(docs, key, text_col)
    from_items = items.groupBy("doc_key").agg(
        F.round(F.sum("net_worth"), 2).alias("items_net"),
        F.round(F.sum("gross_worth"), 2).alias("items_gross"),
    ).withColumn("items_vat", F.round(F.col("items_gross") - F.col("items_net"), 2))

    row = F.regexp_extract(
        F.col(text_col), rf"Total\s*\$\s*({_NUM})\s*\$\s*({_NUM})\s*\$\s*({_NUM})", 0
    )
    d = docs.select(
        F.col(key).alias("doc_key"),
        normalize_number(F.regexp_extract(F.col(text_col), rf"Total\s*\$\s*({_NUM})", 1)).alias("sum_net"),
        normalize_number(
            F.regexp_extract(F.col(text_col), rf"Total\s*\$\s*{_NUM}\s*\$\s*({_NUM})", 1)
        ).alias("sum_vat"),
        normalize_number(
            F.regexp_extract(F.col(text_col), rf"Total\s*\$\s*{_NUM}\s*\$\s*{_NUM}\s*\$\s*({_NUM})", 1)
        ).alias("sum_gross"),
    )
    # V2 gate: accept the summary row only when gross ≈ net+vat (ocr.py:937-943)
    ok = F.abs(F.col("sum_gross") - (F.col("sum_net") + F.col("sum_vat"))) < 0.1
    joined = d.join(from_items, "doc_key", "left")
    return joined.select(
        "doc_key",
        F.when(ok, F.col("sum_net")).otherwise(F.col("items_net")).alias("net_worth"),
        F.when(ok, F.col("sum_vat")).otherwise(F.col("items_vat")).alias("vat"),
        F.when(ok, F.col("sum_gross")).otherwise(F.col("items_gross")).alias("gross_worth"),
        ok.alias("summary_row_accepted"),
    )
