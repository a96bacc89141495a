"""S9 — localized human-readable invoice report (SURVEY §2.1).

The reference's txt-report variant (fixture invoice_analysis_20250921_124128
.txt: Arabic labels, banner, invoice-info block, numbered product lines with
`غير محدد` for missing values) re-expressed Spark-first: the report body is
rendered DISTRIBUTED as a string column — groupBy(doc) + sorted collect_list
+ array_join, all Column expressions — so rendering 10^9 reports is an
ordinary aggregation. Only the optional ``save_reports`` step (one .txt per
document, the reference's exact artifact shape) is driver-side, and hard-caps
its row count like the xlsx sink.
"""

from __future__ import annotations

import pathlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LABELS: dict[str, dict[str, str]] = {
    "ar": {
        "title": "🧾 تقرير تحليل الفاتورة",
        "info": "📋 معلومات الفاتورة:",
        "invoice_no": "🔢 رقم الفاتورة",
        "total": "💰 الإجمالي",
        "seller": "🏢 اسم البائع",
        "phone": "📞 هاتف البائع",
        "products": "🛍️ بيانات المنتجات:",
        "product": "المنتج",
        "qty": "الكمية",
        "price": "السعر",
        "line_total": "الإجمالي",
        "na": "غير محدد",
    },
    "en": {
        "title": "🧾 Invoice Analysis Report",
        "info": "📋 Invoice information:",
        "invoice_no": "🔢 Invoice number",
        "total": "💰 Total",
        "seller": "🏢 Seller name",
        "phone": "📞 Seller phone",
        "products": "🛍️ Product data:",
        "product": "Product",
        "qty": "Quantity",
        "price": "Price",
        "line_total": "Total",
        "na": "not specified",
    },
}

_BANNER = "=" * 60
_RULE = "-" * 30


def render_invoice_reports(
    items: DataFrame,
    headers: DataFrame | None = None,
    locale: str = "ar",
    key: str = "doc_key",
) -> DataFrame:
    """items (parse_invoice_documents output) [+ optional headers with
    (key, seller_name, seller_phone)] → one (key, report) row per document.

    Fully distributed: per-item lines are Column expressions, per-doc
    assembly is an ordered collect_list aggregation.
    """
    lab = LABELS[locale]

    def fmt(col: Column) -> Column:
        return F.coalesce(col.cast("string"), F.lit(lab["na"]))

    line = F.concat(
        F.col("item_no").cast("string"), F.lit(f". {lab['product']}: "),
        fmt(F.col("description")),
        F.lit(f"\n   {lab['qty']}: "), fmt(F.col("quantity")),
        F.lit(f" | {lab['price']}: "), fmt(F.col("unit_price")),
        F.lit(f" | {lab['line_total']}: "), fmt(F.col("gross_worth")),
    )
    per_doc = (
        items.withColumn("_line", line)
        .groupBy(key)
        .agg(
            F.min("invoice_no").alias("_inv"),
            F.round(F.sum("gross_worth"), 2).alias("_total"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("item_no", "_line"))),
                    lambda s: s.getField("_line"),
                ),
                "\n",
            ).alias("_items_block"),
        )
    )
    if headers is not None:
        per_doc = per_doc.join(headers, key, "left")
        seller = fmt(F.col("seller_name"))
        phone = fmt(F.col("seller_phone"))
    else:
        seller = F.lit(lab["na"])
        phone = F.lit(lab["na"])

    report = F.concat(
        F.lit(f"{_BANNER}\n{lab['title']}\n{_BANNER}\n\n{lab['info']}\n{_RULE}\n"),
        F.lit(f"{lab['invoice_no']}: "), fmt(F.col("_inv")),
        F.lit(f"\n{lab['total']}: "), fmt(F.col("_total")),
        F.lit(f"\n{lab['seller']}: "), seller,
        F.lit(f"\n{lab['phone']}: "), phone,
        F.lit(f"\n\n{lab['products']}\n{_RULE}\n"),
        F.col("_items_block"),
        F.lit("\n"),
    )
    return per_doc.select(F.col(key), report.alias("report"))


def save_reports(reports: DataFrame, out_dir: str, key: str = "doc_key",
                 max_reports: int = 10_000) -> int:
    """Write one ``<key>.txt`` per row (the reference's artifact shape).
    Driver-side and hard-capped: reports are bounded human-facing output —
    the data path is the report COLUMN itself (write it with sinks.py)."""
    rows = reports.limit(max_reports + 1).collect()
    if len(rows) > max_reports:
        raise ValueError(
            f"report sink refused: >{max_reports} docs — keep the report "
            "column distributed (sinks.write_parquet/write_json) instead"
        )
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for r in rows:
        (out / f"{r[key]}.txt").write_text(r["report"], encoding="utf-8")
    return len(rows)
