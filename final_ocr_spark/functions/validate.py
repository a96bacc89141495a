"""Validation / repair rules as Column expressions (SURVEY §2.6 V1-V5, V9).

The reference's inline asserts-with-repair become declarative CASE logic:
* V1 net-worth repair (ocr.py:450-456)
* V2 totals additivity gate (ocr.py:937-943)
* V9 completeness scoring (fixture invoice_analysis_20250921_124128.json:148)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def net_repair(qty: Column, price: Column, net: Column, tol: float = 0.1) -> Column:
    """V1: if |net - qty*price| > tol, overwrite net with round(qty*price, 2)
    (ocr.py:450-456)."""
    computed = F.round(qty * price, 2)
    return F.when(F.abs(net - computed) > tol, computed).otherwise(net)


def gross_from_net(net: Column, vat_pct: Column) -> Column:
    """Derived gross = net * (1 + vat/100), rounded — ocr.py:290-294."""
    return F.round(net * (F.lit(1.0) + vat_pct / F.lit(100.0)), 2)


def totals_additivity_ok(net: Column, vat: Column, gross: Column, tol: float = 0.1) -> Column:
    """V2: accept summary totals only when |gross - (net+vat)| < tol
    (ocr.py:937-943). Returns boolean."""
    return F.abs(gross - (net + vat)) < tol


def completeness_score(*present_flags: Column) -> Column:
    """V9: percentage of fields present (golden `completeness_score: 50` with
    2 of 4 found_* booleans true)."""
    n = len(present_flags)
    total = None
    for f in present_flags:
        c = F.when(f, 1).otherwise(0)
        total = c if total is None else total + c
    return F.round(total * F.lit(100.0) / F.lit(float(n)), 1)
