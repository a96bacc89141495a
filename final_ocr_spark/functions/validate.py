"""Validation / repair rules as Column expressions (SURVEY §2.6 V1-V6, V9).

The reference's inline asserts-with-repair become declarative CASE logic:
* V1 net-worth repair (ocr.py:450-456)
* V2 totals additivity gate (ocr.py:937-943)
* V4 suspicious-magnitude flag (ocr.py:919-922: "Very large number detected")
* V5 quantity sanity cap (ocr.py:322: numbers[0] accepted as qty only < 1000)
* V6 entity-swap repair, config-gated OFF by default (ocr.py:1044-1061)
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


def suspicious_magnitude(value: Column, cap: float = 1_000_000.0) -> Column:
    """V4: flag absurd OCR numbers (ocr.py:919-922 warns when a parsed value
    exceeds 1e6 — a misread decimal separator turns 1.234,56 into 123456).
    Returns boolean; null value → false (nothing to flag)."""
    return F.coalesce(value > F.lit(cap), F.lit(False))


def sane_quantity(qty: Column, default: float = 1.0, cap: float = 1000.0) -> Column:
    """V5: the reference's "reasonable quantity check" (ocr.py:322): a leading
    number is accepted as the quantity only when it is < 1000; otherwise the
    quantity falls back to the default of 1 (the number was really a price or
    an id). Null-safe: null qty → default."""
    return F.when(qty.isNotNull() & (qty < F.lit(cap)), qty).otherwise(F.lit(default))


def entity_swap_repair(
    seller: dict[str, Column], client: dict[str, Column],
    trigger_substring: str = "Becker", enabled: bool = False,
) -> tuple[dict[str, Column], dict[str, Column]]:
    """V6: seller/client swap repair (ocr.py:1044-1061) — the reference
    hard-codes: if the extracted seller name contains 'Becker' (a known
    mis-labelled layout), swap the full seller and client field sets.

    Config-gated and OFF by default (SURVEY §2.6): the rule is a dataset-
    specific patch, not general semantics. When disabled, inputs pass
    through unchanged. Both dicts must share keys (name/address/tax_id...).
    """
    if not enabled:
        return seller, client
    swap = F.coalesce(seller["name"].contains(trigger_substring), F.lit(False))
    fixed_seller = {k: F.when(swap, client[k]).otherwise(seller[k]) for k in seller}
    fixed_client = {k: F.when(swap, seller[k]).otherwise(client[k]) for k in client}
    return fixed_seller, fixed_client


def completeness_score(*present_flags: Column) -> Column:
    """V9: percentage of fields present (golden `completeness_score: 50` with
    2 of 4 found_* booleans true)."""
    n = len(present_flags)
    total = None
    for f in present_flags:
        c = F.when(f, 1).otherwise(0)
        total = c if total is None else total + c
    return F.round(total * F.lit(100.0) / F.lit(float(n)), 1)
