"""Record-parsing scalar functions as declarative Column expressions.

The reference implements these as sequential regex cascades in Python
(SURVEY §2.5): invoice-number R1 (ocr.py:176-185), date R2/R3
(ocr.py:189-198, ocr2.py:299-319), section extraction G1/G3
(ocr.py:119-167), grand total R10 (ocr2.py:573-597). Here each cascade is a
``coalesce(nullif(regexp_extract(...)), ...)`` chain — Catalyst folds it into
one codegen stage and the first-match-wins short-circuit is preserved.

Patterns avoid lookaheads/backrefs so the same semantics hold in RE2-based
engines (the DuckDB oracle) and Java regex (Spark).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def first_match(col: Column, patterns: list[str], group: int = 1) -> Column:
    """First-match-wins pattern cascade (the reference's core idiom,
    ocr.py:182-185): try each regex in order, return the first non-empty
    capture, else null."""
    candidates = [
        F.nullif(F.regexp_extract(col, p, group), F.lit("")) for p in patterns
    ]
    return F.coalesce(*candidates) if len(candidates) > 1 else candidates[0]


# R1 — document/invoice id cascade (generalized: long digit runs / dashed ids)
ID_PATTERNS = [
    r"[Ii]nvoice\s+no[.:]?\s*(\d{6,})",
    r"\b(\d{8,})\b",
    r"\b(\d{2,4}-\d{2,4}-\d{2,4})\b",
]


def extract_id(col: Column) -> Column:
    return first_match(col, ID_PATTERNS)


# R2 — date-string cascade
DATE_PATTERNS = [
    r"\b(\d{4}-\d{2}-\d{2})\b",
    r"\b(\d{1,2}/\d{1,2}/\d{2,4})\b",
    r"\b(\d{1,2}-\d{1,2}-\d{2,4})\b",
]


def extract_date_str(col: Column) -> Column:
    return first_match(col, DATE_PATTERNS)


def normalize_date(col: Column) -> Column:
    """R3 — pinned first-format-wins order: d/M/yyyy, d-M-yyyy, M/d/yyyy,
    M-d-yyyy, then ISO. Bad parses yield null (try_to_date), matching the
    reference's strptime-cascade fallthrough (ocr2.py:303-319; the golden
    `04/13/2013 → 2013-04-13` proves day-first is tried before month-first)."""
    return F.coalesce(
        F.try_to_date(col, "d/M/yyyy"),
        F.try_to_date(col, "d-M-yyyy"),
        F.try_to_date(col, "M/d/yyyy"),
        F.try_to_date(col, "M-d-yyyy"),
        F.try_to_date(col, "yyyy-MM-dd"),
    )


def extract_section(col: Column, start_marker: str, end_marker: str | None = None) -> Column:
    """G1/G3 — marker-delimited section extract with fallback chain
    (ocr.py:119-167): strict both-markers regex first, then open-ended."""
    if end_marker:
        strict = F.regexp_extract(col, rf"{start_marker}(.*?){end_marker}", 1)
        loose = F.regexp_extract(col, rf"{start_marker}(.*)", 1)
        return F.coalesce(F.nullif(strict, F.lit("")), F.nullif(loose, F.lit("")))
    return F.nullif(F.regexp_extract(col, rf"{start_marker}(.*)", 1), F.lit(""))


# E4 — OCR-error canonicalization table (clean_text ocr.py:100-117 /
# _clean_text ocr2.py:195-227): fixed, table-driven substitutions so the
# rule set is pinned in one place. Order matters (first-listed applies first).
CANON_SUBSTITUTIONS: list[tuple[str, str]] = [
    ("Deil", "Dell"),
    ("De11", "Dell"),  # the reference's actual rule (ocr.py:105): digit 1s
    ("DeII", "Dell"),  # letter-I variant kept as well ('|'→'I' runs after the
    # Dell rules both here and in the reference, so the II form can occur)
    ("|", "I"),
    (" ", " "),
]


def canonicalize_text(col: Column) -> Column:
    """E4 — apply the pinned substitution table, then collapse runs of
    whitespace (the reference's '\\n\\n'→'\\n' generalized to one canonical
    rule)."""
    out = col
    for old, new in CANON_SUBSTITUTIONS:
        out = F.replace(out, F.lit(old), F.lit(new))
    return F.regexp_replace(F.trim(out), r"[ \t]+", " ")


# R10 — grand-total cascade (ocr2.py:573-597)
TOTAL_PATTERNS = [
    r"[Gg]rand\s+[Tt]otal[:\s]*\$?\s*([0-9][0-9.,]*)",
    r"[Tt]otal\s+[Aa]mount[:\s]*\$?\s*([0-9][0-9.,]*)",
    r"[Aa]mount\s+[Dd]ue[:\s]*\$?\s*([0-9][0-9.,]*)",
    r"[Tt]otal[:\s]*\$?\s*([0-9][0-9.,]*)",
]


def extract_total_amount(col: Column) -> Column:
    return first_match(col, TOTAL_PATTERNS)


# R8 — variant-B field sniffers (ocr2.py:381-393 phone; ocr2.py:507-549
# discount). Patterns are RE2-compatible (no lookaheads) so the DuckDB
# oracle can run the identical regex.
# capture class uses a literal space, NOT \s — \s matches \n and would let
# the capture swallow the newline into the next line (trim strips spaces only)
PHONE_PATTERN = r"(?:Phone|Tel|Mobile)[: ]*([+0-9][+0-9 \-()]*)"
DISCOUNT_PATTERN = r"(?i)discount\s*[$€]?\s*([0-9]+[.,]?[0-9]*)"


def extract_phone(col: Column) -> Column:
    """R8 — phone-number sniffing (ocr2.py:381-385: first line matching
    Phone/Tel/Mobile, captured run of digits/+/-/()/space, stripped)."""
    return F.nullif(F.trim(F.regexp_extract(col, PHONE_PATTERN, 1)), F.lit(""))


def extract_discount(col: Column) -> Column:
    """R8 — per-item discount amount (ocr2.py:546-549: `discount $ 12.50`,
    case-insensitive; absent → null, callers coalesce to 0 where the
    reference did)."""
    return F.nullif(F.regexp_extract(col, DISCOUNT_PATTERN, 1), F.lit(""))


def clean_product_name(col: Column) -> Column:
    """R9 — product-name cleanup (ocr2.py:553-565): drop `<number> <unit>`
    tokens (each/pc/pcs/unit(s)/currency/%), drop EVERYTHING from the first
    price/amount/total/worth/vat/tax/discount keyword onward (the reference's
    keyword-tail strip), then collapse whitespace. Also strips the bare
    trailing unit word (ocr.py:314)."""
    # 'pc' before 'pcs' is the REFERENCE's alternation order (ocr2.py:556);
    # regex alternation is leftmost-first in Python AND Java, so '3 pcs'
    # leaves a stray 's' in both engines — faithful quirk, kept untouched
    # deliberately (byte parity with the reference beats tidiness here).
    out = F.regexp_replace(col, r"[0-9]+[.,]?[0-9]*\s*(?:each|pc|pcs|units?|€|\$|%)", "")
    out = F.regexp_replace(out, r"(?i)(?:price|amount|total|worth|vat|tax|discount).*", "")
    out = F.regexp_replace(out, r"(?i)\s+(?:each|pc|pcs|unit|units)\s*$", "")
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def extract_party(col: Column, role: str) -> dict[str, Column]:
    """R4 — party (seller/client) extraction (parse_party_info ocr.py:202-257):
    bounded section after the role marker; first non-empty line is the name,
    remaining lines joined are the address; tax id by its own cascade."""
    section = F.regexp_extract(col, rf"(?s){role}[:\s]*\n?(.*?)(?:\n\s*\n|Tax Id|$)", 1)
    lines = F.filter(F.split(section, r"\n"), lambda x: F.trim(x) != "")
    name = F.trim(F.element_at(lines, 1))
    # remaining lines minus ONLY THE FIRST phone-matching line are the
    # address — the reference (ocr2.py:389-393) does lines.remove(line);
    # break, so a later address line that merely LOOKS phone-like
    # ('Mobile 12 Park Rd') must survive. (midx referenced inside the
    # lambda re-evaluates per element — party sections are <10 lines.)
    rest = F.slice(lines, 2, 100)
    midx = F.array_min(
        F.transform(
            rest,
            lambda x, i: F.when(x.rlike(PHONE_PATTERN), i).otherwise(
                F.lit(None).cast("integer")
            ),
        )
    )
    address = F.trim(
        F.array_join(
            F.filter(rest, lambda x, i: midx.isNull() | (i != midx)), " "
        )
    )
    tax_id = F.nullif(
        F.regexp_extract(col, rf"(?s){role}.*?Tax Id[:\s]*([0-9][0-9\-]+)", 1),
        F.lit(""),
    )
    return {
        "name": F.nullif(name, F.lit("")),
        "address": F.nullif(address, F.lit("")),
        "tax_id": tax_id,
        # R8 variant-B field: seller phone (ocr2.py:381-385), scoped to the
        # party section so a client phone never bleeds into the seller's
        "phone": extract_phone(section),
    }
