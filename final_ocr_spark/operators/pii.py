"""PII detection and redaction for webtext training-data pipelines
(the Dolma/RefinedWeb email/phone/IP masking pass).

Pure Column expressions — regexp_extract_all / regexp_replace run inside
whole-stage codegen on the JVM, no Python in the hot path, no shuffle.

Pattern notes: every pattern is RE2-safe (no backreferences, no
lookaround) so the same pattern string behaves identically under Java
regex (Spark) and RE2 (DuckDB oracle); alternations are pre-wrapped in
``(?:…)`` (see the bare-alternation splicing pitfall in PLANS.md).
Patterns are stored as plain strings and passed through the Python API
(``F.regexp_*`` with ``F.lit``), never through ``F.expr`` SQL strings
whose literals eat backslashes.

The reference repo redacts nothing (single-tenant OCR); this is the
privacy-hygiene layer its extraction output needs before training use.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered: earlier rules mask first (an email must not be half-eaten by the
# phone rule's digit runs)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+[0-9][0-9 ().-]{7,}[0-9]",
}

PII_TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "phone": "<PHONE>",
}


def pii_counts(text_col) -> dict[str, Column]:
    """Per-kind match counts (long), keys ``n_<kind>``."""
    return {
        f"n_{kind}": F.size(F.regexp_extract_all(text_col, F.lit(pat), 0)).cast("long")
        for kind, pat in PII_PATTERNS.items()
    }


def redact_pii(text_col) -> Column:
    """Text with every PII match replaced by its typed token, applying the
    rules in PII_PATTERNS order."""
    out = text_col
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, PII_TOKENS[kind])
    return out


def pii_profile(df, text_col: str = "text"):
    """df + n_email/n_ipv4/n_phone + redacted text column."""
    cols = [df["*"]]
    for name, c in pii_counts(F.col(text_col)).items():
        cols.append(c.alias(name))
    cols.append(redact_pii(F.col(text_col)).alias("text_redacted"))
    return df.select(*cols)
