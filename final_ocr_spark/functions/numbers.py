"""R5 — locale-aware number normalization, the engine's core scalar function.

The reference has four near-duplicate implementations (convert_number
ocr.py:891-925; parse_item_line inline ocr.py:376-421; clean_number
ocr2.py:187-243; _parse_number ocr2.py:383-413) — we pin ONE semantics:

1. strip everything but ``[0-9.,-]``
2. both separators present → the *later* one is the decimal mark
   (``1.234,56`` → EU → ``1234.56``; ``1,234.56`` → US → ``1234.56``)
3. comma only → decimal iff exactly one comma with 1-2 trailing digits
   (``37,75`` → ``37.75``), else thousands (``1,234`` → ``1234``)
4. dot only → decimal iff one dot with 1-2 trailing digits, else thousands
   (``1.234`` → EU thousands → ``1234``)
5. unparseable → null (callers coalesce to 0.0 where the reference did,
   ocr2.py:241)

Expressed entirely as built-in Column functions so (a) it runs in
WholeStageCodegen and (b) the identical CASE logic is writable in ANSI SQL for
the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_number(col: Column) -> Column:
    s = F.regexp_replace(col, r"[^0-9.,\-]", "")
    has_dot = F.instr(s, ".") > 0
    has_comma = F.instr(s, ",") > 0
    # position of LAST occurrence: length - position in reversed string
    last_dot = F.length(s) - F.instr(F.reverse(s), ".") + 1
    last_comma = F.length(s) - F.instr(F.reverse(s), ",") + 1

    # both: later separator is the decimal mark
    us_both = F.regexp_replace(s, ",", "")  # 1,234.56 -> 1234.56
    eu_both = F.regexp_replace(F.regexp_replace(s, r"\.", ""), ",", ".")

    one_comma_decimal = s.rlike(r"^[^,]*,[0-9]{1,2}$")
    # dot-only is thousands ONLY in the strict grouped shape (1.234 / 1.234.567);
    # anything else — incl. float64 artifacts like 762.4400000000001 — is decimal
    dot_thousands = s.rlike(r"^-?[0-9]{1,3}(\.[0-9]{3})+$")

    cleaned = (
        F.when(has_dot & has_comma, F.when(last_dot > last_comma, us_both).otherwise(eu_both))
        .when(has_comma, F.when(one_comma_decimal, F.regexp_replace(s, ",", ".")).otherwise(F.regexp_replace(s, ",", "")))
        .when(has_dot, F.when(dot_thousands, F.regexp_replace(s, r"\.", "")).otherwise(s))
        .otherwise(s)
    )
    return cleaned.try_cast("double")


def normalize_number_sql(expr: str) -> str:
    """The exact same semantics as :func:`normalize_number`, rendered as ANSI
    SQL for the DuckDB oracle (regexp_replace needs the 'g' flag there)."""
    s = f"regexp_replace({expr}, '[^0-9.,-]', '', 'g')"
    return f"""
    try_cast(
      CASE
        WHEN strpos({s}, '.') > 0 AND strpos({s}, ',') > 0 THEN
          CASE WHEN (length({s}) - strpos(reverse({s}), '.')) >
                    (length({s}) - strpos(reverse({s}), ','))
               THEN regexp_replace({s}, ',', '', 'g')
               ELSE replace(regexp_replace({s}, '\\.', '', 'g'), ',', '.')
          END
        WHEN strpos({s}, ',') > 0 THEN
          CASE WHEN regexp_matches({s}, '^[^,]*,[0-9]{{1,2}}$')
               THEN replace({s}, ',', '.')
               ELSE regexp_replace({s}, ',', '', 'g')
          END
        WHEN strpos({s}, '.') > 0 THEN
          CASE WHEN regexp_matches({s}, '^-?[0-9]{{1,3}}(\\.[0-9]{{3}})+$')
               THEN regexp_replace({s}, '\\.', '', 'g')
               ELSE {s}
          END
        ELSE {s}
      END AS double)
    """.strip()
