"""Minimal xlsx writer — stdlib only (SURVEY S4/S5 Excel sinks).

The reference ships .xlsx report files (save_to_excel ocr.py:1153-1209:
header/items/summary stacked on one 'Invoice' sheet with auto-fit column
widths; the ocr2 variant writes 'Invoices' + 'Items' sheets). openpyxl is
not installed in this container, but xlsx is just a zip of XML parts, so a
~100-line writer closes the format gap with zero dependencies.

Scope discipline: these are HUMAN-FACING REPORT artifacts — bounded,
driver-side by design (exactly like the reference's per-run report files).
The DATA path stays parquet/JSON (sinks.py); never route a corpus through
here. ``df_to_rows`` caps collection to guard against misuse.

Cells: numbers are written as native numeric cells, everything else as
inline strings (no sharedStrings table needed); formulas are never emitted.
"""

from __future__ import annotations

import zipfile
import re as _re

from xml.sax.saxutils import escape, quoteattr

# XML 1.0 cannot represent most C0 control chars at all (even escaped);
# OCR text routinely contains \x0c form feeds — encode them the way Excel
# itself does (_x000C_-style) so the workbook stays openable.
_XML_ILLEGAL = _re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")


def _xml_text(s: str) -> str:
    return escape(_XML_ILLEGAL.sub(lambda m: f"_x{ord(m.group()):04X}_", s))

from pyspark.sql import DataFrame

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>{sheets}</sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
{rels}
</Relationships>"""


def _col_ref(idx: int) -> str:
    """0-based column index → A1-style letters."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):  # before int: bool is an int subclass
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return (
        f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
        f"{_xml_text(str(value))}</t></is></c>"
    )


def _sheet_xml(rows: list[list]) -> str:
    # auto-fit widths (the reference's ocr.py:1181-1207 presentation rule):
    # width ≈ longest rendered value per column + padding
    n_cols = max((len(r) for r in rows), default=0)
    widths = [0] * n_cols
    for row in rows:
        for ci, v in enumerate(row):
            if v is not None:
                widths[ci] = max(widths[ci], len(str(v)))
    cols = "".join(
        f'<col min="{i+1}" max="{i+1}" width="{min(w + 2, 80)}" customWidth="1"/>'
        for i, w in enumerate(widths)
    )
    body = []
    for ri, row in enumerate(rows, start=1):
        cells = "".join(
            _cell_xml(f"{_col_ref(ci)}{ri}", v) for ci, v in enumerate(row)
        )
        body.append(f'<row r="{ri}">{cells}</row>')
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<cols>{cols}</cols><sheetData>{''.join(body)}</sheetData></worksheet>"
    )


def write_xlsx(path: str, sheets: dict[str, list[list]]) -> None:
    """Write ``{sheet_name: rows}`` as a real .xlsx (zip of XML parts)."""
    if not sheets:
        raise ValueError("at least one sheet required")
    names = list(sheets)
    sheet_tags = "".join(
        f'<sheet name={quoteattr(n)} sheetId="{i+1}" r:id="rId{i+1}"/>'
        for i, n in enumerate(names)
    )
    rels = "".join(
        f'<Relationship Id="rId{i+1}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        f'Target="worksheets/sheet{i+1}.xml"/>'
        for i in range(len(names))
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i+1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(len(names))
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES.format(sheet_overrides=overrides))
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK.format(sheets=sheet_tags))
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS.format(rels=rels))
        for i, n in enumerate(names):
            z.writestr(f"xl/worksheets/sheet{i+1}.xml", _sheet_xml(sheets[n]))


def df_to_rows(df: DataFrame, max_rows: int = 100_000) -> list[list]:
    """Header row + values, driver-side. Hard cap: report sinks are for
    bounded human-facing artifacts, never the corpus (use sinks.py)."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"report sink refused: >{max_rows} rows — route bulk data "
            "through the parquet/JSON sinks (final_ocr_spark.sources.sinks)"
        )
    return [list(df.columns)] + [list(r) for r in rows]


def write_invoice_workbook(
    path: str, header: DataFrame, items: DataFrame, summary: DataFrame,
) -> None:
    """S4 (ocr.py:1153-1209): header / items / summary stacked on ONE sheet
    named 'Invoice', one blank row between sections, section-title rows."""
    rows: list[list] = []
    for title, df in (("Header", header), ("Items", items), ("Summary", summary)):
        rows.append([title])
        rows.extend(df_to_rows(df))
        rows.append([])
    write_xlsx(path, {"Invoice": rows[:-1]})


def write_two_sheet_workbook(path: str, invoices: DataFrame, items: DataFrame) -> None:
    """S5 (ocr2.py:677-689): 'Invoices' + 'Items' sheets."""
    write_xlsx(path, {"Invoices": df_to_rows(invoices), "Items": df_to_rows(items)})
