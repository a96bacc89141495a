"""HTML table extraction: tolerant parse → normalized rectangular grids.

Main-content extraction (extract/html_main.py) deliberately linearizes
tables into text blocks; this module is the structured complement — the
piece a training-data pipeline uses to turn the web's `<table>` markup into
(header, rows) grids for table-QA corpora, markdown rendering, or record
mining. Same parsing stance as the extractor: stdlib ``html.parser``
streaming parse (tolerant of unclosed tags, truncation, junk), zero
third-party deps, deterministic.

Grid semantics (the part browsers do silently):

* ``colspan``/``rowspan`` are expanded — a spanning cell's text is
  replicated into every grid position it covers, so every output row has
  equal length (downstream code never sees a ragged or holey grid).
  Spans are capped (50 cols / 200 rows) against adversarial markup.
* implicit closes: a ``<td>`` opened while a cell is open closes the cell;
  ``<tr>`` closes the previous row; ``</table>`` flushes everything —
  matching what the HTML5 tree builder does for the overwhelmingly common
  malformed cases.
* nested tables become SEPARATE output tables (document order, outer
  first); their text does not leak into the outer cell (outer-cell text
  written BEFORE the inner table is kept; trailing text after it is
  dropped — the rare case browsers hoist out of the table entirely).
* a table's ``header`` is its first grid row iff every raw cell in that
  row was ``<th>``; otherwise header is None and the row stays in
  ``rows``. ``<caption>`` text is captured when present.
* script/style content inside cells is dropped; cell text gets the same
  canonical whitespace collapse as extracted blocks (html_main._Block).

Reference provenance: the reference's table recovery is positional line
parsing of OCR'd invoice items (reference ocr.py:258-320); this is the DOM
analog for born-digital pages, where the grid is explicit markup.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

_MAX_COLSPAN = 50
_MAX_ROWSPAN = 200
_MAX_COLS = 500
_MAX_ROWS = 10_000

_CELL_TAGS = ("td", "th")
_SKIP_TAGS = ("script", "style", "template")


def _span(attrs: dict, name: str, cap: int) -> int:
    raw = attrs.get(name)
    if raw is None:
        return 1
    try:
        v = int(raw.strip())
    except (ValueError, AttributeError):
        return 1
    if v < 1:
        # rowspan=0 means "to the end of the rowgroup" per spec; cap it
        return cap if (name == "rowspan" and v == 0) else 1
    return min(v, cap)


@dataclass
class _TableBuilder:
    """Grid assembly for ONE table level; owns its active cell so nested
    tables can't clobber an outer cell in progress."""

    caption_pieces: list[str] = field(default_factory=list)
    grid: list[list[str]] = field(default_factory=list)
    row_all_th: list[bool] = field(default_factory=list)
    # active cell: [pieces, colspan, rowspan, is_th] | None
    cell: list | None = None
    # set when a nested table closed inside the open cell: trailing text
    # after the inner table is dropped (the docstring contract — browsers
    # hoist it out of the table entirely; gluing it onto the pre-table text
    # would corrupt the cell: 'before'+'after' → 'beforeafter')
    cell_frozen: bool = False
    # pending rowspan fills: col -> [text, rows_remaining]
    _pending: dict[int, list] = field(default_factory=dict)
    _row: list[str] | None = None
    _row_col: int = 0
    _row_has_td: bool = False
    _row_has_cell: bool = False

    # -- cell lifecycle ---------------------------------------------------
    def open_cell(self, colspan: int, rowspan: int, is_th: bool) -> None:
        self.close_cell()
        self.cell = [[], colspan, rowspan, is_th]
        self.cell_frozen = False

    def close_cell(self) -> None:
        if self.cell is None:
            return
        pieces, colspan, rowspan, is_th = self.cell
        self.cell = None
        text = " ".join("".join(pieces).split())
        self._place_cell(text, colspan, rowspan, is_th)

    # -- row/grid assembly --------------------------------------------------
    def open_row(self) -> None:
        self.close_cell()
        self.close_row()
        self._row = []
        self._row_col = 0
        self._row_has_td = False
        self._row_has_cell = False

    def _fill_pending(self) -> None:
        # consume rowspan carries that land at the current column
        while self._row_col in self._pending and self._row_col < _MAX_COLS:
            text, left = self._pending[self._row_col]
            self._row.append(text)
            if left <= 1:
                del self._pending[self._row_col]
            else:
                self._pending[self._row_col][1] = left - 1
            self._row_col += 1

    def _place_cell(self, text: str, colspan: int, rowspan: int,
                    is_th: bool) -> None:
        if self._row is None:  # cell outside any <tr>: implicit row
            self.open_row()
        self._fill_pending()
        for _ in range(colspan):
            if self._row_col >= _MAX_COLS:
                break
            self._row.append(text)
            if rowspan > 1:
                self._pending[self._row_col] = [text, rowspan - 1]
            self._row_col += 1
        self._row_has_cell = True
        if not is_th:
            self._row_has_td = True

    def close_row(self) -> None:
        if self._row is None:
            return
        self._fill_pending()
        row, had_cell, had_td = self._row, self._row_has_cell, self._row_has_td
        self._row = None
        if had_cell and len(self.grid) < _MAX_ROWS:
            self.grid.append(row)
            self.row_all_th.append(not had_td)

    def finish(self) -> dict | None:
        self.close_cell()
        self.close_row()
        if not self.grid:
            return None
        width = max(len(r) for r in self.grid)
        rows = [r + [""] * (width - len(r)) for r in self.grid]
        header = None
        if self.row_all_th and self.row_all_th[0]:
            header = rows[0]
            rows = rows[1:]
        caption = " ".join("".join(self.caption_pieces).split()) or None
        return {
            "caption": caption,
            "header": header,
            "rows": rows,
            "n_rows": len(rows),
            "n_cols": width,
        }


class _TableParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tables: list[dict] = []
        self._stack: list[_TableBuilder] = []
        self._caption_depth = 0
        self._skip_depth = 0
        # document-order slots: outer table must precede its inner tables
        self._order_slots: list[int] = []

    def _close_table(self) -> None:
        if not self._stack:
            return
        t = self._stack.pop().finish()
        slot = self._order_slots.pop()
        if t is not None:
            self.tables.insert(slot, t)
        if self._stack and self._stack[-1].cell is not None:
            self._stack[-1].cell_frozen = True  # drop text after inner table

    # -- HTMLParser hooks ----------------------------------------------------
    def handle_starttag(self, tag: str, attrs_list) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "table":
            # a table opening inside an open cell: the outer cell pauses
            # (its accumulated text is kept; inner content is the inner
            # table's, routed by stack top)
            self._stack.append(_TableBuilder())
            self._order_slots.append(len(self.tables))
            return
        if not self._stack:
            return
        top = self._stack[-1]
        if tag == "tr":
            top.open_row()
        elif tag in _CELL_TAGS:
            attrs = dict(attrs_list)
            top.open_cell(
                _span(attrs, "colspan", _MAX_COLSPAN),
                _span(attrs, "rowspan", _MAX_ROWSPAN),
                tag == "th",
            )
        elif tag == "caption":
            self._caption_depth += 1
        elif tag == "br":
            if top.cell is not None:
                top.cell[0].append(" ")

    def handle_startendtag(self, tag: str, attrs_list) -> None:
        if (tag == "br" and not self._skip_depth and self._stack
                and self._stack[-1].cell is not None):
            self._stack[-1].cell[0].append(" ")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if self._skip_depth or not self._stack:
            return
        if tag == "table":
            self._close_table()
        elif tag == "tr":
            self._stack[-1].close_cell()
            self._stack[-1].close_row()
        elif tag in _CELL_TAGS:
            self._stack[-1].close_cell()
        elif tag == "caption":
            if self._caption_depth:
                self._caption_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth or not self._stack:
            return
        top = self._stack[-1]
        if self._caption_depth:
            top.caption_pieces.append(data)
        elif top.cell is not None and not top.cell_frozen:
            top.cell[0].append(data)

    def close(self) -> None:  # truncated docs: flush every open level
        super().close()
        while self._stack:
            self._close_table()


def extract_tables_html(html_text: str) -> list[dict]:
    """Parse HTML text → list of table dicts in document order (outer
    before nested inner). Each dict: caption (str|None), header
    (list[str]|None), rows (list[list[str]], rectangular), n_rows, n_cols.
    Tolerant of malformed/truncated markup; never raises on string input."""
    p = _TableParser()
    try:
        p.feed(html_text)
        p.close()
    except Exception:  # stdlib parser edge (rare): keep what was built
        while p._stack:
            p._close_table()
    return p.tables


def table_to_markdown(header: list[str] | None, rows: list[list[str]]) -> str:
    """Render one extracted grid as GitHub-flavored markdown (the common
    'tables into LLM training text' form). Pipes in cells are escaped."""

    def esc(c: str) -> str:
        return (c or "").replace("|", "\\|")

    width = max([len(r) for r in rows] + [len(header) if header else 0, 1])
    out = []
    head = header if header is not None else [""] * width
    head = list(head) + [""] * (width - len(head))
    out.append("| " + " | ".join(esc(c) for c in head) + " |")
    out.append("|" + "---|" * width)
    for r in rows:
        r = list(r) + [""] * (width - len(r))
        out.append("| " + " | ".join(esc(c) for c in r) + " |")
    return "\n".join(out)
