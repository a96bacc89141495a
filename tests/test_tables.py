"""HTML table extraction — span-expansion goldens, nested/malformed
tolerance, a hypothesis grid round-trip, and the Spark operator surface."""

from hypothesis import given, settings
from hypothesis import strategies as st

from final_ocr_spark.extract.tables import (
    extract_tables_html,
    table_to_markdown,
)


def test_simple_table_with_header():
    ts = extract_tables_html(
        "<table><caption> Prices </caption>"
        "<tr><th>item</th><th>price</th></tr>"
        "<tr><td>apple</td><td>1.50</td></tr>"
        "<tr><td>pear</td><td>2.00</td></tr></table>"
    )
    assert len(ts) == 1
    t = ts[0]
    assert t["caption"] == "Prices"
    assert t["header"] == ["item", "price"]
    assert t["rows"] == [["apple", "1.50"], ["pear", "2.00"]]
    assert (t["n_rows"], t["n_cols"]) == (2, 2)


def test_mixed_th_td_first_row_is_not_header():
    t = extract_tables_html(
        "<table><tr><th>k</th><td>v</td></tr><tr><td>a</td><td>b</td></tr></table>"
    )[0]
    assert t["header"] is None
    assert t["rows"] == [["k", "v"], ["a", "b"]]


def test_colspan_and_rowspan_expand():
    t = extract_tables_html(
        "<table>"
        "<tr><td rowspan=2>r</td><td colspan=2>c</td></tr>"
        "<tr><td>x</td><td>y</td></tr>"
        "<tr><td>a</td><td>b</td><td>z</td></tr>"
        "</table>"
    )[0]
    assert t["rows"] == [
        ["r", "c", "c"],
        ["r", "x", "y"],
        ["a", "b", "z"],
    ]


def test_rowspan_trailing_column_fills():
    # the spanning cell is the LAST column; the next row has fewer cells and
    # the pending fill must still land
    t = extract_tables_html(
        "<table><tr><td>a</td><td rowspan=2>s</td></tr>"
        "<tr><td>b</td></tr></table>"
    )[0]
    assert t["rows"] == [["a", "s"], ["b", "s"]]


def test_nested_table_document_order_and_no_leak():
    ts = extract_tables_html(
        "<table><tr><td>outer-before"
        "<table><tr><td>inner</td></tr></table>"
        "</td><td>other</td></tr></table>"
    )
    assert len(ts) == 2
    assert ts[0]["rows"] == [["outer-before", "other"]]  # outer first
    assert ts[1]["rows"] == [["inner"]]


def test_malformed_unclosed_and_truncated():
    # no </td>/</tr>, document truncated mid-row: everything still lands
    ts = extract_tables_html(
        "<table><tr><td>a<td>b<tr><td>c<td>d"
    )
    assert ts[0]["rows"] == [["a", "b"], ["c", "d"]]
    # junk input never raises
    assert extract_tables_html("<table><tr><td><<<>>") != []
    assert extract_tables_html("no tables here") == []
    assert extract_tables_html("<table></table>") == []


def test_script_inside_cell_dropped_entities_decoded():
    t = extract_tables_html(
        "<table><tr><td>a &amp; b<script>var x=1;</script></td></tr></table>"
    )[0]
    assert t["rows"] == [["a & b"]]


def test_adversarial_span_caps():
    t = extract_tables_html(
        "<table><tr><td colspan=99999>w</td></tr></table>"
    )[0]
    assert t["n_cols"] == 50  # capped
    t2 = extract_tables_html(
        "<table><tr><td colspan=bogus rowspan=-3>w</td><td>x</td></tr></table>"
    )[0]
    assert t2["rows"] == [["w", "x"]]


def test_markdown_render():
    md = table_to_markdown(["a", "b"], [["1", "x|y"], ["2", ""]])
    assert md.splitlines() == [
        "| a | b |",
        "|---|---|",
        "| 1 | x\\|y |",
        "| 2 |  |",
    ]


_CELL = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("L", "N"),  # letters/digits: no markup collisions
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=60, deadline=None)
@given(
    grid=st.integers(1, 5).flatmap(
        lambda w: st.lists(
            st.lists(_CELL, min_size=w, max_size=w), min_size=1, max_size=6
        )
    )
)
def test_grid_roundtrip(grid):
    html = "<table>" + "".join(
        "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>" for row in grid
    ) + "</table>"
    ts = extract_tables_html(html)
    assert len(ts) == 1
    assert ts[0]["rows"] == grid
    assert ts[0]["header"] is None


def test_spark_operator(spark):
    import datetime

    html1 = (
        "<html><body><h1>Page</h1>"
        "<table><tr><th>k</th><th>v</th></tr>"
        "<tr><td>a</td><td>1</td></tr></table>"
        "<table><tr><td>solo</td></tr></table>"
        "</body></html>"
    ).encode()
    rows = [
        ("https://t.com/1", datetime.datetime(2026, 1, 1), html1),
        ("https://t.com/2", datetime.datetime(2026, 1, 2), b"<p>no tables</p>"),
        ("https://t.com/3", datetime.datetime(2026, 1, 3), None),
    ]
    pages = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")

    from final_ocr_spark.operators.tables import extract_tables

    out = extract_tables(pages, markdown=True).orderBy("url", "table_idx").collect()
    assert len(out) == 2
    assert out[0]["url"] == "https://t.com/1" and out[0]["table_idx"] == 0
    assert out[0]["header"] == ["k", "v"]
    assert out[0]["rows"] == [["a", "1"]]
    assert out[0]["markdown"].splitlines()[0] == "| k | v |"
    assert out[1]["table_idx"] == 1 and out[1]["rows"] == [["solo"]]

    # data-tables-only setting sheds the 1x1 layout grid
    strict = extract_tables(pages, min_rows=1, min_cols=2).collect()
    assert len(strict) == 1 and strict[0]["header"] == ["k", "v"]


def test_text_after_inner_table_dropped():
    # review-caught: docstring contract — trailing outer-cell text after a
    # nested table is dropped, never glued onto the pre-table text
    ts = extract_tables_html(
        "<table><tr><td>before"
        "<table><tr><td>inner</td></tr></table>"
        "after</td><td>other</td></tr></table>"
    )
    assert ts[0]["rows"] == [["before", "other"]]
    assert ts[1]["rows"] == [["inner"]]


def test_table_idx_is_document_order(spark):
    # review-caught: a filtered layout table still consumes its index
    import datetime

    html = (
        "<table><tr><td>layout</td></tr></table>"  # 1x1, filtered
        "<table><tr><th>k</th><th>v</th></tr>"
        "<tr><td>a</td><td>1</td></tr></table>"
    ).encode()
    pages = spark.createDataFrame(
        [("http://t.com/p", datetime.datetime(2026, 1, 1), html)],
        "url string, warc_ts timestamp, html binary",
    )
    from final_ocr_spark.operators.tables import extract_tables

    out = extract_tables(pages, min_rows=1, min_cols=2).collect()
    assert len(out) == 1 and out[0]["table_idx"] == 1  # second in doc order
