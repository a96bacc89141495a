"""Spark operator: pages → one row per extracted HTML table.

Same physical shape as the flagship extractor (operators/extract_pages.py):
a single column-pruned scan feeding one ``mapInPandas`` stage (Arrow
batches, 1→N rows — one output row per table found), with charset sniffing
shared with the main extraction path (extract/metadata.py:decode_html).
Nothing shuffles: table extraction is embarrassingly row-parallel; callers
join/dedup the slim structured output downstream if they need to.

Output schema:
  url, warc_ts (passthrough), table_idx (document order within the page),
  caption, header (array<string> | null), rows (array<array<string>>,
  rectangular), n_rows, n_cols [, markdown when ``markdown=True``].

At 100 TB this stays the right plan: the html blob never moves (it is
consumed inside the scan's python stage), and the output rows carry only
the table grids — typically a few percent of page bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BASE_SCHEMA = (
    "url string, warc_ts timestamp, table_idx int, caption string, "
    "header array<string>, rows array<array<string>>, "
    "n_rows int, n_cols int"
)


def extract_tables(
    pages: DataFrame,
    *,
    min_rows: int = 1,
    min_cols: int = 1,
    max_tables_per_page: int = 200,
    markdown: bool = False,
) -> DataFrame:
    """pages(url[, warc_ts], html) → table rows (see module docstring).

    ``min_rows``/``min_cols`` drop degenerate grids inside the UDF (before
    they ever materialize as output rows) — ``min_rows=2, min_cols=2`` is
    the usual "data tables only" setting that sheds single-cell layout
    scaffolding. ``markdown=True`` adds a GitHub-markdown rendering column
    (the grids-into-training-text form). Pages with null/undecodable html
    simply produce no rows.
    """
    has_ts = "warc_ts" in pages.columns
    cols = ["url", "warc_ts", "html"] if has_ts else ["url", "html"]
    df = pages.select(*cols).filter(F.col("html").isNotNull())
    schema = _BASE_SCHEMA + (", markdown string" if markdown else "")
    out_cols = [f.split(" ")[0] for f in schema.split(", ")]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # worker-side imports: parser + regexes load once per worker process
        from final_ocr_spark.extract.metadata import decode_html
        from final_ocr_spark.extract.tables import (
            extract_tables_html,
            table_to_markdown,
        )

        for pdf in it:
            urls = pdf["url"].tolist()
            n = len(urls)
            tss = pdf["warc_ts"].tolist() if "warc_ts" in pdf else [None] * n
            htmls = pdf["html"].tolist()
            out: dict[str, list] = {name: [] for name in out_cols}
            for i in range(n):
                raw = htmls[i]
                if raw is None:
                    continue
                text, _charset, _src = decode_html(bytes(raw))
                emitted = 0
                # table_idx is DOCUMENT order over all parsed tables — a
                # filtered layout grid still consumes its index, so idx
                # stays a stable provenance pointer across different
                # min_rows/min_cols settings (review-caught)
                for idx, t in enumerate(extract_tables_html(text)):
                    if t["n_rows"] < min_rows or t["n_cols"] < min_cols:
                        continue
                    if emitted >= max_tables_per_page:
                        break
                    emitted += 1
                    out["url"].append(urls[i])
                    out["warc_ts"].append(tss[i])
                    out["table_idx"].append(idx)
                    out["caption"].append(t["caption"])
                    out["header"].append(t["header"])
                    out["rows"].append(t["rows"])
                    out["n_rows"].append(t["n_rows"])
                    out["n_cols"].append(t["n_cols"])
                    if markdown:
                        out["markdown"].append(
                            table_to_markdown(t["header"], t["rows"])
                        )
            if out["url"]:  # empty frames carry wrong dtypes (float64
                # columns can't Arrow-cast to timestamp) — yield nothing
                yield pd.DataFrame(out, columns=out_cols)

    return df.mapInPandas(_batches, schema=schema)
