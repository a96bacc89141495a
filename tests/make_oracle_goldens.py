"""Regenerate the committed golden row sets that back the VALUES-table
oracles for the non-SQL-expressible queries (q21 extraction, q26 image
features, q27 video frames).

These queries run over fully deterministic seeded synthetic inputs, so their
outputs are pure functions of the code — a committed golden IS their
correctness contract (the same role tests/golden/extracted_sample.json plays
for pytest, surfaced to the driver's oracle gate). Regenerate DELIBERATELY,
only when semantics change on purpose:

    python -m tests.make_oracle_goldens

The goldens are rendered into `SELECT ... FROM (VALUES ...)` SQL by
``__spark_entry__.oracle_sql`` so DuckDB serves them as an ordinary oracle.
"""

from __future__ import annotations

import json
import pathlib

GOLDEN_PATH = pathlib.Path(__file__).parent / "golden" / "oracle_values.json"
# q20's rows depend on the sf0.01 documents table — valid because the driver
# contract pins the correctness gate to sf=0.01; the other three run over
# seeded synthetic inputs and are sf-independent.
GOLDEN_QUERIES = ["q20_simhash_pairs", "q21_extract_pages",
                  "q26_image_features", "q27_video_frames"]


def main() -> None:
    import __spark_entry__ as entrymod
    from final_ocr_spark.session import get_spark

    spark = get_spark(app_name="make-oracle-goldens", master="local[8]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out: dict[str, dict] = {}
    for name in GOLDEN_QUERIES:
        df = qs[name](spark, "/root/testdata/sf0.01")
        cols = df.columns
        types = [f.dataType.simpleString() for f in df.schema.fields]
        rows = [[r[c] for c in cols] for r in df.collect()]
        out[name] = {"columns": cols, "types": types, "rows": rows}
        print(f"{name}: {len(rows)} rows, cols {cols}")
    GOLDEN_PATH.write_text(json.dumps(out, indent=1, ensure_ascii=False),
                           encoding="utf-8")
    print(f"wrote {GOLDEN_PATH}")
    spark.stop()


if __name__ == "__main__":
    main()
