"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the same sf, compare row count,
column names, and order-insensitive values.

Usage: python -m tests.oracle_harness [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style value canonicalization: strip float noise
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def run(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None) -> bool:
    import duckdb

    import __spark_entry__ as entrymod
    from final_ocr_spark.session import get_spark

    # the DRIVER's oracle harness uses a default Spark 4 session — ANSI ON —
    # so replicate that here (round 1's ansi=false harness masked two
    # ARITHMETIC_OVERFLOW crashes the driver then hit)
    spark = get_spark(
        master="local[8]",
        shuffle_partitions=16,
        extra_conf={"spark.sql.ansi.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    ok_all = True
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = sdf.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            ok_all = False
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            ok_all = False
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns {sorted(s_cols)} vs {sorted(d_cols)}")
            ok_all = False
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount {len(s_rows)} vs {len(d_rows)}")
            ok_all = False
            continue
        sc = _rows_canon(s_cols, [list(r) for r in s_rows])
        dc = _rows_canon(d_cols, d_rows)
        if sc != dc:
            diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs: {diffs}")
            ok_all = False
            continue
        print(f"ok   {name}: {len(s_rows)} rows match oracle")
    spark.stop()
    return ok_all


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a] or None
    sys.exit(0 if run(sf, only) else 1)
