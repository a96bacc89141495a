"""Data-skipping tests (catalog manifest stats + predicate file pruning).

The load-bearing invariant is DIFFERENTIAL: for any predicate,
``catalog.read(where=w)`` returns exactly the rows of a full scan +
``filter(w)`` — pruning may only change how many files are opened, never
the result. A seeded fuzz pins that over random predicates, and targeted
tests pin the traps found while probing footers (NaN-blind float bounds,
all-null files, truncated string maxima, stat-less legacy manifests).
"""

from __future__ import annotations

import datetime as dt
import math
import random

import pytest

from final_ocr_spark.sources import datafilter as dfil
from final_ocr_spark.sources.catalog import SnapshotCatalog
from final_ocr_spark.sources.datafilter import (
    _trunc_max,
    collect_file_stats,
    file_may_match,
    parse_conjuncts,
)


@pytest.fixture()
def cat(tmp_path):
    return SnapshotCatalog(str(tmp_path / "warehouse"))


# ---------------------------------------------------------------------------
# parser unit tests (pure python)
# ---------------------------------------------------------------------------

def test_parse_basic_conjuncts():
    cs = parse_conjuncts(
        "n_chars >= 100 AND lang = 'en' AND host BETWEEN 'a' AND 'f' "
        "AND src IN ('a','b') AND x IS NOT NULL"
    )
    assert [c["op"] for c in cs] == [">=", "=", "between", "in", "notnull"]
    assert cs[1]["lit"] == ("str", "en")


def test_parse_flipped_and_typed_literals():
    assert parse_conjuncts("100 <= n") == [
        {"op": ">=", "col": "n", "lit": ("num", 100)}
    ]
    (c,) = parse_conjuncts("d >= DATE '2024-01-02'")
    assert c == {"op": ">=", "col": "d", "lit": ("str", "2024-01-02")}
    (c,) = parse_conjuncts("s = 'it''s'")
    assert c["lit"] == ("str", "it's")


def test_parse_unprunable_shapes_yield_nothing():
    # OR, parens, functions, col-to-col, NOT — all conservatively skipped
    assert parse_conjuncts("a = 1 OR b = 2") == []
    assert parse_conjuncts("f(a) = 1") == []
    assert parse_conjuncts("a = b") == []
    assert parse_conjuncts("NOT a = 1") == []
    assert parse_conjuncts("a NOT BETWEEN 1 AND 2") == []
    # ...but an understood conjunct beside an opaque one still prunes
    assert parse_conjuncts("(a = 1 OR c = 2) AND b = 3") == [
        {"op": "=", "col": "b", "lit": ("num", 3)}
    ]
    # BETWEEN's AND must not split the conjunct list
    cs = parse_conjuncts("a BETWEEN 1 AND 5 AND b = 2")
    assert [c["op"] for c in cs] == ["between", "="]


def test_trunc_max_is_upper_bound():
    s = "x" * 100
    t = _trunc_max(s)
    assert len(t) <= dfil.TRUNCATE_LEN
    assert t > s  # bumped prefix beats every string sharing it
    assert t > s[: dfil.TRUNCATE_LEN] + "\U0010FFFF" * 10
    assert _trunc_max("short") == "short"


def test_bound_checks():
    fe = {"rows": 10, "stats": {"n": {"min": 5, "max": 50, "nulls": 2}}}
    fam = {"n": "int"}

    def may(w):
        return file_may_match(fe, parse_conjuncts(w), fam, True)

    assert not may("n > 50")
    assert may("n >= 50")
    assert not may("n = 3")
    assert may("n = 5")
    assert not may("n BETWEEN 51 AND 99")
    assert may("n BETWEEN 50 AND 99")
    assert not may("n IN (1, 2, 60)")
    assert may("n IN (1, 25)")
    assert may("n IS NULL")  # nulls=2
    assert not file_may_match(
        {"rows": 10, "stats": {"n": {"min": 1, "max": 9, "nulls": 0}}},
        parse_conjuncts("n IS NULL"), fam, True)
    # all-null file: comparisons can never match, IS NULL can
    allnull = {"rows": 3, "stats": {"n": {"min": None, "max": None, "nulls": 3}}}
    assert not file_may_match(allnull, parse_conjuncts("n = 1"), fam, True)
    assert not file_may_match(allnull, parse_conjuncts("n IS NOT NULL"), fam, True)
    assert file_may_match(allnull, parse_conjuncts("n IS NULL"), fam, True)


def test_float_nan_satisfiable_ops_never_prune():
    # footer min/max are NaN-blind and Spark orders NaN above everything:
    # >, >=, != must not prune float columns; <, <=, =, IN, BETWEEN may
    fe = {"rows": 3, "stats": {"f": {"min": 1.0, "max": 3.0, "nulls": 0}}}
    fam = {"f": "float"}

    def may(w):
        return file_may_match(fe, parse_conjuncts(w), fam, True)

    assert may("f > 100.0") and may("f >= 100.0") and may("f != 2.0")
    assert not may("f < 1.0")
    assert not may("f = 9.0")
    assert not may("f BETWEEN 4.0 AND 9.0")


def test_missing_stats_and_unknown_columns_keep_file():
    legacy = {"path": "data/x/p.parquet", "bytes": 10}  # pre-stats manifest
    assert file_may_match(legacy, parse_conjuncts("n = 1"), {"n": "int"}, True)
    fe = {"rows": 5, "stats": {"n": {"min": 1, "max": 2, "nulls": 0}}}
    assert file_may_match(fe, parse_conjuncts("other = 99"), {"n": "int"}, True)
    # un-coercible literal: keep
    assert file_may_match(fe, parse_conjuncts("n = 'abc'"), {"n": "int"}, True)


def test_timestamp_pruning_gated_on_utc():
    fe = {"rows": 5, "stats": {"ts": {"min": "2024-01-01 00:00:00",
                                      "max": "2024-01-02 00:00:00", "nulls": 0}}}
    fam = {"ts": "ts"}
    w = parse_conjuncts("ts > TIMESTAMP '2025-01-01 00:00:00'")
    assert not file_may_match(fe, w, fam, True)
    assert file_may_match(fe, w, fam, False)  # non-UTC session: no pruning


# ---------------------------------------------------------------------------
# footer stats collection
# ---------------------------------------------------------------------------

def test_collect_file_stats_footer(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({
        "i": pa.array([3, 1, None], pa.int64()),
        "s": pa.array(["b", "a" * 200, None]),
        "d": pa.array([dt.date(2020, 1, 2), None, dt.date(2021, 3, 4)], pa.date32()),
        "f": pa.array([1.5, -2.25, None], pa.float64()),
        "allnull": pa.array([None, None, None], pa.string()),
        "arr": pa.array([[1], [2], [3]], pa.list_(pa.int64())),
    })
    p = tmp_path / "x.parquet"
    pq.write_table(t, p)
    out = collect_file_stats(str(p))
    assert out["rows"] == 3
    st = out["stats"]
    assert st["i"] == {"min": 1, "max": 3, "nulls": 1}
    assert st["f"] == {"min": -2.25, "max": 1.5, "nulls": 1}
    assert st["d"]["min"] == "2020-01-02" and st["d"]["nulls"] == 1
    # long string max truncated but still an upper bound
    assert len(st["s"]["max"]) <= dfil.TRUNCATE_LEN and st["s"]["max"] > "a" * 200
    assert st["s"]["min"] == "a" * dfil.TRUNCATE_LEN  # truncated lower bound
    assert st["allnull"] == {"min": None, "max": None, "nulls": 3}
    assert "arr" not in st  # nested leaves skipped


# ---------------------------------------------------------------------------
# end-to-end through the catalog (Spark)
# ---------------------------------------------------------------------------

def _mk_table(spark, cat, n=400):
    rows = [
        (i,
         f"host{i // 40:02d}.example.com",
         float(i) / 7.0,
         dt.date(2024, 1, 1) + dt.timedelta(days=i % 90),
         None if i % 11 == 0 else f"lang{i % 5}")
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id bigint, host string, score double, d date, lang string")
    cat.write(df, "pages", cluster_by=["id"], cluster_files=8)
    return df


def test_cluster_by_prunes_and_matches_full_scan(spark, cat):
    _mk_table(spark, cat)
    plan = cat.plan_files(spark, "pages", "id BETWEEN 100 AND 120")
    assert plan["files_total"] >= 4
    assert plan["files_scanned"] < plan["files_total"]
    assert plan["files_skipped"] >= 1

    pruned = cat.read(spark, "pages", where="id BETWEEN 100 AND 120")
    full = cat.read(spark, "pages").filter("id BETWEEN 100 AND 120")
    assert sorted(pruned.collect()) == sorted(full.collect())
    # the pruned scan really opens fewer files
    assert len(set(pruned.inputFiles())) == plan["files_scanned"]


def test_pruned_read_differential_fuzz(spark, cat):
    _mk_table(spark, cat)
    rng = random.Random(20260818)
    preds = []
    for _ in range(25):
        kind = rng.randrange(7)
        a, b = sorted(rng.randrange(-20, 420) for _ in range(2))
        preds.append({
            0: f"id >= {a}",
            1: f"id BETWEEN {a} AND {b}",
            2: f"host < 'host{rng.randrange(12):02d}'",
            3: f"lang IN ('lang{rng.randrange(6)}', 'lang{rng.randrange(6)}')",
            4: "lang IS NULL",
            5: f"d >= DATE '2024-{rng.randrange(1, 4):02d}-15' AND id < {b}",
            6: f"score <= {rng.uniform(-5, 60):.3f}",
        }[kind])
    pruned_any = False
    for w in preds:
        got = sorted(cat.read(spark, "pages", where=w).collect())
        want = sorted(cat.read(spark, "pages").filter(w).collect())
        assert got == want, f"pruned read diverged for {w!r}"
        pruned_any |= cat.plan_files(spark, "pages", w)["files_skipped"] > 0
    assert pruned_any


def test_nan_rows_survive_pruned_range_scan(spark, cat):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, float("nan")), (4, 3.0)], "id bigint, f double")
    cat.write(df.coalesce(1), "nan_t")
    got = cat.read(spark, "nan_t", where="f > 100.0").collect()
    assert len(got) == 1 and math.isnan(got[0]["f"])  # NaN > everything in Spark


def test_stats_survive_append_compact_and_time_travel(spark, cat):
    df1 = spark.createDataFrame([(i, f"v{i}") for i in range(100)], "id bigint, v string")
    df2 = spark.createDataFrame([(i, f"v{i}") for i in range(100, 200)], "id bigint, v string")
    s1 = cat.write(df1, "t", cluster_by=["id"], cluster_files=1)
    cat.write(df2, "t", cluster_by=["id"], cluster_files=1)
    # append: file from the other range is skipped
    plan = cat.plan_files(spark, "t", "id < 50")
    assert plan == {**plan, "files_total": 2, "files_scanned": 1, "files_skipped": 1}
    assert cat.read(spark, "t", where="id < 50").count() == 50
    # time travel honours the old snapshot's file list
    assert cat.read(spark, "t", snapshot_id=s1["snapshot_id"], where="id >= 150").count() == 0
    # compaction regenerates stats on the rewritten files
    res = cat.compact(spark, "t", target_file_bytes=1 << 30)
    assert res["compacted"]
    snap = cat.current_snapshot("t")
    assert all("stats" in f and f["stats"].get("id") for f in snap["files"])
    assert cat.read(spark, "t", where="id BETWEEN 20 AND 30").count() == 11


def test_legacy_manifest_without_stats_still_reads(spark, cat):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    cat.write(df, "t")
    # strip the stats the way a pre-upgrade manifest would look
    import json
    md = cat.table_dir("t") / "_manifest"
    for p in md.glob("snap-*.json"):
        snap = json.loads(p.read_text())
        for f in snap["files"]:
            f.pop("stats", None)
            f.pop("rows", None)
        p.write_text(json.dumps(snap))
    assert cat.read(spark, "t", where="id = 1").count() == 1
    plan = cat.plan_files(spark, "t", "id = 1")
    assert plan["files_skipped"] == 0  # no stats -> no pruning, never an error


def test_compaction_preserves_clustered_layout(spark, cat):
    # 4 small clustered files -> compact into ~2 -> pruning must still skip:
    # a plain repartition would interleave ranges and widen every bound
    for lo in (0, 1000, 2000, 3000):
        df = spark.createDataFrame(
            [(lo + i, "x" * 200) for i in range(1000)], "id bigint, v string")
        cat.write(df, "t", cluster_by=["id"], cluster_files=1)
    assert cat.current_snapshot("t")["sort_order"] == ["id"]

    before = cat.plan_files(spark, "t", "id < 1000")
    assert before["files_skipped"] == 3
    one_file = [f for f in cat.current_snapshot("t")["files"]][0]
    res = cat.compact(spark, "t", target_file_bytes=2 * one_file["bytes"],
                      small_file_bytes=10 * one_file["bytes"])
    assert res["compacted"] and res["files_after"] < res["files_before"]

    snap = cat.current_snapshot("t")
    assert snap["sort_order"] == ["id"]  # declaration survives maintenance
    after = cat.plan_files(spark, "t", "id < 1000")
    assert after["files_total"] == res["files_after"]
    assert after["files_skipped"] >= 1, snap["files"]
    assert cat.read(spark, "t", where="id < 1000").count() == 1000
