"""Snapshot-catalog tests (SURVEY §4.3 Iceberg emulation): append/overwrite
snapshots, time travel, atomic HEAD, expiry."""

from __future__ import annotations

import json

import pytest

from final_ocr_spark.sources.catalog import SnapshotCatalog


@pytest.fixture()
def cat(tmp_path):
    return SnapshotCatalog(str(tmp_path / "warehouse"))


def test_append_overwrite_and_time_travel(spark, cat):
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    df2 = spark.createDataFrame([(3, "c")], ["id", "v"])

    s1 = cat.write(df1, "t", mode="append")
    assert s1["snapshot_id"] == 1 and s1["parent_id"] is None
    assert s1["row_count_added"] == 2

    s2 = cat.write(df2, "t", mode="append")
    assert s2["parent_id"] == 1
    assert cat.read(spark, "t").count() == 3  # append accumulates

    s3 = cat.write(df2, "t", mode="overwrite")
    assert cat.read(spark, "t").count() == 1  # overwrite replaces

    # time travel: every historical snapshot still readable
    assert cat.read(spark, "t", snapshot_id=1).count() == 2
    assert cat.read(spark, "t", snapshot_id=2).count() == 3
    assert cat.read(spark, "t", snapshot_id=s3["snapshot_id"]).count() == 1
    assert cat.tables() == ["t"]


def test_many_file_commit_stats_are_executor_side(spark, cat, monkeypatch):
    """A commit above the driver-loop threshold must not open parquet
    footers on the DRIVER (a 10^5-file backfill would serialize minutes of
    driver reads): collect_file_stats is poisoned in the driver process —
    executor Python workers are separate processes and keep the real
    implementation — yet the commit succeeds and the manifest carries the
    same per-file bounds a direct computation produces."""
    from final_ocr_spark.sources import catalog as catmod
    from final_ocr_spark.sources import datafilter

    real = datafilter.collect_file_stats

    def boom(path):
        raise AssertionError(f"driver-side footer read of {path}")

    monkeypatch.setattr(datafilter, "collect_file_stats", boom)
    df = spark.createDataFrame(
        [(i, f"v{i:03d}") for i in range(120)], ["id", "v"]
    ).repartition(12)  # 12 files > _DRIVER_STATS_MAX_FILES
    snap = cat.write(df, "t", mode="append")
    monkeypatch.undo()

    entries = snap["files"]
    assert len(entries) == 12
    tdir = cat.table_dir("t")
    for e in entries:
        direct = real(str(tdir / e["path"]))
        assert e["rows"] == direct["rows"]
        assert e["stats"] == direct["stats"]
        assert e["stats"]["id"]["min"] is not None

    # and the small-commit path still uses the driver loop (below the
    # threshold the Spark job costs more than it saves) — the poisoned
    # driver function must fire there
    monkeypatch.setattr(datafilter, "collect_file_stats", boom)
    df2 = spark.createDataFrame([(1, "a")], ["id", "v"]).coalesce(1)
    snap2 = cat.write(df2, "t", mode="append")
    # advisory contract: the failed driver read degrades to a stats-less
    # entry, never a failed commit
    new = [e for e in snap2["files"] if e not in entries]
    assert len(new) == 1 and "stats" not in new[0]


def test_torn_snapshot_is_invisible(spark, cat):
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    cat.write(df, "t")
    # simulate a crash that wrote a corrupt snapshot file but never flipped
    # HEAD: readers must keep seeing the last consistent snapshot
    md = cat.table_dir("t") / "_manifest"
    (md / "snap-00000099.json").write_text("{not json", encoding="utf-8")
    assert cat.current_snapshot("t")["snapshot_id"] == 1
    assert cat.read(spark, "t").count() == 1


def test_concurrent_commit_never_loses_an_update(spark, cat, monkeypatch):
    """Pin the commit CAS against the torn-write lost-update (review-caught):
    a full competing append is injected at writer A's exact commit point
    (between writing the snapshot temp file and linking it into the
    committed name). Writer B must either serialize before or after A, but
    BOTH writers' rows must be in the final table. Under the pre-fix
    protocol (committed name created first, JSON written after), B would
    observe A's half-written snap file, skip it as torn, build on the older
    parent, and A's rows would vanish from every future read."""
    import os as _os

    from final_ocr_spark.sources import catalog as catmod

    cat.write(spark.createDataFrame([(0, "base")], ["id", "v"]), "t")

    real_link = _os.link
    fired = {"done": False}

    def racing_link(src, dst, *a, **kw):
        if not fired["done"]:
            fired["done"] = True  # B's own commit must use the real link
            cat.write(
                spark.createDataFrame([(2, "from_b")], ["id", "v"]),
                "t", mode="append",
            )
        return real_link(src, dst, *a, **kw)

    monkeypatch.setattr(catmod.os, "link", racing_link)
    cat.write(
        spark.createDataFrame([(1, "from_a")], ["id", "v"]), "t", mode="append"
    )
    monkeypatch.setattr(catmod.os, "link", real_link)

    got = {r["v"] for r in cat.read(spark, "t").collect()}
    assert got == {"base", "from_a", "from_b"}  # nobody's append was lost
    sids = [s["snapshot_id"] for s in cat.snapshots("t")]
    assert sids == [1, 2, 3]
    assert cat.current_snapshot("t")["snapshot_id"] == 3


def test_expire_drops_unreferenced_files(spark, cat):
    df1 = spark.createDataFrame([(i, "x") for i in range(10)], ["id", "v"])
    df2 = spark.createDataFrame([(99, "y")], ["id", "v"])
    cat.write(df1, "t", mode="append")
    cat.write(df2, "t", mode="overwrite")  # snapshot 1's files now orphaned
    deleted = cat.expire("t", keep_last=1)
    assert deleted > 0
    assert cat.read(spark, "t").count() == 1  # HEAD unaffected
    with pytest.raises(FileNotFoundError):
        cat.read(spark, "t", snapshot_id=1)  # expired


def test_extract_job_reads_and_publishes_through_catalog(spark, cat, tmp_path):
    """The flagship job's input contract is 'an Iceberg table of pages' —
    read a pages TABLE from the catalog, extract, publish a result snapshot."""
    from final_ocr_spark.operators.extract_pages import extract_pages
    from final_ocr_spark.sources.synthetic_pages import gen_pages

    pages = gen_pages(spark, 120, seed=7)
    cat.write(pages, "pages", mode="append")

    loaded = cat.read(spark, "pages")
    assert loaded.count() == 120
    ext = extract_pages(loaded, dedup=True)
    snap = cat.write(ext, "extracted", mode="overwrite")

    out = cat.read(spark, "extracted")
    assert out.count() == snap["row_count_added"] > 0
    assert "extracted_text" in out.columns
    # lineage recorded
    meta = json.loads(
        (cat.table_dir("extracted") / "_manifest" / "snap-00000001.json").read_text()
    )
    assert meta["app_id"] and meta["schema"]

def test_compact_binpacks_small_files(spark, cat):
    # 6 appends × 2 partitions each → 12 tiny data files
    for i in range(6):
        df = spark.createDataFrame(
            [(i * 10 + j, f"v{i}-{j}") for j in range(10)], ["id", "v"]
        ).repartition(2)
        cat.write(df, "t", mode="append")
    before = cat.current_snapshot("t")
    assert len(before["files"]) == 12
    rows_before = sorted((r.id, r.v) for r in cat.read(spark, "t").collect())

    stats = cat.compact(spark, "t")  # all files tiny → one output bin
    assert stats["compacted"] is True
    assert stats["files_before"] == 12 and stats["files_after"] == 1
    assert stats["rewritten_files"] == 12

    after = cat.current_snapshot("t")
    assert after["snapshot_id"] == before["snapshot_id"] + 1
    assert after["operation"] == "compact"
    assert after["parent_id"] == before["snapshot_id"]
    # byte-identical data, fewer files
    rows_after = sorted((r.id, r.v) for r in cat.read(spark, "t").collect())
    assert rows_after == rows_before
    # time travel to the pre-compaction snapshot still works (files immutable)
    assert (
        cat.read(spark, "t", snapshot_id=before["snapshot_id"]).count()
        == len(rows_before)
    )


def test_compact_leaves_big_files_alone(spark, cat):
    big = spark.createDataFrame([(i, "x" * 50) for i in range(2000)], ["id", "v"])
    cat.write(big.coalesce(1), "t", mode="append")
    big_bytes = cat.current_snapshot("t")["files"][0]["bytes"]
    for i in range(3):
        cat.write(
            spark.createDataFrame([(10000 + i, "y")], ["id", "v"]).coalesce(1),
            "t",
            mode="append",
        )
    # threshold chosen so ONLY the 3 singleton appends count as small
    stats = cat.compact(spark, "t", small_file_bytes=big_bytes, target_file_bytes=2 * big_bytes)
    assert stats["compacted"] is True
    assert stats["rewritten_files"] == 3
    assert stats["files_after"] == 2  # untouched big + 1 consolidated
    # the big file's path survives unchanged in the new snapshot
    paths = {f["path"] for f in cat.current_snapshot("t")["files"]}
    assert cat.snapshots("t")[0]["files"][0]["path"] in paths
    assert cat.read(spark, "t").count() == 2003


def test_compact_noop_below_min_files(spark, cat):
    cat.write(
        spark.createDataFrame([(1, "a")], ["id", "v"]).coalesce(1), "t"
    )
    head = cat.current_snapshot("t")["snapshot_id"]
    stats = cat.compact(spark, "t")  # one small file < min_input_files=2
    assert stats["compacted"] is False
    assert cat.current_snapshot("t")["snapshot_id"] == head  # no new snapshot


def test_compact_then_expire_reclaims_small_files(spark, cat):
    for i in range(4):
        cat.write(
            spark.createDataFrame([(i, "a")], ["id", "v"]).coalesce(1),
            "t",
            mode="append",
        )
    cat.compact(spark, "t")
    deleted = cat.expire("t", keep_last=1)
    assert deleted == 4  # the four pre-compaction tiny files reclaimed
    assert cat.read(spark, "t").count() == 4  # data intact through it all


def test_compact_missing_table_raises(spark, cat):
    with pytest.raises(FileNotFoundError):
        cat.compact(spark, "nope")


def test_diff_between_snapshots(spark, cat):
    """(key, change) between two snapshots: added/removed/modified only —
    unchanged keys absent; defaults diff HEAD against its parent."""
    v1 = spark.createDataFrame(
        [("u1", "alpha", 1), ("u2", "beta", 2), ("u3", "gamma", 3)],
        "url string, text string, n int",
    )
    cat.write(v1, "pages", mode="overwrite")
    v2 = spark.createDataFrame(
        [("u1", "alpha", 1),           # unchanged
         ("u2", "beta EDITED", 2),     # modified
         ("u4", "delta", 4)],          # added (u3 removed)
        "url string, text string, n int",
    )
    cat.write(v2, "pages", mode="overwrite")

    got = {r["url"]: r["change"] for r in cat.diff(spark, "pages").collect()}
    assert got == {"u2": "modified", "u3": "removed", "u4": "added"}

    # explicit ids, reversed direction
    rev = {r["url"]: r["change"]
           for r in cat.diff(spark, "pages", from_snapshot=2, to_snapshot=1).collect()}
    assert rev == {"u2": "modified", "u3": "added", "u4": "removed"}

    # self-diff is empty
    assert cat.diff(spark, "pages", from_snapshot=2, to_snapshot=2).count() == 0


def test_diff_multiset_and_append_semantics(spark, cat):
    """Duplicate keys fingerprint as a multiset (count + xor): appending a
    second identical row for a key is 'modified', not invisible."""
    v1 = spark.createDataFrame([("u1", "same"), ("u2", "x")],
                               "url string, text string")
    cat.write(v1, "t", mode="overwrite")
    cat.write(spark.createDataFrame([("u1", "same")], "url string, text string"),
              "t", mode="append")
    got = {r["url"]: r["change"] for r in cat.diff(spark, "t").collect()}
    assert got == {"u1": "modified"}


def test_diff_requires_a_parent(spark, cat):
    cat.write(spark.createDataFrame([("u1", "a")], "url string, text string"),
              "solo", mode="overwrite")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="no snapshot before"):
        cat.diff(spark, "solo")


def test_merge_detects_concurrent_append_of_matched_key(spark, cat, monkeypatch):
    """Serializable-isolation validation (review-caught): an append that
    lands a MATCHED key between merge planning and merge commit must fail
    the merge loudly — publishing would leave two rows for a key the merge
    promises to whole-row-replace. An append of an UNmatched key must NOT
    conflict (snapshot-isolation happy path)."""
    import os as _os

    from final_ocr_spark.sources import catalog as catmod
    from final_ocr_spark.sources.catalog import CommitConflictError

    cat.write(spark.createDataFrame([(1, "a1"), (2, "b1")], ["id", "v"]), "t")

    real_link = _os.link

    def race_with(append_df):
        fired = {"done": False}

        def racing_link(src, dst, *a, **kw):
            if not fired["done"]:
                fired["done"] = True
                cat.write(append_df, "t", mode="append")
            return real_link(src, dst, *a, **kw)

        return racing_link

    # racing append contains id=2, which the merge matches → conflict
    monkeypatch.setattr(
        catmod.os, "link",
        race_with(spark.createDataFrame([(2, "raced")], ["id", "v"])),
    )
    with pytest.raises(CommitConflictError, match="concurrent append"):
        cat.merge(
            spark, spark.createDataFrame([(2, "b2")], ["id", "v"]), "t",
            key="id",
        )
    monkeypatch.setattr(catmod.os, "link", real_link)
    # the losing merge published nothing: raced row + originals intact
    assert {r["v"] for r in cat.read(spark, "t").collect()} == {
        "a1", "b1", "raced"
    }

    # racing append of an UNmatched key: merge retries and both survive
    monkeypatch.setattr(
        catmod.os, "link",
        race_with(spark.createDataFrame([(9, "other")], ["id", "v"])),
    )
    cat.merge(
        spark, spark.createDataFrame([(1, "a2")], ["id", "v"]), "t", key="id"
    )
    monkeypatch.setattr(catmod.os, "link", real_link)
    got = {r["id"]: r["v"] for r in cat.read(spark, "t").collect()}
    assert got[1] == "a2" and got[9] == "other"


def test_merge_upsert_copy_on_write(spark, cat):
    """merge replaces matched keys, inserts new ones, rewrites ONLY the
    files containing matches, and keeps time travel intact."""
    import pyspark.sql.functions as F

    # two separate appends → two file groups; keys 1-2 in group A, 3-4 in B
    cat.write(spark.createDataFrame([(1, "a1"), (2, "b1")], ["id", "v"]), "t")
    cat.write(spark.createDataFrame([(3, "c1"), (4, "d1")], ["id", "v"]), "t")
    pre = cat.current_snapshot("t")

    updates = spark.createDataFrame([(2, "b2"), (5, "e1")], ["id", "v"])
    stats = cat.merge(spark, updates, "t", key="id")

    got = {r["id"]: r["v"] for r in cat.read(spark, "t").collect()}
    assert got == {1: "a1", 2: "b2", 3: "c1", 4: "d1", 5: "e1"}

    # copy-on-write granularity: only group A (key 2) was rewritten; group
    # B's files survive into the new snapshot verbatim
    post = cat.current_snapshot("t")
    pre_paths = {f["path"] for f in pre["files"]}
    post_paths = {f["path"] for f in post["files"]}
    assert stats["files_rewritten"] >= 1
    b_files = pre_paths - {  # files NOT containing key 2
        "/".join(u.split("/")[-3:])
        for u in [
            r["_f"] for r in cat.read(spark, "t", snapshot_id=pre["snapshot_id"])
            .filter(F.col("id").isin(2))
            .select(F.input_file_name().alias("_f")).distinct().collect()
        ]
    }
    assert b_files <= post_paths  # untouched files carried over
    assert post["operation"] == "merge" and post["parent_id"] == pre["snapshot_id"]

    # time travel: the pre-merge snapshot still serves the old row
    old = {r["id"]: r["v"]
           for r in cat.read(spark, "t", snapshot_id=pre["snapshot_id"]).collect()}
    assert old == {1: "a1", 2: "b1", 3: "c1", 4: "d1"}


def test_merge_guards(spark, cat):
    cat.write(spark.createDataFrame([(1, "a")], ["id", "v"]), "t")
    import pytest as _pt

    with _pt.raises(ValueError, match="duplicate keys"):
        cat.merge(
            spark,
            spark.createDataFrame([(1, "x"), (1, "y")], ["id", "v"]),
            "t", key="id",
        )
    # whole-row replace can't leave a table column undefined
    with _pt.raises(ValueError, match="missing table columns"):
        cat.merge(
            spark,
            spark.createDataFrame([(1,)], ["id"]),
            "t", key="id",
        )
    # incompatible type CHANGE (string → int) refuses before any write
    with _pt.raises(ValueError, match="incompatible type change"):
        cat.merge(
            spark,
            spark.createDataFrame([(1, 7)], "id bigint, v int"),
            "t", key="id",
        )


def test_merge_pure_insert_and_delete(spark, cat):
    cat.write(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]), "t")
    # no matched keys → pure insert, zero files rewritten
    stats = cat.merge(
        spark, spark.createDataFrame([(9, "z")], ["id", "v"]), "t", key="id"
    )
    assert stats["files_rewritten"] == 0
    assert cat.read(spark, "t").count() == 3

    # delete one key: only its file rewritten, row gone, history preserved
    pre = cat.current_snapshot("t")
    dstats = cat.delete(
        spark, spark.createDataFrame([(1,)], ["id"]), "t", key="id"
    )
    assert dstats["files_rewritten"] >= 1
    got = sorted(r["id"] for r in cat.read(spark, "t").collect())
    assert got == [2, 9]
    assert cat.current_snapshot("t")["operation"] == "delete"
    assert cat.read(spark, "t", snapshot_id=pre["snapshot_id"]).count() == 3

    # deleting a missing key is a no-op rewrite-wise
    d2 = cat.delete(spark, spark.createDataFrame([(777,)], ["id"]), "t", key="id")
    assert d2["files_rewritten"] == 0
    assert cat.read(spark, "t").count() == 2


def test_merge_is_the_recrawl_path(spark, cat):
    """End-to-end recrawl semantics on the pages shape: fresh warc_ts rows
    replace stale ones by url; diff() sees them as 'modified'."""
    import datetime

    rows1 = [("http://a.com/1", datetime.datetime(2026, 1, 1), "old text"),
             ("http://a.com/2", datetime.datetime(2026, 1, 1), "keep")]
    cat.write(spark.createDataFrame(
        rows1, "url string, warc_ts timestamp, text string"), "pages")
    pre = cat.current_snapshot("pages")["snapshot_id"]
    recrawl = spark.createDataFrame(
        [("http://a.com/1", datetime.datetime(2026, 2, 1), "new text"),
         ("http://a.com/3", datetime.datetime(2026, 2, 1), "brand new")],
        "url string, warc_ts timestamp, text string")
    cat.merge(spark, recrawl, "pages", key="url")
    d = {r["url"]: r["change"]
         for r in cat.diff(spark, "pages", from_snapshot=pre).collect()}
    assert d == {"http://a.com/1": "modified", "http://a.com/3": "added"}


def test_expire_reclaims_merge_superseded_files(spark, cat, tmp_path):
    """The CoW lifecycle closes: files rewritten by merge stay on disk for
    time travel until expire drops the old snapshots, then are reclaimed."""
    import pathlib

    cat.write(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]), "t")
    pre_files = {f["path"] for f in cat.current_snapshot("t")["files"]}
    cat.merge(spark, spark.createDataFrame([(1, "a2")], ["id", "v"]),
              "t", key="id")
    tdir = pathlib.Path(cat.table_dir("t"))
    # superseded file still on disk (parent snapshot time-travels)
    assert all((tdir / p).exists() for p in pre_files)
    removed = cat.expire("t", keep_last=1)
    assert removed >= 1
    post_files = {f["path"] for f in cat.current_snapshot("t")["files"]}
    for p in pre_files - post_files:
        assert not (tdir / p).exists()  # reclaimed
    # table still reads correctly after expiry
    got = {r["id"]: r["v"] for r in cat.read(spark, "t").collect()}
    assert got == {1: "a2", 2: "b"}


# -- schema evolution (round-4: evolve-on-merge instead of hard refusal) ----
def test_merge_evolves_add_column(spark, cat):
    """Add a column via merge: untouched rows read it as null, time travel
    shows BOTH schemas, diff reports nothing for untouched keys."""
    base = spark.createDataFrame(
        [("u1", "t1"), ("u2", "t2"), ("u3", "t3")], ["url", "text"]
    )
    s1 = cat.write(base, "docs")["snapshot_id"]
    upd = spark.createDataFrame([("u2", "t2b", 0.9)],
                                "url string, text string, quality double")
    cat.merge(spark, upd, "docs", key="url")

    head = cat.read(spark, "docs")
    assert set(head.columns) == {"url", "text", "quality"}
    rows = {r["url"]: (r["text"], r["quality"]) for r in head.collect()}
    assert rows == {"u1": ("t1", None), "u2": ("t2b", 0.9), "u3": ("t3", None)}
    # old snapshot still reads under its pinned (pre-evolution) schema
    old = cat.read(spark, "docs", snapshot_id=s1)
    assert old.columns == ["url", "text"] and old.count() == 3
    # diff: only the merged key; the added-null column marks nothing
    d = {r["url"]: r["change"]
         for r in cat.diff(spark, "docs", from_snapshot=s1).collect()}
    assert d == {"u2": "modified"}


def test_merge_evolves_safe_widen(spark, cat):
    """int → bigint widening via merge: old int files upcast at scan, diff
    doesn't flag rows whose VALUE didn't change."""
    cat.write(spark.createDataFrame([("u1", 1), ("u2", 2)],
                                    "url string, n int"), "t")
    s1 = cat.current_snapshot("t")["snapshot_id"]
    upd = spark.createDataFrame([("u2", 2**40)], "url string, n bigint")
    cat.merge(spark, upd, "t", key="url")
    head = cat.read(spark, "t")
    assert dict(head.dtypes)["n"] == "bigint"
    assert {r["url"]: r["n"] for r in head.collect()} == {"u1": 1, "u2": 2**40}
    assert dict(cat.read(spark, "t", snapshot_id=s1).dtypes)["n"] == "int"
    d = {r["url"]: r["change"]
         for r in cat.diff(spark, "t", from_snapshot=s1).collect()}
    assert d == {"u2": "modified"}  # u1 NOT flagged despite the widen


def test_append_with_evolved_or_subset_schema(spark, cat):
    """Append evolution: a new column joins the table schema (old files
    null-fill), and an append MISSING an optional column null-fills its
    own rows instead."""
    cat.write(spark.createDataFrame([("u1", "a")], ["url", "v"]), "t")
    cat.write(spark.createDataFrame([("u2", "b", 3)],
                                    "url string, v string, n int"),
              "t", mode="append")
    head = cat.read(spark, "t")
    assert set(head.columns) == {"url", "v", "n"}
    by = {r["url"]: r["n"] for r in head.collect()}
    assert by == {"u1": None, "u2": 3}
    # subset append: rows land with null n
    cat.write(spark.createDataFrame([("u3", "c")], ["url", "v"]),
              "t", mode="append")
    by = {r["url"]: r["n"] for r in cat.read(spark, "t").collect()}
    assert by == {"u1": None, "u2": 3, "u3": None}


def test_compact_materializes_evolved_schema(spark, cat):
    """Compaction over a mix of pre- and post-evolution small files
    carries the evolved schema and loses no values."""
    cat.write(spark.createDataFrame([("u1", "a")], ["url", "v"]), "t")
    cat.write(spark.createDataFrame([("u2", "b", 3)],
                                    "url string, v string, n int"),
              "t", mode="append")
    st = cat.compact(spark, "t", min_input_files=2)
    assert st["compacted"]
    by = {r["url"]: r["n"] for r in cat.read(spark, "t").collect()}
    assert by == {"u1": None, "u2": 3}


def test_expire_inflight_grace(spark, cat):
    """expire sweeps only STALE .snap-inflight-* commit temps: a fresh temp
    (a live concurrent committer between fsync and link) survives; a
    backdated one (dead committer) is removed (review-caught: an
    unconditional sweep could crash a live commit mid-protocol)."""
    import os

    df = spark.range(3).selectExpr("id", "cast(id as string) v")
    cat.write(df, "t")
    md = cat._manifest_dir("t")
    fresh = md / ".snap-inflight-fresh.json"
    stale = md / ".snap-inflight-stale.json"
    fresh.write_text("{}")
    stale.write_text("{}")
    old = 1_000_000_000  # 2001 — far past any grace window
    os.utime(stale, (old, old))
    cat.expire("t", keep_last=1)
    assert fresh.exists(), "live committer's temp must survive expire"
    assert not stale.exists(), "dead committer's temp must be swept"


def test_expire_never_deletes_the_head_snapshot(spark, cat):
    """A committer crashed (or is slow) between its snap-file link and its
    HEAD flip leaves HEAD one behind the newest snap file — the window the
    commit protocol explicitly tolerates. expire(keep_last=1) computed its
    keep set from snapshot FILES alone and deleted the snapshot HEAD points
    at, bricking every read and dropping published rows (review-caught).
    The HEAD snapshot must always survive expiry."""
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    df2 = spark.createDataFrame([(3, "c")], ["id", "v"])
    cat.write(df1, "t", mode="append")
    cat.write(df2, "t", mode="overwrite")
    md = cat._manifest_dir("t")
    # simulate the crash window: snap-2 exists, HEAD still says 1
    (md / "HEAD").write_text("1")

    cat.expire("t", keep_last=1)
    # the published snapshot (HEAD=1) must still read, rows intact
    assert cat.read(spark, "t").count() == 2
    assert {r["v"] for r in cat.read(spark, "t").collect()} == {"a", "b"}
    # and the newest snap file survives too (it is in keep_last)
    assert (md / "snap-00000002.json").exists()


def test_expire_sweeps_orphaned_data_dirs(spark, cat):
    """Aborted commits land data/<uuid> files before the protocol rejects
    them (CommitConflictError, schema refusal, CAS exhaustion); expire must
    reclaim directories no snapshot references (Iceberg's
    remove_orphan_files) — but never a FRESH one, which may belong to a
    live commit that has landed data and not yet linked its snapshot."""
    import os

    df = spark.range(4).selectExpr("id", "cast(id as string) v")
    cat.write(df, "t")
    tdir = cat.table_dir("t")
    orphan = tdir / "data" / "deadbeef"
    orphan.mkdir(parents=True)
    (orphan / "part-00000.parquet").write_bytes(b"x" * 64)
    (orphan / "_SUCCESS").write_bytes(b"")
    fresh = tdir / "data" / "cafef00d"
    fresh.mkdir(parents=True)
    (fresh / "part-00000.parquet").write_bytes(b"y" * 64)

    old = 1_000_000_000
    os.utime(orphan, (old, old))
    n = cat.expire("t", keep_last=1)
    assert not orphan.exists(), "stale orphan dir must be swept"
    assert fresh.exists(), "fresh dir may be a live commit's landed files"
    assert n >= 1  # the orphan's data file counted (markers don't)
    # referenced data untouched
    assert cat.read(spark, "t").count() == 4


def test_cow_probe_is_pinned_to_planning_snapshot(spark, cat, monkeypatch):
    """merge/delete must probe the snapshot they planned against: an
    unpinned read re-resolves HEAD, so a commit landing between
    current_snapshot() and the probe made _cow_rewrite raise a misleading
    'invariant broken' RuntimeError for an ordinary commit race
    (review-caught). With the pin, the interleaved append is handled by
    the serializable-isolation validation instead."""
    from final_ocr_spark.sources import catalog as catmod

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    cat.write(df, "t")

    real_cur = cat.current_snapshot
    fired = {"done": False}

    def race_once(name):
        snap = real_cur(name)
        if not fired["done"]:
            fired["done"] = True
            # a concurrent append commits AFTER planning state is captured
            cat.write(
                spark.createDataFrame([(99, "z")], ["id", "v"]), "t"
            )
        return snap

    monkeypatch.setattr(cat, "current_snapshot", race_once)
    # the deleted key exists only in the planning snapshot; the racing
    # append adds an UNMATCHED key, so the delete must succeed cleanly
    # (pre-fix: RuntimeError 'snapshot/file-layout invariant broken')
    cat.delete(spark, spark.createDataFrame([(1,)], ["id"]), "t", key="id")
    got = {r["id"] for r in cat.read(spark, "t").collect()}
    assert got == {2, 99}


def test_diff_null_keys_are_not_spurious_changes(spark, cat):
    """An unchanged null-key group must be ABSENT from diff (a plain
    equi-join never matches NULL to NULL and reported removed+added for
    rows that never changed, review-caught); a real null-key change still
    surfaces."""
    df1 = spark.createDataFrame(
        [(None, "keep"), ("u1", "a")], ["url", "v"]
    )
    cat.write(df1, "t", mode="append")
    cat.write(
        spark.createDataFrame([(None, "keep"), ("u1", "CHANGED")], ["url", "v"]),
        "t", mode="overwrite",
    )
    d = {r["url"]: r["change"] for r in cat.diff(spark, "t").collect()}
    assert d == {"u1": "modified"}  # null key: unchanged -> absent

    cat.write(
        spark.createDataFrame([(None, "EDITED"), ("u1", "CHANGED")], ["url", "v"]),
        "t", mode="overwrite",
    )
    d2 = {r["url"]: r["change"] for r in cat.diff(spark, "t").collect()}
    assert d2 == {None: "modified"}  # a REAL null-key change still reports


def test_distributed_stats_failure_never_fails_commit(spark, cat, monkeypatch):
    """Footer stats are advisory at BOTH sizes: a job-level failure in the
    distributed stats path (executor loss, transient FS error on collect)
    must degrade to stats-less manifest entries exactly like the driver
    loop does, never abort a commit whose data already landed
    (review-caught)."""
    from final_ocr_spark.sources import catalog as catmod

    def boom(spark_, paths):
        raise RuntimeError("executor lost mid stats job")

    monkeypatch.setattr(catmod, "_distributed_file_stats", boom)
    monkeypatch.setattr(catmod, "_DRIVER_STATS_MAX_FILES", 0)  # force the path
    df = spark.range(10).selectExpr("id", "cast(id as string) v")
    s = cat.write(df, "t")  # must not raise
    snap = cat.current_snapshot("t")
    assert snap["snapshot_id"] == s["snapshot_id"]
    assert all("columns" not in f or f["columns"] for f in snap["files"])
    assert cat.read(spark, "t").count() == 10


def test_bad_table_names_rejected(cat):
    """'' (and whitespace) would alias the catalog ROOT itself — the
    phantom table's _manifest and data dirs would interleave with real
    tables' directories (review-caught)."""
    for bad in ("", "  ", "a/b", ".hidden"):
        with pytest.raises(ValueError, match="bad table name"):
            cat.table_dir(bad)


def test_current_snapshot_is_single_file_lookup(spark, cat):
    """current_snapshot loads exactly the snap file HEAD names (was an
    O(#snapshots x manifest size) scan); a missing or torn HEAD target
    raises the protocol-breach error."""
    df = spark.range(2).selectExpr("id", "cast(id as string) v")
    cat.write(df, "t")
    cat.write(df, "t")
    md = cat._manifest_dir("t")
    assert cat.current_snapshot("t")["snapshot_id"] == 2

    (md / "HEAD").write_text("7")
    with pytest.raises(RuntimeError, match="no snapshot file"):
        cat.current_snapshot("t")
    (md / "snap-00000007.json").write_text("{ torn")
    with pytest.raises(RuntimeError, match="torn"):
        cat.current_snapshot("t")
    # _latest_committed skips the torn file and finds snap-2
    assert cat._latest_committed("t")["snapshot_id"] == 2


def test_latest_committed_orders_numerically_past_zero_pad(spark, cat):
    """_latest_committed must pick the parent by NUMERIC snapshot id:
    lexicographic filename order puts 'snap-100000000.json' BEFORE
    'snap-99999999.json', which would pin the parent at 99999999 forever
    and wedge every subsequent commit on EEXIST (review-caught)."""
    df = spark.range(2).selectExpr("id", "cast(id as string) v")
    cat.write(df, "t")
    md = cat._manifest_dir("t")
    snap = json.loads((md / "snap-00000001.json").read_text())

    big = dict(snap, snapshot_id=100_000_000, parent_id=1)
    (md / "snap-100000000.json").write_text(json.dumps(big))
    (md / "HEAD").write_text("100000000")

    assert cat._latest_committed("t")["snapshot_id"] == 100_000_000
    # and the next commit builds on it instead of wedging on EEXIST
    s = cat.write(df, "t", mode="append")
    assert s["snapshot_id"] == 100_000_001
    assert s["parent_id"] == 100_000_000
