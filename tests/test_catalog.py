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


def test_torn_snapshot_is_invisible(spark, cat):
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    cat.write(df, "t")
    # simulate a crash that wrote a corrupt snapshot file but never flipped
    # HEAD: readers must keep seeing the last consistent snapshot
    md = cat.table_dir("t") / "_manifest"
    (md / "snap-00000099.json").write_text("{not json", encoding="utf-8")
    assert cat.current_snapshot("t")["snapshot_id"] == 1
    assert cat.read(spark, "t").count() == 1


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
