"""Incremental extraction loop: recrawl merge → diff → selective
re-extract → extracted-table upsert/delete — end to end over the catalog."""

import pytest

from final_ocr_spark.plans.incremental import incremental_extract
from final_ocr_spark.sources.catalog import SnapshotCatalog
from final_ocr_spark.sources.synthetic_pages import gen_pages


@pytest.fixture()
def cat(tmp_path):
    return SnapshotCatalog(str(tmp_path / "warehouse"))


def test_full_loop(spark, cat):
    # first crawl: 60 pages → full backfill
    pages1 = gen_pages(spark, 60, seed=42, partitions=4)
    cat.write(pages1, "pages")
    s1 = incremental_extract(spark, cat)
    ext1 = cat.read(spark, "extracted")
    n1 = ext1.count()
    assert n1 > 0 and s1["n_extracted"] == n1
    base = {r["url"]: r["extracted_text"] for r in ext1.collect()}

    # recrawl: 5 urls get FRESH html (same url, new warc_ts), 10 are new
    import pyspark.sql.functions as F

    fresh = (
        gen_pages(spark, 5, seed=99, partitions=2)
        .withColumn("rn", F.monotonically_increasing_id())
    )
    old_urls = [r["url"] for r in
                cat.read(spark, "pages").select("url").distinct()
                .orderBy("url").limit(5).collect()]
    # stitch: fresh content under existing urls
    fresh = fresh.limit(5).drop("url", "rn").withColumn(
        "rid", F.monotonically_increasing_id())
    url_df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(old_urls)], ["rid", "url"])
    recrawl_updates = fresh.join(url_df, "rid").drop("rid").select(
        "url", "warc_ts", "html", "text", "lang")
    brand_new = gen_pages(spark, 10, seed=7, start=1_000_000, partitions=2)
    batch = recrawl_updates.unionByName(brand_new)
    # updates must be key-unique for merge
    from final_ocr_spark.operators.dedup import dedup_latest

    cat.merge(spark, dedup_latest(batch, key="url", order_col="warc_ts"),
              "pages", key="url")

    # incremental pass: only the ~15 changed urls re-extract
    s2 = incremental_extract(spark, cat, since=s1["processed_snapshot"])
    assert s2["n_changed"] <= 15 and s2["n_changed"] > 0
    ext2 = {r["url"]: r["extracted_text"]
            for r in cat.read(spark, "extracted").collect()}
    # unchanged urls byte-identical; changed urls differ or are new
    changed_urls = set(old_urls)
    for url, txt in base.items():
        if url not in changed_urls:
            assert ext2[url] == txt, url
    new_urls = {r["url"] for r in brand_new.select("url").collect()}
    extracted_new = new_urls & set(ext2)
    assert extracted_new  # new urls extracted (some may quarantine)

    # deletion: removing urls from pages propagates on the next pass
    kill = spark.createDataFrame([(u,) for u in old_urls[:2]], ["url"])
    cat.delete(spark, kill, "pages", key="url")
    s3 = incremental_extract(spark, cat, since=s2["processed_snapshot"])
    assert s3["n_removed"] == 2
    left = {r["url"] for r in cat.read(spark, "extracted").collect()}
    assert not (set(old_urls[:2]) & left)


def test_idempotent_window(spark, cat):
    cat.write(gen_pages(spark, 30, seed=1, partitions=2), "pages")
    s1 = incremental_extract(spark, cat)
    before = sorted(
        (r["url"], r["extracted_text"])
        for r in cat.read(spark, "extracted").collect())
    # re-running the same window merges identical rows onto identical keys
    # (latest-wins dedup: gen_pages plants ~3% duplicate urls whose LATEST
    # row is what extraction keeps — an arbitrary dropDuplicates pick would
    # legitimately change the extracted text)
    from final_ocr_spark.operators.dedup import dedup_latest

    cat.merge(spark,
              dedup_latest(gen_pages(spark, 30, seed=1, partitions=2),
                           key="url", order_col="warc_ts"),
              "pages", key="url")
    incremental_extract(spark, cat, since=s1["processed_snapshot"])
    after = sorted(
        (r["url"], r["extracted_text"])
        for r in cat.read(spark, "extracted").collect())
    assert before == after


def test_first_run_on_multi_snapshot_pages_backfills(spark, cat):
    # review-caught: pages already has TWO snapshots when the extracted
    # table is first built — the full corpus must backfill, not just the
    # parent→HEAD window
    cat.write(gen_pages(spark, 40, seed=5, partitions=2), "pages")
    cat.write(gen_pages(spark, 10, seed=5, start=2_000_000, partitions=2),
              "pages", mode="append")
    s = incremental_extract(spark, cat)
    n_pages = cat.read(spark, "pages").select("url").distinct().count()
    n_ext = cat.read(spark, "extracted").count()
    assert n_ext == n_pages  # every url extracted, not ~10
    assert s["n_extracted"] == n_ext


def test_changed_to_junk_payload_updates(spark, cat):
    # a url modified to a junk payload must UPDATE its extracted row (the
    # one-row-per-url extract_pages invariant), never serve stale content
    import datetime

    import pyspark.sql.functions as F

    cat.write(gen_pages(spark, 20, seed=3, partitions=2), "pages")
    s1 = incremental_extract(spark, cat)
    victim = cat.read(spark, "extracted").filter(
        F.length("extracted_text") > 50).first()
    junk = spark.createDataFrame(
        [(victim["url"], datetime.datetime(2027, 1, 1),
          bytearray(b"\x00\x01\xfe\xffgarbage"), None, None)],
        "url string, warc_ts timestamp, html binary, text string, lang string")
    cat.merge(spark, junk, "pages", key="url")
    incremental_extract(spark, cat, since=s1["processed_snapshot"])
    row = cat.read(spark, "extracted").filter(
        F.col("url") == victim["url"]).first()
    assert row is not None
    assert row["extracted_text"] != victim["extracted_text"]  # no stale text
    assert (row["extracted_text"] or "") == ""  # junk extracts to nothing


def test_since_with_missing_extracted_table_raises(spark, cat):
    import pytest as _pt

    cat.write(gen_pages(spark, 10, seed=2, partitions=2), "pages")
    cat.write(gen_pages(spark, 5, seed=2, start=9_000_000, partitions=2),
              "pages", mode="append")
    with _pt.raises(ValueError, match="does not exist but since"):
        incremental_extract(spark, cat, since=1)


def test_recrawl_with_evolved_pages_schema(spark, cat):
    """Round-4 integration: a recrawl batch that ADDS a column to the pages
    table (schema evolution rides the merge) must not break the incremental
    loop — diff stays change-proportional (the added-null column flags
    nothing), only the recrawled urls re-extract, and the pre-evolution
    pages snapshot still time-travels under its own schema."""
    import pyspark.sql.functions as F

    pages1 = gen_pages(spark, 40, seed=7, partitions=4)
    cat.write(pages1, "pages")
    s0 = cat.current_snapshot("pages")["snapshot_id"]
    s1 = incremental_extract(spark, cat)
    n_backfill = cat.read(spark, "extracted").count()
    assert n_backfill > 0

    # recrawl: 3 existing urls, fresh timestamps AND a NEW fetch_status
    # column — the classic mid-life pipeline evolution
    recrawl = (
        cat.read(spark, "pages").orderBy("url").limit(3)
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 DAY"))
        .withColumn("fetch_status", F.lit(200))
    )
    touched = {r["url"] for r in recrawl.select("url").collect()}
    cat.merge(spark, recrawl, "pages", key="url")

    head_pages = cat.read(spark, "pages")
    assert "fetch_status" in head_pages.columns  # evolved
    # old snapshot still reads under the pre-evolution schema
    assert "fetch_status" not in cat.read(spark, "pages", snapshot_id=s0).columns

    s2 = incremental_extract(spark, cat, since=s1["processed_snapshot"])
    # change-proportional: ONLY the 3 recrawled urls (the added-null column
    # must not mark the other 37 rows modified)
    assert s2["n_changed"] == 3 and s2["n_removed"] == 0
    ext = cat.read(spark, "extracted")
    assert ext.count() == n_backfill  # same url set, upserted in place
    assert {r["url"] for r in ext.join(
        spark.createDataFrame([(u,) for u in touched], ["url"]),
        "url", "left_semi").collect()} == touched
