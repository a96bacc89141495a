"""Incremental extraction: re-extract exactly what changed between two
snapshots of the pages table, and upsert the results.

The closed recrawl loop the catalog primitives exist for:

    recrawl batch ──merge──▶ pages table (new snapshot)
                                 │ diff(since last processed snapshot)
                                 ▼  added/modified urls only
                          extract_pages (the flagship stage)
                                 │
                   merge──▶ extracted table; removed urls delete

Cost is change-proportional end to end: ``diff`` emits only changed keys
(multiset fingerprints, row payloads never shuffle), the re-extract scans
only rows joining those keys (left-semi on url BEFORE the Python stage),
and the extracted-table update is the catalog's copy-on-write merge
(rewrites only files containing touched urls). A 10^12-document corpus
where a daily recrawl touches 0.1% of urls does ~0.1% of the full-backfill
work, not a full re-extraction.

Snapshot bookkeeping: the caller passes ``since`` = the pages-table
snapshot id it last processed (record it wherever your orchestration keeps
state — the returned dict carries the snapshot id that was processed so
the next run can pass it back). ``since=None`` means "parent of HEAD",
the diff default.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from final_ocr_spark.operators.extract_pages import extract_pages
from final_ocr_spark.sources.catalog import SnapshotCatalog


def incremental_extract(
    spark: SparkSession,
    cat: SnapshotCatalog,
    *,
    pages_table: str = "pages",
    extracted_table: str = "extracted",
    since: int | None = None,
    extract_partitions: int | None = None,
) -> dict:
    """Process pages-table changes since snapshot ``since`` into
    ``extracted_table`` (created on first run). Returns
    ``{processed_snapshot, n_changed, n_extracted, n_removed}``.
    Idempotent per (since → HEAD) window: re-running the same window
    merges identical rows onto identical keys."""
    head = cat.current_snapshot(pages_table)
    if head is None:
        raise FileNotFoundError(f"no such table: {pages_table!r}")

    try:
        cat.read(spark, extracted_table)
        exists = True
    except FileNotFoundError:
        exists = False

    if since is not None and not exists:
        # an explicit window against a missing extracted table would
        # silently create a PARTIAL table (only that window's urls) —
        # inconsistent orchestration state; demand an explicit backfill
        raise ValueError(
            f"extracted table {extracted_table!r} does not exist but "
            f"since={since} was given — run once with since=None to "
            "backfill, then resume incremental windows"
        )

    pages = cat.read(spark, pages_table)
    if since is None and (not exists or head["parent_id"] is None):
        # no prior processing state (extracted table absent, or the pages
        # table has only its first snapshot): everything is "changed" —
        # full backfill. Without the `exists` clause, a first run against
        # a multi-snapshot pages table would silently process only the
        # parent→HEAD window and create a partial extracted table
        # (review-caught, test-pinned).
        n_changed = None
        removed_keys = None
        n_removed = 0
    else:
        # the diff feeds four consumers (two counts, the semi-join, the
        # delete) — localCheckpoint so the two-snapshot fingerprint join
        # computes once, not four times (the pinned recompute pitfall)
        changed = cat.diff(
            spark, pages_table, from_snapshot=since
        ).localCheckpoint(eager=False)
        upd_keys = changed.filter(
            F.col("change").isin("added", "modified")
        ).select("url")
        removed_keys = changed.filter(F.col("change") == "removed").select("url")
        n_changed = upd_keys.count()
        n_removed = removed_keys.count()
        # re-extract ONLY the changed urls: the semi-join lands before the
        # Python stage, so unchanged page payloads are never decoded again
        pages = pages.join(upd_keys, "url", "left_semi")

    # row-accounting invariant this loop relies on (pinned by
    # test_changed_to_junk_payload_updates): extract_pages emits EXACTLY
    # one row per input url — junk/binary payloads become empty-text or
    # quarantine rows, never dropped rows — so merge always covers every
    # changed url and stale extracted rows cannot survive a modification.
    ext = extract_pages(pages, dedup=True, partitions=extract_partitions)

    stats: dict = {
        "processed_snapshot": head["snapshot_id"],
        "n_removed": n_removed,
        "n_changed": n_changed,
    }

    if not exists:
        snap = cat.write(ext, extracted_table, mode="append")
        stats["n_extracted"] = snap["row_count_added"]
        if stats["n_changed"] is None:
            stats["n_changed"] = stats["n_extracted"]
        return stats

    m = cat.merge(spark, ext, extracted_table, key="url")
    # rows_written counts survivors + updates inside rewritten files; the
    # change-proportional number the caller schedules by is n_changed
    stats["n_extracted"] = m["rows_written"]
    if stats["n_changed"] is None:
        stats["n_changed"] = stats["n_extracted"]
    if n_removed and removed_keys is not None:
        cat.delete(spark, removed_keys, extracted_table, key="url")
    return stats
