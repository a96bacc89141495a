"""Resume tests (SURVEY §5.2): crash → rerun must recompute only the
remainder, never duplicate rows, and never rescan the raw input in staged
mode."""

from __future__ import annotations

import shutil

import pytest

from final_ocr_spark.plans.manifest import PartitionManifest, extract_with_resume

N_DOCS, SEED = 300, 42


@pytest.fixture()
def pages(spark):
    from final_ocr_spark.sources.synthetic_pages import gen_pages

    return gen_pages(spark, N_DOCS, seed=SEED, partitions=8)


def _rows(df):
    return sorted(
        (r["url"], r["extracted_text"], r["lang"], r["doc_kind"])
        for r in df.collect()
    )


def test_resume_after_injected_failure(spark, pages, tmp_path):
    """Staged mode: crash after 2 of 4 group commits, resume finishes the
    rest — and does so WITHOUT the raw input (deleted before resume), proving
    the one-scan-then-prune design."""
    full_dir = tmp_path / "full"
    resume_dir = tmp_path / "resumed"

    # uninterrupted single-pass reference run
    full = extract_with_resume(spark, pages, str(full_dir), num_parts=16)
    want = _rows(full)

    # staged mode needs a FILE input so we can prove it is read exactly once
    raw_dir = tmp_path / "raw_pages"
    pages.write.parquet(str(raw_dir))
    pages_on_disk = spark.read.parquet(str(raw_dir))

    # crash after 2 of 4 group commits
    with pytest.raises(RuntimeError, match="injected failure"):
        extract_with_resume(
            spark, pages_on_disk, str(resume_dir), num_parts=16, num_groups=4,
            _fail_after_groups=2,
        )
    m = PartitionManifest(str(resume_dir))
    done_before = m.done_parts()
    assert 0 < len(done_before) < 16

    # the raw input is deleted: resume may only read the part_id-partitioned
    # stage (round 1 re-filtered the raw input once per group — at 100 TB
    # that was num_groups full scans)
    shutil.rmtree(raw_dir)
    resumed = extract_with_resume(
        spark, pages_on_disk, str(resume_dir), num_parts=16, num_groups=4
    )
    assert _rows(resumed) == want
    assert m.done_parts() == set(range(16))

    # manifest lineage + metrics are present and consistent
    entries = m.entries()
    assert sum(1 for e in entries if e.get("status") == "staged") == 1
    done_entries = [e for e in entries if e.get("status") == "done"]
    assert all(e["app_id"] and e["code_version"] for e in done_entries)
    assert sum(e["row_count"] for e in done_entries) >= len(want)


def test_crash_between_write_and_commit_is_idempotent(spark, pages, tmp_path):
    """ADVICE round 1: a crash in the window after the parquet write commits
    but before mark_done() must NOT duplicate rows on resume. The dynamic
    partition overwrite makes the rerun replace those part dirs instead of
    appending to them."""
    out = tmp_path / "out"
    want = _rows(extract_with_resume(spark, pages, str(tmp_path / "ref"), num_parts=8))

    with pytest.raises(RuntimeError, match="before commit"):
        extract_with_resume(
            spark, pages, str(out), num_parts=8, _fail_after_groups=1
        )
    # data was written but nothing committed
    assert PartitionManifest(str(out)).done_parts() == set()
    assert spark.read.parquet(str(out)).count() > 0

    resumed = extract_with_resume(spark, pages, str(out), num_parts=8)
    assert _rows(resumed) == want  # identical — no duplicate rows


def test_rerun_is_noop(spark, pages, tmp_path):
    out = tmp_path / "out"
    first = extract_with_resume(spark, pages, str(out), num_parts=8, num_groups=2)
    n_entries = len(PartitionManifest(str(out)).entries())
    again = extract_with_resume(spark, pages, str(out), num_parts=8, num_groups=2)
    # no new commits, identical content
    assert len(PartitionManifest(str(out)).entries()) == n_entries
    assert _rows(first) == _rows(again)


def test_group_scan_is_partition_pruned(spark, pages, tmp_path):
    """The staged-mode per-group read must prune to its own part_id
    directories (PartitionFilters), not scan the whole stage."""
    from pyspark.sql import functions as F

    out = tmp_path / "out"
    extract_with_resume(spark, pages, str(out), num_parts=8, num_groups=2)
    stage = spark.read.parquet(str(out / "_stage"))
    probe = stage.filter(F.col("part_id").isin([0, 2, 4, 6]))
    plan = probe._jdf.queryExecution().toString()
    assert "PartitionFilters: [part_id" in plan
