"""Resume test (SURVEY §5.2): kill after K of G groups, rerun, assert only the
remainder recomputes and the final table equals an uninterrupted run."""

from __future__ import annotations

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
    full_dir = tmp_path / "full"
    resume_dir = tmp_path / "resumed"

    # uninterrupted reference run
    full = extract_with_resume(spark, pages, str(full_dir), num_parts=16, num_groups=4)
    want = _rows(full)

    # crash after 2 of 4 group commits
    with pytest.raises(RuntimeError, match="injected failure"):
        extract_with_resume(
            spark, pages, str(resume_dir), num_parts=16, num_groups=4,
            _fail_after_groups=2,
        )
    m = PartitionManifest(str(resume_dir))
    done_before = m.done_parts()
    assert 0 < len(done_before) < 16

    # resume: finishes the remaining groups only
    resumed = extract_with_resume(
        spark, pages, str(resume_dir), num_parts=16, num_groups=4
    )
    assert _rows(resumed) == want
    assert m.done_parts() == set(range(16))

    # manifest lineage + metrics are present and consistent
    entries = m.entries()
    assert all(e["app_id"] and e["code_version"] for e in entries)
    assert sum(e["row_count"] for e in entries) >= len(want)


def test_rerun_is_noop(spark, pages, tmp_path):
    out = tmp_path / "out"
    first = extract_with_resume(spark, pages, str(out), num_parts=8, num_groups=2)
    n_entries = len(PartitionManifest(str(out)).entries())
    again = extract_with_resume(spark, pages, str(out), num_parts=8, num_groups=2)
    # no new commits, identical content
    assert len(PartitionManifest(str(out)).entries()) == n_entries
    assert _rows(first) == _rows(again)
