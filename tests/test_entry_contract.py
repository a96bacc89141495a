"""Driver-contract consistency checks (cheap, no Spark jobs beyond entry)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert os_ <= qs, f"oracles without queries: {os_ - qs}"


def test_rows_only_queries_documented():
    # every query without an oracle must be one of the known non-SQL ops
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    rows_only = qs - os_
    # round 2: every query is oracle-checked — SQL-expressible ops against
    # live DuckDB SQL, deterministic non-SQL ops (extraction, fake-codec
    # multimodal, simhash hamming-ball) against committed golden VALUES
    assert rows_only == set()


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["url", "lang", "doc_kind", "n_chars", "n_blocks", "n_spans"]


def test_query_count_fits_driver_gate_cap():
    """The driver's correctness gate checks exactly 50 queries (r2 proved a
    51st silently gets no row). Stay AT the cap so every registered query
    has a hard driver signal; fold new checks into existing slots like
    q19's stage column instead of appending past 50."""
    assert len(entrymod.queries()) == 50
