"""Bucketed-table tests: the whole point is the PLAN SHAPE — a join between
two co-bucketed tables must contain ZERO Exchange operators (the write-time
shuffle already co-located the rows). Result equality vs a plain join is
pinned alongside, and the guard rails (unbucketed / key-mismatch /
count-mismatch) must refuse loudly instead of silently shuffling."""

from __future__ import annotations

import pytest

from final_ocr_spark.sources.bucketed import (
    bucket_spec,
    bucketed_join,
    write_bucketed,
)


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    left = spark.range(0, 500).selectExpr(
        "id", "concat('host', id % 37) AS host", "id * 2 AS score")
    right = spark.range(0, 300).selectExpr("id", "concat('t', id) AS tag")
    write_bucketed(left, "b_left", ["id"], 8, path=str(tmp_path / "l"))
    write_bucketed(right, "b_right", ["id"], 8, path=str(tmp_path / "r"))
    yield "b_left", "b_right"
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")


def test_bucket_spec_roundtrip(spark, bucketed_pair):
    spec = bucket_spec(spark, "b_left")
    assert spec == {"keys": ["id"], "buckets": 8, "sort": ["id"]}


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    # at toy scale the planner would broadcast the 300-row side (which
    # disables the bucketed scan as unnecessary — also fine, but not what
    # this test pins); force the sort-merge path a 100-TB join would take
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "b_left", "b_right", on=["id"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # ...and the shuffle-free plan returns exactly the plain-join rows
        expect = (
            spark.table("b_left").join(spark.table("b_right"), "id").count()
        )
        assert j.count() == expect == 300
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_pair):
    agg = spark.table("b_left").groupBy("id").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 500


def test_guard_rails(spark, bucketed_pair, tmp_path):
    plain = spark.range(10).selectExpr("id", "'x' AS v")
    plain.write.mode("overwrite").option(
        "path", str(tmp_path / "p")).saveAsTable("b_plain")
    other = spark.range(10).selectExpr("id", "'y' AS w")
    write_bucketed(other, "b_other16", ["id"], 16, path=str(tmp_path / "o"))
    try:
        with pytest.raises(ValueError, match="not bucketed"):
            bucketed_join(spark, "b_left", "b_plain", on=["id"])
        with pytest.raises(ValueError, match="bucket keys == join keys"):
            bucketed_join(spark, "b_left", "b_right", on=["host"])
        with pytest.raises(ValueError, match="bucket counts differ"):
            bucketed_join(spark, "b_left", "b_other16", on=["id"])
    finally:
        spark.sql("DROP TABLE IF EXISTS b_plain")
        spark.sql("DROP TABLE IF EXISTS b_other16")
