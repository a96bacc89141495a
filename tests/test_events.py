"""As-of join and sessionization."""

from datetime import datetime

from pyspark.sql import functions as F

from final_ocr_spark.operators.events import asof_join, session_stats, sessionize


def _ts(m):
    return datetime(2024, 1, 1, 0, m, 0)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "a"), (1, _ts(20), "b"), (2, _ts(10), "c"), (3, _ts(1), "d")],
        ["uid", "lts", "tag"])
    right = spark.createDataFrame(
        [(1, _ts(3), 100.0), (1, _ts(10), 200.0), (2, _ts(10), 300.0)],
        ["uid", "rts", "price"])
    got = {r["tag"]: r["price"] for r in
           asof_join(left, right, on="uid", left_ts="lts", right_ts="rts",
                     right_cols=["price"]).collect()}
    assert got == {
        "a": 100.0,   # latest right <= 00:05 is 00:03
        "b": 200.0,   # 00:10 precedes 00:20
        "c": 300.0,   # exact tie matches (<=)
        "d": None,    # nothing precedes
    }


def test_asof_join_null_right_field_still_wins(spark):
    left = spark.createDataFrame([(1, _ts(10), "x")], ["uid", "lts", "tag"])
    right = spark.createDataFrame(
        [(1, _ts(2), 7.0), (1, _ts(5), None)], "uid long, rts timestamp, price double")
    got = asof_join(left, right, on="uid", left_ts="lts", right_ts="rts",
                    right_cols=["price"]).collect()[0]
    assert got["price"] is None  # the 00:05 ROW wins even though its field is null


def test_asof_join_tiebreak(spark):
    left = spark.createDataFrame([(1, _ts(10), "x")], ["uid", "lts", "tag"])
    right = spark.createDataFrame(
        [(1, _ts(5), 1, 10.0), (1, _ts(5), 2, 20.0)],
        ["uid", "rts", "eid", "price"])
    got = asof_join(left, right, on="uid", left_ts="lts", right_ts="rts",
                    right_cols=["price"], tiebreak="eid").collect()[0]
    assert got["price"] == 20.0  # greatest tiebreak wins


def test_sessionize_and_stats(spark):
    rows = [(1, _ts(0)), (1, _ts(2)), (1, _ts(40)), (1, _ts(41)), (2, _ts(0))]
    df = spark.createDataFrame(rows, ["uid", "ts"])
    s = {(r["uid"], r["ts"].minute): r["session_id"]
         for r in sessionize(df, "uid", "ts", gap_seconds=600).collect()}
    assert s == {(1, 0): 1, (1, 2): 1, (1, 40): 2, (1, 41): 2, (2, 0): 1}
    stats = {(r["uid"], r["session_id"]): (r["n_events"], r["duration_sec"])
             for r in session_stats(df, "uid", "ts", gap_seconds=600).collect()}
    assert stats == {(1, 1): (2, 120), (1, 2): (2, 60), (2, 1): (1, 0)}
