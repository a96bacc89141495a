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


def test_asof_join_chunked_equivalence_fuzz(spark):
    """chunk_seconds mode must be row-identical to the single-window form
    on a randomized corpus (multiple keys, ties, right-free chunks)."""
    import random

    rng = random.Random(11)
    left = [(k, _ts(rng.randrange(0, 59)), f"t{k}-{i}")
            for k in (1, 2, 3) for i in range(40)]
    right = [(k, _ts(rng.randrange(0, 59)), float(i))
             for k in (1, 2) for i in range(25)]
    ldf = spark.createDataFrame(left, ["uid", "lts", "tag"])
    rdf = spark.createDataFrame(right, ["uid", "rts", "price"])

    def snap(df):
        return sorted((r["uid"], r["lts"], r["tag"], r["price"])
                      for r in df.collect())

    plain = snap(asof_join(ldf, rdf, on="uid", left_ts="lts", right_ts="rts",
                           right_cols=["price"], tiebreak="price"))
    for chunk in (60, 300, 3600, 10**9):  # several boundaries incl. one-chunk
        chunked = snap(asof_join(ldf, rdf, on="uid", left_ts="lts",
                                 right_ts="rts", right_cols=["price"],
                                 tiebreak="price", chunk_seconds=chunk))
        assert chunked == plain, f"chunk_seconds={chunk}"


def test_sessionize_chunked_equivalence_fuzz(spark):
    import random

    rng = random.Random(23)
    rows = [(k, _ts(rng.randrange(0, 59))) for k in (1, 2, 3)
            for _ in range(50)]
    df = spark.createDataFrame(rows, ["uid", "ts"])

    def snap(d):
        return sorted((r["uid"], r["ts"], r["session_id"]) for r in d.collect())

    plain = snap(sessionize(df, "uid", "ts", gap_seconds=180))
    for chunk in (60, 240, 3600, 10**9):
        chunked = snap(sessionize(df, "uid", "ts", gap_seconds=180,
                                  chunk_seconds=chunk))
        assert chunked == plain, f"chunk_seconds={chunk}"


def test_sessionize_chunked_hot_key(spark):
    """Planted hot key: one user with 5000 events (plus cold keys). The
    chunked mode must (a) produce identical sessions and (b) actually split
    the hot key across many (key, chunk) cells — the bounded-task-time
    evidence a real cluster relies on."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    hot = [(99, base + timedelta(seconds=17 * i)) for i in range(5000)]
    cold = [(k, base + timedelta(seconds=900 * i)) for k in (1, 2) for i in range(5)]
    df = spark.createDataFrame(hot + cold, ["uid", "ts"]).repartition(16)

    chunk = 3600  # hot key spans ~23.6h -> ~24 chunks
    plain = {(r["uid"], r["ts"]): r["session_id"]
             for r in sessionize(df, "uid", "ts", gap_seconds=60).collect()}
    got = {(r["uid"], r["ts"]): r["session_id"]
           for r in sessionize(df, "uid", "ts", gap_seconds=60,
                               chunk_seconds=chunk).collect()}
    assert got == plain
    n_cells = (
        df.filter("uid = 99")
        .select(F.floor(F.unix_timestamp("ts") / chunk).alias("c"))
        .distinct().count()
    )
    assert n_cells >= 20  # hot key genuinely parallelized across cells

    # session boundaries crossing chunk edges merge correctly: 17s gaps
    # never exceed gap_seconds=60, so the hot key is ONE session throughout
    assert {v for (k, _), v in got.items() if k == 99} == {1}

    stats = session_stats(df, "uid", "ts", gap_seconds=60,
                          chunk_seconds=chunk)
    hot_row = stats.filter("uid = 99").collect()[0]
    assert hot_row["n_events"] == 5000 and hot_row["session_id"] == 1


def test_asof_join_chunked_carry_through_rightless_chunks(spark):
    """A right row many chunks in the past must still match a left row whose
    intervening chunks contain no right rows (the carry-expansion path)."""
    left = spark.createDataFrame([(1, _ts(50), "x")], ["uid", "lts", "tag"])
    right = spark.createDataFrame([(1, _ts(1), 42.0)], ["uid", "rts", "price"])
    got = asof_join(left, right, on="uid", left_ts="lts", right_ts="rts",
                    right_cols=["price"], chunk_seconds=60).collect()[0]
    assert got["price"] == 42.0
