"""Plan-shape regression tests for the round-2 corpus operators: the claims
PLANS.md makes about exchanges/pushdown must stay true in the optimized
physical plan."""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_repetition_features_no_exchange(spark):
    """Gopher repetition metrics are scan-local Column folds — ZERO
    exchanges (they must ride the extraction scan at 100 TB)."""
    from final_ocr_spark.operators.repetition import repetition_features

    df = spark.createDataFrame([(1, "a b\nc d\na b")], ["doc_id", "text"])
    feats = repetition_features(F.col("text"))
    out = df.select("doc_id", *[c.alias(k) for k, c in feats.items()])
    assert "Exchange" not in _plan(out)


def test_deterministic_sample_is_pushed_filter(spark, tmp_path):
    """The md5 sample is a pure filter: no exchange, and it sits directly on
    the scan (one WholeStageCodegen over FileScan → Filter)."""
    from final_ocr_spark.operators.sampling import deterministic_sample

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(i, f"d{i}") for i in range(100)], ["k", "t"]) \
        .write.parquet(p)
    out = deterministic_sample(spark.read.parquet(p), "k", 0.5)
    plan = _plan(out)
    assert "Exchange" not in plan
    assert "Filter" in plan


def test_asof_join_single_exchange(spark):
    """asof_join is the union+window form: exactly ONE exchange (by key),
    never a range-exploded join (no BroadcastNestedLoop / Cartesian)."""
    from datetime import datetime

    from final_ocr_spark.operators.events import asof_join

    ts = datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, ts, "a")], ["uid", "lts", "tag"])
    right = spark.createDataFrame([(1, ts, 1.0)], ["uid", "rts", "price"])
    out = asof_join(left, right, on="uid", left_ts="lts", right_ts="rts",
                    right_cols=["price"])
    plan = _plan(out)
    # the union feeds ONE exchange (the streams are unioned pre-shuffle)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_sessionize_single_exchange(spark):
    from datetime import datetime

    from final_ocr_spark.operators.events import sessionize

    df = spark.createDataFrame([(1, datetime(2024, 1, 1))], ["uid", "ts"])
    plan = _plan(sessionize(df, "uid", "ts", 3600))
    assert plan.count("Exchange") == 1


def test_minhash_sigs_partial_aggregation(spark):
    """The signature aggregation must show a partial/final hash-agg pair
    (map-side combine collapses shingle rows before the exchange)."""
    from final_ocr_spark.operators.dedup import minhash_sigs

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j k")], ["doc_id", "text"])
    plan = _plan(minhash_sigs(df, num_hashes=8))
    assert "partial_min" in plan or "partial min" in plan.lower()


def test_sessionize_chunked_partitions_by_key_and_chunk(spark):
    """The chunked skew guard's HEAVY window must partition by
    (key, _chunk) — that is the mechanism that spreads a hot key across
    tasks — and the plan must stay join-light (sort-merge/shuffle-hash on
    equi-keys only, no nested-loop/cartesian)."""
    from datetime import datetime

    from final_ocr_spark.operators.events import sessionize

    ts = datetime(2024, 1, 1)
    df = spark.createDataFrame([(1, ts)], ["uid", "ts"])
    out = sessionize(df, "uid", "ts", gap_seconds=60, chunk_seconds=3600)
    plan = _plan(out)
    assert "hashpartitioning(uid" in plan and "_chunk" in plan.split(
        "hashpartitioning(uid", 1)[1].split(")")[0]
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_asof_join_chunked_partitions_by_key_and_chunk(spark):
    from datetime import datetime

    from final_ocr_spark.operators.events import asof_join

    ts = datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, ts, "a")], ["uid", "lts", "tag"])
    right = spark.createDataFrame([(1, ts, 1.0)], ["uid", "rts", "price"])
    out = asof_join(left, right, on="uid", left_ts="lts", right_ts="rts",
                    right_cols=["price"], chunk_seconds=3600)
    plan = _plan(out)
    assert "hashpartitioning(uid" in plan and "_chunk" in plan.split(
        "hashpartitioning(uid", 1)[1].split(")")[0]
    assert "NestedLoop" not in plan and "Cartesian" not in plan
