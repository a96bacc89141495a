"""Event-stream operators: as-of join and sessionization.

Two operators Spark SQL lacks as primitives but event/training-log
processing needs constantly, both expressed as ONE-shuffle window plans —
never a range-exploded join:

* :func:`asof_join` — for each left row, the latest right row with
  ``right_ts <= left_ts`` per key (the time-series point-in-time join).
  The naive SQL (`l JOIN r ON key AND r.ts <= l.ts` + max-filter) explodes
  to O(|l|·|r|) per key; this implementation unions the tagged streams and
  takes a running ``last(ignorenulls)`` over one window — O((|l|+|r|)
  log(...)) per key, one exchange, AQE-friendly.
* :func:`sessionize` — gap-based session assignment (a new session starts
  when the inter-event gap exceeds ``gap_seconds``): lag + running sum of
  session-start flags over the same single window shape.

Skew note: both partition by the join/session key; a pathological single
key (one user with millions of events) serializes in one task — the same
bound as any per-key ordered semantics. For bounded-memory streaming
sessionization see streaming/stateful.py (applyInPandasWithState).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Left rows + the latest right row (``right_ts <= left_ts``) per
    ``on`` key; right columns come back NULL when no right row precedes.

    Ties at the exact same timestamp match (<=). When several right rows
    share (key, ts), pass ``tiebreak`` (a right column) — the row with the
    greatest tiebreak value wins deterministically.

    Implementation: tag and union both sides, then one window per key
    ordered by (ts, side) carrying the right row's packed struct forward
    with ``last(ignorenulls=True)``. Packing right columns into ONE struct
    means a right row whose individual column is legitimately NULL still
    "wins" (ignorenulls skips missing ROWS, not missing fields).
    """
    r_struct = F.struct(*[F.col(c).alias(c) for c in right_cols])
    r = right.select(
        F.col(on).alias(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tie"),
        r_struct.alias("_r"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tie"].dataType).alias("_tie"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts"), F.col("_side"), F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1).drop("_ts", "_side", "_tie", "_r")
    for c in right_cols:
        out = out.withColumn(c, F.col("_match")[c])
    return out.drop("_match")


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """df + ``session_col``: 1-based session index per key; a new session
    starts when the gap since the previous event exceeds ``gap_seconds``
    (strictly greater). One shuffle on key."""
    w = Window.partitionBy(key).orderBy(ts_col)
    # unix_timestamp, not cast("long"): TIMESTAMP_NTZ rejects the cast under
    # ANSI mode (the driver's session); floor-to-second either way
    es = F.unix_timestamp(F.col(ts_col))
    prev = F.lag(es).over(w)
    new_sess = F.when(prev.isNull() | ((es - prev) > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame, key: str, ts_col: str, gap_seconds: int
) -> DataFrame:
    """Per-session rollup: (key, session_id, n_events, start, end,
    duration_sec)."""
    s = sessionize(df, key, ts_col, gap_seconds)
    return s.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.max(F.unix_timestamp(F.col(ts_col)))
            - F.min(F.unix_timestamp(F.col(ts_col)))
        ).alias("duration_sec"),
    )
