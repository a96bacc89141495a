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
bound as any per-key ordered semantics. Both operators therefore accept
``chunk_seconds``: a two-phase time-chunked mode where the heavy window
runs over ``(key, time_chunk)`` — a hot key's events spread across
time chunks and hence tasks — and per-key sequential work shrinks to one
O(#chunks)-row summary window (the same global-prefix-without-global-
window pattern as packing.py). Output is IDENTICAL to the single-window
form (equivalence + planted-hot-key tests in tests/test_events.py). For
bounded-memory streaming sessionization see streaming/stateful.py
(applyInPandasWithState).
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
    chunk_seconds: int | None = None,
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

    ``chunk_seconds`` (skew guard): the window runs over
    ``(key, floor(ts/chunk_seconds))`` instead — a hot key's rows split
    across tasks — and the carry-in for each chunk (the last right row of
    all earlier chunks) comes from an O(#chunks)-row per-key summary
    window joined back on (key, chunk). Identical output (test-pinned);
    chunk boundaries are time-ordered, so any right row in an earlier
    chunk precedes every left row in a later one.
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
    order = [F.col("_ts"), F.col("_side"), F.col("_tie").asc_nulls_first()]
    if chunk_seconds is None:
        w = (
            Window.partitionBy(on).orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = unioned.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    else:
        chunked = unioned.withColumn(
            "_chunk", F.floor(F.unix_timestamp(F.col("_ts")) / chunk_seconds)
        )
        w_local = (
            Window.partitionBy(on, "_chunk").orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = chunked.withColumn(
            "_local", F.last("_r", ignorenulls=True).over(w_local)
        )
        # per-(key, chunk) last right row: max_by over (ts, tie) of right
        # rows — then expanded to EVERY populated (key, chunk) cell (chunks
        # holding only left rows still need the carry from earlier chunks)
        right_last = (
            chunked.filter(F.col("_side") == 0)
            .groupBy(on, "_chunk")
            .agg(
                F.max_by("_r", F.struct(F.col("_ts"), F.col("_tie"))).alias("_last_r")
            )
        )
        all_cells = chunked.select(on, "_chunk").distinct()
        summ = all_cells.join(right_last, [on, "_chunk"], "left")
        w_carry = (
            Window.partitionBy(on).orderBy("_chunk")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = summ.withColumn(
            "_carry", F.last("_last_r", ignorenulls=True).over(w_carry)
        ).select(on, "_chunk", "_carry")
        filled = (
            local.join(carry, [on, "_chunk"], "left")
            .withColumn("_match", F.coalesce(F.col("_local"), F.col("_carry")))
            .drop("_chunk", "_local", "_carry")
        )
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
    chunk_seconds: int | None = None,
) -> DataFrame:
    """df + ``session_col``: 1-based session index per key; a new session
    starts when the gap since the previous event exceeds ``gap_seconds``
    (strictly greater). One shuffle on key.

    ``chunk_seconds`` (skew guard): two-phase form. Phase 1 sessionizes
    within ``(key, floor(ts/chunk_seconds))`` — parallel across a hot
    key's time chunks. Phase 2 reduces each chunk to one summary row
    (min/max ts, local session count) and runs the only per-key sequential
    work over those O(#chunks) rows: chunk c's first local session merges
    into chunk c-1's last session iff the boundary gap is within
    ``gap_seconds``, and the global id offset is the running sum of
    (local sessions − merges). Identical output (equivalence-fuzzed +
    planted-hot-key tests); session boundaries depend only on consecutive
    gaps, and time chunking preserves event adjacency across boundaries.
    """
    # unix_timestamp, not cast("long"): TIMESTAMP_NTZ rejects the cast under
    # ANSI mode (the driver's session); floor-to-second either way
    es = F.unix_timestamp(F.col(ts_col))
    if chunk_seconds is None:
        w = Window.partitionBy(key).orderBy(ts_col)
        prev = F.lag(es).over(w)
        new_sess = F.when(prev.isNull() | ((es - prev) > gap_seconds), 1).otherwise(0)
        return df.withColumn(
            session_col,
            F.sum(new_sess).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    chunked = df.withColumn("_es", es).withColumn(
        "_chunk", F.floor(F.col("_es") / chunk_seconds)
    )
    w_local = Window.partitionBy(key, "_chunk").orderBy(ts_col)
    prev = F.lag(F.col("_es")).over(w_local)
    flag = F.when(prev.isNull() | ((F.col("_es") - prev) > gap_seconds), 1).otherwise(0)
    local = chunked.withColumn(
        "_local",
        F.sum(flag).over(
            w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # one row per (key, chunk): the ONLY per-key sequential pass is over these
    summ = local.groupBy(key, "_chunk").agg(
        F.min("_es").alias("_first"),
        F.max("_es").alias("_last"),
        F.max("_local").alias("_nsess"),
    )
    w_summ = Window.partitionBy(key).orderBy("_chunk")
    prev_last = F.lag(F.col("_last")).over(w_summ)
    merge = F.when(
        prev_last.isNotNull() & ((F.col("_first") - prev_last) <= gap_seconds), 1
    ).otherwise(0)
    adj = summ.withColumn("_merge", merge).withColumn(
        # global id for local session s in chunk c:  s + offset(c) − merge(c)
        # where offset(c) = Σ_{c'<c} (nsess − merge)  — running sum shifted
        "_adj",
        F.coalesce(
            F.sum(F.col("_nsess") - F.col("_merge")).over(
                w_summ.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        - F.col("_merge"),
    ).select(key, "_chunk", "_adj")
    return (
        local.join(adj, [key, "_chunk"])
        .withColumn(session_col, F.col("_local") + F.col("_adj"))
        .drop("_es", "_chunk", "_local", "_adj")
    )


def session_stats(
    df: DataFrame, key: str, ts_col: str, gap_seconds: int,
    chunk_seconds: int | None = None,
) -> DataFrame:
    """Per-session rollup: (key, session_id, n_events, start, end,
    duration_sec). ``chunk_seconds`` selects the skew-guarded two-phase
    sessionize; the rollup itself partial-aggregates map-side either way."""
    s = sessionize(df, key, ts_col, gap_seconds, chunk_seconds=chunk_seconds)
    return s.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.max(F.unix_timestamp(F.col(ts_col)))
            - F.min(F.unix_timestamp(F.col(ts_col)))
        ).alias("duration_sec"),
    )
