"""Sequence packing for LLM training: map a document corpus onto the
fixed-token-budget training chunks formed by concatenating all documents in
a deterministic order and slicing every ``budget`` tokens (the GPT-style
packing layout — documents may span chunk boundaries).

The core primitive is a **global prefix sum** over a 10^12-row table. A
single ``Window.orderBy(key)`` is one task sorting the world — the
canonical scale-killer — so this does the classic two-pass form instead:

1. ``repartitionByRange(key)`` — RangePartitioner gives ordered, disjoint
   key ranges on ascending partition ids;
2. per-partition cumulative sum (window partitioned by partition id — each
   task sorts only its own range);
3. partition TOTALS (one row per partition — thousands, not trillions) are
   prefix-summed on the driver and broadcast-joined back as offsets.

The only driver-side work is O(num_partitions) — the standard
justified-collect shape (PLANS.md), same as IVF centroid training.

The reference repo stops at per-document text; packing is what its output
feeds at training time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "offset",
    num_partitions: int | None = None,
) -> DataFrame:
    """df + ``out_col`` = sum of ``value_col`` over all rows strictly before
    this row in ``order_col`` order (exclusive prefix sum). ``order_col``
    must be unique for a deterministic result, and ``value_col`` must be
    NON-NEGATIVE (per-partition totals are taken as max of the running
    sum, which equals the final sum only when it never decreases — token
    counts and byte sizes qualify; signed deltas do not)."""
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    d = df.repartitionByRange(int(n), F.col(order_col))
    d = d.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(order_col)
    d = d.withColumn(
        "_cum_incl", F.sum(F.col(value_col).cast("long")).over(w)
    )
    # materialize BEFORE the totals collect: the collect below and the
    # returned join are two separate jobs — without a barrier each re-runs
    # repartitionByRange, whose sampled boundaries (and thus _pid
    # assignments) are not guaranteed identical across runs, silently
    # corrupting every offset. Checkpointing also halves the compute.
    d = d.localCheckpoint(eager=False)
    # one row per partition — driver-side prefix is O(num_partitions)
    totals = sorted(
        (r["_pid"], r["_t"])
        for r in d.groupBy("_pid").agg(F.max("_cum_incl").alias("_t")).collect()
    )
    prefix, acc = {}, 0
    for pid, t in totals:
        prefix[pid] = acc
        acc += t or 0
    pref_df = df.sparkSession.createDataFrame(
        [(pid, p) for pid, p in prefix.items()], "_pid int, _prefix long"
    )
    return (
        d.join(F.broadcast(pref_df), "_pid")
        .withColumn(
            out_col,
            F.col("_prefix") + F.col("_cum_incl") - F.col(value_col).cast("long"),
        )
        .drop("_pid", "_cum_incl", "_prefix")
    )


def pack_sequences(
    df: DataFrame,
    order_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """df + packing layout columns:

    * ``offset`` — global token offset of the document's first token,
    * ``chunk_id`` — training chunk containing that first token,
    * ``pos_in_chunk`` — position inside that chunk,
    * ``n_chunks`` — number of chunks the document spans.

    All integer arithmetic (``x - pmod(x, b)`` division — float division
    flips vs other engines, PLANS.md pitfall)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    d = global_prefix_sum(df, order_col, token_col)
    b = F.lit(budget)
    off = F.col("offset")
    end = off + F.col(token_col).cast("long")  # exclusive
    # true integer division (`div`), never `/`: long/long `/` is DOUBLE
    # division, which loses exactness past 2^53 — real at 10^12-doc global
    # token offsets (and would diverge from the oracle's integer `//`).
    d = d.withColumn("_last_tok", F.greatest(end - 1, off))
    return (
        d.withColumn("chunk_id", F.expr(f"offset div {budget}"))
        .withColumn("pos_in_chunk", F.pmod(off, b))
        .withColumn(
            "n_chunks",
            F.expr(f"_last_tok div {budget}") - F.col("chunk_id") + 1,
        )
        .drop("_last_tok")
    )
