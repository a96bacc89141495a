"""Custom stateful streaming operator (SURVEY §2.8): per-host crawl quota.

A training-data pipeline caps how many documents any single host may
contribute (the C4/RefinedWeb per-domain cap) — in streaming form that is a
counter per host that must SURVIVE micro-batches, i.e. exactly the
``applyInPandasWithState`` shape: grouped Arrow batches in, bounded per-group
state, rows out. The reference has no streaming at all; this is the
operator's cluster-scale generalization (its per-run accumulation state,
ocr2.py:609-611, made incremental).

State per host is one long (documents already taken) — bounded by the number
of distinct hosts, the smallest possible state for the semantics. Rows inside
a batch are taken in deterministic (warc_ts, url) order so reruns of the same
batch sequence emit identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from final_ocr_spark.schema import PAGES_SCHEMA

_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"

_OUT_SCHEMA = ", ".join(
    f"{f.name} {f.dataType.simpleString()}" for f in PAGES_SCHEMA.fields
) + ", host string"
_STATE_SCHEMA = "taken long"


def with_host(pages: DataFrame) -> DataFrame:
    """Pages + extracted host column (empty scheme → 'unknown')."""
    host = F.nullif(F.regexp_extract("url", _HOST_RE, 1), F.lit(""))
    return pages.withColumn("host", F.coalesce(host, F.lit("unknown")))


def _quota_fn(quota: int):
    import pandas as pd

    def enforce(key, pdfs, state: GroupState):
        # A group arrives as an ITERATOR of Arrow chunks (~10k rows each);
        # the deterministic "(warc_ts, url) first" contract must hold over
        # the WHOLE group, so keep a running best-of set of at most `room`
        # rows across chunks (memory bounded by room + one chunk) — taking
        # per-chunk would make the output depend on Arrow chunking
        # (round-2 review finding; pinned by
        # test_host_quota_stream_multi_chunk_determinism).
        taken = state.get[0] if state.exists else 0
        room = quota - taken
        best = None
        for pdf in pdfs:  # must drain the iterator regardless
            if room <= 0 or not len(pdf):
                continue
            cand = pdf if best is None else pd.concat([best, pdf])
            cand = cand.sort_values(["warc_ts", "url"], kind="mergesort")
            best = cand.iloc[:room]
        if best is not None and len(best):
            state.update((taken + len(best),))
            yield best
        else:
            state.update((taken,))
            yield pd.DataFrame(columns=[f.name for f in PAGES_SCHEMA.fields] + ["host"])

    return enforce


def host_quota_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    quota: int = 1000,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """readStream(pages) → per-host quota gate (stateful across micro-batches)
    → parquet sink. The counter persists in the state store, so a host that
    exhausted its quota in batch 1 emits nothing in batch 100."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = with_host(reader.parquet(input_dir))

    gated = pages.groupBy("host").applyInPandasWithState(
        _quota_fn(quota),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        gated.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def host_quota_batch(pages: DataFrame, quota: int = 1000) -> DataFrame:
    """Batch equivalent (deterministic row_number window) — the backfill
    form of the same cap, and the semantics the streaming test checks
    against."""
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy("warc_ts", "url")
    return (
        with_host(pages)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota)
        .drop("_rn")
    )
