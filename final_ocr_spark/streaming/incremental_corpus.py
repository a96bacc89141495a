"""Continuous corpus maintenance: streaming ingest with incremental
near-dup dedup against the accumulated corpus (SURVEY §2.8 + the
corpus-maintenance shape of operators/dedup.py:incremental_near_dups).

The batch engine already has both halves — ``minhash_near_dups`` for
within-corpus pairs and ``incremental_near_dups`` for new-batch-vs-stored-
signatures — but a production training-data pipeline runs them CONTINUOUSLY:
every arriving micro-batch must be deduped against everything ingested so
far without ever re-sketching the historical corpus. This module is that
glue: ``readStream → foreachBatch(dedup + idempotent append)``.

Per micro-batch (``foreachBatch`` gives us the full batch DataFrame plus a
monotonically increasing ``batch_id``):

1. exact-dedup within the batch on ``key`` (first occurrence wins,
   deterministic);
2. sketch the batch ONCE with :func:`minhash_sigs` — O(|batch|), the
   historical corpus is never re-read;
3. within-batch LSH pairs via ``band_buckets`` self-join: any key that
   appears as the GREATER member of a near-dup pair is dropped. This keeps
   at least one representative per duplicate cluster (the cluster minimum
   never appears as a greater member); a chain a~b~c with a≁c drops c as
   collateral — the standard conservative streaming kill rule, cheaper
   than per-batch connected components and acceptable because batches are
   small relative to the corpus;
4. cross-corpus pairs via :func:`incremental_near_dups` against the stored
   ``(k, sig)`` signature table (reusing the batch signatures from step 2):
   any new key matching history is dropped;
5. survivors' ROWS are appended to the corpus sink and survivors'
   SIGNATURES to the signature store, both under ``batch_id=<id>``
   subdirectories written with ``mode=overwrite`` — a retried batch
   (Structured Streaming replays the last uncommitted batch after a crash)
   overwrites its own directory instead of duplicating rows, which is the
   standard exactly-once-by-idempotence foreachBatch pattern.

Scale notes: the signature store grows by O(|survivors|) per batch and is
``num_hashes`` longs per doc (~0.5 KB) — at 10^12 docs it is a normal
parquet table, band-joined (slim key+band+bucket rows, never text) once per
batch. Re-banding the historical signatures each batch is a scan of that
slim table; a deployment where that scan dominates should persist the
``(k, band, bucket)`` table instead (band_buckets output is deterministic),
trading storage for the transform — noted, not needed at sandbox scale.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

from final_ocr_spark.operators.dedup import (
    band_buckets,
    incremental_near_dups,
    minhash_sigs,
)

SIG_SCHEMA = StructType(
    [
        StructField("k", StringType(), False),
        StructField("sig", ArrayType(LongType()), True),
    ]
)


def _batch_self_pairs(
    sigs: DataFrame, bands: int, rows_per_band: int, num_hashes: int,
    jaccard_threshold: float,
) -> DataFrame:
    """(key_a, key_b) within-batch LSH pairs, key_a < key_b, est_jaccard
    filtered — minhash_near_dups' pairing stage over PRECOMPUTED sigs (the
    batch was already sketched; re-sketching per stage is the r1
    scale-killer this module exists to avoid)."""
    buckets = band_buckets(sigs, bands, rows_per_band)
    a = buckets.select("band", "bucket", F.col("k").alias("key_a"))
    b = buckets.select("band", "bucket", F.col("k").alias("key_b"))
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
        .distinct()
    )
    sa = sigs.select(F.col("k").alias("key_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("k").alias("key_b"), F.col("sig").alias("sig_b"))
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        )
        / F.lit(float(num_hashes))
    )
    return (
        pairs.join(sa, "key_a").join(sb, "key_b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= jaccard_threshold)
        .select("key_a", "key_b")
    )


def ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    corpus_dir: str,
    sigs_dir: str,
    *,
    key: str = "url",
    text_col: str = "extracted_text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.85,
) -> dict:
    """Dedup one micro-batch against itself and the stored corpus, then
    idempotently append survivors (rows + signatures) under
    ``batch_id=<id>``. Returns counts for observability. Usable directly
    for batch-mode backfill too — it is a plain DataFrame function."""
    spark = batch_df.sparkSession
    rows_per_band = num_hashes // bands

    batch = batch_df.dropDuplicates([key])
    # one sketch per batch, shared by the self-join, the cross join, and
    # the signature append
    sigs = minhash_sigs(
        batch, key=key, text_col=text_col, num_hashes=num_hashes,
        shingle_k=shingle_k,
    ).localCheckpoint(eager=False)

    self_pairs = _batch_self_pairs(
        sigs, bands, rows_per_band, num_hashes, jaccard_threshold
    )
    self_drop = self_pairs.select(F.col("key_b").alias("k")).distinct()

    # existence probe via read-and-catch, NOT a local-filesystem listing:
    # sigs_dir is an HDFS/S3 URI on a real cluster, where a pathlib glob
    # would silently report "no history" and skip cross-corpus dedup.
    # The CURRENT batch_id partition is excluded from history: a replayed
    # batch (crash between sink write and checkpoint commit) would
    # otherwise match against its own first-attempt signatures and drop
    # every row — replay must be a no-op, not data loss.
    try:
        hist_sigs = (
            spark.read.schema(SIG_SCHEMA)
            .parquet(sigs_dir)
            .filter(F.col("batch_id") != F.lit(int(batch_id)))
            .select("k", "sig")
        )
        has_history = hist_sigs.limit(1).count() > 0
    except AnalysisException:
        has_history = False
    if has_history:
        cross = incremental_near_dups(
            None, hist_sigs, key=key, text_col=text_col,
            num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
            jaccard_threshold=jaccard_threshold, new_sigs=sigs,
        )
        cross_drop = cross.select(F.col("new_key").alias("k")).distinct()
        dropped = self_drop.unionByName(cross_drop).distinct()
    else:
        dropped = self_drop

    survivors = batch.join(
        dropped, batch[key] == dropped["k"], "left_anti"
    ).localCheckpoint(eager=False)

    n_in = batch.count()
    n_out = survivors.count()
    # idempotent append: a replayed batch rewrites ITS OWN directory
    survivors.write.mode("overwrite").parquet(f"{corpus_dir}/batch_id={batch_id}")
    surv_sigs = sigs.join(
        survivors.select(F.col(key).alias("k")), "k", "left_semi"
    )
    surv_sigs.write.mode("overwrite").parquet(f"{sigs_dir}/batch_id={batch_id}")
    return {"batch_id": batch_id, "rows_in": n_in, "rows_kept": n_out}


def stream_dedup_ingest(
    spark: SparkSession,
    input_dir: str,
    corpus_dir: str,
    sigs_dir: str,
    checkpoint_dir: str,
    *,
    key: str = "url",
    text_col: str = "extracted_text",
    input_schema: StructType | str | None = None,  # DDL string also accepted
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.85,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """readStream(extracted-docs parquet dir) → foreachBatch(ingest_batch).

    ``available_now=True`` drains all files currently present then stops —
    each invocation is one incremental ingest run, with source progress in
    ``checkpoint_dir`` (files are never re-read across runs) and output
    idempotence from the batch_id-keyed appends."""
    if input_schema is None:
        from final_ocr_spark.schema import EXTRACTED_SCHEMA

        input_schema = EXTRACTED_SCHEMA
    reader = spark.readStream.schema(input_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_dir)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(
            batch_df, batch_id, corpus_dir, sigs_dir,
            key=key, text_col=text_col, num_hashes=num_hashes, bands=bands,
            shingle_k=shingle_k, jaccard_threshold=jaccard_threshold,
        )

    writer = docs.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
