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

1. exact-dedup within the batch on ``key`` — smallest (xxhash64(text),
   text) per key wins, deterministic under any partitioning;
2. sketch the batch ONCE with :func:`minhash_sigs` — O(|batch|), the
   historical corpus is never re-read;
3. within-batch LSH pairs via :func:`minhash_near_dups` over the
   precomputed signatures (its pairing stage, including the
   degenerate-bucket skew cap): any key that appears as the GREATER member
   of a near-dup pair is dropped. This keeps at least one representative
   per duplicate cluster (the cluster minimum never appears as a greater
   member); a chain a~b~c with a≁c drops c as collateral — the standard
   conservative streaming kill rule, cheaper than per-batch connected
   components and acceptable because batches are small relative to the
   corpus;
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
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

from final_ocr_spark.operators.dedup import (
    incremental_near_dups,
    minhash_near_dups,
    minhash_sigs,
)

SIG_SCHEMA = StructType(
    [
        StructField("k", StringType(), False),
        StructField("sig", ArrayType(LongType()), True),
    ]
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
    for batch-mode backfill too — it is a plain DataFrame function.

    The corpus is FIRST-WINS PER KEY across batches: a key already in the
    signature store is dropped even when its text changed beyond the
    near-dup threshold (re-crawl policy; a latest-wins corpus would
    instead delete-and-replace, which an append-only store cannot express).
    Zero-shingle survivors (< ``shingle_k`` words) are stored with a NULL
    signature so that this exact-key rule still sees them."""
    spark = batch_df.sparkSession
    n_raw = batch_df.count()

    # deterministic within-batch exact dedup — dropDuplicates keeps an
    # ARBITRARY row per key (varies across runs/replays); the corpus must
    # not. Smallest (xxhash64(text), text) per key wins: a pure function
    # of the row set, stable under any partitioning.
    w = Window.partitionBy(key).orderBy(
        F.xxhash64(F.col(text_col)).asc_nulls_last(),
        F.col(text_col).asc_nulls_last(),
    )
    batch = (
        batch_df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # one sketch per batch, shared by the self-join, the cross join, and
    # the signature append
    sigs = minhash_sigs(
        batch, key=key, text_col=text_col, num_hashes=num_hashes,
        shingle_k=shingle_k,
    ).localCheckpoint(eager=False)

    # within-batch near-dups via minhash_near_dups' own pairing stage
    # (keeps its degenerate-bucket skew cap); drop the greater member of
    # each pair — keeps at least one representative per duplicate cluster
    # (the cluster minimum never appears as a greater member); a chain
    # a~b~c with a≁c drops c as collateral, the standard conservative
    # streaming kill rule.
    self_pairs = minhash_near_dups(
        batch, key=key, text_col=text_col, num_hashes=num_hashes,
        bands=bands, shingle_k=shingle_k,
        jaccard_threshold=jaccard_threshold, sigs=sigs,
    )
    self_drop = self_pairs.select(F.col("key_b").alias("k")).distinct()

    # History probe via read-and-catch, NOT a local-filesystem listing
    # (sigs_dir is an HDFS/S3 URI on a real cluster). ONLY path-not-found
    # means "no history yet" — any other analysis failure (corrupt store,
    # permissions) must fail the batch loudly, not silently skip
    # cross-corpus dedup.
    hist = None
    try:
        hist = spark.read.schema(SIG_SCHEMA).parquet(sigs_dir)
    except AnalysisException as e:
        getcls = getattr(e, "getCondition", None) or getattr(e, "getErrorClass", None)
        cls = getcls() if getcls else None
        if cls != "PATH_NOT_FOUND" and "Path does not exist" not in str(e):
            raise
    has_history, hist_keys, hist_nonnull = False, None, None
    if hist is not None:
        if "batch_id" in hist.columns:
            # our own partitioned store: one slim agg gives the replay/
            # reset guard, the history row count, and the family check
            cur = int(batch_id)
            st = hist.agg(
                F.max("batch_id").alias("hw"),
                F.sum((F.col("batch_id") != cur).cast("long")).alias("n_hist"),
                F.max(
                    F.when(
                        (F.col("batch_id") != cur) & F.col("sig").isNotNull(),
                        F.size("sig"),
                    )
                ).alias("siglen"),
            ).first()
            # checkpoint-reset guard: a fresh checkpoint restarts batch ids
            # at 0, and the batch_id-keyed overwrite below would then
            # DESTROY previously ingested partitions. Only the current id
            # (crash replay) may already exist at the high-water mark.
            if st["hw"] is not None and int(st["hw"]) > cur:
                raise RuntimeError(
                    f"signature store {sigs_dir} already holds batch_id="
                    f"{st['hw']} > current {cur}: the streaming checkpoint "
                    "was reset or points at the wrong sink. Refusing to "
                    "overwrite earlier ingest output — use a fresh "
                    "corpus/sigs pair or restore the original checkpoint."
                )
            has_history = (st["n_hist"] or 0) > 0
            siglen = st["siglen"]
            # exclude the CURRENT batch_id partition: a replayed batch
            # (crash between sink write and checkpoint commit) would
            # otherwise match its own first-attempt signatures and drop
            # every row — replay must be a no-op, not data loss.
            hist = hist.filter(F.col("batch_id") != cur).select("k", "sig")
        else:
            # flat bootstrap store (minhash_sigs output persisted directly)
            st = hist.agg(
                F.count(F.lit(1)).alias("n_hist"),
                F.max(
                    F.when(F.col("sig").isNotNull(), F.size("sig"))
                ).alias("siglen"),
            ).first()
            has_history = st["n_hist"] > 0
            siglen = st["siglen"]
            hist = hist.select("k", "sig")
        if has_history and siglen is not None and int(siglen) != num_hashes:
            raise ValueError(
                f"signature store {sigs_dir} holds {siglen}-hash signatures "
                f"but this run uses num_hashes={num_hashes}; positions are "
                "only comparable within one family — rebuild the store or "
                "match the parameters."
            )
        hist_keys = hist.select("k")
        # null-sig rows (zero-shingle docs) must not enter the band join:
        # xxhash64(null) is a constant, so they would all collide into one
        # degenerate bucket per band
        hist_nonnull = hist.filter(F.col("sig").isNotNull())

    if has_history:
        cross = incremental_near_dups(
            None, hist_nonnull, key=key, text_col=text_col,
            num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
            jaccard_threshold=jaccard_threshold, new_sigs=sigs,
        )
        cross_drop = cross.select(F.col("new_key").alias("k")).distinct()
        # first-wins per key across batches: an already-ingested key is
        # dropped even when its text changed beyond the near-dup threshold
        exact_drop = (
            batch.select(F.col(key).alias("k"))
            .join(hist_keys, "k", "left_semi")
        )
        dropped = (
            self_drop.unionByName(cross_drop).unionByName(exact_drop).distinct()
        )
    else:
        dropped = self_drop

    survivors = batch.join(
        dropped, batch[key] == dropped["k"], "left_anti"
    ).localCheckpoint(eager=False)

    n_unique = batch.count()
    n_out = survivors.count()
    # idempotent append: a replayed batch rewrites ITS OWN directory
    survivors.write.mode("overwrite").parquet(f"{corpus_dir}/batch_id={batch_id}")
    # left join (not semi): zero-shingle survivors get a NULL-sig row so
    # the exact-key rule covers them in later batches
    surv_sigs = (
        survivors.select(F.col(key).alias("k"))
        .join(sigs, "k", "left")
        .select("k", "sig")
    )
    surv_sigs.write.mode("overwrite").parquet(f"{sigs_dir}/batch_id={batch_id}")
    return {
        "batch_id": batch_id,
        "rows_in": n_raw,
        "rows_unique": n_unique,
        "rows_kept": n_out,
    }


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


def stream_warc_ingest(
    spark: SparkSession,
    warc_dir: str,
    corpus_dir: str,
    sigs_dir: str,
    checkpoint_dir: str,
    *,
    glob: str = "*.warc*",
    key: str = "url",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.85,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    quarantine_dir: str | None = None,
) -> StreamingQuery:
    """The raw-crawl flavor of :func:`stream_dedup_ingest`: watch a WARC
    drop directory (how crawl output actually lands — segment archives
    appearing over time), and per micro-batch run the FULL path — WARC
    framing/decode (identical code to the batch reader via
    pages_from_archives) → flagship extraction → exact+LSH dedup against
    the accumulated corpus → idempotent batch_id-keyed appends.

    Source progress lives in ``checkpoint_dir`` (an archive is never
    re-parsed across runs); one archive = one stream file = atomic unit of
    progress, matching the batch reader's parallelism contract.

    Quarantine contract: framing-failed archives AND extraction-failed /
    empty documents never fail the stream and never enter the corpus —
    a null-text row admitted here would permanently block a later healthy
    recrawl of its url under the store's first-wins rule (review-caught,
    test-pinned). With ``quarantine_dir`` set they are RECORDED there
    (batch_id-partitioned overwrite — replay-idempotent like the corpus
    appends); without it they are dropped after a per-batch count is
    printed, so silent loss is at least visible in the job log."""
    from final_ocr_spark.operators.extract_pages import extract_pages
    from final_ocr_spark.sources.warc import pages_from_archives

    reader = (
        spark.readStream.format("binaryFile")
        # streaming sources require an explicit schema; binaryFile's is
        # fixed by the data source spec
        .schema("path string, modificationTime timestamp, "
                "length long, content binary")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(warc_dir).select("path", "content")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        parsed = pages_from_archives(batch_df).localCheckpoint(eager=False)
        pages = parsed.filter(F.col("error").isNull()).drop("error")
        ext = extract_pages(pages, dedup=True).localCheckpoint(eager=False)
        # only healthy non-empty documents may enter the corpus (see
        # quarantine contract in the docstring)
        good = ext.filter(
            F.col("error").isNull() & (F.length("extracted_text") > 0)
        )
        bad_archives = parsed.filter(F.col("error").isNotNull()).select(
            F.col("url").alias("source"), "error"
        )
        bad_docs = ext.filter(
            F.col("error").isNotNull() | (F.length("extracted_text") == 0)
        ).select(F.col("url").alias("source"), "error")
        quarantined = bad_archives.unionByName(bad_docs)
        if quarantine_dir is not None:
            quarantined.write.mode("overwrite").parquet(
                f"{quarantine_dir}/batch_id={batch_id}"
            )
        else:
            n_bad = quarantined.count()
            if n_bad:
                print(
                    f"stream_warc_ingest batch {batch_id}: "
                    f"{n_bad} quarantined row(s) dropped "
                    "(set quarantine_dir to record them)"
                )
        ingest_batch(
            good, batch_id, corpus_dir, sigs_dir,
            key=key, text_col="extracted_text", num_hashes=num_hashes,
            bands=bands, shingle_k=shingle_k,
            jaccard_threshold=jaccard_threshold,
        )

    writer = raw.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
