"""Streaming incremental corpus ingest: continuous near-dup dedup against
the accumulated signature store (streaming/incremental_corpus.py)."""

import pandas as pd


def _docs_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "extracted_text"])
    )


def _write_docs(spark, rows, path):
    # one plain parquet FILE (not a Spark output directory): the streaming
    # file source lists files, not nested part-file directories
    pd.DataFrame(rows, columns=["url", "extracted_text"]).to_parquet(path)


_BASE = (
    "the harbor lights flickered over the water while fishing boats "
    "returned slowly through the evening calm and gulls wheeled above "
    "the breakwater calling to the crews unloading the day's catch "
    "while along the quay the lamps came on one after another and the "
    "last ferry sounded its horn beyond the point as nets were spread "
    "to dry beside the sheds and the tide turned quietly under the "
    "pilings carrying kelp and driftwood out past the harbor mouth"
)
_OTHER = (
    "a completely different report about mountain weather stations "
    "recording snowfall accumulation across the northern ridge during "
    "an unusually long winter season with heavy drifting on the passes"
)
_THIRD = (
    "city council minutes covering the budget session where members "
    "debated the library extension the tram corridor and the riverside "
    "park maintenance plan before voting on the amended proposal"
)


_FOURTH = (
    "orchard workers finished the early apple harvest under clear skies "
    "stacking crates along the farm road while cider presses ran in the "
    "barn and wasps gathered near the windfalls by the fence line"
)


def test_stream_ingest_dedups_within_and_across_runs(spark, tmp_path):
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("extracted_text", T.StringType()),
        ]
    )

    from final_ocr_spark.streaming.incremental_corpus import stream_dedup_ingest

    indir = tmp_path / "in"
    indir.mkdir()

    def run():
        q = stream_dedup_ingest(
            spark,
            input_dir=str(indir),
            corpus_dir=str(tmp_path / "corpus"),
            sigs_dir=str(tmp_path / "sigs"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            input_schema=schema,
            jaccard_threshold=0.7,
        )
        q.awaitTermination(120)

    # run 1: a, its in-batch near-dup a2 (15-char truncation), and b
    _write_docs(
        spark,
        [
            ("http://x/a", _BASE),
            ("http://x/a2", _BASE[:-15]),
            ("http://x/b", _OTHER),
        ],
        str(indir / "f1.parquet"),
    )
    run()
    kept = {
        r["url"]
        for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
    }
    # a < a2 lexicographically -> a kept, a2 dropped in-batch
    assert kept == {"http://x/a", "http://x/b"}

    # run 2: new file only (checkpoint skips f1): a cross-run near-dup of a,
    # plus a genuinely new doc c
    _write_docs(
        spark,
        [
            ("http://y/a-again", _BASE[:-12]),
            ("http://y/c", _THIRD),
        ],
        str(indir / "f2.parquet"),
    )
    run()
    out = spark.read.parquet(str(tmp_path / "corpus"))
    kept = {r["url"] for r in out.collect()}
    assert kept == {"http://x/a", "http://x/b", "http://y/c"}

    # the signature store mirrors the kept corpus exactly
    sig_keys = {
        r["k"] for r in spark.read.parquet(str(tmp_path / "sigs")).collect()
    }
    assert sig_keys == kept


def test_ingest_batch_replay_is_idempotent(spark, tmp_path):
    """Structured Streaming replays the last uncommitted batch after a
    crash; the batch_id-keyed overwrite must make that a no-op."""
    from final_ocr_spark.streaming.incremental_corpus import ingest_batch

    corpus, sigs = str(tmp_path / "corpus"), str(tmp_path / "sigs")
    b0 = _docs_df(spark, [("http://x/a", _BASE), ("http://x/b", _OTHER)])
    r1 = ingest_batch(b0, 0, corpus, sigs, jaccard_threshold=0.7)
    assert (r1["rows_in"], r1["rows_kept"]) == (2, 2)
    # replay of the SAME batch id: same directory overwritten, no dupes —
    # and the self-match against the history written by the first attempt
    # must not drop the replayed rows
    ingest_batch(b0, 0, corpus, sigs, jaccard_threshold=0.7)
    out = spark.read.parquet(corpus)
    assert out.count() == 2
    assert {r["url"] for r in out.collect()} == {"http://x/a", "http://x/b"}


def test_ingest_batch_zero_shingle_docs_pass_through(spark, tmp_path):
    """Docs shorter than shingle_k words have no signature (null-signature
    contract) — they must survive ingest rather than crash or vanish."""
    from final_ocr_spark.streaming.incremental_corpus import ingest_batch

    corpus, sigs = str(tmp_path / "corpus"), str(tmp_path / "sigs")
    b = _docs_df(spark, [("http://x/short", "too few words"), ("http://x/a", _BASE)])
    r = ingest_batch(b, 0, corpus, sigs)
    assert r["rows_kept"] == 2
    assert spark.read.parquet(corpus).count() == 2


def test_ingest_batch_guards_and_first_wins(spark, tmp_path):
    """Round-3 review findings, pinned: (a) checkpoint-reset guard refuses
    to overwrite earlier partitions, (b) a num_hashes family mismatch with
    the store fails loudly, (c) a key re-arriving with REWRITTEN text is
    still dropped (first-wins per key), including zero-shingle keys stored
    with a null signature."""
    import pytest

    from final_ocr_spark.streaming.incremental_corpus import ingest_batch

    corpus, sigs = str(tmp_path / "corpus"), str(tmp_path / "sigs")
    b0 = _docs_df(
        spark, [("http://x/a", _BASE), ("http://x/s", "tiny doc")]
    )
    ingest_batch(b0, 0, corpus, sigs)

    # (c) same keys, completely different text (not a near-dup) -> dropped
    b1 = _docs_df(
        spark,
        [("http://x/a", _THIRD), ("http://x/s", _OTHER), ("http://x/n", _OTHER)],
    )
    r = ingest_batch(b1, 1, corpus, sigs)
    assert r["rows_kept"] == 1
    kept = {u for (u,) in spark.read.parquet(corpus).select("url").collect()}
    assert kept == {"http://x/a", "http://x/s", "http://x/n"}

    # (a) a fresh checkpoint would restart at batch 0 against this store
    with pytest.raises(RuntimeError, match="checkpoint"):
        ingest_batch(b1, 0, corpus, sigs)

    # (b) different signature family
    with pytest.raises(ValueError, match="num_hashes"):
        ingest_batch(b1, 2, corpus, sigs, num_hashes=64, bands=8)


def test_ingest_batch_within_batch_pick_is_deterministic(spark):
    """Same key twice in one batch: the kept text is the one with the
    smaller (xxhash64(text), text) — a pure function of the rows, not of
    partitioning."""
    from pyspark.sql import functions as F

    from final_ocr_spark.streaming.incremental_corpus import ingest_batch
    import tempfile

    rows = [("http://x/a", _BASE), ("http://x/a", _THIRD)]
    h = {
        r["t"]: r["h"]
        for r in _docs_df(spark, rows)
        .select(F.col("extracted_text").alias("t"), F.xxhash64("extracted_text").alias("h"))
        .collect()
    }
    want = min(h, key=lambda t: (h[t], t))
    for parts in (1, 7):
        with tempfile.TemporaryDirectory() as td:
            b = _docs_df(spark, rows).repartition(parts)
            ingest_batch(b, 0, f"{td}/c", f"{td}/s")
            got = spark.read.parquet(f"{td}/c").select("extracted_text").collect()
            assert [r["extracted_text"] for r in got] == [want], f"parts={parts}"


def test_stream_warc_ingest_end_to_end(spark, tmp_path):
    """WARC drop dir → streaming framing/extract/dedup ingest: cross-run
    near-dup dedup, checkpointed archive progress, quarantine tolerance."""
    from final_ocr_spark.sources.warc import write_warc_bytes
    from final_ocr_spark.streaming.incremental_corpus import stream_warc_ingest

    drop = tmp_path / "warcs"
    drop.mkdir()

    def archive(name, pages):
        recs = [
            {"url": u, "date": "2026-01-01T00:00:00Z",
             "body": f"<html><body><p>{text}</p></body></html>".encode()}
            for u, text in pages
        ]
        (drop / name).write_bytes(write_warc_bytes(recs))

    def run():
        q = stream_warc_ingest(
            spark,
            warc_dir=str(drop),
            corpus_dir=str(tmp_path / "corpus"),
            sigs_dir=str(tmp_path / "sigs"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            jaccard_threshold=0.7,
        )
        q.awaitTermination(180)

    archive("seg1.warc.gz", [("http://x/a", _BASE), ("http://x/b", _OTHER)])
    # a corrupt archive must quarantine, not kill the stream
    (drop / "broken.warc.gz").write_bytes(b"\x1f\x8bnot really gzip")
    run()
    kept = {r["url"]: r["extracted_text"]
            for r in spark.read.parquet(str(tmp_path / "corpus")).collect()}
    assert set(kept) == {"http://x/a", "http://x/b"}
    assert "harbor lights" in kept["http://x/a"]

    # second drop: near-dup of a (cross-run, vs the signature store) + new c
    archive("seg2.warc.gz",
            [("http://y/a-again", _BASE[:-12]), ("http://y/c", _THIRD)])
    run()
    kept2 = {r["url"]
             for r in spark.read.parquet(str(tmp_path / "corpus")).collect()}
    assert kept2 == {"http://x/a", "http://x/b", "http://y/c"}


def test_stream_warc_quarantine_contract(spark, tmp_path):
    """Null/empty-extraction docs never enter the corpus (a null-text row
    would permanently block a healthy recrawl under first-wins), and the
    quarantine sink records framing + extraction rejects idempotently."""
    from final_ocr_spark.sources.warc import write_warc_bytes
    from final_ocr_spark.streaming.incremental_corpus import stream_warc_ingest

    drop = tmp_path / "warcs"
    drop.mkdir()

    def run():
        q = stream_warc_ingest(
            spark,
            warc_dir=str(drop),
            corpus_dir=str(tmp_path / "corpus"),
            sigs_dir=str(tmp_path / "sigs"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            jaccard_threshold=0.7,
            quarantine_dir=str(tmp_path / "quar"),
        )
        q.awaitTermination(180)

    # drop 1: url X with an empty body (extracts to nothing) + a good doc
    recs = [
        {"url": "http://x.com/X", "date": "2026-01-01T00:00:00Z",
         "body": b"<html><body></body></html>"},
        {"url": "http://g.com/ok", "date": "2026-01-01T00:00:00Z",
         "body": f"<html><body><p>{_OTHER}</p></body></html>".encode()},
    ]
    (drop / "d1.warc.gz").write_bytes(write_warc_bytes(recs))
    (drop / "broken.warc.gz").write_bytes(b"\x1f\x8bnot gzip")
    run()
    kept = {r["url"] for r in
            spark.read.parquet(str(tmp_path / "corpus")).collect()}
    assert kept == {"http://g.com/ok"}  # empty doc NOT admitted
    quar = spark.read.parquet(str(tmp_path / "quar")).collect()
    sources = {r["source"] for r in quar}
    assert "http://x.com/X" in sources          # extraction reject recorded
    assert any("broken" in s for s in sources)  # framing reject recorded

    # drop 2: healthy recrawl of X must now be ADMITTED (nothing blocked it)
    recs2 = [{"url": "http://x.com/X", "date": "2026-02-01T00:00:00Z",
              "body": f"<html><body><p>{_THIRD}</p></body></html>".encode()}]
    (drop / "d2.warc.gz").write_bytes(write_warc_bytes(recs2))
    run()
    kept2 = {r["url"] for r in
             spark.read.parquet(str(tmp_path / "corpus")).collect()}
    assert kept2 == {"http://g.com/ok", "http://x.com/X"}


# -- round 4: Bloom pre-split, sidecar lifecycle, exact-text spam rule -------

def test_ingest_bloom_prefilter_skips_and_catches(spark, tmp_path):
    """(a) of the scale-hardening contract: with sidecars present, a batch
    whose buckets have NO history hits skips the history band join entirely
    (lsh_history_join_skipped), while a genuine cross-corpus near-dup still
    pays it and is dropped — the history scan runs only for the
    Bloom-candidate subset."""
    from final_ocr_spark.streaming.incremental_corpus import ingest_batch

    corpus, sigs = str(tmp_path / "corpus"), str(tmp_path / "sigs")
    r0 = ingest_batch(
        _docs_df(spark, [("http://x/a", _BASE), ("http://x/b", _OTHER)]),
        0, corpus, sigs, jaccard_threshold=0.7,
    )
    # first batch has no history at all
    assert not r0["lsh_bloom_prefilter"]

    # batch 1: all-novel text — Bloom answers "definitely absent" for every
    # bucket and the exact-key Bloom for every key; both history joins skip
    r1 = ingest_batch(
        _docs_df(spark, [("http://y/c", _THIRD)]),
        1, corpus, sigs, jaccard_threshold=0.7,
    )
    assert r1["lsh_bloom_prefilter"] and r1["exact_bloom_prefilter"]
    assert r1["lsh_candidate_rows"] == 0
    assert r1["lsh_history_join_skipped"]
    assert r1["exact_history_join_skipped"]
    assert r1["rows_kept"] == 1

    # batch 2: a near-dup of batch-0's doc + an exact key repeat — the
    # Bloom reports candidates, the join runs, both are dropped
    r2 = ingest_batch(
        _docs_df(
            spark,
            [("http://z/a-again", _BASE[:-12]), ("http://x/b", "changed " + _THIRD)],
        ),
        2, corpus, sigs, jaccard_threshold=0.7,
    )
    assert r2["lsh_bloom_prefilter"]
    assert r2["lsh_candidate_rows"] > 0
    assert not r2["lsh_history_join_skipped"]
    assert r2["rows_kept"] == 0
    kept = {r["url"] for r in spark.read.parquet(corpus).collect()}
    assert kept == {"http://x/a", "http://x/b", "http://y/c"}


def test_ingest_sidecars_replay_idempotent(spark, tmp_path):
    """Replaying a batch id rewrites its OWN sidecar partitions with
    identical (deterministic) content, and the replay must not match its
    own first-attempt sidecars and self-destruct."""
    from final_ocr_spark.streaming.incremental_corpus import (
        BUCKET_BLOOM_SUBDIR, BUCKETS_SUBDIR, KEY_BLOOM_SUBDIR, ingest_batch,
    )

    corpus, sigs = str(tmp_path / "corpus"), str(tmp_path / "sigs")
    b = _docs_df(spark, [("http://x/a", _BASE), ("http://x/b", _OTHER)])
    ingest_batch(b, 0, corpus, sigs, jaccard_threshold=0.7)

    def snap(sub):
        df = spark.read.parquet(f"{sigs}/{sub}")
        return sorted(map(tuple, df.drop("batch_id").collect()))

    first = {s: snap(s) for s in (BUCKETS_SUBDIR, KEY_BLOOM_SUBDIR, BUCKET_BLOOM_SUBDIR)}
    r = ingest_batch(b, 0, corpus, sigs, jaccard_threshold=0.7)  # replay
    assert r["rows_kept"] == 2  # did not match its own first attempt
    second = {s: snap(s) for s in first}
    assert first == second
    assert spark.read.parquet(corpus).count() == 2


def test_compact_signature_store_bounds_files_and_keeps_dedup(spark, tmp_path):
    """(c) of the scale-hardening contract: after ≥3 ingested batches,
    compaction bounds the partition/file count, preserves the high-water
    mark, keeps sidecar COVERAGE (Bloom prefilter still active), and a
    post-compaction batch still dedups against pre-compaction history."""
    from final_ocr_spark.streaming.incremental_corpus import (
        compact_batch_store, compact_signature_store, ingest_batch,
    )

    corpus, sigs = str(tmp_path / "corpus"), str(tmp_path / "sigs")
    texts = [_BASE, _OTHER, _THIRD, _FOURTH]
    for i, t in enumerate(texts):
        ingest_batch(
            _docs_df(spark, [(f"http://x/{i}", t)]),
            i, corpus, sigs, jaccard_threshold=0.7,
        )

    def parts(root):
        import pathlib
        return sorted(
            int(p.name.split("=")[1])
            for p in pathlib.Path(root).glob("batch_id=*") if p.is_dir()
        )

    assert parts(sigs) == [0, 1, 2, 3]
    st = compact_signature_store(spark, sigs, keep_recent=2, min_partitions=2)
    assert st["compacted"] and st["target"] == 1
    assert parts(sigs) == [1, 2, 3]
    assert st["files_after"] < st["files_before"]
    # sidecars consolidated to the same id set (coverage preserved)
    assert parts(f"{sigs}/_buckets") == [1, 2, 3]
    assert parts(f"{sigs}/_bloom_keys") == [1, 2, 3]
    # corpus rows compact with the generic store compactor
    cst = compact_batch_store(spark, corpus, keep_recent=2, min_partitions=2)
    assert cst["compacted"]
    assert spark.read.parquet(corpus).count() == 4  # nothing lost

    # post-compaction ingest: near-dup of the batch-0 doc (now inside the
    # consolidated partition) is still caught, via the Bloom path
    r = ingest_batch(
        _docs_df(spark, [("http://z/a-again", _BASE[:-12])]),
        4, corpus, sigs, jaccard_threshold=0.7,
    )
    assert r["lsh_bloom_prefilter"]  # coverage survived compaction
    assert r["rows_kept"] == 0
    # novel batch after compaction still skips the history join
    r5 = ingest_batch(
        _docs_df(spark, [("http://z/new", _THIRD.replace("city", "town") + " entirely new words about glaciers")]),
        5, corpus, sigs, jaccard_threshold=0.7,
    )
    assert r5["lsh_bloom_prefilter"]


def test_ingest_exact_text_spam_across_keys(spark, tmp_path):
    """Review-caught leak: >cap mutually-identical docs under DISTINCT urls
    exceed the LSH bucket skew cap (200/bucket) in one batch; the exact
    cross-key text rule must collapse them to the single smallest key."""
    from final_ocr_spark.streaming.incremental_corpus import ingest_batch

    corpus, sigs = str(tmp_path / "corpus"), str(tmp_path / "sigs")
    spam = [(f"http://spam/{i:04d}", _BASE) for i in range(250)]
    r = ingest_batch(
        _docs_df(spark, spam + [("http://x/ok", _OTHER)]),
        0, corpus, sigs, jaccard_threshold=0.7,
    )
    assert r["rows_kept"] == 2
    kept = {u["url"] for u in spark.read.parquet(corpus).collect()}
    assert kept == {"http://spam/0000", "http://x/ok"}
    # byte-identical spam collapses BEFORE sketching, so the pairing cap
    # never engages and the observability stat stays silent
    assert (r["n_capped_buckets"], r["n_capped_rows"]) == (0, 0)


def test_ingest_reports_capped_lsh_buckets(spark, tmp_path):
    """The residual documented leak — >cap mutually-NEAR-identical docs
    under distinct urls in one batch (template spam with per-page noise
    that survives the exact-text rule) — must now be OBSERVABLE: the
    returned stats count the buckets and rows the pairing cap truncated."""
    from final_ocr_spark.streaming.incremental_corpus import ingest_batch

    corpus, sigs = str(tmp_path / "corpus"), str(tmp_path / "sigs")
    # each doc differs by one trailing token -> distinct texts, near-equal
    # shingle sets -> same LSH buckets, >200 rows per bucket
    spam = [
        (f"http://tmpl/{i:04d}", f"{_BASE} visitor{i:04d}") for i in range(230)
    ]
    r = ingest_batch(
        _docs_df(spark, spam + [("http://x/ok", _OTHER)]),
        0, corpus, sigs, jaccard_threshold=0.7,
    )
    assert r["n_capped_buckets"] > 0
    assert r["n_capped_rows"] >= r["n_capped_buckets"]  # ≥1 truncated row
    # per capped bucket by construction (count > cap)
    # dedup itself still keeps at least one representative and the control
    kept = {u["url"] for u in spark.read.parquet(corpus).collect()}
    assert "http://x/ok" in kept and len(kept) < 230

    # steady state (store exists → no failing probe reads): the counts must
    # come from the Observation riding the pairing job, not the recount
    # fallback — the zero-extra-job contract, observable via the stats
    # same long template (guaranteed >cap bucket collisions), fresh urls +
    # fresh suffix range: history near-dups may drop them from the CORPUS,
    # but the cap stats observe the WITHIN-batch pairing either way
    spam2 = [
        (f"http://tmpl2/{i:04d}", f"{_BASE} visitor{1000 + i:04d}")
        for i in range(230)
    ]
    r2 = ingest_batch(
        _docs_df(spark, spam2), 1, corpus, sigs, jaccard_threshold=0.7,
    )
    assert r2["cap_stats_source"] == "observation"
    assert r2["n_capped_buckets"] > 0
    assert r2["n_capped_rows"] >= r2["n_capped_buckets"]


def test_ingest_sidecar_fallback_on_missing_coverage(spark, tmp_path):
    """With repair disabled, a store written without sidecars (older build,
    or a sidecar lost to a partial crash) must put ingest on the safe
    full-scan path — and still dedup correctly."""
    import shutil

    from final_ocr_spark.streaming.incremental_corpus import (
        BUCKET_BLOOM_SUBDIR, BUCKETS_SUBDIR, KEY_BLOOM_SUBDIR, ingest_batch,
    )

    corpus, sigs = str(tmp_path / "corpus"), str(tmp_path / "sigs")
    ingest_batch(
        _docs_df(spark, [("http://x/a", _BASE)]), 0, corpus, sigs,
        jaccard_threshold=0.7,
    )
    for sub in (BUCKETS_SUBDIR, KEY_BLOOM_SUBDIR, BUCKET_BLOOM_SUBDIR):
        shutil.rmtree(f"{sigs}/{sub}")
    r = ingest_batch(
        _docs_df(spark, [("http://y/a-again", _BASE[:-12]), ("http://y/c", _THIRD)]),
        1, corpus, sigs, jaccard_threshold=0.7, repair_sidecars=False,
    )
    assert not r["lsh_bloom_prefilter"] and not r["exact_bloom_prefilter"]
    assert r["rows_kept"] == 1  # near-dup still dropped on the fallback path
    kept = {u["url"] for u in spark.read.parquet(corpus).collect()}
    assert kept == {"http://x/a", "http://y/c"}


def test_ingest_sidecar_self_heals_lost_partitions(spark, tmp_path):
    """Review-caught: a lost sidecar partition used to put ingest on the
    full-scan path FOREVER (the consolidated main partition keeps its id,
    so coverage could never recover) and made the next compaction delete
    newer sidecar partitions in a destructive loop. Default ingest now
    regenerates the missing partitions from the stored signatures — one
    repair pass, then the Bloom fast path returns — and a post-repair
    compaction keeps its sidecars."""
    import shutil

    from final_ocr_spark.streaming.incremental_corpus import (
        BUCKETS_SUBDIR, compact_signature_store, ingest_batch,
    )

    corpus, sigs = str(tmp_path / "corpus"), str(tmp_path / "sigs")
    texts = [_BASE, _OTHER, _THIRD]
    for i, t in enumerate(texts):
        ingest_batch(
            _docs_df(spark, [(f"http://x/{i}", t)]),
            i, corpus, sigs, jaccard_threshold=0.7,
        )
    # lose ONE bucket-sidecar partition (partial crash)
    shutil.rmtree(f"{sigs}/{BUCKETS_SUBDIR}/batch_id=1")

    r = ingest_batch(
        _docs_df(spark, [("http://z/a-again", _BASE[:-12])]),
        3, corpus, sigs, jaccard_threshold=0.7,
    )
    assert r["sidecars_repaired"] >= 1
    assert r["lsh_bloom_prefilter"]  # fast path RESTORED, same batch
    assert r["rows_kept"] == 0       # near-dup of batch-0 still caught

    # post-repair compaction must keep coverage (no destructive loop)
    st = compact_signature_store(spark, sigs, keep_recent=2, min_partitions=2)
    assert st["compacted"]
    r2 = ingest_batch(
        _docs_df(spark, [("http://z/new", _FOURTH)]),
        4, corpus, sigs, jaccard_threshold=0.7,
    )
    assert r2["sidecars_repaired"] == 0
    assert r2["lsh_bloom_prefilter"]
    assert r2["rows_kept"] == 1


def test_ingest_bands_change_self_heals_to_new_family(spark, tmp_path):
    """A bands change regenerates the bucket sidecars under the NEW family
    (one repair pass) and keeps the fast path — while still catching the
    cross-corpus near-dup through correctly re-banded buckets."""
    from final_ocr_spark.streaming.incremental_corpus import ingest_batch

    corpus, sigs = str(tmp_path / "corpus"), str(tmp_path / "sigs")
    ingest_batch(
        _docs_df(spark, [("http://x/a", _BASE), ("http://x/b", _OTHER)]),
        0, corpus, sigs, jaccard_threshold=0.7, bands=8,
    )
    r = ingest_batch(
        _docs_df(spark, [("http://z/a-again", _BASE[:-12])]),
        1, corpus, sigs, jaccard_threshold=0.7, bands=16,
    )
    assert r["sidecars_repaired"] >= 1
    assert r["lsh_bloom_prefilter"]      # fast path under the new family
    assert not r["sidecar_family_mismatch"]  # healed before loading
    assert r["rows_kept"] == 0
    kept = {u["url"] for u in spark.read.parquet(corpus).collect()}
    assert kept == {"http://x/a", "http://x/b"}


def test_ingest_zero_sig_batch_keeps_sidecar_coverage(spark, tmp_path):
    """A batch whose survivors ALL lack signatures (< shingle_k words) must
    not leave an invisible empty bucket partition that would break sidecar
    coverage forever — the sentinel row keeps the partition visible."""
    from final_ocr_spark.streaming.incremental_corpus import ingest_batch

    corpus, sigs = str(tmp_path / "corpus"), str(tmp_path / "sigs")
    ingest_batch(
        _docs_df(spark, [("http://x/a", _BASE)]), 0, corpus, sigs,
        jaccard_threshold=0.7,
    )
    ingest_batch(
        _docs_df(spark, [("http://x/short", "too few words")]),
        1, corpus, sigs, jaccard_threshold=0.7,
    )
    r = ingest_batch(
        _docs_df(spark, [("http://y/c", _THIRD)]), 2, corpus, sigs,
        jaccard_threshold=0.7,
    )
    assert r["lsh_bloom_prefilter"]  # coverage held across the null-sig batch
    assert r["rows_kept"] == 1


def test_ingest_bands_change_degrades_to_full_scan(spark, tmp_path):
    """Review-caught: bucket values and bucket-Bloom probe keys are only
    comparable within one (num_hashes, bands) family. A run with a changed
    --bands must NOT trust the stored sidecars (an 8-band Bloom probed with
    16-band keys reports 'definitely absent' for nearly everything and
    would skip the history join, admitting near-dups forever) — it must
    fall back to the full-scan path, which re-bands the stored signatures
    correctly, and surface the mismatch in the stats."""
    from final_ocr_spark.streaming.incremental_corpus import ingest_batch

    corpus, sigs = str(tmp_path / "corpus"), str(tmp_path / "sigs")
    ingest_batch(
        _docs_df(spark, [("http://x/a", _BASE), ("http://x/b", _OTHER)]),
        0, corpus, sigs, jaccard_threshold=0.7, bands=8,
    )
    # same num_hashes (32 → passes the siglen family check), different bands;
    # repair disabled to pin the degraded-but-safe path
    r = ingest_batch(
        _docs_df(spark, [("http://z/a-again", _BASE[:-12])]),
        1, corpus, sigs, jaccard_threshold=0.7, bands=16,
        repair_sidecars=False,
    )
    assert r["sidecar_family_mismatch"]
    assert not r["lsh_bloom_prefilter"]  # bucket sidecars not trusted
    assert r["rows_kept"] == 0           # near-dup still caught (full scan)
    kept = {u["url"] for u in spark.read.parquet(corpus).collect()}
    assert kept == {"http://x/a", "http://x/b"}


def test_num_hashes_check_survives_null_sig_newest_partition(spark, tmp_path):
    """Review-caught: the num_hashes family check samples the NEWEST history
    partition; if that partition holds only NULL sigs (a batch of
    zero-shingle docs) the check must fall back to older partitions instead
    of silently admitting a mixed-length store."""
    import pytest

    from final_ocr_spark.streaming.incremental_corpus import ingest_batch

    corpus, sigs = str(tmp_path / "corpus"), str(tmp_path / "sigs")
    ingest_batch(
        _docs_df(spark, [("http://x/a", _BASE)]), 0, corpus, sigs,
    )
    # newest history partition: only zero-shingle (NULL-sig) docs
    ingest_batch(
        _docs_df(spark, [("http://x/short", "too few words")]), 1, corpus, sigs,
    )
    with pytest.raises(ValueError, match="32-hash signatures"):
        ingest_batch(
            _docs_df(spark, [("http://y/c", _THIRD)]),
            2, corpus, sigs, num_hashes=64, bands=8,
        )


def test_compaction_crash_rolls_back_and_dedup_survives(spark, tmp_path):
    """Review-caught: a crash mid-swap (originals moved to the trash dir,
    consolidated partition not yet published) used to permanently remove
    history partitions — silently admitted duplicates forever. Recovery
    must restore the originals, and the very next ingest_batch must run it
    automatically and still catch a near-dup of the trashed history."""
    import pathlib
    import shutil

    from final_ocr_spark.streaming.incremental_corpus import (
        ingest_batch, recover_batch_store,
    )

    corpus, sigs = str(tmp_path / "corpus"), str(tmp_path / "sigs")
    texts = [_BASE, _OTHER, _THIRD, _FOURTH]
    for i, t in enumerate(texts):
        ingest_batch(
            _docs_df(spark, [(f"http://x/{i}", t)]),
            i, corpus, sigs, jaccard_threshold=0.7,
        )

    # simulate the crash state: old partitions {0, 1} fully moved into the
    # trash (TARGET=1 written), consolidated result never published
    root = pathlib.Path(sigs)
    trash = root / ".compact-trash-deadbeef"
    trash.mkdir()
    (trash / "TARGET").write_text("1", encoding="utf-8")
    for i in (0, 1):
        (root / f"batch_id={i}").rename(trash / f"batch_id={i}")
    (root / ".compact-tmp-junk").mkdir()  # leftover tmp must be swept

    # next ingest heals the store first, then dedups against ALL history —
    # including batch 0, which only exists because of the rollback
    r = ingest_batch(
        _docs_df(spark, [("http://z/a-again", _BASE[:-12])]),
        4, corpus, sigs, jaccard_threshold=0.7,
    )
    assert r["rows_kept"] == 0
    assert not list(root.glob(".compact-trash-*"))
    assert not list(root.glob(".compact-tmp-*"))
    ids = sorted(
        int(p.name.split("=")[1]) for p in root.glob("batch_id=*")
    )
    assert ids == [0, 1, 2, 3, 4]

    # roll-FORWARD state: consolidated partition IS published (target both
    # in trash and at root) — recovery must keep the published result and
    # drop the trash
    trash2 = root / ".compact-trash-feedface"
    trash2.mkdir()
    (trash2 / "TARGET").write_text("0", encoding="utf-8")
    shutil.copytree(root / "batch_id=0", trash2 / "batch_id=0")
    st = recover_batch_store(sigs)
    assert st == {"rolled_back": 0, "rolled_forward": 1}
    assert not list(root.glob(".compact-trash-*"))
    assert (root / "batch_id=0").is_dir()


def test_store_maintenance_refuses_remote_uris(spark):
    """pathlib/shutil maintenance must refuse non-local stores loudly, not
    silently no-op (review-caught) — the read path speaks any Hadoop
    filesystem, compaction does not (SEAMS.md)."""
    import pytest

    from final_ocr_spark.streaming.incremental_corpus import (
        compact_batch_store, compact_signature_store, recover_batch_store,
    )

    for fn in (recover_batch_store,):
        with pytest.raises(NotImplementedError, match="local-filesystem-only"):
            fn("hdfs://nn/sigs")
    with pytest.raises(NotImplementedError, match="local-filesystem-only"):
        compact_batch_store(spark, "hdfs://nn/sigs")
    with pytest.raises(NotImplementedError, match="local-filesystem-only"):
        compact_signature_store(spark, "s3://bucket/sigs")
