"""Delivery shard sinks (sources/shards.py): JSONL round-trip + checksums +
rerun determinism; token-binary layout vs a numpy memmap reader; loud
validation of budget/dtype violations."""

from __future__ import annotations

import gzip
import hashlib
import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from final_ocr_spark.sources.shards import write_jsonl_shards, write_token_shards


def _corpus(spark, n=40):
    return spark.range(n).select(
        F.concat(F.lit("http://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example.com/"), F.col("id").cast("string")).alias("url"),
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body number "), F.col("id").cast("string"),
                 F.lit(" with ünïcode")).alias("text"),
        (F.col("id") % 3 == 0).alias("flagged"),
        F.array(F.lit(0.5), F.col("id").cast("double")).alias("feats"),
    )


def test_jsonl_roundtrip_manifest_and_checksums(spark, tmp_path):
    out = str(tmp_path / "jsonl")
    rows = write_jsonl_shards(_corpus(spark), out, "doc_id", num_shards=3)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    files = [m for m in rows if m["file"]]
    assert sum(m["records"] for m in files) == 40
    for m in files:
        blob = open(m["file"], "rb").read()
        assert hashlib.sha256(blob).hexdigest() == m["sha256"]
        assert len(blob) == m["bytes"]
        # valid JSONL with schema-ordered keys
        lines = gzip.decompress(blob).decode("utf-8").splitlines()
        assert len(lines) == m["records"]
        assert list(json.loads(lines[0]).keys()) == [
            "url", "doc_id", "text", "flagged", "feats"
        ]
    back = spark.read.json(out + "/part-*.jsonl.gz")
    assert back.count() == 40
    got = {r["doc_id"]: r for r in back.collect()}
    assert got[7]["text"] == "document body number 7 with ünïcode"
    assert got[7]["feats"] == [0.5, 7.0]
    # global order: every row in part N sorts before every row in part N+1
    names = sorted(m["file"] for m in files)
    per_file = [
        [json.loads(ln)["doc_id"]
         for ln in gzip.open(f, "rt", encoding="utf-8")]
        for f in names
    ]
    flat = [d for fs in per_file for d in fs]
    assert flat == sorted(flat)


def test_jsonl_rerun_is_byte_identical(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ra = write_jsonl_shards(_corpus(spark), a, "doc_id", num_shards=2)
    rb = write_jsonl_shards(
        _corpus(spark).repartition(5), b, "doc_id", num_shards=2
    )
    assert sorted(m["sha256"] for m in ra if m["file"]) == \
           sorted(m["sha256"] for m in rb if m["file"])


def test_jsonl_rejects_binary_columns(spark, tmp_path):
    df = spark.range(3).select(
        F.col("id"), F.col("id").cast("string").cast("binary").alias("blob")
    )
    with pytest.raises(TypeError, match="binary"):
        write_jsonl_shards(df, str(tmp_path / "x"), "id")


def _chunks(spark, n_docs=30, budget=16):
    from final_ocr_spark.operators.packing import pack_chunks

    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(1), (F.col("id") % 9) + 3),
            lambda i: (F.col("id") * 31 + i) % 997,
        ).alias("input_ids"),
    )
    return pack_chunks(docs, "doc_id", "input_ids", budget=budget, eos_id=0)


def test_token_shards_memmap_layout(spark, tmp_path):
    out = str(tmp_path / "bin")
    chunks = _chunks(spark)
    rows = write_token_shards(chunks, out, budget=16)
    idx = json.load(open(os.path.join(out, "index.json")))
    assert idx["budget"] == 16 and idx["dtype"] == "uint16"
    expected = sorted(
        (r["chunk_id"], list(r["input_ids"])) for r in chunks.collect()
    )
    assert idx["total_chunks"] == len(expected)
    # concatenate files in name order and memmap-read
    flat = []
    for entry in idx["files"]:
        arr = np.fromfile(os.path.join(out, entry["file"]), dtype="<u2")
        assert len(arr) == entry["chunks"] * 16
        flat.extend(arr.reshape(-1, 16).tolist())
    assert flat == [ids for _, ids in expected]
    # manifest checksums + chunk-id ranges cover the sequence in order
    files = sorted((m for m in rows if m["file"]), key=lambda m: m["file"])
    for m in files:
        blob = open(m["file"], "rb").read()
        assert hashlib.sha256(blob).hexdigest() == m["sha256"]
    bounds = [(m["first_chunk"], m["last_chunk"]) for m in files]
    for (_, last), (nxt, _) in zip(bounds, bounds[1:]):
        assert last < nxt


def test_token_shards_reject_wrong_budget_and_overflow(spark, tmp_path):
    chunks = _chunks(spark, budget=16)
    with pytest.raises(Exception, match="expected exactly"):
        write_token_shards(chunks, str(tmp_path / "x"), budget=8)
    big = chunks.withColumn(
        "input_ids",
        F.transform("input_ids", lambda x: x + F.lit(70000)),
    )
    with pytest.raises(Exception, match="does not fit"):
        write_token_shards(big, str(tmp_path / "y"), budget=16)


def test_jsonl_rejects_zero_shards(spark, tmp_path):
    """num_shards=0 must be an error, not a silent fall-through to the
    current-partitioning default (the falsy-check trap)."""
    import pytest

    from final_ocr_spark.sources.shards import write_jsonl_shards

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="num_shards"):
        write_jsonl_shards(df, str(tmp_path / "z"), "doc_id", num_shards=0)


def test_jsonl_preserves_ints_and_temporal_types(spark, tmp_path):
    """The Arrow-native path must not pandas-promote nullable int64 to
    float64 (2^53+1 is unrepresentable in float64 — the id-corruption
    scenario), and must land timestamps/dates as ISO-8601, Decimals as
    lossless strings, nulls as JSON null."""
    from datetime import date, datetime
    from decimal import Decimal

    out = str(tmp_path / "typ")
    df = spark.createDataFrame(
        [(1, None, datetime(2024, 5, 1, 12, 0, 0), date(2024, 5, 1),
          Decimal("1.50")),
         (2, 9007199254740993, None, None, None)],
        "k long, big long, ts timestamp, d date, amt decimal(10,2)",
    )
    rows = write_jsonl_shards(df, out, "k", num_shards=1)
    f = next(m["file"] for m in rows if m["file"])
    lines = gzip.decompress(open(f, "rb").read()).decode("utf-8").splitlines()
    a, b = (json.loads(ln) for ln in lines)
    assert a["k"] == 1 and b["k"] == 2
    assert a["big"] is None
    assert b["big"] == 9007199254740993  # int, not 9.007199254740992e+15
    assert a["ts"] == "2024-05-01T12:00:00Z" and b["ts"] is None
    assert a["d"] == "2024-05-01" and b["d"] is None
    assert a["amt"] == "1.50" and b["amt"] is None


def test_jsonl_rejects_nested_binary(spark, tmp_path):
    df = spark.range(2).select(
        "id",
        F.array(F.col("id").cast("string").cast("binary")).alias("blobs"),
    )
    with pytest.raises(TypeError, match="binary"):
        write_jsonl_shards(df, str(tmp_path / "x"), "id")
