"""Training-data delivery sinks: checksummed gzip-JSONL corpus shards and
raw token-id binary shards (memmap-ready).

Public corpus releases (Dolma, FineWeb, RedPajama) ship as gzip'd JSONL
shards with a manifest of per-file row counts and checksums; training
loaders consume either those or flat binary token shards (fixed-width ids,
memmap + index — the GPT-2/Megatron layout). These sinks produce both from
the engine's corpus / packed-chunk tables, completing the pipeline story:
pages → corpus → tokens → chunks → shards a trainer mounts directly.

Shared contract (the write_wet/_partitioned_warc_write pattern,
sources/warc.py:538):

* one file per partition, streamed batch-by-batch — peak memory is one
  Arrow batch, never a partition;
* global order: input is range-partitioned + sorted on ``order_col``, so
  part-00000 < part-00001 < … is a total order over rows (sort by
  sampling.shuffle_order upstream for the standard reproducible training
  shuffle);
* each task writes ``<name>.tmp-<attempt>`` then ``os.replace``s to the
  deterministic final name — retries/speculative attempts overwrite
  byte-identically (gzip streams are built with ``mtime=0`` so compressed
  bytes are a pure function of content);
* per-file sha256 is computed WHILE writing (no second read) and landed in
  ``manifest.json``; ``_SUCCESS`` is written only after every task
  reported and every manifest file is visible from the driver (loud
  shared-filesystem check, same as the WARC sinks);
* empty partitions produce no file (no zero-byte shards in the release).
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DTYPES = {"uint16": (2, 0, 2**16 - 1), "uint32": (4, 0, 2**32 - 1)}


class _HashingFile:
    """File wrapper that sha256's and counts every byte as it is written."""

    def __init__(self, fh):
        self._fh = fh
        self.sha = hashlib.sha256()
        self.nbytes = 0

    def write(self, b: bytes) -> int:
        self.sha.update(b)
        self.nbytes += len(b)
        return self._fh.write(b)

    def flush(self) -> None:
        self._fh.flush()


def _finish(out_dir: str, rows: list[dict], sink_name: str,
            extra: dict | None = None) -> list[dict]:
    missing = [
        m["file"] for m in rows if m["file"] and not os.path.exists(m["file"])
    ]
    if missing:
        raise RuntimeError(
            f"{sink_name}: {len(missing)} part file(s) not visible from the "
            f"driver (first: {missing[0]}) — out_dir must be a filesystem "
            "shared by driver and executors (local mode, NFS); object "
            "stores / hdfs:// URIs are not supported by this sink"
        )
    with open(os.path.join(out_dir, "manifest.json"), "w", encoding="utf-8") as f:
        json.dump(rows, f, indent=1)
    if extra:
        for name, payload in extra.items():
            with open(os.path.join(out_dir, name), "w", encoding="utf-8") as f:
                json.dump(payload, f, indent=1)
    with open(os.path.join(out_dir, "_SUCCESS"), "w", encoding="utf-8"):
        pass
    return rows


def _json_cell(v):
    """Canonical JSON value for one cell of an Arrow ``to_pylist`` row:
    timestamps/dates → ISO-8601, Decimal → string (lossless), NaN/±inf →
    null (JSON has no representation), lists/structs recurse. Ints arrive
    as Python ints (the Arrow path never pandas-promotes a nullable int64
    column to float64). Binary columns are rejected — recursively — before
    the job starts (see write_jsonl_shards)."""
    import datetime
    import decimal
    import math

    if v is None:
        return None
    if isinstance(v, float):
        return v if math.isfinite(v) else None
    if isinstance(v, datetime.datetime):
        # timestamps arrive session-zoned from Arrow; canonicalize to UTC
        # 'Z' so shard bytes don't depend on the writer's timezone
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc)
            return v.isoformat().replace("+00:00", "Z")
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, list):
        return [_json_cell(x) for x in v]
    if isinstance(v, dict):
        return {k: _json_cell(x) for k, x in v.items()}
    return v


def _reject_binary(dt, name: str) -> None:
    """Recursive BinaryType check: nested binary would reach json.dumps as
    bytes and crash mid-task — fail before the job starts instead."""
    if isinstance(dt, T.BinaryType):
        raise TypeError(
            f"column {name!r} is (or contains) binary — JSONL shards carry "
            "text metadata; decode or drop binary payloads first"
        )
    if isinstance(dt, T.ArrayType):
        _reject_binary(dt.elementType, f"{name}[]")
    elif isinstance(dt, T.MapType):
        _reject_binary(dt.keyType, f"{name}<key>")
        _reject_binary(dt.valueType, f"{name}<value>")
    elif isinstance(dt, T.StructType):
        for f_ in dt.fields:
            _reject_binary(f_.dataType, f"{name}.{f_.name}")


def write_jsonl_shards(
    df: DataFrame,
    out_dir: str,
    order_col: str,
    *,
    num_shards: int | None = None,
) -> list[dict]:
    """Corpus → ``part-NNNNN.jsonl.gz`` shards + ``manifest.json``
    (file, records, bytes, sha256) + ``_SUCCESS``. One JSON object per row,
    keys in schema order, ``ensure_ascii=False`` (the reference's JSON
    canonicalization, ocr2.py:703), compact separators, ``\\n``-terminated —
    the exact layout ``spark.read.json`` and every JSONL loader ingest.

    ``order_col`` must be unique per row (url, doc key, or a shuffle_order
    column): it defines the global ROW order across shards, which is
    always identical under reruns and repartitioning. Per-FILE bytes (and
    so the manifest sha256s) are additionally identical whenever the range
    bounds are reproduced — always true for task retries/speculation
    within a run (same bounds), and across runs when the input
    partitioning and ``num_shards`` are unchanged; a different upstream
    partitioning can shift RangePartitioner's sampled cut points, moving
    rows between adjacent shards without changing content or order.
    ``num_shards`` pins the shard count (else the current partitioning
    decides — at scale let AQE size the range exchange instead).

    The write path is Arrow-native (``mapInArrow``): a pandas hop would
    promote nullable int64 columns to float64 and serialize ids as
    ``7.0`` — ints stay ints, nulls stay nulls, timestamps/dates arrive
    as datetime objects and land as ISO-8601 strings."""
    if num_shards is not None and num_shards < 1:
        # an explicit truthiness check would silently treat 0 as "decide
        # for me" — a caller asking for zero shards gets an error, not the
        # current-partitioning default
        raise ValueError(f"num_shards must be >= 1 or None, got {num_shards}")
    for f_ in df.schema.fields:
        _reject_binary(f_.dataType, f_.name)
    cols = df.columns
    args = ([num_shards] if num_shards is not None else []) + [order_col]
    slim = df.repartitionByRange(*args).sortWithinPartitions(order_col)
    os.makedirs(out_dir, exist_ok=True)

    def _write(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        final = os.path.join(out_dir, f"part-{pid:05d}.jsonl.gz")
        tmp = f"{final}.tmp-{attempt}"
        n = 0
        raw = hf = gz = None
        try:
            for batch in batches:
                if not batch.num_rows:
                    continue
                if gz is None:
                    raw = open(tmp, "wb")
                    hf = _HashingFile(raw)
                    # mtime=0 + no filename → compressed bytes are a pure
                    # function of content (rerun determinism)
                    gz = gzip.GzipFile(fileobj=hf, mode="wb", mtime=0)
                for rec in batch.to_pylist():
                    obj = {c: _json_cell(rec[c]) for c in cols}
                    gz.write(
                        (json.dumps(obj, ensure_ascii=False,
                                    separators=(",", ":")) + "\n")
                        .encode("utf-8")
                    )
                n += batch.num_rows
            if gz is not None:
                gz.close()
                gz = None
                raw.close()
                raw = None
                os.replace(tmp, final)
                yield pa.RecordBatch.from_pylist([{
                    "file": final, "records": n,
                    "bytes": hf.nbytes, "sha256": hf.sha.hexdigest(),
                }])
        finally:
            if gz is not None:
                gz.close()
            if raw is not None:
                raw.close()
            if os.path.exists(tmp):
                os.remove(tmp)

    rows = [
        r.asDict()
        for r in slim.mapInArrow(
            _write, schema="file string, records long, bytes long, sha256 string"
        ).collect()  # bounded: <= one row per partition
    ]
    return _finish(out_dir, rows, "write_jsonl_shards")


def write_token_shards(
    chunks: DataFrame,
    out_dir: str,
    *,
    budget: int,
    ids_col: str = "input_ids",
    order_col: str = "chunk_id",
    id_col: str = "chunk_id",
    dtype: str = "uint16",
) -> list[dict]:
    """Packed chunks (operators/packing.pack_chunks) → flat little-endian
    token-id shards ``part-NNNNN.bin`` + ``index.json`` + ``manifest.json``
    + ``_SUCCESS`` — the memmap layout training loaders mount directly:
    chunk ``i`` of a file is bytes ``[i*budget*w, (i+1)*budget*w)``,
    ``w = index.json["bytes_per_token"]``; files concatenate in name order
    into the global chunk sequence.

    ``order_col`` is the SORT key for the global byte order (pass a
    sampling.shuffle_order column to export in reproducible training-
    shuffle order); ``id_col`` is the chunk identity recorded in the
    manifest (``first_chunk``/``last_chunk`` are the boundary ids in
    write order — contiguous ranges under natural order, provenance
    markers under a shuffle).

    Loud validation INSIDE the write (no second scan): every chunk must be
    exactly ``budget`` ids and every id must fit ``dtype`` — a silent
    wraparound would corrupt every downstream batch, so out-of-range
    vocabularies fail the job, not the loader."""
    if dtype not in _DTYPES:
        raise ValueError(f"dtype must be one of {sorted(_DTYPES)}, got {dtype!r}")
    if budget <= 0:
        raise ValueError("budget must be positive")
    width, lo, hi = _DTYPES[dtype]
    slim = (
        chunks.select(
            F.col(order_col).alias("_o"),
            F.col(id_col).cast("long").alias("_k"),
            F.col(ids_col).alias("_ids"),
        )
        .repartitionByRange("_o")
        .sortWithinPartitions("_o")
    )
    os.makedirs(out_dir, exist_ok=True)

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        final = os.path.join(out_dir, f"part-{pid:05d}.bin")
        tmp = f"{final}.tmp-{attempt}"
        n = 0
        first = last = None
        hf = raw = None
        try:
            for pdf in batches:
                if not len(pdf):
                    continue
                if raw is None:
                    raw = open(tmp, "wb")
                    hf = _HashingFile(raw)
                flat = []
                for k, ids in zip(pdf["_k"], pdf["_ids"]):
                    if ids is None or len(ids) != budget:
                        got = 0 if ids is None else len(ids)
                        raise ValueError(
                            f"chunk {k}: expected exactly {budget} ids, got "
                            f"{got} — write_token_shards consumes "
                            "pack_chunks output (drop_last or pad_id)"
                        )
                    flat.append(np.asarray(ids, dtype=np.int64))
                arr = np.concatenate(flat)
                if arr.min() < lo or arr.max() > hi:
                    bad = int(arr.min()) if arr.min() < lo else int(arr.max())
                    raise ValueError(
                        f"token id {bad} does not fit {dtype} — use a wider "
                        "dtype or check the vocabulary"
                    )
                hf.write(arr.astype(f"<u{width}").tobytes())
                n += len(pdf)
                if first is None:
                    first = int(pdf["_k"].iloc[0])
                last = int(pdf["_k"].iloc[-1])
            if raw is not None:
                raw.close()
                raw = None
                os.replace(tmp, final)
                yield pd.DataFrame(
                    [(final, n, first, last, hf.nbytes, hf.sha.hexdigest())],
                    columns=["file", "chunks", "first_chunk", "last_chunk",
                             "bytes", "sha256"],
                )
        finally:
            if raw is not None:
                raw.close()
            if os.path.exists(tmp):
                os.remove(tmp)

    rows = [
        r.asDict()
        for r in slim.mapInPandas(
            _write,
            schema="file string, chunks long, first_chunk long, "
                   "last_chunk long, bytes long, sha256 string",
        ).collect()  # bounded: <= one row per partition
    ]
    index = {
        "budget": budget,
        "dtype": dtype,
        "bytes_per_token": width,
        "total_chunks": sum(m["chunks"] for m in rows),
        "files": [
            {"file": os.path.basename(m["file"]), "chunks": m["chunks"]}
            for m in sorted(rows, key=lambda m: m["file"] or "")
            if m["file"]
        ],
    }
    return _finish(out_dir, rows, "write_token_shards",
                   extra={"index.json": index})
