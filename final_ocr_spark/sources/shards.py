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
    """Canonical JSON value for one cell: numpy scalars/arrays → Python,
    timestamps → ISO-8601, NaN → null. Binary columns are rejected before
    the job starts (see write_jsonl_shards)."""
    if v is None:
        return None
    if isinstance(v, float) and v != v:  # NaN
        return None
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "tolist"):  # numpy scalar or array
        v = v.tolist()
    if isinstance(v, list):
        return [_json_cell(x) for x in v]
    if isinstance(v, dict):
        return {k: _json_cell(x) for k, x in v.items()}
    return v


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
    column): it defines the global row order across shards and makes the
    output byte-deterministic under reruns and repartitioning.
    ``num_shards`` pins the shard count (else the current partitioning
    decides — at scale let AQE size the range exchange instead)."""
    for f_ in df.schema.fields:
        if isinstance(f_.dataType, T.BinaryType):
            raise TypeError(
                f"column {f_.name!r} is binary — JSONL shards carry text "
                "metadata; decode or drop binary payloads first"
            )
    cols = df.columns
    args = ([num_shards] if num_shards else []) + [order_col]
    slim = df.repartitionByRange(*args).sortWithinPartitions(order_col)
    os.makedirs(out_dir, exist_ok=True)

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        final = os.path.join(out_dir, f"part-{pid:05d}.jsonl.gz")
        tmp = f"{final}.tmp-{attempt}"
        n = 0
        raw = hf = gz = None
        try:
            for pdf in batches:
                if not len(pdf):
                    continue
                if gz is None:
                    raw = open(tmp, "wb")
                    hf = _HashingFile(raw)
                    # mtime=0 + no filename → compressed bytes are a pure
                    # function of content (rerun determinism)
                    gz = gzip.GzipFile(fileobj=hf, mode="wb", mtime=0)
                for row in pdf.itertuples(index=False):
                    obj = {c: _json_cell(v) for c, v in zip(cols, row)}
                    gz.write(
                        (json.dumps(obj, ensure_ascii=False,
                                    separators=(",", ":")) + "\n")
                        .encode("utf-8")
                    )
                n += len(pdf)
            if gz is not None:
                gz.close()
                gz = None
                raw.close()
                raw = None
                os.replace(tmp, final)
                yield pd.DataFrame(
                    [(final, n, hf.nbytes, hf.sha.hexdigest())],
                    columns=["file", "records", "bytes", "sha256"],
                )
        finally:
            if gz is not None:
                gz.close()
            if raw is not None:
                raw.close()
            if os.path.exists(tmp):
                os.remove(tmp)

    rows = [
        r.asDict()
        for r in slim.mapInPandas(
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
