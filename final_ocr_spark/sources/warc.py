"""WARC ingestion: raw Common-Crawl archives → the pages table shape.

The engine's primary input is an Iceberg-layout pages table, but that table
has to be ingested from somewhere: Common Crawl publishes WARC/1.0 (ISO
28500) archives — ``.warc.gz`` files where (by CC convention) every record is
its own gzip member. This module turns a directory of WARC files into
``(url, warc_ts, html, text, lang)`` rows, i.e. exactly the mandated input
schema, so ``extract_pages`` composes directly on top.

Scale shape:

* one WARC file = one task (``binaryFile`` source). WARC.gz is not splittable
  mid-file, but a crawl ships tens of thousands of ~1 GB segment files — at
  1000 executors the file count, not split count, is the parallelism budget
  (the standard public recipe for CC-on-Spark).
* parsing runs in ``mapInPandas`` — Arrow batches of file blobs in, record
  rows out (1→N), zero per-row Python outside the batch loop.
* malformed records quarantine into an ``error`` row per file rather than
  failing the task (the reference's per-document error swallowing,
  ocr2.py:549-551, applied per archive).

Format notes (public spec / CPython stdlib only):

* record framing: header block terminated by CRLF CRLF; ``Content-Length``
  gives the payload size; two CRLFs separate records.
* ``gzip.decompress`` handles multi-member streams, so per-record-gzipped CC
  files and whole-file gzip both work; plain ``.warc`` is passed through.
* HTTP ``response`` payloads carry raw HTTP: status line + headers, CRLF
  CRLF, body; ``Transfer-Encoding: chunked`` bodies are de-chunked (CC
  stores the wire bytes).
"""

from __future__ import annotations

import gzip
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF2 = b"\r\n\r\n"


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked body; returns input on any framing error."""
    out, i, n = [], 0, len(body)
    try:
        while i < n:
            eol = body.index(b"\r\n", i)
            size = int(body[i:eol].split(b";")[0], 16)
            if size == 0:
                break
            start = eol + 2
            out.append(body[start:start + size])
            i = start + size + 2  # skip chunk-data CRLF
        return b"".join(out)
    except (ValueError, IndexError):
        return body


def _http_body(payload: bytes) -> bytes:
    """Raw HTTP response bytes → body (headers stripped, de-chunked)."""
    sep = payload.find(_CRLF2)
    if sep < 0 or not payload[:5] in (b"HTTP/", b"http/"):
        return payload  # not HTTP framing: treat the payload as the body
    headers = payload[:sep].lower()
    body = payload[sep + 4:]
    if b"transfer-encoding:" in headers and b"chunked" in headers:
        body = _dechunk(body)
    return body


def iter_warc_records(blob: bytes) -> Iterator[dict]:
    """Parse one WARC file's bytes → dicts of WARC headers + ``payload``.

    Pure function over bytes (testable without Spark). Stops cleanly at a
    truncated tail; raises ValueError on unparseable framing so the caller
    can quarantine the file.
    """
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)  # multi-member per CC convention
    i, n = 0, len(blob)
    while i < n:
        # skip inter-record CRLFs
        while i < n and blob[i:i + 2] == b"\r\n":
            i += 2
        if i >= n:
            return
        head_end = blob.find(_CRLF2, i)
        if head_end < 0:
            return  # truncated tail: yield what we have
        head = blob[i:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line at byte {i}: {lines[0][:40]!r}")
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"missing/bad Content-Length at byte {i}")
        payload = blob[head_end + 4:head_end + 4 + length]
        fields["payload"] = payload
        yield fields
        i = head_end + 4 + length


def _rows_for_file(path: str, blob: bytes, warc_types: tuple[str, ...]) -> list[dict]:
    rows = []
    try:
        for rec in iter_warc_records(blob):
            if rec.get("warc-type") not in warc_types:
                continue
            url = rec.get("warc-target-uri")
            ts = rec.get("warc-date")  # ISO-8601; cast engine-side
            body = _http_body(rec["payload"])
            rows.append(
                {"url": url, "warc_ts": ts, "html": body,
                 "text": None, "lang": None, "error": None}
            )
    except ValueError as e:
        rows.append(
            {"url": path, "warc_ts": None, "html": None,
             "text": None, "lang": None, "error": f"warc-parse: {e}"}
        )
    return rows


def read_warc(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    warc_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """Directory of WARC(.gz) files → pages rows (+ per-file quarantine).

    Output matches the mandated input schema with an ``error`` column:
    ``error is null`` rows are pages; a non-null row means the whole archive
    failed framing (path in ``url``). ``drop('error')`` for the pure shape.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )

    raw_schema = (
        "url string, warc_ts string, html binary, text string, lang string, "
        "error string"
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path_, blob in zip(pdf["path"], pdf["content"]):
                out.extend(_rows_for_file(path_, bytes(blob), warc_types))
            yield pd.DataFrame(
                out,
                columns=["url", "warc_ts", "html", "text", "lang", "error"],
            )

    parsed = raw.mapInPandas(_parse, schema=raw_schema)
    # WARC-Date is ISO-8601 ('2017-03-06T04:02:06Z') — cast JVM-side.
    # try_to_timestamp: a malformed date nulls the field instead of killing
    # the task under ANSI mode (Spark 4 default).
    return parsed.withColumn(
        "warc_ts", F.try_to_timestamp(F.col("warc_ts"), F.lit("yyyy-MM-dd'T'HH:mm:ssX"))
    ).select("url", "warc_ts", "html", "text", "lang", "error")


def write_warc_bytes(records: list[dict], per_record_gzip: bool = True) -> bytes:
    """Serialize records to WARC/1.0 bytes (test fixture / round-trip aid).

    Each record dict: ``{url, date, body, warc_type='response',
    http_status=200, chunked=False}``. Emits spec framing; with
    ``per_record_gzip`` each record is its own gzip member (CC convention).
    """
    out = []
    for r in records:
        body = r["body"]
        if r.get("chunked"):
            body = b"%x\r\n" % len(body) + body + b"\r\n0\r\n\r\n"
        status = r.get("http_status", 200)
        payload = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n"
            + ("Transfer-Encoding: chunked\r\n" if r.get("chunked") else "")
            + "\r\n"
        ).encode() + body
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r.get('warc_type', 'response')}\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {r['date']}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
        ).encode()
        # head lines already end with CRLF: one more CRLF terminates the block
        rec = head + b"\r\n" + payload + _CRLF2
        out.append(gzip.compress(rec) if per_record_gzip else rec)
    return b"".join(out)
