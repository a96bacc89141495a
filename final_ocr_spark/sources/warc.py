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
* decompression and record framing are STREAMING: gzip members decompress
  incrementally (``zlib.decompressobj``, bounded input slices) and the
  parser buffers only the current record — peak memory per task is the
  compressed blob (which ``binaryFile`` already holds) + one record + one
  output batch, never the ~4-5× decompressed archive.
* record rows leave the parser in bounded batches (≤``_BATCH_RECORDS``) via
  ``mapInPandas`` — Arrow batches of file blobs in, record rows out (1→N),
  zero per-row Python outside the batch loop.
* malformed archives quarantine into an ``error`` row per file rather than
  failing the task (the reference's per-document error swallowing,
  ocr2.py:549-551, applied per archive); records missing WARC-Target-URI
  are skipped (a null url would silently collapse under latest-wins dedup).

Format notes (public spec / CPython stdlib only):

* record framing: header block terminated by CRLF CRLF; ``Content-Length``
  gives the payload size; two CRLFs separate records.
* per-record-gzipped CC files, whole-file gzip, and plain ``.warc`` all
  parse; concatenated members are handled by resetting the decompressor at
  member boundaries.
* HTTP ``response`` payloads carry raw HTTP: status line + headers, CRLF
  CRLF, body; ``Transfer-Encoding: chunked`` bodies are de-chunked and
  ``Content-Encoding: gzip/deflate`` bodies are decoded (CC stores the wire
  bytes); ``br`` bodies pass through raw (no brotli in the stdlib).
"""

from __future__ import annotations

import gzip
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF2 = b"\r\n\r\n"
_GZ_SLICE = 1 << 22  # 4 MB compressed feed per decompress call
_BATCH_RECORDS = 256  # rows per yielded Arrow batch


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
    """Raw HTTP response bytes → body (headers stripped, de-chunked,
    content-decoded). Wire order per RFC: chunked framing is removed first,
    then Content-Encoding. Undecodable bodies return as-is (br, corrupt)."""
    sep = payload.find(_CRLF2)
    if sep < 0 or not payload[:5] in (b"HTTP/", b"http/"):
        return payload  # not HTTP framing: treat the payload as the body
    headers = payload[:sep].lower()
    body = payload[sep + 4:]
    if b"transfer-encoding:" in headers and b"chunked" in headers:
        body = _dechunk(body)
    if b"content-encoding:" in headers:
        try:
            if b"gzip" in headers or b"x-gzip" in headers:
                body = gzip.decompress(body)
            elif b"deflate" in headers:
                try:
                    body = zlib.decompress(body)
                except zlib.error:  # raw-deflate servers (no zlib wrapper)
                    body = zlib.decompress(body, -zlib.MAX_WBITS)
        except (OSError, EOFError, zlib.error):
            pass  # undecodable: keep wire bytes (quarantined downstream)
    return body


def _decompressed_chunks(blob: bytes) -> Iterator[bytes]:
    """Stream-decompress a (possibly multi-member) gzip blob in bounded
    slices; plain blobs yield as-is. Raises ValueError on corrupt gzip so
    the caller's quarantine path fires."""
    if blob[:2] != b"\x1f\x8b":
        yield blob
        return
    view = memoryview(blob)
    d = zlib.decompressobj(16 + zlib.MAX_WBITS)  # gzip wrapper
    i, n = 0, len(blob)
    pending = b""
    fresh = True  # current decompressor has consumed no input yet
    try:
        while pending or i < n:
            if pending:
                buf, pending = pending, b""
            else:
                buf = view[i:i + _GZ_SLICE]
                i += _GZ_SLICE
            out = d.decompress(buf)
            fresh = False
            if out:
                yield out
            while d.eof:  # member boundary: reset for the next member
                rest = d.unused_data
                d = zlib.decompressobj(16 + zlib.MAX_WBITS)
                fresh = True
                if not rest:
                    break
                out = d.decompress(rest)
                fresh = False
                if out:
                    yield out
        if not fresh and not d.eof:
            # input exhausted mid-member: a truncated download, not a tail
            # the format allows — quarantine, don't silently ship less data
            raise ValueError("gzip: truncated member")
        tail = d.flush()
        if tail:
            yield tail
    except zlib.error as e:  # corrupt member mid-stream
        raise ValueError(f"gzip: {e}")


class _StreamBuf:
    """Minimal growable window over an iterator of byte chunks: the parser
    holds only [pos:] of the current record, never the whole archive."""

    def __init__(self, chunks: Iterator[bytes]) -> None:
        self._chunks = chunks
        self.buf = b""
        self.pos = 0

    def _compact(self) -> None:
        if self.pos > (1 << 20) and self.pos > len(self.buf) // 2:
            self.buf = self.buf[self.pos:]
            self.pos = 0

    def fill_to(self, need: int) -> bool:
        """Ensure ≥need bytes available after pos; False on EOF short."""
        while len(self.buf) - self.pos < need:
            nxt = next(self._chunks, None)
            if nxt is None:
                return False
            self._compact()
            self.buf += nxt
        return True

    def find(self, token: bytes) -> int:
        """Offset of token after pos (pulling chunks as needed), or -1."""
        while True:
            j = self.buf.find(token, self.pos)
            if j >= 0:
                return j - self.pos
            nxt = next(self._chunks, None)
            if nxt is None:
                return -1
            self._compact()
            self.buf += nxt

    def take(self, k: int) -> bytes:
        out = self.buf[self.pos:self.pos + k]
        self.pos += k
        return out

    def peek(self, k: int) -> bytes:
        return self.buf[self.pos:self.pos + k]


def iter_warc_records(blob: bytes) -> Iterator[dict]:
    """Parse one WARC file's bytes → dicts of WARC headers + ``payload``.

    Pure function over bytes (testable without Spark); decompresses and
    frames INCREMENTALLY — memory is one record, not the archive. Stops
    cleanly at a truncated tail; raises ValueError on unparseable framing
    (bad version line, bad length, corrupt gzip) so the caller can
    quarantine the file.
    """
    if blob[:2] == b"\x1f\x8b" and len(blob) < 10:
        raise ValueError("gzip: truncated header")
    s = _StreamBuf(_decompressed_chunks(blob))
    while True:
        # skip inter-record CRLFs
        while s.fill_to(2) and s.peek(2) == b"\r\n":
            s.take(2)
        if not s.fill_to(1):
            return
        rel = s.find(_CRLF2)
        if rel < 0:
            return  # truncated tail inside a header block
        head = s.take(rel).decode("utf-8", "replace")
        s.take(4)
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {lines[0][:40]!r}")
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError):
            raise ValueError("missing/bad Content-Length")
        if not s.fill_to(length):
            return  # payload truncated at EOF: drop the partial record
        fields["payload"] = s.take(length)
        yield fields


def _record_rows(
    path: str, blob: bytes, warc_types: tuple[str, ...]
) -> Iterator[dict]:
    """Rows for one archive; any parse/decompress failure becomes ONE
    quarantine row (never a task failure — gzip raises OSError/EOFError,
    framing raises ValueError; all funneled here)."""
    try:
        for rec in iter_warc_records(blob):
            if rec.get("warc-type") not in warc_types:
                continue
            url = rec.get("warc-target-uri")
            if not url:
                # a null url would collapse under latest-wins dedup and is
                # invisible to every url-keyed stage: skip, don't emit
                continue
            if rec.get("warc-type") in ("conversion", "metadata"):
                # WET extracted-text / WAT JSON-envelope records: payload is
                # the content itself (no HTTP wrapper) — lands in the text
                # column (JSON string for metadata records)
                yield {
                    "url": url,
                    "warc_ts": rec.get("warc-date"),
                    "html": None,
                    "text": rec["payload"].decode("utf-8", "replace"),
                    "lang": None, "error": None,
                }
                continue
            yield {
                "url": url,
                "warc_ts": rec.get("warc-date"),  # ISO-8601; cast engine-side
                "html": _http_body(rec["payload"]),
                "text": None, "lang": None, "error": None,
            }
    except (ValueError, OSError, EOFError, zlib.error) as e:
        yield {
            "url": path, "warc_ts": None, "html": None,
            "text": None, "lang": None, "error": f"warc-parse: {e}",
        }


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
    ``warc_ts`` is null when WARC-Date is malformed (page still emitted).
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )
    return pages_from_archives(raw, warc_types=warc_types)


def pages_from_archives(
    raw: DataFrame, warc_types: tuple[str, ...] = ("response",)
) -> DataFrame:
    """(path, content) archive blobs → pages rows (+ per-file quarantine).
    The parse stage of :func:`read_warc`, factored out so the STREAMING
    path (a readStream binaryFile source over a WARC drop directory, or a
    foreachBatch micro-batch) runs the identical framing/decode/quarantine
    code as the batch reader."""
    raw = raw.select("path", "content")
    raw_schema = (
        "url string, warc_ts string, html binary, text string, lang string, "
        "error string"
    )
    cols = ["url", "warc_ts", "html", "text", "lang", "error"]

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for path_, blob in zip(pdf["path"], pdf["content"]):
                for row in _record_rows(path_, bytes(blob), warc_types):
                    out.append(row)
                    if len(out) >= _BATCH_RECORDS:  # bound peak row memory
                        yield pd.DataFrame(out, columns=cols)
                        out = []
            if out:
                yield pd.DataFrame(out, columns=cols)

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
    http_status=200, chunked=False, content_encoding=None}``. Emits spec
    framing; with ``per_record_gzip`` each record is its own gzip member
    (CC convention).
    """
    out = []
    for r in records:
        wtype = r.get("warc_type", "response")
        body = r["body"]
        if wtype == "conversion":
            # WET-style extracted-text record: plain-text payload, no HTTP
            payload = body
            block_ct = "text/plain"
        elif wtype == "metadata":
            # WAT-style record: JSON envelope payload, no HTTP wrapper
            payload = body
            block_ct = "application/json"
        else:
            enc = r.get("content_encoding")
            if enc == "gzip":
                body = gzip.compress(body)
            elif enc == "deflate":
                body = zlib.compress(body)
            if r.get("chunked"):
                body = b"%x\r\n" % len(body) + body + b"\r\n0\r\n\r\n"
            status = r.get("http_status", 200)
            payload = (
                f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n"
                + ("Transfer-Encoding: chunked\r\n" if r.get("chunked") else "")
                + (f"Content-Encoding: {enc}\r\n" if enc else "")
                + "\r\n"
            ).encode() + body
            block_ct = "application/http; msgtype=response"
        uri = r.get("url")
        digest = r.get("payload_digest")
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            + (f"WARC-Target-URI: {uri}\r\n" if uri is not None else "")
            + f"WARC-Date: {r['date']}\r\n"
            + (f"WARC-Payload-Digest: {digest}\r\n" if digest else "")
            + f"Content-Length: {len(payload)}\r\n"
            f"Content-Type: {block_ct}\r\n"
        ).encode()
        # head lines already end with CRLF: one more CRLF terminates the block
        rec = head + b"\r\n" + payload + _CRLF2
        # mtime=0 pins the gzip header: retries/speculative attempts produce
        # byte-identical members (the direct-committer + CDX-offset contract)
        out.append(gzip.compress(rec, mtime=0) if per_record_gzip else rec)
    return b"".join(out)


def write_wet(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    text_col: str = "text",
    ts_col: str = "warc_ts",
    per_record_gzip: bool = True,
) -> list[dict]:
    """Distributed WET export: the extracted corpus as WARC/1.0
    ``conversion`` records (Common Crawl's WET deliverable — what
    downstream text consumers ingest), one ``part-NNNNN.warc.gz`` per
    input partition.

    An ACTION: runs the job, writes the part files plus ``manifest.json``
    and ``_SUCCESS`` into ``out_dir``, and returns the manifest rows
    (one per written file — O(#partitions), the same bounded-collect
    budget as the extraction manifest). Null-text rows are skipped and
    counted per file. Null timestamps stamp the epoch (WARC-Date is
    mandatory in the spec).

    Scale/robustness shape:

    * records stream to the part file batch-by-batch as Arrow batches
      arrive — peak memory is one batch, never a partition;
    * each task writes ``part-NNNNN.warc.gz.tmp-<attempt>`` then
      ``os.replace``s to the deterministic final name: retries and
      speculative duplicates overwrite ATOMICALLY with byte-identical
      content (partition input is deterministic), so any completed
      attempt leaves a correct file — the classic direct-output-committer
      pattern, valid on POSIX/HDFS-like stores (object stores without
      atomic rename should write to a staging prefix and commit via the
      manifest instead — documented, not implemented);
    * ``_SUCCESS`` is written only after every task reported, so readers
      (and this engine's own bench corpus cache) can gate on it.

    Round-trips through :func:`read_warc` with
    ``warc_types=("conversion",)`` — text arrives in the ``text`` column.
    """
    slim = df.select(
        F.col(url_col).alias("url"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts"),
        F.col(text_col).alias("text"),
    )

    def _records(pdf: pd.DataFrame) -> tuple[list[dict], int]:
        recs, skipped = [], 0
        for url, ts, text in zip(pdf["url"], pdf["ts"], pdf["text"]):
            if text is None or url is None:
                skipped += 1
                continue
            recs.append({
                "url": url,
                "date": ts or "1970-01-01T00:00:00Z",
                "body": text.encode("utf-8"),
                "warc_type": "conversion",
            })
        return recs, skipped

    return _partitioned_warc_write(
        slim, out_dir, _records, per_record_gzip, sink_name="write_wet"
    )


def write_wat(
    pages: DataFrame,
    out_dir: str,
    url_col: str = "url",
    html_col: str = "html",
    ts_col: str = "warc_ts",
    per_record_gzip: bool = True,
    max_links: int = 1000,
) -> list[dict]:
    """Distributed WAT export: per-page metadata as WARC/1.0 ``metadata``
    records with a JSON envelope payload (Common Crawl's WAT deliverable —
    what link-graph and metadata consumers ingest, one record per page).

    Envelope shape (CC-WAT-like, the commonly-consumed subset):
    ``Envelope.WARC-Header-Metadata`` carries the original record header
    fields; ``Envelope.Payload-Metadata.HTML-Metadata`` carries ``Head``
    (title / metas from extract/metadata.py's tolerant parse) and ``Links``
    (resolved outlinks with anchor text from operators/links.py — same
    caps and scheme filters as the link-graph path).

    Same sink contract as :func:`write_wet`: one part per partition,
    batch-streamed, tmp+atomic-replace, manifest.json + _SUCCESS, bounded
    collect. Null-html pages are skipped and counted. Round-trips through
    :func:`read_warc` with ``warc_types=("metadata",)`` — the JSON arrives
    in the ``text`` column (``F.get_json_object``/``from_json`` downstream).
    """
    import json

    slim = pages.select(
        F.col(url_col).alias("url"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts"),
        F.col(html_col).alias("html"),
    )

    def _records(pdf: pd.DataFrame) -> tuple[list[dict], int]:
        # worker-side imports (pure cores load once per worker process)
        from final_ocr_spark.extract.metadata import parse_metadata
        from final_ocr_spark.operators.links import parse_outlinks

        recs, skipped = [], 0
        for url, ts, raw in zip(pdf["url"], pdf["ts"], pdf["html"]):
            if raw is None or url is None:
                skipped += 1
                continue
            raw = bytes(raw)
            meta = parse_metadata(raw)
            links = parse_outlinks(url, raw, max_links=max_links)
            head: dict = {}
            if meta["title"] is not None:
                head["Title"] = meta["title"]
            metas = [
                {"name": k, "content": meta[k]}
                for k in ("description", "canonical_url", "lang_attr",
                          "og_title", "og_site_name", "og_type",
                          "published_time")
                if meta[k] is not None
            ]
            if metas:
                head["Metas"] = metas
            envelope = {
                "Envelope": {
                    "WARC-Header-Metadata": {
                        "WARC-Target-URI": url,
                        "WARC-Date": ts or "1970-01-01T00:00:00Z",
                        "WARC-Type": "response",
                    },
                    "Payload-Metadata": {
                        "HTML-Metadata": {
                            "Head": head,
                            "Links": [
                                {"url": u, "text": a,
                                 **({"rel": "nofollow"} if nf else {})}
                                for u, a, nf in links
                            ],
                        }
                    },
                }
            }
            recs.append({
                "url": url,
                "date": ts or "1970-01-01T00:00:00Z",
                "body": json.dumps(
                    envelope, ensure_ascii=False, separators=(",", ":")
                ).encode("utf-8"),
                "warc_type": "metadata",
            })
        return recs, skipped

    return _partitioned_warc_write(
        slim, out_dir, _records, per_record_gzip, sink_name="write_wat"
    )


def _partitioned_warc_write(
    slim: DataFrame,
    out_dir: str,
    batch_to_records,
    per_record_gzip: bool,
    sink_name: str,
) -> list[dict]:
    """Shared partitioned WARC sink (see write_wet's docstring for the
    full scale/robustness contract): records stream out batch-by-batch
    (peak memory = one Arrow batch), each task writes
    ``part-NNNNN.warc.gz.tmp-<attempt>`` then ``os.replace``s to the
    deterministic final name (retries/speculative attempts overwrite
    byte-identically — direct-committer pattern; POSIX/NFS only, loudly
    checked), manifest.json + _SUCCESS only after every task reported."""
    import os

    from pyspark import TaskContext

    os.makedirs(out_dir, exist_ok=True)

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        final = os.path.join(out_dir, f"part-{pid:05d}.warc.gz")
        tmp = f"{final}.tmp-{attempt}"
        n = skipped = nbytes = 0
        fh = None
        try:
            for pdf in batches:
                recs, sk = batch_to_records(pdf)
                skipped += sk
                if not recs:
                    continue
                blob = write_warc_bytes(recs, per_record_gzip=per_record_gzip)
                if fh is None:
                    fh = open(tmp, "wb")
                fh.write(blob)
                n += len(recs)
                nbytes += len(blob)
            if fh is not None:
                fh.close()
                fh = None
                os.replace(tmp, final)
                yield pd.DataFrame(
                    [(final, n, skipped, nbytes)],
                    columns=["file", "records", "skipped", "bytes"],
                )
            elif skipped:
                yield pd.DataFrame(
                    [(None, 0, skipped, 0)],
                    columns=["file", "records", "skipped", "bytes"],
                )
        finally:
            if fh is not None:
                fh.close()
            if os.path.exists(tmp):
                os.remove(tmp)

    manifest = slim.mapInPandas(
        _write, schema="file string, records long, skipped long, bytes long"
    ).collect()  # bounded: <= one row per partition
    rows = [r.asDict() for r in manifest]
    # shared commit tail (sources/shards.py): loud driver-visibility check
    # (tasks wrote with plain open(), so without a shared mount the parts
    # landed on executor-local disks), then manifest.json + _SUCCESS
    from final_ocr_spark.sources.shards import _finish

    return _finish(out_dir, rows, sink_name)


def write_warc(
    pages: DataFrame,
    out_dir: str,
    url_col: str = "url",
    html_col: str = "html",
    ts_col: str = "warc_ts",
) -> list[dict]:
    """Distributed WARC archive export + CDX-style random-access index:
    the pages table as WARC/1.0 ``response`` records (one gzip member per
    record — the Common Crawl convention that makes byte-range access
    possible), plus a ``cdx/`` parquet index
    ``(url, ts, digest, filename, offset, length)`` — the engine's analog
    of the CDXJ index CC publishes next to every crawl.

    One action does everything: the index rows ARE the mapInPandas output
    (written as parquet by Spark's own committer), the part files stream
    out batch-by-batch as a side effect with exact member offsets tracked,
    and gzip members are byte-pinned (mtime=0) so a retried task reproduces
    identical bytes at identical offsets — a half-written ``.tmp`` never
    becomes a part file, and the index only commits if every task finished.
    ``digest`` is ``sha1:<base32>`` over the raw page body (the
    WARC-Payload-Digest convention), also stamped into each record header.

    Null-url/html rows are skipped (counted in the manifest as input minus
    indexed). Round-trips through :func:`read_warc`; single records come
    back via :func:`read_warc_record` (seek + one-member decompress — the
    random-access path the index exists for). Same shared-filesystem
    requirement as write_wet, loudly checked.

    Returns the per-file manifest rows (bounded: one per part file).
    """
    import base64
    import hashlib
    import json
    import os

    from pyspark import TaskContext

    slim = pages.select(
        F.col(url_col).alias("url"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts"),
        F.col(html_col).alias("html"),
    )
    os.makedirs(out_dir, exist_ok=True)
    # skipped accounting rides an accumulator instead of a second full scan
    # of the (possibly expensive) pages lineage; accumulators are
    # at-least-once under task retries, so the count is a monitoring
    # number, never an invariant (the invariant checks below use the
    # committed index + on-disk sizes)
    skipped_acc = pages.sparkSession.sparkContext.accumulator(0)

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        base = f"part-{pid:05d}.warc.gz"
        final = os.path.join(out_dir, base)
        tmp = f"{final}.tmp-{attempt}"
        offset = 0
        fh = None
        try:
            for pdf in batches:
                rows = []
                for url, ts, raw in zip(pdf["url"], pdf["ts"], pdf["html"]):
                    if url is None or raw is None:
                        skipped_acc.add(1)
                        continue
                    body = bytes(raw)
                    date = ts or "1970-01-01T00:00:00Z"
                    digest = "sha1:" + base64.b32encode(
                        hashlib.sha1(body).digest()
                    ).decode("ascii")
                    blob = write_warc_bytes(
                        [{"url": url, "date": date, "body": body,
                          "payload_digest": digest}],
                        per_record_gzip=True,
                    )
                    if fh is None:
                        fh = open(tmp, "wb")
                    fh.write(blob)
                    rows.append((url, date, digest, base, offset, len(blob)))
                    offset += len(blob)
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=["url", "ts", "digest", "filename",
                                 "offset", "length"],
                    )
            if fh is not None:
                fh.close()
                fh = None
                os.replace(tmp, final)
        finally:
            if fh is not None:
                fh.close()
            if os.path.exists(tmp):
                os.remove(tmp)

    index = slim.mapInPandas(
        _write,
        schema=("url string, ts string, digest string, filename string, "
                "offset long, length long"),
    )
    cdx_dir = os.path.join(out_dir, "cdx")
    index.write.mode("overwrite").parquet(cdx_dir)

    # bounded manifest from the committed index: one row per part file
    spark = pages.sparkSession
    manifest = (
        spark.read.parquet(cdx_dir)
        .groupBy("filename")
        .agg(
            F.count(F.lit(1)).alias("records"),
            F.max(F.col("offset") + F.col("length")).alias("bytes"),
        )
        .orderBy("filename")
        .collect()
    )
    rows = [
        {"file": os.path.join(out_dir, m["filename"]),
         "records": m["records"], "bytes": m["bytes"]}
        for m in manifest
    ]
    missing = [m["file"] for m in rows if not os.path.exists(m["file"])]
    if missing:
        raise RuntimeError(
            f"write_warc: {len(missing)} part file(s) not visible from the "
            f"driver (first: {missing[0]}) — out_dir must be a filesystem "
            "shared by driver and executors (local mode, NFS)"
        )
    for m in rows:  # offsets must line up with what actually hit disk
        actual = os.path.getsize(m["file"])
        if actual != m["bytes"]:
            raise RuntimeError(
                f"write_warc: {m['file']} is {actual} bytes but the index "
                f"says {m['bytes']} — offset bookkeeping diverged"
            )
    with open(os.path.join(out_dir, "manifest.json"), "w", encoding="utf-8") as f:
        json.dump({"files": rows, "skipped": skipped_acc.value}, f, indent=1)
    with open(os.path.join(out_dir, "_SUCCESS"), "w", encoding="utf-8"):
        pass
    return rows


def read_warc_record(path: str, offset: int, length: int) -> dict:
    """Random access: read ONE record by its CDX index entry — seek to
    ``offset``, read ``length`` bytes, decompress the single gzip member,
    parse the record. This is the consumer side of write_warc's index:
    cost is one ranged read of one member, never a file scan.

    Returns ``{url, warc_ts, html, digest}`` for response records (html =
    decoded HTTP payload body)."""
    with open(path, "rb") as f:
        f.seek(offset)
        blob = f.read(length)
    rec = next(iter_warc_records(blob))
    return {
        "url": rec.get("warc-target-uri"),
        "warc_ts": rec.get("warc-date"),
        "html": _http_body(rec["payload"]),
        "digest": rec.get("warc-payload-digest"),
    }
