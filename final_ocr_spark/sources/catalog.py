"""Iceberg-emulation catalog (SURVEY §4.3): snapshot-versioned parquet tables.

The north rule's input contract is "an Iceberg table of Common-Crawl-style
pages", but no iceberg-spark-runtime jar is reachable in this sandbox, so the
catalog surface is emulated with the SAME semantics a real catalog provides —
and the same call shape (`catalog.read` ↔ `spark.read.table`,
`catalog.write` ↔ `df.writeTo(...).append()/overwritePartitions()`), so a
real Iceberg catalog drops in by config on a real cluster:

* a TABLE is a directory of immutable parquet data files plus a
  ``_manifest/`` directory of snapshot JSONs;
* every write creates a NEW SNAPSHOT listing exactly the data files visible
  at that version (append = parent files + new files; overwrite = new files
  only) with row/byte stats and lineage (app id, schema, parent id);
* readers resolve a snapshot (HEAD by default, or any id → TIME TRAVEL) and
  scan only its files — writers never disturb concurrent readers because
  data files are immutable and the HEAD pointer flips atomically
  (write-temp + rename);
* old snapshots keep working until explicitly expired (``expire`` drops
  unreferenced files), mirroring Iceberg's snapshot expiry;
* every data-file entry carries per-column min/max/null-count bounds read
  from its parquet footer at commit time, and ``read(where=...)`` prunes
  files those bounds prove irrelevant before Spark ever plans a task —
  Iceberg's manifest-level data skipping (see datafilter.py; pair with
  ``write(cluster_by=[...])`` for tight per-file ranges).

Like Iceberg, a torn write is invisible: data files land first, the snapshot
JSON second, the HEAD flip last — a crash anywhere leaves HEAD on the old
consistent snapshot.
"""

from __future__ import annotations

import fcntl
import json
import os
import pathlib
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from final_ocr_spark.sources import datafilter

MANIFEST_DIR = "_manifest"
HEAD_FILE = "HEAD"

# Safe widening chains (Iceberg's type-promotion rules, the subset the
# parquet vectorized reader upcasts at scan time — verified in this
# environment: an INT32 file column reads as bigint under a pinned read
# schema, FLOAT reads as double, and a column absent from the file reads
# as null). Order = narrowest → widest.
_WIDEN_CHAINS = (
    ["tinyint", "smallint", "int", "bigint"],
    ["float", "double"],
)


# commits at or under this many new files read footers in a plain driver
# loop (a Spark job costs more than it saves there); above it the reads
# fan out over the executors
_DRIVER_STATS_MAX_FILES = 8


def _distributed_file_stats(spark: SparkSession,
                            paths: list[str]) -> dict[str, dict]:
    """{file name: collect_file_stats result} computed EXECUTOR-side: one
    small Spark job over the new-file list (mapInPandas, one stats row per
    file), collecting only O(#files) slim metadata rows. A file whose
    footer read fails is omitted — stats are advisory, same contract as
    the driver loop."""
    import pandas as pd

    files = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).repartition(min(len(paths), 64))

    def one(batches):
        for pdf in batches:
            out = []
            for p in pdf["path"]:
                try:
                    out.append((p, json.dumps(
                        datafilter.collect_file_stats(p))))
                except Exception:
                    out.append((p, None))
            yield pd.DataFrame(out, columns=["path", "st"])

    got = files.mapInPandas(one, "path string, st string").collect()
    return {
        pathlib.Path(r["path"]).name: json.loads(r["st"])
        for r in got if r["st"] is not None
    }


def _new_file_entries(data_dir: pathlib.Path, data_rel: str,
                      written: DataFrame) -> list[dict]:
    """Manifest entries for freshly landed data files: path, size, row
    count, and per-column min/max/null bounds read from each parquet
    FOOTER (datafilter.collect_file_stats).

    Small commits read footers in a driver loop (same order as the
    st_size probe beside it); commits above ``_DRIVER_STATS_MAX_FILES``
    files fan the reads out as ONE Spark job (:func:`_distributed_file_
    stats`) — a 10^5-file backfill commit must not serialize minutes of
    driver-side footer opens. A real Iceberg writer receives these bounds
    from the file writer callback instead of re-opening footers at all;
    the executor-side read is the drop-in equivalent (the data directory
    is shared storage on a real cluster, exactly as the scan itself
    assumes)."""
    names = [pathlib.Path(p).name for p in sorted(written.inputFiles())]
    if len(names) <= _DRIVER_STATS_MAX_FILES:
        stats: dict[str, dict] = {}
        for n in names:
            try:
                stats[n] = datafilter.collect_file_stats(str(data_dir / n))
            except Exception:
                pass  # advisory: a footer oddity must never fail a commit
    else:
        try:
            stats = _distributed_file_stats(
                written.sparkSession, [str(data_dir / n) for n in names]
            )
        except Exception:
            # the per-file try inside the job covers footer oddities, but a
            # JOB-level failure (executor loss, retries exhausted, transient
            # FS error on collect) must also honor the advisory contract:
            # commit with stats-less entries (skipping just doesn't prune),
            # never abort a commit whose data files already landed
            # (review-caught)
            stats = {}
    entries = []
    for n in names:
        entry = {"path": f"{data_rel}/{n}",
                 "bytes": (data_dir / n).stat().st_size}
        entry.update(stats.get(n, {}))
        entries.append(entry)
    return entries


def _schema_of(schema_str: str) -> StructType:
    """Parse a snapshot's pinned schema (stored as ``simpleString`` —
    round-trips through ``StructType.fromDDL`` including nested
    array/map/struct types)."""
    return StructType.fromDDL(schema_str)


def _widen_two(a: str, b: str) -> str | None:
    """The wider of two simple type strings along a safe promotion chain,
    or None if they're incomparable. Nested types must match exactly —
    recursive promotion inside array/struct is NOT supported (the parquet
    reader only upcasts top-level primitive columns)."""
    if a == b:
        return a
    for chain in _WIDEN_CHAINS:
        if a in chain and b in chain:
            return chain[max(chain.index(a), chain.index(b))]
    return None


def _merge_schemas(base: StructType, incoming: StructType,
                   context: str) -> StructType:
    """Evolve ``base`` by ``incoming``: columns in both must match or widen
    along a safe chain (the result takes the wider type); columns only in
    ``incoming`` append at the end (back-filled as null in files that
    predate them); columns only in ``base`` are kept. Raises ``ValueError``
    on an incompatible type change (e.g. string → int) — evolution never
    rewrites data files, so anything the scan-time upcast can't express is
    refused loudly."""
    by_name = {f.name: f for f in incoming.fields}
    out = []
    for f in base.fields:
        g = by_name.pop(f.name, None)
        if g is None:
            out.append(f)
            continue
        a, b = f.dataType.simpleString(), g.dataType.simpleString()
        wide = _widen_two(a, b)
        if wide is None:
            raise ValueError(
                f"{context}: incompatible type change for column "
                f"{f.name!r}: table has {a}, incoming has {b} — only "
                "add-column and safe widening "
                f"({' / '.join('→'.join(c) for c in _WIDEN_CHAINS)}) evolve"
            )
        out.append(f if wide == a else g)
    out.extend(by_name[f.name] for f in incoming.fields if f.name in by_name)
    return StructType(out)


class CommitConflictError(RuntimeError):
    """A concurrent commit invalidated this commit's inputs (e.g. two
    copy-on-write rewrites touched the same data file). The operation must be
    re-planned from the new table state — same contract as an Iceberg
    ValidationException on commit."""


class SnapshotCatalog:
    """Filesystem-backed snapshot catalog of parquet tables."""

    def __init__(self, root: str) -> None:
        self.root = pathlib.Path(root)

    # -- paths ------------------------------------------------------------
    def table_dir(self, name: str) -> pathlib.Path:
        # empty/whitespace names would alias the catalog ROOT itself
        # (root/'' == root), interleaving a phantom table's _manifest and
        # data dirs with the real tables' directories (review-caught)
        if not name.strip() or "/" in name or name.startswith("."):
            raise ValueError(f"bad table name: {name!r}")
        return self.root / name

    def _manifest_dir(self, name: str) -> pathlib.Path:
        return self.table_dir(name) / MANIFEST_DIR

    # -- metadata ---------------------------------------------------------
    def tables(self) -> list[str]:
        if not self.root.exists():
            return []
        return sorted(
            p.name for p in self.root.iterdir() if (p / MANIFEST_DIR).is_dir()
        )

    def snapshots(self, name: str) -> list[dict]:
        md = self._manifest_dir(name)
        if not md.exists():
            return []
        out = []
        for p in sorted(md.glob("snap-*.json")):
            try:
                out.append(json.loads(p.read_text(encoding="utf-8")))
            except json.JSONDecodeError:
                continue  # torn snapshot from a crash — never referenced by HEAD
        return sorted(out, key=lambda s: s["snapshot_id"])

    def current_snapshot(self, name: str) -> dict | None:
        head = self._manifest_dir(name) / HEAD_FILE
        if not head.exists():
            return None
        sid = int(head.read_text(encoding="utf-8").strip())
        # load the ONE snap file HEAD names — scanning snapshots() here made
        # every read (and every commit-CAS retry via callers) re-parse every
        # manifest in the directory, O(#snapshots × manifest size) for a
        # single lookup (review-caught). HEAD only flips to a fully-written,
        # fsync'd snap file, so a torn parse here is a real protocol breach
        # and raises like a missing one.
        p = self._manifest_dir(name) / f"snap-{sid:08d}.json"
        try:
            return json.loads(p.read_text(encoding="utf-8"))
        except FileNotFoundError:
            raise RuntimeError(
                f"HEAD={sid} of table {name!r} has no snapshot file"
            ) from None
        except json.JSONDecodeError:
            raise RuntimeError(
                f"HEAD={sid} of table {name!r} points at a torn snapshot file"
            ) from None

    # -- read -------------------------------------------------------------
    def read(self, spark: SparkSession, name: str,
             snapshot_id: int | None = None,
             where: str | None = None) -> DataFrame:
        """``spark.read.table`` analog; ``snapshot_id`` = time travel.

        ``where`` is a SQL predicate applied to the result — and, first,
        used to SKIP whole data files whose manifest min/max/null bounds
        prove no row can match (Iceberg's manifest pruning; see
        datafilter.py). Pruning is advisory: the same predicate always runs
        as a ``filter`` afterwards, so results are identical to a full
        scan + filter, only cheaper — on a clustered table the scan opens
        ~selectivity × files instead of all of them."""
        snap = self._resolve_snapshot(name, snapshot_id)
        return self._read_snapshot(spark, name, snap, where)

    def _read_snapshot(self, spark: SparkSession, name: str, snap: dict,
                       where: str | None = None) -> DataFrame:
        """Read directly from an in-hand snapshot dict — callers that already
        resolved the snapshot (e.g. ``_cow_rewrite``'s pinned probe) must not
        pay ``_resolve_snapshot``'s O(#snapshots × manifest size) directory
        re-parse for a lookup they have already done (review-caught)."""
        entries = snap["files"]
        if where is not None:
            entries = self._prune(spark, snap, where)
        files = [str(self.table_dir(name) / f["path"]) for f in entries]
        if not files:
            df = spark.createDataFrame([], snap["schema"])
        else:
            # pin the snapshot's schema: files written before a column was
            # added read it as null, and files written before a widen upcast
            # at scan (both handled by the parquet vectorized reader) — old
            # snapshots keep reading under the schema they were committed with
            df = spark.read.schema(_schema_of(snap["schema"])).parquet(*files)
        return df if where is None else df.filter(where)

    def _resolve_snapshot(self, name: str, snapshot_id: int | None) -> dict:
        if snapshot_id is None:
            snap = self.current_snapshot(name)
            if snap is None:
                raise FileNotFoundError(f"no such table: {name!r}")
            return snap
        by_id = {s["snapshot_id"]: s for s in self.snapshots(name)}
        if snapshot_id not in by_id:
            raise FileNotFoundError(f"table {name!r} has no snapshot {snapshot_id}")
        return by_id[snapshot_id]

    def _prune(self, spark: SparkSession, snap: dict, where: str) -> list[dict]:
        conjuncts = datafilter.parse_conjuncts(where)
        if not conjuncts:
            return snap["files"]
        families = datafilter.schema_families(_schema_of(snap["schema"]))
        ts_utc = spark.conf.get("spark.sql.session.timeZone", "") in (
            "UTC", "Etc/UTC", "GMT", "Z", "+00:00")
        return [f for f in snap["files"]
                if datafilter.file_may_match(f, conjuncts, families, ts_utc)]

    def plan_files(self, spark: SparkSession, name: str,
                   where: str | None = None,
                   snapshot_id: int | None = None) -> dict:
        """Scan-planning report (observability + tests): how many of the
        snapshot's files a ``read(where=...)`` would open."""
        snap = self._resolve_snapshot(name, snapshot_id)
        kept = snap["files"] if where is None else self._prune(spark, snap, where)
        return {
            "snapshot_id": snap["snapshot_id"],
            "files_total": len(snap["files"]),
            "files_scanned": len(kept),
            "files_skipped": len(snap["files"]) - len(kept),
            "bytes_scanned": sum(f["bytes"] for f in kept),
        }

    # -- write ------------------------------------------------------------
    def write(self, df: DataFrame, name: str, mode: str = "append",
              cluster_by: list[str] | None = None,
              cluster_files: int | None = None) -> dict:
        """``df.writeTo(name).append()/overwrite()`` analog. Returns the new
        snapshot dict. Data files are immutable; a new snapshot + atomic HEAD
        flip publishes them.

        ``cluster_by`` range-partitions + sorts the batch on the given
        columns before writing (Iceberg's write-ordered/sorted table
        analog) so each data file covers a NARROW value range — that
        tightness is what makes the manifest min/max bounds selective and
        ``read(where=...)`` able to skip files. One extra shuffle at write
        time buys every future selective scan. ``cluster_files`` pins the
        output file count (else ``spark.sql.shuffle.partitions``/AQE decide
        — at real scale AQE's coalescing to the target partition size is
        exactly right; pin it only when you need a specific layout)."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        if cluster_by:
            args = ([cluster_files] if cluster_files else []) + list(cluster_by)
            df = df.repartitionByRange(*args).sortWithinPartitions(*cluster_by)
        cluster_by = list(cluster_by) if cluster_by else None
        tdir = self.table_dir(name)
        md = self._manifest_dir(name)
        md.mkdir(parents=True, exist_ok=True)

        # 1. land immutable data files in a fresh uuid directory
        data_rel = f"data/{uuid.uuid4().hex}"
        data_dir = tdir / data_rel
        df.write.mode("overwrite").parquet(str(data_dir))
        spark = df.sparkSession
        written = spark.read.parquet(str(data_dir))
        new_files = _new_file_entries(data_dir, data_rel, written)
        row_count = written.count()  # parquet-footer-only

        # 2. commit: the snapshot is BUILT inside the CAS loop so a racing
        # append re-derives base_files from the actual winner instead of the
        # parent it first read (fsync ordering unchanged: snap file + dir
        # entry land before the HEAD flip)
        def _build(parent: dict | None, sid: int) -> dict:
            if parent and mode == "append":
                base_files = parent["files"]
                # schema evolution on append: new columns join the table
                # schema (older files read them as null), matching columns
                # may widen; incompatible changes raise before any commit.
                # A df MISSING table columns is fine too — its files read
                # those columns as null (optional-column append).
                schema = _merge_schemas(
                    _schema_of(parent["schema"]), df.schema,
                    f"append to {name!r}",
                ).simpleString()
            else:
                base_files = []
                schema = df.schema.simpleString()
            # declared table sort order (Iceberg write-order analog): a
            # clustered write sets it; an unclustered append inherits the
            # declaration (its own files are simply unsorted — per-file
            # stats stay ground truth); overwrite without cluster_by clears
            if cluster_by:
                sort_order = cluster_by
            elif parent and mode == "append":
                sort_order = parent.get("sort_order")
            else:
                sort_order = None
            return {
                "snapshot_id": sid,
                "parent_id": parent["snapshot_id"] if parent else None,
                "operation": mode,
                "committed_at_epoch": time.time(),
                "app_id": spark.sparkContext.applicationId,
                "schema": schema,
                "row_count_added": row_count,
                "sort_order": sort_order,
                "files": base_files + new_files,
            }

        return self._commit_snapshot(name, _build)

    # -- maintenance --------------------------------------------------------
    def compact(
        self,
        spark: SparkSession,
        name: str,
        *,
        target_file_bytes: int = 128 * 1024 * 1024,
        small_file_bytes: int | None = None,
        min_input_files: int = 2,
    ) -> dict:
        """Iceberg ``rewrite_data_files`` (bin-pack) analog: rewrite the
        table's SMALL data files into ~``target_file_bytes`` files and
        publish the result as a new snapshot. The streaming/incremental
        ingest paths append a few files per micro-batch; at 10^12-document
        scale that debris is the classic scan killer (every file is a task +
        a footer read + an open), and compaction is the standard maintenance
        job that keeps scans planning O(data) instead of O(commits).

        Mechanics mirror a real Iceberg rewrite: data files are immutable, so
        compaction READS the small files, writes new consolidated files, and
        commits a snapshot whose file list = untouched large files + new
        files. Readers pinned to older snapshots are undisturbed (time travel
        keeps working); the superseded small files are reclaimed later by
        :meth:`expire`, exactly like Iceberg's expire_snapshots.

        Files ≥ ``small_file_bytes`` (default ``target_file_bytes // 2``) are
        left alone — rewriting an already-right-sized file is pure write
        amplification. Fewer than ``min_input_files`` small files → no-op
        (no new snapshot). Row-count equality between the small files and
        their rewrite is checked BEFORE the HEAD flip; a mismatch raises and
        leaves the table on the old snapshot.

        Returns ``{"compacted": bool, "files_before", "files_after",
        "rewritten_files", "rewritten_bytes", "snapshot_id"}``.
        """
        snap = self.current_snapshot(name)
        if snap is None:
            raise FileNotFoundError(f"no such table: {name!r}")
        if small_file_bytes is None:
            small_file_bytes = target_file_bytes // 2
        tdir = self.table_dir(name)
        small = [f for f in snap["files"] if f["bytes"] < small_file_bytes]
        big = [f for f in snap["files"] if f["bytes"] >= small_file_bytes]
        stats = {
            "compacted": False,
            "files_before": len(snap["files"]),
            "files_after": len(snap["files"]),
            "rewritten_files": len(small),
            "rewritten_bytes": sum(f["bytes"] for f in small),
            "snapshot_id": snap["snapshot_id"],
        }
        if len(small) < min_input_files:
            return stats

        # bin-pack approximation: one consolidated write sized so each output
        # file lands near target_file_bytes (parquet re-encoding changes the
        # exact size; the bound that matters is file COUNT ≈ bytes/target)
        n_out = max(1, -(-stats["rewritten_bytes"] // target_file_bytes))
        # pinned schema: small files may predate a schema evolution — the
        # consolidated rewrite materializes the current schema (nulls for
        # columns the inputs lack)
        src = spark.read.schema(_schema_of(snap["schema"])).parquet(
            *[str(tdir / f["path"]) for f in small]
        )
        data_rel = f"data/{uuid.uuid4().hex}"
        data_dir = tdir / data_rel
        # honour the table's declared sort order: a plain repartition would
        # interleave every value range across the rewritten files, silently
        # widening their min/max bounds and defeating read(where=...) data
        # skipping right after the maintenance job that was supposed to
        # IMPROVE scans (Iceberg's rewrite keeps sort order the same way)
        order = snap.get("sort_order")
        packed = (
            src.repartitionByRange(n_out, *order).sortWithinPartitions(*order)
            if order else src.repartition(n_out)
        )
        packed.write.mode("overwrite").parquet(str(data_dir))

        written = spark.read.parquet(str(data_dir))
        new_files = _new_file_entries(data_dir, data_rel, written)
        # safety gate before publishing: the rewrite must carry every row
        # (parquet-footer counts — no data scan)
        n_src, n_out_rows = src.count(), written.count()
        if n_src != n_out_rows:
            raise RuntimeError(
                f"compaction row-count mismatch for {name!r}: "
                f"{n_src} in small files, {n_out_rows} rewritten — "
                "table left on snapshot "
                f"{snap['snapshot_id']}"
            )

        small_paths = {f["path"] for f in small}

        def _build(parent: dict | None, sid: int) -> dict:
            # rebuild against the ACTUAL parent: files appended by a racing
            # commit survive; but if a racing rewrite removed one of our
            # small inputs, publishing the rewrite would resurrect its rows
            pfiles = parent["files"] if parent else []
            present = {f["path"] for f in pfiles}
            if not small_paths <= present:
                raise CommitConflictError(
                    f"compaction of {name!r} conflicts with a concurrent "
                    "rewrite of its input files — re-plan from the new "
                    "snapshot"
                )
            return {
                "snapshot_id": sid,
                "parent_id": parent["snapshot_id"] if parent else None,
                "operation": "compact",
                "committed_at_epoch": time.time(),
                "app_id": spark.sparkContext.applicationId,
                "schema": parent["schema"] if parent else snap["schema"],
                "row_count_added": 0,
                "sort_order": (parent or snap).get("sort_order"),
                "files": [f for f in pfiles if f["path"] not in small_paths]
                + new_files,
            }

        committed = self._commit_snapshot(name, _build)
        stats.update(
            compacted=True,
            files_after=len(committed["files"]),
            snapshot_id=committed["snapshot_id"],
        )
        return stats

    # -- row-level changes (copy-on-write) ---------------------------------
    def _cow_rewrite(
        self,
        spark: SparkSession,
        name: str,
        match_keys: DataFrame,
        keys: list[str],
        replacement: DataFrame | None,
        operation: str,
    ) -> dict:
        """Shared copy-on-write core for merge/delete: find the data files
        that contain any matched key (``input_file_name`` over a keys-only
        projection — the full rows never move for this probe), rewrite ONLY
        those files (their non-matched rows + the replacement rows), and
        commit a snapshot of untouched-files + new-files. Rewrite cost is
        proportional to files containing matches, never to table size —
        the Iceberg copy-on-write contract."""
        snap = self.current_snapshot(name)
        if snap is None:
            raise FileNotFoundError(f"no such table: {name!r}")
        tdir = self.table_dir(name)
        # PIN the probe to the snapshot captured above: an unpinned read
        # re-resolves HEAD, so a commit landing between the two calls made
        # the probe return files absent from snap['files'] and the rel-path
        # check below raised a misleading 'invariant broken' RuntimeError
        # for what is an ordinary, retryable commit race (review-caught;
        # genuine races still surface as CommitConflictError in _build)
        existing = self._read_snapshot(spark, name, snap)

        # probe: which files hold a matched key? Slim (keys + filename)
        # projection; result is bounded by the snapshot's file COUNT.
        tagged = existing.select(*keys).withColumn(
            "_file", F.input_file_name()
        )
        touched_abs = [
            r["_file"]
            for r in tagged.join(match_keys, keys, "left_semi")
            .select("_file").distinct().collect()
        ]
        # input_file_name gives a URI; snapshot paths are
        # 'data/<uuid>/<basename>' — map by the last three components
        by_rel = {f["path"]: f for f in snap["files"]}
        touched_rel = []
        for uri in touched_abs:
            rel = "/".join(uri.split("/")[-3:])
            if rel not in by_rel:
                raise RuntimeError(
                    f"merge probe returned unknown file {uri!r} for table "
                    f"{name!r} — snapshot/file-layout invariant broken"
                )
            touched_rel.append(rel)

        new_files: list[dict] = []
        rows_added = 0
        if touched_rel or replacement is not None:
            parts = []
            if touched_rel:
                # pin the CURRENT snapshot schema: touched files may predate
                # an earlier evolution and lack columns the table now has
                touched_df = spark.read.schema(
                    _schema_of(snap["schema"])
                ).parquet(*[str(tdir / r) for r in touched_rel])
                parts.append(touched_df.join(match_keys, keys, "left_anti"))
            if replacement is not None:
                parts.append(replacement)
            if parts:
                out = parts[0]
                for p in parts[1:]:
                    # allowMissingColumns: a replacement carrying a NEW
                    # column null-fills it on the kept rows (and union's
                    # type coercion widens int/bigint etc. consistently
                    # with _merge_schemas)
                    out = out.unionByName(p, allowMissingColumns=True)
                data_rel = f"data/{uuid.uuid4().hex}"
                data_dir = tdir / data_rel
                out.write.mode("overwrite").parquet(str(data_dir))
                written = spark.read.parquet(str(data_dir))
                new_files = _new_file_entries(data_dir, data_rel, written)
                rows_added = written.count()

        touched_set = set(touched_rel)
        planned_paths = {f["path"] for f in snap["files"]}

        def _build(parent: dict | None, sid: int) -> dict:
            # rebuild against the ACTUAL parent: a racing append's files
            # survive; a racing rewrite of one of OUR touched files is a
            # genuine write-write conflict (publishing would resurrect rows
            # it deleted / drop rows it kept) — surface it, like Iceberg
            pfiles = parent["files"] if parent else []
            present = {f["path"] for f in pfiles}
            if not touched_set <= present:
                raise CommitConflictError(
                    f"{operation} on {name!r} conflicts with a concurrent "
                    "rewrite of an overlapping data file — re-plan from the "
                    "new snapshot"
                )
            # serializable-isolation validation (Iceberg's
            # validateNoConflictingData for CoW MERGE/DELETE): a file ADDED
            # since the snapshot this rewrite was planned from may contain a
            # matched key that the rewrite never saw — publishing would
            # leave two rows per key after a merge that promises whole-row
            # replacement (or resurrect a deleted key). Probe is keys-only
            # over ONLY the added files, so the happy no-race path costs
            # nothing (review-caught, test-pinned).
            added_since = [
                f["path"] for f in pfiles if f["path"] not in planned_paths
            ]
            if added_since:
                probe = spark.read.schema(
                    _schema_of(parent["schema"])
                ).parquet(*[str(tdir / r) for r in added_since]).select(*keys)
                if not probe.join(match_keys, keys, "left_semi").isEmpty():
                    raise CommitConflictError(
                        f"{operation} on {name!r} conflicts with a "
                        "concurrent append containing a matched key — "
                        "re-plan from the new snapshot"
                    )
            # schema evolution rides the merge: the committed schema is the
            # ACTUAL parent's schema evolved by the replacement's (delete
            # carries no replacement → schema unchanged); rebuilt per CAS
            # retry so a racing evolution's columns survive
            schema = parent["schema"] if parent else snap["schema"]
            if replacement is not None:
                schema = _merge_schemas(
                    _schema_of(schema), replacement.schema,
                    f"{operation} into {name!r}",
                ).simpleString()
            return {
                "snapshot_id": sid,
                "parent_id": parent["snapshot_id"] if parent else None,
                "operation": operation,
                "committed_at_epoch": time.time(),
                "app_id": spark.sparkContext.applicationId,
                "schema": schema,
                "row_count_added": rows_added,
                "sort_order": (parent or snap).get("sort_order"),
                "files": [f for f in pfiles if f["path"] not in touched_set]
                + new_files,
            }

        committed = self._commit_snapshot(name, _build)
        return {
            "snapshot_id": committed["snapshot_id"],
            "files_rewritten": len(touched_rel),
            "files_added": len(new_files),
            "rows_written": rows_added,
        }

    def merge(
        self,
        spark: SparkSession,
        updates: DataFrame,
        name: str,
        key: str | list[str] = "url",
    ) -> dict:
        """``MERGE INTO`` (upsert) analog, copy-on-write: rows in
        ``updates`` REPLACE existing rows with the same key (whole-row
        replace — the recrawl semantics: same url, fresher warc_ts/html);
        keys not present insert. Only data files containing a matched key
        are rewritten; snapshot isolation, time travel, and expiry behave
        exactly as for write/compact (readers pinned to the parent snapshot
        still see the pre-merge rows).

        ``updates`` must be key-unique (checked loudly — a duplicate-key
        update batch has no well-defined winner) and carry AT LEAST the
        table's column set (whole-row replace can't leave a column
        undefined). EXTRA columns evolve the schema (Iceberg-style
        add-column: rows in files that predate the column read it as
        null), and matching columns may safely widen (int→bigint,
        float→double); an incompatible type change refuses loudly before
        any data file is written."""
        keys = [key] if isinstance(key, str) else list(key)
        snap = self.current_snapshot(name)
        if snap is None:
            raise FileNotFoundError(f"no such table: {name!r}")
        table_schema = _schema_of(snap["schema"])
        missing = set(table_schema.names) - set(updates.columns)
        if missing:
            raise ValueError(
                f"merge into {name!r} is a whole-row replace and updates "
                f"are missing table columns {sorted(missing)} — select "
                "them (null is fine) explicitly"
            )
        # validate evolution compatibility NOW, before the expensive
        # copy-on-write work (the committed schema is re-derived against
        # the actual parent inside the commit CAS)
        _merge_schemas(table_schema, updates.schema, f"merge into {name!r}")
        if (
            updates.groupBy(*keys).count()
            .filter(F.col("count") > 1).limit(1).count()
        ):
            raise ValueError(
                "updates contain duplicate keys — dedup (e.g. latest-wins) "
                "before merge; a duplicate-key batch has no defined winner"
            )
        return self._cow_rewrite(
            spark, name, updates.select(*keys).distinct(), keys,
            updates, "merge",
        )

    def delete(
        self,
        spark: SparkSession,
        delete_keys: DataFrame,
        name: str,
        key: str | list[str] = "url",
    ) -> dict:
        """Row-level DELETE by key, copy-on-write (e.g. takedown/robots
        retro-compliance lists): files containing a matched key are
        rewritten without those rows; everything else is untouched."""
        keys = [key] if isinstance(key, str) else list(key)
        return self._cow_rewrite(
            spark, name, delete_keys.select(*keys).distinct(), keys,
            None, "delete",
        )

    def diff(
        self,
        spark: SparkSession,
        name: str,
        from_snapshot: int | None = None,
        to_snapshot: int | None = None,
        key: str = "url",
        compare_cols: list[str] | None = None,
    ) -> DataFrame:
        """(key, change) rows between two snapshots of a table — the
        incremental-consumer primitive (what changed since the version I
        last processed?): change ∈ 'added' | 'removed' | 'modified'.
        Unchanged keys are ABSENT, so the result is change-proportional,
        never corpus-proportional.

        Defaults: ``to_snapshot`` = HEAD, ``from_snapshot`` = the snapshot
        before ``to_snapshot`` (diff of the latest write). ``compare_cols``
        defaults to every non-key column present in BOTH snapshots (a
        column added by schema evolution doesn't mark every row modified).

        Scale shape: each side reduces to ONE slim (key, n, xor) row per
        key before anything joins — per-row identity is ``xxhash64`` over
        the compare columns, aggregated per key as (count, bit_xor): an
        order-insensitive multiset fingerprint (bit ops + count, ANSI-safe;
        identical-duplicate-pair cancellation is disambiguated by the
        count). The full-outer join then carries ~24 bytes per key, and
        row payloads never shuffle. 64-bit collisions can mask a modified
        row (~2^-64 per key) — the same accepted tradeoff as dedup_exact.
        """
        snaps = self.snapshots(name)
        if not snaps:
            raise FileNotFoundError(f"no such table: {name!r}")
        ids = [s["snapshot_id"] for s in snaps]
        if to_snapshot is None:
            to_snapshot = ids[-1]
        if from_snapshot is None:
            older = [i for i in ids if i < to_snapshot]
            if not older:
                raise ValueError(
                    f"table {name!r} has no snapshot before {to_snapshot} to diff against"
                )
            from_snapshot = older[-1]
        a = self.read(spark, name, snapshot_id=from_snapshot)
        b = self.read(spark, name, snapshot_id=to_snapshot)
        if compare_cols is None:
            compare_cols = [
                c for c in a.columns if c != key and c in set(b.columns)
            ]
        # a column WIDENED between the snapshots (int→bigint etc.) hashes
        # differently per type even for equal values — cast both sides to
        # the wider type (string if incomparable) so only real value
        # changes surface
        a_types, b_types = dict(a.dtypes), dict(b.dtypes)
        casts = {}
        for c in compare_cols:
            if a_types[c] != b_types[c]:
                casts[c] = _widen_two(a_types[c], b_types[c]) or "string"

        def _fp(df: DataFrame, side: str) -> DataFrame:
            h = F.xxhash64(*[
                F.col(c).cast(casts[c]) if c in casts else F.col(c)
                for c in compare_cols
            ])
            return df.groupBy(F.col(key).alias("_k")).agg(
                F.count(F.lit(1)).alias(f"_n_{side}"),
                F.bit_xor(h).alias(f"_x_{side}"),
            )

        # NULL-SAFE key join: a plain equi-join never matches NULL to NULL,
        # so an unchanged null-key group produced a spurious removed+added
        # pair and incremental consumers reprocessed rows that never changed
        # (review-caught). eqNullSafe pairs the null groups like Iceberg's
        # identity-partition comparison does.
        fa = _fp(a, "a")
        fb = _fp(b, "b").withColumnRenamed("_k", "_kb")
        j = fa.join(fb, fa["_k"].eqNullSafe(fb["_kb"]), "full_outer")
        change = (
            F.when(F.col("_n_a").isNull(), F.lit("added"))
            .when(F.col("_n_b").isNull(), F.lit("removed"))
            .when(
                (F.col("_n_a") != F.col("_n_b"))
                | (F.col("_x_a") != F.col("_x_b")),
                F.lit("modified"),
            )
        )
        return (
            j.withColumn("change", change)
            .filter(F.col("change").isNotNull())
            .select(
                F.when(F.col("_n_a").isNull(), F.col("_kb"))
                .otherwise(F.col("_k"))
                .alias(key),
                "change",
            )
        )

    def _latest_committed(self, name: str) -> dict | None:
        """The committed snapshot with the highest id, resolved from the
        snapshot FILES (not HEAD): a winner's snap file is durably on disk
        before its HEAD flip, so the file chain — not the pointer — is the
        source of truth a concurrent committer must build on.

        Walks the names in NUMERIC id order descending (the zero-pad covers
        8 digits; past snapshot 10^8 lexicographic order would pick the
        wrong parent and wedge every commit on EEXIST) and parses only until
        the first valid JSON (a torn legacy file is skipped) — parsing every
        manifest on every CAS retry was O(#snapshots × manifest size)
        per commit attempt (review-caught)."""
        md = self._manifest_dir(name)
        if not md.exists():
            return None

        def _sid(p: pathlib.Path) -> int:
            try:
                return int(p.stem[len("snap-"):])
            except ValueError:
                return -1  # foreign file in the manifest dir — try it last

        for p in sorted(md.glob("snap-*.json"), key=_sid, reverse=True):
            try:
                return json.loads(p.read_text(encoding="utf-8"))
            except json.JSONDecodeError:
                continue  # torn snapshot from a crash — never HEAD-referenced
        return None

    def _commit_snapshot(self, name: str, build_snap, max_retries: int = 64) -> dict:
        """Optimistic-concurrency commit (Iceberg's commit protocol, on a
        filesystem): ``build_snap(parent, sid)`` constructs the snapshot dict
        against the CURRENT latest committed parent, and atomically linking a
        fully-written temp file into ``snap-<sid>.json`` (link(2) EEXIST — a
        filesystem compare-and-swap on the snapshot id) is the commit point;
        a visible snap file is therefore always complete JSON. Losing the CAS re-derives the
        parent and REBUILDS the snapshot, so a racing append never erases the
        winner's files (retrying with a stale file list would be a second,
        subtler lost update). Builders that can't rebuild against the new
        parent (overlapping copy-on-write rewrites) raise
        ``CommitConflictError`` — the same conflict a real Iceberg commit
        surfaces.

        Durability ordering is unchanged: fsync the snap file + its directory
        entry BEFORE the HEAD flip. The flip itself is forward-only under an
        flock (auto-released on process death — no stale-lock hazard), so a
        slow committer can never regress HEAD below a newer snapshot."""
        md = self._manifest_dir(name)
        sid_floor = 0
        for _ in range(max_retries):
            parent = self._latest_committed(name)
            # sid_floor also covers legacy torn snap files (pre-link builds
            # wrote the committed name directly; a crashed writer's partial
            # JSON occupies the name forever but never parses, so
            # snapshots() can't see it and parent.sid+1 would loop)
            sid = max((parent["snapshot_id"] + 1) if parent else 1, sid_floor)
            snap = build_snap(parent, sid)
            snap_path = md / f"snap-{sid:08d}.json"
            # write the FULL json to a private temp name first, fsync it,
            # then hard-link it into the committed name: link(2) is the
            # atomic CAS (EEXIST on loss), and — unlike creating the
            # committed name directly — the snap file is never observable
            # half-written. A concurrent committer that raced the old
            # direct-write path could read an in-progress (empty) snap-N,
            # skip it as torn, take snap-(N-1) as parent, and publish a
            # snap-(N+1) WITHOUT the winner's files — a silent lost update
            # in the very protocol meant to prevent them (review-caught,
            # test-pinned).
            tmp = md / f".snap-inflight-{uuid.uuid4().hex}.json"
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(json.dumps(snap, sort_keys=True))
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, snap_path)
            except FileExistsError:
                sid_floor = sid + 1
                continue
            finally:
                tmp.unlink(missing_ok=True)
            dfd = os.open(md, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
            self._flip_head_forward(name, sid)
            return snap
        raise RuntimeError(
            f"commit to table {name!r} lost the snapshot CAS {max_retries} "
            "times — pathological commit contention"
        )

    def _flip_head_forward(self, name: str, sid: int) -> None:
        """Atomically advance HEAD to ``sid`` unless it already points at a
        newer snapshot (a committer that lost a long race must not move HEAD
        backwards past the winner). The read-compare-replace runs under an
        ``flock`` so two flips can't interleave; flock is released by the
        kernel if the holder dies, so there is no crash-stale lock."""
        md = self._manifest_dir(name)
        lfd = os.open(md / f".{HEAD_FILE}.lock", os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(lfd, fcntl.LOCK_EX)
            head = md / HEAD_FILE
            cur = 0
            if head.exists():
                cur = int(head.read_text(encoding="utf-8").strip() or 0)
            if sid <= cur:
                return
            tmp = md / f".{HEAD_FILE}.{uuid.uuid4().hex}"
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(str(sid))
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, head)
        finally:
            os.close(lfd)

    def expire(
        self,
        name: str,
        keep_last: int = 1,
        *,
        inflight_grace_seconds: float = 3600.0,
    ) -> int:
        """Iceberg-style snapshot expiry: drop all but the last ``keep_last``
        snapshots and delete data files no surviving snapshot references.
        Returns the number of data files deleted. Also sweeps orphaned
        ``.snap-inflight-*`` commit temps (a committer killed between the
        fsync'd temp write and the link leaves one behind; they are
        invisible to readers but would otherwise accumulate forever) —
        but ONLY ones older than ``inflight_grace_seconds``: commits are
        explicitly concurrent-safe, and unlinking a LIVE committer's temp
        between its fsync and its link would crash that commit mid-protocol
        with FileNotFoundError (review-caught; the window is milliseconds,
        so an hour-old temp is a dead committer, Iceberg's own
        orphan-cleanup retention shape).

        Two more retention guards, both review-caught:

        * the snapshot HEAD points at is ALWAYS kept, even when it is not
          among the ``keep_last`` newest: a committer crashed (or merely
          slow) between its snap-file link and its HEAD flip leaves HEAD
          one behind the newest file — the module's documented-tolerated
          window — and expiring by file order alone would delete the
          PUBLISHED snapshot, bricking every read and dropping its rows.
        * ``data/<uuid>`` directories referenced by NO remaining snapshot
          are swept (Iceberg's remove_orphan_files): every abort path the
          commit protocol supports — CommitConflictError, schema-merge
          refusal, compaction row-count mismatch, CAS exhaustion — lands
          data files before it aborts, and under recurring conflicts those
          leak without bound. Only directories older than
          ``inflight_grace_seconds`` are touched: a LIVE writer lands data
          before its commit, and sweeping its fresh directory would corrupt
          the commit it is about to publish.

        Dropping data files still assumes no reader is mid-query on an
        expired snapshot — time-travel readers of dropped snapshots fail
        after expiry, exactly as in Iceberg."""
        import shutil

        now = time.time()
        md = self._manifest_dir(name)
        for tmp in md.glob(".snap-inflight-*.json"):
            try:
                if now - tmp.stat().st_mtime >= inflight_grace_seconds:
                    tmp.unlink(missing_ok=True)
            except FileNotFoundError:
                pass  # the committer finished and removed it — fine
        snaps = self.snapshots(name)
        tdir = self.table_dir(name)
        deleted = 0
        if len(snaps) > keep_last:
            keep_ids = {s["snapshot_id"] for s in snaps[-keep_last:]}
            head = md / HEAD_FILE
            if head.exists():
                keep_ids.add(int(head.read_text(encoding="utf-8").strip() or 0))
            keep = [s for s in snaps if s["snapshot_id"] in keep_ids]
            drop = [s for s in snaps if s["snapshot_id"] not in keep_ids]
            live = {f["path"] for s in keep for f in s["files"]}
            for s in drop:
                for f in s["files"]:
                    if f["path"] not in live:
                        # no exists() pre-check: a concurrent expire may
                        # unlink between the check and the unlink (the same
                        # race the orphan sweep below tolerates)
                        p = tdir / f["path"]
                        try:
                            p.unlink()
                            deleted += 1
                        except FileNotFoundError:
                            pass  # a racing expire got it — fine
                (md / f"snap-{s['snapshot_id']:08d}.json").unlink(
                    missing_ok=True
                )
            snaps = keep
        # orphan sweep: whole data/<uuid> dirs no surviving snapshot names
        referenced = {
            f["path"].split("/", 2)[1]
            for s in snaps
            for f in s["files"]
            if f["path"].startswith("data/")
        }
        data_root = tdir / "data"
        if data_root.is_dir():
            for d in data_root.iterdir():
                if not d.is_dir() or d.name in referenced:
                    continue
                try:
                    if now - d.stat().st_mtime < inflight_grace_seconds:
                        continue  # possibly a live commit's landed files
                    deleted += sum(
                        1 for p in d.rglob("*")
                        if p.is_file() and not p.name.startswith(("_", "."))
                    )
                    shutil.rmtree(d)
                except FileNotFoundError:
                    pass  # a racing expire got it — fine
        return deleted
