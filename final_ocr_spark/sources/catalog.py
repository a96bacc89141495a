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
  unreferenced files), mirroring Iceberg's snapshot expiry.

Like Iceberg, a torn write is invisible: data files land first, the snapshot
JSON second, the HEAD flip last — a crash anywhere leaves HEAD on the old
consistent snapshot.
"""

from __future__ import annotations

import json
import os
import pathlib
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

MANIFEST_DIR = "_manifest"
HEAD_FILE = "HEAD"


class SnapshotCatalog:
    """Filesystem-backed snapshot catalog of parquet tables."""

    def __init__(self, root: str) -> None:
        self.root = pathlib.Path(root)

    # -- paths ------------------------------------------------------------
    def table_dir(self, name: str) -> pathlib.Path:
        if "/" in name or name.startswith("."):
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
        for s in self.snapshots(name):
            if s["snapshot_id"] == sid:
                return s
        raise RuntimeError(f"HEAD={sid} of table {name!r} has no snapshot file")

    # -- read -------------------------------------------------------------
    def read(self, spark: SparkSession, name: str,
             snapshot_id: int | None = None) -> DataFrame:
        """``spark.read.table`` analog; ``snapshot_id`` = time travel."""
        if snapshot_id is None:
            snap = self.current_snapshot(name)
            if snap is None:
                raise FileNotFoundError(f"no such table: {name!r}")
        else:
            by_id = {s["snapshot_id"]: s for s in self.snapshots(name)}
            if snapshot_id not in by_id:
                raise FileNotFoundError(f"table {name!r} has no snapshot {snapshot_id}")
            snap = by_id[snapshot_id]
        files = [str(self.table_dir(name) / f["path"]) for f in snap["files"]]
        if not files:
            return spark.createDataFrame([], snap["schema"])
        return spark.read.parquet(*files)

    # -- write ------------------------------------------------------------
    def write(self, df: DataFrame, name: str, mode: str = "append") -> dict:
        """``df.writeTo(name).append()/overwrite()`` analog. Returns the new
        snapshot dict. Data files are immutable; a new snapshot + atomic HEAD
        flip publishes them."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        tdir = self.table_dir(name)
        md = self._manifest_dir(name)
        md.mkdir(parents=True, exist_ok=True)

        # 1. land immutable data files in a fresh uuid directory
        data_rel = f"data/{uuid.uuid4().hex}"
        data_dir = tdir / data_rel
        df.write.mode("overwrite").parquet(str(data_dir))
        spark = df.sparkSession
        written = spark.read.parquet(str(data_dir))
        new_files = [
            {"path": f"{data_rel}/{pathlib.Path(p).name}",
             "bytes": (data_dir / pathlib.Path(p).name).stat().st_size}
            for p in sorted(written.inputFiles())
        ]
        row_count = written.count()  # parquet-footer-only

        # 2. write the snapshot JSON (not yet referenced)
        parent = self.current_snapshot(name)
        base_files = parent["files"] if (parent and mode == "append") else []
        sid = (parent["snapshot_id"] + 1) if parent else 1
        snap = {
            "snapshot_id": sid,
            "parent_id": parent["snapshot_id"] if parent else None,
            "operation": mode,
            "committed_at_epoch": time.time(),
            "app_id": spark.sparkContext.applicationId,
            "schema": df.schema.simpleString(),
            "row_count_added": row_count,
            "files": base_files + new_files,
        }
        snap_path = md / f"snap-{sid:08d}.json"
        # fsync the snapshot file (and its directory entry) BEFORE the HEAD
        # flip — an fsynced HEAD pointing at a torn/empty snap file after a
        # power loss would make the table unreadable instead of serving the
        # previous snapshot (round-2 review finding)
        with open(snap_path, "w", encoding="utf-8") as f:
            f.write(json.dumps(snap, sort_keys=True))
            f.flush()
            os.fsync(f.fileno())
        dfd = os.open(md, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

        # 3. atomic publish: temp + rename of the HEAD pointer
        tmp = md / f".{HEAD_FILE}.{uuid.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(str(sid))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, md / HEAD_FILE)
        return snap

    # -- maintenance --------------------------------------------------------
    def expire(self, name: str, keep_last: int = 1) -> int:
        """Iceberg-style snapshot expiry: drop all but the last ``keep_last``
        snapshots and delete data files no surviving snapshot references.
        Returns the number of data files deleted."""
        snaps = self.snapshots(name)
        if len(snaps) <= keep_last:
            return 0
        keep = snaps[-keep_last:]
        drop = snaps[:-keep_last]
        live = {f["path"] for s in keep for f in s["files"]}
        tdir = self.table_dir(name)
        deleted = 0
        for s in drop:
            for f in s["files"]:
                if f["path"] not in live:
                    p = tdir / f["path"]
                    if p.exists():
                        p.unlink()
                        deleted += 1
            (self._manifest_dir(name) / f"snap-{s['snapshot_id']:08d}.json").unlink(
                missing_ok=True
            )
        return deleted
