"""Per-partition checkpoint/resume manifest (SURVEY §4.3, north rule).

Spark batch has no cross-run state; at 10^12-document scale a failed job must
not recompute finished work. The manifest is the engine's analog of the
reference's per-run accumulation state (ocr2.py:609-611) made durable:

* output table = directory of parquet files partitioned by ``part_id``
  (``part_id = pmod(xxhash64(url), num_parts)`` — stable under re-runs);
* ``_manifest.jsonl`` beside it records one row per completed partition
  GROUP commit: part ids, row count, byte count, lineage (app id, code
  version, input snapshot id);
* on restart, completed part ids are excluded and only the remainder
  recomputes — idempotent because each partition's content is a pure function
  of the input rows that hash into it AND every write is a dynamic partition
  OVERWRITE (a crash between the parquet commit and the manifest append can
  only cause a part to be rewritten identically, never duplicated).

Scan discipline: the raw input is read EXACTLY ONCE per backfill. Default
(``num_groups=1``) is one scan → one write → one commit. Bounded-recompute
mode (``num_groups>1``) stages the input as a part_id-partitioned table in
one scan, then per-group jobs read only their own partition directories
(directory pruning) — never the raw input again. Row/byte metrics per commit
come from a post-write parquet scan: count(*) is footer-metadata-only, and
byte_count reads a single column.
"""

from __future__ import annotations

import json
import os
import pathlib
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_manifest.jsonl"


class PartitionManifest:
    """Append-only JSONL manifest with atomic appends (write-temp + rename is
    unnecessary for appends: a torn trailing line is detected and ignored on
    read, which keeps commits idempotent)."""

    def __init__(self, out_dir: str) -> None:
        self.dir = pathlib.Path(out_dir)
        self.path = self.dir / MANIFEST_NAME

    def entries(self) -> list[dict]:
        if not self.path.exists():
            return []
        out = []
        for line in self.path.read_text(encoding="utf-8").splitlines():
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                continue  # torn tail from a crash mid-append — recompute it
        return out

    def done_parts(self) -> set[int]:
        done: set[int] = set()
        for e in self.entries():
            if e.get("status") == "done":
                done.update(e.get("part_ids", []))
        return done

    def mark_staged(self, num_parts: int, lineage: dict) -> None:
        """Record that the part_id-partitioned staging copy of the raw input
        is complete (written AFTER the stage write job commits, so a partial
        stage from a crash is never trusted)."""
        self.dir.mkdir(parents=True, exist_ok=True)
        rec = {
            "status": "staged",
            "num_parts": num_parts,
            "committed_at_epoch": time.time(),
            **lineage,
        }
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(rec, sort_keys=True) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def mark_done(self, part_ids: list[int], row_count: int, byte_count: int,
                  lineage: dict) -> None:
        self.dir.mkdir(parents=True, exist_ok=True)
        rec = {
            "status": "done",
            "part_ids": sorted(part_ids),
            "row_count": row_count,
            "byte_count": byte_count,
            "committed_at_epoch": time.time(),
            **lineage,
        }
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(rec, sort_keys=True) + "\n")
            f.flush()
            os.fsync(f.fileno())


def _code_version() -> str:
    import final_ocr_spark

    return getattr(final_ocr_spark, "__version__", "unknown")


def _write_parts(ext: DataFrame, out_dir: str, n_files: int) -> None:
    """Dynamic-partition-overwrite write: re-running after ANY crash replaces
    exactly the part_id directories this job produces instead of appending
    duplicates (round 1 used mode=append, so a crash in the window between
    the parquet commit and mark_done() duplicated those parts on resume)."""
    (
        ext.repartition(max(n_files, 1), "part_id")
        .sortWithinPartitions("url")  # deterministic files
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("part_id")
        .parquet(str(out_dir))
    )


def _commit_stats(spark: SparkSession, manifest: PartitionManifest, out_dir: str,
                  todo: list[int], lineage: dict) -> None:
    # metrics: count(*) is parquet-footer-only; bytes reads one column
    written = spark.read.parquet(str(out_dir)).filter(F.col("part_id").isin(todo))
    stats = written.agg(
        F.count(F.lit(1)).alias("rows"),
        F.coalesce(F.sum(F.length("extracted_text")), F.lit(0)).alias("bytes"),
    ).collect()[0]
    manifest.mark_done(todo, stats["rows"], int(stats["bytes"]), lineage)


def extract_with_resume(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    *,
    num_parts: int = 64,
    num_groups: int = 1,
    dedup: bool = True,
    _fail_after_groups: int | None = None,
) -> DataFrame:
    """Run the flagship extraction into ``out_dir`` with manifest-tracked
    resume; safe to re-invoke after any failure.

    Input-scan discipline (the round-1 version re-filtered the FULL raw input
    once per group — num_groups full 100 TB scans; part_id is derived from
    hash(url), so the filter can never prune the raw parquet):

    * ``num_groups=1`` (default): ONE scan of the raw input, one
      dynamic-partition-overwrite write of every not-done part, one manifest
      commit. Idempotent at every crash point — a failure before the commit
      leaves partial part dirs that the next run simply overwrites.
    * ``num_groups>1`` (bounded-recompute mode): the raw input is STAGED
      exactly once as a part_id-PARTITIONED parquet table (one full scan,
      manifest-tracked), then each group reads ONLY its own partition
      directories from the stage (real partition pruning), extracts, writes
      with dynamic overwrite, and commits its manifest entry. A crash loses
      at most one group's compute; the raw input is never read twice.

    ``_fail_after_groups`` is a test hook: raise after K group commits to
    simulate a mid-job crash.

    Returns the completed output as a DataFrame.
    """
    from final_ocr_spark.operators.extract_pages import extract_pages

    manifest = PartitionManifest(out_dir)
    # a resume with a DIFFERENT num_parts would interpret done part_ids
    # under a new hash scheme — silently skipping never-extracted rows and
    # keeping stale ones. Refuse loudly (round-2 review finding).
    for e in manifest.entries():
        prev = e.get("num_parts")
        if prev is not None and prev != num_parts:
            raise ValueError(
                f"manifest at {out_dir} was written with num_parts={prev}; "
                f"resuming with num_parts={num_parts} would mix two "
                "incompatible partitioning schemes — use the original value"
            )
    done = manifest.done_parts()
    todo_all = [p for p in range(num_parts) if p not in done]

    lineage = {
        "app_id": spark.sparkContext.applicationId,
        "code_version": _code_version(),
        "input_snapshot": ",".join(sorted(pages.inputFiles())[:20]) or "in-memory",
        "num_parts": num_parts,
    }

    part_col = F.pmod(F.xxhash64("url"), F.lit(num_parts)).cast("int")

    if todo_all and num_groups <= 1:
        # single pass: scan once, write all not-done parts, commit once
        src = pages if not done else (
            pages.withColumn("part_id", part_col)
            .filter(F.col("part_id").isin(todo_all))
            .drop("part_id")
        )
        ext = extract_pages(src, dedup=dedup).withColumn("part_id", part_col)
        _write_parts(ext, out_dir, len(todo_all))
        if _fail_after_groups is not None:
            raise RuntimeError("injected failure after write, before commit")
        _commit_stats(spark, manifest, out_dir, todo_all, lineage)
    elif todo_all:
        # staged mode: ONE raw-input scan materializes the part_id-partitioned
        # stage; group scans prune to their own directories from then on
        stage_dir = pathlib.Path(out_dir) / "_stage"
        staged = any(e.get("status") == "staged" for e in manifest.entries())
        if not staged:
            (
                pages.withColumn("part_id", part_col)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("part_id")
                .parquet(str(stage_dir))
            )
            manifest.mark_staged(num_parts, lineage)

        groups: list[list[int]] = [[] for _ in range(num_groups)]
        for p in range(num_parts):
            groups[p % num_groups].append(p)

        committed = 0
        stage = spark.read.parquet(str(stage_dir))
        for part_ids in groups:
            todo = [p for p in part_ids if p not in done]
            if not todo:
                continue
            # partition-column filter → directory pruning, not a full scan
            subset = stage.filter(F.col("part_id").isin(todo)).drop("part_id")
            ext = extract_pages(subset, dedup=dedup).withColumn("part_id", part_col)
            _write_parts(ext, out_dir, len(todo))
            _commit_stats(spark, manifest, out_dir, todo, lineage)
            committed += 1
            if _fail_after_groups is not None and committed >= _fail_after_groups:
                raise RuntimeError(f"injected failure after {committed} group commits")

    return spark.read.parquet(str(out_dir))
