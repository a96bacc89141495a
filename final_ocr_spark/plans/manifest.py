"""Per-partition checkpoint/resume manifest (SURVEY §4.3, north rule).

Spark batch has no cross-run state; at 10^12-document scale a failed job must
not recompute finished work. The manifest is the engine's analog of the
reference's per-run accumulation state (ocr2.py:609-611) made durable:

* output table = directory of parquet files partitioned by ``part_id``
  (``part_id = pmod(xxhash64(url), num_parts)`` — stable under re-runs);
* ``_manifest.jsonl`` beside it records one row per completed partition
  GROUP commit: part ids, row count, byte count, lineage (app id, code
  version, input snapshot id);
* on restart, completed part ids are excluded with a filter (the left-anti
  analog) and only the remainder recomputes — idempotent because each
  partition's content is a pure function of the input rows that hash into it.

Commit granularity is a partition *group* (``num_groups`` commits per run):
per-group writes keep the driver loop bounded and scale-independent (groups,
not rows or partitions), while each group's write is atomic through Spark's
output committer. Row/byte metrics per group come from a post-write parquet
scan: count(*) is footer-metadata-only, and byte_count reads a single column.
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


def extract_with_resume(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    *,
    num_parts: int = 64,
    num_groups: int = 8,
    dedup: bool = True,
    _fail_after_groups: int | None = None,
) -> DataFrame:
    """Run the flagship extraction into ``out_dir`` with per-partition-group
    checkpointing; safe to re-invoke after any failure — completed groups are
    skipped via the manifest (left-anti semantics on part_id).

    ``_fail_after_groups`` is a test hook: raise after K group commits to
    simulate a mid-job crash.

    Returns the completed output as a DataFrame.
    """
    manifest = PartitionManifest(out_dir)
    done = manifest.done_parts()

    lineage = {
        "app_id": spark.sparkContext.applicationId,
        "code_version": _code_version(),
        "input_snapshot": ",".join(sorted(pages.inputFiles())[:20]) or "in-memory",
        "num_parts": num_parts,
    }

    from final_ocr_spark.operators.extract_pages import extract_pages

    with_part = pages.withColumn(
        "part_id", F.pmod(F.xxhash64("url"), F.lit(num_parts)).cast("int")
    )

    groups: list[list[int]] = [[] for _ in range(num_groups)]
    for p in range(num_parts):
        groups[p % num_groups].append(p)

    committed = 0
    for gi, part_ids in enumerate(groups):
        todo = [p for p in part_ids if p not in done]
        if not todo:
            continue
        subset = with_part.filter(F.col("part_id").isin(todo))
        ext = extract_pages(subset.drop("part_id"), dedup=dedup)
        ext = ext.withColumn(
            "part_id", F.pmod(F.xxhash64("url"), F.lit(num_parts)).cast("int")
        )
        # deterministic files: stable sort within partitions before write
        (
            ext.repartition(max(len(todo), 1), "part_id")
            .sortWithinPartitions("url")
            .write.mode("append")
            .partitionBy("part_id")
            .parquet(str(out_dir))
        )
        # metrics: count(*) is parquet-footer-only; bytes reads one column
        written = spark.read.parquet(str(out_dir)).filter(F.col("part_id").isin(todo))
        stats = written.agg(
            F.count(F.lit(1)).alias("rows"),
            F.coalesce(F.sum(F.length("extracted_text")), F.lit(0)).alias("bytes"),
        ).collect()[0]
        manifest.mark_done(todo, stats["rows"], int(stats["bytes"]), lineage)
        committed += 1
        if _fail_after_groups is not None and committed >= _fail_after_groups:
            raise RuntimeError(f"injected failure after {committed} group commits")

    return spark.read.parquet(str(out_dir))
