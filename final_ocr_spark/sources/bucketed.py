"""Bucketed table layout: shuffle-free co-located joins (SURVEY §2 A5's
scale path).

At 10^12 documents the recurring cost in a corpus warehouse is not one join
but the SAME join run every day: pages⋈links, corpus⋈signature-store,
train⋈provenance — always on the same key. A sort-merge join shuffles both
sides every run; bucketing pays that shuffle ONCE at write time by hashing
rows into a fixed number of buckets per side (Spark's ``bucketBy``, hash =
``pmod(hashExpr, n)`` — the same Murmur3 hash both scans agree on), after
which every join/aggregation on the bucket key plans with NO Exchange on
either side (verified by the plan-shape test: zero ``Exchange`` operators
between two bucketed scans and their SortMergeJoin).

This is the DataFrame-native analog of Iceberg's ``bucket(N, col)``
partition transform — the SEAMS.md substitution on a real cluster — and the
"pre-partitioned co-located join" strategy the reference cannot express at
all (single process, ocr2.py:589-597 loops sequentially).

Requirements Spark imposes (and this module enforces):

* bucketed tables must be saved through the session catalog
  (``saveAsTable``) — a bare ``.parquet(path)`` write silently drops bucket
  metadata. Tables land in ``spark.sql.warehouse.dir`` unless ``path`` makes
  them external.
* both join sides must agree on bucket COLUMNS and COUNT for the exchange
  to disappear on both sides (differing counts still save one side under
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``; we require equal
  counts for the strong guarantee and surface a loud error otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: list[str],
    buckets: int,
    sort_by: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed parquet table named ``name`` in the
    session catalog. ``sort_by`` additionally sorts rows inside each bucket
    file (defaults to ``keys``: sorted buckets let the join skip its Sort
    too, and give parquet tight page-level min/max on the key).

    ``buckets`` sizing at scale: aim for bucket-file sizes near the scan
    target (128-512 MB) at the LARGER table, and share the count across
    every table that joins on the same key family.
    """
    if not keys:
        raise ValueError("bucketing needs at least one key column")
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    w = df.write.format("parquet").mode(mode)
    if path is not None:
        w = w.option("path", path)  # external table: survives DROP TABLE
    sort_cols = sort_by if sort_by is not None else keys
    w.bucketBy(buckets, *keys).sortBy(*sort_cols).saveAsTable(name)


def bucket_spec(spark: SparkSession, name: str) -> dict:
    """{'keys': [...], 'buckets': int, 'sort': [...]} for a catalog table
    (empty keys / 0 buckets if the table is not bucketed)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    info = {r["col_name"]: (r["data_type"] or "") for r in rows}
    import re

    def _cols(v: str) -> list[str]:
        return [c.strip(" `") for c in v.strip("[]").split(",") if c.strip()]

    m = re.fullmatch(r"\s*(\d+)\s*", info.get("Num Buckets", ""))
    return {
        "keys": _cols(info.get("Bucket Columns", "")),
        "buckets": int(m.group(1)) if m else 0,
        "sort": _cols(info.get("Sort Columns", "")),
    }


def bucketed_join(
    spark: SparkSession,
    left: str,
    right: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket keys, refusing
    layouts where the shuffle-free plan cannot happen — silence here would
    quietly reintroduce a 2×-table-size shuffle into a job that was sized
    assuming none."""
    ls, rs = bucket_spec(spark, left), bucket_spec(spark, right)
    for name, spec in ((left, ls), (right, rs)):
        if not spec["buckets"]:
            raise ValueError(f"table {name!r} is not bucketed")
        if [k.lower() for k in spec["keys"]] != [k.lower() for k in on]:
            raise ValueError(
                f"table {name!r} is bucketed on {spec['keys']}, join is on "
                f"{on} — co-location requires bucket keys == join keys"
            )
    if ls["buckets"] != rs["buckets"]:
        raise ValueError(
            f"bucket counts differ ({left!r}={ls['buckets']}, "
            f"{right!r}={rs['buckets']}): rewrite one side or enable "
            "spark.sql.bucketing.coalesceBucketsInJoin.enabled for the "
            "half-shuffle-free fallback"
        )
    return spark.table(left).join(spark.table(right), on=on, how=how)
