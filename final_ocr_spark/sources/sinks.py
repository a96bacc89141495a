"""Output sinks (SURVEY §2.1 S4-S8), deterministic by construction.

The reference writes Excel/CSV/JSON report files (save_to_excel ocr.py:1153,
save_to_csv ocr.py:1211, save_to_json ocr2.py:699). Excel is
presentation-only and out of engine scope (SURVEY S4); the engine's sinks are
parquet (primary), CSV, and JSON — all written with a stable in-partition
sort so reruns produce byte-identical files (the determinism contract).

JSON canonicalization mirrors the reference's ``ensure_ascii=False`` +
stable key order (ocr2.py:703).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _deterministic(df: DataFrame, sort_cols: list[str]) -> DataFrame:
    return df.sortWithinPartitions(*sort_cols)


def write_parquet(df: DataFrame, path: str, sort_cols: list[str] | None = None,
                  mode: str = "overwrite") -> None:
    """Primary sink (S5/S6 analog): stable-sorted parquet."""
    _deterministic(df, sort_cols or df.columns[:1]).write.mode(mode).parquet(path)


def write_csv(df: DataFrame, path: str, sort_cols: list[str] | None = None,
              mode: str = "overwrite") -> None:
    """S7: header CSV (complex columns must be projected/serialized first)."""
    _deterministic(df, sort_cols or df.columns[:1]).write.mode(mode).option(
        "header", True
    ).csv(path)


def write_json(df: DataFrame, path: str, sort_cols: list[str] | None = None,
               mode: str = "overwrite") -> None:
    """S8: JSON-lines sink; Spark's writer is UTF-8 (ensure_ascii=False
    analog) and emits fields in schema order (stable)."""
    _deterministic(df, sort_cols or df.columns[:1]).write.mode(mode).json(path)
