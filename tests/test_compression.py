"""Compression-ratio quality signal (text_stats.compression_ratio_udf /
compression_band_gate): differential vs the pure-Python twin, band
semantics on planted prose/template/noise docs, null handling, and the
pipeline wiring."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from final_ocr_spark.operators.text_stats import (
    compression_band_gate,
    compression_ratio_udf,
)

PROSE = (
    "The committee reviewed the quarterly figures and concluded that the "
    "revised forecast, while cautious, remained broadly consistent with "
    "the evidence presented by the independent auditors last spring. "
    "Several members nevertheless questioned whether the underlying model "
    "had adequately captured seasonal variation in coastal shipping rates. "
    "A supplementary analysis, commissioned in March, suggested that port "
    "congestion accounted for roughly a third of the observed deviation. "
    "Wage growth in the logistics sector remained subdued despite strong "
    "headline employment numbers across neighbouring industrial regions. "
    "The chair proposed deferring any revision until the autumn data "
    "release, a motion carried with two abstentions and one dissent. "
    "Minutes of the discussion will be circulated to stakeholders before "
    "the next plenary session convenes in the first week of October."
)
TEMPLATE = "click here to subscribe now " * 60


def _noise(n_blocks: int = 24) -> str:
    """Deterministic incompressible text: a sha256 hash chain rendered as
    base64 (64 symbols ≈ 6 bits/char — hex's 16-symbol alphabet alone
    would compress to ~0.55, indistinguishable from short prose)."""
    import base64
    import hashlib

    out, h = [], b"seed"
    for _ in range(n_blocks):
        h = hashlib.sha256(h).digest()
        out.append(base64.b64encode(h).decode())
    return "".join(out)


NOISE = _noise()


def _py_ratio(t: str, level: int = 6, sample: int = 65536) -> float | None:
    if not t:
        return None
    b = t.encode("utf-8")[:sample]
    return len(zlib.compress(b, level)) / len(b)


def test_ratio_matches_python_twin(spark):
    rows = [("prose", PROSE), ("tmpl", TEMPLATE), ("noise", NOISE),
            ("empty", ""), ("null", None), ("uni", "żółć naïve café " * 40)]
    df = spark.createDataFrame(rows, ["k", "text"])
    got = {
        r["k"]: r["r"]
        for r in df.select(
            "k", compression_ratio_udf()(F.col("text")).alias("r")
        ).collect()
    }
    for k, t in rows:
        exp = _py_ratio(t) if isinstance(t, str) else None
        assert got[k] == exp, k


def test_band_orders_the_three_regimes(spark):
    df = spark.createDataFrame(
        [("prose", PROSE), ("tmpl", TEMPLATE), ("noise", NOISE)],
        ["k", "text"],
    )
    r = {
        row["k"]: row["r"]
        for row in df.select(
            "k", compression_ratio_udf()(F.col("text")).alias("r")
        ).collect()
    }
    # template spam compresses hardest, noise barely at all
    assert r["tmpl"] < r["prose"] < r["noise"]
    kept = compression_band_gate(
        df, lo=r["tmpl"] + 1e-9, hi=r["noise"] - 1e-9
    ).select("k").collect()
    assert {row["k"] for row in kept} == {"prose"}


def test_band_gate_drops_null_and_empty(spark):
    df = spark.createDataFrame(
        [("a", PROSE), ("b", None), ("c", "")], ["k", "text"]
    )
    kept = compression_band_gate(df, lo=0.0, hi=2.0).select("k").collect()
    assert {row["k"] for row in kept} == {"a"}


def test_band_gate_audit_column(spark):
    df = spark.createDataFrame([("a", PROSE)], ["k", "text"])
    out = compression_band_gate(df, lo=0.0, hi=2.0, ratio_col="cr")
    assert "cr" in out.columns
    assert out.collect()[0]["cr"] == pytest.approx(_py_ratio(PROSE))


def test_band_gate_validates_bounds(spark):
    df = spark.createDataFrame([("a", PROSE)], ["k", "text"])
    with pytest.raises(ValueError):
        compression_band_gate(df, lo=0.9, hi=0.2)


def test_sample_bound_caps_cost(spark):
    """Ratio over a long doc equals the ratio of its first sample_bytes —
    the per-row cost bound at 100-TB outlier sizes."""
    long = PROSE * 400  # ~2.3 MB
    df = spark.createDataFrame([("a", long)], ["k", "text"])
    got = df.select(
        compression_ratio_udf(sample_bytes=4096)(F.col("text")).alias("r")
    ).collect()[0]["r"]
    assert got == _py_ratio(long, sample=4096)


def test_pipeline_compression_band_stage(spark):
    """corpus_pipeline(compression_band=...) drops the planted template-spam
    page while keeping prose, with every other optional stage off."""
    from datetime import datetime

    from final_ocr_spark.pipeline import corpus_pipeline
    from final_ocr_spark.schema import PAGES_SCHEMA

    ts = datetime(2024, 5, 1, 12, 0, 0)
    pages = spark.createDataFrame(
        [("http://h1.example.com/a", ts, None, PROSE, "en"),
         ("http://h2.example.com/a", ts, None, TEMPLATE, "en")],
        PAGES_SCHEMA,
    )
    out = corpus_pipeline(
        pages, min_quality=0.0, gopher=False, redact=False, near_dup=False,
        compression_band=(0.25, 0.95),
    )
    urls = {r["url"] for r in out.select("url").collect()}
    assert "http://h1.example.com/a" in urls
    assert "http://h2.example.com/a" not in urls
