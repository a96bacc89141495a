"""Distributed Bloom filter: set-membership pre-filter for incremental
ingest at corpus scale.

The recurring 10^12-doc problem: a new crawl batch arrives and "which of
these urls have we already extracted?" must not cost an exact join of the
batch against the full historical table. A Bloom filter built ONCE over
history answers "definitely new" for most of the batch with zero false
negatives; only the small "maybe seen" remainder pays the exact anti-join.
(Complements sketches.py's count-min, which answers frequency, and
dedup.py's incremental_near_dups, which answers near-duplication.)

Representation: the filter is itself a DataFrame of ``(word_idx, bits)``
rows — one 64-bit word per row, ``ceil(m/64)`` rows total (a few MB for
billions of keys at 1% fpp) — so it is built by a plain partial/final
``bit_or`` aggregation (map-side combine, one tiny shuffle), stored as
parquet like any table, unioned across increments via another ``bit_or``
group-by, and consumed via a broadcast join. No driver-side bitmap, no UDF,
no collect; everything is codegen Column math, ANSI-safe (bit ops only).

Hashing: k independent probes via ``xxhash64(key, seed_j)`` + ``pmod``
(engine-pinned: xxhash64 is Spark-only, fine — the filter is a Spark-side
artifact, never compared to another engine). Standard sizing:
m = -n·ln(p)/ln(2)², k = round(m/n·ln 2).

Reference analog: the existence guard (ocr.py:54-56) generalized from "is
this one file on disk" to "is this url in the 10^12-doc corpus".
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k_hashes) for expected item count and false-positive rate."""
    if n_items <= 0:
        raise ValueError("n_items must be positive")
    if not (0.0 < fpp < 1.0):
        raise ValueError("fpp must be in (0, 1)")
    m = max(64, int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _probe_rows(df: DataFrame, key: str, m_bits: int, k_hashes: int) -> DataFrame:
    """One (_bk, word_idx, mask) row per probe — k rows per input row.

    The mask comes from SQL ``shiftleft`` (the Python F.shiftleft signature
    only takes a literal shift); shiftleft is a bit op, so bit 63 wraps to
    the sign bit without tripping ANSI arithmetic checks.
    """
    probes = []
    for j in range(k_hashes):
        pos = F.pmod(F.xxhash64(F.col(key), F.lit(j)), F.lit(m_bits))
        probes.append(F.struct(
            (pos / F.lit(64)).cast("long").alias("word_idx"),
            F.pmod(pos, F.lit(64)).cast("int").alias("bit"),
        ))
    return (
        df.select(F.col(key).alias("_bk"), F.explode(F.array(*probes)).alias("p"))
        .select(
            "_bk", "p.word_idx",
            F.expr("shiftleft(CAST(1 AS BIGINT), p.bit)").alias("mask"),
        )
    )


def build_bloom(
    df: DataFrame, key: str, n_items: int | None = None, fpp: float = 0.01,
    m_bits: int | None = None, k_hashes: int | None = None,
) -> DataFrame:
    """df[key] → Bloom filter table (word_idx long, bits long, m_bits, k).

    Size from ``n_items``+``fpp`` (estimate n_items ≥ the true distinct
    count; oversizing only lowers the fpp) or pass m_bits/k_hashes
    directly. One explode to k rows per key, then partial/final bit_or —
    the same one-tiny-shuffle shape as the count-min sketch.
    """
    if (m_bits is None) != (k_hashes is None):
        raise ValueError("pass BOTH m_bits and k_hashes, or neither "
                         "(partial sizing would silently desync probe sets)")
    if m_bits is None:
        if n_items is None:
            raise ValueError("pass n_items (expected distinct keys) or m_bits+k_hashes")
        m_bits, k_hashes = bloom_params(n_items, fpp)
    per_probe = _probe_rows(df, key, m_bits, k_hashes).select("word_idx", "mask")
    words = per_probe.groupBy("word_idx").agg(F.bit_or("mask").alias("bits"))
    # sentinel row (word_idx −1 never matches a probe: pmod ≥ 0) keeps the
    # (m_bits, k) metadata present even for an EMPTY build set, so a filter
    # over zero history still answers "definitely new" for everything
    # instead of failing the incremental-ingest bootstrap
    sentinel = df.sparkSession.createDataFrame(
        [(-1, 0)], "word_idx long, bits long"
    )
    return (
        words.unionByName(sentinel)
        .withColumn("m_bits", F.lit(m_bits))
        .withColumn("k", F.lit(k_hashes))
    )


def merge_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two filters built with IDENTICAL (m_bits, k): bit_or per word.
    This is how per-increment filters roll up without touching history.
    Mismatched parameters are rejected loudly — merging differently-sized
    filters would corrupt bits silently, including FALSE NEGATIVES."""
    if _bloom_meta(a) != _bloom_meta(b):
        raise ValueError(
            f"cannot merge Bloom filters with different (m_bits, k): "
            f"{_bloom_meta(a)} vs {_bloom_meta(b)}"
        )
    merged, _ = merge_bloom_partitions(a.unionByName(b))
    return merged


def merge_bloom_partitions(
    bl: DataFrame, *, what: str = "bloom filter table", hint: str = ""
) -> tuple[DataFrame | None, tuple[int, int] | None]:
    """Merge ONE frame holding any number of filter partitions built with
    the same (m_bits, k) — ``bit_or`` per word — returning
    ``(merged, (m_bits, k))``, or ``(None, None)`` on an empty frame.
    Mixed families are rejected loudly (merging differently-sized filters
    corrupts bits silently, including FALSE NEGATIVES); this is the single
    owner of that contract for both :func:`merge_blooms` and the ANN
    id-Bloom sidecar merge (similarity.py), which previously carried its
    own copy (review-caught)."""
    metas = [
        (int(r["m_bits"]), int(r["k"]))
        for r in bl.select("m_bits", "k").distinct().collect()
    ]
    if not metas:
        return None, None
    if len(metas) > 1:
        raise ValueError(
            f"{what} holds mixed (m_bits, k) families {sorted(metas)} — "
            f"filters only merge within one family{hint}"
        )
    merged = (
        bl.groupBy("word_idx", "m_bits", "k")
        .agg(F.bit_or("bits").alias("bits"))
        .select("word_idx", "bits", "m_bits", "k")
    )
    return merged, metas[0]


def _bloom_meta(bloom: DataFrame) -> tuple[int, int]:
    row = bloom.select("m_bits", "k").first()
    if row is None:
        raise ValueError("empty bloom filter table")
    return int(row["m_bits"]), int(row["k"])


def with_bloom_membership(
    df: DataFrame, bloom: DataFrame, key: str, out_col: str = "maybe_seen"
) -> DataFrame:
    """df + boolean ``out_col``: False ⇒ key is DEFINITELY absent from the
    filter's build set (no false negatives); True ⇒ probably present (fpp
    false positives). Broadcast join per probe word — the filter is tiny.
    """
    m_bits, k_hashes = _bloom_meta(bloom)
    probe_rows = _probe_rows(df, key, m_bits, k_hashes)
    hits = (
        probe_rows.join(
            F.broadcast(bloom.select("word_idx", "bits")), "word_idx", "left"
        )
        .withColumn(
            "_hit",
            F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
            != F.lit(0),
        )
        .groupBy("_bk")
        .agg(F.bool_and("_hit").alias(out_col))
    )
    return df.join(
        hits.withColumnRenamed("_bk", key), key, "left"
    ).withColumn(out_col, F.coalesce(F.col(out_col), F.lit(False)))


def split_new_vs_maybe_seen(
    batch: DataFrame, bloom: DataFrame, key: str
) -> tuple[DataFrame, DataFrame]:
    """(definitely_new, maybe_seen) partition of a batch.

    ``definitely_new`` is EXACT (Bloom filters have no false negatives) and
    skips any further checking; only ``maybe_seen`` — the true overlap plus
    ~fpp of the batch — needs the exact anti-join against history. This is
    the scalable incremental-ingest shape: the expensive join's input
    shrinks from |batch| to |overlap| + fpp·|batch|.
    """
    # localCheckpoint: both returned frames are consumed downstream, and
    # without it the whole membership pipeline (batch scan + k-way explode
    # + broadcast join + shuffle) would execute once PER output
    tagged = with_bloom_membership(batch, bloom, key).localCheckpoint(eager=False)
    return (
        tagged.filter(~F.col("maybe_seen")).drop("maybe_seen"),
        tagged.filter(F.col("maybe_seen")).drop("maybe_seen"),
    )
