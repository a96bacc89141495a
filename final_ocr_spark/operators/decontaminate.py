"""Benchmark decontamination: remove training documents that overlap an
evaluation set (the GPT-3 appendix-C / Llama n-gram collision rule —
a training doc is contaminated if it shares any word n-gram, n≈13, with a
benchmark document).

Built on ``shingle_hash_rows`` (explode + window lag, codegen): both sides
reduce to slim (key, gram-hash) rows; membership is a semi-join on the
64-bit hash. The benchmark side is tiny relative to the corpus (eval sets
are MBs, the corpus is TBs) so its distinct gram set is broadcast — the
corpus side never shuffles, the whole check rides the corpus scan.
P(hash collision marking a clean doc) ≈ |bench grams|·|doc grams|/2^64 —
negligible at any realistic size; collisions only ever REMOVE a training
doc, never leak a benchmark one.

The reference repo has no notion of held-out contamination; this is the
train/eval hygiene layer its extraction output needs before training use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from final_ocr_spark.operators.dedup import shingle_hash_rows


def contaminated_keys(
    df: DataFrame,
    benchmark: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    bench_key: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 13,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(key, n_hits) for every training doc sharing ≥1 word n-gram with the
    benchmark. Tokenization is the sketch pipeline's (lowercase,
    punctuation → space), so near-trivial formatting differences don't hide
    contamination."""
    doc_grams = shingle_hash_rows(df, key=key, text_col=text_col, shingle_k=n)
    bench_grams = (
        shingle_hash_rows(
            benchmark, key=bench_key, text_col=bench_text_col, shingle_k=n
        )
        .select("h")
        .distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    return (
        doc_grams.join(bench_grams, "h", "left_semi")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(F.col("k").alias(key), "n_hits")
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    bench_key: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """df minus every document sharing an n-gram with the benchmark
    (left-anti join on the contaminated key set)."""
    hits = contaminated_keys(
        df, benchmark, key=key, text_col=text_col,
        bench_key=bench_key, bench_text_col=bench_text_col, n=n,
    ).select(key)
    return df.join(hits, key, "left_anti")


def contamination_report(
    df: DataFrame,
    benchmark: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    bench_key: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Per-BENCHMARK-document audit of train/eval overlap — the report an
    eval owner reads before trusting scores, where :func:`decontaminate`
    is the removal. One row per benchmark doc:

    * ``n_grams`` — its distinct word n-grams,
    * ``n_grams_hit`` — how many also occur in the corpus,
    * ``hit_ratio`` — the fraction (0.0 for a clean doc),
    * ``n_corpus_docs`` — distinct corpus docs sharing ≥1 gram with it.

    Every benchmark doc appears, including untouched ones (gramless docs —
    shorter than n words — show n_grams=0): an absent row reads as
    "clean", which must never be the silent consequence of a join miss.

    Scale shape: the corpus reduces to DISTINCT (corpus-doc, gram) rows on
    its own scan; the benchmark gram set broadcasts to tag them
    (corpus-side rows never shuffle untagged — only the tagged survivors,
    ≤ |bench grams| × docs-per-gram, reach the two bounded aggregations).
    """
    # consumed 3× below (totals, h-set, per-bench join) — materialize once
    # or every consumer re-runs the benchmark shingle explode+window
    bench_grams = shingle_hash_rows(
        benchmark, key=bench_key, text_col=bench_text_col, shingle_k=n
    ).distinct().localCheckpoint(eager=False)
    # per-bench-doc gram counts: bounded by the (tiny) benchmark itself
    totals = bench_grams.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    corpus_grams = shingle_hash_rows(
        df, key=key, text_col=text_col, shingle_k=n
    ).distinct()
    tagged = corpus_grams.join(
        F.broadcast(bench_grams.select("h").distinct()), "h", "left_semi"
    )
    # (gram → bench docs) fan-out happens on the already-tiny tagged side
    per_bench = (
        tagged.join(
            F.broadcast(bench_grams.withColumnRenamed("k", "_bk")), "h"
        )
        .groupBy("_bk")
        .agg(
            F.count_distinct("h").alias("n_grams_hit"),
            F.count_distinct("k").alias("n_corpus_docs"),
        )
    )
    report = (
        totals.join(per_bench, totals["k"] == per_bench["_bk"], "left")
        .select(
            F.col("k").alias(bench_key),
            "n_grams",
            F.coalesce("n_grams_hit", F.lit(0)).alias("n_grams_hit"),
            (
                F.coalesce("n_grams_hit", F.lit(0))
                / F.greatest(F.col("n_grams"), F.lit(1))
            ).alias("hit_ratio"),
            F.coalesce("n_corpus_docs", F.lit(0)).alias("n_corpus_docs"),
        )
    )
    # gramless benchmark docs (< n words): present with zero counts
    gramless = (
        benchmark.select(F.col(bench_key)).distinct()
        .join(totals.select(F.col("k").alias(bench_key)), bench_key,
              "left_anti")
        .select(
            bench_key,
            F.lit(0).cast("long").alias("n_grams"),
            F.lit(0).cast("long").alias("n_grams_hit"),
            F.lit(0.0).alias("hit_ratio"),
            F.lit(0).cast("long").alias("n_corpus_docs"),
        )
    )
    return report.unionByName(gramless)
