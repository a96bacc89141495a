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
