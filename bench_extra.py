"""Supplementary benchmarks (guide §1.4): noop-sink isolation and stage
breakdowns that bench.py (FROZEN for measurement) does not carry.

Usage: python bench_extra.py [probe ...]   (default: all probes)

Each probe prints its own timings; numbers are cited in OPTIMIZATION_r06.md.
Not part of the driver contract — bench.py stays the measured artifact.
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    from final_ocr_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="bench-extra", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em

    which = set(sys.argv[1:])

    def on(name: str) -> bool:
        return not which or name in which

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def t(name, fn, n=2):
        spark.sparkContext.setJobDescription(name)
        for i in range(n):
            t0 = time.monotonic()
            r = fn()
            dt = time.monotonic() - t0
            print(f"  {name} run{i}: {dt:.3f}s -> {r}", flush=True)
        spark.sparkContext.setJobDescription(None)

    # warm the JVM/python-worker pool the way bench.py does
    em._q1_rollup(spark, sf).count()

    if on("headline"):
        qs = em.queries()
        for name in ["q1_rollup", "q2_parent_child", "q3_dedup_latest",
                     "q15_token_quality", "q17_cosine_topk",
                     "q19_minhash_pairs", "q23_quality_profile",
                     "q25_batch_topk", "q39_gopher_repetition"]:
            t(f"count {name}", lambda name=name: qs[name](spark, sf).count())

    if on("noop39"):
        # q39 under a noop sink: full feature computation, not the
        # column-pruned count() plan
        t("noop q39", lambda: force(em._q39_gopher_repetition(spark, sf)))

    if on("q19"):
        from final_ocr_spark.operators.dedup import minhash_near_dups, minhash_sigs
        t("q19 sigs", lambda: minhash_sigs(
            em._mutated_corpus(spark, sf), key="doc_id", text_col="text",
            num_hashes=32, shingle_k=5).count())
        t("q19 cand", lambda: minhash_near_dups(
            em._mutated_corpus(spark, sf), key="doc_id", text_col="text",
            num_hashes=32, bands=8, jaccard_threshold=0.5).count())
        t("q19 full", lambda: em._verified_near_dup_pairs(
            em._mutated_corpus(spark, sf)).count())

    if on("kmeans"):
        import numpy as np
        from final_ocr_spark.operators.cluster import kmeans
        from final_ocr_spark.operators.similarity import semantic_dedup_kmeans
        emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet")).repartition(cpus)
        k = max(8, emb.count() // 64)
        t("kmeans 10 iters", lambda: kmeans(
            emb, k, key="vec_id", vec_col="embedding", max_iters=10,
            seed=0)[0].count())
        t("semantic_kmeans", lambda: semantic_dedup_kmeans(
            emb, k=k, threshold=0.97).count())
        # one-iteration body with fixed centroids: the per-iteration floor
        vec_rows = emb.select(
            F.col("vec_id").alias("k"),
            F.col("embedding").cast("array<double>").alias("_v"),
        ).filter(F.col("_v").isNotNull()).localCheckpoint()
        dim = len(vec_rows.first()["_v"])
        cents = np.zeros((k, dim)); cents[:, 0] = np.arange(k)

        def one_iter():
            c = cents.copy()
            cn2 = (c * c).sum(axis=1)

            @F.pandas_udf("int")
            def _argmin(v):
                import pandas as pd
                x = np.asarray(v.tolist(), dtype=np.float64)
                d = cn2 - 2.0 * (x @ c.T)
                return pd.Series(d.argmin(axis=1).astype("int32"))

            return len(
                vec_rows.withColumn("_c", _argmin("_v"))
                .select("_c", F.posexplode("_v").alias("_p", "_x"))
                .groupBy("_c", "_p")
                .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
                .collect()
            )
        t("kmeans one-iter body", one_iter, n=4)

    if on("pack"):
        from final_ocr_spark.operators.packing import pack_chunks
        words = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
        d_ids = (
            spark.read.parquet(os.path.join(sf, "documents.parquet"))
            .repartition(cpus)
            .select("doc_id", F.transform(words, lambda w: F.length(w)).alias("ids"))
        )
        t("pack_chunks", lambda: pack_chunks(
            d_ids, "doc_id", "ids", budget=1024, eos_id=0).count())

    if on("pipeline"):
        from final_ocr_spark.pipeline import corpus_pipeline
        from final_ocr_spark.sources.synthetic_pages import gen_pages
        fixed = pathlib.Path("/tmp/final_ocr_spark_bench/bench_6000_42.parquet")
        if not (fixed / "_SUCCESS").exists():
            gen_pages(spark, 6000, seed=42, partitions=cpus * 4) \
                .write.mode("overwrite").parquet(str(fixed))
        pages = spark.read.parquet(str(fixed))
        t("pipeline default", lambda: corpus_pipeline(pages).count())
        t("pipeline no-neardup", lambda: corpus_pipeline(pages, near_dup=False).count())
        t("pipeline extract+exact only", lambda: corpus_pipeline(
            pages, near_dup=False, gopher=False, redact=False,
            min_quality=0.0).count())

    if on("gen"):
        from final_ocr_spark.sources.synthetic_pages import gen_pages
        t("gen_pages 6000", lambda: gen_pages(
            spark, 6000, seed=42, partitions=cpus * 4).count())

    if on("extract"):
        from final_ocr_spark.operators.extract_pages import extract_pages
        from final_ocr_spark.sources.synthetic_pages import gen_pages
        corpus_dir = pathlib.Path("/tmp/final_ocr_spark_bench/bench_6000_42.parquet")
        if not (corpus_dir / "_SUCCESS").exists():
            gen_pages(spark, 6000, seed=42, partitions=cpus * 4) \
                .write.mode("overwrite").parquet(str(corpus_dir))
        t("extract scan", lambda: extract_pages(
            spark.read.parquet(str(corpus_dir)), dedup=True).count())
        t("extract inline-gen", lambda: extract_pages(
            gen_pages(spark, 6000, seed=42, partitions=cpus * 4), dedup=True).count())

    spark.stop()


if __name__ == "__main__":
    main()
