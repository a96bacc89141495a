"""Scale evidence for the tokenize-and-pack family (BENCH/PACK.md).

Times the three stages over the documents table at a given sf dir —
BPE train (one word-frequency agg + driver merge loop), tokenize_and_pack
(vocab agg + encode + pack), and the chunk materialization action — so a
10× pair (sf0.1 vs generated sf1.0) shows whether any stage grows
super-linearly. Run on a QUIET box; fresh JVM per invocation.

Usage:
    python BENCH/pack_bench.py [sf_dir] [cpus]
prints one JSON line.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from final_ocr_spark.session import get_spark
    from final_ocr_spark.operators.bpe import train_bpe
    from final_ocr_spark.operators.packing import tokenize_and_pack

    spark = get_spark(
        master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8),
        app_name="pack-bench",
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()

    t0 = time.perf_counter()
    merges = train_bpe(docs, n_merges=500)
    n_merges = merges.count()
    t_train = time.perf_counter() - t0

    t0 = time.perf_counter()
    chunks, vocab = tokenize_and_pack(
        docs, merges, 512, order_col="doc_id", pad=True
    )
    n_chunks = chunks.count()
    t_pack = time.perf_counter() - t0
    toks = chunks.selectExpr("sum(n_tokens) s").collect()[0]["s"]

    print(json.dumps({
        "sf_dir": sf_dir, "cpus": cpus, "docs": n_docs,
        "merges": n_merges, "chunks": n_chunks, "tokens": int(toks),
        "train_sec": round(t_train, 3), "pack_sec": round(t_pack, 3),
        "tokens_per_sec_pack": round(toks / t_pack, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
