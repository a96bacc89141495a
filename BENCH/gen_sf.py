"""Deterministic 10× scale-up of the /root/testdata tables → sf1.0 bench dir.

The driver only ships sf ≤ 0.1; VERDICT r3 (Next-round #2) asks for bench
evidence at 10× to catch super-linear surprises (q19 candidate growth, q2
join). /root/testdata is read-only, so this synthesizes sf1.0 into /tmp from
sf0.1 with a DISTRIBUTION-PRESERVING replication — not naive copying, which
would plant pathological workloads:

* naive 10× doc copies would make every document a 10-member exact-dup
  cluster (candidate pairs grow 45× per cluster, a different WORKLOAD, not a
  bigger one). Instead each replica r>0 rewrites every 7th word to a
  replica-specific token: with 5-word shingles nearly every shingle of a
  replica differs from every other replica's (cross-replica Jaccard ≈ 0),
  while WITHIN a replica the mutation is a pure function of (replica,
  position) — so the planted near-dup structure (q19's every-40th-doc
  truncated copies, applied later at query time) is preserved per replica
  and the pair count scales exactly ×10. doc_id offset is 10^7·r: divisible
  by 40 (the q19 planting modulus) and far above the +10^6 mutation-id
  offset, so no id collisions and an identical planting RATE.
* embeddings replicate by cyclically rotating components r positions:
  within-replica pairwise geometry is EXACTLY preserved (both sides rotate
  identically ⇒ same dot products), cross-replica similarities scramble —
  top-k structure scales ×10 without creating 10 exact copies of every
  vector.
* lineitem/orders/events offset their keys by 10^7·r: per-key group sizes
  and join fan-outs stay identical, key cardinality ×10 — the shape a 10×
  corpus actually has. Low-cardinality group-by columns (returnflag,
  status, event_type) intentionally keep their cardinality, as they would.

All columns are pure Column expressions of (original row, replica) — no
RNG, no Python rows — so the output is bit-deterministic and generation
runs at scan speed.

Usage:
    python BENCH/gen_sf.py [factor] [src_dir] [out_dir]
    # defaults: 10 /root/testdata/sf0.1 /tmp/final_ocr_spark_sf1.0
then:
    SPARK_GRAFT_SF_DIR=/tmp/final_ocr_spark_sf1.0 python bench.py
"""

from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OFF = 10_000_000  # per-replica key offset; % 40 == 0 (q19 planting modulus)
                  # and >> the +1e6 mutated-doc id offset


def _replicas(spark, factor):
    from pyspark.sql import functions as F  # noqa: F401

    return spark.range(factor).select(F.col("id").cast("int").alias("_r"))


def scale_tables(spark, src: str, out: str, factor: int) -> None:
    from pyspark.sql import functions as F

    reps = _replicas(spark, factor)

    def off(col):  # bigint key offset
        return (F.col(col) + F.col("_r").cast("bigint") * F.lit(OFF)).alias(col)

    def write(df, name, n_files):
        df.repartition(n_files).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )

    li = spark.read.parquet(f"{src}/lineitem.parquet")
    write(
        li.crossJoin(reps).select(
            off("l_orderkey"), off("l_partkey"), off("l_suppkey"),
            *[c for c in li.columns
              if c not in ("l_orderkey", "l_partkey", "l_suppkey")],
        ),
        "lineitem", 64,
    )

    o = spark.read.parquet(f"{src}/orders.parquet")
    write(
        o.crossJoin(reps).select(
            off("o_orderkey"), off("o_custkey"),
            *[c for c in o.columns if c not in ("o_orderkey", "o_custkey")],
        ),
        "orders", 32,
    )

    ev = spark.read.parquet(f"{src}/events.parquet")
    write(
        ev.crossJoin(reps).select(
            off("event_id"),
            *[c for c in ev.columns if c not in ("event_id", "user_id")],
            off("user_id"),
        ).select(*ev.columns),
        "events", 32,
    )

    d = spark.read.parquet(f"{src}/documents.parquet")
    # replica r>0: every 7th word → token f(replica, position); replica 0 =
    # the original rows byte-identical
    words = F.split(F.col("text"), " ")
    mutated = F.array_join(
        F.zip_with(
            words,
            F.sequence(F.lit(0), F.greatest(F.size(words) - 1, F.lit(0))),
            lambda w, i: F.when(
                (F.col("_r") > 0) & (i % 7 == 0),
                F.concat(F.lit("zq"), F.col("_r").cast("string"),
                         F.lit("w"), i.cast("string")),
            ).otherwise(w),
        ),
        " ",
    )
    write(
        d.crossJoin(reps).select(
            off("doc_id"),
            mutated.alias("text"),
            "lang", "source",
        ).withColumn("n_chars", F.length("text")),
        "documents", 16,
    )

    e = spark.read.parquet(f"{src}/embeddings.parquet")
    dim = len(e.select("embedding").first()["embedding"])
    rot = F.when(F.col("_r") == 0, F.col("embedding")).otherwise(
        F.concat(
            F.slice(F.col("embedding"), F.col("_r") + 1, F.lit(dim) - F.col("_r")),
            F.slice(F.col("embedding"), F.lit(1), F.col("_r")),
        )
    )
    if factor > dim:
        raise ValueError(f"factor {factor} exceeds embedding dim {dim}")
    write(
        e.crossJoin(reps).select(
            off("vec_id"), rot.alias("embedding"), "label"
        ),
        "embeddings", 16,
    )

    # small dims copied verbatim (directory completeness; not scaled)
    for name in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(f"{src}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{name}.parquet")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (
        sys.argv[3] if len(sys.argv) > 3 else "/tmp/final_ocr_spark_sf1.0"
    )
    from final_ocr_spark.session import get_spark

    spark = get_spark(app_name="gen-sf", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    scale_tables(spark, src, out, factor)
    import json

    counts = {
        t: spark.read.parquet(f"{out}/{t}.parquet").count()
        for t in ("lineitem", "orders", "events", "documents", "embeddings")
    }
    print(json.dumps({"out": out, "factor": factor, "rows": counts}))
    spark.stop()


if __name__ == "__main__":
    main()
