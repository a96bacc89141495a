"""Count-min sketch over a token column: sublinear frequency estimates for
corpus-scale term statistics (the "how often does this phrase appear in
10^12 documents" query that exact counting answers only with a full
shuffle of every distinct term).

Design for oracle-exactness and scale:

* bucket = the first two hex chars of ``md5(seed || token)`` — a STRING
  key, so the same sketch is computable bit-for-bit in any engine with
  md5+substring (no integer hex parsing, no engine-specific hashes; same
  trick as operators/sampling.py). Width is fixed at 256 per depth row;
  estimate error is eps ≈ e/256 ≈ 1% of total mass per row, driven to
  ~min over ``depth`` independent rows.
* the build is explode → groupBy(depth_row, bucket) → count: ONE shuffle of
  at most depth×256 final rows regardless of corpus size (map-side partial
  aggregation collapses everything first) — the sketch never grows with
  the data, which is the point of a sketch.
* lookups are a broadcast join of the query terms' depth×bucket keys
  against the tiny sketch table, taking min over depth. CMS guarantees
  estimate >= true count (one-sided error), tested and oracle-checked.

The reference repo counts nothing corpus-wide; this is the corpus-stats
layer (vocabulary monitoring, stopword discovery, contamination triage)
its extraction output feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from final_ocr_spark.operators.sampling import md5_hex_bucket

WIDTH = 256  # buckets per depth row: 2 hex chars of md5


def _bucket(token, seed: str):
    return md5_hex_bucket(token, seed, 2)


def cms_build(
    df: DataFrame, token_col: str, depth: int = 4, seed: str = "cms"
) -> DataFrame:
    """(d, bucket, cnt): the count-min table for one token per input row
    (explode upstream for array columns). At most depth×256 output rows."""
    rows = []
    for d in range(depth):
        rows.append(
            df.select(
                F.lit(d).alias("d"),
                _bucket(F.col(token_col), f"{seed}:{d}").alias("bucket"),
            )
        )
    unioned = rows[0]
    for r in rows[1:]:
        unioned = unioned.unionByName(r)
    return unioned.groupBy("d", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def cms_lookup(
    cms: DataFrame, terms: DataFrame, term_col: str,
    depth: int = 4, seed: str = "cms",
) -> DataFrame:
    """terms + ``est_count``: the count-min estimate (min over depth rows;
    missing buckets count 0). The sketch side is tiny — broadcast."""
    keyed = None
    for d in range(depth):
        k = terms.select(
            F.col(term_col),
            F.lit(d).alias("d"),
            _bucket(F.col(term_col), f"{seed}:{d}").alias("bucket"),
        )
        keyed = k if keyed is None else keyed.unionByName(k)
    joined = keyed.join(F.broadcast(cms), ["d", "bucket"], "left")
    return (
        joined.groupBy(term_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est_count"))
    )
