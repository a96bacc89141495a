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


def heavy_hitters(
    df: DataFrame, token_col: str, k: int = 20, counters: int = 2000,
) -> DataFrame:
    """Exact top-k heavy hitters WITHOUT shuffling the full vocabulary:
    Misra-Gries candidate generation + exact recount of candidates only.

    Pass 1 (candidates): each partition streams its tokens through a
    Misra-Gries summary of ``counters`` slots inside ``mapInPandas`` —
    bounded memory, no shuffle — emitting at most ``counters`` candidate
    rows per partition. The union of per-partition MG summaries is a
    valid MG summary of the whole stream, so ANY token with true count
    > n_tokens/counters is guaranteed present among candidates (standard
    MG guarantee); with counters ≫ k the true top-k are candidates for
    every realistic (Zipfian) term distribution, and the guarantee gives
    the exact threshold above which no hitter can be missed.

    Pass 2 (exact): the distinct candidate set (≤ counters×partitions
    rows, typically ≪ vocabulary) broadcast-semi-joins the token stream
    and only candidate tokens are counted exactly — the shuffle carries
    candidate tokens instead of the whole vocabulary. Output:
    (term, cnt, rank) — counts are EXACT for every returned term.

    This is the 100 TB shape for "top stopwords / hot phrases" where
    ``groupBy(term)`` would shuffle billions of distinct terms; the
    exact q46 vocab rollup remains the right tool at moderate
    vocabularies. Deterministic: MG contents depend on partition layout,
    but pass 2 recounts exactly and ties break on (cnt DESC, term ASC).
    """
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql import Window

    toks = df.select(F.col(token_col).alias("term")).filter(
        F.col("term").isNotNull() & (F.col("term") != "")
    )

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        slots: dict[str, int] = {}
        for pdf in batches:
            for t in pdf["term"]:
                if t in slots:
                    slots[t] += 1
                elif len(slots) < counters:
                    slots[t] = 1
                else:
                    # decrement-all step (the dict-sweep is amortized O(1)
                    # per token: each decrement cancels one prior increment)
                    dead = []
                    for kk in slots:
                        slots[kk] -= 1
                        if slots[kk] == 0:
                            dead.append(kk)
                    for kk in dead:
                        del slots[kk]
        yield pd.DataFrame({"term": list(slots.keys())})

    candidates = toks.mapInPandas(_mg, schema="term string").distinct()
    exact = (
        toks.join(F.broadcast(candidates), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("term"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
