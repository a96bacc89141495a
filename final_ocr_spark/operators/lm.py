"""Bigram language-model scoring for perplexity-style quality filtering.

The CCNet recipe (Wenzek et al. 2020) ranks web documents by the perplexity
of a language model trained on a trusted reference corpus (Wikipedia) and
keeps the low-perplexity band. This module is that step as two DataFrame
shapes, using Stupid Backoff (Brants et al. 2007) — the smoothing designed
for exactly this distributed-counts setting: no discount bookkeeping, just
raw counts and a fixed backoff factor, which is why it scales to web-corpus
LMs where Kneser-Ney bookkeeping does not.

* ``train_bigram_lm`` — unigram + bigram counts over the reference corpus,
  keyed by xxhash64 of the gram (collisions merge two counts — the usual
  hashed-LM tradeoff, negligible at 64 bits). Two aggregations with
  map-side combine; output rows are bounded by the reference vocabulary,
  not the corpus.
* ``score_bigram_lm`` — per-document mean log-score: for each adjacent
  token pair,   S(w|v) = C(vw)/C(v)  if the bigram was seen, else
  α·S(w) with S(w) = (C(w)+1)/(N+V) (add-one so unseen words stay finite).
  Documents gain a ``lm_logprob`` (mean per transition, natural log) and
  ``lm_ppl`` (exp(−logprob)) column; filter on a band of ``lm_ppl``.

Scale shape: scoring explodes documents to slim (doc, v-hash, w-hash,
vw-hash) rows (one per token transition), LEFT-joins the LM count table
(broadcast when it fits — a 10M-gram LM is ~240 MB and usually splits into
a broadcast unigram side and a shuffled bigram side; both joins are plain
hash joins on 8-byte keys either way), then one per-doc aggregation.
Document text itself never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from final_ocr_spark.operators.dedup import sketch_words

# reserved hash slots (gram hashes are xxhash64 of non-empty strings; the
# probability of a real gram colliding with a chosen constant is 2^-64)
_TOTAL_ROW = -1  # n = total token count N
_VOCAB_ROW = -2  # n = distinct unigram count V


def _transition_rows(df: DataFrame, key: str, text_col: str) -> DataFrame:
    """(k, hv, hw, hvw) — one row per adjacent token pair, hashes of the
    previous token, current token, and the joined bigram. Same
    posexplode + window-lag shape (and single exchange) as the dedup
    sketches; the first token of a doc yields no row."""
    ex = df.select(
        F.col(key).alias("k"),
        F.posexplode(sketch_words(text_col)).alias("pos", "w"),
    )
    win = Window.partitionBy("k").orderBy("pos")
    ex = ex.withColumn("_prev", F.lag("w", 1).over(win)).filter(
        F.col("_prev").isNotNull()
    )
    return ex.select(
        "k",
        F.xxhash64("_prev").alias("hv"),
        F.xxhash64("w").alias("hw"),
        F.xxhash64(F.concat(F.col("_prev"), F.lit("␟"), F.col("w"))).alias("hvw"),
    )


def train_bigram_lm(
    ref: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Count table ``(h, n, is_bigram)`` from a trusted reference corpus:
    unigram rows (h = xxhash64(token)), bigram rows (h = xxhash64(v␟w),
    is_bigram = true), plus the reserved totals rows ``h = -1`` (N, token
    count) and ``h = -2`` (V, distinct unigrams). Ready for
    :func:`score_bigram_lm`; persist it next to the corpus and reuse."""
    toks = ref.select(
        F.col(key).alias("k"), F.posexplode(sketch_words(text_col)).alias("pos", "w")
    )
    uni = toks.groupBy(F.xxhash64("w").alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    win = Window.partitionBy("k").orderBy("pos")
    big = (
        toks.withColumn("_prev", F.lag("w", 1).over(win))
        .filter(F.col("_prev").isNotNull())
        .groupBy(
            F.xxhash64(F.concat(F.col("_prev"), F.lit("␟"), F.col("w"))).alias("h")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = uni.agg(
        F.sum("n").alias("_n"), F.count(F.lit(1)).alias("_v")
    ).select(
        F.explode(
            F.array(
                F.struct(F.lit(_TOTAL_ROW).cast("bigint").alias("h"), F.col("_n").alias("n")),
                F.struct(F.lit(_VOCAB_ROW).cast("bigint").alias("h"), F.col("_v").alias("n")),
            )
        ).alias("t")
    ).select("t.h", "t.n")
    return (
        uni.withColumn("is_bigram", F.lit(False))
        .unionByName(big.withColumn("is_bigram", F.lit(True)))
        .unionByName(totals.withColumn("is_bigram", F.lit(False)))
    )


def score_bigram_lm(
    df: DataFrame,
    lm: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
    broadcast_lm: bool = True,
    logprob_col: str = "lm_logprob",
    ppl_col: str = "lm_ppl",
) -> DataFrame:
    """Score every document against a :func:`train_bigram_lm` table:
    mean Stupid-Backoff log-score per token transition (natural log) and
    its exp(−·) pseudo-perplexity. Returns ``df`` + the two columns.

    Documents with fewer than 2 tokens have no transitions: they score
    null in both columns (the caller decides their fate — CCNet drops
    them; a silent 0.0 would rank them as perfect English).

    ``broadcast_lm=False`` switches the count joins to shuffle hash joins
    for LMs too large to broadcast; the plan is otherwise identical."""
    meta = {r.h: r.n for r in lm.filter(F.col("h").isin(_TOTAL_ROW, _VOCAB_ROW)).collect()}
    if _TOTAL_ROW not in meta or _VOCAB_ROW not in meta:
        raise ValueError("lm table lacks the reserved totals rows; build it with train_bigram_lm")
    n_total = float(meta[_TOTAL_ROW])
    vocab = float(meta[_VOCAB_ROW])

    # NB: gram hashes are SIGNED xxhash64 — half the vocabulary is negative,
    # so exclude exactly the reserved rows, never "h >= 0"
    uni = lm.filter(
        (~F.col("is_bigram")) & (~F.col("h").isin(_TOTAL_ROW, _VOCAB_ROW))
    ).select("h", "n")
    big = lm.filter(F.col("is_bigram")).select("h", "n")
    if broadcast_lm:
        uni, big = F.broadcast(uni), F.broadcast(big)

    t = _transition_rows(df, key, text_col)
    t = (
        t.join(big.select(F.col("h").alias("hvw"), F.col("n").alias("c_vw")), "hvw", "left")
        .join(uni.select(F.col("h").alias("hv"), F.col("n").alias("c_v")), "hv", "left")
        .join(uni.select(F.col("h").alias("hw"), F.col("n").alias("c_w")), "hw", "left")
    )
    backoff = F.log(
        F.lit(float(alpha))
        * (F.coalesce("c_w", F.lit(0)) + F.lit(1.0))
        / F.lit(n_total + vocab)
    )
    # seen bigram ⇒ its prefix unigram was counted too (same corpus), so
    # c_v is non-null whenever c_vw is
    score = F.when(
        F.col("c_vw").isNotNull(), F.log(F.col("c_vw") / F.col("c_v"))
    ).otherwise(backoff)
    per_doc = t.groupBy("k").agg(F.avg(score).alias(logprob_col))
    return (
        df.join(per_doc, df[key] == per_doc["k"], "left")
        .drop("k")
        .withColumn(ppl_col, F.exp(-F.col(logprob_col)))
    )


def merge_bigram_lm(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two :func:`train_bigram_lm` count tables into one — the
    incremental-training shape: count tables are additive (the whole point
    of Stupid Backoff's count-only smoothing), so growing the reference LM
    with a new corpus slice is a union + sum, never a re-train over the
    combined corpus.

    Gram rows and the token-total row (h = −1) sum directly; the vocabulary
    row (h = −2) must NOT (the slices share words) — it is recomputed as
    the merged distinct-unigram count, which the merged table already
    materializes as its unigram row count. Identical plan shape to the
    build: one group-by with map-side combine."""
    merged = (
        a.unionByName(b)
        .groupBy("h", "is_bigram")
        .agg(F.sum("n").alias("n"))
        .select("h", "n", "is_bigram")
    )
    grams = merged.filter(F.col("h") != _VOCAB_ROW)
    v = (
        merged.filter((~F.col("is_bigram")) & (F.col("h") != _TOTAL_ROW) & (F.col("h") != _VOCAB_ROW))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit(_VOCAB_ROW).cast("bigint").alias("h"),
            "n",
            F.lit(False).alias("is_bigram"),
        )
    )
    return grams.unionByName(v)


def perplexity_buckets(
    df: DataFrame,
    key: str = "url",
    ppl_col: str = "lm_ppl",
    by: str = "lang",
    fractions: tuple[float, float] = (1 / 3, 1 / 3),
    mode: str = "approx",
    bucket_col: str = "lm_bucket",
) -> DataFrame:
    """CCNet head/middle/tail banding (Wenzek et al. 2020 §4.3): within each
    language, the lowest-perplexity ``fractions[0]`` of documents are
    'head', the next ``fractions[1]`` 'middle', the rest 'tail' — the
    standard quality tiers a training mixture samples from (CCNet ships
    head+middle by default). Null-``ppl_col`` rows (docs too short to
    score) get a null bucket and are the caller's policy decision.

    Two modes, one semantics:

    * ``mode="approx"`` (default, the 10^12-doc path): per-language cutoffs
      via ``percentile_approx`` — ONE slim aggregation over (lang, ppl)
      with map-side combine, cutoff table is O(#languages) and broadcast
      back. No per-language global sort; accuracy is the sketch's rank
      error (1e-4 relative rank by default), which only ever reassigns
      documents within epsilon of a band edge.
    * ``mode="rank"`` (exact, the oracle mode): integer cross-multiplied
      row-rank test over a per-language window — deterministic tiebreak on
      (ppl, key) and engine-exact against a DuckDB oracle, at the cost of
      one sort per language partition (fine below ~10^8 docs/language;
      the approx mode exists because this window serializes per language).
    """
    if mode not in ("approx", "rank"):
        raise ValueError(f"mode must be 'approx' or 'rank', got {mode!r}")
    f1, f2 = fractions
    if not (0 < f1 and 0 < f2 and f1 + f2 < 1):
        raise ValueError(f"fractions must be positive with sum < 1, got {fractions}")
    scored = df.filter(F.col(ppl_col).isNotNull())
    if mode == "approx":
        cuts = scored.groupBy(by).agg(
            F.percentile_approx(ppl_col, f1, 10000).alias("_c1"),
            F.percentile_approx(ppl_col, f1 + f2, 10000).alias("_c2"),
        ).withColumnRenamed(by, "_by")
        # null-SAFE group join: a null language is a real group (groupBy
        # already produced its cuts row) — plain equi-join would miss it and
        # mislabel every null-lang doc 'tail' regardless of perplexity
        out = df.join(
            F.broadcast(cuts), F.col(by).eqNullSafe(F.col("_by")), "left"
        ).withColumn(
            bucket_col,
            F.when(F.col(ppl_col).isNull(), F.lit(None).cast("string"))
            .when(F.col(ppl_col) <= F.col("_c1"), F.lit("head"))
            .when(F.col(ppl_col) <= F.col("_c2"), F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
        return out.drop("_by", "_c1", "_c2")
    ppm1 = int(round(f1 * 1_000_000))
    ppm12 = int(round((f1 + f2) * 1_000_000))
    w = Window.partitionBy(by).orderBy(ppl_col, key)
    ranked = scored.withColumn("_r", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy(by))
    )
    bucketed = ranked.withColumn(
        bucket_col,
        F.when(F.col("_r") * 1_000_000 <= F.lit(ppm1) * F.col("_n"), F.lit("head"))
        .when(F.col("_r") * 1_000_000 <= F.lit(ppm12) * F.col("_n"), F.lit("middle"))
        .otherwise(F.lit("tail")),
    ).drop("_r", "_n")
    nulls = df.filter(F.col(ppl_col).isNull()).withColumn(
        bucket_col, F.lit(None).cast("string")
    )
    return bucketed.unionByName(nulls)
