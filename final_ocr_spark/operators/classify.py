"""Hashed n-gram linear text classifier (fastText-supervised-style).

Model-based quality/domain filtering is the step after heuristic scoring
(text_stats.quality_score) in a training-data pipeline: train a linear
model over hashed word n-grams on a small labeled set, then score the whole
corpus with it. Both halves here are pure DataFrame aggregation shapes:

* ``train_ngram_nb`` — closed-form Naive-Bayes log-odds weights per hashed
  feature: one (feature, label) count aggregation over the labeled set.
  No gradient loop, no driver-side iteration — the standard "NB-weighted
  bag of n-grams" baseline (Wang & Manning 2012's NBSVM observation: NB
  log-count ratios are a strong linear text classifier on their own).
* ``score_ngram_linear`` — corpus scoring: explode grams → pmod feature
  bucket → broadcast-join the (feature, weight) table → per-doc weight sum
  → sigmoid. One shuffle of slim (doc, bucket) rows on the doc key; the
  weight table is bounded by ``n_features`` (2^18 × ~16 B ≈ 4 MB — always
  broadcastable) regardless of corpus size, so the plan is identical at
  10^12 docs.

Feature hashing (Weinberger et al. 2009) bounds memory and makes the
feature space schema-free; unigrams + bigrams by default, matching the
fastText default. Hash family: xxhash64 of the gram string — the same
ANSI-safe bit-ops discipline as the dedup sketches (rotate/XOR shingle
combination reused via pmod bucketing only; no checked arithmetic).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from final_ocr_spark.operators.dedup import sketch_words


def _gram_rows(
    df: DataFrame,
    key: str,
    text_col: str,
    word_ngrams: int,
) -> DataFrame:
    """(k, g) — one row per word n-gram OCCURRENCE (n = 1..word_ngrams).
    Grams are built with the sketch tokenizer so classifier features,
    embeddings, and dedup shingles share one canonical tokenization. Stays
    in codegen: posexplode + lag windows — the same one-exchange shape as
    dedup.shingle_hash_rows. Shared by the NB classifier and the hashed
    document embedder (operators/embed.py)."""
    from pyspark.sql import Window

    ex = df.select(
        F.col(key).alias("k"),
        F.posexplode(sketch_words(text_col)).alias("pos", "w"),
    )
    w = Window.partitionBy("k").orderBy("pos")
    # n-gram string = words joined with a separator token; built via lag so
    # each occurrence is one row (counts matter for NB, unlike the sketches).
    # word_ngrams is capped at 2 (the fastText default) until a measured
    # need appears — loud guard in the public entry points.
    if word_ngrams >= 2:
        # window exprs and generators cannot share a projection — land the
        # bigram as a real column, then explode
        ex = ex.withColumn(
            "_bg", F.concat(F.lag("w", 1).over(w), F.lit("␟"), F.col("w"))
        )
        grams = F.array(F.col("w"), F.col("_bg"))
    else:
        grams = F.array(F.col("w"))
    return ex.select("k", F.explode(grams).alias("g")).filter(
        F.col("g").isNotNull()
    )


def _gram_bucket_rows(
    df: DataFrame,
    key: str,
    text_col: str,
    n_features: int,
    word_ngrams: int,
) -> DataFrame:
    """(k, b) — b = pmod(xxhash64(gram), n_features) per gram occurrence."""
    return _gram_rows(df, key, text_col, word_ngrams).select(
        "k", F.pmod(F.xxhash64("g"), F.lit(n_features)).alias("b")
    )


def train_ngram_nb(
    labeled: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = 1 << 18,
    word_ngrams: int = 2,
    alpha: float = 1.0,
) -> DataFrame:
    """Closed-form NB log-odds weights from a labeled set: returns a
    ``(b, weight)`` DataFrame plus a 1-row ``(b = -1, weight = bias)`` row
    carrying the class-prior log-odds, ready for
    :func:`score_ngram_linear`.

    weight(b) = log((pos_b + α)/(pos_tot + α·V)) − log((neg_b + α)/(neg_tot + α·V)),
    the multinomial-NB log-count ratio with Laplace smoothing over the
    HASHED vocabulary (V = n_features). One aggregation over (feature,
    label) — partial aggregation collapses gram occurrences map-side, so
    the shuffle is bounded by n_features × 2 rows per partition.

    ``label_col`` must be 0/1 (1 = positive). Raises on other values —
    silent coercion would invert a model."""
    if word_ngrams not in (1, 2):
        raise ValueError(f"word_ngrams must be 1 or 2, got {word_ngrams}")
    bad = labeled.filter(~F.col(label_col).isin(0, 1)).limit(1).count()
    if bad:
        raise ValueError(f"{label_col} must be 0/1")

    rows = _gram_bucket_rows(labeled, key, text_col, n_features, word_ngrams)
    rows = rows.join(
        F.broadcast(labeled.select(F.col(key).alias("k"), F.col(label_col).alias("_y"))),
        "k",
    )
    counts = rows.groupBy("b").agg(
        F.sum(F.col("_y")).alias("_pos"),
        F.sum(F.lit(1) - F.col("_y")).alias("_neg"),
    )
    tots = counts.agg(
        F.sum("_pos").alias("_pt"), F.sum("_neg").alias("_nt")
    )
    a = F.lit(float(alpha))
    v = F.lit(float(alpha * n_features))
    weights = counts.crossJoin(F.broadcast(tots)).select(
        "b",
        (
            F.log((F.col("_pos") + a) / (F.col("_pt") + v))
            - F.log((F.col("_neg") + a) / (F.col("_nt") + v))
        ).alias("weight"),
    )
    # class-prior bias rides the weight table as the reserved bucket -1
    # (gram buckets are pmod >= 0, so it can never collide)
    n_by_class = labeled.agg(
        F.sum(F.col(label_col)).alias("_p"),
        F.sum(F.lit(1) - F.col(label_col)).alias("_n"),
    )
    bias = n_by_class.select(
        F.lit(-1).cast("bigint").alias("b"),
        F.log((F.col("_p") + a) / (F.col("_n") + a)).alias("weight"),
    )
    return weights.unionByName(bias)


def score_ngram_linear(
    df: DataFrame,
    weights: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    n_features: int = 1 << 18,
    word_ngrams: int = 2,
    score_col: str = "score",
) -> DataFrame:
    """Score every document with a hashed-n-gram linear model: sigmoid of
    (bias + Σ weight[bucket(gram)]) — repeated grams count once per
    occurrence, the multinomial form matching :func:`train_ngram_nb`.

    ``weights``: (b, weight) as produced by the trainer (bucket -1 = bias);
    any linear model in that shape works (imported fastText weights, a
    logistic regression, hand-set rules). The join side is explicitly
    ``F.broadcast`` — bounded by n_features, never corpus-sized. Documents
    with zero grams (empty/punctuation-only text) get score = sigmoid(bias).

    Returns ``df`` with ``score_col`` added. n_features must match
    training — a mismatch silently rehashes into the wrong buckets, so pass
    the model's value explicitly at both sites."""
    if word_ngrams not in (1, 2):
        raise ValueError(f"word_ngrams must be 1 or 2, got {word_ngrams}")
    rows = _gram_bucket_rows(df, key, text_col, n_features, word_ngrams)
    scored = (
        rows.join(F.broadcast(weights), rows["b"] == weights["b"], "left")
        .groupBy("k")
        .agg(F.sum(F.coalesce("weight", F.lit(0.0))).alias("_s"))
    )
    # agg (not filter+select): always exactly one row, so the crossJoin
    # cannot annihilate the output when the model carries no bias row
    bias_df = weights.filter(F.col("b") == -1).agg(
        F.coalesce(F.sum("weight"), F.lit(0.0)).alias("_bias")
    )
    out = (
        df.join(scored, df[key] == scored["k"], "left")
        .crossJoin(F.broadcast(bias_df))
        .withColumn(
            score_col,
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(F.coalesce("_s", F.lit(0.0)) + F.col("_bias")))),
        )
        .drop("k", "_s", "_bias")
    )
    return out
