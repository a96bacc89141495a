"""Data Selection with Importance Resampling (DSIR, Xie et al. 2023):
select raw-corpus documents whose hashed-n-gram distribution looks like a
TARGET corpus (e.g. curated wiki/books), by importance weighting in the
hashed feature space and Gumbel top-k resampling without replacement.

Pipeline shape (every stage a bounded aggregation or broadcast join —
nothing scales super-linearly in corpus size):

1. **Feature distributions**: one ``groupBy(bucket).count`` per corpus over
   hashed gram-bucket rows (classify.py's ``_gram_bucket_rows`` — the SAME
   tokenizer/hash family as the classifier and embedder, so nothing
   desynchronizes). Laplace-smoothed log-probabilities over the hashed
   vocabulary; each table is ≤ ``n_features`` rows (2^18 × ~16 B ≈ 4 MB —
   always broadcastable), regardless of corpus size.
2. **Per-doc log importance ratio**: ``log p_target(x) − log p_raw(x)``
   = Σ over the doc's gram occurrences of ``(logp_t − logp_r)[bucket]`` —
   a broadcast join of the merged weight table onto slim (doc, bucket)
   rows, then one per-doc sum (map-side combined). Identical plan shape to
   ``score_ngram_linear``; the raw corpus is TOKENIZED exactly once — the
   materialized (doc, bucket) rows feed both the raw distribution and the
   per-doc sums (the final weight join re-reads raw rows, not grams).
3. **Gumbel top-k resample**: keep the ``n`` docs maximizing
   ``log w_i + g_i`` with ``g_i`` standard Gumbel noise — the Gumbel-max
   trick makes this EXACTLY sampling without replacement proportional to
   ``w_i`` (Efraimidis & Spirakis 2006 in Gumbel form, as used by DSIR).
   The noise is deterministic: ``u_i`` comes from md5(salt ‖ key) (the
   sampler family in operators/sampling.py — engine-exact, rerun/resume/
   partitioning stable), so the selected set is reproducible and
   oracle-checkable. Selection is ``orderBy(desc).limit(n)`` →
   TakeOrderedAndProject, a per-partition top-n + driver merge, never a
   global sort.

Reference provenance: the reference engine has no corpus selection; this
is the LLM-data-pipeline layer (SURVEY §2), sibling to the NB quality
classifier (classify.py) which filters by a LABELED notion of quality —
DSIR instead matches an UNlabeled target distribution.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from final_ocr_spark.operators.classify import _gram_bucket_rows

# md5-derived uniform in (0, 1): 13 hex chars = 52 bits, the full double
# mantissa; +0.5 centers buckets so u is never exactly 0 or 1 and
# log(-log(u)) is always finite
_U_BITS = 52


def _gumbel(key_col: Column, salt: str) -> Column:
    """Deterministic standard-Gumbel noise g = −log(−log(u)),
    u = md5-uniform(salt ‖ key) — the hex prefix comes from the ONE
    oracle-critical md5 recipe (sampling.md5_hex_bucket; a second inline
    copy of those bytes could silently drift). Pure Column expression
    (conv parses the 13-char hex prefix), identical across engines with
    md5 + conv."""
    from final_ocr_spark.operators.sampling import md5_hex_bucket

    u = (
        F.conv(md5_hex_bucket(key_col, salt, 13), 16, 10).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << _U_BITS))
    return -F.log(-F.log(u))


def hashed_gram_logprobs(
    df: DataFrame,
    key: str = "url",
    text_col: str = "text",
    *,
    n_features: int = 1 << 18,
    word_ngrams: int = 2,
    alpha: float = 1.0,
) -> DataFrame:
    """(b, logp) — Laplace-smoothed log-probability of each hashed gram
    bucket under ``df``'s gram-occurrence distribution, for ALL buckets
    0..n_features−1 (absent buckets get the smoothing floor, materialized
    via a range frame so the consumer join never misses). One bounded
    aggregation over the corpus."""
    if word_ngrams not in (1, 2):
        raise ValueError(f"word_ngrams must be 1 or 2, got {word_ngrams}")
    grams = _gram_bucket_rows(df, key, text_col, n_features, word_ngrams)
    return _logprobs_from_gram_rows(
        df.sparkSession, grams, n_features=n_features, alpha=alpha
    )


def _logprobs_from_gram_rows(
    spark, grams: DataFrame, *, n_features: int, alpha: float
) -> DataFrame:
    """hashed_gram_logprobs over pre-computed (k, b) gram-bucket rows —
    lets importance_weights tokenize the raw corpus ONCE and derive both
    its distribution and the per-doc sums from the same materialized
    rows."""
    counts = grams.groupBy("b").agg(F.count(F.lit(1)).alias("_n"))
    total = counts.agg(F.sum("_n").alias("_t"))
    full = spark.range(n_features).select(F.col("id").alias("b"))
    a = F.lit(float(alpha))
    v = F.lit(float(alpha * n_features))
    return (
        full.join(counts, "b", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "b",
            F.log(
                (F.coalesce(F.col("_n"), F.lit(0)) + a)
                / (F.coalesce(F.col("_t"), F.lit(0)) + v)
            ).alias("logp"),
        )
    )


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    key: str = "url",
    text_col: str = "text",
    *,
    target_key: str | None = None,
    target_text_col: str | None = None,
    n_features: int = 1 << 18,
    word_ngrams: int = 2,
    alpha: float = 1.0,
    weight_col: str = "log_importance",
    gramless_weight: float | None = 0.0,
) -> DataFrame:
    """``raw`` with a ``weight_col`` column: the per-doc log importance
    ratio log p_target(x) − log p_raw(x) over hashed gram occurrences.
    Docs with NO grams get ``gramless_weight`` (default 0.0 — both
    distributions assign them the same empty product, so they are
    distribution-neutral; gate them separately), or are DROPPED when it is
    None. Note a typical real doc's log ratio is NEGATIVE in expectation
    (≈ −length·KL(raw‖target)), so 0.0 ranks a gramless doc ABOVE most
    real ones — which is why :func:`importance_resample` excludes them."""
    lp_t = hashed_gram_logprobs(
        target,
        target_key or key,
        target_text_col or text_col,
        n_features=n_features,
        word_ngrams=word_ngrams,
        alpha=alpha,
    ).select("b", F.col("logp").alias("_lt"))
    # tokenize/hash the raw corpus ONCE: the same materialized (k, b) rows
    # feed both the raw distribution and the per-doc sums (without the
    # barrier the dominant stage — tokenizing every raw doc — ran twice)
    raw_grams = _gram_bucket_rows(
        raw, key, text_col, n_features, word_ngrams
    ).localCheckpoint(eager=False)
    lp_r = _logprobs_from_gram_rows(
        raw.sparkSession, raw_grams, n_features=n_features, alpha=alpha
    ).select("b", F.col("logp").alias("_lr"))
    # merged (b, logratio) table: ≤ n_features rows, broadcastable
    ratio = lp_t.join(lp_r, "b").select(
        "b", (F.col("_lt") - F.col("_lr")).alias("_w")
    )
    doc_w = (
        raw_grams
        .join(F.broadcast(ratio), "b")
        .groupBy("k")
        .agg(F.sum("_w").alias(weight_col))
    )
    if gramless_weight is None:
        return raw.join(doc_w.withColumnRenamed("k", key), key)
    return raw.join(
        doc_w.withColumnRenamed("k", key), key, "left"
    ).withColumn(
        weight_col, F.coalesce(F.col(weight_col), F.lit(float(gramless_weight)))
    )


def importance_resample(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    key: str = "url",
    text_col: str = "text",
    *,
    salt: str = "dsir",
    temperature: float = 1.0,
    n_features: int = 1 << 18,
    word_ngrams: int = 2,
    alpha: float = 1.0,
) -> DataFrame:
    """The ``n`` raw docs selected by Gumbel top-k over the DSIR importance
    weights — exactly sampling without replacement ∝ w_i^(1/temperature),
    deterministic under ``salt``. Returns the raw rows plus the
    ``log_importance`` diagnostic column. ``temperature`` > 1 flattens the
    selection toward uniform (DSIR's guard against the selected set
    collapsing onto near-copies of the target).

    Gramless docs are EXCLUDED from the candidate set: their neutral
    weight 0.0 would rank them above almost every real document (real
    log ratios are negative in expectation), so a corpus with even 1%
    blank extractions would fill the selection with empty docs
    (review-caught)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    weighted = importance_weights(
        raw, target, key, text_col,
        n_features=n_features, word_ngrams=word_ngrams, alpha=alpha,
        gramless_weight=None,
    )
    scored = weighted.withColumn(
        "_gumbel_key",
        F.col("log_importance") / F.lit(float(temperature))
        + _gumbel(F.col(key), salt),
    )
    # TakeOrderedAndProject: per-partition top-n, never a global sort.
    # Key tiebreak keeps the set deterministic even on equal scores.
    return (
        scored.orderBy(F.col("_gumbel_key").desc(), F.col(key))
        .limit(n)
        .drop("_gumbel_key")
    )


def _py_gumbel(key_val: str, salt: str) -> float:
    """Pure-Python twin of :func:`_gumbel` for differential tests (md5 is
    engine-exact by construction)."""
    import hashlib

    h = hashlib.md5((salt + key_val).encode("utf-8")).hexdigest()
    u = (int(h[:13], 16) + 0.5) / float(1 << _U_BITS)
    return -math.log(-math.log(u))
