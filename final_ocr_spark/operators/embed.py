"""Deterministic hashed-projection document embedder (text → array<float>).

The embedding family (semantic_dedup, ANN index/search, embedding_near_dups)
consumes caller-supplied vectors; real deployments bring a trained model.
This module supplies the deterministic, dependency-free stand-in that makes
those pipelines runnable text-in end-to-end: the feature-hashing trick
(Weinberger et al. 2009) projected straight into a dense ``dim``-slot
vector with a sign hash — the classic "hashed bag-of-n-grams random
projection" baseline. Same-text documents embed identically across runs,
sessions, and cluster sizes (no RNG, no model file), which is exactly what
the dedup/ANN tests need.

Construction, per document::

    v[j] = Σ_{gram g: idx(g)=j} sign(g)        (then L2-normalized)
    idx(g)  = pmod(xxhash64(g), dim)
    sign(g) = ±1 from an INDEPENDENT hash (xxhash64('±', g) sign bit)

The independent sign hash is what makes the projection unbiased
(E[v·w] ∝ |grams(a) ∩ grams(b)| — Weinberger's Lemma 2); reusing the index
hash's bits would correlate sign with slot. Tokenization and gram building
are shared with the NB classifier (one canonical tokenizer:
``dedup.sketch_words``), so classifier features, dedup shingles, and
embeddings can never silently desynchronize.

Scale shape (the reason this is a composition of aggregations, not a UDF):
grams explode to slim ``(key, slot, sign)`` rows that PARTIALLY AGGREGATE
map-side — the shuffle carries at most ``dim`` rows per document regardless
of document length, and the per-key dense assembly is an O(dim) array pass
(HOFs are interpreted, fine for one short pass; the per-gram work all
happens in codegen before the exchange — the explode→agg discipline from
the pitfalls ledger, never per-element HOF folds). No Python anywhere.

Reference provenance: the reference engine has no embedder (its OCR flow is
lexical end-to-end); this operator exists for the LLM-data-pipeline layer
(SURVEY §2 similarity/semantic-dedup family, VERDICT r3 Missing #4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from final_ocr_spark.operators.classify import _gram_rows


def embed_hashed_ngrams(
    df: DataFrame,
    key: str = "url",
    text_col: str = "text",
    *,
    dim: int = 128,
    word_ngrams: int = 2,
    normalize: bool = True,
    out_col: str = "embedding",
) -> DataFrame:
    """(key, embedding array<float>) — deterministic hashed-n-gram
    projection of ``text_col`` into ``dim`` slots (see module docstring).

    Documents with NO grams (empty/whitespace/punctuation-only text) get a
    NULL embedding rather than a silent zero vector — a zero vector has no
    direction, so cosine against it is undefined and downstream operators
    (semantic_dedup, ANN) must see the absence loudly. The same rule covers
    the sign-cancellation corner: with ``word_ngrams=1`` a document whose
    gram signs sum to zero in every slot (probability ≈ 1/(2·dim) for a
    2-distinct-word doc) produces a zero vector, and dividing by its zero
    norm would abort the whole job under ANSI mode (Spark 4 default) — such
    docs also embed as NULL instead. (``word_ngrams=2`` cannot hit this: a
    doc with w words contributes 2w−1 gram occurrences, an odd count, so at
    least one slot is nonzero.) Occurrence COUNTS
    are used (not the gram set): repeating a gram moves the vector, as in
    any bag-of-words projection.

    With ``normalize=True`` (default) vectors are unit-L2, ready for the
    cosine-based family. ``dim`` must be in [8, 4096] — below 8 everything
    collides, above 4096 the dense assembly pass stops being "short array".
    """
    if not 8 <= dim <= 4096:
        raise ValueError(f"dim must be in [8, 4096], got {dim}")
    if word_ngrams not in (1, 2):
        raise ValueError(f"word_ngrams must be 1 or 2, got {word_ngrams}")

    grams = _gram_rows(df, key, text_col, word_ngrams)
    # codegen side: slot + independent sign hash per gram OCCURRENCE;
    # partial aggregation collapses to ≤dim rows per key before the shuffle
    slots = grams.select(
        "k",
        F.pmod(F.xxhash64("g"), F.lit(dim)).alias("_slot"),
        F.when(F.xxhash64(F.lit("±"), F.col("g")) < 0, F.lit(-1.0))
        .otherwise(F.lit(1.0))
        .alias("_sign"),
    ).groupBy("k", "_slot").agg(F.sum("_sign").alias("_v"))

    # dense assembly: ≤dim (slot, v) entries per key → map → O(dim) fill
    dense = (
        slots.groupBy("k")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("_slot", "_v"))
            ).alias("_m")
        )
        .select(
            "k",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(F.col("_m")[i], F.lit(0.0)),
            ).alias("_dense"),
        )
    )
    if normalize:
        # _dense is a REAL column (own select above) — referencing it inside
        # the aggregate lambda is safe; an inline transform-in-aggregate
        # composition would re-evaluate per element (no CSE in HOF lambdas)
        dense = dense.select(
            "k",
            F.sqrt(
                F.aggregate(
                    "_dense", F.lit(0.0), lambda acc, x: acc + x * x
                )
            ).alias("_norm"),
            "_dense",
        ).select(
            "k",
            # zero norm ⇒ NULL embedding (see docstring) — the guard also
            # keeps ANSI mode from raising DIVIDE_BY_ZERO mid-job
            F.when(
                F.col("_norm") > 0,
                F.transform("_dense", lambda x: x / F.col("_norm")),
            ).alias("_dense"),
        )
    else:
        # the zero-vector → NULL contract is unconditional (docstring):
        # an unnormalized sign-cancelled doc still has no direction, and
        # downstream cosine would divide by its zero norm (ANSI abort)
        dense = dense.select(
            "k",
            F.when(
                F.exists("_dense", lambda x: x != 0), F.col("_dense")
            ).alias("_dense"),
        )
    emb = dense.select(
        F.col("k").alias(key),
        F.col("_dense").cast("array<float>").alias(out_col),
    )
    # gramless docs: explicit NULL embedding (left join keeps every key)
    return df.select(key).distinct().join(emb, key, "left")
