"""Duplicate-span removal: exact-substring dedup inside documents.

Document-level dedup (exact or MinHash) drops whole near-identical pages;
it never touches a long passage duplicated INSIDE otherwise-unique pages —
syndicated article bodies, quoted licenses, templated product blurbs.
"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
ACL 2022) showed removing every duplicated substring of >= 50 tokens
measurably improves LMs; their single-machine tool builds a suffix array
over the whole corpus, which has no distributed analog at 10^12 documents.

This operator is the standard cluster-scale approximation: a duplicated
substring of length >= gram_n tokens necessarily duplicates every one of
its token gram_n-grams, so marking all non-first occurrences of any
REPEATED gram and deleting the tokens they cover removes exactly the
maximal duplicated regions (to gram granularity) while keeping the first
occurrence in (key, position) order — the same keep-first convention as
``paragraph_dedup``/``dedup_exact``. Tokens are whitespace-split and
case-preserving (EXACT substring semantics — no sketch normalization).

Scale shape (the ``paragraph_dedup`` recipe, one level finer):

1. one exchange total for gram building: ``shingle_hash_rows`` explodes
   slim ``(key, pos, xxhash64(token))`` rows and window-lags k adjacent
   hashes into gram hashes — token strings are pruned before anything
   shuffles;
2. ``groupBy(gram_hash)`` -> (first owner, count) with map-side partial
   aggregation; only repeated grams survive the filter, so the join back
   is proportional to DUPLICATED content, not the corpus;
3. marked grams expand to covered token indices (``sequence`` +
   ``explode`` — gram_n rows per marked gram, still duplicate-proportional)
   and aggregate to one ``(key, kill_indices)`` row per affected document;
4. one left join on the pipeline's existing key partitioning (AQE
   broadcasts the kill table when small) and a single index-filter
   expression rebuilds affected documents in place. Unaffected documents
   pass through byte-identical; affected documents are rebuilt from their
   surviving tokens joined by single spaces (whitespace runs inside
   affected docs normalize — token-stream semantics, documented contract).

64-bit gram-hash collisions (~n^2/2^65) can merge two distinct grams —
the same accepted tradeoff as ``dedup_exact``/``paragraph_dedup``; the
tests' DuckDB oracle groups on the gram STRING, so a collision would fail
loudly there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from final_ocr_spark.operators.dedup import shingle_hash_rows


def ws_tokens(text_col):
    """Column expr: case/whitespace-run-preserving token array — split on
    whitespace runs, empties dropped (leading/trailing whitespace yields
    empty fragments). The EXACT-match tokenizer: no lowercasing, no
    punctuation folding — 'The' != 'the'. DuckDB mirror:
    ``list_filter(string_split_regex(text, '\\s+'), w -> w != '')``."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(col, r"\s+"), lambda w: w != "")


def duplicate_span_dedup(
    df: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    gram_n: int = 50,
) -> DataFrame:
    """Remove every non-first occurrence of any duplicated >= gram_n-token
    span across the corpus (Lee et al. 2022 semantics, gram approximation).

    Returns ``df`` with ``text_col`` rewritten for affected documents and an
    ``n_tokens_dropped`` count column. Documents shorter than ``gram_n``
    tokens have no grams and always pass through unchanged (spans below the
    threshold are out of scope by definition). The first occurrence of a
    duplicated span — smallest (key, position) — is always kept.
    """
    if gram_n < 2:
        raise ValueError(f"gram_n must be >= 2, got {gram_n}")
    toks = ws_tokens(text_col)
    # (k, pos, h): one row per token gram, pos = index of the gram's LAST
    # token; shares the sketch family's one-exchange explode+lag plan but
    # with the exact-match tokenizer
    grams = shingle_hash_rows(
        df, key=key, text_col=text_col, shingle_k=gram_n, with_pos=True, words=toks
    )
    owners = grams.groupBy("h").agg(
        F.min(F.struct("k", "pos")).alias("_first"),
        F.count(F.lit(1)).alias("_n"),
    )
    marked = grams.join(owners.filter(F.col("_n") > 1), "h").filter(
        F.struct("k", "pos") != F.col("_first")
    )
    # covered token indices [pos-gram_n+1, pos]; overlapping marked grams
    # from one duplicated region collapse in the collect_set
    covered = marked.select(
        "k",
        F.explode(
            F.sequence(F.col("pos") - F.lit(gram_n - 1), F.col("pos"))
        ).alias("_ki"),
    )
    kill = covered.groupBy(F.col("k").alias(key)).agg(
        F.sort_array(F.collect_set("_ki")).alias("_kill")
    )
    rebuilt = F.array_join(
        F.filter(toks, lambda w, i: ~F.array_contains(F.col("_kill"), i)), " "
    )
    return (
        df.join(kill, key, "left")
        .withColumn(
            text_col,
            F.when(F.col("_kill").isNull(), F.col(text_col)).otherwise(rebuilt),
        )
        .withColumn(
            "n_tokens_dropped",
            # size(NULL) is -1 under legacy sizeOfNull — branch, don't coalesce
            F.when(F.col("_kill").isNull(), F.lit(0)).otherwise(F.size("_kill")),
        )
        .drop("_kill")
    )
