"""BPE tokenizer training over a distributed corpus + encode/count UDFs.

A training-data engine that reports "token counts" needs a tokenizer, and
the industrially-correct way to TRAIN one over 100 TB is not to stream
text into the merge loop — it is the shape every production tokenizer
trainer uses (Sennrich et al. 2016's released recipe, SentencePiece's
word-count mode): the corpus reduces to a **word-frequency table** (one
map-side-combinable aggregation — the only part that touches the data),
and the merge loop runs over that bounded dictionary, with cost
independent of corpus size. Spark does the single heavy agg; the driver
does the dictionary-sized merge loop; the learned merges broadcast back
as a tiny table for encoding.

Pieces:

* :func:`word_frequencies` — (word, count) via the engine's canonical
  pre-tokenizer (digits and punctuation runs split off — the same rule
  text_stats.token_count applies), TakeOrdered-capped to ``max_words``
  (top-K by count, deterministic word tiebreak — never a global sort);
* :func:`train_bpe` — Sennrich merge loop with the indexed
  incremental-pair-count optimization (pair counts update only through
  words containing the merged pair; a full recount per merge would be
  O(|dict|·vocab));
* :func:`bpe_encode` / :func:`bpe_token_count` — Arrow-batched encode
  applying merges in rank order with a per-word memo (web text repeats
  words constantly; the memo makes encode ~O(distinct words) per batch).

End-of-word is modeled with a ``</w>`` sentinel symbol (the original BPE
formulation), so merges never cross word boundaries and detokenization is
exact: join token pieces, strip the sentinel.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_EOW = "</w>"

# the engine's canonical pre-tokenization (text_stats.token_count's rule):
# digit runs and punctuation runs become their own words. Java regex \w/\s
# are ASCII-only by default while Python's are Unicode — the (?U) flag on
# the Spark side aligns them (probed equal on Latin/Greek/CJK/Arabic;
# differential-pinned in tests with non-ASCII samples), otherwise training
# would learn merges over fragments the encoder never produces.
_PRETOK_RE = r"([0-9]+|[^\w\s]+)"          # Python re (Unicode by default)
_PRETOK_RE_SPARK = "(?U)" + _PRETOK_RE     # Java regex, Unicode classes
_SPLIT_RE_SPARK = r"(?U)\s+"


def pre_tokenize(text: str) -> list[str]:
    """Pure-Python twin of the Column-side pre-tokenizer (regexp split with
    digit/punct runs separated) — differential-tested against it."""
    import re

    return re.sub(_PRETOK_RE, r" \1 ", text).split()


def word_frequencies(
    corpus: DataFrame,
    text_col: str = "text",
    *,
    lowercase: bool = True,
    max_words: int = 1_000_000,
) -> DataFrame:
    """(word, count) over the corpus, capped to the ``max_words`` most
    frequent (count desc, word asc — deterministic). ONE partial/final
    aggregation; the cap is TakeOrdered (per-partition top-K, never a
    global sort). This is the only stage that reads the corpus."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    words = F.split(
        F.trim(F.regexp_replace(t, _PRETOK_RE_SPARK, r" $1 ")),
        _SPLIT_RE_SPARK,
    )
    freq = (
        corpus.select(F.explode(words).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    return freq.orderBy(F.desc("count"), F.asc("word")).limit(max_words)


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out = []
    i, n = 0, len(sym)
    ab = pair[0] + pair[1]
    while i < n:
        if i < n - 1 and sym[i] == pair[0] and sym[i + 1] == pair[1]:
            out.append(ab)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def learn_merges(
    word_counts: list[tuple[str, int]],
    n_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Sennrich BPE merge loop over a (word, count) dictionary — pure
    Python, deterministic (ties break on the lexicographically smallest
    pair), cost independent of corpus size. Indexed updates: a merge
    touches only the words that contain its pair."""
    words: list[tuple[str, ...]] = []
    counts: list[int] = []
    for w, c in word_counts:
        if not w:
            continue
        words.append(tuple(w) + (_EOW,))
        counts.append(int(c))

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for idx, (sym, c) in enumerate(zip(words, counts)):
        for a, b in zip(sym, sym[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
            pair_words.setdefault((a, b), set()).add(idx)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # argmax with lexicographic tiebreak — deterministic across runs
        top = max(pair_counts.values())
        if top < min_pair_count:
            break
        best_pair = min(p for p, c in pair_counts.items() if c == top)
        merges.append(best_pair)
        for idx in list(pair_words.get(best_pair, ())):
            sym, c = words[idx], counts[idx]
            new = _merge_word(sym, best_pair)
            if new == sym:
                continue
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] -= c
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(idx)
                    if not ws:
                        del pair_words[(a, b)]
            words[idx] = new
            for a, b in zip(new, new[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
                pair_words.setdefault((a, b), set()).add(idx)
    return merges


def train_bpe(
    corpus: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 8000,
    lowercase: bool = True,
    max_words: int = 1_000_000,
    min_pair_count: int = 2,
) -> DataFrame:
    """Corpus → merges table ``(rank, left, right)``. One aggregation over
    the data (word_frequencies), a bounded collect of the capped
    dictionary, the merge loop driver-side — the standard scalable recipe
    (module doc). The result is O(n_merges) rows: broadcast it."""
    wc = [
        (r["word"], r["count"])
        for r in word_frequencies(
            corpus, text_col, lowercase=lowercase, max_words=max_words
        ).collect()
    ]
    merges = learn_merges(wc, n_merges, min_pair_count=min_pair_count)
    spark = corpus.sparkSession
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word with rank-greedy merging (always apply the
    lowest-rank applicable merge first — exactly the order training
    created them)."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    text_col,
    merges: list[tuple[str, str]] | DataFrame,
    *,
    lowercase: bool = True,
) -> Column:
    """Column: text → array<string> of BPE tokens (``</w>``-terminated
    pieces). Arrow-batched with a per-word memo; merges ship to workers as
    a broadcast-sized rank dict."""
    if isinstance(merges, DataFrame):
        merges = [
            (r["left"], r["right"])
            for r in merges.orderBy("rank").collect()
        ]
    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def _enc(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        memo: dict[str, list[str]] = {}

        def one(v):
            if v is None:
                return None
            if lowercase:
                v = v.lower()
            out: list[str] = []
            for w in pre_tokenize(v):
                toks = memo.get(w)
                if toks is None:
                    toks = encode_word(w, ranks)
                    memo[w] = toks
                out.extend(toks)
            return out

        for s in it:
            yield s.map(one)

    col = text_col if isinstance(text_col, Column) else F.col(text_col)
    return _enc(col)


def bpe_token_count(text_col, merges, *, lowercase: bool = True) -> Column:
    """Column: token count under the trained tokenizer — the honest
    sequence-length number for packing/budgeting (whitespace counts
    undercount multilingual/rare text badly)."""
    return F.array_size(bpe_encode(text_col, merges, lowercase=lowercase))


def bpe_vocab(
    corpus: DataFrame,
    merges: list[tuple[str, str]] | DataFrame,
    text_col: str = "text",
    *,
    lowercase: bool = True,
    specials: tuple[str, ...] = (),
) -> DataFrame:
    """Corpus-derived token→id table ``(token string, id int)``.

    ``specials`` get ids ``0..len(specials)-1`` in the order given; every
    BPE piece the corpus actually produces follows, dense ids in token
    sort order (deterministic — no hash involved). The BPE piece set is
    CLOSED: at most |observed alphabet| + |merges| symbols regardless of
    corpus size, so the distinct aggregation shrinks the corpus to a
    dictionary-sized table and the single-task ``row_number`` sort that
    assigns ids is the same justified O(vocab) driver-adjacent work as the
    train_bpe merge loop (PLANS.md justified-collect shape).
    """
    from pyspark.sql.window import Window

    dup = [s for s in specials if specials.count(s) > 1]
    if dup:
        raise ValueError(f"duplicate specials: {sorted(set(dup))}")
    toks = (
        corpus.select(
            F.explode(
                bpe_encode(F.col(text_col), merges, lowercase=lowercase)
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("_n"))  # partial/final agg, then tiny
        .select("token")
    )
    spark = corpus.sparkSession
    if specials:
        sp = spark.createDataFrame(
            [(s, i) for i, s in enumerate(specials)], "token string, id int"
        )
        toks = toks.join(sp.select("token"), "token", "left_anti")
    ranked = toks.withColumn(
        "id",
        (
            F.row_number().over(Window.orderBy("token"))
            + F.lit(len(specials) - 1)
        ).cast("int"),
    )
    return sp.unionByName(ranked) if specials else ranked


def bpe_encode_ids(
    text_col,
    merges: list[tuple[str, str]] | DataFrame,
    vocab: DataFrame | dict[str, int],
    *,
    lowercase: bool = True,
    unk_id: int | None = None,
) -> Column:
    """Column: text → ``array<int>`` of vocabulary ids (the training-ready
    form of :func:`bpe_encode`). ``vocab`` is a (token, id) table from
    :func:`bpe_vocab` — dictionary-sized by construction, shipped to
    workers as a plain broadcast dict. Pieces outside the vocabulary map
    to ``unk_id``; with ``unk_id=None`` an unknown piece raises in the
    task (strict mode — right when encoding the same corpus the vocab came
    from, where an unknown means a pipeline bug, not new data)."""
    if isinstance(merges, DataFrame):
        merges = [
            (r["left"], r["right"])
            for r in merges.orderBy("rank").collect()
        ]
    ranks = {pair: i for i, pair in enumerate(merges)}
    if isinstance(vocab, DataFrame):
        vocab = {r["token"]: r["id"] for r in vocab.collect()}
    vmap = dict(vocab)

    @pandas_udf("array<int>")
    def _enc(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        memo: dict[str, list[int]] = {}

        def word_ids(w: str) -> list[int]:
            ids = memo.get(w)
            if ids is None:
                ids = []
                for piece in encode_word(w, ranks):
                    i = vmap.get(piece, unk_id)
                    if i is None:
                        raise ValueError(
                            f"BPE piece {piece!r} not in vocab and no "
                            f"unk_id set"
                        )
                    ids.append(i)
                memo[w] = ids
            return ids

        def one(v):
            if v is None:
                return None
            if lowercase:
                v = v.lower()
            out: list[int] = []
            for w in pre_tokenize(v):
                out.extend(word_ids(w))
            return out

        for s in it:
            yield s.map(one)

    col = text_col if isinstance(text_col, Column) else F.col(text_col)
    return _enc(col)


def bpe_decode(tokens_col) -> Column:
    """Column: array of BPE pieces → the pre-tokenized text (words joined
    with single spaces). Exact inverse of :func:`bpe_encode` up to the
    canonical pre-tokenization (lowercasing and digit/punct-run spacing are
    one-way — decode returns the pre-tokenizer's view, the round-trip
    contract the module docstring pins). Pure codegen: join pieces, turn
    each end-of-word sentinel into a space, trim the trailing one."""
    col = tokens_col if isinstance(tokens_col, Column) else F.col(tokens_col)
    return F.trim(
        F.regexp_replace(
            F.array_join(col, ""), F.lit(_EOW), F.lit(" ")
        )
    )


def bpe_decode_ids(
    ids_col,
    vocab: DataFrame | dict[str, int],
    *,
    specials: tuple[str, ...] = ("<pad>", "<eos>", "<unk>"),
) -> Column:
    """Column: array<int> of vocabulary ids → pre-tokenized text (the
    inverse of :func:`bpe_encode_ids`). The dictionary-sized vocab ships as
    a broadcast id→token dict; ``specials`` names the EXACT special tokens
    to drop (defaults match :func:`bpe_vocab`'s in tokenize_and_pack), so
    decoding a packed chunk yields its documents' text with <eos>/<pad>
    removed. Exact-match only — a shape heuristic like startswith('<')
    would silently delete legitimate merged punctuation pieces such as
    '<</w>' from corpora where '<' is a frequent word (review-caught)."""
    if isinstance(vocab, DataFrame):
        vocab = {r["token"]: r["id"] for r in vocab.collect()}
    inv = {i: t for t, i in vocab.items()}
    special_ids = {vocab[s] for s in specials if s in vocab}

    @pandas_udf("string")
    def _dec(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        def one(ids):
            if ids is None:
                return None
            pieces = []
            for i in ids:
                i = int(i)
                if i in special_ids:
                    continue  # special token, not text
                t = inv.get(i)
                if t is None:
                    raise ValueError(f"id {i} not in vocab")
                pieces.append(t)
            return "".join(pieces).replace(_EOW, " ").strip()

        for s in it:
            yield s.map(one)

    col = ids_col if isinstance(ids_col, Column) else F.col(ids_col)
    return _dec(col)
