"""Repetition-based quality signals and line-level corpus cleaning for
webtext training-data pipelines.

Two classic filter families, re-expressed as pure Spark Column expressions
(whole-stage codegen, zero shuffle, scan-local — the shape that holds at
10^12 documents):

* **Gopher repetition signals** (Rae et al. 2021, table A1): duplicate
  line / paragraph fractions, duplicate line / paragraph *character*
  fractions, top-{2,3,4}-gram character fraction, duplicated-{5..10}-gram
  character fraction.
* **C4 line-level cleaning** (Raffel et al. 2020 §2.2): keep only lines
  that end in terminal punctuation and have >= 5 words, drop lines
  mentioning javascript, flag lorem-ipsum / curly-brace documents, drop
  documents with < 3 surviving lines.

Design notes (scale + oracle-exactness):

* Every count is an **integer** and every threshold check is an integer
  cross-multiplication (``100 * num <= pct * den``) — no float division,
  no ``round()`` — so a DuckDB oracle matches bit-for-bit (see the
  round()/float-division pitfalls in PLANS.md).
* Run-length statistics over sorted arrays use a single ``F.aggregate``
  fold (O(n log n) for the sort, O(n) for the fold). The fold lambda only
  references its accumulator and element variables, so Catalyst's
  no-CSE-inside-HOF-lambdas behavior cannot re-evaluate outer arrays per
  element (the O(n^2) trap documented at dedup.py:shingle_hashes_from).
* Word n-grams are built by zip_with over *top-level* shifted slices
  (computed once, subexpression-eliminated), not by per-element slice
  calls inside a transform lambda.

Reference provenance: the reference repo has no corpus-level quality
filters (it is a per-document OCR pipeline); these generalize its V9
completeness scoring (ocr.py:996-1016) to the corpus-hygiene operators a
Common-Crawl-scale extraction pipeline needs downstream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

def _zero() -> Column:
    return F.lit(0).cast("long")


def norm_lines(text_col) -> Column:
    """array<string>: lines split on \\r?\\n, whitespace-trimmed (regex — NOT
    F.trim, which strips ASCII spaces only), empties dropped."""
    lines = F.split(text_col, r"\r?\n")
    lines = F.transform(lines, lambda l: F.regexp_replace(l, r"^\s+|\s+$", ""))
    return F.filter(lines, lambda l: l != "")


def norm_paragraphs(text_col) -> Column:
    """array<string>: paragraphs split on blank lines, internal whitespace
    runs collapsed to single spaces (so re-wrapped duplicates compare
    equal), empties dropped."""
    paras = F.split(text_col, r"\n\s*\n")
    paras = F.transform(
        paras, lambda p: F.regexp_replace(F.regexp_replace(p, r"\s+", " "), r"^ | $", "")
    )
    return F.filter(paras, lambda p: p != "")


def words_of(text_col) -> Column:
    """array<string>: whitespace-delimited tokens, empties dropped."""
    return F.filter(F.split(text_col, r"\s+"), lambda w: w != "")


def word_ngrams(words: Column, n: int) -> Column:
    """array<string>: word n-grams joined by single spaces.

    Built by folding zip_with over shifted top-level slices — each shift is
    one array expression evaluated once per row (CSE-able), never a slice
    inside a per-element lambda.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if n == 1:
        return words
    grams = words
    for k in range(1, n):
        keep = F.greatest(F.size(words) - k, F.lit(0))
        shifted = F.slice(words, k + 1, keep)
        grams = F.zip_with(
            F.slice(grams, 1, keep), shifted, lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return grams


def run_stats(arr: Column) -> Column:
    """struct(dup_chars, best_run, best_chars) over runs of equal strings in
    ``array_sort(arr)``:

    * ``dup_chars`` — sum over values occurring >= 2 times of
      occurrences * length(value) (characters inside duplicated values,
      first occurrence included — the Gopher convention for line/paragraph
      character fractions).
    * ``best_run`` — occurrence count of the most frequent value
      (ties broken toward the lexicographically smallest, which the sorted
      fold gives for free with a strict ``>``).
    * ``best_chars`` — best_run * length(that value).

    One O(n) fold; the lambda touches only acc fields and the element.
    """
    s = F.array_sort(arr)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        _zero().alias("run"),
        _zero().alias("dup_chars"),
        _zero().alias("best_run"),
        _zero().alias("best_chars"),
    )

    def flushed(acc):
        # close out the current run (acc.prev repeated acc.run times)
        run_chars = acc["run"] * F.coalesce(F.length(acc["prev"]).cast("long"), _zero())
        dup = acc["dup_chars"] + F.when(acc["run"] >= 2, run_chars).otherwise(_zero())
        better = acc["run"] > acc["best_run"]
        best_run = F.when(better, acc["run"]).otherwise(acc["best_run"])
        best_chars = F.when(better, run_chars).otherwise(acc["best_chars"])
        return dup, best_run, best_chars

    def merge(acc, x):
        dup, best_run, best_chars = flushed(acc)
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        return F.when(
            same,
            F.struct(
                x.alias("prev"),
                (acc["run"] + 1).alias("run"),
                acc["dup_chars"].alias("dup_chars"),
                acc["best_run"].alias("best_run"),
                acc["best_chars"].alias("best_chars"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                dup.alias("dup_chars"),
                best_run.alias("best_run"),
                best_chars.alias("best_chars"),
            )
        )

    def finish(acc):
        dup, best_run, best_chars = flushed(acc)
        return F.struct(
            dup.alias("dup_chars"),
            best_run.alias("best_run"),
            best_chars.alias("best_chars"),
        )

    return F.aggregate(s, init, merge, finish)


def _sum_lengths(arr: Column) -> Column:
    return F.aggregate(arr, _zero(), lambda acc, x: acc + F.length(x))


def repetition_features(
    text_col,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> dict[str, Column]:
    """All-integer repetition counts for one document (Gopher A1 signals).

    Returns Columns keyed:
      n_chars, n_words,
      n_lines, n_distinct_lines, dup_line_chars, line_chars,
      n_paras, n_distinct_paras, dup_para_chars, para_chars,
      top{n}gram_chars for n in top_ns,
      dup{n}gram_chars for n in dup_ns.

    Ratios are intentionally NOT returned — compute them downstream, or use
    :func:`gopher_repetition_checks` which compares integers exactly.
    """
    lines = norm_lines(text_col)
    paras = norm_paragraphs(text_col)
    words = words_of(text_col)
    line_stats = run_stats(lines)
    para_stats = run_stats(paras)
    out: dict[str, Column] = {
        "n_chars": F.length(text_col).cast("long"),
        "n_words": F.size(words).cast("long"),
        "n_lines": F.size(lines).cast("long"),
        "n_distinct_lines": F.size(F.array_distinct(lines)).cast("long"),
        "dup_line_chars": line_stats["dup_chars"],
        "line_chars": _sum_lengths(lines),
        "n_paras": F.size(paras).cast("long"),
        "n_distinct_paras": F.size(F.array_distinct(paras)).cast("long"),
        "dup_para_chars": para_stats["dup_chars"],
        "para_chars": _sum_lengths(paras),
    }
    for n in top_ns:
        rs = run_stats(word_ngrams(words, n))
        # a gram occurring ONCE is not repetition: without the >= 2 gate a
        # single long 4-gram in a short document trips the 16% threshold
        # (the signal is meant to catch repeated boilerplate, not existence
        # of a 4-gram). Pinned here and mirrored in the q39 oracle.
        out[f"top{n}gram_chars"] = F.when(
            rs["best_run"] >= 2, rs["best_chars"]
        ).otherwise(_zero())
    for n in dup_ns:
        out[f"dup{n}gram_chars"] = run_stats(word_ngrams(words, n))["dup_chars"]
    return out


# Gopher table A1 thresholds, as integer percents (num/den compared via
# cross-multiplication; a document KEEPS when every check passes).
GOPHER_THRESHOLDS_PCT: dict[str, int] = {
    "dup_line_frac": 30,
    "dup_para_frac": 30,
    "dup_line_char_frac": 20,
    "dup_para_char_frac": 20,
    "top2gram_char_frac": 20,
    "top3gram_char_frac": 18,
    "top4gram_char_frac": 16,
    "dup5gram_char_frac": 15,
    "dup6gram_char_frac": 14,
    "dup7gram_char_frac": 13,
    "dup8gram_char_frac": 12,
    "dup9gram_char_frac": 11,
    "dup10gram_char_frac": 10,
}


def _frac_le(num: Column, den: Column, pct: int) -> Column:
    """num/den <= pct/100 without floats; vacuously true when den == 0."""
    return (den <= 0) | (num * 100 <= den * pct)


def gopher_repetition_checks(feats: dict[str, Column]) -> dict[str, Column]:
    """Boolean Gopher repetition checks from :func:`repetition_features`
    output. All integer arithmetic — engine-independent."""
    f = feats
    checks = {
        "dup_line_frac": _frac_le(
            f["n_lines"] - f["n_distinct_lines"], f["n_lines"],
            GOPHER_THRESHOLDS_PCT["dup_line_frac"]),
        "dup_para_frac": _frac_le(
            f["n_paras"] - f["n_distinct_paras"], f["n_paras"],
            GOPHER_THRESHOLDS_PCT["dup_para_frac"]),
        "dup_line_char_frac": _frac_le(
            f["dup_line_chars"], f["line_chars"],
            GOPHER_THRESHOLDS_PCT["dup_line_char_frac"]),
        "dup_para_char_frac": _frac_le(
            f["dup_para_chars"], f["para_chars"],
            GOPHER_THRESHOLDS_PCT["dup_para_char_frac"]),
    }
    for key, pct in GOPHER_THRESHOLDS_PCT.items():
        base = key.replace("_char_frac", "_chars")
        if "gram" in key and base in f:
            checks[key] = _frac_le(f[base], f["n_chars"], pct)
    return checks


def _bind(col: Column, f) -> Column:
    """Let-binding for interpreted Column expressions: evaluate ``col``
    ONCE and pass it to ``f`` as a lambda variable.

    Why this exists (r6, guide §4.1/§2.4): higher-order functions are
    CodegenFallback, so a Filter predicate built from them is evaluated by
    recursive ``eval`` with NO common-subexpression elimination — every
    textual reuse of e.g. ``words_of(text)`` re-runs the regex split.
    ``exists`` over the 1-element array ``array(col)`` evaluates ``col``
    exactly once, binds the value to the lambda variable (references are
    plain variable reads), and returns exactly ``f(col)`` under 3-valued
    logic: pred TRUE/FALSE/NULL -> TRUE/FALSE/NULL, and a NULL ``col`` is
    carried as a NULL *element* (``array(col)`` is never an empty array),
    so null propagation matches the unbound form."""
    return F.exists(F.array(col), f)


def gopher_repetition_keep(text_col) -> Column:
    """Single boolean: document passes every Gopher repetition check.

    Same verdict as AND-folding :func:`gopher_repetition_checks` over
    :func:`repetition_features` (3-valued AND is order-insensitive; pinned
    by tests against both that spec form and the Arrow twin), restructured
    for interpreted evaluation (r6):

    * ``lines`` / ``paras`` / ``words`` are :func:`_bind`-bound — computed
      once instead of once per check that mentions them (the spec form
      re-split ``words`` for all 9 gram sizes);
    * gram arrays build INCREMENTALLY — grams(n+1) is ONE ``zip_with``
      against the (n+1)-shifted words over the bound grams(n), replacing
      :func:`word_ngrams`'s from-scratch chains (9 zip_with passes total
      vs 45).

    Measured (sf0.1 documents, 5 k docs, local[32], interleaved): 12.3-12.7 s
    -> 4.3-4.4 s per filter+count, 0 verdict diffs. The per-doc sorts+folds
    (9 gram sizes + lines + paras) now dominate, which is the irreducible
    work of the Column form; the Arrow twin
    (:func:`gopher_repetition_keep_udf`) remains ~10x faster still and stays
    the pipeline default.
    """
    T = GOPHER_THRESHOLDS_PCT
    n_chars = F.length(text_col).cast("long")

    def seg_checks(frac_key: str, char_key: str):
        def checks(seg):
            n = F.size(seg).cast("long")
            return (
                _frac_le(n - F.size(F.array_distinct(seg)).cast("long"), n,
                         T[frac_key])
                & _frac_le(run_stats(seg)["dup_chars"], _sum_lengths(seg),
                           T[char_key])
            )

        return checks

    def top_check(grams, n):
        rs = run_stats(grams)
        # best_run >= 2 gate: a gram occurring once is not repetition
        # (see repetition_features)
        top = F.when(rs["best_run"] >= 2, rs["best_chars"]).otherwise(_zero())
        return _frac_le(top, n_chars, T[f"top{n}gram_char_frac"])

    def dup_check(grams, n):
        return _frac_le(run_stats(grams)["dup_chars"], n_chars,
                        T[f"dup{n}gram_char_frac"])

    def next_grams(words, grams, n):
        # grams for n -> grams for n+1 (word_ngrams' inner step)
        keep_n = F.greatest(F.size(words) - n, F.lit(0))
        return F.zip_with(
            F.slice(grams, 1, keep_n), F.slice(words, n + 1, keep_n),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )

    def gram_chain(words, grams, n):
        chk = top_check(grams, n) if n <= 4 else dup_check(grams, n)
        if n == 10:
            return chk
        return chk & _bind(next_grams(words, grams, n),
                           lambda g: gram_chain(words, g, n + 1))

    return (
        _bind(norm_lines(text_col),
              seg_checks("dup_line_frac", "dup_line_char_frac"))
        & _bind(norm_paragraphs(text_col),
                seg_checks("dup_para_frac", "dup_para_char_frac"))
        & _bind(words_of(text_col),
                lambda w: _bind(next_grams(w, w, 1),
                                lambda g2: gram_chain(w, g2, 2)))
    )


# ---------------------------------------------------------------------------
# C4 line-level cleaning


def c4_kept_lines(text_col) -> Column:
    """array<string>: lines surviving the C4 line rules — ends in terminal
    punctuation (. ! ? \"), >= 5 words, no 'javascript' mention."""
    def keep(l):
        n_words = F.size(F.filter(F.split(l, r"\s+"), lambda w: w != ""))
        return (
            F.substring(l, -1, 1).isin(".", "!", "?", '"')
            & (n_words >= 5)
            & ~F.contains(F.lower(l), F.lit("javascript"))
        )

    return F.filter(norm_lines(text_col), keep)


def c4_features(text_col, min_lines: int = 3) -> dict[str, Column]:
    """C4 document cleaning: cleaned text + doc-level flags.

    Keys: n_lines, n_kept, clean_text (kept lines re-joined with \\n),
    has_lorem (case-insensitive 'lorem ipsum'), has_curly (literal '{'),
    doc_keep (>= min_lines kept lines and neither flag).
    """
    lines = norm_lines(text_col)
    kept = c4_kept_lines(text_col)
    n_kept = F.size(kept).cast("long")
    has_lorem = F.contains(F.lower(text_col), F.lit("lorem ipsum"))
    has_curly = F.contains(text_col, F.lit("{"))
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_kept": n_kept,
        "clean_text": F.array_join(kept, "\n"),
        "has_lorem": has_lorem,
        "has_curly": has_curly,
        "doc_keep": (n_kept >= min_lines) & ~has_lorem & ~has_curly,
    }


def repetition_features_udf(
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
):
    """Arrow-batched twin of :func:`repetition_features` — the SAME integer
    counts, computed in plain Python per batch instead of ~(2 + len(top_ns)
    + len(dup_ns)) interpreted sort+fold passes per row (guide §4.2: hand
    whole batches to native/plain-Python code instead of interpreted JVM
    higher-order folds). Two wins, both measured on the q39 shape:

    * **execution**: the Column form burns ~100 core-ms/doc on mixed-length
      web text (string n-gram construction via repeated zip_with concat,
      then array_sort + interpreted aggregate per gram size); the Python
      Counter loop is ~1-2 ms/doc;
    * **planning**: the Column form's expression tree is so large that
      Catalyst's optimizer passes alone cost ~2 s per query compilation —
      the UDF collapses it to one ArrowEvalPython node.

    Returns a deferred pandas_udf producing ONE struct column with exactly
    the :func:`repetition_features` keys (all long). Bit-equality with the
    Column form is pinned by tests/test_repetition.py's adversarial
    differential (same corpus as the keep-gate twin).

    Exactness contract (mirrors :func:`gopher_repetition_keep_udf`):
    Java ``\\s`` is ASCII-only, spelled out; paragraph normalization
    replays the Column order (collapse runs, strip ONE leading/trailing
    space); a top-n-gram occurring once contributes 0 (``best_run >= 2``);
    ties break toward the lexicographically smallest gram (Python str
    order == Spark's UTF-8 binary order). NULL text replays the Column
    forms' exact (inconsistent-looking, but pinned) null propagation:
    array counts are -1 (``size(NULL)``), aggregate folds are NULL, and
    the top-gram counts are 0 (their ``when(NULL, ...).otherwise(0)``
    falls through) — verified against Spark by the differential test.
    """
    fields = ["n_chars", "n_words", "n_lines", "n_distinct_lines",
              "dup_line_chars", "line_chars", "n_paras", "n_distinct_paras",
              "dup_para_chars", "para_chars"]
    fields += [f"top{n}gram_chars" for n in top_ns]
    fields += [f"dup{n}gram_chars" for n in dup_ns]
    schema = ", ".join(f"{f}: long" for f in fields)

    def _factory():
        import re
        from collections import Counter

        js = " \t\n\x0b\x0c\r"  # Java \s
        trim_re = re.compile(f"^[{js}]+|[{js}]+$")
        line_split = re.compile("\r?\n")
        para_split = re.compile(f"\n[{js}]*\n")
        ws_run = re.compile(f"[{js}]+")

        def dup_chars(cnt: Counter) -> int:
            return sum(c * len(v) for v, c in cnt.items() if c >= 2)

        null_row = {
            "n_chars": None, "n_words": -1, "n_lines": -1,
            "n_distinct_lines": -1, "dup_line_chars": None,
            "line_chars": None, "n_paras": -1, "n_distinct_paras": -1,
            "dup_para_chars": None, "para_chars": None,
            **{f"top{n}gram_chars": 0 for n in top_ns},
            **{f"dup{n}gram_chars": None for n in dup_ns},
        }

        def one(t):
            if not isinstance(t, str):
                return dict(null_row)
            lines = [trim_re.sub("", l) for l in line_split.split(t)]
            lines = [l for l in lines if l]
            paras = []
            for p in para_split.split(t):
                p = ws_run.sub(" ", p)
                if p.startswith(" "):
                    p = p[1:]
                if p.endswith(" "):
                    p = p[:-1]
                if p:
                    paras.append(p)
            words = [w for w in ws_run.split(t) if w]
            lc, pc = Counter(lines), Counter(paras)
            out = {
                "n_chars": len(t),
                "n_words": len(words),
                "n_lines": len(lines),
                "n_distinct_lines": len(lc),
                "dup_line_chars": dup_chars(lc),
                "line_chars": sum(map(len, lines)),
                "n_paras": len(paras),
                "n_distinct_paras": len(pc),
                "dup_para_chars": dup_chars(pc),
                "para_chars": sum(map(len, paras)),
            }
            # n-grams counted as zip-tuples (C-speed, no string build);
            # " ".join only materializes for tied top-gram winners — the
            # tie-break must follow JOINED-string order, and tuple order
            # can differ from it when a word contains chars < U+0020
            for n in top_ns:
                g = Counter(zip(*(words[j:] for j in range(n))))
                top = 0
                if g:
                    best_c = max(g.values())
                    if best_c >= 2:
                        best = min(
                            " ".join(v) for v, c in g.items() if c == best_c
                        )
                        top = best_c * len(best)
                out[f"top{n}gram_chars"] = top
            for n in dup_ns:
                g = Counter(zip(*(words[j:] for j in range(n))))
                out[f"dup{n}gram_chars"] = sum(
                    c * (sum(map(len, v)) + n - 1)
                    for v, c in g.items()
                    if c >= 2
                )
            return out

        return one

    one = _factory()

    @pandas_udf(schema)
    def feats(texts: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([one(t) for t in texts], columns=fields)

    return feats


def gopher_repetition_keep_udf(
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
):
    """Arrow-batched twin of :func:`gopher_repetition_keep` — same verdict,
    computed in plain Python per batch instead of nine interpreted
    higher-order folds per row (the Column form measures ~6-7 core-ms on a
    ~500-word doc; this path is the simhash-popcount playbook applied to
    the densest scan-local gate). Bit-equality is pinned by a differential
    test over adversarial whitespace/repetition corpora.

    Semantics notes that make the twin EXACT, not approximate:

    * Java regex ``\\s`` is ASCII-only (``[ \\t\\n\\x0b\\f\\r]``) while
      Python's ``\\s`` is Unicode — every class below spells the Java set
      out explicitly, or a NBSP-separated token stream would tokenize
      differently in the two paths;
    * the paragraph normalization replays the Column order exactly
      (collapse ``\\s+`` to one space, then strip ONE leading/trailing
      space — the anchored-alternation regexp_replace can only ever match
      one of each);
    * a top-n-gram occurring once is not repetition (the ``best_run >= 2``
      gate), ties break toward the lexicographically smallest gram, and
      the integer threshold rule (``den <= 0`` vacuously true, ``num*100
      <= den*pct``) is copied verbatim;
    * null text returns null, so ``filter`` drops it in both forms.

    Deferred factory (module-level ``@pandas_udf`` needs a session)."""

    def _factory():
        import re
        from collections import Counter

        js = " \t\n\x0b\x0c\r"  # Java \s
        trim_re = re.compile(f"^[{js}]+|[{js}]+$")
        line_split = re.compile("\r?\n")
        para_split = re.compile(f"\n[{js}]*\n")
        ws_run = re.compile(f"[{js}]+")
        thresholds = dict(GOPHER_THRESHOLDS_PCT)

        def frac_le(num: int, den: int, pct: int) -> bool:
            return den <= 0 or num * 100 <= den * pct

        def dup_chars(cnt: Counter) -> int:
            return sum(c * len(v) for v, c in cnt.items() if c >= 2)

        def one(t):
            if not isinstance(t, str):
                return None
            lines = [trim_re.sub("", l) for l in line_split.split(t)]
            lines = [l for l in lines if l]
            paras = []
            for p in para_split.split(t):
                p = ws_run.sub(" ", p)
                if p.startswith(" "):
                    p = p[1:]
                if p.endswith(" "):
                    p = p[:-1]
                if p:
                    paras.append(p)
            words = [w for w in ws_run.split(t) if w]
            n_chars = len(t)
            lc, pc = Counter(lines), Counter(paras)
            if not frac_le(len(lines) - len(lc), len(lines),
                           thresholds["dup_line_frac"]):
                return False
            if not frac_le(len(paras) - len(pc), len(paras),
                           thresholds["dup_para_frac"]):
                return False
            if not frac_le(dup_chars(lc), sum(map(len, lines)),
                           thresholds["dup_line_char_frac"]):
                return False
            if not frac_le(dup_chars(pc), sum(map(len, paras)),
                           thresholds["dup_para_char_frac"]):
                return False
            # zip-tuple gram counting; joined strings only for tied top
            # winners (see repetition_features_udf's tie-break note)
            for n in top_ns:
                g = Counter(zip(*(words[j:] for j in range(n))))
                top = 0
                if g:
                    best_c = max(g.values())
                    if best_c >= 2:
                        best = min(
                            " ".join(v) for v, c in g.items() if c == best_c
                        )
                        top = best_c * len(best)
                if not frac_le(top, n_chars, thresholds[f"top{n}gram_char_frac"]):
                    return False
            for n in dup_ns:
                g = Counter(zip(*(words[j:] for j in range(n))))
                dup = sum(
                    c * (sum(map(len, v)) + n - 1)
                    for v, c in g.items()
                    if c >= 2
                )
                if not frac_le(dup, n_chars,
                               thresholds[f"dup{n}gram_char_frac"]):
                    return False
            return True

        return one

    one = _factory()

    @pandas_udf("boolean")
    def keep(texts: pd.Series) -> pd.Series:
        return texts.map(one)

    return keep
