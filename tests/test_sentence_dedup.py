"""sentence_dedup: corpus-level repeated-sentence removal (syndicated
ledes) — semantics pinned against a pure-Python reference built on the
SAME splitter the operator uses (split_sentences is itself differential-
and fuzz-pinned in test_sentences.py)."""

from __future__ import annotations

from final_ocr_spark.operators.dedup import sentence_dedup
from final_ocr_spark.operators.sentences import split_sentences

LEDE = ("The quick brown fox jumped over the lazy dog in a stunning "
        "upset on Tuesday.")
QUOTE = ("Officials said the investigation is ongoing and more details "
         "will follow shortly.")


def _corpus():
    return [
        ("d1", f"{LEDE} Unique first-document analysis follows here. {QUOTE}"),
        # d2 syndicates the lede + quote — both dropped, middle kept
        ("d2", f"{LEDE} A different second-document middle sentence. {QUOTE}"),
        # d3 repeats the lede twice IN-DOC — later copy dropped
        ("d3", f"{LEDE} {LEDE} Third document body sentence stands alone."),
        # d4: short repeats never participate
        ("d4", "Thanks! Thanks! Fourth document body sentence is long enough."),
        ("d5", None),
    ]


def _python_reference(rows, min_chars):
    seen = {}
    # first pass: first owner of each long-enough sentence, (doc, pos) order
    for doc_id, text in rows:
        if text is None:
            continue
        for pos, s in enumerate(split_sentences(text)):
            if len(s) >= min_chars and s not in seen:
                seen[s] = (doc_id, pos)
    out = {}
    for doc_id, text in rows:
        if text is None:
            out[doc_id] = (None, 0)
            continue
        sents = split_sentences(text)
        kept, dropped = [], 0
        for pos, s in enumerate(sents):
            if len(s) >= min_chars and seen[s] != (doc_id, pos):
                dropped += 1
            else:
                kept.append(s)
        # affected docs re-join with single spaces (operator contract);
        # unaffected docs stay byte-identical
        out[doc_id] = ((" ".join(kept) if dropped else text), dropped)
    return out


def test_sentence_dedup_matches_python_reference(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_sents_dropped"])
        for r in sentence_dedup(df, key="doc_id", min_chars=40).collect()
    }
    want = _python_reference(rows, 40)
    assert got == want
    # spot semantics: d1 keeps everything, d2 lost exactly lede+quote
    assert got["d1"][1] == 0 and LEDE in got["d1"][0]
    assert got["d2"][1] == 2 and LEDE not in got["d2"][0]
    assert "second-document middle" in got["d2"][0]
    assert got["d3"][1] == 2  # d1 owns the lede: BOTH d3 copies drop
    assert got["d4"][1] == 0 and got["d4"][0] == _corpus()[3][1]


def test_sentence_dedup_slim_plan(spark):
    # segment strings must be pruned before every exchange (the shared
    # kill-set machinery's contract)
    df = spark.createDataFrame(
        [("d1", "One sentence here. Two sentence here.")],
        "doc_id string, text string",
    )
    plan = sentence_dedup(df, key="doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    import re
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "seg" not in m.group(1)


def test_pipeline_sentence_stage(spark):
    """Pipeline stage 4b': planted syndicated lede drops from the later doc;
    unaffected doc untouched."""
    import datetime

    from final_ocr_spark.pipeline import corpus_pipeline

    lede = ("Officials confirmed on Tuesday that the merger between the two "
            "companies will proceed as planned this quarter.")
    ts = datetime.datetime(2026, 1, 1)

    def page(url, body):
        return (url, ts,
                f"<html><body><p>{body}</p></body></html>".encode(),
                None, None)

    rows = [
        page("http://a.com/1",
             f"{lede} Original analysis with plenty of additional unique "
             "english prose for the quality gates to accept happily."),
        page("http://b.com/syndicated",
             f"{lede} Different second take with plenty of additional "
             "unique english prose for the quality gates to accept."),
    ]
    pages = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = {r["url"]: r["text"] for r in corpus_pipeline(
        pages, min_quality=0.0, gopher=False, redact=False, near_dup=False,
        sentence_dedup_min_chars=40,
    ).collect()}
    assert lede in out["http://a.com/1"]
    assert lede not in out["http://b.com/syndicated"]
    assert "Different second take" in out["http://b.com/syndicated"]
