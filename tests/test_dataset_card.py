"""Dataset card: exact bounded stats on a hand-built corpus + render."""

from __future__ import annotations

import json

from final_ocr_spark.sources.dataset_card import (
    corpus_stats,
    dataset_card_markdown,
    write_dataset_card,
)


def _corpus(spark):
    rows = [
        ("https://a.com/1", "one two three", "en", "a.com", 80.0),
        ("https://a.com/2", "four five", "en", "a.com", 60.0),
        ("https://b.com/1", "six seven eight nine", "fr", "b.com", 90.0),
    ]
    return spark.createDataFrame(
        rows, "url string, text string, lang string, host string, quality_score double"
    )


def test_corpus_stats_exact(spark):
    s = corpus_stats(_corpus(spark), top_k=5)
    assert s["docs"] == 3
    assert s["tokens"] == 3 + 2 + 4
    assert s["chars"] == sum(len(t) for t in
                             ["one two three", "four five", "six seven eight nine"])
    assert s["distinct_hosts"] == 2
    assert s["languages"] == [
        {"lang": "en", "docs": 2, "tokens": 5},
        {"lang": "fr", "docs": 1, "tokens": 4},
    ]
    assert s["top_hosts"] == [
        {"host": "a.com", "docs": 2},
        {"host": "b.com", "docs": 1},
    ]
    # percentile grids present with the fixed keys
    assert set(s["token_percentiles"]) == {"0.1", "0.25", "0.5", "0.75", "0.9", "0.99"}
    assert s["token_percentiles"]["0.5"] == 3  # exact on 3 values
    assert s["quality_percentiles"]["0.5"] == 80.0


def test_missing_optional_columns_skipped(spark):
    df = _corpus(spark).select("url", "text")
    s = corpus_stats(df)
    assert s["docs"] == 3 and "languages" not in s and "top_hosts" not in s
    assert "quality_percentiles" not in s


def test_card_render_and_write(spark, tmp_path):
    out = str(tmp_path / "CARD.md")
    s = write_dataset_card(_corpus(spark), out, name="demo")
    md = open(out, encoding="utf-8").read()
    assert "# Dataset card: demo" in md
    assert "| en | 2 | 5 |" in md
    assert "| a.com | 2 |" in md
    assert "**Documents:** 3" in md
    # raw dict round-trips beside the markdown
    assert json.load(open(out + ".json", encoding="utf-8")) == s
    # render is pure over the dict
    assert dataset_card_markdown(s, name="demo") == md


def test_card_publishes_retention_funnel(spark, tmp_path):
    """write_dataset_card(funnel=...) publishes the gate_funnel table on
    the release card (markdown section + 'funnel' JSON key) — the
    FineWeb/Dolma datasheet shape; without it the card is silent about
    what the gates removed."""
    from final_ocr_spark.plans.funnel import gate_funnel

    raw = spark.createDataFrame(
        [("u1", "en",
          "the quick brown fox jumps over the lazy dog and then runs far "
          "away into the green hills where a small river flows past the "
          "old stone bridge near the quiet village every single morning."),
         ("u2", "en", None)],
        ["url", "lang", "text"],
    )
    fn = gate_funnel(raw, min_quality=50.0, gopher=True)
    out = str(tmp_path / "CARD.md")
    s = write_dataset_card(_corpus(spark), out, name="demo", funnel=fn)
    md = open(out, encoding="utf-8").read()
    assert "## Retention funnel" in md
    assert [r["gate"] for r in s["funnel"]] == ["quality", "gopher", "kept"]
    assert s["funnel"][-1]["remaining"] == 1  # the NULL doc dropped
    assert "| quality |" in md and "| kept |" in md
    assert json.load(open(out + ".json", encoding="utf-8")) == s
