"""Dataset card: bounded corpus statistics + a markdown release card.

Shipping a training corpus means shipping its datasheet (Gebru et al.,
"Datasheets for Datasets"; the HuggingFace dataset-card convention): how
many documents and tokens, in which languages, from which hosts, with what
length/quality distributions. This module computes those statistics as a
handful of aggregations whose OUTPUTS are bounded (top-k lists, fixed
percentile grids) no matter the corpus size, then renders them driver-side
— the only collects are the bounded aggregate results, the same budget as
the extraction manifest.

Aggregation plan (all map-side-combinable):

* one global aggregate: doc count, token/char sums, length and quality
  percentile sketches (``percentile_approx`` — rank-error sketches merge
  associatively, so this is one pass at any scale);
* one groupBy(lang) → (docs, tokens) with a top-k take (languages are
  bounded in practice; the take guards a pathological lang column);
* one groupBy(host) → docs, top-k via ``TakeOrdered`` (partial top-k per
  partition — never a global sort over 10^8 hosts).

Tokens are ``text_stats.token_count`` (whitespace tokens — the same
definition the engine's stats/packing paths use).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from final_ocr_spark.operators.text_stats import token_count

_PCTS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def corpus_stats(
    corpus: DataFrame,
    text_col: str = "text",
    lang_col: str | None = "lang",
    host_col: str | None = "host",
    quality_col: str | None = "quality_score",
    top_k: int = 20,
) -> dict:
    """Bounded statistics dict for a corpus table. Optional columns that
    are absent in the input are skipped (pass None to skip explicitly)."""
    cols = set(corpus.columns)
    lang_col = lang_col if lang_col in cols else None
    host_col = host_col if host_col in cols else None
    quality_col = quality_col if quality_col in cols else None

    # NOTE: only the slim DERIVED columns enter the checkpoint — carrying
    # the text column itself would persist the whole corpus for nothing
    # (review-caught)
    base = corpus.select(
        token_count(F.col(text_col)).alias("_tok"),
        F.length(text_col).alias("_chars"),
        *([F.col(lang_col).alias("_lang")] if lang_col else []),
        *([F.col(host_col).alias("_host")] if host_col else []),
        *([F.col(quality_col).alias("_q")] if quality_col else []),
    ).localCheckpoint(eager=False)  # 3 consumers; don't recompute token counts

    aggs = [
        F.count(F.lit(1)).alias("docs"),
        F.sum("_tok").alias("tokens"),
        F.sum("_chars").alias("chars"),
        F.percentile_approx("_tok", _PCTS, 10000).alias("tok_pcts"),
    ]
    if quality_col:
        aggs.append(F.percentile_approx("_q", _PCTS, 10000).alias("q_pcts"))
    g = base.agg(*aggs).first()
    stats: dict = {
        "docs": g["docs"],
        "tokens": int(g["tokens"] or 0),
        "chars": int(g["chars"] or 0),
        "token_percentiles": (
            dict(zip([str(p) for p in _PCTS], g["tok_pcts"])) if g["tok_pcts"] else {}
        ),
    }
    if quality_col and g["q_pcts"]:
        stats["quality_percentiles"] = dict(
            zip([str(p) for p in _PCTS], [float(x) for x in g["q_pcts"]])
        )
    if lang_col:
        stats["languages"] = [
            {"lang": r["_lang"], "docs": r["docs"], "tokens": int(r["tokens"] or 0)}
            for r in (
                base.groupBy("_lang")
                .agg(F.count(F.lit(1)).alias("docs"), F.sum("_tok").alias("tokens"))
                .orderBy(F.desc("docs"), F.asc_nulls_last("_lang"))
                .take(top_k)
            )
        ]
    if host_col:
        stats["top_hosts"] = [
            {"host": r["_host"], "docs": r["docs"]}
            for r in (
                base.groupBy("_host")
                .agg(F.count(F.lit(1)).alias("docs"))
                .orderBy(F.desc("docs"), F.asc_nulls_last("_host"))
                .take(top_k)
            )
        ]
        stats["distinct_hosts"] = base.select("_host").distinct().count()
    return stats


def dataset_card_markdown(stats: dict, name: str = "corpus") -> str:
    """Render a corpus_stats dict as a markdown dataset card (driver-side
    string formatting over an already-bounded dict). A ``funnel`` key
    (list of gate rows — see :func:`write_dataset_card`) renders as the
    retention-funnel table FineWeb/Dolma-style release cards carry."""
    L = [f"# Dataset card: {name}", ""]
    L.append(f"- **Documents:** {stats['docs']:,}")
    L.append(f"- **Tokens (whitespace):** {stats['tokens']:,}")
    L.append(f"- **Characters:** {stats['chars']:,}")
    if stats.get("distinct_hosts") is not None:
        L.append(f"- **Distinct hosts:** {stats['distinct_hosts']:,}")
    if stats.get("token_percentiles"):
        L += ["", "## Document length (tokens)", "",
              "| percentile | tokens |", "|---|---|"]
        for p, v in stats["token_percentiles"].items():
            L.append(f"| p{float(p) * 100:g} | {int(v):,} |")
    if stats.get("quality_percentiles"):
        L += ["", "## Quality score", "", "| percentile | score |", "|---|---|"]
        for p, v in stats["quality_percentiles"].items():
            L.append(f"| p{float(p) * 100:g} | {v:.2f} |")
    if stats.get("languages"):
        L += ["", "## Languages (top by documents)", "",
              "| lang | docs | tokens |", "|---|---|---|"]
        for r in stats["languages"]:
            L.append(f"| {r['lang']} | {r['docs']:,} | {r['tokens']:,} |")
    if stats.get("top_hosts"):
        L += ["", "## Top hosts (by documents)", "", "| host | docs |", "|---|---|"]
        for r in stats["top_hosts"]:
            L.append(f"| {r['host']} | {r['docs']:,} |")
    if stats.get("funnel"):
        L += ["", "## Retention funnel (scan-local quality gates)", "",
              "| gate | failed (any) | failed (first) | remaining |",
              "|---|---|---|---|"]
        for r in stats["funnel"]:
            L.append(
                f"| {r['gate']} | {r['n_failed_any']:,} | "
                f"{r['n_failed_first']:,} | {r['remaining']:,} |"
            )
    return "\n".join(L) + "\n"


def write_dataset_card(
    corpus: DataFrame,
    out_path: str,
    name: str = "corpus",
    funnel: DataFrame | None = None,
    **stats_kwargs,
) -> dict:
    """corpus_stats + markdown render to ``out_path`` (and the raw dict as
    ``out_path + '.json'``). Returns the stats dict.

    ``funnel`` takes a :func:`final_ocr_spark.plans.funnel.gate_funnel`
    result (computed over the RAW pre-gate corpus — the card's own stats
    describe the released corpus, the funnel explains what the gates
    removed to get there) and publishes it as the card's retention table +
    a ``funnel`` key in the JSON. The collect is the funnel's G+1 rows —
    bounded like every other card aggregate."""
    stats = corpus_stats(corpus, **stats_kwargs)
    if funnel is not None:
        stats["funnel"] = [r.asDict() for r in funnel.collect()]
    md = dataset_card_markdown(stats, name=name)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(md)
    with open(out_path + ".json", "w", encoding="utf-8") as f:
        json.dump(stats, f, indent=1)
    return stats
