"""Named corpus-pipeline presets: published web-corpus recipes (C4, Gopher/
MassiveText, CCNet, RefinedWeb, FineWeb, Dolma, D4) expressed as kwarg
bundles for :func:`final_ocr_spark.pipeline.corpus_pipeline`.

Each preset maps a public paper's cleaning recipe onto the engine's tested
stages. The mapping is necessarily approximate where the paper used a
component this engine deliberately re-expresses (e.g. fastText langid → the
deterministic n-gram heuristic; trafilatura → the density extractor that is
the engine's whole point) — every such substitution is spelled out in the
preset's ``notes`` so a user knows exactly which knob to retune. Presets are
DEFAULTS, not policy: anything can be overridden per call
(``corpus_pipeline_preset(pages, "c4", near_dup=True)``), and list-valued
policy inputs (blocklists, flagged wordlists, LM tables) are never baked in
— the paper's lists are licensed/external, so the preset leaves the kwarg
None and the notes say what to supply.

Scale shape: a preset adds NOTHING to the plan — it is a dict merge ahead
of corpus_pipeline, so the composed job inherits exactly the per-stage
shuffle/broadcast discipline documented in pipeline.py.

Reference parity: the reference repo's single hard-coded cleaning sequence
(process_invoices, ocr2.py:559-607) is the degenerate case of one preset;
this module generalizes "the pipeline, configured like the papers".
"""

from __future__ import annotations

import inspect

from pyspark.sql import DataFrame

from final_ocr_spark.pipeline import corpus_pipeline

# Every value below is a corpus_pipeline kwarg (validated by
# tests/test_presets.py against the live signature, so preset drift vs the
# pipeline is a test failure, not a runtime surprise).
PRESETS: dict[str, dict] = {
    "c4": dict(
        cite="Raffel et al. 2020 (T5), §2.2 'C4'",
        notes=(
            "Line rules + lorem-ipsum/'{'/3-kept-lines doc gates are exact "
            "(operators/repetition.py:c4_features). Language gate re-detects "
            "with the n-gram heuristic (paper: langdetect >=0.99 en). The "
            "paper's three-sentence-span dedup is approximated by Lee-style "
            "duplicate-span removal at 50-token grams (span_dedup_gram_n); "
            "its 'List of Dirty, Naughty...' word filter is policy — pass "
            "flagged_wordlist=[...] to enable it. Line rules assume html "
            "input (the extractor emits one line per block); text-"
            "passthrough corpora collapse to one line per doc — set "
            "c4_min_lines=1 there."
        ),
        kwargs=dict(
            lang_allow=("en",),
            lang_detect=True,
            c4_line_clean=True,
            c4_min_lines=3,
            span_dedup_gram_n=50,
            min_quality=0.0,
            gopher=False,
            redact=False,
            near_dup=False,
        ),
    ),
    "gopher": dict(
        cite="Rae et al. 2021 (Gopher), A1.1 'MassiveText'",
        notes=(
            "Repetition gates are the paper's table-A1 thresholds verbatim "
            "(operators/repetition.py). The doc-quality rules (word counts, "
            "symbol ratios, stopword presence) ride the composite "
            "quality_score at its default gate. Near-dup dedup at the "
            "paper's 0.8 Jaccard via MinHash-LSH; exact dedup always on."
        ),
        kwargs=dict(
            lang_allow=("en",),
            lang_detect=True,
            gopher=True,
            min_quality=50.0,
            near_dup=True,
            jaccard_threshold=0.8,
            redact=False,
        ),
    ),
    "ccnet": dict(
        cite="Wenzek et al. 2020 (CCNet)",
        notes=(
            "Multilingual by design — no lang_allow; pass one to restrict. "
            "Paragraph-hash dedup per the paper (min 40 chars here). The "
            "head/middle/tail perplexity banding needs a trained LM: pass "
            "lm_table=train_bigram_lm(ref_corpus) and lm_max_ppl=<head "
            "cutoff from lm.ppl_bands> to enable the LM gate — without "
            "them the preset runs the dedup-and-extract subset only."
        ),
        kwargs=dict(
            paragraph_dedup_min_chars=40,
            min_quality=0.0,
            gopher=False,
            redact=False,
            near_dup=False,
        ),
    ),
    "refinedweb": dict(
        cite="Penedo et al. 2023 (RefinedWeb / Falcon)",
        notes=(
            "trafilatura → this engine's density extractor (the substitution "
            "is the project's premise). URL blocklist is external policy — "
            "pass blocked_domains/url_patterns. Gopher repetition + quality "
            "gates, exact dedup, MinHash near-dup at 0.8, and Lee-style "
            "exact-substring span removal (50-token grams), matching the "
            "paper's dedup trio."
        ),
        kwargs=dict(
            lang_allow=("en",),
            lang_detect=True,
            gopher=True,
            min_quality=50.0,
            near_dup=True,
            jaccard_threshold=0.8,
            span_dedup_gram_n=50,
            redact=False,
        ),
    ),
    "fineweb": dict(
        cite="Penedo et al. 2024 (FineWeb)",
        notes=(
            "URL filter is external policy (pass blocked_domains). Gopher "
            "repetition + the C4 terminal-punctuation subset via "
            "c4_line_clean; MinHash near-dup at the paper's ~0.75 "
            "similarity; PII anonymization (email/IP) on, per the release."
        ),
        kwargs=dict(
            lang_allow=("en",),
            lang_detect=True,
            gopher=True,
            min_quality=50.0,
            c4_line_clean=True,
            c4_min_lines=1,
            near_dup=True,
            jaccard_threshold=0.75,
            redact=True,
        ),
    ),
    "dolma": dict(
        cite="Soldaini et al. 2024 (Dolma)",
        notes=(
            "Langid gate (paper: fastText en>=0.5 → heuristic here), Gopher "
            "quality/repetition rules, URL-level exact dedup (always-on "
            "exact stage), paragraph dedup, PII masking. Benchmark "
            "decontamination is per-eval-suite — pass benchmark=<eval df> "
            "to enable the 13-gram overlap removal."
        ),
        kwargs=dict(
            lang_allow=("en",),
            lang_detect=True,
            gopher=True,
            min_quality=50.0,
            paragraph_dedup_min_chars=40,
            redact=True,
            near_dup=False,
        ),
    ),
    "d4": dict(
        cite="Tirumala et al. 2023 (D4) = SemDeDup + SSP prune",
        notes=(
            "Runs on an already-extracted/filtered corpus per the paper "
            "(MinHash off; heuristic gates off) — compose after another "
            "preset for raw crawl input. SemDeDup in the paper-faithful "
            "k-means mode (least-prototypical survivor) at 0.9 cosine, "
            "then SSP-prunes the 20% most prototypical per cluster."
        ),
        kwargs=dict(
            min_quality=0.0,
            gopher=False,
            redact=False,
            near_dup=False,
            semantic_threshold=0.9,
            semantic_method="kmeans",
            prototype_prune_frac=0.2,
        ),
    ),
}

_PIPELINE_PARAMS = frozenset(
    inspect.signature(corpus_pipeline).parameters
) - {"pages"}


def list_presets() -> dict[str, str]:
    """name → one-line citation, for discovery/CLI help."""
    return {name: spec["cite"] for name, spec in PRESETS.items()}


def preset_kwargs(name: str, **overrides) -> dict:
    """The merged corpus_pipeline kwargs for ``name``: preset defaults with
    ``overrides`` winning. Raises on an unknown preset or a kwarg that is
    not a corpus_pipeline parameter (catches preset/pipeline drift AND
    caller typos at the merge, not deep inside a Spark plan)."""
    if name not in PRESETS:
        raise ValueError(
            f"unknown preset {name!r}; available: {sorted(PRESETS)}"
        )
    merged = dict(PRESETS[name]["kwargs"])
    merged.update(overrides)
    bad = sorted(set(merged) - _PIPELINE_PARAMS)
    if bad:
        raise TypeError(
            f"not corpus_pipeline parameters: {bad} "
            f"(preset {name!r} + overrides)"
        )
    return merged


def corpus_pipeline_preset(
    pages: DataFrame, name: str, **overrides
) -> DataFrame:
    """corpus_pipeline configured like the named published recipe; any
    kwarg overrides the preset (see PRESETS[name]['notes'] for what each
    recipe approximates and which policy inputs to supply)."""
    return corpus_pipeline(pages, **preset_kwargs(name, **overrides))
