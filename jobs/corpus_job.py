"""Production entry point: the full corpus pipeline (extract → hygiene →
dedup → caps → sample) as one spark-submit job.

Example (cluster):
    python jobs/package.py   # builds dist/final_ocr_spark.zip
    spark-submit \\
        --py-files dist/final_ocr_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        jobs/corpus_job.py \\
        --input /data/pages --output /data/corpus \\
        --host-cap 100000 --sample-rate 0.5

Local smoke:
    python jobs/corpus_job.py --synthetic 2000 --output /tmp/corpus_demo
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys

_REPO = str(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)
# the driver's sys.path does NOT reach executor Python workers; PYTHONPATH
# does (inherited by the worker processes Spark forks). Without it the job
# only works when launched from the repo root or with --py-files.
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def _build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default=None,
                    help="start from a published-recipe preset (c4, gopher, "
                         "ccnet, refinedweb, fineweb, dolma, d4 — see "
                         "final_ocr_spark.presets); explicitly-passed flags "
                         "override the preset, unset flags keep its values")
    ap.add_argument("--input", help="pages parquet path")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic pages instead of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-quality", type=float, default=50.0)
    # BooleanOptionalAction emits BOTH --x and --no-x, so every boolean
    # stage can be explicitly forced either way over a --preset (a bare
    # store_true can only assert, making "preset minus one stage"
    # inexpressible — review-caught); --no-gopher etc. keep working
    ap.add_argument("--gopher", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--redact", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--near-dup", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--neardup-keep-best", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="near-dup survivors are the highest-quality cluster "
                         "member instead of the min-key one")
    ap.add_argument("--jaccard", type=float, default=0.85)
    ap.add_argument("--host-cap", type=int, default=None)
    ap.add_argument("--sample-rate", type=float, default=None)
    ap.add_argument("--sample-salt", default="corpus")
    ap.add_argument("--temperature-alpha", type=float, default=None,
                    help="XLM/mT5 alpha-sampling over --temperature-group as "
                         "the final stage: group share ∝ (corpus share)^alpha "
                         "(0=uniform target, 1=keep natural shares)")
    ap.add_argument("--temperature-group", default="lang",
                    help="column the temperature reweighting groups on "
                         "(default lang; NULLs group as 'und')")
    ap.add_argument("--cluster-algorithm", choices=["jump", "star"],
                    default="jump",
                    help="near-dup connected components: jump = min-label+"
                         "pointer-jumping (dense graphs), star = large-star/"
                         "small-star (path-shaped/huge graphs)")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--blocked-domains", default=None,
                    help="file with one registered domain per line, filtered "
                         "before extraction (broadcast anti-join)")
    ap.add_argument("--url-patterns", action=argparse.BooleanOptionalAction, default=False,
                    help="enable the pinned default URL hygiene patterns")
    ap.add_argument("--sentence-dedup", type=int, default=None,
                    metavar="MIN_CHARS",
                    help="corpus-level repeated-sentence removal for "
                         "sentences of at least MIN_CHARS chars "
                         "(syndicated ledes)")
    ap.add_argument("--mime-gate", action=argparse.BooleanOptionalAction, default=False,
                    help="drop media/archive payloads by magic bytes "
                         "before extraction")
    ap.add_argument("--fix-mojibake", action=argparse.BooleanOptionalAction, default=False,
                    help="repair UTF-8-as-cp1252/latin-1 mis-decoded text "
                         "before the quality gates")
    ap.add_argument("--paragraph-dedup", type=int, default=None,
                    metavar="MIN_CHARS",
                    help="corpus-level repeated-paragraph removal for "
                         "paragraphs of at least MIN_CHARS chars")
    ap.add_argument("--tables-output", default=None,
                    help="also extract structured HTML tables from the RAW "
                         "input pages (url, table_idx, caption, header, "
                         "rows, markdown) to this parquet path")
    ap.add_argument("--tables-min-rows", type=int, default=2)
    ap.add_argument("--tables-min-cols", type=int, default=2)
    ap.add_argument("--wet-output", default=None,
                    help="also export the corpus as WET-style WARC "
                         "conversion records (.warc.gz) at this directory "
                         "(must be a filesystem shared by driver and "
                         "executors — local/NFS; not object stores)")
    ap.add_argument("--wat-output", default=None,
                    help="also export per-page metadata (head fields + "
                         "outlinks) from the RAW input pages as WAT-style "
                         "WARC metadata records at this directory (same "
                         "shared-filesystem requirement as --wet-output)")
    ap.add_argument("--host-boilerplate", type=float, default=None,
                    metavar="RATIO",
                    help="remove lines occurring on >= RATIO of a host's "
                         "pages (site nav/footer chrome; zero copies kept)")
    ap.add_argument("--span-dedup", type=int, default=None,
                    metavar="GRAM_N",
                    help="duplicated-span removal (Lee et al. 2022): drop "
                         "every non-first occurrence of any duplicated span "
                         "of at least GRAM_N tokens (50 is the standard)")
    ap.add_argument("--warc-input", default=None,
                    help="directory of WARC(.gz) archives instead of --input")
    ap.add_argument("--containment", type=float, default=None,
                    metavar="THRESHOLD",
                    help="winnowing containment dedup: drop docs whose "
                         "fingerprints are >= THRESHOLD contained in "
                         "another kept doc")
    ap.add_argument("--classifier-weights", default=None,
                    help="parquet (b, weight) table from "
                         "classify.train_ngram_nb; enables the model "
                         "quality gate")
    ap.add_argument("--classifier-threshold", type=float, default=0.5)
    ap.add_argument("--classifier-features", type=int, default=1 << 18,
                    help="hashed feature space size; MUST match training")
    ap.add_argument("--lm-table", default=None,
                    help="parquet (h, n, is_bigram) table from "
                         "lm.train_bigram_lm; enables the perplexity gate")
    ap.add_argument("--lm-max-ppl", type=float, default=None,
                    help="keep docs with lm_ppl <= this (requires --lm-table)")
    ap.add_argument("--drop-noindex", action=argparse.BooleanOptionalAction, default=False,
                    help="drop pages whose head metadata says robots noindex "
                         "(cheap prescan before full extraction)")
    ap.add_argument("--respect-canonical", action=argparse.BooleanOptionalAction, default=False,
                    help="also drop pages declaring a canonical url "
                         "different from their own")
    ap.add_argument("--robots", default=None,
                    help="parquet (host, robots_txt) table; enables the "
                         "robots.txt compliance gate before extraction")
    ap.add_argument("--robots-agent", default="*",
                    help="user-agent evaluated against the robots rules")
    ap.add_argument("--semantic-threshold", type=float, default=None,
                    help="enable SemDeDup-style embedding-space dedup at "
                         "this cosine threshold (stage 5c)")
    ap.add_argument("--semantic-method", choices=["lsh", "kmeans"],
                    default="lsh",
                    help="semantic dedup blocking: seeded hyperplane LSH "
                         "(default) or the paper-faithful k-means variant")
    ap.add_argument("--semantic-k", type=int, default=None,
                    help="k for --semantic-method kmeans (default: corpus "
                         "size / --semantic-cluster-size, the scale-safe "
                         "n-proportional choice)")
    ap.add_argument("--prototype-prune", type=float, default=None,
                    help="drop this fraction of the most-prototypical docs "
                         "per k-means cluster (SSP stage 5d; with "
                         "--semantic-method kmeans this is the D4 recipe)")
    ap.add_argument("--prototype-k", type=int, default=None,
                    help="k for the prototype-pruning clustering "
                         "(default: corpus size / --semantic-cluster-size)")
    ap.add_argument("--semantic-cluster-size", type=int, default=1024,
                    help="expected docs per cluster used to derive the "
                         "kmeans k defaults")
    ap.add_argument("--lang-allow", default=None, metavar="LANGS",
                    help="comma-separated language codes to keep "
                         "(e.g. 'en' or 'en,fr')")
    ap.add_argument("--lang-detect", action=argparse.BooleanOptionalAction, default=False,
                    help="re-detect language from the extracted text "
                         "(n-gram heuristic) instead of trusting the "
                         "declared lang column")
    ap.add_argument("--c4-line-clean", action=argparse.BooleanOptionalAction, default=False,
                    help="C4 line rules + doc gates (Raffel et al. 2020 "
                         "§2.2) before quality scoring")
    ap.add_argument("--c4-min-lines", type=int, default=3,
                    help="C4 doc gate: minimum kept lines (use 1 for "
                         "pre-collapsed text-passthrough corpora)")
    ap.add_argument("--flagged-wordlist", default=None, metavar="FILE",
                    help="file with one flagged token per line; drops docs "
                         "whose flagged-token ratio exceeds "
                         "--flagged-max-ratio (policy list is yours, never "
                         "baked in)")
    ap.add_argument("--flagged-max-ratio", type=float, default=0.01)
    ap.add_argument("--jsonl-output", default=None, metavar="DIR",
                    help="also export the corpus as gzip JSONL shards with "
                         "a checksummed manifest (the Dolma/FineWeb release "
                         "layout); global row order is by url")
    ap.add_argument("--jsonl-shards", type=int, default=None,
                    help="pin the JSONL shard count (default: let the "
                         "range exchange decide)")
    from jobs._cli import band_type

    ap.add_argument("--compression-band", default=None, metavar="LO:HI",
                    type=band_type,
                    help="keep docs whose zlib compression ratio lies in "
                         "[LO, HI] (e.g. 0.2:0.95) — drops over-compressible "
                         "template spam and incompressible noise")
    return ap


def main() -> None:
    ap = _build_parser()
    args = ap.parse_args()
    # Which flags did the user actually type? A second parse with every
    # default suppressed leaves only explicitly-provided dests — that is
    # the set allowed to override a --preset (argparse cannot distinguish
    # "passed the default value" from "not passed" in one parse).
    aux = _build_parser()
    for action in aux._actions:
        action.default = argparse.SUPPRESS
    provided = set(vars(aux.parse_args()))
    if (args.lm_table is None) != (args.lm_max_ppl is None):
        ap.error("--lm-table and --lm-max-ppl must be given together")
    if args.preset:
        from final_ocr_spark.presets import PRESETS

        if args.preset not in PRESETS:
            ap.error(f"unknown --preset {args.preset!r}; "
                     f"available: {sorted(PRESETS)}")

    from final_ocr_spark.session import get_spark

    spark = get_spark(app_name="final-ocr-spark-corpus")
    spark.sparkContext.setLogLevel("WARN")

    if args.synthetic:
        from final_ocr_spark.sources.synthetic_pages import gen_pages

        pages = gen_pages(spark, args.synthetic, seed=args.seed)
    elif args.warc_input:
        from pyspark.sql import functions as F

        from final_ocr_spark.sources.warc import read_warc

        parsed = read_warc(spark, args.warc_input).localCheckpoint(eager=False)
        # framing-quarantined archives must not vanish silently (the
        # streaming path prints a per-batch count + supports a quarantine
        # dir; the batch job matches that contract): record them in a
        # sidecar parquet next to --output and print the count
        bad = parsed.filter("error is not null").select(
            F.col("url").alias("source"), "error"
        )
        n_bad = bad.count()
        if n_bad:
            qdir = f"{args.output.rstrip('/')}_quarantine"
            bad.write.mode("overwrite").parquet(qdir)
            print(
                f"corpus_job: {n_bad} framing-quarantined WARC record(s) "
                f"excluded from the corpus — recorded at {qdir}"
            )
        pages = parsed.filter("error is null").drop("error")
    elif args.input:
        from final_ocr_spark.schema import PAGES_SCHEMA

        pages = spark.read.schema(PAGES_SCHEMA).parquet(args.input)
    else:
        ap.error("one of --input / --warc-input / --synthetic is required")

    blocked = None
    if args.blocked_domains:
        blocked = [
            ln.strip() for ln in
            pathlib.Path(args.blocked_domains).read_text().splitlines()
            if ln.strip()
        ]

    from final_ocr_spark.operators.urlfilter import DEFAULT_URL_PATTERNS
    from final_ocr_spark.pipeline import corpus_pipeline

    # (CLI dest, pipeline kwarg, value thunk) — thunks defer parquet reads
    # and file loads until the kwarg is actually selected.
    cli_kwargs = [
        ("blocked_domains", "blocked_domains", lambda: blocked),
        ("url_patterns", "url_patterns",
         lambda: DEFAULT_URL_PATTERNS if args.url_patterns else ()),
        ("host_boilerplate", "host_boilerplate_ratio",
         lambda: args.host_boilerplate),
        ("paragraph_dedup", "paragraph_dedup_min_chars",
         lambda: args.paragraph_dedup),
        ("sentence_dedup", "sentence_dedup_min_chars",
         lambda: args.sentence_dedup),
        ("mime_gate", "mime_gate", lambda: args.mime_gate),
        ("fix_mojibake", "fix_mojibake", lambda: args.fix_mojibake),
        ("span_dedup", "span_dedup_gram_n", lambda: args.span_dedup),
        ("min_quality", "min_quality", lambda: args.min_quality),
        ("gopher", "gopher", lambda: args.gopher),
        ("redact", "redact", lambda: args.redact),
        ("near_dup", "near_dup", lambda: args.near_dup),
        ("neardup_keep_best", "neardup_keep_best",
         lambda: args.neardup_keep_best),
        ("jaccard", "jaccard_threshold", lambda: args.jaccard),
        ("host_cap", "host_cap", lambda: args.host_cap),
        ("sample_rate", "sample_rate", lambda: args.sample_rate),
        ("sample_salt", "sample_salt", lambda: args.sample_salt),
        ("temperature_alpha", "temperature_alpha",
         lambda: args.temperature_alpha),
        ("temperature_group", "temperature_group",
         lambda: args.temperature_group),
        ("partitions", "extract_partitions", lambda: args.partitions),
        ("cluster_algorithm", "cluster_algorithm",
         lambda: args.cluster_algorithm),
        ("containment", "containment_threshold", lambda: args.containment),
        ("classifier_weights", "classifier_weights",
         lambda: (spark.read.parquet(args.classifier_weights)
                  if args.classifier_weights else None)),
        ("classifier_threshold", "classifier_threshold",
         lambda: args.classifier_threshold),
        ("classifier_features", "classifier_n_features",
         lambda: args.classifier_features),
        ("lm_table", "lm_table",
         lambda: (spark.read.parquet(args.lm_table)
                  if args.lm_table else None)),
        ("lm_max_ppl", "lm_max_ppl", lambda: args.lm_max_ppl),
        ("drop_noindex", "drop_noindex", lambda: args.drop_noindex),
        ("respect_canonical", "respect_canonical",
         lambda: args.respect_canonical),
        ("robots", "robots",
         lambda: (spark.read.parquet(args.robots)
                  if args.robots else None)),
        ("robots_agent", "robots_agent", lambda: args.robots_agent),
        ("semantic_threshold", "semantic_threshold",
         lambda: args.semantic_threshold),
        ("semantic_method", "semantic_method",
         lambda: args.semantic_method),
        ("semantic_k", "semantic_k", lambda: args.semantic_k),
        ("prototype_prune", "prototype_prune_frac",
         lambda: args.prototype_prune),
        ("prototype_k", "prototype_k", lambda: args.prototype_k),
        ("semantic_cluster_size", "semantic_cluster_size",
         lambda: args.semantic_cluster_size),
        ("lang_allow", "lang_allow",
         lambda: (tuple(s.strip() for s in args.lang_allow.split(",")
                        if s.strip())
                  if args.lang_allow else None)),
        ("lang_detect", "lang_detect", lambda: args.lang_detect),
        ("c4_line_clean", "c4_line_clean", lambda: args.c4_line_clean),
        ("c4_min_lines", "c4_min_lines", lambda: args.c4_min_lines),
        ("flagged_wordlist", "flagged_wordlist",
         lambda: ([ln.strip() for ln in
                   pathlib.Path(args.flagged_wordlist)
                   .read_text().splitlines() if ln.strip()]
                  if args.flagged_wordlist else None)),
        ("flagged_max_ratio", "flagged_max_ratio",
         lambda: args.flagged_max_ratio),
        ("compression_band", "compression_band",
         lambda: args.compression_band),
    ]
    if args.preset:
        from final_ocr_spark.presets import PRESETS, preset_kwargs

        overrides = {
            kwarg: thunk() for dest, kwarg, thunk in cli_kwargs
            if dest in provided
        }
        kwargs = preset_kwargs(args.preset, **overrides)
        print(f"preset {args.preset}: {PRESETS[args.preset]['cite']}")
        print(f"preset notes: {PRESETS[args.preset]['notes']}")
        if overrides:
            print(f"preset overrides from CLI: {sorted(overrides)}")
    else:
        kwargs = {kwarg: thunk() for _, kwarg, thunk in cli_kwargs}

    corpus = corpus_pipeline(pages, **kwargs)
    corpus.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"corpus written: {args.output} rows={n}")
    if args.jsonl_output:
        from final_ocr_spark.sources.shards import write_jsonl_shards

        rows_m = write_jsonl_shards(
            spark.read.parquet(args.output), args.jsonl_output, "url",
            num_shards=args.jsonl_shards,
        )
        recs = sum(m["records"] for m in rows_m)
        print(f"jsonl shards written: {args.jsonl_output} records={recs} "
              f"files={sum(1 for m in rows_m if m['file'])}")
    if args.wet_output:
        from final_ocr_spark.sources.warc import write_wet

        manifest = write_wet(
            spark.read.parquet(args.output), args.wet_output
        )
        recs = sum(m["records"] for m in manifest)
        print(f"wet written: {args.wet_output} records={recs} "
              f"files={sum(1 for m in manifest if m['file'])}")
    if args.tables_output:
        from final_ocr_spark.operators.tables import extract_tables

        tabs = extract_tables(
            pages, min_rows=args.tables_min_rows,
            min_cols=args.tables_min_cols, markdown=True,
        )
        tabs.write.mode("overwrite").parquet(args.tables_output)
        n_tabs = spark.read.parquet(args.tables_output).count()
        print(f"tables written: {args.tables_output} rows={n_tabs}")
    if args.wat_output:
        from final_ocr_spark.sources.warc import write_wat

        manifest = write_wat(pages, args.wat_output)
        recs = sum(m["records"] for m in manifest)
        print(f"wat written: {args.wat_output} records={recs} "
              f"files={sum(1 for m in manifest if m['file'])}")
    spark.stop()


if __name__ == "__main__":
    main()
