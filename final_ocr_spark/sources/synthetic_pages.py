"""Deterministic synthetic Common-Crawl-style pages corpus.

The driver provides no ``pages`` table, and the north rule forbids external
data — so the engine ships a seeded generator producing the mandated shape
``pages(url, warc_ts, html, text, lang)`` (BASELINE.json input_hint) at any
scale. Each row is a pure function of ``(seed, doc_id)``; generation happens
on executors inside ``mapInPandas`` over ``spark.range(n)``, so a 10^9-row
corpus costs no driver memory and no shuffle.

Corpus properties (FIXTURES.md §1):

* **Skewed hosts** — Zipf-ish: host 0 owns ~20% of rows, host 1 ~10%, the
  rest spread over 1000 hosts → exercises salted repartitioning.
* **Duplicate urls** with differing ``warc_ts`` (~3% of rows) → exercises
  latest-wins dedup (SURVEY A6).
* **PDF-branch payloads** (~10%): the %PDFTOK token/layout format, including
  two-column layouts and hyphenated line breaks → exercises XY-cut.
* **Malformed HTML** (~8%): truncation, unclosed tags, entity noise.
* **Heavy-tailed document length** — a few docs are ~50× median → compute
  skew invisible to AQE's size-based detection (SURVEY §4.3).
* **Multi-language** content with per-language word stock so langid is
  testable; ``lang`` column null for ~30% of rows (engine must detect).
"""

from __future__ import annotations

import datetime as dt
import random

WORDS = {
    "en": ("the quick brown fox jumps over lazy dog data pipeline spark cluster "
           "extraction content page article heading paragraph value metric shard "
           "partition shuffle broadcast join aggregate window stream batch").split(),
    "de": ("der schnelle braune fuchs springt über den faulen hund daten seite "
           "inhalt artikel absatz wert kennzahl verteilung partition strom").split(),
    "es": ("el rápido zorro marrón salta sobre perro perezoso datos página "
           "contenido artículo párrafo valor métrica partición flujo lote").split(),
    "fr": ("le rapide renard brun saute par dessus chien paresseux données page "
           "contenu article paragraphe valeur métrique partition flux lot").split(),
}
LANGS = tuple(WORDS)
BASE_TS = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
N_HOSTS = 1000


def _host_for(rng: random.Random) -> str:
    u = rng.random()
    if u < 0.20:
        idx = 0
    elif u < 0.30:
        idx = 1
    elif u < 0.37:
        idx = 2
    else:
        idx = 3 + rng.randrange(N_HOSTS - 3)
    return f"host{idx:04d}.example.org"


def _sentence(rng: random.Random, words: list[str], n: int) -> str:
    toks = [rng.choice(words) for _ in range(n)]
    s = " ".join(toks)
    return s[0].upper() + s[1:] + "."


def _paragraph(rng: random.Random, words: list[str], n_sent: int) -> str:
    return " ".join(_sentence(rng, words, rng.randrange(6, 16)) for _ in range(n_sent))


def _value_noise(rng: random.Random) -> str:
    """Sprinkle date/id/amount-shaped values so span labeling has targets
    (generalizes the reference's invoice fields, SURVEY R1-R3/R10)."""
    kind = rng.randrange(3)
    if kind == 0:
        return f"{rng.randrange(1, 29):02d}/{rng.randrange(1, 13):02d}/{rng.randrange(2010, 2026)}"
    if kind == 1:
        return str(rng.randrange(10**7, 10**9))
    return f"$ {rng.randrange(1, 999)},{rng.randrange(100, 999)}.{rng.randrange(10, 99)}"


def _gen_html(
    rng: random.Random, lang: str, doc_id: int, size_mult: int = 1
) -> tuple[bytes, str]:
    words = WORDS[lang]
    title = _sentence(rng, words, rng.randrange(3, 7))[:-1]
    # heavy-tailed article length: 1% of docs are huge (compute skew).
    # size_mult scales content volume (default pages are ~3 KB; real
    # Common-Crawl pages are 30-70 KB — the bench corpus uses size_mult>1)
    r = rng.random()
    if r < 0.01:
        n_paras = rng.randrange(120, 260) * size_mult
    elif r < 0.10:
        n_paras = rng.randrange(25, 60) * size_mult
    else:
        n_paras = rng.randrange(3, 12) * size_mult

    nav_links = " ".join(
        f'<a href="/cat/{i}">{rng.choice(words)}</a>' for i in range(rng.randrange(8, 20))
    )
    sidebar = " ".join(
        f'<a href="/rel/{i}">{_sentence(rng, words, 3)[:-1]}</a><br/>'
        for i in range(rng.randrange(4, 10))
    )
    paras = []
    plain_parts = [title]
    for pi in range(n_paras):
        p = _paragraph(rng, words, rng.randrange(2, 6))
        if rng.random() < 0.25:
            p += " " + _value_noise(rng)
        tag = "p"
        if pi and rng.random() < 0.08:
            h = _sentence(rng, words, rng.randrange(2, 5))[:-1]
            paras.append(f"<h2>{h}</h2>")
            plain_parts.append(h)
        if rng.random() < 0.06:
            items = "".join(
                f"<li>{_sentence(rng, words, rng.randrange(4, 9))}</li>"
                for _ in range(rng.randrange(2, 6))
            )
            paras.append(f"<ul>{items}</ul>")
        paras.append(f"<{tag}>{p}</{tag}>")
        plain_parts.append(p)

    html = (
        f"<!DOCTYPE html><html><head><title>{title}</title>"
        f"<script>var x = {doc_id};</script><style>.a{{color:red}}</style></head>"
        f"<body><nav>{nav_links}</nav>"
        f"<header><a href='/'>home</a> &raquo; {rng.choice(words)}</header>"
        f"<div id='content'><article><h1>{title}</h1>{''.join(paras)}</article></div>"
        f"<aside>{sidebar}</aside>"
        f"<footer>&copy; 2024 {rng.choice(words)} <a href='/tos'>terms</a></footer>"
        f"</body></html>"
    )
    # malformed fraction: truncation / unclosed tags / entity junk
    m = rng.random()
    if m < 0.03:
        html = html[: int(len(html) * rng.uniform(0.3, 0.9))]
    elif m < 0.06:
        html = html.replace("</p>", "", 3).replace("</div>", "", 1)
    elif m < 0.08:
        html = html.replace(" ", "&nbsp;", 5) + "&unknownentity;<"
    return html.encode("utf-8"), " ".join(" ".join(plain_parts).split())


def _gen_pdftok(rng: random.Random, lang: str, size_mult: int = 1) -> tuple[bytes, str]:
    words = WORDS[lang]
    two_col = rng.random() < 0.4
    cols = [60.0, 360.0] if two_col else [60.0]  # gutter ≥60pt > MIN_X_GAP
    col_w = 240.0 if two_col else 480.0
    lines = ["%PDFTOK 1"]
    plain: list[str] = []
    for cx in cols:
        y = 60.0
        n_paras = rng.randrange(2, 6) * size_mult
        for _ in range(n_paras):
            n_lines = rng.randrange(2, 7)
            para_words: list[str] = []
            for li in range(n_lines):
                x = cx
                n_tok = rng.randrange(4, 9)
                for ti in range(n_tok):
                    w = rng.choice(words)
                    if li < n_lines - 1 and ti == n_tok - 1 and rng.random() < 0.15:
                        w = w + "-"
                    tw = 6.0 * len(w)
                    if x + tw > cx + col_w:
                        break
                    lines.append(f"{w} {x:.1f} {y:.1f} {x + tw:.1f} {y + 10.0:.1f}")
                    para_words.append(w)
                    x += tw + 4.0
                y += 14.0
            y += 30.0  # paragraph gap
            # reproduce hyphenation-merge in the plain text oracle
            merged: list[str] = []
            for w in para_words:
                if merged and merged[-1].endswith("-"):
                    merged[-1] = merged[-1][:-1] + w
                else:
                    merged.append(w)
            plain.append(" ".join(merged))
    return "\n".join(lines).encode("utf-8"), " ".join(plain)


def _gen_tables_html(rng: random.Random, lang: str) -> str:
    """1-3 data tables for with_tables pages (independent rng stream)."""
    words = WORDS[lang]
    out = []
    for _ in range(rng.randrange(1, 4)):
        n_cols = rng.randrange(2, 6)
        n_rows = rng.randrange(2, 9)
        header = "".join(f"<th>{rng.choice(words)}</th>" for _ in range(n_cols))
        body = "".join(
            "<tr>" + "".join(
                f"<td>{rng.choice(words)} {rng.randrange(1000)}</td>"
                for _ in range(n_cols)
            ) + "</tr>"
            for _ in range(n_rows)
        )
        cap = (f"<caption>{_sentence(rng, words, 3)[:-1]}</caption>"
               if rng.random() < 0.4 else "")
        out.append(f"<table>{cap}<tr>{header}</tr>{body}</table>")
    return "".join(out)


def gen_page_row(
    seed: int, doc_id: int, size_mult: int = 1, with_tables: bool = False
) -> dict:
    """Pure function (seed, doc_id, size_mult) → one pages row."""
    rng = random.Random((seed << 32) ^ doc_id)
    lang = LANGS[rng.randrange(len(LANGS))] if rng.random() < 0.85 else "en"
    # ~3% duplicate urls: doc i with i%31==1 reuses doc (i-1)'s url
    url_id = doc_id - 1 if (doc_id % 31 == 1 and doc_id > 0) else doc_id
    url_rng = random.Random((seed << 32) ^ url_id ^ 0x5EED)
    host = _host_for(url_rng)
    url = f"https://{host}/p/{url_id:09d}"
    ts = BASE_TS + dt.timedelta(seconds=doc_id * 7)

    if rng.random() < 0.10:
        html, plain = _gen_pdftok(rng, lang, size_mult)
    else:
        html, plain = _gen_html(rng, lang, doc_id, size_mult)

    text_col = plain if rng.random() < 0.5 else None
    lang_col = lang if rng.random() < 0.7 else None

    # opt-in table injection on an INDEPENDENT rng stream: the draws above
    # are untouched, so all pinned byte-identity goldens (with_tables=False)
    # stay frozen. ~40% of html pages get 1-3 data tables inside <article>.
    if with_tables and html.startswith(b"<!DOCTYPE"):
        trng = random.Random((seed << 32) ^ doc_id ^ 0x7AB1E5)
        if trng.random() < 0.4:
            tables = _gen_tables_html(trng, lang).encode("utf-8")
            html = html.replace(b"</article>", tables + b"</article>", 1)
    return {
        "url": url,
        "warc_ts": ts.replace(tzinfo=None),  # Spark TimestampType, session UTC
        "html": html,
        "text": text_col,
        "lang": lang_col,
    }


def gen_pages(
    spark, n_docs: int, seed: int = 42, partitions: int | None = None,
    start: int = 0, size_mult: int = 1, with_tables: bool = False,
):
    """Distributed deterministic corpus: spark.range → mapInPandas generator.

    Scales linearly with executors; no driver-side data; identical content for
    identical (n_docs, seed, start) regardless of parallelism (the determinism
    the reference's glob-ordered loop lacks, SURVEY A7). ``start`` offsets the
    doc-id range — disjoint batches of the SAME seed never collide on
    (url, warc_ts), which different seeds can (each seed redraws hosts, and
    hot hosts overlap).
    """
    import pandas as pd  # noqa: PLC0415 — executor-side import

    from final_ocr_spark.schema import PAGES_SCHEMA

    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    def _gen(batches):
        for pdf in batches:
            rows = [gen_page_row(seed, int(i), size_mult, with_tables)
                    for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in PAGES_SCHEMA.fields])

    return (
        spark.range(start, start + n_docs, 1, partitions)
        .mapInPandas(_gen, schema=PAGES_SCHEMA)
    )
