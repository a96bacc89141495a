"""Link analysis: outlink extraction → host graph → PageRank.

The web-corpus capability stack the extraction tier feeds: anchor/outlink
rows come out of the same tolerant HTML parse family as
extract/metadata.py, the host graph is one aggregation over slim rows, and
PageRank is the standard power iteration expressed as one equi-join + one
aggregation per round — the shape every distributed PageRank uses
(Malewicz et al.'s Pregel formulation collapses to exactly this join
under the DataFrame model). Domain-level rank is the classic quality
weight for crawl corpora (harmonic-centrality/PageRank domain ranking in
Common-Crawl-derived datasets).

Scale notes:

* ``extract_outlinks`` is one mapInPandas stage over (url, html) — no
  shuffle; a per-page link cap bounds the fan-out of list pages/link farms
  so one 100k-anchor page cannot blow up a batch.
* ``host_graph`` shuffles (src_host, dst_host) pairs — 2 short strings —
  never the html.
* ``pagerank`` keeps TWO slim tables per iteration: ranks(id, rank) and
  the static edges(src, dst, w). Each iteration = join on src (edges
  pre-partitioned by src once, reused every round) + groupBy dst.
  Dangling-node mass is a 1-row aggregate broadcast back via crossJoin —
  no driver collect. Lineage is truncated every few rounds with
  localCheckpoint (the driver-loop-with-barrier pattern shared with
  dedup_clusters, dedup.py:dedup_clusters).
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser
from urllib.parse import urljoin, urlsplit

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from final_ocr_spark.functions.urls import HOST_RE

_SKIP_SCHEMES = ("javascript:", "mailto:", "tel:", "data:", "about:")


class _LinkParser(HTMLParser):
    """Tolerant streaming <a href> collector with <base href> support."""

    def __init__(self, max_links: int) -> None:
        super().__init__(convert_charrefs=True)
        self.max_links = max_links
        self.links: list[tuple[str, bool]] = []  # (href, nofollow)
        self.anchor_parts: list[list[str]] = []
        self.base: str | None = None
        self._capturing = False  # inside the most recent <a href>
        self._anchor_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "base" and self.base is None:
            a = dict(attrs)
            href = (a.get("href") or "").strip()
            if href:
                self.base = href
        elif tag == "a":
            # a new <a> implicitly closes an unclosed previous one (the
            # HTML spec forbids nesting; browsers auto-close)
            self._capturing = False
            if len(self.links) >= self.max_links:
                return
            a = dict(attrs)
            href = (a.get("href") or "").strip()
            if not href:
                return
            rels = (a.get("rel") or "").lower().split()
            self.links.append((href, "nofollow" in rels))
            self.anchor_parts.append([])
            self._capturing = True
            self._anchor_chars = 0

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._capturing = False

    def handle_data(self, data: str) -> None:
        # 500-char anchor bound: an unclosed <a> on a malformed page must
        # not capture the rest of the document as "anchor text"
        if self._capturing and self._anchor_chars < 500:
            self.anchor_parts[-1].append(data[: 500 - self._anchor_chars])
            self._anchor_chars += len(data)


def parse_outlinks(
    url: str, raw: bytes | None, *, max_links: int = 1000
) -> list[tuple[str, str, bool]]:
    """(page url, html bytes) → [(abs_url, anchor_text, nofollow)].

    Pure function: charset-sniffed decode (extract/metadata.py), tolerant
    parse, relative hrefs resolved against <base href> (falling back to the
    page url), fragments dropped, non-navigational schemes skipped, http(s)
    only. Malformed markup degrades to the links seen — never raises."""
    if raw is None:
        return []
    from final_ocr_spark.extract.metadata import decode_html

    text, _, _ = decode_html(bytes(raw))
    p = _LinkParser(max_links)
    try:
        p.feed(text)
        p.close()
    except Exception:
        pass

    # the HTML spec resolves <base href> itself against the document URL
    # (relative bases like href="/en/" are legal); an absolute base passes
    # through urljoin unchanged, so this is a no-op for the common case
    if p.base:
        try:
            base = urljoin(url, p.base)
        except ValueError:
            base = url
    else:
        base = url
    out: list[tuple[str, str, bool]] = []
    for (href, nofollow), parts in zip(p.links, p.anchor_parts):
        low = href.lower()
        if any(low.startswith(s) for s in _SKIP_SCHEMES):
            continue
        try:
            absu = urljoin(base, href)
        except ValueError:
            continue
        sp = urlsplit(absu)
        if sp.scheme not in ("http", "https") or not sp.netloc:
            continue
        absu = absu.split("#", 1)[0]
        if not absu:
            continue
        anchor = " ".join("".join(parts).split())
        out.append((absu, anchor, nofollow))
    return out


_LINK_COLUMNS = ["url", "target_url", "anchor_text", "nofollow"]
_LINK_SCHEMA = "url string, target_url string, anchor_text string, nofollow boolean"


def _link_batches(
    batches: Iterator[pd.DataFrame], max_links: int
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        urls = pdf["url"].tolist()
        htmls = pdf["html"].tolist()
        cols: dict[str, list] = {name: [] for name in _LINK_COLUMNS}
        for u, h in zip(urls, htmls):
            try:
                links = parse_outlinks(u, h, max_links=max_links)
            except Exception:
                links = []  # per-row quarantine: a bad page yields no edges
            for absu, anchor, nofollow in links:
                cols["url"].append(u)
                cols["target_url"].append(absu)
                cols["anchor_text"].append(anchor)
                cols["nofollow"].append(nofollow)
        yield pd.DataFrame(cols, columns=_LINK_COLUMNS)


def extract_outlinks(pages: DataFrame, *, max_links: int = 1000) -> DataFrame:
    """pages(url, html, ...) → (url, target_url, anchor_text, nofollow).

    1→N mapInPandas stage (a page yields zero or more edge rows); scan is
    pruned to (url, html); no shuffle. ``max_links`` bounds per-page
    fan-out — link farms produce pathological anchor counts and the cap is
    the standard defense (dropped tails are the lowest-value edges)."""

    def _fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _link_batches(it, max_links)

    return pages.select("url", "html").mapInPandas(_fn, schema=_LINK_SCHEMA)


def host_graph(
    outlinks: DataFrame, *, drop_nofollow: bool = True, drop_self: bool = True
) -> DataFrame:
    """(url, target_url, nofollow) edge rows → (src_host, dst_host, weight).

    weight = number of links between the host pair. One aggregation over
    slim string pairs; self-edges (intra-host navigation — the vast
    majority of links on real sites) are dropped by default since they
    carry no cross-site endorsement signal."""
    e = outlinks
    if drop_nofollow:
        e = e.filter(~F.col("nofollow"))
    pairs = e.select(
        F.lower(F.regexp_extract("url", HOST_RE, 1)).alias("src_host"),
        F.lower(F.regexp_extract("target_url", HOST_RE, 1)).alias("dst_host"),
    ).filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
    if drop_self:
        pairs = pairs.filter(F.col("src_host") != F.col("dst_host"))
    return pairs.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("weight")
    )


def anchor_text_corpus(
    outlinks: DataFrame,
    *,
    top_k: int = 5,
    max_targets_per_anchor: int | None = None,
    drop_nofollow: bool = True,
) -> DataFrame:
    """Inlink anchor aggregation: (target_url, anchors array<struct<anchor,
    n_pages>>, n_inlinks) — what the web says a page is about, the classic
    off-page relevance/summary signal for search and training corpora.

    Scale shape: one aggregation to (target_url, anchor) counts — anchor
    strings are ≤500 chars by extract_outlinks's bound, and n_pages is
    counted DISTINCT by source url so a single hub page repeating an anchor
    1000× contributes 1 — then a per-target top-k window over rows already
    clustered by the first aggregation's partitioning (no second exchange).
    Empty anchors are dropped (image links). ``max_targets_per_anchor``
    caps how many distinct targets one anchor string may keep — spam rings
    stamp one anchor across millions of targets; None disables."""
    e = outlinks
    if drop_nofollow:
        e = e.filter(~F.col("nofollow"))
    e = e.filter(F.col("anchor_text") != "")
    counts = e.groupBy("target_url", "anchor_text").agg(
        F.count_distinct("url").alias("n_pages")
    )
    if max_targets_per_anchor is not None:
        w_spam = Window.partitionBy("anchor_text").orderBy(
            F.desc("n_pages"), F.col("target_url")
        )
        counts = (
            counts.withColumn("_ar", F.row_number().over(w_spam))
            .filter(F.col("_ar") <= max_targets_per_anchor)
            .drop("_ar")
        )
    w = Window.partitionBy("target_url").orderBy(
        F.desc("n_pages"), F.col("anchor_text")
    )
    # n_inlinks counts ALL distinct (source page, anchor) contributions to
    # the target — computed by an unbounded window over the same target
    # partitioning BEFORE the top-k filter trims the anchor list (same
    # exchange, no second shuffle)
    return (
        counts.withColumn("_r", F.row_number().over(w))
        .withColumn(
            "n_inlinks", F.sum("n_pages").over(Window.partitionBy("target_url"))
        )
        .filter(F.col("_r") <= top_k)
        .groupBy("target_url")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_r", "anchor_text", "n_pages"))
            ).alias("_a"),
            F.first("n_inlinks").alias("n_inlinks"),
        )
        .select(
            "target_url",
            F.transform(
                F.col("_a"), lambda s: F.struct(s["anchor_text"].alias("anchor"), s["n_pages"].alias("n_pages"))
            ).alias("anchors"),
            "n_inlinks",
        )
    )


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str | None = "weight",
    iterations: int = 20,
    damping: float = 0.85,
    checkpoint_every: int = 5,
    partitions: int | None = None,
    with_residual: bool = False,
) -> DataFrame:
    """Weighted PageRank by power iteration → (id, rank); ranks sum to 1.
    With ``with_residual=True`` an ``l1_delta`` column (constant across
    rows) carries Σ|rank_final − rank_prev| — the final-round L1 movement —
    so a fixed-iteration run is OBSERVABLY converged instead of trusted:
    one extra equi-join + 1-row aggregate attached by the same no-collect
    crossJoin pattern as the dangling mass, only when asked for.

    Textbook formulation (Page et al. 1999, the weighted variant):

        rank'(v) = (1-d)/N + d * ( Σ_{u→v} rank(u) * w(u,v)/outw(u)
                                   + dangling_mass / N )

    where ``dangling_mass`` is the rank held by vertices with no out-edges
    (their mass redistributes uniformly — the standard fix that keeps the
    distribution stochastic).

    Per iteration: one equi-join of ranks(id, rank) with the STATIC
    normalized edge table (pre-partitioned on ``src`` once and
    localCheckpointed — every round's join reuses that one layout) and one
    groupBy on ``dst``; the dangling mass is a 1-row aggregate attached by
    crossJoin (Spark plans a broadcast nested loop over a single row — the
    same no-collect scalar pattern as tf_idf's corpus size). Deterministic:
    no sampling, no tolerance-based early exit — fixed ``iterations``
    rounds (tolerance exits depend on float summation order; a fixed count
    is reproducible across cluster sizes).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    w = (
        F.col(weight).cast("double")
        if weight is not None
        else F.lit(1.0)
    )
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), w.alias("_w")
    )
    if partitions:
        e = e.repartition(partitions, "_src")
    else:
        e = e.repartition("_src")
    # normalize once: w/outw(u) — one extra aggregation+join at build time
    outw = e.groupBy("_src").agg(F.sum("_w").alias("_outw"))
    norm = e.join(outw, "_src").select(
        "_src", "_dst", (F.col("_w") / F.col("_outw")).alias("_p")
    )
    norm = norm.localCheckpoint(eager=False)

    verts = (
        e.select(F.col("_src").alias("id"))
        .unionByName(e.select(F.col("_dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = verts.count()
    if n == 0:
        out = verts.select("id", F.lit(0.0).alias("rank"))
        return out.withColumn("l1_delta", F.lit(0.0)) if with_residual else out
    has_out = norm.select(F.col("_src").alias("id")).distinct()
    ranks = verts.select("id", (F.lit(1.0) / F.lit(float(n))).alias("rank"))

    prev = None
    for i in range(iterations):
        if with_residual and i + 1 == iterations:
            # snapshot the pre-final-round ranks; materialized so the
            # residual join doesn't re-execute the whole iteration lineage
            prev = ranks.localCheckpoint(eager=True)
            ranks = prev
        # mass parked on dangling vertices this round (1-row aggregate)
        dangling = (
            ranks.join(has_out, "id", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        contribs = (
            ranks.join(norm, ranks["id"] == norm["_src"])
            .groupBy(F.col("_dst").alias("id"))
            .agg(F.sum(F.col("rank") * F.col("_p")).alias("_in"))
        )
        ranks = (
            verts.join(contribs, "id", "left")
            .crossJoin(dangling)
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_in"), F.lit(0.0)) + F.col("_dm") / F.lit(float(n)))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            # truncate the per-round join lineage (same barrier pattern as
            # dedup_clusters) — without it round k's plan contains k copies
            # of the join tree and planning time grows superlinearly
            ranks = ranks.localCheckpoint(eager=True)
    if not with_residual:
        return ranks
    delta = (
        ranks.join(prev.select("id", F.col("rank").alias("_prev")), "id")
        .agg(
            F.coalesce(
                F.sum(F.abs(F.col("rank") - F.col("_prev"))), F.lit(0.0)
            ).alias("l1_delta")
        )
    )
    return ranks.crossJoin(delta)
