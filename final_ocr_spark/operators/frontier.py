"""Crawl-frontier construction: candidate URLs → prioritized fetch list.

The crawl-side capstone composing the engine's already-tested pieces, no
new per-row semantics:

    candidates (sitemap locs, extracted outlinks, seed lists)
      1. robots gate      operators/robots.apply_robots on the RAW
                          candidate URLs — robots rules match the
                          as-published host and path, and canonicalization
                          rewrites both (www-strip, trailing-slash strip),
                          so gating canonical forms would silently bypass
                          rules keyed by e.g. 'www.example.com' or
                          'Disallow: /private/'
      2. canonicalize     functions/urls.normalize_url (tracking params
                          dropped, default ports, www-strip, sorted query)
                          + one distinct on the canonical form (a URL is
                          kept if ANY of its raw variants is robots-allowed)
      3. seen filter      operators/bloom.split_new_vs_maybe_seen against
                          the crawled-history Bloom: definitely-new rows
                          skip the expensive check entirely; maybe-seen
                          rows anti-join the EXACT history table when one
                          is supplied, else drop conservatively (costs
                          ~fpp of genuinely-new URLs, never re-fetches).
                          CONTRACT: history and Bloom are keyed by the
                          CANONICAL url — i.e. by this function's own
                          output, which is what a crawler's fetch ledger
                          naturally contains. A raw-keyed Bloom would
                          misclassify seen URLs as definitely-new (Bloom
                          probes cannot be normalized after the fact);
                          the exact table is normalize_url'd defensively
                          (idempotent on canonical input).
      4. prioritize       broadcast join of host → PageRank (links.pagerank
                          over the host graph). Rank ids keep the authority
                          as crawled (host_graph never strips www), while
                          the frontier host is canonical — so rank ids are
                          lowercased, www-stripped, and summed per
                          canonical host before the join; unknown hosts
                          rank 0
      5. per-host cap     sampling.stratified_cap (salted two-phase — one
                          mega-host cannot serialize a task)

Output: (url, host, priority) — url is the CANONICAL form. Ordering is the
caller's: a global sort by priority is a single-partition bottleneck at
frontier scale; real schedulers consume per-host queues, which is exactly
the (host, priority) layout this returns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from final_ocr_spark.functions.urls import normalize_url, url_parts


def build_frontier(
    candidates: DataFrame,
    *,
    robots: DataFrame | None = None,
    robots_agent: str = "*",
    seen_bloom: DataFrame | None = None,
    seen_urls: DataFrame | None = None,
    host_ranks: DataFrame | None = None,
    per_host_cap: int | None = None,
    url_col: str = "url",
) -> DataFrame:
    """(url, host, priority) fetch frontier from candidate URLs. Every
    input is optional except the candidates; see module doc for the
    stage-by-stage composition and the canonical-url contract on
    ``seen_bloom``/``seen_urls``. ``seen_urls`` without ``seen_bloom``
    does a full exact anti-join (correct, but the Bloom pre-split is the
    scale path); ``host_ranks`` is (id, rank) as produced by
    links.pagerank."""
    raw = candidates.select(F.col(url_col).alias("url"))
    raw = raw.filter(F.col("url").isNotNull() & (F.col("url") != ""))

    # 1. robots gate on RAW urls — rules are written against the
    # as-published host and path (see module doc)
    if robots is not None:
        from final_ocr_spark.operators.robots import apply_robots

        raw = apply_robots(raw, robots, agent=robots_agent)

    # 2. canonicalize + distinct
    cand = raw.select(normalize_url(F.col("url")).alias("url"))
    cand = cand.filter(F.col("url").isNotNull() & (F.col("url") != ""))
    cand = cand.distinct()

    # 3. seen filter (canonical-url contract — see module doc)
    if seen_bloom is not None:
        from final_ocr_spark.operators.bloom import split_new_vs_maybe_seen

        new, maybe = split_new_vs_maybe_seen(cand, seen_bloom, key="url")
        if seen_urls is not None:
            maybe = maybe.join(
                seen_urls.select(normalize_url(F.col(url_col)).alias("url")),
                "url",
                "left_anti",
            )
            cand = new.unionByName(maybe)
        else:
            # no exact history to consult: drop all maybe-seen rows — loses
            # ~fpp of genuinely-new URLs (bounded, documented) but never
            # re-fetches; a crawler that must not miss URLs passes seen_urls
            cand = new
    elif seen_urls is not None:
        cand = cand.join(
            seen_urls.select(normalize_url(F.col(url_col)).alias("url")),
            "url",
            "left_anti",
        )

    # 4. priority: rank ids normalized to the frontier's canonical host
    # form (lowercase, www-stripped) and summed — www.x.com and x.com are
    # one site for scheduling purposes
    out = cand.withColumn("host", url_parts(F.col("url"))["host"])
    # non-absolute candidates (relative paths, junk lines from text
    # sitemaps) pass through normalize_url trimmed and have no host —
    # unfetchable, drop
    out = out.filter(F.col("host") != "")
    if host_ranks is not None:
        ranks = (
            host_ranks.select(
                F.regexp_replace(F.lower(F.col("id")), r"^www\.", "").alias("host"),
                F.col("rank"),
            )
            .groupBy("host")
            .agg(F.sum("rank").alias("priority"))
        )
        out = out.join(F.broadcast(ranks), "host", "left").withColumn(
            "priority", F.coalesce(F.col("priority"), F.lit(0.0))
        )
    else:
        out = out.withColumn("priority", F.lit(0.0))
    out = out.select("url", "host", "priority")

    if per_host_cap is not None:
        from final_ocr_spark.operators.sampling import stratified_cap

        out = stratified_cap(
            out, "host", ["url"], per_host_cap, salt_buckets=16, salt_key="url"
        )
    return out


def schedule_frontier(
    frontier: DataFrame,
    *,
    per_host_per_wave: int = 1,
    wave_seconds: float = 1.0,
    host_delays: DataFrame | None = None,
    max_delay_waves: int = 3600,
) -> DataFrame:
    """Politeness scheduling: assign each frontier url a fetch ``wave`` so
    that any single wave contains at most ``per_host_per_wave`` urls per
    host — the fetch-loop contract that keeps a distributed crawler from
    hammering one origin, applied as data instead of runtime coordination
    (fetchers consume wave by wave; within a wave, everything is safely
    parallel).

    ``host_delays`` (host, crawl_delay seconds — operators/robots.py:
    crawl_delays' shape) stretches a host's schedule to honor its declared
    delay: with waves ``wave_seconds`` apart, a host asking for ``d``
    seconds between fetches gets one url every ``ceil(d / wave_seconds)``
    waves (capped at ``max_delay_waves`` against hostile directives; null
    delay → stride 1). Ordering within a host is priority-descending with a
    url tiebreak — fully deterministic.

    Scale shape: ONE hash exchange on host + a per-host window row_number —
    no global sort (a total order over 10^9 frontier rows is a
    single-partition bottleneck; wave numbers give consumers the same
    coordination for free). The delays dimension is O(#hosts) and joins
    broadcast."""
    if per_host_per_wave < 1:
        raise ValueError("per_host_per_wave must be >= 1")
    if wave_seconds <= 0:
        raise ValueError("wave_seconds must be > 0")
    w = Window.partitionBy("host").orderBy(
        F.desc("priority"), F.asc("url")
    )
    out = frontier.withColumn("_rank", F.row_number().over(w) - F.lit(1))
    if host_delays is not None:
        # Canonicalize the delays key the same way build_frontier's hosts
        # are (normalize_url strips a leading www.) — robots crawl_delays
        # arrive keyed by the host the robots.txt was fetched from, which
        # for a www.-published site is 'www.example.com' while the frontier
        # row says 'example.com'; an un-stripped join silently drops the
        # declared Crawl-delay (review-caught). max() per canonical host is
        # the conservative merge when www/apex declare different delays.
        d = (
            host_delays.select(
                F.regexp_replace(
                    F.lower(F.col("host")), r"^www\.", ""
                ).alias("host"),
                F.col("crawl_delay").alias("_delay"),
            )
            .groupBy("host")
            .agg(F.max("_delay").alias("_delay"))
        )
        out = out.join(F.broadcast(d), "host", "left")
        stride = F.least(
            F.greatest(F.ceil(F.col("_delay") / F.lit(float(wave_seconds))),
                       F.lit(1)),
            F.lit(max_delay_waves),
        )
        # a host that declared a delay gets ONE url per wave-group — k>1
        # inside a wave would mean k simultaneous fetches to a host that
        # asked for spacing between every request (review-caught)
        wave = F.when(
            F.col("_delay").isNotNull(), F.col("_rank") * stride
        ).otherwise(F.floor(F.col("_rank") / F.lit(per_host_per_wave)))
    else:
        wave = F.floor(F.col("_rank") / F.lit(per_host_per_wave))
    out = out.withColumn("wave", wave.cast("long"))
    return out.select(
        *[c for c in frontier.columns], "wave"
    )
