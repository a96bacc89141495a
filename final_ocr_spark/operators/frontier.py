"""Crawl-frontier construction: candidate URLs → prioritized fetch list.

The crawl-side capstone composing the engine's already-tested pieces, no
new per-row semantics:

    candidates (sitemap locs, extracted outlinks, seed lists)
      1. canonicalize     functions/urls.normalize_url (tracking params
                          dropped, default ports, www-strip, sorted query)
                          + one distinct on the canonical form
      2. robots gate      operators/robots.apply_robots (per-host rule
                          table, broadcast join, stdlib REP semantics)
      3. seen filter      operators/bloom.split_new_vs_maybe_seen against
                          the crawled-history Bloom: definitely-new rows
                          skip the expensive check entirely; maybe-seen
                          rows anti-join the EXACT history table when one
                          is supplied, else drop conservatively (costs
                          ~fpp of genuinely-new URLs, never re-fetches)
      4. prioritize       broadcast join of host → PageRank (links.pagerank
                          over the host graph); unknown hosts rank 0
      5. per-host cap     sampling.stratified_cap (salted two-phase — one
                          mega-host cannot serialize a task)

Output: (url, host, priority) — url is the CANONICAL form. Ordering is the
caller's: a global sort by priority is a single-partition bottleneck at
frontier scale; real schedulers consume per-host queues, which is exactly
the (host, priority) layout this returns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    stage-by-stage composition. ``seen_urls`` without ``seen_bloom`` does a
    full exact anti-join (correct, but the Bloom pre-split is the scale
    path); ``host_ranks`` is (id, rank) as produced by links.pagerank."""
    cand = candidates.select(normalize_url(F.col(url_col)).alias("url"))
    cand = cand.filter(F.col("url").isNotNull() & (F.col("url") != ""))
    cand = cand.distinct()

    if robots is not None:
        from final_ocr_spark.operators.robots import apply_robots

        cand = apply_robots(cand, robots, agent=robots_agent)

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

    out = cand.withColumn("host", url_parts(F.col("url"))["host"])
    if host_ranks is not None:
        ranks = host_ranks.select(
            F.col("id").alias("host"), F.col("rank").alias("priority")
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
