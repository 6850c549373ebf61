"""Composed URL-discovery frontier: every channel the engine mines, merged.

A production crawl's frontier is fed by more than link extraction: seed
lists (reference crawler.py seed handling), sitemap <urlset> entries,
RSS/Atom feed items, publisher-declared hreflang alternates, rel=next
pagination targets, meta-refresh targets, and HTTP redirect destinations.
This plan unions all seven channels with a fixed priority order and
attributes each discovered URL to its highest-priority channel, plus how
many distinct channels independently surfaced it (a cheap confidence /
spam signal: a URL only ever seen via redirects is worth less than one a
sitemap AND a feed both declare).

Scale shape: each channel is the already-graded map-side extraction; the
union is channel-grain rows (url, prio) — orders of magnitude below the
page corpus — and the merge is ONE partial-agg'd exchange on url.
Canonicalization (P5) and the seen anti-join run downstream in the crawl
loop exactly as for link-extracted candidates; this plan is the feeder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from web_crawler_spark.functions import html_parse
from web_crawler_spark.functions.html_parse import _NEXT_RE
from web_crawler_spark.sources import feeds as feeds_src
from web_crawler_spark.sources import robots as robots_src

CHANNELS = [
    "seed", "sitemap", "feed", "hreflang", "pagination", "refresh", "redirect",
]
_CHANNEL_CASE = (
    "CASE min(prio) "
    + " ".join(f"WHEN {i} THEN '{c}'" for i, c in enumerate(CHANNELS))
    + " END"
)


def discovery_frontier(
    seeds: DataFrame,
    sitemaps: DataFrame,
    feeds: DataFrame,
    pages_ext: DataFrame,
    redirects: DataFrame,
) -> DataFrame:
    """(url, channel, n_channels) — channel = highest-priority discoverer
    (CHANNELS order), n_channels = distinct channels that surfaced it."""
    parts = [
        seeds.select("url", F.lit(0).alias("prio")),
        robots_src.parse_sitemap_xml(sitemaps)
        .where((F.col("kind") == "url") & (F.col("loc") != ""))
        .select(F.col("loc").alias("url"), F.lit(1).alias("prio")),
        feeds_src.parse_feed_xml(feeds).select(
            F.col("link").alias("url"), F.lit(2).alias("prio")
        ),
        html_parse.hreflang_edges(pages_ext).select(
            F.col("href").alias("url"), F.lit(3).alias("prio")
        ),
        pages_ext.select(
            F.regexp_extract(F.col("html"), _NEXT_RE, 1).alias("url"),
            F.lit(4).alias("prio"),
        ).where(F.col("url") != ""),
        html_parse.refresh_edges(pages_ext).select(
            F.col("target").alias("url"), F.lit(5).alias("prio")
        ),
        redirects.select(F.col("dst_url").alias("url"), F.lit(6).alias("prio")),
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("url").agg(
        F.expr(_CHANNEL_CASE).alias("channel"),
        F.countDistinct("prio").cast("long").alias("n_channels"),
    )


def duck_discovery_sql(
    seeds: str, sitemaps: str, feeds: str, pages_ext: str, redirects: str
) -> str:
    """DuckDB twin of :func:`discovery_frontier`."""
    return rf"""
WITH d AS (
  SELECT url, 0 AS prio FROM (SELECT url FROM {seeds})
  UNION ALL
  SELECT loc AS url, 1 FROM ({robots_src.duck_sitemap_xml_sql(sitemaps)})
  WHERE kind = 'url' AND loc <> ''
  UNION ALL
  SELECT link AS url, 2 FROM ({feeds_src.duck_feed_sql(feeds)})
  UNION ALL
  SELECT regexp_extract(t, 'href="([^"]*)"', 1) AS url, 3
  FROM (SELECT unnest(regexp_extract_all(html, '{html_parse._HREFLANG_TAG_RE}')) AS t
        FROM {pages_ext})
  WHERE regexp_extract(t, 'href="([^"]*)"', 1) <> ''
  UNION ALL
  SELECT regexp_extract(html, '{_NEXT_RE}', 1) AS url, 4 FROM {pages_ext}
  WHERE regexp_extract(html, '{_NEXT_RE}', 1) <> ''
  UNION ALL
  SELECT target AS url, 5 FROM ({html_parse.duck_refresh_sql(pages_ext)})
  UNION ALL
  SELECT dst_url AS url, 6 FROM {redirects}
)
SELECT url,
       {_CHANNEL_CASE} AS channel,
       count(DISTINCT prio)::BIGINT AS n_channels
FROM d GROUP BY url
"""
