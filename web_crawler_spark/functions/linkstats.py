"""Per-page link classification — the reference examples' internal/external
link analysis (reference example_advanced.py:40-47, demo_comprehensive.py:
68-77: ``url.split('/')[2]`` host comparison) as JVM column functions.

All pure `pyspark.sql.functions` (parse_url + higher-order filters) — no
Python, scales as map-side codegen over any link corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _host(url: Column) -> Column:
    return F.lower(F.parse_url(url, F.lit("HOST")))


def link_class_counts(
    df: DataFrame, url_col: str = "url", links_col: str = "links"
) -> DataFrame:
    """(url, n_links, n_internal, n_external, n_relative): absolute links
    partition by same-host vs other-host (the examples' classification);
    relative hrefs (no authority) are their own bucket — the reference
    examples' split('/')[2] simply crashes on those, a gap we close."""
    page_host = _host(F.col(url_col))
    links = F.coalesce(F.col(links_col), F.array())
    is_abs = lambda x: x.rlike("^[A-Za-z][A-Za-z0-9+.-]*://")  # noqa: E731
    internal = F.filter(links, lambda x: is_abs(x) & (_host(x) == page_host))
    external = F.filter(
        links, lambda x: is_abs(x) & (_host(x) != page_host) & _host(x).isNotNull()
    )
    relative = F.filter(links, lambda x: ~is_abs(x))
    return df.select(
        F.col(url_col).alias("url"),
        F.size(links).cast("long").alias("n_links"),
        F.size(internal).cast("long").alias("n_internal"),
        F.size(external).cast("long").alias("n_external"),
        F.size(relative).cast("long").alias("n_relative"),
    )


def duck_link_class_sql(pages_meta: str) -> str:
    """DuckDB twin: same host comparison via split_part (links in the synth
    corpus carry no userinfo/port, so authority == host there; absolute
    detection uses the same scheme regex)."""
    host_of = (
        "lower(split_part(split_part(split_part({x}, '://', 2), '/', 1), ':', 1))"
    )
    page_host = host_of.format(x="url")
    link_host = host_of.format(x="x")
    return rf"""
WITH base AS (
  SELECT url, coalesce(links, []) AS links, {page_host} AS page_host
  FROM {pages_meta}
)
SELECT url,
  len(links)::BIGINT AS n_links,
  len(list_filter(links, x -> regexp_matches(x, '^[A-Za-z][A-Za-z0-9+.-]*://')
      AND {link_host} = page_host))::BIGINT AS n_internal,
  len(list_filter(links, x -> regexp_matches(x, '^[A-Za-z][A-Za-z0-9+.-]*://')
      AND {link_host} <> page_host AND {link_host} <> ''))::BIGINT AS n_external,
  len(list_filter(links, x -> NOT regexp_matches(x, '^[A-Za-z][A-Za-z0-9+.-]*://')))::BIGINT AS n_relative
FROM base
"""


def host_graph(
    df: DataFrame, url_col: str = "url", host_col: str = "host", links_col: str = "links"
) -> DataFrame:
    """Host-level link graph: aggregate page->page links into weighted
    (src_host, dst_host) edges — the web-graph view every crawl-analytics /
    spam-detection / harvest-ordering pipeline builds first.  Output:
    (src_host, dst_host, n_links, n_src_pages).

    Scale shape: explode -> single keyed aggregation with map-side partial
    agg on (src_host, dst_host); the edge relation that shuffles is bounded
    by distinct host pairs per partition, not raw links.  The distinct
    page count rides the same exchange (two-phase distinct agg)."""
    dst = F.lower(
        F.regexp_extract(F.col("link"), r"(?i)^https?://([^/:?#]+)", 1)
    )
    edges = (
        df.select(
            F.col(host_col).alias("src_host"),
            F.col(url_col).alias("src_url"),
            F.explode(F.coalesce(F.col(links_col), F.array())).alias("link"),
        )
        .select("src_host", "src_url", dst.alias("dst_host"))
        .filter(F.col("dst_host") != "")
    )
    return edges.groupBy("src_host", "dst_host").agg(
        F.count("*").cast("long").alias("n_links"),
        F.countDistinct("src_url").cast("long").alias("n_src_pages"),
    )


def duck_host_graph_sql(pages_meta: str) -> str:
    return rf"""
WITH e AS (
  SELECT host AS src_host, url AS src_url,
         lower(coalesce(regexp_extract(link, '(?i)^https?://([^/:?#]+)', 1), '')) AS dst_host
  FROM (SELECT host, url, unnest(coalesce(links, [])) AS link FROM {pages_meta})
)
SELECT src_host, dst_host,
       count(*)::BIGINT AS n_links,
       count(DISTINCT src_url)::BIGINT AS n_src_pages
FROM e WHERE dst_host <> '' GROUP BY 1, 2
"""
