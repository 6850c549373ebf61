"""RSS/Atom feed parsing — the third frontier-seeding discovery channel
(after seed lists and sitemaps): news/blog hosts publish fresh URLs in
feeds long before link-following finds them, so a discovery-driven crawl
polls feeds and enqueues new items with their published dates as recrawl
priority.

Same engineering shape as sitemap parsing (sources/robots.py): block
regexes in the Java-regex ∩ RE2 subset over the feed scan — map-side
only, no shuffle, no Python; feeds are host-grain (orders of magnitude
below the page corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_RSS_ITEM_RE = r"(?s)<item>(.*?)</item>"
_ATOM_ENTRY_RE = r"(?s)<entry>(.*?)</entry>"
_RSS_LINK_RE = r"<link>([^<]*)</link>"
_ATOM_LINK_RE = r'<link href="([^"]*)"'
_TITLE_RE = r"(?s)<title>(.*?)</title>"
_RSS_DATE_RE = r"<pubDate>([^<]*)</pubDate>"
_ATOM_DATE_RE = r"<updated>([^<]*)</updated>"
_CDATA_OPEN = r"^<!\[CDATA\["
_CDATA_CLOSE = r"\]\]>$"


def parse_feed_xml(
    df: DataFrame, url_col: str = "feed_url", xml_col: str = "xml"
) -> DataFrame:
    """(feed_url, kind, link, title, pubdate): one row per RSS <item>
    (kind 'rss') or Atom <entry> (kind 'atom'); title unwraps CDATA;
    title/pubdate are NULL when the entry has none; entries without a
    link are dropped (nothing to enqueue)."""

    def entries(block_re: str, kind: str, link_re: str, date_re: str) -> DataFrame:
        block = F.explode(
            F.expr(f"regexp_extract_all({xml_col}, '{block_re}', 1)")
        ).alias("b")
        title = F.regexp_replace(
            F.regexp_replace(F.regexp_extract("b", _TITLE_RE, 1), _CDATA_OPEN, ""),
            _CDATA_CLOSE,
            "",
        )
        return (
            df.select(F.col(url_col).alias("feed_url"), block)
            .select(
                "feed_url",
                F.lit(kind).alias("kind"),
                F.regexp_extract("b", link_re, 1).alias("link"),
                F.nullif(title, F.lit("")).alias("title"),
                F.nullif(F.regexp_extract("b", date_re, 1), F.lit("")).alias("pubdate"),
            )
            .where(F.col("link") != "")
        )

    return entries(_RSS_ITEM_RE, "rss", _RSS_LINK_RE, _RSS_DATE_RE).unionByName(
        entries(_ATOM_ENTRY_RE, "atom", _ATOM_LINK_RE, _ATOM_DATE_RE)
    )


def duck_feed_sql(feeds: str) -> str:
    """DuckDB twin of :func:`parse_feed_xml`."""

    def part(block_re: str, kind: str, link_re: str, date_re: str) -> str:
        return rf"""
SELECT feed_url, '{kind}' AS kind,
       regexp_extract(b, '{link_re}', 1) AS link,
       nullif(regexp_replace(regexp_replace(
           regexp_extract(b, '{_TITLE_RE}', 1), '{_CDATA_OPEN}', ''),
           '{_CDATA_CLOSE}', ''), '') AS title,
       nullif(regexp_extract(b, '{date_re}', 1), '') AS pubdate
FROM (
  SELECT feed_url, unnest(regexp_extract_all(xml, '{block_re}', 1)) AS b
  FROM {feeds}
)
WHERE regexp_extract(b, '{link_re}', 1) <> ''"""

    return (
        part(_RSS_ITEM_RE, "rss", _RSS_LINK_RE, _RSS_DATE_RE)
        + "\nUNION ALL"
        + part(_ATOM_ENTRY_RE, "atom", _ATOM_LINK_RE, _ATOM_DATE_RE)
    )
