"""robots.txt -> host_rules table (J4 end-to-end).

The reference has no robots support (its PROJECT_STRUCTURE.md:291 lists it
as future work); the north rule requires robots rules in the politeness
path.  This source parses per-host robots.txt payloads into the
``host_rules(host, disallow, budget)`` shape that
``operators/politeness.apply_robots`` / ``select_host_budget_batch``
consume.

Parsing follows RFC 9309's group model, simplified to what the politeness
layer uses: consecutive ``User-agent`` lines open a group; a group applies
when it names ``*`` (or the engine's agent); applicable groups contribute
their non-empty ``Disallow`` paths and the smallest ``Crawl-delay``.
Comments (#) and unknown directives are ignored.  Robots files are
config-plane data (one small row per host), so the per-file parse is a
pandas UDF; the resulting rules table broadcasts into the frontier join.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

DEFAULT_AGENT = "*"

PARSED_RULES = StructType(
    [
        StructField("disallow", ArrayType(StringType())),
        StructField("crawl_delay", DoubleType()),
    ]
)


def parse_robots_text(content: str, agent: str = DEFAULT_AGENT) -> tuple[list[str], float | None]:
    """(disallow paths, crawl delay) for ``agent`` per the RFC 9309 group
    model.  Pure per-row function (also the unit-test oracle)."""
    disallow: list[str] = []
    delay: float | None = None
    group_agents: list[str] = []
    in_agent_run = False
    applies = False

    for raw in (content or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, value = line.split(":", 1)
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_agent_run:  # a new group starts
                group_agents = []
                in_agent_run = True
            group_agents.append(value.lower())
            applies = "*" in group_agents or agent.lower() in group_agents
            continue
        in_agent_run = False
        if not applies:
            continue
        if key == "disallow" and value:
            disallow.append(value)
        elif key == "crawl-delay":
            try:
                d = float(value)
            except ValueError:
                continue
            delay = d if delay is None else min(delay, d)
    return disallow, delay


def with_parsed_rules(
    robots: DataFrame, agent: str = DEFAULT_AGENT, content_col: str = "content"
) -> DataFrame:
    """(host, content) -> (host, disallow, crawl_delay)."""

    @pandas_udf(PARSED_RULES)
    def parse(contents: pd.Series) -> pd.DataFrame:
        dis, del_ = [], []
        for c in contents:
            d, cd = parse_robots_text(c if c is not None else "", agent)
            dis.append(d)
            del_.append(cd)
        return pd.DataFrame({"disallow": dis, "crawl_delay": del_})

    # straight projection — no join back onto the input (a self-join here
    # would scan/parse twice and multiply rows if a host ever appears twice)
    return robots.withColumn("__r", parse(F.col(content_col))).select(
        "host",
        F.col("__r.disallow").alias("disallow"),
        F.col("__r.crawl_delay").alias("crawl_delay"),
    )


def host_rules_from_robots(
    robots: DataFrame,
    default_budget: int = 5,
    round_seconds: float = 60.0,
    agent: str = DEFAULT_AGENT,
) -> DataFrame:
    """The politeness-ready rules table: ``Crawl-delay`` converts to a
    per-round budget (one fetch per delay across a round window, floored at
    1), hosts without a delay keep the default."""
    parsed = with_parsed_rules(robots, agent)
    budget = F.when(
        F.col("crawl_delay").isNotNull() & (F.col("crawl_delay") > 0),
        F.greatest(
            F.lit(1), F.floor(F.lit(round_seconds) / F.col("crawl_delay")).cast("int")
        ),
    ).otherwise(F.lit(default_budget))
    return parsed.select("host", "disallow", budget.alias("budget"))


# -- sitemap discovery ---------------------------------------------------------
#
# Per the sitemaps protocol, ``Sitemap:`` lines in robots.txt are
# cross-group (they apply regardless of user-agent), so extraction is a
# pure line filter — JVM higher-order array functions, no Python, no
# group-state machine needed (unlike the rules parse above).

_SITEMAP_KEY_RE = r"(?i)^sitemap\s*:"


def with_sitemaps(robots: DataFrame, content_col: str = "content") -> DataFrame:
    """(host, sitemap): one row per Sitemap: line per host.  Comments strip
    first, keys match case-insensitively, values trim; hosts whose robots
    body has no sitemap line emit nothing (explode drops empty arrays).

    Scale shape: map-side split/filter/transform over the robots scan —
    robots bodies are one row per host (O(10^7-10^8) at web scale), so the
    whole discovery pass is a single shuffle-free projection."""
    lines = F.split(F.col(content_col), "\n")
    stripped = F.transform(
        lines, lambda l: F.trim(F.regexp_replace(l, "#.*$", ""))
    )
    hits = F.filter(stripped, lambda l: l.rlike(_SITEMAP_KEY_RE))
    urls = F.transform(
        hits, lambda l: F.trim(F.regexp_replace(l, _SITEMAP_KEY_RE, ""))
    )
    return robots.select("host", F.explode(urls).alias("sitemap"))


def duck_sitemaps_sql(robots: str) -> str:
    return rf"""
SELECT host, trim(regexp_replace(l, '(?i)^sitemap\s*:', '')) AS sitemap
FROM (
  SELECT host,
         unnest(list_filter(
           list_transform(string_split(content, chr(10)),
                          l -> trim(regexp_replace(l, '#.*$', ''))),
           l -> regexp_matches(l, '(?i)^sitemap\s*:'))) AS l
  FROM {robots}
)
"""
