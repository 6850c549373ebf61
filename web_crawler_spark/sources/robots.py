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
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
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


def _applicable_directives(content: str, agent: str):
    """Yield (key, value) directive pairs from the groups that apply to
    ``agent`` per the RFC 9309 group model: consecutive ``User-agent`` lines
    open a group; it applies when it names ``*`` or the agent."""
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
        if applies:
            yield key, value


def parse_robots_text(content: str, agent: str = DEFAULT_AGENT) -> tuple[list[str], float | None]:
    """(disallow paths, crawl delay) for ``agent`` per the RFC 9309 group
    model.  Pure per-row function (also the unit-test oracle)."""
    disallow: list[str] = []
    delay: float | None = None
    for key, value in _applicable_directives(content, agent):
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


# -- RFC 9309 wildcard/anchor Allow/Disallow longest-match ---------------------
#
# The full matching model real robots.txt files use (and the plain
# Disallow-prefix gate above cannot express): ``*`` matches any octet
# sequence, a trailing ``$`` anchors the end of the path, ``Allow`` rules
# override ``Disallow``, and the winning rule is the one with the LONGEST
# pattern (ties break toward Allow).  No matching rule means allowed.
#
# Scale shape: patterns compile to Java/RE2 regexes once per host at parse
# time (robots bodies are config-plane, one small row per host), the rules
# table broadcasts, and the per-URL decision is a single JVM projection —
# ``filter(rules, r -> RLIKE(path, r.rx))`` + ``array_max`` over
# (rule_len, is_allow) structs.  No Python touches the URL-grain data and
# the frontier side never shuffles.

_RE_META = set("\\.^$+?(){}[]|")


def parse_robots_acl(content: str, agent: str = DEFAULT_AGENT) -> list[tuple[str, bool]]:
    """Ordered (pattern, is_allow) rules for ``agent`` — both ``Allow`` and
    ``Disallow`` lines from applicable groups; empty values (the
    'allow everything' idiom) contribute no rule."""
    rules: list[tuple[str, bool]] = []
    for key, value in _applicable_directives(content, agent):
        if key in ("disallow", "allow") and value:
            rules.append((value, key == "allow"))
    return rules


def rule_to_regex(pattern: str) -> str:
    """Robots path pattern -> anchored regex valid in both Java regex and
    RE2 (no backrefs/lookaround): ``*`` -> ``.*``, a trailing ``$`` becomes
    an end anchor, every other regex metacharacter is escaped, and the
    whole pattern is start-anchored (robots rules match from the first
    path octet)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    out = ["^"]
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in _RE_META:
            out.append("\\" + ch)
        else:
            out.append(ch)
    if anchored:
        out.append("$")
    return "".join(out)


ACL_RULES = ArrayType(
    StructType(
        [
            StructField("rx", StringType()),
            StructField("rule_len", IntegerType()),
            StructField("is_allow", BooleanType()),
        ]
    )
)

_ACL_RULES_DDL = "array<struct<rx:string,rule_len:int,is_allow:boolean>>"


def acl_rules_from_robots(
    robots: DataFrame, agent: str = DEFAULT_AGENT, content_col: str = "content"
) -> DataFrame:
    """(host, content) -> (host, rules) with each rule pre-compiled to
    (rx, rule_len, is_allow).  ``rule_len`` is the octet length of the
    ORIGINAL pattern (the RFC's longest-match measure), not the regex."""

    @pandas_udf(ACL_RULES)
    def compile_rules(contents: pd.Series) -> pd.Series:
        out = []
        for c in contents:
            out.append(
                [
                    (rule_to_regex(p), len(p), allow)
                    for p, allow in parse_robots_acl(c if c is not None else "", agent)
                ]
            )
        return pd.Series(out)

    return robots.select("host", compile_rules(F.col(content_col)).alias("rules"))


_PATH_STRIP_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Per-URL RFC 9309 decision: adds ``allowed`` (boolean) and ``win_len``
    (length of the winning rule's pattern, 0 when no rule matched).

    Longest-match with Allow-wins-ties falls out of ``array_max`` over
    ``struct(rule_len, is_allow)`` — struct comparison is lexicographic and
    false < true.  Hosts absent from the rules table (left join) and hosts
    whose applicable groups carry no rules are fully allowed."""
    empty = F.array().cast(_ACL_RULES_DDL)
    path = F.coalesce(
        F.nullif(F.regexp_replace(F.col(url_col), _PATH_STRIP_RE, ""), F.lit("")),
        F.lit("/"),
    )
    joined = urls.join(F.broadcast(rules), on=host_col, how="left")
    hits = F.filter(
        F.coalesce(F.col("rules"), empty),
        lambda r: F.regexp_like(path, r["rx"]),
    )
    win = F.array_max(
        F.transform(hits, lambda r: F.struct(r["rule_len"].alias("l"), r["is_allow"].alias("a")))
    )
    return joined.select(
        *[c for c in urls.columns],
        F.coalesce(win["a"], F.lit(True)).alias("allowed"),
        F.coalesce(win["l"], F.lit(0)).alias("win_len"),
    )


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


# -- sitemap XML parsing (urlset / sitemapindex) --------------------------------
#
# The step after discovery: fetched sitemap documents parse into frontier
# URLs (<urlset><url><loc>) or further sitemap fetches
# (<sitemapindex><sitemap><loc>), with optional <lastmod> driving recrawl
# priority.  Regex block extraction is the Spark-native parse — both Java
# regex and RE2 support (?s) + lazy quantifiers, so the oracle is exact.

def parse_sitemap_xml(
    df: DataFrame, url_col: str = "sitemap_url", xml_col: str = "xml"
) -> DataFrame:
    """(sitemap_url, kind, loc, lastmod): one row per <url> entry (kind
    'url') or <sitemap> child (kind 'sitemap'); lastmod is NULL when the
    entry has none.  Map-side only: two regexp_extract_all block passes +
    explode — no shuffle, no Python."""

    def entries(tag: str, kind: str) -> DataFrame:
        block = F.explode(
            F.expr(
                f"regexp_extract_all({xml_col}, '(?s)<{tag}>(.*?)</{tag}>', 1)"
            )
        ).alias("b")
        return df.select(F.col(url_col).alias("sitemap_url"), block).select(
            "sitemap_url",
            F.lit(kind).alias("kind"),
            F.regexp_extract("b", "<loc>([^<]*)</loc>", 1).alias("loc"),
            F.nullif(
                F.regexp_extract("b", "<lastmod>([^<]*)</lastmod>", 1), F.lit("")
            ).alias("lastmod"),
        )

    return entries("url", "url").unionByName(entries("sitemap", "sitemap"))


def duck_sitemap_xml_sql(sitemaps: str) -> str:
    def part(tag: str, kind: str) -> str:
        return rf"""
SELECT sitemap_url, '{kind}' AS kind,
       regexp_extract(b, '<loc>([^<]*)</loc>', 1) AS loc,
       nullif(regexp_extract(b, '<lastmod>([^<]*)</lastmod>', 1), '') AS lastmod
FROM (
  SELECT sitemap_url,
         unnest(regexp_extract_all(xml, '(?s)<{tag}>(.*?)</{tag}>', 1)) AS b
  FROM {sitemaps}
)"""

    return part("url", "url") + "\nUNION ALL" + part("sitemap", "sitemap")


_HOST_OF = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"


def sitemap_coverage(sitemaps: DataFrame, pages: DataFrame) -> DataFrame:
    """Per-host crawl-coverage audit: what the site DECLARED in its
    sitemaps vs what the crawl actually HOLDS.

    (host, n_declared, n_crawled, n_orphan, coverage_ppm): ``n_declared``
    = distinct <urlset> locs for the host, ``n_crawled`` = declared locs
    present in the pages table, ``n_orphan`` = crawled pages the host never
    declared (discovered only by link-following — the pages a
    sitemap-driven recrawl would MISS), ``coverage_ppm`` =
    floor(1e6 * n_crawled / n_declared), NULL for index-only hosts that
    declare no concrete urls.

    Scale shape: both sides reduce to distinct url sets map-side first
    (partial agg before the exchange), the url-grain full-outer join is a
    plain hash equi-join on url, and the per-host rollup reuses nothing
    heavier than a second partial-agg'd exchange.  html bytes are pruned at
    the scan (url is the only pages column read).  No Python.
    """
    declared = (
        parse_sitemap_xml(sitemaps)
        .where(F.col("kind") == "url")
        .select(F.col("loc").alias("url"))
        .distinct()
        .withColumn("declared", F.lit(1))
    )
    crawled = (
        pages.select("url").distinct().withColumn("crawled", F.lit(1))
    )
    joined = declared.join(crawled, "url", "full_outer").select(
        F.lower(F.regexp_extract("url", _HOST_OF, 1)).alias("host"),
        "declared",
        "crawled",
    )
    agg = joined.groupBy("host").agg(
        F.count("declared").alias("n_declared"),
        F.count(F.when(F.col("declared").isNotNull() & F.col("crawled").isNotNull(), 1)).alias("n_crawled"),
        F.count(F.when(F.col("declared").isNull(), 1)).alias("n_orphan"),
    )
    return agg.select(
        "host",
        "n_declared",
        "n_crawled",
        "n_orphan",
        F.when(
            F.col("n_declared") > 0,
            F.expr("(1000000 * n_crawled) div n_declared"),
        ).cast("long").alias("coverage_ppm"),
    )


def duck_sitemap_coverage_sql(sitemaps: str, pages: str) -> str:
    """DuckDB twin of :func:`sitemap_coverage`."""
    return f"""
        WITH entries AS ({duck_sitemap_xml_sql(sitemaps)}),
        declared AS (
          SELECT DISTINCT loc AS url FROM entries WHERE kind = 'url'
        ),
        crawled AS (SELECT DISTINCT url FROM {pages}),
        joined AS (
          SELECT coalesce(d.url, c.url) AS url,
                 (d.url IS NOT NULL) AS declared,
                 (c.url IS NOT NULL) AS crawled
          FROM declared d FULL OUTER JOIN crawled c ON d.url = c.url
        ),
        agg AS (
          SELECT lower(regexp_extract(url, '{_HOST_OF}', 1)) AS host,
                 count(CASE WHEN declared THEN 1 END)::BIGINT AS n_declared,
                 count(CASE WHEN declared AND crawled THEN 1 END)::BIGINT AS n_crawled,
                 count(CASE WHEN NOT declared THEN 1 END)::BIGINT AS n_orphan
          FROM joined GROUP BY 1
        )
        SELECT host, n_declared, n_crawled, n_orphan,
               CASE WHEN n_declared > 0
                    THEN (1000000 * n_crawled) // n_declared
                    ELSE NULL END::BIGINT AS coverage_ppm
        FROM agg
    """


# -- lastmod-driven recrawl scheduling -----------------------------------------
#
# The sitemaps protocol's freshness channel: a page whose declared
# <lastmod> postdates its capture timestamp is STALE and should be
# refetched before politeness budget goes to speculative recrawls.  This
# is the declared-freshness complement of the content-hash scheduler in
# plans/recrawl.py (which infers change rates from observed digests).

def sitemap_recrawl(
    sitemaps: DataFrame, pages: DataFrame, budget: int = 5
) -> DataFrame:
    """Per-host stale-page refetch batch: (url, host, age_s, host_rank).

    ``age_s`` = declared lastmod minus capture time in seconds (> 0 ==
    stale; fresh pages are filtered out), ``host_rank`` orders each host's
    batch stalest-first (ties on url) and is capped at ``budget``.

    Scale shape: declared entries are sitemap-grain (orders of magnitude
    below the corpus); per-url max(lastmod) partial-aggs before the
    exchange; the pages scan is pruned to (url, warc_ts); one hash
    equi-join on url; the bounded-k window compiles to a partial top-k
    (WindowGroupLimit) so only <= budget rows per host survive the final
    exchange.  No Python anywhere."""
    declared = (
        parse_sitemap_xml(sitemaps)
        .where((F.col("kind") == "url") & F.col("lastmod").isNotNull())
        .groupBy(F.col("loc").alias("url"))
        .agg(F.max("lastmod").alias("lastmod"))
    )
    j = declared.join(pages.select("url", "warc_ts"), "url")
    # try_to_timestamp: a malformed <lastmod> in one sitemap entry must
    # degrade to "not stale" (NULL age filters out), never throw under
    # ANSI mode and kill the whole planning job
    age = (
        F.unix_timestamp(F.try_to_timestamp("lastmod"))
        - F.unix_timestamp(F.col("warc_ts"))
    ).alias("age_s")
    stale = j.select(
        "url",
        F.lower(F.regexp_extract("url", _HOST_OF, 1)).alias("host"),
        age,
    ).where(F.col("age_s") > 0)
    w = Window.partitionBy("host").orderBy(F.desc("age_s"), F.asc("url"))
    return (
        stale.withColumn("host_rank", F.row_number().over(w).cast("long"))
        .where(F.col("host_rank") <= budget)
    )


def duck_sitemap_recrawl_sql(sitemaps: str, pages: str, budget: int = 5) -> str:
    """DuckDB twin of :func:`sitemap_recrawl`."""
    return f"""
WITH entries AS ({duck_sitemap_xml_sql(sitemaps)}),
declared AS (
  SELECT loc AS url, max(lastmod) AS lastmod
  FROM entries WHERE kind = 'url' AND lastmod IS NOT NULL
  GROUP BY 1
),
stale AS (
  SELECT d.url,
         lower(regexp_extract(d.url, '{_HOST_OF}', 1)) AS host,
         epoch(TRY_CAST(d.lastmod AS TIMESTAMP))::BIGINT
           - epoch(p.warc_ts)::BIGINT AS age_s
  FROM declared d JOIN {pages} p ON d.url = p.url
  WHERE epoch(TRY_CAST(d.lastmod AS TIMESTAMP)) > epoch(p.warc_ts)
)
SELECT url, host, age_s,
       row_number() OVER (PARTITION BY host ORDER BY age_s DESC, url) AS host_rank
FROM stale
QUALIFY host_rank <= {budget}
"""


# -- lastmod trust calibration ---------------------------------------------------
#
# sitemap_recrawl TRUSTS <lastmod>; this measures whether it should.  The
# published finding (large-scale sitemap studies) is that sites over-claim:
# most lastmod bumps do not correspond to content changes.  Calibrating
# declared freshness against the digest-observed truth per host tells the
# scheduler which hosts' sitemaps can replace digest polling (high
# precision) and which must stay on the adaptive digest scheduler.


def sitemap_lastmod_trust(
    sitemaps: DataFrame, prev: DataFrame, curr: DataFrame
) -> DataFrame:
    """Per-host confusion matrix of declared freshness vs observed change:
    (host, n_eval, n_claimed, n_changed, tp, fp, fn, tn, precision_ppm,
    recall_ppm).

    Eval set = sitemap-declared urls present in BOTH snapshots.  claimed =
    lastmod present AND newer than the previous capture; changed = content
    digest differs between snapshots.  precision_ppm = floor(1e6*tp /
    n_claimed) (NULL when the host claims nothing), recall_ppm =
    floor(1e6*tp / n_changed) (NULL when nothing changed).

    Scale shape: declared entries are sitemap-grain (<< corpus); both
    snapshot scans prune to (url, warc_ts, text) with the digest a
    map-side md5 projection (at archive scale, read the stored digest
    column instead — same join shape, zero body bytes either way); two
    url-grain hash equi-joins; one host-grain partial-agg rollup.  tp*1e6
    stays < 2^63 to 9e12 eval urls per host.  No Python."""
    declared = (
        parse_sitemap_xml(sitemaps)
        .where(F.col("kind") == "url")
        .groupBy(F.col("loc").alias("url"))
        .agg(F.max("lastmod").alias("lastmod"))
    )
    p = prev.select(
        "url",
        F.col("warc_ts").alias("prev_ts"),
        F.md5(F.col("text")).alias("d_prev"),
    )
    c = curr.select("url", F.md5(F.col("text")).alias("d_curr"))
    j = declared.join(p, "url").join(c, "url")
    # coalesce(...) pins a malformed lastmod (try_to_timestamp -> NULL under
    # ANSI-safe parsing) to claimed=false, keeping the confusion matrix a
    # partition of the eval set instead of leaking NULL rows out of every cell
    claimed = F.coalesce(
        F.col("lastmod").isNotNull()
        & (
            F.unix_timestamp(F.try_to_timestamp("lastmod"))
            > F.unix_timestamp(F.col("prev_ts"))
        ),
        F.lit(False),
    )
    changed = F.col("d_prev") != F.col("d_curr")
    lab = j.select(
        F.lower(F.regexp_extract("url", _HOST_OF, 1)).alias("host"),
        claimed.alias("claimed"),
        changed.alias("changed"),
    )
    one = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("long")  # noqa: E731
    agg = lab.groupBy("host").agg(
        F.count("*").cast("long").alias("n_eval"),
        one(F.col("claimed")).alias("n_claimed"),
        one(F.col("changed")).alias("n_changed"),
        one(F.col("claimed") & F.col("changed")).alias("tp"),
        one(F.col("claimed") & ~F.col("changed")).alias("fp"),
        one(~F.col("claimed") & F.col("changed")).alias("fn"),
        one(~F.col("claimed") & ~F.col("changed")).alias("tn"),
    )
    return agg.select(
        "*",
        F.when(
            F.col("n_claimed") > 0,
            F.expr("tp * 1000000L DIV n_claimed"),
        )
        .cast("long")
        .alias("precision_ppm"),
        F.when(
            F.col("n_changed") > 0,
            F.expr("tp * 1000000L DIV n_changed"),
        )
        .cast("long")
        .alias("recall_ppm"),
    )


def duck_sitemap_trust_sql(sitemaps: str, prev: str, curr: str) -> str:
    """DuckDB twin of :func:`sitemap_lastmod_trust`."""
    return f"""
WITH entries AS ({duck_sitemap_xml_sql(sitemaps)}),
declared AS (
  SELECT loc AS url, max(lastmod) AS lastmod
  FROM entries WHERE kind = 'url' GROUP BY 1
),
lab AS (
  SELECT lower(regexp_extract(d.url, '{_HOST_OF}', 1)) AS host,
         coalesce(d.lastmod IS NOT NULL
          AND epoch(TRY_CAST(d.lastmod AS TIMESTAMP)) > epoch(p.warc_ts),
          false) AS claimed,
         (md5(p.text) <> md5(c.text)) AS changed
  FROM declared d
  JOIN {prev} p ON d.url = p.url
  JOIN {curr} c ON d.url = c.url
),
agg AS (
  SELECT host, count(*)::BIGINT AS n_eval,
         sum(CASE WHEN claimed THEN 1 ELSE 0 END)::BIGINT AS n_claimed,
         sum(CASE WHEN changed THEN 1 ELSE 0 END)::BIGINT AS n_changed,
         sum(CASE WHEN claimed AND changed THEN 1 ELSE 0 END)::BIGINT AS tp,
         sum(CASE WHEN claimed AND NOT changed THEN 1 ELSE 0 END)::BIGINT AS fp,
         sum(CASE WHEN NOT claimed AND changed THEN 1 ELSE 0 END)::BIGINT AS fn,
         sum(CASE WHEN NOT claimed AND NOT changed THEN 1 ELSE 0 END)::BIGINT AS tn
  FROM lab GROUP BY 1
)
SELECT host, n_eval, n_claimed, n_changed, tp, fp, fn, tn,
       CASE WHEN n_claimed > 0
            THEN (tp * 1000000 // n_claimed)::BIGINT END AS precision_ppm,
       CASE WHEN n_changed > 0
            THEN (tp * 1000000 // n_changed)::BIGINT END AS recall_ppm
FROM agg
"""


# -- sitemap XML generation (the producer side) ---------------------------------


SITEMAP_MAX_URLS = 50_000  # sitemaps.org protocol hard limit per file


def write_sitemaps(
    pages: DataFrame,
    out_dir: str,
    max_urls: int = SITEMAP_MAX_URLS,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> None:
    """Render the crawled corpus as sitemaps-protocol XML shards — the
    PRODUCER side of :func:`parse_sitemap_xml` (a crawl that republishes
    its captures, or a site pipeline emitting its own sitemap set).

    Layout follows write_cdx's sorted-run discipline: urls range-partition
    so each task owns a contiguous url range, each partition renders ONE
    ``<urlset>`` file capped at the protocol's 50k-url limit, and
    ``<lastmod>`` carries the capture date.  The partition count is derived
    from the row count so the cap holds without a global sort."""
    import math
    import os as _os

    from pyspark import TaskContext

    n = pages.count()
    n_files = max(1, math.ceil(n / max_urls))
    _os.makedirs(out_dir, exist_ok=True)
    rows = (
        pages.select(
            F.col(url_col).alias("loc"),
            F.date_format(ts_col, "yyyy-MM-dd").alias("lastmod"),
        )
        .repartitionByRange(n_files, "loc")
        .sortWithinPartitions("loc")
    )

    def dump(it) -> None:
        it = list(it)
        if not it:
            return
        pid = TaskContext.get().partitionId()
        tmp = _os.path.join(out_dir, f"sitemap-{pid:05d}.xml.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
            f.write('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n')
            for r in it:
                f.write("<url>")
                f.write(f"<loc>{r['loc']}</loc>")
                if r["lastmod"]:
                    f.write(f"<lastmod>{r['lastmod']}</lastmod>")
                f.write("</url>\n")
            f.write("</urlset>\n")
        _os.replace(tmp, _os.path.join(out_dir, f"sitemap-{pid:05d}.xml"))

    rows.foreachPartition(dump)
