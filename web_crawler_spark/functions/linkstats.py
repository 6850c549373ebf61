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


# --- host-level PageRank (crawl prioritization / corpus quality signal) ----
#
# The classic harvest-ordering signal (Cho/Garcia-Molina "Efficient crawling
# through URL ordering"; Page et al. 1999): frontier URLs from high-rank
# hosts fetch first, and corpus curation uses host rank as a quality prior.
# The reference has no counterpart — this is part of the training-data layer.
#
# Determinism contract: every step is BIGINT arithmetic (floor division,
# integer sums), so the result is bit-identical across engines and across
# partition counts / reduction orders — float PageRank cannot hash-match a
# DuckDB oracle because double summation is order-dependent.  Ranks are
# parts-per-`scale` of the stationary mass (default ppb).  Overflow bound:
# rank*weight <= scale * max_edge_weight must stay < 2^63 — at scale=1e9
# that allows per-host-pair edge weights up to ~9e9 links, comfortably above
# any real host pair.

PR_ITERS = 4
PR_SCALE = 10**9  # ranks in parts-per-billion of total mass
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio


def host_pagerank(
    df: DataFrame,
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
    url_col: str = "url",
    host_col: str = "host",
    links_col: str = "links",
) -> DataFrame:
    """(host, rank_ppb) — weighted PageRank over the host link graph, a fixed
    number of exact-integer power iterations.

    Per iteration: each host sends ``(rank * w_edge) DIV w_out`` along its
    out-edges; dangling hosts' mass is redistributed uniformly
    (``sum DIV n``); new rank = teleport base + ``damping * inflow DIV 100``.

    Scale shape: the edge relation (host pairs — orders of magnitude smaller
    than pages) is materialized once with its out-degree attached and reused
    every iteration; each iteration is one shuffle-on-host join + one
    partial-agg'd groupBy, with per-iteration ``localCheckpoint`` lineage
    truncation (the crawl-loop discipline).  The dangling sum is a scalar
    aggregate on the driver, like the loop's fixpoint probes."""
    edges = host_graph(df, url_col=url_col, host_col=host_col, links_col=links_col)
    out_w = edges.groupBy("src_host").agg(F.sum("n_links").alias("w_out"))
    edges_w = (
        edges.select("src_host", "dst_host", "n_links")
        .join(out_w, on="src_host")
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges_w.select(F.col("src_host").alias("host"))
        .unionByName(edges_w.select(F.col("dst_host").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("host", F.lit(0).cast("long").alias("rank_ppb"))
    base = ((PR_DAMP_DEN - PR_DAMP_NUM) * scale) // (PR_DAMP_DEN * n)
    ranks = nodes.select("host", F.lit(scale // n).cast("long").alias("rank"))
    has_out = out_w.select(F.col("src_host").alias("host"))
    for _ in range(iters):
        contrib = edges_w.join(
            ranks.withColumnRenamed("host", "src_host"), on="src_host"
        ).select(
            F.col("dst_host").alias("host"),
            F.expr("rank * n_links DIV w_out").alias("c"),
        )
        inflow = contrib.groupBy("host").agg(F.sum("c").alias("in_c"))
        dangling = (
            ranks.join(has_out, on="host", how="left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)))
            .first()[0]
        )
        share = int(dangling) // n
        ranks = (
            nodes.join(inflow, on="host", how="left")
            .select(
                "host",
                (
                    F.lit(base)
                    + F.expr(
                        f"{PR_DAMP_NUM} * (coalesce(in_c, 0L) + {share}L)"
                        f" DIV {PR_DAMP_DEN}"
                    )
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("host", F.col("rank").alias("rank_ppb"))


def duck_pagerank_sql(
    pages_meta: str, iters: int = PR_ITERS, scale: int = PR_SCALE
) -> str:
    """DuckDB twin: the same integer power iteration unrolled as a CTE chain
    (r0 -> c1/d1/r1 -> ... -> r{iters}); bit-exact because every operation is
    BIGINT floor division / integer sum in both engines."""
    dnum, dden = PR_DAMP_NUM, PR_DAMP_DEN
    parts = [
        f"""e0 AS (
  SELECT src_host, dst_host, n_links FROM ({duck_host_graph_sql(pages_meta)})
)""",
        """nodes AS (
  SELECT DISTINCT host FROM (
    SELECT src_host AS host FROM e0 UNION ALL SELECT dst_host FROM e0)
)""",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "outw AS (SELECT src_host, sum(n_links) AS w_out FROM e0 GROUP BY 1)",
        f"r0 AS (SELECT host, {scale}::BIGINT // (SELECT n FROM nn) AS rank"
        " FROM nodes)",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f"""c{k} AS (
  SELECT e.dst_host AS host, sum(r.rank * e.n_links // o.w_out) AS in_c
  FROM e0 e JOIN r{p} r ON r.host = e.src_host
  JOIN outw o ON o.src_host = e.src_host GROUP BY 1
)"""
        )
        parts.append(
            f"""d{k} AS (
  SELECT coalesce(sum(rank), 0) // (SELECT n FROM nn) AS share
  FROM r{p} WHERE host NOT IN (SELECT src_host FROM outw)
)"""
        )
        parts.append(
            f"""r{k} AS (
  SELECT n.host,
         {(dden - dnum) * scale}::BIGINT // ({dden} * (SELECT n FROM nn))
         + {dnum} * (coalesce(c.in_c, 0) + (SELECT share FROM d{k})) // {dden}
           AS rank
  FROM nodes n LEFT JOIN c{k} c ON c.host = n.host
)"""
        )
    cte = ",\n".join(parts)
    return f"WITH {cte}\nSELECT host, rank::BIGINT AS rank_ppb FROM r{iters}"


# --- anchor-text aggregation (web-corpus training signal) -------------------

ANCHOR_RE = r'<a href="([^"]*)">([^<]*)</a>'


def anchor_texts(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(dst_url, anchor, n_refs): aggregated incoming anchor text per target
    URL — the classic web-scale relevance/label signal ("anchor text mirrors
    queries"; every search/LLM corpus pipeline mines it).  The reference
    parser extracts hrefs only (parser.py link loop); this keeps the text
    between the tags too.

    All JVM: one regexp_extract_all pass over the decoded html scan, a
    positional zip/explode, root-relative hrefs resolved against the page
    host (the corpus' only relative form; full RFC resolution happens in the
    canonicalization stage downstream), then ONE partial-agg'd exchange on
    (dst_url, anchor).  No Python anywhere."""
    h = F.col(html_col).cast("string")
    page_host = _host(F.col(url_col))
    pairs = df.select(
        page_host.alias("__h"),
        F.explode(
            F.arrays_zip(
                F.regexp_extract_all(h, F.lit(ANCHOR_RE), F.lit(1)).alias("href"),
                F.regexp_extract_all(h, F.lit(ANCHOR_RE), F.lit(2)).alias("anchor"),
            )
        ).alias("z"),
    ).select("__h", F.col("z.href").alias("href"), F.col("z.anchor").alias("anchor"))
    dst = F.when(
        F.col("href").rlike("^https?://"), F.col("href")
    ).otherwise(F.concat(F.lit("http://"), F.col("__h"), F.col("href")))
    return (
        pairs.filter(F.col("href") != "")
        .select(dst.alias("dst_url"), "anchor")
        .groupBy("dst_url", "anchor")
        .agg(F.count("*").cast("long").alias("n_refs"))
    )


def duck_anchor_texts_sql(pages: str) -> str:
    """DuckDB twin (parallel unnests zip positionally)."""
    return rf"""
WITH base AS (
  SELECT lower(split_part(split_part(split_part(url, '://', 2), '/', 1), ':', 1))
           AS host,
         decode(html) AS h
  FROM {pages}
),
pairs AS (
  SELECT host,
         unnest(regexp_extract_all(h, '{ANCHOR_RE}', 1)) AS href,
         unnest(regexp_extract_all(h, '{ANCHOR_RE}', 2)) AS anchor
  FROM base
)
SELECT CASE WHEN href LIKE 'http://%' OR href LIKE 'https://%' THEN href
            ELSE 'http://' || host || href END AS dst_url,
       anchor, count(*)::BIGINT AS n_refs
FROM pairs WHERE href <> '' GROUP BY 1, 2
"""


# --- PageRank-prioritized frontier batch (harvest ordering) ------------------

FRONTIER_RANK_BUDGET = 10


def rank_frontier(
    frontier: DataFrame,
    ranks: DataFrame,
    budget: int = FRONTIER_RANK_BUDGET,
    url_col: str = "url",
) -> DataFrame:
    """Priority-ordered fetch batch: each frontier URL inherits its host's
    authority score (``host_pagerank`` output) and at most ``budget`` URLs
    per host survive — Cho/Garcia-Molina "crawl the best pages first"
    realized as a window-ranked DataFrame under the politeness cap.

    Output: (url, host, rank_ppb, host_seq); the fetch order is
    (rank_ppb DESC, host, host_seq).

    Scale shape: the rank table is O(hosts) — a broadcast map-side join;
    the per-host cap compiles to WindowGroupLimit (partial top-k before the
    one host exchange); no global sort — at cluster scale the batch is
    range-partitioned on the priority keys, not totally ordered."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    host = F.lower(
        F.regexp_extract(F.col(url_col), r"(?i)^https?://([^/:?#]+)", 1)
    )
    keyed = frontier.select(
        F.col(url_col).alias("url"), host.alias("host")
    ).filter(F.col("host") != "")
    w = Window.partitionBy("host").orderBy("url")
    capped = (
        keyed.withColumn("host_seq", F.row_number().over(w).cast("long"))
        .filter(F.col("host_seq") <= budget)
    )
    return capped.join(broadcast(ranks), on="host", how="left").select(
        "url",
        "host",
        F.coalesce(F.col("rank_ppb"), F.lit(0)).cast("long").alias("rank_ppb"),
        "host_seq",
    )


def duck_rank_frontier_sql(
    frontier: str,
    pages_meta: str,
    budget: int = FRONTIER_RANK_BUDGET,
    url_col: str = "url",
) -> str:
    """``frontier`` is any relation with a ``{url_col}`` column; ranks come
    from the unrolled integer PageRank over ``pages_meta``."""
    return rf"""
WITH fr AS (
  SELECT {url_col} AS url,
         lower(coalesce(regexp_extract({url_col}, '(?i)^https?://([^/:?#]+)', 1), '')) AS host
  FROM {frontier}
), capped AS (
  SELECT url, host,
         row_number() OVER (PARTITION BY host ORDER BY url)::BIGINT AS host_seq
  FROM fr WHERE host <> ''
  QUALIFY host_seq <= {budget}
)
SELECT c.url, c.host, coalesce(r.rank_ppb, 0)::BIGINT AS rank_ppb, c.host_seq
FROM capped c LEFT JOIN ({{pagerank}}) r ON r.host = c.host
""".replace("{pagerank}", duck_pagerank_sql(pages_meta))


# --- link-farm / spam-host signals (reciprocity analysis) ---------------------

SPAM_MIN_OUT = 5            # fixture-sized; production uses O(10^2-10^3)
SPAM_MAX_RECIP_PPM = 600_000


def host_link_spam(
    df: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    links_col: str = "links",
    min_out: int = SPAM_MIN_OUT,
    max_recip_ppm: int = SPAM_MAX_RECIP_PPM,
) -> DataFrame:
    """(host, out_hosts, in_hosts, recip_hosts, recip_ppm, spam): link-farm
    signals per linking host — high fan-out with low link reciprocity is the
    classic spam-network shape (TrustRank/anti-spam literature), since
    organic hubs get linked back and farms don't.

    Output is integer-exact (recip_ppm = floor(recip*1e6/out)) for
    cross-engine determinism.  Self-loops are excluded; only hosts with at
    least one out-edge appear.

    Scale shape: everything runs at HOST grain — the distinct host-pair
    relation (~10^7-10^8 rows for the web, vs 10^12 links) is built with one
    partial-agg'd exchange, then reciprocity is a self-join of that pair
    relation on the reversed key and the degrees are two more partial-agg'd
    groupBys; no url-grain data ever shuffles."""
    pairs = (
        host_graph(df, url_col=url_col, host_col=host_col, links_col=links_col)
        .filter(F.col("dst_host") != F.col("src_host"))
        .select("src_host", "dst_host")
        .localCheckpoint(eager=True)  # reused 4x below — never recompute
    )
    outd = pairs.groupBy("src_host").agg(F.count("*").alias("out_hosts"))
    ind = pairs.groupBy(F.col("dst_host").alias("src_host")).agg(
        F.count("*").alias("in_hosts")
    )
    rev = pairs.select(
        F.col("dst_host").alias("src_host"), F.col("src_host").alias("dst_host")
    )
    recip = (
        pairs.join(rev, on=["src_host", "dst_host"])
        .groupBy("src_host")
        .agg(F.count("*").alias("recip_hosts"))
    )
    out = (
        outd.join(ind, on="src_host", how="left")
        .join(recip, on="src_host", how="left")
        .select(
            F.col("src_host").alias("host"),
            F.col("out_hosts").cast("long"),
            F.coalesce(F.col("in_hosts"), F.lit(0)).cast("long").alias("in_hosts"),
            F.coalesce(F.col("recip_hosts"), F.lit(0)).cast("long").alias("recip_hosts"),
            F.expr(
                "coalesce(recip_hosts, 0L) * 1000000 DIV out_hosts"
            ).alias("recip_ppm"),
        )
    )
    return out.withColumn(
        "spam",
        (F.col("out_hosts") >= min_out) & (F.col("recip_ppm") <= max_recip_ppm),
    )


def duck_link_spam_sql(
    pages_meta: str,
    min_out: int = SPAM_MIN_OUT,
    max_recip_ppm: int = SPAM_MAX_RECIP_PPM,
) -> str:
    return rf"""
WITH hg AS ({duck_host_graph_sql(pages_meta)}),
pairs AS (
  SELECT src_host, dst_host FROM hg WHERE dst_host <> src_host
),
outd AS (SELECT src_host AS host, count(*)::BIGINT AS out_hosts FROM pairs GROUP BY 1),
ind AS (SELECT dst_host AS host, count(*)::BIGINT AS in_hosts FROM pairs GROUP BY 1),
recip AS (
  SELECT p.src_host AS host, count(*)::BIGINT AS recip_hosts
  FROM pairs p JOIN pairs r ON r.src_host = p.dst_host AND r.dst_host = p.src_host
  GROUP BY 1
)
SELECT o.host, o.out_hosts,
       coalesce(i.in_hosts, 0)::BIGINT AS in_hosts,
       coalesce(rc.recip_hosts, 0)::BIGINT AS recip_hosts,
       coalesce(rc.recip_hosts, 0) * 1000000 // o.out_hosts AS recip_ppm,
       (o.out_hosts >= {min_out}
        AND coalesce(rc.recip_hosts, 0) * 1000000 // o.out_hosts <= {max_recip_ppm}) AS spam
FROM outd o LEFT JOIN ind i USING (host) LEFT JOIN recip rc USING (host)
"""


# --- TrustRank (seeded trust propagation, anti-spam ranking) ------------------
#
# Gyongyi/Garcia-Molina/Pedersen, "Combating web spam with TrustRank"
# (VLDB 2004): PageRank whose teleport mass goes ONLY to a trusted seed
# set, so trust decays with distance from the seeds and spam networks
# (unreachable from good hosts) rank near zero.  Same integer-exact
# determinism contract as host_pagerank — BIGINT floor arithmetic only.


def host_trustrank(
    df: DataFrame,
    seeds: DataFrame,
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
    url_col: str = "url",
    host_col: str = "host",
    links_col: str = "links",
) -> DataFrame:
    """(host, trust_ppb): seeded trust propagation over the host graph.

    ``seeds``: one ``host`` column — the trusted set (in the composed
    anti-spam pipeline, the NOT-spam hosts from ``host_link_spam``).
    Initial mass and every teleport/dangling redistribution go to seeds
    uniformly; non-seed hosts only ever receive flowed-through trust.

    Scale shape: identical to host_pagerank — the host-grain edge relation
    materializes once with out-degrees attached; each iteration is one
    shuffle-on-host join + a partial-agg'd groupBy with localCheckpoint
    lineage truncation; the seed set is O(hosts), broadcast into the
    per-iteration base join."""
    from pyspark.sql.functions import broadcast

    edges = host_graph(df, url_col=url_col, host_col=host_col, links_col=links_col)
    out_w = edges.groupBy("src_host").agg(F.sum("n_links").alias("w_out"))
    edges_w = (
        edges.select("src_host", "dst_host", "n_links")
        .join(out_w, on="src_host")
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges_w.select(F.col("src_host").alias("host"))
        .unionByName(edges_w.select(F.col("dst_host").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seed_set = (
        nodes.join(broadcast(seeds.select("host").distinct()), on="host")
        .localCheckpoint(eager=True)
    )
    n_seeds = seed_set.count()
    if n_seeds == 0:
        return nodes.select("host", F.lit(0).cast("long").alias("trust_ppb"))
    seed_flag = seed_set.withColumn("__seed", F.lit(True))
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * scale // (PR_DAMP_DEN * n_seeds)
    has_out = out_w.select(F.col("src_host").alias("host"))
    ranks = nodes.join(broadcast(seed_flag), on="host", how="left").select(
        "host",
        F.when(F.col("__seed"), F.lit(scale // n_seeds))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rank"),
    )
    for _ in range(iters):
        contrib = edges_w.join(
            ranks.withColumnRenamed("host", "src_host"), on="src_host"
        ).select(
            F.col("dst_host").alias("host"),
            F.expr("rank * n_links DIV w_out").alias("c"),
        )
        inflow = contrib.groupBy("host").agg(F.sum("c").alias("in_c"))
        dangling = (
            ranks.join(has_out, on="host", how="left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)))
            .first()[0]
        )
        seed_share = int(dangling) // n_seeds
        ranks = (
            nodes.join(inflow, on="host", how="left")
            .join(broadcast(seed_flag), on="host", how="left")
            .select(
                "host",
                (
                    F.when(F.col("__seed"), F.lit(base + seed_share))
                    .otherwise(F.lit(0))
                    + F.expr(
                        f"{PR_DAMP_NUM} * coalesce(in_c, 0L) DIV {PR_DAMP_DEN}"
                    )
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("host", F.col("rank").alias("trust_ppb"))


def duck_trustrank_sql(
    pages_meta: str, seeds_sql: str, iters: int = PR_ITERS, scale: int = PR_SCALE
) -> str:
    """DuckDB twin: the seeded iteration unrolled as a CTE chain.
    ``seeds_sql`` is any relation with a ``host`` column."""
    dnum, dden = PR_DAMP_NUM, PR_DAMP_DEN
    parts = [
        f"""e0 AS (
  SELECT src_host, dst_host, n_links FROM ({duck_host_graph_sql(pages_meta)})
)""",
        """nodes AS (
  SELECT DISTINCT host FROM (
    SELECT src_host AS host FROM e0 UNION ALL SELECT dst_host FROM e0)
)""",
        f"seeds AS (SELECT DISTINCT host FROM ({seeds_sql}) WHERE host IN (SELECT host FROM nodes))",
        "ns AS (SELECT count(*) AS n FROM seeds)",
        "outw AS (SELECT src_host, sum(n_links) AS w_out FROM e0 GROUP BY 1)",
        f"""r0 AS (
  SELECT n.host,
         CASE WHEN n.host IN (SELECT host FROM seeds)
              THEN {scale}::BIGINT // (SELECT n FROM ns) ELSE 0 END AS rank
  FROM nodes n
)""",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f"""c{k} AS (
  SELECT e.dst_host AS host, sum(r.rank * e.n_links // o.w_out) AS in_c
  FROM e0 e JOIN r{p} r ON r.host = e.src_host
  JOIN outw o ON o.src_host = e.src_host GROUP BY 1
)"""
        )
        parts.append(
            f"""d{k} AS (
  SELECT coalesce(sum(rank), 0) // (SELECT n FROM ns) AS seed_share
  FROM r{p} WHERE host NOT IN (SELECT src_host FROM outw)
)"""
        )
        parts.append(
            f"""r{k} AS (
  SELECT n.host,
         CASE WHEN n.host IN (SELECT host FROM seeds)
              THEN {(dden - dnum) * scale}::BIGINT // ({dden} * (SELECT n FROM ns))
                   + (SELECT seed_share FROM d{k})
              ELSE 0 END
         + {dnum} * coalesce(c.in_c, 0) // {dden} AS rank
  FROM nodes n LEFT JOIN c{k} c ON c.host = n.host
)"""
        )
    cte = ",\n".join(parts)
    return f"WITH {cte}\nSELECT host, rank::BIGINT AS trust_ppb FROM r{iters}"


# --- HITS (hubs & authorities, Kleinberg 1999) --------------------------------
#
# The third classic link-analysis signal next to PageRank/TrustRank: hub
# scores surface link-directory/aggregator hosts (crawl seed mining),
# authority scores surface content hosts (corpus quality prior).  The
# reference has no counterpart — training-data layer.
#
# Same determinism contract as host_pagerank: every step is BIGINT floor
# arithmetic so results are bit-identical across engines and reduction
# orders.  Classic HITS L2-normalizes; L2 needs sqrt, which is not
# integer-exact, so this uses the equally-convergent L1 renormalization:
# after each update the raw scores are divided by q = max(total DIV scale, 1),
# bringing the vector back to ~`scale` total mass.  q is a scalar aggregate
# computed driver-side in Spark and as a scalar subquery in the oracle —
# identical integers either way.
#
# Overflow bound: raw = sum(score * n_links) <= scale * total_edge_weight
# must stay < 2^63 — at scale=1e9 that allows ~9e9 total weighted in-links
# per host per iteration; the q-renormalization then caps the next round's
# scores back at ~scale, so the bound never compounds across iterations.

HITS_ITERS = 4
HITS_SCALE = 10**9


def host_hits(
    df: DataFrame,
    iters: int = HITS_ITERS,
    scale: int = HITS_SCALE,
    url_col: str = "url",
    host_col: str = "host",
    links_col: str = "links",
) -> DataFrame:
    """(host, auth_ppb, hub_ppb) — weighted HITS over the host link graph,
    a fixed number of exact-integer mutual-reinforcement iterations.

    Scale shape: identical to host_pagerank — the host-grain edge relation
    is materialized once and reused every iteration; each half-iteration is
    one shuffle-on-host join + one partial-agg'd groupBy, with per-iteration
    ``localCheckpoint`` lineage truncation.  The L1 total is a scalar
    aggregate on the driver, like the loop's fixpoint probes."""
    edges = (
        host_graph(df, url_col=url_col, host_col=host_col, links_col=links_col)
        .select("src_host", "dst_host", "n_links")
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "host",
            F.lit(0).cast("long").alias("auth_ppb"),
            F.lit(0).cast("long").alias("hub_ppb"),
        )
    hub = nodes.select("host", F.lit(scale // n).cast("long").alias("hub"))
    auth = nodes.select("host", F.lit(0).cast("long").alias("auth"))
    for _ in range(iters):
        araw = (
            edges.join(hub.withColumnRenamed("host", "src_host"), on="src_host")
            .groupBy("dst_host")
            .agg(F.sum(F.expr("hub * n_links")).alias("a_raw"))
        )
        araw = araw.localCheckpoint(eager=True)
        atot = araw.agg(F.coalesce(F.sum("a_raw"), F.lit(0))).first()[0]
        qa = max(int(atot) // scale, 1)
        auth = nodes.join(
            araw.withColumnRenamed("dst_host", "host"), on="host", how="left"
        ).select(
            "host",
            F.expr(f"coalesce(a_raw, 0L) DIV {qa}L").cast("long").alias("auth"),
        )
        auth = auth.localCheckpoint(eager=True)
        hraw = (
            edges.join(auth.withColumnRenamed("host", "dst_host"), on="dst_host")
            .groupBy("src_host")
            .agg(F.sum(F.expr("auth * n_links")).alias("h_raw"))
        )
        hraw = hraw.localCheckpoint(eager=True)
        htot = hraw.agg(F.coalesce(F.sum("h_raw"), F.lit(0))).first()[0]
        qh = max(int(htot) // scale, 1)
        hub = nodes.join(
            hraw.withColumnRenamed("src_host", "host"), on="host", how="left"
        ).select(
            "host",
            F.expr(f"coalesce(h_raw, 0L) DIV {qh}L").cast("long").alias("hub"),
        )
        hub = hub.localCheckpoint(eager=True)
    return (
        nodes.join(auth, on="host", how="left")
        .join(hub, on="host", how="left")
        .select(
            "host",
            F.coalesce(F.col("auth"), F.lit(0)).cast("long").alias("auth_ppb"),
            F.coalesce(F.col("hub"), F.lit(0)).cast("long").alias("hub_ppb"),
        )
    )


def duck_hits_sql(
    pages_meta: str, iters: int = HITS_ITERS, scale: int = HITS_SCALE
) -> str:
    """DuckDB twin: the same integer mutual-reinforcement unrolled as a CTE
    chain (h0 -> a1/h1 -> ... -> a{iters}/h{iters}); the L1 renormalization
    divisor is a scalar subquery over the same integer raws, so every value
    is bit-identical to the Spark run."""
    parts = [
        f"""e0 AS MATERIALIZED (
  SELECT src_host, dst_host, n_links FROM ({duck_host_graph_sql(pages_meta)})
)""",
        """nodes AS MATERIALIZED (
  SELECT DISTINCT host FROM (
    SELECT src_host AS host FROM e0 UNION ALL SELECT dst_host FROM e0)
)""",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"h0 AS MATERIALIZED (SELECT host, {scale}::BIGINT // (SELECT n FROM nn) AS hub"
        " FROM nodes)",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f"""ar{k} AS MATERIALIZED (
  SELECT e.dst_host AS host, sum(h.hub * e.n_links) AS a_raw
  FROM e0 e JOIN h{p} h ON h.host = e.src_host GROUP BY 1
)"""
        )
        parts.append(
            f"""a{k} AS MATERIALIZED (
  SELECT n.host,
         coalesce(c.a_raw, 0)
           // greatest((SELECT coalesce(sum(a_raw), 0) FROM ar{k}) // {scale}, 1)
           AS auth
  FROM nodes n LEFT JOIN ar{k} c ON c.host = n.host
)"""
        )
        parts.append(
            f"""hr{k} AS MATERIALIZED (
  SELECT e.src_host AS host, sum(a.auth * e.n_links) AS h_raw
  FROM e0 e JOIN a{k} a ON a.host = e.dst_host GROUP BY 1
)"""
        )
        parts.append(
            f"""h{k} AS MATERIALIZED (
  SELECT n.host,
         coalesce(c.h_raw, 0)
           // greatest((SELECT coalesce(sum(h_raw), 0) FROM hr{k}) // {scale}, 1)
           AS hub
  FROM nodes n LEFT JOIN hr{k} c ON c.host = n.host
)"""
        )
    cte = ",\n".join(parts)
    return (
        f"WITH {cte}\n"
        f"SELECT n.host, a.auth::BIGINT AS auth_ppb, h.hub::BIGINT AS hub_ppb\n"
        f"FROM nodes n JOIN a{iters} a ON a.host = n.host"
        f" JOIN h{iters} h ON h.host = n.host"
    )


# --- OPIC (On-line Page Importance Computation, Abiteboul et al., WWW'03) ----
#
# The crawl-native importance signal: PageRank needs the full graph and a
# damping fixpoint, OPIC estimates importance DURING the crawl by moving
# "cash" along out-links and remembering how much each node has ever held
# (its history).  The batch variant below runs a fixed number of synchronous
# integer-exact rounds so the result is bit-identical across engines and
# partition counts (the host_pagerank determinism rules): per round every
# host's cash flows out weighted by edge multiplicity (floor division),
# dangling cash is redistributed uniformly, and history accumulates the cash
# held at the start of the round.

OPIC_ITERS = 4
OPIC_SCALE = 10**9


def host_opic(
    df: DataFrame,
    iters: int = OPIC_ITERS,
    scale: int = OPIC_SCALE,
    url_col: str = "url",
    host_col: str = "host",
    links_col: str = "links",
) -> DataFrame:
    """(host, hist_ppb, cash_ppb) — batch OPIC over the host link graph.

    Scale shape: identical to host_pagerank — the host-grain edge relation is
    materialized once with out-degree attached; each round is one
    shuffle-on-host join + one partial-agg'd groupBy + the O(hosts) state
    join, with per-round ``localCheckpoint`` lineage truncation.  The
    dangling sum is a scalar driver aggregate, like the loop's fixpoint
    probes."""
    edges = host_graph(df, url_col=url_col, host_col=host_col, links_col=links_col)
    out_w = edges.groupBy("src_host").agg(F.sum("n_links").alias("w_out"))
    edges_w = (
        edges.select("src_host", "dst_host", "n_links")
        .join(out_w, on="src_host")
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges_w.select(F.col("src_host").alias("host"))
        .unionByName(edges_w.select(F.col("dst_host").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "host",
            F.lit(0).cast("long").alias("hist_ppb"),
            F.lit(0).cast("long").alias("cash_ppb"),
        )
    has_out = out_w.select(F.col("src_host").alias("host"))
    state = nodes.select(
        "host",
        F.lit(scale // n).cast("long").alias("cash"),
        F.lit(0).cast("long").alias("hist"),
    )
    for _ in range(iters):
        contrib = edges_w.join(
            state.select(F.col("host").alias("src_host"), "cash"), on="src_host"
        ).select(
            F.col("dst_host").alias("host"),
            F.expr("cash * n_links DIV w_out").alias("c"),
        )
        inflow = contrib.groupBy("host").agg(F.sum("c").alias("in_c"))
        dangling = (
            state.join(has_out, on="host", how="left_anti")
            .agg(F.coalesce(F.sum("cash"), F.lit(0)))
            .first()[0]
        )
        share = int(dangling) // n
        state = (
            state.join(inflow, on="host", how="left")
            .select(
                "host",
                (F.coalesce(F.col("in_c"), F.lit(0)) + F.lit(share))
                .cast("long")
                .alias("cash"),
                (F.col("hist") + F.col("cash")).cast("long").alias("hist"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select(
        "host",
        F.col("hist").alias("hist_ppb"),
        F.col("cash").alias("cash_ppb"),
    )


def duck_opic_sql(
    pages_meta: str, iters: int = OPIC_ITERS, scale: int = OPIC_SCALE
) -> str:
    """DuckDB twin of :func:`host_opic`: the same integer cash-flow rounds
    unrolled as MATERIALIZED CTEs (each state is referenced three times per
    round — plain CTEs would re-inline exponentially, the duck_hits_sql
    lesson)."""
    parts = [
        f"""e0 AS MATERIALIZED (
  SELECT src_host, dst_host, n_links FROM ({duck_host_graph_sql(pages_meta)})
)""",
        """nodes AS MATERIALIZED (
  SELECT DISTINCT host FROM (
    SELECT src_host AS host FROM e0 UNION ALL SELECT dst_host FROM e0)
)""",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "outw AS MATERIALIZED (SELECT src_host, sum(n_links) AS w_out FROM e0 GROUP BY 1)",
        f"""s0 AS MATERIALIZED (
  SELECT host, {scale}::BIGINT // (SELECT n FROM nn) AS cash, 0::BIGINT AS hist
  FROM nodes
)""",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f"""c{k} AS MATERIALIZED (
  SELECT e.dst_host AS host, sum(s.cash * e.n_links // e2.w_out) AS in_c
  FROM e0 e JOIN s{p} s ON s.host = e.src_host
  JOIN outw e2 ON e2.src_host = e.src_host GROUP BY 1
)"""
        )
        parts.append(
            f"""d{k} AS (
  SELECT coalesce(sum(cash), 0) // (SELECT n FROM nn) AS share
  FROM s{p} WHERE host NOT IN (SELECT src_host FROM outw)
)"""
        )
        parts.append(
            f"""s{k} AS MATERIALIZED (
  SELECT s.host,
         (coalesce(c.in_c, 0) + (SELECT share FROM d{k}))::BIGINT AS cash,
         (s.hist + s.cash)::BIGINT AS hist
  FROM s{p} s LEFT JOIN c{k} c ON c.host = s.host
)"""
        )
    cte = ",\n".join(parts)
    return (
        f"WITH {cte}\n"
        f"SELECT host, hist::BIGINT AS hist_ppb, cash::BIGINT AS cash_ppb FROM s{iters}"
    )


# --- host-graph connected components (site clusters / mirror detection) -------

def host_components(df: DataFrame, max_iter: int = 25) -> DataFrame:
    """(host, component) over the undirected host link graph, component =
    lexicographically-smallest reachable host — the site-cluster / mirror-
    family view (crawl budgeting treats a mirror family as one site; corpus
    curation dedups boilerplate per family, not per host).

    Reuses the iterative min-label propagation from
    ``dedupsim.connected_components`` (per-iteration localCheckpoint, label-
    sum fixpoint — string labels: the sum check becomes a count of changed
    labels).  Scale: host-grain edges (~10^7-10^8 rows), rounds = cluster
    diameter."""
    edges0 = host_graph(df).select("src_host", "dst_host")
    edges = edges0.unionByName(
        edges0.select(
            F.col("dst_host").alias("src_host"), F.col("src_host").alias("dst_host")
        )
    ).distinct().localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src_host").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint(
        eager=True
    )
    for _ in range(max_iter):
        prop = edges.join(
            labels.withColumnRenamed("node", "dst_host"), on="dst_host"
        ).select(F.col("src_host").alias("node"), "label")
        new = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        # string labels only ever decrease lexicographically; fixpoint when
        # no node's label changed this round (a scalar anti-join count)
        changed = (
            new.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("host"), F.col("label").alias("component")
    )


def duck_host_components_sql(pages_meta: str) -> str:
    """Recursive-CTE oracle: min reachable host over the transitive closure
    — implementation-independent fixpoint the propagation must match."""
    return rf"""
WITH RECURSIVE e0 AS MATERIALIZED (
  SELECT src_host, dst_host FROM ({duck_host_graph_sql(pages_meta)})
),
edges AS MATERIALIZED (
  SELECT src_host AS src, dst_host AS dst FROM e0
  UNION SELECT dst_host, src_host FROM e0
),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
walk(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, w.label FROM edges e JOIN walk w ON w.node = e.dst
)
SELECT node AS host, min(label) AS component FROM walk GROUP BY node
"""


# --- BFS depth from the seed set (crawl-reachability analysis) -----------------

def host_bfs_depth(
    df: DataFrame, seeds: DataFrame, seed_url_col: str = "url", max_iter: int = 25
) -> DataFrame:
    """(host, depth) — minimum link-hops from any seed host over the host
    graph; hosts unreachable from the seeds are absent (exactly what a
    depth-capped crawl can never fetch).  The crawl loop's reachability,
    as a closed-form graph op: pre-crawl coverage/budget planning ("what
    does depth 3 buy me from these seeds?") without running the crawl.

    Iterative min-distance relaxation with the components discipline:
    host-grain edges materialized once, one join + partial-agg min per
    round, per-iteration localCheckpoint, changed-count fixpoint; rounds =
    reachable diameter (small-world web: ~O(10))."""
    edges = (
        host_graph(df).select("src_host", "dst_host").distinct()
        .localCheckpoint(eager=True)
    )
    seed_hosts = (
        seeds.select(
            F.lower(
                F.regexp_extract(F.col(seed_url_col), r"(?i)^https?://([^/:?#]+)", 1)
            ).alias("host")
        )
        .filter(F.col("host") != "")
        .distinct()
    )
    dist = seed_hosts.select(
        "host", F.lit(0).cast("long").alias("depth")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        hop = (
            edges.join(dist.withColumnRenamed("host", "src_host"), on="src_host")
            .select(
                F.col("dst_host").alias("host"),
                (F.col("depth") + 1).alias("depth"),
            )
        )
        new = (
            dist.unionByName(hop)
            .groupBy("host")
            .agg(F.min("depth").alias("depth"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(dist.alias("o"), on="host", how="left")
            .filter(
                F.col("o.depth").isNull() | (F.col("n.depth") != F.col("o.depth"))
            )
            .count()
        )
        dist = new
        if changed == 0:
            break
    return dist.select("host", F.col("depth").cast("long").alias("depth"))


def duck_bfs_depth_sql(pages_meta: str, seeds: str) -> str:
    """Recursive-CTE oracle: min hop distance over the closure."""
    return rf"""
WITH RECURSIVE e0 AS MATERIALIZED (
  SELECT DISTINCT src_host, dst_host FROM ({duck_host_graph_sql(pages_meta)})
),
sh AS MATERIALIZED (
  SELECT DISTINCT lower(coalesce(
           regexp_extract(url, '(?i)^https?://([^/:?#]+)', 1), '')) AS host
  FROM {seeds}
),
walk(host, depth) AS (
  SELECT host, 0::BIGINT FROM sh WHERE host <> ''
  UNION
  SELECT e.dst_host, w.depth + 1
  FROM e0 e JOIN walk w ON w.host = e.src_host
  WHERE w.depth < 50
)
SELECT host, min(depth)::BIGINT AS depth FROM walk GROUP BY host
"""


# -- redirect-chain resolution (pointer doubling) -------------------------------

REDIRECT_CAP = 16  # HTTP clients cap follow depth (aiohttp default 10; curl 50)


def resolve_redirects(
    redirects: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    cap: int = REDIRECT_CAP,
) -> DataFrame:
    """(src_url, final_url, n_hops, is_loop): for every redirect source,
    the terminal url its chain lands on, how many hops away, or
    ``is_loop`` when the chain cycles / exceeds ``cap`` hops (the case the
    reference's HTTP client delegates to aiohttp's redirect limit —
    `/root/reference/web_crawler/http_client.py` never sees it; an offline
    resolver must detect it itself).

    Pointer DOUBLING, not step-by-step walking: each round composes the
    partial-resolution map with itself (``state ⋈ state``), so traversed
    path length doubles per round and chains up to ``cap`` hops resolve in
    ceil(log2(cap)) shuffles — at a 10^10-edge redirect graph that is 4
    exchanges instead of 16.  Multiple Location headers per src collapse
    first-wins (min dst) map-side before the loop, keeping the map
    functional.  A row is terminal when its cursor has no outgoing edge
    (left-anti semantics via the composition join's null branch).
    """
    edges = (
        redirects.groupBy(F.col(src_col).alias("src"))
        .agg(F.min(dst_col).alias("dst"))
    )
    # state: src -> (cur, n) after following n hops; n doubles per round.
    state = edges.select(
        "src", F.col("dst").alias("cur"), F.lit(1).cast("long").alias("n")
    ).localCheckpoint(eager=True)
    rounds = max(1, (cap - 1).bit_length())  # ceil(log2(cap))
    for _ in range(rounds):
        composed = (
            state.alias("a")
            .join(
                state.select(
                    F.col("src").alias("b_src"),
                    F.col("cur").alias("b_cur"),
                    F.col("n").alias("b_n"),
                ),
                F.col("a.cur") == F.col("b_src"),
                "left",
            )
            .select(
                F.col("a.src").alias("src"),
                F.coalesce("b_cur", "a.cur").alias("cur"),
                (F.col("a.n") + F.coalesce("b_n", F.lit(0))).alias("n"),
            )
        )
        state = composed.localCheckpoint(eager=True)
    # terminal iff the cursor has no outgoing edge; loop/too-long otherwise
    out = (
        state.join(
            edges.select(F.col("src").alias("cur"), F.lit(1).alias("has_out")),
            "cur",
            "left",
        )
        .select(
            F.col("src").alias("src_url"),
            F.when(F.col("has_out").isNull(), F.col("cur")).alias("final_url"),
            F.when(
                F.col("has_out").isNull() & (F.col("n") <= cap), F.col("n")
            ).alias("n_hops"),
            (F.col("has_out").isNotNull() | (F.col("n") > cap)).alias("is_loop"),
        )
    )
    # a terminal reached past the cap is still "too long" -> loop semantics
    return out.select(
        "src_url",
        F.when(~F.col("is_loop"), F.col("final_url")).alias("final_url"),
        F.when(~F.col("is_loop"), F.col("n_hops")).alias("n_hops"),
        "is_loop",
    )


def duck_resolve_redirects_sql(redirects: str, cap: int = REDIRECT_CAP) -> str:
    """DuckDB twin: bounded recursive-CTE walk (the oracle may walk
    step-by-step; only the engine needs the log-round plan)."""
    return rf"""
WITH RECURSIVE edges AS (
  SELECT src_url AS src, min(dst_url) AS dst FROM {redirects} GROUP BY 1
),
walk AS (
  SELECT src, dst AS cur, 1::BIGINT AS n FROM edges
  UNION ALL
  SELECT w.src, e.dst, w.n + 1
  FROM walk w JOIN edges e ON w.cur = e.src
  WHERE w.n < {cap} + 1
),
terminal AS (
  SELECT w.src, w.cur, w.n
  FROM walk w
  WHERE w.n <= {cap}
    AND NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = w.cur)
)
SELECT e.src AS src_url,
       t.cur AS final_url,
       t.n AS n_hops,
       (t.src IS NULL) AS is_loop
FROM edges e LEFT JOIN terminal t ON e.src = t.src
"""


# -- focused crawling (topic-scored frontier) ----------------------------------
#
# Fish-search/shark-search shape: an uncrawled candidate inherits the
# topical relevance of the page(s) that link to it — the crawler spends
# budget where relevant pages point.  Relevance here is the engine's
# hashed-linear classifier (textstats.classifier_score) over the parent's
# extracted text; inference is map-side, the link explode is map-side,
# and the only exchange is the per-candidate partial agg.


def focused_frontier(
    pages_meta: DataFrame,
    text_col: str = "text",
    links_col: str = "links",
) -> DataFrame:
    """(url, n_parents, best_w_sum): each outlink candidate with its
    strongest parent's classifier score (max inheritance, the
    shark-search rule) and how many crawled pages point at it.

    The parent score is computed INLINE in the same projection that
    explodes the links (classifier_w_sum is a pure column expression) —
    no self-join of the pages scan, so the whole operator is one map pass
    plus one partial-agg'd exchange on the candidate url."""
    from . import textstats

    # score FIRST, explode SECOND — keeps the (expensive) classifier
    # expression below the Generate so it runs once per parent, not once
    # per outlink
    scored = pages_meta.select(
        textstats.classifier_w_sum(text_col).alias("w_sum"),
        F.coalesce(F.col(links_col), F.array()).alias("__links"),
    )
    parents = scored.select("w_sum", F.explode("__links").alias("url"))
    return parents.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_parents"),
        F.max("w_sum").alias("best_w_sum"),
    )


def duck_focused_frontier_sql(pages_meta: str, classifier_sql: str) -> str:
    """DuckDB twin of :func:`focused_frontier`; ``classifier_sql`` is
    textstats.duck_classifier_sql over the same table keyed by url."""
    return f"""
WITH scored AS ({classifier_sql}),
parents AS (
  SELECT m.url AS parent, l.link AS url
  FROM {pages_meta} m, LATERAL unnest(coalesce(m.links, [])) AS l(link)
)
SELECT p.url, count(*)::BIGINT AS n_parents, max(s.w_sum)::BIGINT AS best_w_sum
FROM parents p JOIN scored s ON s.doc_id = p.parent
GROUP BY 1
"""


# -- anchor-augmented retrieval ------------------------------------------------


def anchor_expanded_docs(
    pages: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """(doc_id, text): each page's text expanded with its INCOMING anchor
    texts, each repeated by reference count — the classic ranking signal
    ("anchor text mirrors queries"): a page is described by what other
    pages call it, not only by what it says.

    Scale shape: anchors partial-agg on (dst_url, anchor) (anchor_texts),
    re-expand by n_refs map-side, collapse to ONE blob row per target, and
    the url-grain join carries (url, blob) pairs — page html never moves.
    Anchors pointing at uncrawled targets drop at the left join."""
    anchors = anchor_texts(pages, url_col=url_col)
    blob = (
        anchors.select(
            "dst_url",
            F.explode(
                F.array_repeat(F.col("anchor"), F.col("n_refs").cast("int"))
            ).alias("a"),
        )
        .groupBy("dst_url")
        .agg(F.array_join(F.collect_list("a"), " ").alias("__anchors"))
    )
    return pages.select(
        F.col(url_col).alias("doc_id"), F.col(text_col).alias("__body")
    ).join(blob, F.col("doc_id") == F.col("dst_url"), "left").select(
        "doc_id",
        F.concat_ws(" ", F.col("__body"), F.coalesce(F.col("__anchors"), F.lit(""))).alias("text"),
    )


def bm25_anchor_topk(pages: DataFrame, **kw) -> DataFrame:
    """Top-k BM25 over anchor-expanded documents (textstats.bm25_topk on
    anchor_expanded_docs) — tf counts include the incoming anchor terms,
    so a page heavily referred to by query words outranks a page merely
    containing them."""
    from . import textstats

    return textstats.bm25_topk(anchor_expanded_docs(pages), **kw)


def duck_anchor_expanded_sql(pages: str) -> str:
    """DuckDB twin of :func:`anchor_expanded_docs` (exposes doc_id, text)."""
    return f"""
SELECT p.url AS doc_id,
       p.text || ' ' || coalesce(b.blob, '') AS text
FROM {pages} p
LEFT JOIN (
  SELECT dst_url, string_agg(repeat(anchor || ' ', n_refs::INT), '') AS blob
  FROM ({duck_anchor_texts_sql(pages)})
  GROUP BY 1
) b ON p.url = b.dst_url
"""


# --- host communities via label propagation (LPA) ---------------------------
#
# Connected components (host_components) finds mirror FAMILIES — everything
# reachable ends up together.  Community detection finds the denser
# sub-clusters inside the giant component (topical site neighborhoods, spam
# farms cross-linking each other), the grain crawl-budget and corpus-mix
# decisions actually want.  Raghavan et al. 2007 label propagation, made
# deterministic for cross-engine grading: SYNCHRONOUS updates, a FIXED
# iteration count (synchronous LPA can oscillate on bipartite structure —
# a fixpoint test would not terminate; a fixed horizon is the standard
# batch rendering), and ties broken by lexicographically-smallest label.

LPA_ITERS = 4


def host_communities(df: DataFrame, iters: int = LPA_ITERS) -> DataFrame:
    """(host, community) after ``iters`` synchronous LPA rounds over the
    undirected weighted host graph: each round every host adopts the label
    with the largest summed edge weight among its neighbors (ties -> min
    label).  Self-loops are dropped (a self-vote freezes the start layout).

    Scale shape: host-grain edges (orders below the page corpus); one
    join + two-level keyed agg per round, each with map-side partial agg;
    per-round localCheckpoint keeps the plan flat (the crawl loop's lineage
    discipline).  The argmax is min(struct(-w, label)) — ONE aggregation,
    no per-node window sort."""
    e0 = host_graph(df).filter(F.col("src_host") != F.col("dst_host"))
    edges = (
        e0.select("src_host", "dst_host", "n_links")
        .unionByName(
            e0.select(
                F.col("dst_host").alias("src_host"),
                F.col("src_host").alias("dst_host"),
                "n_links",
            )
        )
        .groupBy("src_host", "dst_host")
        .agg(F.sum("n_links").alias("w"))
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src_host").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        votes = (
            edges.join(
                labels.withColumnRenamed("node", "dst_host"), on="dst_host"
            )
            .groupBy(F.col("src_host").alias("node"), "label")
            .agg(F.sum("w").alias("ws"))
        )
        labels = (
            votes.groupBy("node")
            .agg(
                F.min(F.struct((-F.col("ws")).alias("nw"), "label"))["label"].alias(
                    "label"
                )
            )
            .localCheckpoint(eager=True)
        )
    return labels.select(F.col("node").alias("host"), F.col("label").alias("community"))


def duck_communities_sql(pages_meta: str, iters: int = LPA_ITERS) -> str:
    """DuckDB twin: the same synchronous rounds unrolled as a CTE chain
    (the duck_pagerank_sql convention); argmax = row_number over
    (ws DESC, label)."""
    parts = [
        f"""e0 AS (
  SELECT src_host, dst_host, n_links FROM ({duck_host_graph_sql(pages_meta)})
  WHERE src_host <> dst_host
)""",
        """edges AS (
  SELECT src_host, dst_host, sum(n_links) AS w FROM (
    SELECT src_host, dst_host, n_links FROM e0
    UNION ALL SELECT dst_host, src_host, n_links FROM e0)
  GROUP BY 1, 2
)""",
        "l0 AS (SELECT DISTINCT src_host AS node, src_host AS label FROM edges)",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f"""v{k} AS (
  SELECT e.src_host AS node, l.label, sum(e.w) AS ws
  FROM edges e JOIN l{p} l ON l.node = e.dst_host GROUP BY 1, 2
)"""
        )
        parts.append(
            f"""l{k} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node ORDER BY ws DESC, label) AS rn
    FROM v{k}) WHERE rn = 1
)"""
        )
    cte = ",\n".join(parts)
    return f"WITH {cte}\nSELECT node AS host, label AS community FROM l{iters}"


# --- edge reciprocity (link-farm signal) -------------------------------------


def host_reciprocity(df: DataFrame) -> DataFrame:
    """(host, n_out, n_recip, recip_ppm): per source host, how many of its
    distinct outgoing host edges are reciprocated — organic linking is
    heavily one-way, link farms cross-link (Becchetti et al., "Link analysis
    for Web spam detection": reciprocity ranks with TrustRank as a working
    farm signal).

    Scale shape: the host-grain edge list is orders below the page corpus;
    reciprocation is ONE self-join on the reversed key (left-semi, so
    nothing widens) followed by one partial-agg'd host exchange — no page
    row ever moves, and ppm output keeps the ratio integer-exact."""
    e = host_graph(df).filter(F.col("src_host") != F.col("dst_host")).select(
        "src_host", "dst_host"
        # materialized: e feeds both sides of the reciprocation semi-join
        # and the out-degree agg (3 host_graph builds otherwise)
    ).localCheckpoint(eager=True)
    recip = e.join(
        e.select(
            F.col("dst_host").alias("src_host"), F.col("src_host").alias("dst_host")
        ),
        on=["src_host", "dst_host"],
        how="left_semi",
    )
    out_deg = e.groupBy(F.col("src_host").alias("host")).agg(
        F.count("*").cast("long").alias("n_out")
    )
    rec_deg = recip.groupBy(F.col("src_host").alias("host")).agg(
        F.count("*").cast("long").alias("n_recip")
    )
    return (
        out_deg.join(rec_deg, on="host", how="left")
        .select(
            "host",
            "n_out",
            F.coalesce(F.col("n_recip"), F.lit(0)).cast("long").alias("n_recip"),
        )
        # integer DIV keeps the ratio bit-exact across engines (repo rule)
        .withColumn("recip_ppm", F.expr("n_recip * 1000000L DIV n_out"))
    )


def duck_reciprocity_sql(pages_meta: str) -> str:
    """DuckDB twin of :func:`host_reciprocity`."""
    return rf"""
WITH e AS (
  SELECT src_host, dst_host FROM ({duck_host_graph_sql(pages_meta)})
  WHERE src_host <> dst_host
),
r AS (
  SELECT a.src_host, a.dst_host
  FROM e a WHERE EXISTS (
    SELECT 1 FROM e b
    WHERE b.src_host = a.dst_host AND b.dst_host = a.src_host)
)
SELECT e.src_host AS host,
       count(*)::BIGINT AS n_out,
       coalesce(any_value(rc.n_recip), 0)::BIGINT AS n_recip,
       (coalesce(any_value(rc.n_recip), 0) * 1000000 // count(*))::BIGINT
         AS recip_ppm
FROM e
LEFT JOIN (SELECT src_host, count(*)::BIGINT AS n_recip FROM r GROUP BY 1) rc
  ON rc.src_host = e.src_host
GROUP BY e.src_host
"""


# --- co-citation similarity (related-domain mining) --------------------------
#
# Two hosts are related when many DISTINCT sources link to both (classic
# co-citation analysis, Small 1973, applied to the host web graph).  The
# scalable form is the inverted-index self-join on the source host — the
# same postings shape as the dedup containment join, with the same
# super-node defense: a source linking k hosts contributes k² pair rows,
# so sources above an out-degree cap are pruned from BOTH the pair join
# and the in-degree denominators (consistent "discriminative source
# space"; directory/aggregator hosts carry no similarity signal anyway).

COCIT_OUT_CAP = 128       # fixture-sized; production uses O(10^2-10^3)
COCIT_MIN_SHARED = 10


def host_cocitation(
    df: DataFrame,
    out_cap: int = COCIT_OUT_CAP,
    min_shared: int = COCIT_MIN_SHARED,
) -> DataFrame:
    """(host_a, host_b, n_shared, n_a, n_b, jaccard_ppm): host pairs
    co-cited by >= ``min_shared`` distinct sources, with exact-integer
    Jaccard over their (capped) citing-source sets.

    Scale shape: edges collapse to the distinct host-pair relation first
    (host_graph's partial-agg exchange); the pair join fans out <= cap²
    per surviving source; in-degrees ride one partial-agg'd exchange and
    broadcast back onto the (much smaller) pair relation."""
    e = host_graph(df).select("src_host", "dst_host")
    out_deg = e.groupBy("src_host").agg(F.count("*").alias("out_deg"))
    kept = e.join(
        out_deg.where(F.col("out_deg") <= out_cap).select("src_host"),
        "src_host",
        # materialized: kept feeds in_deg AND both sides of the pair
        # self-join — without this the host_graph build runs three times
        # (the winnow branch-recompute lesson)
    ).localCheckpoint(eager=True)
    in_deg = kept.groupBy("dst_host").agg(F.count("*").alias("in_deg"))
    pairs = (
        kept.alias("l")
        .join(
            kept.alias("r"),
            on=[
                F.col("l.src_host") == F.col("r.src_host"),
                F.col("l.dst_host") < F.col("r.dst_host"),
            ],
        )
        .groupBy(
            F.col("l.dst_host").alias("host_a"),
            F.col("r.dst_host").alias("host_b"),
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return (
        pairs.join(
            in_deg.select(
                F.col("dst_host").alias("host_a"), F.col("in_deg").alias("n_a")
            ),
            "host_a",
        )
        .join(
            in_deg.select(
                F.col("dst_host").alias("host_b"), F.col("in_deg").alias("n_b")
            ),
            "host_b",
        )
        .select(
            "host_a",
            "host_b",
            "n_shared",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr("n_shared * 1000000L DIV (n_a + n_b - n_shared)").alias(
                "jaccard_ppm"
            ),
        )
    )


def duck_cocitation_sql(
    pages_meta: str,
    out_cap: int = COCIT_OUT_CAP,
    min_shared: int = COCIT_MIN_SHARED,
) -> str:
    """DuckDB twin of :func:`host_cocitation`."""
    return rf"""
WITH g AS ({duck_host_graph_sql(pages_meta)}),
e AS (SELECT src_host, dst_host FROM g),
keep AS (
  SELECT src_host FROM e GROUP BY 1 HAVING count(*) <= {out_cap}
),
kept AS (SELECT e.* FROM e JOIN keep USING (src_host)),
indeg AS (SELECT dst_host, count(*)::BIGINT AS in_deg FROM kept GROUP BY 1),
pairs AS (
  SELECT l.dst_host AS host_a, r.dst_host AS host_b,
         count(*)::BIGINT AS n_shared
  FROM kept l JOIN kept r
    ON l.src_host = r.src_host AND l.dst_host < r.dst_host
  GROUP BY 1, 2
  HAVING count(*) >= {min_shared}
)
SELECT p.host_a, p.host_b, p.n_shared,
       ia.in_deg AS n_a, ib.in_deg AS n_b,
       (p.n_shared * 1000000 // (ia.in_deg + ib.in_deg - p.n_shared))::BIGINT
         AS jaccard_ppm
FROM pairs p
JOIN indeg ia ON ia.dst_host = p.host_a
JOIN indeg ib ON ib.dst_host = p.host_b
"""


# --- triangle counting (clustering coefficient / link-farm signal) -----------
#
# Local triangle counts over the undirected host graph: link farms and
# mutual-admiration spam cliques show anomalously high triangle density
# (Becchetti et al., KDD'08 use exactly this signal for web-spam
# detection).  The scalable enumeration is the classic degree-ordered
# orientation (Chiba-Nishizeki / "compact-forward"): orient every edge
# from the lower-(degree, name) endpoint to the higher, so every wedge
# join group is bounded by the oriented out-degree <= O(sqrt(edges)) —
# the hub that would explode a naive wedge join becomes a SINK with
# near-zero out-degree.


def host_triangles(df: DataFrame) -> DataFrame:
    """(host, n_triangles): per-host triangle participation counts over
    the undirected distinct host graph (self-loops dropped).

    Plan: distinct undirected edges -> degree agg (one small exchange) ->
    orientation by (degree, host) total order -> wedge self-join on the
    oriented source -> closing-edge semi-join -> 3-way explode back to
    host grain.  Each triangle is enumerated exactly once."""
    e = host_graph(df).select("src_host", "dst_host")
    und = (
        e.where(F.col("src_host") != F.col("dst_host"))
        .select(
            F.least("src_host", "dst_host").alias("a"),
            F.greatest("src_host", "dst_host").alias("b"),
        )
        .distinct()
        # materialized: und feeds the degree agg (twice, via the union) and
        # the orientation join — unmaterialized, the host_graph build
        # re-executed per branch (measured 15 parquet scans -> 1 build)
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("h"))
        .unionAll(und.select(F.col("b").alias("h")))
        .groupBy("h")
        .agg(F.count("*").alias("deg"))
    )
    wd = (
        und.join(deg.select(F.col("h").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("h").alias("b"), F.col("deg").alias("db")), "b")
    )
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = wd.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    l, r = oriented.alias("l"), oriented.alias("r")
    wedges = l.join(
        r,
        on=[
            F.col("l.u") == F.col("r.u"),
            (F.col("l.dv") < F.col("r.dv"))
            | ((F.col("l.dv") == F.col("r.dv")) & (F.col("l.v") < F.col("r.v"))),
        ],
    ).select(
        F.col("l.u").alias("x"), F.col("l.v").alias("y"), F.col("r.v").alias("z")
    )
    tri = wedges.join(
        oriented.select(F.col("u").alias("y"), F.col("v").alias("z")),
        ["y", "z"],
        "leftsemi",
    )
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("host"))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )


def duck_triangles_sql(pages_meta: str) -> str:
    """DuckDB twin of :func:`host_triangles` — lexicographic x<y<z
    enumeration (orientation-invariant: the triangle multiset is the
    same, so per-host counts match the degree-ordered engine)."""
    return rf"""
WITH g AS ({duck_host_graph_sql(pages_meta)}),
e0 AS (
  SELECT DISTINCT least(src_host, dst_host) AS a,
                  greatest(src_host, dst_host) AS b
  FROM g WHERE src_host <> dst_host
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e0 e1
  JOIN e0 e2 ON e2.a = e1.b
  JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT host, count(*)::BIGINT AS n_triangles FROM (
  SELECT x AS host FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
) GROUP BY 1
"""


# --- coreness decomposition (graph-density / spam-neighborhood signal) -----
#
# Core number per host over the undirected host graph — the k-core
# decomposition used as a web-spam feature (Becchetti et al. KDD'08 use
# degree-family features; coreness is the standard densest-neighborhood
# refinement) and as a crawl-prioritization prior (high-core hosts sit in
# densely interlinked regions; low-core hosts are the periphery).
#
# Algorithm: the h-index fixpoint (Lu, Chen, Zhou, Stanley, PNAS 2016):
# start from degree and repeatedly set c(v) := H(c(u) for u ~ v), the
# largest h such that at least h neighbors have value >= h.  The sequence
# is integer, monotonically non-increasing, and converges exactly to the
# core number — so a fixpoint reached in i iterations is unchanged by any
# further iteration, and an oracle that unrolls max_iter levels matches the
# engine that stopped at the fixpoint.  All-integer: bit-identical across
# engines and reduction orders.

CORENESS_MAX_ITER = 28


def host_coreness(df: DataFrame, max_iter: int = CORENESS_MAX_ITER) -> DataFrame:
    """(host, coreness) over the undirected host link graph (self-loops
    dropped, edges deduped).

    Scale shape: the state is one row per host; each iteration is one
    edge->state join plus a per-host window on the neighbor values (host
    grain — partitions by the same key the join shuffled on, so Catalyst
    reuses the exchange) and a partial-agg'd max.  Rounds are data-bounded
    (fixpoint checked with a scalar count); each round localCheckpoints to
    keep the lineage flat — the repo's iterative-plan discipline.  Raises
    if the fixpoint is not reached within ``max_iter`` so the unrolled
    oracle depth is provably sufficient."""
    from pyspark.sql import Window

    g = host_graph(df).select("src_host", "dst_host").filter(
        F.col("src_host") != F.col("dst_host")
    )
    edges = (
        g.unionByName(
            g.select(
                F.col("dst_host").alias("src_host"),
                F.col("src_host").alias("dst_host"),
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    state = (
        edges.groupBy(F.col("src_host").alias("host"))
        .agg(F.count("*").cast("long").alias("core"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("node").orderBy(
        F.col("nval").desc(), F.col("dst_host")
    )
    for _ in range(max_iter):
        nbr = edges.join(
            state.withColumnRenamed("host", "dst_host").withColumnRenamed(
                "core", "nval"
            ),
            on="dst_host",
        ).select(F.col("src_host").alias("node"), "dst_host", "nval")
        new = (
            nbr.select(
                "node", F.least(F.row_number().over(w), F.col("nval")).alias("h")
            )
            .groupBy(F.col("node").alias("host"))
            .agg(F.max("h").cast("long").alias("core"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(state.alias("o"), on="host")
            .filter(F.col("n.core") != F.col("o.core"))
            .count()
        )
        state = new
        if changed == 0:
            return state
    raise RuntimeError(
        f"host_coreness: no fixpoint within {max_iter} iterations"
    )


def duck_coreness_sql(pages_meta: str, max_iter: int = CORENESS_MAX_ITER) -> str:
    """DuckDB twin of :func:`host_coreness` — the same h-index iteration
    unrolled ``max_iter`` levels (the engine asserts its fixpoint landed
    within that horizon, and the iteration is a no-op at the fixpoint, so
    extra unrolled levels cannot diverge)."""
    head = rf"""
WITH g AS MATERIALIZED ({duck_host_graph_sql(pages_meta)}),
e0 AS MATERIALIZED (
  SELECT DISTINCT src_host AS src, dst_host AS dst FROM g
  WHERE src_host <> dst_host
),
edges AS MATERIALIZED (
  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
),
c0 AS (SELECT src AS host, count(*)::BIGINT AS core FROM edges GROUP BY 1)
"""
    steps = []
    for i in range(max_iter):
        steps.append(rf""",
c{i + 1} AS MATERIALIZED (
  SELECT node AS host, max(least(rn, nval))::BIGINT AS core FROM (
    SELECT e.src AS node, c.core AS nval,
           row_number() OVER (PARTITION BY e.src
                              ORDER BY c.core DESC, e.dst) AS rn
    FROM edges e JOIN c{i} c ON e.dst = c.host
  ) GROUP BY 1
)""")
    return head + "".join(steps) + f"\nSELECT host, core FROM c{max_iter}"


# --- bow-tie decomposition (Broder et al., "Graph structure in the Web") ------
#
# The macroscopic map of a crawled web graph: the giant strongly-connected
# CORE, the IN set that reaches it, the OUT set it reaches, TENDRILS hanging
# off IN/OUT (tubes folded in), and DISCONNECTED islands.  Crawl planning
# reads this directly — seeds in IN ∪ CORE cover CORE+OUT; anything outside
# the weak component of the core is unreachable no matter the budget.  The
# reference has no counterpart; this is crawl-analytics breadth.

BOWTIE_MAX_ITER = 30


def _reach(edges: DataFrame, seed: DataFrame, max_iter: int) -> DataFrame:
    """Hosts reachable from ``seed`` over directed (src, dst) edges.  Delta
    frontier BFS: each round joins only the NEW frontier against the edge
    relation and anti-joins the visited set — per-round exchange is
    O(frontier boundary), not O(visited), and rounds = reachable diameter
    (small-world web: ~O(10)).  Visited/frontier are host-grain (~10^8 rows
    at 10^10-URL scale) and localCheckpointed per round to cut lineage."""
    visited = seed.localCheckpoint(eager=True)
    frontier = visited
    for _ in range(max_iter):
        nxt = (
            edges.join(frontier.withColumnRenamed("host", "src"), on="src")
            .select(F.col("dst").alias("host"))
            .distinct()
            .join(visited, on="host", how="left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def host_bowtie(df: DataFrame, max_iter: int = BOWTIE_MAX_ITER) -> DataFrame:
    """(host, region) — region in {core, in, out, tendril, disconnected}.

    Pivot = max-degree host (ties to the lexicographically smallest), the
    standard giant-SCC anchor; CORE = forward ∩ backward reachable set of
    the pivot, IN = backward-only, OUT = forward-only, TENDRIL = in the
    pivot's weak component but none of the above, DISCONNECTED = the rest.
    Three delta-frontier BFS passes (forward, reversed, symmetric) over the
    distinct host-grain edge set materialized once; the pivot is a scalar
    driver value by construction (orderBy.limit(1) on the degree rollup)."""
    e0 = (
        host_graph(df)
        .select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e0.select(F.col("src").alias("host"))
        .unionByName(e0.select(F.col("dst").alias("host")))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("deg"))
        .localCheckpoint(eager=True)
    )
    pivot = deg.orderBy(F.desc("deg"), F.asc("host")).limit(1).select("host")
    rev = e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    sym = e0.unionByName(rev).distinct().localCheckpoint(eager=True)
    fwd = _reach(e0, pivot, max_iter)
    bwd = _reach(rev, pivot, max_iter)
    weak = _reach(sym, pivot, max_iter)
    return (
        deg.select("host")
        .join(fwd.withColumn("f", F.lit(1)), on="host", how="left")
        .join(bwd.withColumn("b", F.lit(1)), on="host", how="left")
        .join(weak.withColumn("w", F.lit(1)), on="host", how="left")
        .select(
            "host",
            F.when(F.col("f").isNotNull() & F.col("b").isNotNull(), F.lit("core"))
            .when(F.col("b").isNotNull(), F.lit("in"))
            .when(F.col("f").isNotNull(), F.lit("out"))
            .when(F.col("w").isNotNull(), F.lit("tendril"))
            .otherwise(F.lit("disconnected"))
            .alias("region"),
        )
    )


def duck_bowtie_sql(pages_meta: str) -> str:
    """Recursive-CTE oracle: forward / backward / weak transitive closures
    from the same deterministic pivot — an implementation-independent
    fixpoint the delta BFS must match."""
    return rf"""
WITH RECURSIVE g AS MATERIALIZED (
  SELECT DISTINCT src_host AS src, dst_host AS dst
  FROM ({duck_host_graph_sql(pages_meta)}) WHERE src_host <> dst_host
),
deg AS MATERIALIZED (
  SELECT host, count(*)::BIGINT AS deg FROM (
    SELECT src AS host FROM g UNION ALL SELECT dst FROM g
  ) GROUP BY host
),
pv AS MATERIALIZED (SELECT host FROM deg ORDER BY deg DESC, host ASC LIMIT 1),
sym AS MATERIALIZED (SELECT src, dst FROM g UNION SELECT dst, src FROM g),
fwd(host) AS (
  SELECT host FROM pv
  UNION SELECT e.dst FROM g e JOIN fwd w ON w.host = e.src
),
bwd(host) AS (
  SELECT host FROM pv
  UNION SELECT e.src FROM g e JOIN bwd w ON w.host = e.dst
),
weak(host) AS (
  SELECT host FROM pv
  UNION SELECT e.dst FROM sym e JOIN weak w ON w.host = e.src
)
SELECT d.host,
  CASE WHEN f.host IS NOT NULL AND b.host IS NOT NULL THEN 'core'
       WHEN b.host IS NOT NULL THEN 'in'
       WHEN f.host IS NOT NULL THEN 'out'
       WHEN w.host IS NOT NULL THEN 'tendril'
       ELSE 'disconnected' END AS region
FROM deg d
LEFT JOIN fwd f ON d.host = f.host
LEFT JOIN bwd b ON d.host = b.host
LEFT JOIN weak w ON d.host = w.host
"""


# --- SALSA (Lempel & Moran 2001) ----------------------------------------------
#
# The degree-normalized alternative to HITS: hubs and authorities are the
# stationary distributions of a random walk that alternates backward/forward
# along links, dividing by out-/in-degree at each step.  Unlike HITS it is
# not dominated by tightly-knit clusters (the TKC effect) — the reason
# production link-analysis stacks (e.g. follow-recommenders) picked it.
# Same determinism contract as host_pagerank/host_hits: every step is BIGINT
# arithmetic (per-edge floor division by the degree weight, L1 renorm by a
# scalar integer divisor), bit-identical across engines and partitionings.

SALSA_ITERS = 4
SALSA_SCALE = 10**9


def host_salsa(
    df: DataFrame,
    iters: int = SALSA_ITERS,
    scale: int = SALSA_SCALE,
) -> DataFrame:
    """(host, auth_ppb, hub_ppb) — fixed-iteration integer SALSA over the
    weighted host graph.  Each half-step moves mass along every edge
    divided by the source side's total edge weight (out-weight for the
    hub->auth step, in-weight for auth->hub), then renormalizes the L1
    total back to ``scale``.

    Scale shape: the edge relation is materialized ONCE with both degree
    weights attached (two partial-agg'd rollups + two broadcast-or-shuffle
    joins before the loop), so each iteration is one shuffle-on-host join
    + one partial-agg'd groupBy, per-iteration localCheckpoint — identical
    to the pagerank/HITS loop economics.  Overflow: mass <= scale and
    per-edge product mass * n_links needs n_links < 2^63 / scale ~ 9e9
    per host pair, same bound as pagerank."""
    e0 = host_graph(df).select("src_host", "dst_host", "n_links")
    outw = e0.groupBy("src_host").agg(F.sum("n_links").alias("ow"))
    inw = e0.groupBy("dst_host").agg(F.sum("n_links").alias("iw"))
    edges = (
        e0.join(outw, on="src_host").join(inw, on="dst_host")
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "host",
            F.lit(0).cast("long").alias("auth_ppb"),
            F.lit(0).cast("long").alias("hub_ppb"),
        )
    hub = nodes.select("host", F.lit(scale // n).cast("long").alias("hub"))
    auth = nodes.select("host", F.lit(0).cast("long").alias("auth"))
    for _ in range(iters):
        araw = (
            edges.join(hub.withColumnRenamed("host", "src_host"), on="src_host")
            .groupBy("dst_host")
            .agg(F.sum(F.expr("hub * n_links DIV ow")).alias("a_raw"))
            .localCheckpoint(eager=True)
        )
        atot = araw.agg(F.coalesce(F.sum("a_raw"), F.lit(0))).first()[0]
        qa = max(int(atot) // scale, 1)
        auth = (
            nodes.join(araw.withColumnRenamed("dst_host", "host"), on="host", how="left")
            .select(
                "host",
                F.expr(f"coalesce(a_raw, 0L) DIV {qa}L").cast("long").alias("auth"),
            )
            .localCheckpoint(eager=True)
        )
        hraw = (
            edges.join(auth.withColumnRenamed("host", "dst_host"), on="dst_host")
            .groupBy("src_host")
            .agg(F.sum(F.expr("auth * n_links DIV iw")).alias("h_raw"))
            .localCheckpoint(eager=True)
        )
        htot = hraw.agg(F.coalesce(F.sum("h_raw"), F.lit(0))).first()[0]
        qh = max(int(htot) // scale, 1)
        hub = (
            nodes.join(hraw.withColumnRenamed("src_host", "host"), on="host", how="left")
            .select(
                "host",
                F.expr(f"coalesce(h_raw, 0L) DIV {qh}L").cast("long").alias("hub"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        nodes.join(auth, on="host", how="left")
        .join(hub, on="host", how="left")
        .select(
            "host",
            F.coalesce(F.col("auth"), F.lit(0)).cast("long").alias("auth_ppb"),
            F.coalesce(F.col("hub"), F.lit(0)).cast("long").alias("hub_ppb"),
        )
    )


def duck_salsa_sql(
    pages_meta: str, iters: int = SALSA_ITERS, scale: int = SALSA_SCALE
) -> str:
    """DuckDB twin: the same integer degree-normalized walk unrolled as a
    CTE chain; per-edge floor division and scalar L1 divisors mirror the
    Spark expressions term-for-term."""
    parts = [
        f"""e0 AS MATERIALIZED (
  SELECT src_host, dst_host, n_links FROM ({duck_host_graph_sql(pages_meta)})
)""",
        """ew AS MATERIALIZED (
  SELECT e.src_host, e.dst_host, e.n_links, o.ow, i.iw
  FROM e0 e
  JOIN (SELECT src_host, sum(n_links) AS ow FROM e0 GROUP BY 1) o
    ON o.src_host = e.src_host
  JOIN (SELECT dst_host, sum(n_links) AS iw FROM e0 GROUP BY 1) i
    ON i.dst_host = e.dst_host
)""",
        """nodes AS MATERIALIZED (
  SELECT DISTINCT host FROM (
    SELECT src_host AS host FROM e0 UNION ALL SELECT dst_host FROM e0)
)""",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"h0 AS MATERIALIZED (SELECT host, {scale}::BIGINT // (SELECT n FROM nn) AS hub"
        " FROM nodes)",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f"""ar{k} AS MATERIALIZED (
  SELECT e.dst_host AS host, sum(h.hub * e.n_links // e.ow) AS a_raw
  FROM ew e JOIN h{p} h ON h.host = e.src_host GROUP BY 1
)"""
        )
        parts.append(
            f"""a{k} AS MATERIALIZED (
  SELECT n.host,
         coalesce(c.a_raw, 0)
           // greatest((SELECT coalesce(sum(a_raw), 0) FROM ar{k}) // {scale}, 1)
           AS auth
  FROM nodes n LEFT JOIN ar{k} c ON c.host = n.host
)"""
        )
        parts.append(
            f"""hr{k} AS MATERIALIZED (
  SELECT e.src_host AS host, sum(a.auth * e.n_links // e.iw) AS h_raw
  FROM ew e JOIN a{k} a ON a.host = e.dst_host GROUP BY 1
)"""
        )
        parts.append(
            f"""h{k} AS MATERIALIZED (
  SELECT n.host,
         coalesce(c.h_raw, 0)
           // greatest((SELECT coalesce(sum(h_raw), 0) FROM hr{k}) // {scale}, 1)
           AS hub
  FROM nodes n LEFT JOIN hr{k} c ON c.host = n.host
)"""
        )
    cte = ",\n".join(parts)
    return (
        f"WITH {cte}\n"
        f"SELECT n.host, a.auth::BIGINT AS auth_ppb, h.hub::BIGINT AS hub_ppb\n"
        f"FROM nodes n JOIN a{iters} a ON a.host = n.host"
        f" JOIN h{iters} h ON h.host = n.host"
    )


# --- rich-club coefficient (Colizza et al. 2006) -------------------------------
#
# phi(k): among hosts of degree > k, what fraction of the possible edges
# exist?  A rising tail says the web's high-degree core is a densely wired
# elite (hub-interlock, syndication rings); spam detection and crawl-budget
# design both read it.  Exact rational in integer ppm — no float, no
# sampling: both suffix counts (hosts above k, edges whose endpoint degrees
# are both above k) come from one descending cumulative window over the
# DISTINCT-DEGREE-VALUE frame, so the curve costs two partial aggs + one
# tiny window, never a per-k pass over the graph.


def host_rich_club(df: DataFrame) -> DataFrame:
    """(k, n_hosts_gt, n_edges_gt, rich_club_ppm) for every degree value k
    present: n_hosts_gt = #hosts with degree > k, n_edges_gt = #undirected
    edges with min(deg_u, deg_v) > k, rich_club_ppm =
    2 * n_edges_gt * 1e6 DIV (n_hosts_gt * (n_hosts_gt - 1)) (0 when fewer
    than two hosts qualify).

    Scale shape: degree rollup + (u < v) unordered edge frame are host- /
    edge-grain partial aggs; the suffix sums run on the distinct-degree
    frame (<= max-degree rows, ~10^5 even at 10^10-URL scale — a
    single-partition window over a provably tiny frame, documented the
    same way as the quantile/histogram ops)."""
    e0 = (
        host_graph(df)
        .select(F.col("src_host").alias("u"), F.col("dst_host").alias("v"))
        .where(F.col("u") != F.col("v"))
    )
    und = e0.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    ).distinct()
    deg = (
        und.select(F.col("u").alias("host"))
        .unionByName(und.select(F.col("v").alias("host")))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("deg"))
        .localCheckpoint(eager=True)
    )
    edge_m = (
        und.join(deg.withColumnRenamed("host", "u").withColumnRenamed("deg", "du"), on="u")
        .join(deg.withColumnRenamed("host", "v").withColumnRenamed("deg", "dv"), on="v")
        .select(F.least("du", "dv").alias("k"))
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("e_cnt"))
    )
    deg_k = deg.groupBy(F.col("deg").alias("k")).agg(
        F.count("*").cast("long").alias("h_cnt")
    )
    from pyspark.sql import Window

    merged = deg_k.join(edge_m, on="k", how="left").select(
        "k", "h_cnt", F.coalesce("e_cnt", F.lit(0)).alias("e_cnt")
    )
    w = (
        Window.orderBy(F.desc("k"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return merged.select(
        F.col("k").cast("long").alias("k"),
        F.coalesce(F.sum("h_cnt").over(w), F.lit(0)).cast("long").alias("n_hosts_gt"),
        F.coalesce(F.sum("e_cnt").over(w), F.lit(0)).cast("long").alias("n_edges_gt"),
    ).select(
        "k",
        "n_hosts_gt",
        "n_edges_gt",
        F.expr(
            "2 * n_edges_gt * 1000000 DIV greatest(n_hosts_gt * (n_hosts_gt - 1), 1)"
        )
        .cast("long")
        .alias("rich_club_ppm"),
    )


def duck_rich_club_sql(pages_meta: str) -> str:
    return rf"""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT least(src_host, dst_host) AS u, greatest(src_host, dst_host) AS v
  FROM ({duck_host_graph_sql(pages_meta)}) WHERE src_host <> dst_host
),
deg AS MATERIALIZED (
  SELECT host, count(*)::BIGINT AS deg FROM (
    SELECT u AS host FROM e0 UNION ALL SELECT v FROM e0
  ) GROUP BY host
),
em AS (
  SELECT least(du.deg, dv.deg) AS k, count(*)::BIGINT AS e_cnt
  FROM e0 JOIN deg du ON du.host = e0.u JOIN deg dv ON dv.host = e0.v
  GROUP BY 1
),
dk AS (SELECT deg AS k, count(*)::BIGINT AS h_cnt FROM deg GROUP BY 1),
m AS (
  SELECT dk.k, dk.h_cnt, coalesce(em.e_cnt, 0) AS e_cnt
  FROM dk LEFT JOIN em ON em.k = dk.k
),
s AS (
  SELECT k,
    coalesce(sum(h_cnt) OVER (ORDER BY k DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS n_hosts_gt,
    coalesce(sum(e_cnt) OVER (ORDER BY k DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS n_edges_gt
  FROM m
)
SELECT k::BIGINT AS k, n_hosts_gt, n_edges_gt,
  (2 * n_edges_gt * 1000000 // greatest(n_hosts_gt * (n_hosts_gt - 1), 1))::BIGINT
    AS rich_club_ppm
FROM s
"""


# --- adjacency gap-encoding cost (WebGraph / Boldi & Vigna 2004) ---------------
#
# The compression-planning metric behind the WebGraph framework: assign
# hosts dense LEXICOGRAPHIC ids (the ordering that makes web adjacency
# lists local), delta-encode each host's sorted successor list, and charge
# each gap its Elias-gamma cost 2*floor(log2 g)+1 bits.  The ratio vs a
# flat fixed-width encoding says how much locality the graph actually has
# — the planning number for frontier/seen-set storage at 10^10-URL scale.
# Exact integers end-to-end: gamma cost via the binary-string-length
# bit-length idiom (textstats.length_histogram), zigzag for the first gap.


def host_gap_encoding(df: DataFrame) -> DataFrame:
    """(host, out_deg, gap_bits, flat_bits, ratio_ppm) per linking host:
    gap_bits = Elias-gamma cost of the zigzag(first dst id - src id) gap
    plus gamma(successive deltas) over the sorted successor ids; flat_bits
    = out_deg * bitlen(n_hosts - 1) (the fixed-width baseline); ratio_ppm
    = gap_bits * 1e6 DIV flat_bits (< 1e6 means gap coding wins).

    Scale shape: dense lexicographic host ids come from the two-job
    range-partition sequence (ordering.with_global_seq — no 1-partition
    window); the successor sort is per-src inside one partial-agg'd
    groupBy (collect_set bounded by out-degree); gamma costs are JVM
    higher-order array folds, no Python.  The only scalars on the driver
    are the host count (id width) and with_global_seq's per-partition
    offsets."""
    from web_crawler_spark.operators.ordering import with_global_seq

    e0 = host_graph(df).select("src_host", "dst_host").distinct()
    hosts = (
        e0.select(F.col("src_host").alias("host"))
        .unionByName(e0.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    ids = with_global_seq(hosts, ["host"], out_col="hid")
    n_hosts = ids.count()
    width = max((n_hosts - 1).bit_length(), 1)
    edges = (
        e0.join(ids.withColumnRenamed("host", "src_host").withColumnRenamed("hid", "sid"), on="src_host")
        .join(ids.withColumnRenamed("host", "dst_host").withColumnRenamed("hid", "did"), on="dst_host")
        .select(F.col("src_host").alias("host"), "sid", "did")
    )
    adj = edges.groupBy("host", "sid").agg(
        F.sort_array(F.collect_set("did")).alias("adj")
    )
    gamma = "(2 * length(conv(cast({x} as string), 10, 2)) - 1)"
    first_z = (
        "CASE WHEN adj[0] >= sid THEN 2 * (adj[0] - sid) + 1"
        " ELSE 2 * (sid - adj[0]) END"
    )
    gap_bits = (
        f"{gamma.format(x=first_z)} + "
        "CASE WHEN size(adj) > 1 THEN aggregate(sequence(1, size(adj) - 1), 0L, "
        f"(acc, i) -> acc + {gamma.format(x='adj[i] - adj[i - 1]')}) ELSE 0L END"
    )
    return adj.select(
        "host",
        F.size("adj").cast("long").alias("out_deg"),
        F.expr(gap_bits).cast("long").alias("gap_bits"),
        (F.size("adj").cast("long") * F.lit(width)).alias("flat_bits"),
    ).withColumn(
        "ratio_ppm",
        F.expr("gap_bits * 1000000 DIV flat_bits").cast("long"),
    )


def duck_gap_encoding_sql(pages_meta: str) -> str:
    """DuckDB twin: row_number lexicographic ids, lag-window deltas, the
    same zigzag + gamma integer costs."""
    return rf"""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT src_host, dst_host FROM ({duck_host_graph_sql(pages_meta)})
),
hosts AS MATERIALIZED (
  SELECT host, row_number() OVER (ORDER BY host) - 1 AS hid
  FROM (SELECT DISTINCT host FROM (
    SELECT src_host AS host FROM e0 UNION ALL SELECT dst_host FROM e0))
),
w AS (
  SELECT CASE WHEN count(*) <= 1 THEN 1
              ELSE length(bin(count(*) - 1)) END AS width
  FROM hosts
),
ed AS (
  SELECT e.src_host AS host, s.hid AS sid, d.hid AS did
  FROM e0 e JOIN hosts s ON s.host = e.src_host
            JOIN hosts d ON d.host = e.dst_host
),
adj AS (
  SELECT host, sid, did,
         row_number() OVER (PARTITION BY sid ORDER BY did) AS rn,
         lag(did) OVER (PARTITION BY sid ORDER BY did) AS prev
  FROM ed
)
SELECT host, count(*)::BIGINT AS out_deg,
  sum(CASE WHEN rn = 1 THEN
        2 * length(bin(CASE WHEN did >= sid THEN 2 * (did - sid) + 1
                            ELSE 2 * (sid - did) END)) - 1
      ELSE 2 * length(bin(did - prev)) - 1 END)::BIGINT AS gap_bits,
  (count(*) * (SELECT width FROM w))::BIGINT AS flat_bits,
  (sum(CASE WHEN rn = 1 THEN
        2 * length(bin(CASE WHEN did >= sid THEN 2 * (did - sid) + 1
                            ELSE 2 * (sid - did) END)) - 1
      ELSE 2 * length(bin(did - prev)) - 1 END)
     * 1000000 // (count(*) * (SELECT width FROM w)))::BIGINT AS ratio_ppm
FROM adj GROUP BY host, sid
"""


# --- degree-correlation profile knn(k) (Pastor-Satorras et al. 2001) -----------
#
# Average neighbor degree as a function of host degree, the assortativity
# profile: a falling knn(k) (disassortative) is the normal web shape — hubs
# link to the periphery; a rising tail means hub-interlock (together with
# the rich-club curve this pins WHERE in the degree spectrum it happens).
# Exact integer milli-units: knn(k) = sum of neighbor degrees over all
# degree-k hosts, floor-divided by (k * #hosts of degree k).


def host_degree_correlation(df: DataFrame) -> DataFrame:
    """(k, n_hosts, knn_milli) over the undirected distinct host graph.

    Scale shape: degree rollup (host grain), one edge-to-degree join per
    direction folded into a single symmetric edge frame, one (host)
    partial agg for neighbor-degree sums, one (k) partial agg for the
    curve — every exchange is host- or degree-value-grain; no windows, no
    driver loops."""
    e0 = (
        host_graph(df)
        .select(F.col("src_host").alias("u"), F.col("dst_host").alias("v"))
        .where(F.col("u") != F.col("v"))
    )
    und = e0.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    ).distinct()
    sym = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    deg = sym.groupBy(F.col("u").alias("host")).agg(
        F.count("*").cast("long").alias("deg")
    )
    nb = (
        sym.join(deg.withColumnRenamed("host", "v").withColumnRenamed("deg", "nb_deg"), on="v")
        .groupBy(F.col("u").alias("host"))
        .agg(F.sum("nb_deg").cast("long").alias("nb_sum"))
    )
    return (
        deg.join(nb, on="host")
        .groupBy(F.col("deg").alias("k"))
        .agg(
            F.count("*").cast("long").alias("n_hosts"),
            F.sum("nb_sum").alias("nb_tot"),
        )
        .select(
            "k",
            "n_hosts",
            F.expr("nb_tot * 1000 DIV (k * n_hosts)").cast("long").alias("knn_milli"),
        )
    )


def duck_degree_correlation_sql(pages_meta: str) -> str:
    return rf"""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT least(src_host, dst_host) AS u, greatest(src_host, dst_host) AS v
  FROM ({duck_host_graph_sql(pages_meta)}) WHERE src_host <> dst_host
),
sym AS MATERIALIZED (
  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
),
deg AS MATERIALIZED (
  SELECT u AS host, count(*)::BIGINT AS deg FROM sym GROUP BY 1
),
nb AS (
  SELECT s.u AS host, sum(d.deg)::BIGINT AS nb_sum
  FROM sym s JOIN deg d ON d.host = s.v GROUP BY 1
)
SELECT g.deg::BIGINT AS k, count(*)::BIGINT AS n_hosts,
       (sum(n.nb_sum) * 1000 // (g.deg * count(*)))::BIGINT AS knn_milli
FROM deg g JOIN nb n ON n.host = g.host
GROUP BY g.deg
"""


# --- sampled-pivot harmonic centrality (Eppstein & Wang 2004) ------------------
#
# Closeness-family centrality at web scale: exact all-pairs BFS is
# O(V*E) and dead on arrival, so the standard estimator runs BFS from a
# small deterministic pivot sample and scores every host by sum over
# pivots of 1/dist — harmonic form, so unreachable pairs contribute 0
# instead of poisoning the mean (Boldi & Vigna's axioms pick harmonic
# over classic closeness for exactly this reason).  Crawl prioritization
# reads it as "how central is this host to the known web".

CENTRALITY_PIVOTS = 4


def _pivot_distances(
    df: DataFrame, n_pivots: int, max_iter: int = 30
) -> tuple[DataFrame, DataFrame]:
    """(nodes, dist) — dist = (pivot, host, depth) exact min hop counts
    over the undirected host graph from the md5-smallest ``n_pivots``
    hosts (deterministic sample, no RNG).  ONE labeled multi-source BFS:
    each round is one join + partial-agg min keyed by (pivot, host),
    volume <= n_pivots x the single-source cost; edge relation
    materialized once, per-round localCheckpoint, changed-count fixpoint;
    rounds = reachable diameter (~O(10) small-world).  Shared by
    host_harmonic_centrality and host_hop_plot."""
    e0 = (
        host_graph(df)
        .select(F.col("src_host").alias("u"), F.col("dst_host").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    edges = (
        e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = edges.select(F.col("u").alias("host")).distinct().localCheckpoint(
        eager=True
    )
    pivots = (
        nodes.orderBy(F.md5(F.col("host")), F.col("host"))
        .limit(n_pivots)
        .select(F.col("host").alias("pivot"))
    )
    dist = pivots.select(
        "pivot", F.col("pivot").alias("host"), F.lit(0).cast("long").alias("depth")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        hop = (
            edges.join(dist.withColumnRenamed("host", "u"), on="u")
            .select("pivot", F.col("v").alias("host"), (F.col("depth") + 1).alias("depth"))
        )
        new = (
            dist.unionByName(hop)
            .groupBy("pivot", "host")
            .agg(F.min("depth").alias("depth"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(dist.alias("o"), on=["pivot", "host"], how="left")
            .filter(F.col("o.depth").isNull() | (F.col("n.depth") != F.col("o.depth")))
            .count()
        )
        dist = new
        if changed == 0:
            break
    return nodes, dist


def host_harmonic_centrality(
    df: DataFrame, n_pivots: int = CENTRALITY_PIVOTS, max_iter: int = 30
) -> DataFrame:
    """(host, n_pivots_reached, harmonic_milli) — harmonic_milli = sum
    over reached pivots of 1000 DIV dist (dist > 0; the pivot itself
    contributes 0).  Pivot sampling / BFS economics: _pivot_distances."""
    nodes, dist = _pivot_distances(df, n_pivots, max_iter)
    scores = (
        dist.filter(F.col("depth") > 0)
        .groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_pivots_reached"),
            F.sum(F.expr("1000 DIV depth")).cast("long").alias("harmonic_milli"),
        )
    )
    return nodes.join(scores, on="host", how="left").select(
        "host",
        F.coalesce("n_pivots_reached", F.lit(0)).cast("long").alias(
            "n_pivots_reached"
        ),
        F.coalesce("harmonic_milli", F.lit(0)).cast("long").alias("harmonic_milli"),
    )


def duck_harmonic_centrality_sql(
    pages_meta: str, n_pivots: int = CENTRALITY_PIVOTS
) -> str:
    """Recursive-CTE oracle: multi-source min-depth closure from the same
    md5-ordered pivots, same integer harmonic sum."""
    return rf"""
WITH RECURSIVE e0 AS MATERIALIZED (
  SELECT DISTINCT least(src_host, dst_host) AS a, greatest(src_host, dst_host) AS b
  FROM ({duck_host_graph_sql(pages_meta)}) WHERE src_host <> dst_host
),
edges AS MATERIALIZED (
  SELECT a AS u, b AS v FROM e0 UNION SELECT b, a FROM e0
),
nodes AS MATERIALIZED (SELECT DISTINCT u AS host FROM edges),
pv AS MATERIALIZED (
  SELECT host AS pvt FROM nodes ORDER BY md5(host), host LIMIT {n_pivots}
),
walk(pvt, host, depth) AS (
  SELECT pvt, pvt, 0::BIGINT FROM pv
  UNION
  SELECT w.pvt, e.v, w.depth + 1
  FROM edges e JOIN walk w ON w.host = e.u
  WHERE w.depth < 50
),
md AS (
  SELECT pvt, host, min(depth)::BIGINT AS depth FROM walk GROUP BY 1, 2
),
sc AS (
  SELECT host, count(*)::BIGINT AS n_pivots_reached,
         sum(1000 // depth)::BIGINT AS harmonic_milli
  FROM md WHERE depth > 0 GROUP BY 1
)
SELECT n.host,
  coalesce(sc.n_pivots_reached, 0)::BIGINT AS n_pivots_reached,
  coalesce(sc.harmonic_milli, 0)::BIGINT AS harmonic_milli
FROM nodes n LEFT JOIN sc ON sc.host = n.host
"""


def host_hop_plot(
    df: DataFrame, n_pivots: int = CENTRALITY_PIVOTS, max_iter: int = 30
) -> DataFrame:
    """Hop plot / distance distribution (the Broder et al. small-world
    evidence; effective diameter = the depth where cum_ppm crosses
    900000): (depth, n_pairs, cum_ppm) over exact (pivot, host) min
    distances from the md5-sampled pivots, depth > 0.  cum_ppm is the
    integer-DIV cumulative share of reachable pairs — the curve's knee IS
    the effective diameter, read off directly.

    Scale shape: the heavy work is the shared labeled multi-source BFS
    (_pivot_distances); the rollup and cumulative window live on the
    <= max-depth-row frame (bounded-single-partition convention)."""
    from pyspark.sql import Window

    _, dist = _pivot_distances(df, n_pivots, max_iter)
    byd = (
        dist.filter(F.col("depth") > 0)
        .groupBy("depth")
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )
    w_cum = Window.orderBy("depth").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("depth").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        byd.withColumn("cum", F.sum("n_pairs").over(w_cum))
        .withColumn("tot", F.sum("n_pairs").over(w_all))
        .select(
            F.col("depth").cast("long").alias("depth"),
            "n_pairs",
            F.expr("cum * 1000000 DIV tot").cast("long").alias("cum_ppm"),
        )
    )


def duck_hop_plot_sql(pages_meta: str, n_pivots: int = CENTRALITY_PIVOTS) -> str:
    """Recursive-CTE oracle over the same pivot closure."""
    return rf"""
WITH RECURSIVE e0 AS MATERIALIZED (
  SELECT DISTINCT least(src_host, dst_host) AS a, greatest(src_host, dst_host) AS b
  FROM ({duck_host_graph_sql(pages_meta)}) WHERE src_host <> dst_host
),
edges AS MATERIALIZED (
  SELECT a AS u, b AS v FROM e0 UNION SELECT b, a FROM e0
),
nodes AS MATERIALIZED (SELECT DISTINCT u AS host FROM edges),
pv AS MATERIALIZED (
  SELECT host AS pvt FROM nodes ORDER BY md5(host), host LIMIT {n_pivots}
),
walk(pvt, host, depth) AS (
  SELECT pvt, pvt, 0::BIGINT FROM pv
  UNION
  SELECT w.pvt, e.v, w.depth + 1
  FROM edges e JOIN walk w ON w.host = e.u
  WHERE w.depth < 50
),
md AS (
  SELECT pvt, host, min(depth)::BIGINT AS depth FROM walk GROUP BY 1, 2
),
byd AS (
  SELECT depth, count(*)::BIGINT AS n_pairs FROM md WHERE depth > 0 GROUP BY 1
)
SELECT depth, n_pairs,
  (sum(n_pairs) OVER (ORDER BY depth
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
   * 1000000 // (SELECT sum(n_pairs) FROM byd))::BIGINT AS cum_ppm
FROM byd
"""


# --- link prediction (Adamic-Adar / resource-allocation) ---------------------
#
# Score non-adjacent host pairs by their common-neighbor structure over the
# undirected host graph — the classic "friend-of-friend" link-prediction
# indices (Adamic & Adar 2003; Zhou/Lu/Zhang 2009 resource allocation).
# Crawl use: predicted links are discovery candidates (hosts likely to link
# soon, or links the crawl has not fetched yet) and related-domain
# suggestions that complement co-citation.
#
# Determinism contract: Adamic-Adar's 1/ln(deg) is float and its sum is
# reduction-order dependent, so the engine scores with EXACT integers —
# aa weight = 10^6 DIV floor(log2(deg z)) (floor-log2 via binary-string
# length, bit-exact in both engines; a constant-factor rescale of 1/log
# that preserves ranking) and ra weight = 10^6 DIV deg z.  Integer sums
# are associative/commutative, so results are bit-identical across
# partition counts and engines.  Every common neighbor has deg >= 2, so
# floor(log2) >= 1 and neither division can hit zero.
#
# Scale shape: wedges are enumerated center-out — each common neighbor z
# emits C(deg z, 2) pair rows, so centers above ``deg_cap`` are pruned
# (mega-hubs contribute ~no discriminative signal, exactly the co-citation
# super-node defense) and the pre-agg wedge relation is bounded by
# cap²/2 per center.  The already-adjacent filter is an anti-join against
# the (far smaller, distinct) edge relation — broadcastable at any realistic
# host-graph size; everything else is one partial-agg'd exchange.

# Cap chosen ABOVE the fixture-family degree ceiling (sf0.1's densest host
# reaches deg 207; 128 pruned every center there — the scale-dependent
# vacuity trap) while still bounding the wedge fan-out at production.
LINKPRED_DEG_CAP = 256
LINKPRED_MIN_COMMON = 2


def host_link_prediction(
    df: DataFrame,
    deg_cap: int = LINKPRED_DEG_CAP,
    min_common: int = LINKPRED_MIN_COMMON,
) -> DataFrame:
    """(host_a, host_b, n_common, aa_score_ppm, ra_score_ppm): NON-adjacent
    host pairs with >= ``min_common`` common neighbors, scored by exact
    integer Adamic-Adar (log2 variant) and resource-allocation indices.

    Plan: undirected distinct edges -> degree agg -> center-out wedge
    self-join (centers capped at ``deg_cap``) -> partial-agg'd pair
    aggregation -> anti-join dropping already-linked pairs."""
    e = host_graph(df).select("src_host", "dst_host")
    und = (
        e.where(F.col("src_host") != F.col("dst_host"))
        .select(
            F.least("src_host", "dst_host").alias("a"),
            F.greatest("src_host", "dst_host").alias("b"),
        )
        .distinct()
        # materialize: und feeds nbr (twice, via the union), deg, and the
        # final anti-join — without this the whole host_graph explode+agg
        # pipeline re-executes per branch (the winnow branch-recompute
        # lesson; measured 9 parquet scans -> 1 build)
        .localCheckpoint(eager=True)
    )
    nbr = und.select(F.col("a").alias("z"), F.col("b").alias("n")).unionAll(
        und.select(F.col("b").alias("z"), F.col("a").alias("n"))
    )
    deg = nbr.groupBy("z").agg(F.count("*").alias("deg"))
    centers = nbr.join(
        deg.where((F.col("deg") >= 2) & (F.col("deg") <= deg_cap)), "z"
    ).localCheckpoint(eager=True)  # self-joined below: run the build once
    pairs = (
        centers.alias("l")
        .join(
            centers.alias("r"),
            on=[
                F.col("l.z") == F.col("r.z"),
                F.col("l.n") < F.col("r.n"),
            ],
        )
        .select(
            F.col("l.n").alias("host_a"),
            F.col("r.n").alias("host_b"),
            # floor(log2(deg)) == length(bin(deg)) - 1, exact in both engines
            F.expr("1000000L DIV (length(bin(l.deg)) - 1)").alias("aa_w"),
            F.expr("1000000L DIV l.deg").alias("ra_w"),
        )
        .groupBy("host_a", "host_b")
        .agg(
            F.count("*").cast("long").alias("n_common"),
            F.sum("aa_w").cast("long").alias("aa_score_ppm"),
            F.sum("ra_w").cast("long").alias("ra_score_ppm"),
        )
        .where(F.col("n_common") >= min_common)
    )
    return pairs.join(
        und.select(F.col("a").alias("host_a"), F.col("b").alias("host_b")),
        ["host_a", "host_b"],
        "left_anti",
    )


def duck_link_prediction_sql(
    pages_meta: str,
    deg_cap: int = LINKPRED_DEG_CAP,
    min_common: int = LINKPRED_MIN_COMMON,
) -> str:
    """DuckDB twin of :func:`host_link_prediction`."""
    return rf"""
WITH g AS ({duck_host_graph_sql(pages_meta)}),
und AS (
  SELECT DISTINCT least(src_host, dst_host) AS a,
                  greatest(src_host, dst_host) AS b
  FROM g WHERE src_host <> dst_host
),
nbr AS (SELECT a AS z, b AS n FROM und UNION ALL SELECT b, a FROM und),
deg AS (SELECT z, count(*)::BIGINT AS deg FROM nbr GROUP BY 1),
ctr AS (
  SELECT nbr.z, nbr.n, deg.deg FROM nbr JOIN deg USING (z)
  WHERE deg.deg BETWEEN 2 AND {deg_cap}
),
pairs AS (
  SELECT l.n AS host_a, r.n AS host_b,
         count(*)::BIGINT AS n_common,
         sum(1000000 // (length(bin(l.deg)) - 1))::BIGINT AS aa_score_ppm,
         sum(1000000 // l.deg)::BIGINT AS ra_score_ppm
  FROM ctr l JOIN ctr r ON l.z = r.z AND l.n < r.n
  GROUP BY 1, 2
  HAVING count(*) >= {min_common}
)
SELECT p.* FROM pairs p
ANTI JOIN und ON und.a = p.host_a AND und.b = p.host_b
"""


# --- ANF / HyperBall neighbourhood function ----------------------------------
#
# The approximate neighbourhood function N(d) = #{(u,v): dist(u,v) <= d} is
# THE web-graph summary statistic (Palmer/Gibbons/Faloutsos ANF, KDD'02;
# Boldi/Rosa/Vigna HyperBall, the tool behind the Facebook "four degrees"
# and every WebGraph effective-diameter number).  Unlike the sampled-pivot
# hop plot (exact distances from few sources), ANF covers EVERY node with a
# tiny fixed-size register and d rounds of register unions — the only known
# way to get a distance distribution on a 10^10-edge graph.
#
# Determinism contract: HyperBall's HLL registers estimate via floats; we
# keep the ancestral Flajolet-Martin BITMASK form — each node seeds
# ``trials`` 25-bit FM masks from md5 (bit i set with prob 2^-(i+1)), and a
# depth-d mask is the bitwise OR of depth-(d-1) masks over out-edges.  OR
# is idempotent/commutative/associative, so the fixpoint is bit-identical
# across partition counts, reduction orders and engines — the same reason
# the engine's Bloom sidecar merges with OR.  The graded statistic is the
# exact integer pair (sum_lsb, sum_pow2) over all registers: lsb = index of
# the lowest UNSET bit (the FM observable; E[lsb] ~ log2(phi*n)) and
# 2^lsb whose per-depth sum is a constant-factor (1/phi = 1/0.77351)
# rescale of the ANF curve.  The float correction is a client-side
# constant, never computed in-plan.
#
# Scale shape: state is one BIGINT per (node, trial) — trials * 8 bytes per
# node, the HyperBall economy.  Each round is one shuffle join of the edge
# relation against the mask frame plus one partial-agg'd bit_or groupBy
# (map-side combine collapses duplicate (host, t) rows before the
# exchange), with per-round localCheckpoint lineage truncation — exactly
# the crawl-loop / PageRank discipline.  Rounds = max tracked depth (4
# covers the web's effective diameter at host grain per the hop plot).

ANF_TRIALS = 4
ANF_DEPTH = 4
ANF_MAX_BIT = 24


def host_anf(
    df: DataFrame,
    trials: int = ANF_TRIALS,
    depth: int = ANF_DEPTH,
    checkpoint: bool = True,
) -> DataFrame:
    """(depth, n_regs, sum_lsb, sum_pow2) — exact-FM ANF over the directed
    host graph (out-link reachability), depths 0..``depth``.

    n_regs = hosts * trials (constant across depths — a free self-check);
    sum_lsb / sum_pow2 are the exact integer register observables described
    in the module-level ANF note.  N(d) ~ sum_pow2 / (trials * 0.77351).

    ``checkpoint=False`` keeps the full lineage (plan-shape tests); the
    default truncates per round, the crawl-loop discipline."""
    ckpt = (
        (lambda d: d.localCheckpoint(eager=True)) if checkpoint else (lambda d: d)
    )
    edges = (
        host_graph(df)
        .select("src_host", "dst_host")
        .filter(F.col("src_host") != F.col("dst_host"))
        .distinct()
    )
    edges = ckpt(edges)
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    masks = (
        nodes.select(
            "host",
            F.explode(F.sequence(F.lit(0), F.lit(trials - 1))).alias("t"),
        )
        .select(
            "host",
            "t",
            F.expr(
                "cast(conv(substr(md5(concat(host, ':', cast(t as string))),"
                " 1, 8), 16, 10) as bigint)"
            ).alias("h"),
        )
        .select(
            "host",
            "t",
            F.expr(
                "cast(shiftleft(1L,"
                f" least(bit_count((h & -h) - 1), {ANF_MAX_BIT})) as bigint)"
            ).alias("mask"),
        )
        .localCheckpoint(eager=True)
    )

    def _stats(m: DataFrame, d: int) -> DataFrame:
        lsb = "bit_count(mask ^ (mask + 1)) - 1"
        return (
            m.select(F.expr(f"cast({lsb} as bigint)").alias("lsb"))
            .agg(
                F.count("*").cast("long").alias("n_regs"),
                F.sum("lsb").cast("long").alias("sum_lsb"),
                F.sum(F.expr("cast(shiftleft(1L, cast(lsb as int)) as bigint)"))
                .cast("long")
                .alias("sum_pow2"),
            )
            .select(F.lit(d).cast("long").alias("depth"), "*")
        )

    out = _stats(masks, 0)
    for d in range(1, depth + 1):
        contrib = edges.join(
            masks.withColumnRenamed("host", "dst_host"), on="dst_host"
        ).select(F.col("src_host").alias("host"), "t", "mask")
        masks = ckpt(
            masks.unionByName(contrib)
            .groupBy("host", "t")
            .agg(F.expr("bit_or(mask)").alias("mask"))
        )
        out = out.unionByName(_stats(masks, d))
    return out


def duck_anf_sql(
    pages_meta: str, trials: int = ANF_TRIALS, depth: int = ANF_DEPTH
) -> str:
    """DuckDB twin: the same FM-mask union unrolled as a CTE chain
    (m0 -> m1 -> ... -> m{depth}); bit-exact because every step is BIGINT
    shift / bitwise OR / integer sum in both engines."""
    parts = [
        f"""e0 AS MATERIALIZED (
  SELECT DISTINCT src_host, dst_host FROM ({duck_host_graph_sql(pages_meta)})
  WHERE src_host <> dst_host
)""",
        """nodes AS MATERIALIZED (
  SELECT DISTINCT host FROM (
    SELECT src_host AS host FROM e0 UNION ALL SELECT dst_host FROM e0)
)""",
        f"""m0 AS MATERIALIZED (
  SELECT host, t,
         (1::BIGINT << least(bit_count((h & -h) - 1), {ANF_MAX_BIT})) AS mask
  FROM (
    SELECT host, t,
           ('0x' || substr(md5(host || ':' || t::VARCHAR), 1, 8))::BIGINT AS h
    FROM nodes, (SELECT unnest(range({trials})) AS t)
  )
)""",
    ]
    for k in range(1, depth + 1):
        p = k - 1
        parts.append(
            f"""m{k} AS MATERIALIZED (
  SELECT host, t, bit_or(mask) AS mask FROM (
    SELECT host, t, mask FROM m{p}
    UNION ALL
    SELECT e.src_host AS host, m.t, m.mask
    FROM e0 e JOIN m{p} m ON m.host = e.dst_host
  ) GROUP BY 1, 2
)"""
        )
    selects = []
    for k in range(depth + 1):
        selects.append(
            f"""SELECT {k}::BIGINT AS depth, count(*)::BIGINT AS n_regs,
       sum(lsb)::BIGINT AS sum_lsb, sum(1::BIGINT << lsb::INT)::BIGINT AS sum_pow2
FROM (SELECT bit_count(xor(mask, mask + 1)) - 1 AS lsb FROM m{k})"""
        )
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


# --- spam mass (Gyongyi/Berkhin/Garcia-Molina/Pedersen, VLDB wksp 2006) ------
#
# Relative spam mass: the share of a host's PageRank that does NOT arrive
# through trusted paths — rel_mass = (PR - TrustRank') / PR.  The composed
# anti-spam triage: reciprocity picks organic seeds, TrustRank flows trust,
# and spam mass converts the two rank vectors into one rankable spam
# score.  Both vectors come from the engine's integer-exact iteration
# framework, so the mass is an exact ppm integer — no float subtraction of
# near-equal doubles.


def host_spam_mass(df: DataFrame, seeds: DataFrame) -> DataFrame:
    """(host, rank_ppb, trust_ppb, spam_mass_ppm) — spam_mass_ppm =
    clamp((rank - trust) * 1e6 DIV rank, 0, 1e6); hosts the seeds cannot
    reach score ~1e6, seeds themselves ~0.

    Scale shape: two independent rank pipelines over the SAME materialized
    edge relation shape (each is per-iteration join + partial agg, lineage
    truncated), then one host-keyed join of two host-grain vectors —
    negligible next to the iterations."""
    pr = host_pagerank(df)
    tr = host_trustrank(df, seeds)
    return (
        pr.join(tr, on="host", how="left")
        .select(
            "host",
            "rank_ppb",
            F.coalesce(F.col("trust_ppb"), F.lit(0)).cast("long").alias("trust_ppb"),
        )
        .withColumn(
            "spam_mass_ppm",
            F.expr(
                "greatest(0L, least(1000000L,"
                " (rank_ppb - trust_ppb) * 1000000 DIV greatest(rank_ppb, 1L)))"
            ).cast("long"),
        )
    )


def duck_spam_mass_sql(pages_meta: str, seeds_sql: str) -> str:
    """DuckDB twin: the two unrolled rank CTE chains joined at host grain."""
    return f"""
SELECT p.host, p.rank_ppb,
       coalesce(t.trust_ppb, 0)::BIGINT AS trust_ppb,
       greatest(0, least(1000000,
         (p.rank_ppb - coalesce(t.trust_ppb, 0)) * 1000000
           // greatest(p.rank_ppb, 1)))::BIGINT AS spam_mass_ppm
FROM ({duck_pagerank_sql(pages_meta)}) p
LEFT JOIN ({duck_trustrank_sql(pages_meta, seeds_sql)}) t USING (host)
"""


# --- random-walk corpus (DeepWalk input generation) ---------------------------
#
# Graph embeddings (DeepWalk KDD'14, node2vec KDD'16) train skip-gram over
# a corpus of random walks; at web scale, GENERATING that corpus is itself
# a distributed job — W walks of length L from every node, each step a
# uniform pick among out-neighbors.  Crawl uses: related-host suggestion,
# host2vec features for quality/spam classifiers, graph-aware corpus
# mixing.
#
# Determinism contract: the step-t pick for walk (start, w) is
# md5(start:w:t) % outdeg(u) into the dst-sorted distinct neighbor list —
# no RNG state, so the corpus is bit-identical across engines, partition
# counts and reruns (the property that makes the downstream training data
# reproducible).  Uniform DeepWalk walks; node2vec's p/q bias needs
# prev-node context and is documented out of scope.
#
# Scale shape: the ranked adjacency (src, dst, rank, deg) materializes
# once and is reused by every step; each step is ONE equi-join of the
# walk frontier (|nodes| x W rows — tiny next to edges) against it on
# (src, rank).  Dead ends stop silently (shorter walk emitted), matching
# DeepWalk's truncation.

WALKS_PER_NODE = 2
WALK_LENGTH = 4


def host_random_walks(
    df: DataFrame, walks: int = WALKS_PER_NODE, length: int = WALK_LENGTH
) -> DataFrame:
    """(start_host, walk_idx, step, host) — the walk corpus; step 0 is the
    start node, step t>0 the t-th hop."""
    from pyspark.sql import Window

    edges = (
        host_graph(df)
        .select("src_host", "dst_host")
        .filter(F.col("src_host") != F.col("dst_host"))
        .distinct()
    )
    w = Window.partitionBy("src_host").orderBy("dst_host")
    adj = (
        edges.withColumn("rank", F.row_number().over(w) - 1)
        .withColumn("deg", F.count("*").over(Window.partitionBy("src_host")))
        .localCheckpoint(eager=True)
    )
    nodes = (
        adj.select(F.col("src_host").alias("host"))
        .unionByName(adj.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    frontier = nodes.select(
        F.col("host").alias("start_host"),
        F.explode(F.sequence(F.lit(0), F.lit(walks - 1))).alias("walk_idx"),
        F.col("host").alias("cur"),
    )
    out = frontier.select(
        "start_host", "walk_idx", F.lit(0).cast("long").alias("step"),
        F.col("cur").alias("host"),
    )
    for t in range(1, length + 1):
        pick = F.expr(
            "pmod(cast(conv(substr(md5(concat(start_host, ':',"
            f" cast(walk_idx as string), ':', '{t}')), 1, 8), 16, 10)"
            " as bigint), cast(deg as bigint))"
        )
        frontier = (
            frontier.join(adj, on=F.col("cur") == F.col("src_host"))
            .filter(F.col("rank") == pick)
            .select("start_host", "walk_idx", F.col("dst_host").alias("cur"))
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(
            frontier.select(
                "start_host", "walk_idx",
                F.lit(t).cast("long").alias("step"),
                F.col("cur").alias("host"),
            )
        )
    return out


def duck_random_walks_sql(
    pages_meta: str, walks: int = WALKS_PER_NODE, length: int = WALK_LENGTH
) -> str:
    """DuckDB twin: same md5 pick over the same dst-sorted ranked
    adjacency, unrolled as a CTE chain."""
    parts = [
        f"""e0 AS MATERIALIZED (
  SELECT DISTINCT src_host, dst_host FROM ({duck_host_graph_sql(pages_meta)})
  WHERE src_host <> dst_host
)""",
        """adj AS MATERIALIZED (
  SELECT src_host, dst_host,
         row_number() OVER (PARTITION BY src_host ORDER BY dst_host) - 1
           AS rank,
         count(*) OVER (PARTITION BY src_host) AS deg
  FROM e0
)""",
        """nodes AS MATERIALIZED (
  SELECT DISTINCT host FROM (
    SELECT src_host AS host FROM e0 UNION ALL SELECT dst_host FROM e0)
)""",
        f"""f0 AS (
  SELECT host AS start_host, t.walk_idx, host AS cur
  FROM nodes, (SELECT unnest(range({walks})) AS walk_idx) t
)""",
    ]
    for t in range(1, length + 1):
        parts.append(
            f"""f{t} AS MATERIALIZED (
  SELECT f.start_host, f.walk_idx, a.dst_host AS cur
  FROM f{t - 1} f JOIN adj a ON a.src_host = f.cur
  WHERE a.rank = ('0x' || substr(md5(f.start_host || ':' ||
    f.walk_idx::VARCHAR || ':' || '{t}'), 1, 8))::BIGINT % a.deg
)"""
        )
    selects = [
        "SELECT start_host, walk_idx::BIGINT AS walk_idx, 0::BIGINT AS step,"
        " cur AS host FROM f0"
    ] + [
        f"SELECT start_host, walk_idx::BIGINT, {t}::BIGINT, cur FROM f{t}"
        for t in range(1, length + 1)
    ]
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


WALK_WINDOW = 2


def walk_cooccurrence(
    df: DataFrame,
    walks: int = WALKS_PER_NODE,
    length: int = WALK_LENGTH,
    window: int = WALK_WINDOW,
) -> DataFrame:
    """(host, ctx_host, n_cooc) — skip-gram co-occurrence counts within
    ``window`` steps over the walk corpus: the PPMI / word2vec input
    matrix for host embeddings.

    Scale shape: the walk corpus materializes once (localCheckpoint — the
    branch-recompute lesson: both sides of the self-join read the SAME
    computed corpus); the self-join is equi-keyed on (start_host,
    walk_idx) with fan-out bounded by walk length², then one partial-agg'd
    rollup on the pair key.  Corpus rows ~ nodes x W x L — orders of
    magnitude below edges."""
    corpus = host_random_walks(df, walks=walks, length=length).localCheckpoint(
        eager=True
    )
    left = corpus.select(
        "start_host", "walk_idx", F.col("step").alias("s_l"),
        F.col("host").alias("host_l"),
    )
    right = corpus.select(
        "start_host", "walk_idx", F.col("step").alias("s_r"),
        F.col("host").alias("host_r"),
    )
    pairs = left.join(right, on=["start_host", "walk_idx"]).filter(
        (F.col("s_l") != F.col("s_r"))
        & (F.abs(F.col("s_l") - F.col("s_r")) <= window)
    )
    return pairs.groupBy(
        F.col("host_l").alias("host"), F.col("host_r").alias("ctx_host")
    ).agg(F.count("*").cast("long").alias("n_cooc"))


def duck_walk_cooccurrence_sql(
    pages_meta: str,
    walks: int = WALKS_PER_NODE,
    length: int = WALK_LENGTH,
    window: int = WALK_WINDOW,
) -> str:
    return f"""
WITH corpus AS MATERIALIZED (
  {duck_random_walks_sql(pages_meta, walks, length)}
)
SELECT l.host AS host, r.host AS ctx_host, count(*)::BIGINT AS n_cooc
FROM corpus l JOIN corpus r
  ON l.start_host = r.start_host AND l.walk_idx = r.walk_idx
WHERE l.step <> r.step AND abs(l.step - r.step) <= {window}
GROUP BY 1, 2
"""


# --- host-graph churn between snapshots (web-graph evolution) -----------------
#
# The link graph is not static: hosts re-template, navigations move, spam
# farms appear and vanish.  Edge churn between consecutive snapshots is the
# graph-side analog of the corpus TV-drift monitor — it tells the rank
# pipeline how stale a cached PageRank is (high-churn neighborhoods need
# re-iteration first) and flags hosts whose outlink profile changed
# wholesale (re-templating, takeover, parked-domain flips).


def _host_edges_from_html(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_host, dst_host, n_links) straight from raw html — the same
    JVM regexp href pass as anchor_texts, rolled up to host grain."""
    h = F.col(html_col).cast("string")
    page_host = _host(F.col(url_col))
    hrefs = df.select(
        page_host.alias("src_host"),
        F.explode(
            F.regexp_extract_all(h, F.lit(ANCHOR_RE), F.lit(1))
        ).alias("href"),
    ).filter(F.col("href") != "")
    dst_url = F.when(
        F.col("href").rlike("^https?://"), F.col("href")
    ).otherwise(F.concat(F.lit("http://"), F.col("src_host"), F.col("href")))
    dst = F.lower(F.regexp_extract(dst_url, r"(?i)^https?://([^/:?#]+)", 1))
    return (
        hrefs.select("src_host", dst.alias("dst_host"))
        .filter(F.col("dst_host") != "")
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").cast("long").alias("n_links"))
    )


def host_graph_churn(
    prev: DataFrame, curr: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Per-source-host edge churn between two snapshots: (src_host,
    n_added, n_removed, n_stable, n_reweighted, churn_ppm).  An edge is a
    distinct (src_host, dst_host) pair; added/removed = present in exactly
    one snapshot, stable = both, reweighted = stable but with a different
    link count; churn_ppm = floor(1e6 * (added+removed) / union-size).

    Scale shape: each snapshot collapses to host-grain edges map-side
    (partial agg before its exchange — the relation that shuffles is
    distinct host pairs, not raw links); ONE full-outer hash join on the
    edge key; one src_host-grain rollup.  churn*1e6 < 2^63 to ~9e12 edges
    per source host.  No Python."""
    pe = _host_edges_from_html(prev, url_col, html_col).withColumnsRenamed(
        {"n_links": "n_prev"}
    )
    ce = _host_edges_from_html(curr, url_col, html_col).withColumnsRenamed(
        {"n_links": "n_curr"}
    )
    j = pe.join(ce, on=["src_host", "dst_host"], how="full_outer")
    added = F.col("n_prev").isNull()
    removed = F.col("n_curr").isNull()
    one = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("long")  # noqa: E731
    agg = j.groupBy("src_host").agg(
        one(added).alias("n_added"),
        one(removed).alias("n_removed"),
        one(~added & ~removed).alias("n_stable"),
        one(~added & ~removed & (F.col("n_prev") != F.col("n_curr"))).alias(
            "n_reweighted"
        ),
    )
    return agg.select(
        "src_host",
        "n_added",
        "n_removed",
        "n_stable",
        "n_reweighted",
        F.expr(
            "(n_added + n_removed) * 1000000L"
            " DIV (n_added + n_removed + n_stable)"
        )
        .cast("long")
        .alias("churn_ppm"),
    )


def duck_host_graph_churn_sql(prev: str, curr: str) -> str:
    """DuckDB twin of :func:`host_graph_churn`."""

    def edges(pages: str) -> str:
        return rf"""
  SELECT src_host, dst_host, count(*)::BIGINT AS n_links FROM (
    SELECT src_host,
           lower(regexp_extract(
             CASE WHEN href LIKE 'http://%' OR href LIKE 'https://%' THEN href
                  ELSE 'http://' || src_host || href END,
             '(?i)^https?://([^/:?#]+)', 1)) AS dst_host
    FROM (
      SELECT lower(split_part(split_part(split_part(url, '://', 2), '/', 1),
                   ':', 1)) AS src_host,
             unnest(regexp_extract_all(decode(html), '{ANCHOR_RE}', 1)) AS href
      FROM {pages}
    ) WHERE href <> ''
  ) WHERE dst_host <> '' GROUP BY 1, 2
"""

    return f"""
WITH pe AS ({edges(prev)}),
ce AS ({edges(curr)}),
j AS (
  SELECT coalesce(pe.src_host, ce.src_host) AS src_host,
         pe.n_links AS n_prev, ce.n_links AS n_curr
  FROM pe FULL OUTER JOIN ce
    ON pe.src_host = ce.src_host AND pe.dst_host = ce.dst_host
),
agg AS (
  SELECT src_host,
         sum(CASE WHEN n_prev IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_added,
         sum(CASE WHEN n_curr IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_removed,
         sum(CASE WHEN n_prev IS NOT NULL AND n_curr IS NOT NULL
             THEN 1 ELSE 0 END)::BIGINT AS n_stable,
         sum(CASE WHEN n_prev IS NOT NULL AND n_curr IS NOT NULL
                   AND n_prev <> n_curr THEN 1 ELSE 0 END)::BIGINT
           AS n_reweighted
  FROM j GROUP BY 1
)
SELECT src_host, n_added, n_removed, n_stable, n_reweighted,
       ((n_added + n_removed) * 1000000
        // (n_added + n_removed + n_stable))::BIGINT AS churn_ppm
FROM agg
"""
