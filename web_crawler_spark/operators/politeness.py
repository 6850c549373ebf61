"""Per-host politeness budget = the reference's ``limit_per_host``
(reference crawler.py:83,297) generalized to a per-round fetch budget, realized
as a window-ranked priority queue (SURVEY.md §2.6 O3) with explicit hot-host
skew breaking (SURVEY.md §4 item 1).

The naive ``row_number() over (partition by host order by priority)`` puts a
hot host (50% of a 10^10-row frontier) on ONE task.  Two defenses:

* **Spark >= 3.5 (default, ``salt_buckets=None``)**: the planner's
  ``WindowGroupLimit`` rewrite pushes ``row_number() <= k`` into a *partial*
  per-input-partition top-k before the shuffle — the hot host arrives at its
  window task already pruned to <= k * input_partitions rows.  Measured on
  Spark 4.1: the physical plan shows ``WindowGroupLimit ... Partial`` below
  the exchange, making explicit salting a pure extra-shuffle overhead.
  (This was benchmarked, not assumed — SURVEY.md §7 hard-part 4; the salted
  variant cost one additional hash-partition exchange for zero skew benefit.)

* **Explicit two-pass salting (``salt_buckets=S``)** for engines/patterns the
  rewrite does not cover (budget from a joined column => per-row limits
  cannot constant-fold into WindowGroupLimit):

  pass 1: rank within ``(host, salt)`` where ``salt = pmod(xxhash64(url), S)``
          — the hot host's rows spread over S tasks; keep rank <= budget.
          Any row in a host's true top-``budget`` is necessarily in the
          top-``budget`` of its own salt bucket, so pass 1 never drops a
          winner; it shrinks each host to <= S*budget survivors.
  pass 2: rank survivors within ``host`` — now at most S*budget rows per host,
          so the skewed window runs over a trivially small input.

Budgets come from an optional broadcast ``host_rules(host, budget, disallow)``
table (engine-side; the reference has no robots support —
reference PROJECT_STRUCTURE.md:291), with a default for unknown hosts.
Robots ``disallow`` prefix checks run JVM-side via ``exists()`` — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_BUDGET = 5  # reference limit_per_host default (crawler.py:83)


def with_host(df: DataFrame, url_col: str = "url", out: str = "host") -> DataFrame:
    return df.withColumn(out, F.lower(F.parse_url(F.col(url_col), F.lit("HOST"))))


def apply_robots(df: DataFrame, host_rules: DataFrame, url_col: str = "url") -> DataFrame:
    """Drop rows whose URL path starts with any disallow prefix for its host.
    host_rules is small (one row per host) => broadcast hash join, no shuffle
    on the frontier side."""
    rules = F.broadcast(host_rules.select("host", F.col("disallow").alias("__dis")))
    path = F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("/"))
    blocked = F.exists("__dis", lambda p: path.startswith(p))
    return (
        df.join(rules, on="host", how="left")
        .filter(F.col("__dis").isNull() | ~blocked)
        .drop("__dis")
    )


def local_host_prune(
    frontier: DataFrame,
    order_cols: list[str],
    budget: int | None,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Map-side politeness pre-prune (Arrow-vectorized ``mapInPandas``):
    within each partition — local first-wins dedup by url, then keep each
    host's smallest ``budget`` rows.  Returns a strict SUPERSET of the global
    winners, so the downstream global first-wins + budget rank yields an
    identical batch (standard distributive-top-k argument: a url in a host's
    global top-``budget`` cannot be evicted locally without ``budget``
    strictly-smaller urls of that host in the same partition, which would
    contradict its global rank; pytest-asserted equivalence in
    ``tests/test_schedule.py``).

    Why: the dedup and window exchanges otherwise carry every candidate; after
    the prune they carry at most ``budget x hosts x partitions`` rows — the
    shuffle fabric (the non-scaling resource on any cluster, measured directly
    by BENCH.md's shuffle-control) sees ~constant volume while the map-side
    prune scales linearly with executors.

    Exactness requires ``order_cols`` to totally order candidates (the
    engine's priority tuples — (parent position, link position) etc. — are
    unique by construction); string columns are compared as UTF-8 bytes to
    match Spark's binary collation.  Per-partition rows are concatenated into
    one pandas frame, so partition sizing (maxPartitionBytes) bounds memory."""
    if budget is None:
        return frontier
    payload = [c for c in frontier.columns if c != url_col and c not in order_cols]
    sort_src = list(order_cols) + payload  # the full first-wins struct order

    def prune(batches):
        import pandas as pd

        parts = [pdf for pdf in batches if len(pdf)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        keys = []
        for i, c in enumerate(sort_src):
            col = pdf[c]
            if col.dtype == object:  # UTF-8 byte order == Spark UTF8String order
                col = col.map(lambda v: v.encode("utf-8") if isinstance(v, str) else v)
            k = f"__k{i}"
            pdf[k] = col
            keys.append(k)
        pdf = pdf.sort_values(keys, kind="mergesort", na_position="first")
        pdf = pdf.drop_duplicates(subset=[url_col], keep="first")
        pdf = pdf.groupby(host_col, sort=False, dropna=False).head(budget)
        yield pdf.drop(columns=keys)

    return frontier.mapInPandas(prune, schema=frontier.schema)


def select_host_budget_batch(
    frontier: DataFrame,
    order_cols: list[str],
    budget: int | None = DEFAULT_BUDGET,
    host_rules: DataFrame | None = None,
    salt_buckets: int | None = None,
    host_col: str = "host",
    rank_col: str = "host_rank",
    acl_rules: DataFrame | None = None,
) -> DataFrame:
    """Return the round's fetch batch: per host, the ``budget`` smallest rows
    by ``order_cols``; ``rank_col`` carries the final within-host rank.
    ``budget=None`` => unbudgeted (whole frontier, still ranked).
    ``salt_buckets``: None trusts the WindowGroupLimit partial top-k
    (see module docstring); an int forces the explicit two-pass salted plan.
    ``acl_rules``: a compiled RFC 9309 rules table
    (sources/robots.acl_rules_from_robots) — full wildcard/anchor
    Allow/Disallow longest-match gating, applied as a broadcast-join
    map-side filter before any ranking work."""
    df = frontier
    if acl_rules is not None:
        from ..sources.robots import robots_allowed

        df = (
            robots_allowed(df, acl_rules, host_col=host_col)
            .where(F.col("allowed"))
            .drop("allowed", "win_len")
        )
    per_row_budget = host_rules is not None
    if per_row_budget:
        df = apply_robots(df, host_rules)
        budgets = F.broadcast(host_rules.select("host", F.col("budget").alias("__b")))
        df = df.join(budgets, on=host_col, how="left").withColumn(
            "__b", F.coalesce(F.col("__b"), F.lit(budget))
        )
        if salt_buckets is None:
            # per-row budgets defeat the WindowGroupLimit constant-k rewrite;
            # fall back to explicit salting with the max budget as pass-1 k
            salt_buckets = 32
    else:
        df = df.withColumn("__b", F.lit(budget))

    order = [F.col(c) for c in order_cols]
    if salt_buckets is not None and (budget is not None or per_row_budget):
        # pass 1: salted pre-rank kills the hot-host single-task bottleneck
        salted = df.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets))
        )
        w1 = Window.partitionBy(host_col, "__salt").orderBy(*order)
        survivors = (
            salted.withColumn("__r1", F.row_number().over(w1))
            .filter(F.col("__b").isNull() | (F.col("__r1") <= F.col("__b")))
            .drop("__r1", "__salt")
        )
    else:
        survivors = df
    # exact within-host rank; with constant k this compiles to
    # WindowGroupLimit(Partial) -> shuffle -> WindowGroupLimit(Final)
    w2 = Window.partitionBy(host_col).orderBy(*order)
    ranked = survivors.withColumn(rank_col, F.row_number().over(w2))
    if budget is not None or per_row_budget:
        ranked = ranked.filter(
            F.col("__b").isNull() | (F.col(rank_col) <= F.col("__b"))
        )
    return ranked.drop("__b")


# -- adaptive budgets from observed outcomes -----------------------------------

def adaptive_host_budget(
    fetch_log: DataFrame,
    base_budget: int = DEFAULT_BUDGET,
    url_col: str = "url",
    ok_col: str = "ok",
) -> DataFrame:
    """Next-round per-host budgets from this round's outcomes (the
    Heritrix-style error backoff, as data): hosts answering cleanly keep
    their budget, failing hosts shrink proportionally, floored at 1 so a
    host is never starved out of recovery.

    (host, n_fetched, n_failed, ok_ppm, next_budget) with
    ``next_budget = max(1, (base_budget * ok_ppm) div 1e6)`` — all
    integer, cross-engine exact.

    Scale shape: host extraction map-side, ONE partial-agg'd exchange on
    host; the output is O(#hosts) and broadcasts back into the next
    round's ``select_host_budget_batch`` as ``host_rules``-style input."""
    host = F.lower(F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    per_host = (
        fetch_log.select(host.alias("host"), F.col(ok_col).cast("long").alias("__ok"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_fetched"),
            (F.count(F.lit(1)) - F.sum("__ok")).alias("n_failed"),
        )
    )
    ok_ppm = F.expr("(1000000 * (n_fetched - n_failed)) div n_fetched")
    return per_host.select(
        "host",
        "n_fetched",
        "n_failed",
        ok_ppm.cast("long").alias("ok_ppm"),
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"({base_budget} * ((1000000 * (n_fetched - n_failed)) div n_fetched)) div 1000000"),
        ).alias("next_budget"),
    )


def duck_adaptive_budget_sql(fetch_log: str, base_budget: int = DEFAULT_BUDGET) -> str:
    """DuckDB twin of :func:`adaptive_host_budget`."""
    return f"""
SELECT host, n_fetched, n_failed,
       ((1000000 * (n_fetched - n_failed)) // n_fetched)::BIGINT AS ok_ppm,
       greatest(1, ({base_budget} * ((1000000 * (n_fetched - n_failed)) // n_fetched)) // 1000000)::BIGINT AS next_budget
FROM (
  SELECT lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS host,
         count(*)::BIGINT AS n_fetched,
         (count(*) - sum(CASE WHEN ok THEN 1 ELSE 0 END))::BIGINT AS n_failed
  FROM {fetch_log}
  GROUP BY 1
)
"""


# --- per-host BYTE budget (bandwidth-aware scheduling) --------------------------
#
# Count budgets (above) treat a 1 KB stub and a 20 MB PDF alike; a
# bandwidth-capped crawler schedules by ESTIMATED BYTES, with the estimate
# taken from the previous snapshot (the recrawl case) or a default for
# never-fetched URLs.  Selection = deterministic-priority ordered prefix of
# each host whose running byte total stays within the host's budget.
#
# Scale shape: the size join moves (url, est_bytes) pairs only; the cumsum
# is one window exchange on host.  For the hot-host tail, cap by count
# map-side FIRST (budget_bytes DIV min_page_bytes is an upper bound on how
# many rows can ever fit), which compiles to the WindowGroupLimit partial
# top-k above — the byte window then runs over <= that many rows per host.

DEFAULT_PAGE_BYTES = 16384
MIN_PAGE_BYTES = 512


def select_host_byte_budget(
    frontier: DataFrame,
    sizes: DataFrame,
    budget_bytes: int,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """(url, host, est_bytes, cum_bytes, selected) — ``sizes`` is
    (url, est_bytes) from the prior snapshot; unknown URLs estimate
    ``DEFAULT_PAGE_BYTES``.  Priority is md5(url) order (deterministic,
    resume-stable — the J3 proxy-assignment discipline); a row is selected
    while the running total INCLUDING it fits the budget."""
    cand = frontier.select(F.col(url_col).alias("url"), F.col(host_col).alias("host"))
    est = cand.join(sizes.select("url", "est_bytes"), on="url", how="left").select(
        "url",
        "host",
        F.coalesce(F.col("est_bytes"), F.lit(DEFAULT_PAGE_BYTES))
        .cast("long")
        .alias("est_bytes"),
    )
    # map-side count prune: no more than this many rows can ever fit
    max_rows = max(budget_bytes // MIN_PAGE_BYTES, 1)
    wr = Window.partitionBy("host").orderBy(F.md5(F.col("url")), F.col("url"))
    pruned = est.withColumn("rn", F.row_number().over(wr)).where(
        F.col("rn") <= max_rows
    )
    cum = pruned.select(
        "url",
        "host",
        "est_bytes",
        F.sum("est_bytes").over(wr.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum_bytes"),
    )
    return cum.withColumn("selected", F.col("cum_bytes") <= F.lit(budget_bytes))


def duck_host_byte_budget_sql(
    frontier: str, sizes: str, budget_bytes: int
) -> str:
    """DuckDB twin of :func:`select_host_byte_budget`."""
    max_rows = max(budget_bytes // MIN_PAGE_BYTES, 1)
    return rf"""
WITH est AS (
  SELECT f.url, f.host,
         coalesce(s.est_bytes, {DEFAULT_PAGE_BYTES})::BIGINT AS est_bytes
  FROM {frontier} f LEFT JOIN {sizes} s ON s.url = f.url
),
pruned AS (
  SELECT url, host, est_bytes,
         row_number() OVER (PARTITION BY host ORDER BY md5(url), url) AS rn
  FROM est
)
SELECT url, host, est_bytes,
       sum(est_bytes) OVER (
         PARTITION BY host ORDER BY md5(url), url
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_bytes,
       (sum(est_bytes) OVER (
         PARTITION BY host ORDER BY md5(url), url
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) <= {budget_bytes} AS selected
FROM pruned
WHERE rn <= {max_rows}
"""


# -- IP-grain politeness (virtual-host collapsing) ------------------------------


def resolve_politeness_key(
    frontier: DataFrame,
    dns: DataFrame,
    host_col: str = "host",
    out: str = "ip_key",
    broadcast_dns: bool = True,
) -> DataFrame:
    """Attach the IP-grain politeness key: hosts that share a server must
    share a budget (shared hosting puts thousands of vhosts on one box —
    host-grain budgets multiply into a hammering of that one machine;
    Heritrix/BUbiNG both offer IP politeness for exactly this).

    ``dns`` is (host, ip) with possibly several A records per host; the key
    is min(ip) per host — ONE deterministic pick, so a multihomed host never
    gets k budgets — and unresolved hosts fall back to ``unres:<host>``
    (their own private key, host-grain behavior).

    Scale shape: the dns table is O(#hosts) — orders below the frontier —
    so the min-ip agg is a tiny exchange and the attach join broadcasts;
    the frontier itself does not shuffle here.  ``broadcast_dns=False``
    drops the hint for resolver tables past broadcast size (~10^8-host
    deployments: a 3 GB map must not ship to every executor) — AQE then
    plans the join, and the extra host exchange it may cost is absorbed by
    the ip_key exchange the budget rank needs anyway."""
    key = dns.groupBy(F.col("host")).agg(F.min("ip").alias("__ip"))
    if broadcast_dns:
        key = F.broadcast(key)
    return (
        frontier.join(
            key, on=frontier[host_col] == key["host"], how="left"
        )
        .drop(key["host"])
        .withColumn(
            out,
            F.coalesce(F.col("__ip"), F.concat(F.lit("unres:"), F.col(host_col))),
        )
        .drop("__ip")
    )


def select_ip_budget_batch(
    frontier: DataFrame,
    dns: DataFrame,
    order_cols: "list[str]",
    budget: int | None = DEFAULT_BUDGET,
    host_col: str = "host",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Per-IP politeness batch: resolve each host to its politeness key
    (:func:`resolve_politeness_key`), then take the ``budget`` smallest rows
    per key — :func:`select_host_budget_batch` at IP grain, so the ranked
    window is the same WindowGroupLimit partial top-k (or the explicit
    salted two-pass when ``salt_buckets`` is set: shared-hosting IPs
    concentrate MANY hosts' candidates on one key, the skew case the salting
    path exists for)."""
    keyed = resolve_politeness_key(frontier, dns, host_col=host_col)
    return select_host_budget_batch(
        keyed,
        order_cols,
        budget=budget,
        salt_buckets=salt_buckets,
        host_col="ip_key",
        rank_col="ip_rank",
    )


def duck_ip_budget_sql(
    frontier: str,
    dns: str,
    budget: int,
    order_sql: str = "md5(url), url",
    select_cols: str = "url, host, ip_key",
) -> str:
    """DuckDB twin of :func:`select_ip_budget_batch`."""
    return rf"""
WITH key AS (
  SELECT host, min(ip) AS __ip FROM {dns} GROUP BY host
),
keyed AS (
  SELECT f.*, coalesce(k.__ip, 'unres:' || f.host) AS ip_key
  FROM {frontier} f LEFT JOIN key k ON k.host = f.host
)
SELECT {select_cols}, ip_rank::BIGINT AS ip_rank FROM (
  SELECT keyed.*,
         row_number() OVER (PARTITION BY ip_key ORDER BY {order_sql})
           AS ip_rank
  FROM keyed)
WHERE ip_rank <= {budget}
"""


def waterfill_quotas(
    demands: DataFrame,
    capacity: int,
    host_col: str = "host",
    demand_col: str = "demand",
) -> DataFrame:
    """Exact integer water-filling fetch-bandwidth allocation — the
    max-min-fair answer to "the round may fetch ``capacity`` URLs; every
    host wants ``demand``": each host receives ``min(demand, lambda)``
    where the water level lambda is the largest level the capacity funds,
    and the integer remainder goes +1 each to the first hosts (by host
    order) still above the level.  Properties: sum(quota) =
    min(capacity, sum(demand)); no host starves while a hot host monopolizes
    the round (the skew failure of proportional splits).

    Scale shape — nothing host-grain ever funnels:
      * the water-level search runs on the DISTINCT-DEMAND relation
        (#distinct demand values, orders below #hosts), with cumulative
        host-counts/demand-sums from the two-job range-partition prefix
        sum (ordering.with_prefix_sums);
      * driver-side state is two bounded rows (grand totals + the chosen
        level segment) — the bloom/IVF "bounded aggregate" discipline;
      * remainder assignment stamps a dense seq over only the unsaturated
        hosts (with_global_seq), then flags ``seq < r`` map-side.

    Output: (host, demand, quota) — one row per input host."""
    from web_crawler_spark.operators.ordering import (
        with_global_seq,
        with_prefix_sums,
    )

    d = demands.select(
        F.col(host_col).alias("host"),
        F.col(demand_col).cast("long").alias("demand"),
    )
    tot = d.agg(
        F.sum("demand").alias("td"), F.count("*").alias("m")
    ).collect()[0]
    td, m = tot["td"] or 0, tot["m"]
    if m == 0 or td <= capacity:
        return d.withColumn("quota", F.col("demand"))

    by_v = d.groupBy(F.col("demand").alias("v")).agg(
        F.count("*").alias("n_at"),
        F.sum("demand").alias("s_at"),
    )
    cum = with_prefix_sums(by_v, ["v"], ["n_at", "s_at"])
    seg = (
        cum.withColumn(
            "need", F.col("s_at_before") + F.col("v") * (m - F.col("n_at_before"))
        )
        .filter(F.col("need") <= capacity)
        .orderBy(F.col("v").desc())
        .limit(1)
        .collect()
    )
    if seg:
        s = seg[0]
        cnt_gt = m - s["n_at_before"] - s["n_at"]
        rem = capacity - s["need"]
        # cnt_gt == 0 would mean every host saturates within capacity,
        # i.e. td <= capacity — already returned above
        lam = s["v"] + rem // cnt_gt
        extra_r = rem % cnt_gt
    else:
        # capacity cannot even fund the smallest demand for every host
        lam = capacity // m
        extra_r = capacity % m

    sat = d.filter(F.col("demand") <= lam).select(
        "host", "demand", F.col("demand").alias("quota")
    )
    uns = with_global_seq(
        d.filter(F.col("demand") > lam), ["host"], out_col="__seq"
    ).select(
        "host",
        "demand",
        (
            F.lit(lam)
            + F.when(F.col("__seq") < extra_r, F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("quota"),
    )
    return sat.unionByName(uns)


def duck_waterfill_sql(
    demands: str, capacity: int, host_col: str = "host", demand_col: str = "demand"
) -> str:
    """DuckDB twin of :func:`waterfill_quotas` (windows are fine at oracle
    scale).  ``demands`` is any relation with (host, demand) columns."""
    return rf"""
WITH demands AS (
  SELECT {host_col} AS host, {demand_col}::BIGINT AS demand FROM {demands}
),
tot AS (SELECT sum(demand) AS td, count(*) AS m FROM demands),
lev AS (
  SELECT demand AS v, count(*)::BIGINT AS n_at, sum(demand)::BIGINT AS s_at
  FROM demands GROUP BY 1
),
cum AS (
  SELECT v, n_at,
         coalesce(sum(n_at) OVER w, 0) AS bc,
         coalesce(sum(s_at) OVER w, 0) AS bs
  FROM lev
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
seg AS (
  SELECT c.v, c.n_at, c.bc, c.bs + c.v * (t.m - c.bc) AS need
  FROM cum c, tot t
  WHERE c.bs + c.v * (t.m - c.bc) <= {capacity}
  ORDER BY c.v DESC LIMIT 1
),
params AS (
  SELECT
    CASE WHEN t.td <= {capacity} THEN NULL
         WHEN s.v IS NULL THEN {capacity} // t.m
         ELSE s.v + ({capacity} - s.need) // (t.m - s.bc - s.n_at) END AS lam,
    CASE WHEN t.td <= {capacity} THEN 0
         WHEN s.v IS NULL THEN {capacity} % t.m
         ELSE ({capacity} - s.need) % (t.m - s.bc - s.n_at) END AS extra_r
  FROM tot t LEFT JOIN seg s ON TRUE
),
ranked AS (
  SELECT d.host, d.demand, p.lam, p.extra_r,
         row_number() OVER (
           PARTITION BY CASE WHEN p.lam IS NOT NULL AND d.demand > p.lam
                             THEN 1 ELSE 0 END
           ORDER BY d.host) AS rn
  FROM demands d CROSS JOIN params p
)
SELECT host, demand,
       (CASE WHEN lam IS NULL OR demand <= lam THEN demand
             ELSE lam + CASE WHEN rn <= extra_r THEN 1 ELSE 0 END
        END)::BIGINT AS quota
FROM ranked
"""


# --- rendezvous (HRW) shard assignment (distributed-crawler partitioning) ----
#
# Assign every host to one of S crawler agents by highest-random-weight
# hashing (Thaler & Ravishankar 1996; the UbiCrawler assignment, Boldi et
# al. 2004): shard(host) = argmax over s of hash(host '#' s).  Two
# properties make HRW the standard here over mod-hashing: (1) balance —
# each agent gets ~|hosts|/S of the key space; (2) minimal disruption —
# growing S to S+1 only moves hosts whose argmax is the NEW shard (~1/(S+1)
# of them); nothing ever moves between pre-existing shards, so in-flight
# per-host crawl state never migrates on a resize.
#
# Scale shape: zero exchange beyond the (host, n_pages) partial agg — the
# argmax over S candidate weights is a JVM array expression per row
# (transform + array_position(array_max)); no explode, no window.  The
# md5-derived weights are the repo's cross-engine hash, so assignments are
# bit-identical in Spark and DuckDB.

HRW_SHARDS = 8


def hrw_shard_assignment(
    df: DataFrame, host_col: str = "host", n_shards: int = HRW_SHARDS
) -> DataFrame:
    """(host, shard, n_pages): rendezvous-hash crawler-agent assignment for
    every distinct host, with the host's page count for balance audits."""
    hosts = df.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").cast("long").alias("n_pages")
    )
    # conv() returns STRING — cast inside the lambda so array_max compares
    # numerically (a lexicographic max would silently diverge from DuckDB)
    w = (
        f"transform(sequence(0, {n_shards - 1}), "
        "s -> cast(conv(substring(md5(concat(host, '#', s)), 1, 8), 16, 10)"
        " as bigint))"
    )
    return hosts.select(
        "host",
        F.expr(
            f"cast(array_position({w}, array_max({w})) - 1 as bigint)"
        ).alias("shard"),
        "n_pages",
    )


def duck_hrw_shard_sql(
    table: str, host_col: str = "host", n_shards: int = HRW_SHARDS
) -> str:
    """DuckDB twin of :func:`hrw_shard_assignment` (1-based list_position)."""
    w = (
        f"list_transform(range(0, {n_shards}), "
        f"s -> ('0x' || substring(md5(host || '#' || s), 1, 8))::BIGINT)"
    )
    return rf"""
WITH hosts AS (
  SELECT {host_col} AS host, count(*)::BIGINT AS n_pages
  FROM {table} GROUP BY 1
)
SELECT host,
       (list_position({w}, list_max({w})) - 1)::BIGINT AS shard,
       n_pages
FROM hosts
"""


# --- Mercator politeness timeline (crawl-duration planning) ------------------
#
# The Mercator frontier (Heydon & Najork 1999) serializes each host's URLs
# through a per-host back-queue separated by that host's crawl delay; with
# worker threads plentiful (the Mercator operating point), politeness — not
# compute — binds, and URL k of a host starts at k * delay(host).  The
# batch-analytics form answers the capacity question every crawl op asks
# before launching: WHEN does each URL become fetchable and how long does
# the politeness-bound tail of each host run?
#
# Host delays here derive deterministically from the host hash (200-1000 ms
# in 100 ms steps — the md5 cross-engine idiom) standing in for per-host
# robots Crawl-delay; a deployment joins the real directive in, same plan.
#
# Scale shape: ONE window exchange keyed by host (the politeness key the
# composed scheduler already partitions by — Catalyst reuses the exchange
# when chained after the budget selector); the start-time arithmetic is
# map-side.  No global window: the timeline IS the (start_ms, host,
# host_seq) order, materialized lazily by whoever consumes it (the
# two-job range-partition stamp if a dense global seq is needed).

TIMELINE_BASE_DELAY_MS = 200
TIMELINE_DELAY_STEPS = 9
TIMELINE_STEP_MS = 100


def mercator_timeline(
    df: DataFrame, url_col: str = "url", host_col: str = "host"
) -> DataFrame:
    """(url, host, host_seq, delay_ms, start_ms): per-URL politeness-bound
    fetch start offsets under per-host serialized scheduling; within a
    host, order is the deterministic md5 priority (url tie-break)."""
    prio = F.expr(
        f"cast(conv(substring(md5({url_col}), 1, 8), 16, 10) as bigint)"
    )
    delay = F.expr(
        f"{TIMELINE_BASE_DELAY_MS}L + "
        f"(cast(conv(substring(md5({host_col}), 1, 8), 16, 10) as bigint) "
        f"% {TIMELINE_DELAY_STEPS}) * {TIMELINE_STEP_MS}"
    )
    w = Window.partitionBy(host_col).orderBy(prio.asc(), F.col(url_col).asc())
    return df.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        (F.row_number().over(w) - 1).cast("long").alias("host_seq"),
        delay.cast("long").alias("delay_ms"),
    ).withColumn("start_ms", (F.col("host_seq") * F.col("delay_ms")).cast("long"))


def duck_mercator_timeline_sql(
    table: str, url_col: str = "url", host_col: str = "host"
) -> str:
    """DuckDB twin of :func:`mercator_timeline`."""
    prio = f"('0x' || substring(md5({url_col}), 1, 8))::BIGINT"
    delay = (
        f"{TIMELINE_BASE_DELAY_MS} + (('0x' || substring(md5({host_col}), 1, 8))::BIGINT"
        f" % {TIMELINE_DELAY_STEPS}) * {TIMELINE_STEP_MS}"
    )
    return rf"""
SELECT url, host, host_seq, delay_ms,
       (host_seq * delay_ms)::BIGINT AS start_ms
FROM (
  SELECT {url_col} AS url, {host_col} AS host,
         (row_number() OVER (PARTITION BY {host_col}
                             ORDER BY {prio} ASC, {url_col} ASC) - 1)::BIGINT
           AS host_seq,
         ({delay})::BIGINT AS delay_ms
  FROM {table}
)
"""


# --- crawl-equity report (Gini over per-host fetch mass) ----------------------
#
# The crawl-ops fairness dashboard number: the Gini coefficient of pages
# fetched per host.  A polite broad crawl should sit LOW (fetch mass spread
# across hosts); a runaway scope rule or a trap shows up as the coefficient
# drifting toward 1.  Exact rational form over the ascending-sorted counts
# x_1 <= ... <= x_n:
#
#   gini_ppm = (2 * sum(i * x_i) - (n + 1) * sum(x)) * 1e6 DIV (n * sum(x))
#
# computed entirely in BIGINT (bit-identical across engines).  The global
# ascending rank comes from the repo's two-job range-partition sequence
# (operators/ordering.with_global_seq) — never a single-task window.
# Overflow bound: sum(rank * x) <= n * max(rank * x) ~ n^2 * avg(x); at the
# 10^7-host / 10^10-page design point that is ~5e16 << 2^63.

def crawl_equity(
    df: DataFrame, host_col: str = "host"
) -> DataFrame:
    """One row (n_hosts, total_pages, gini_ppm): fetch-distribution
    inequality across hosts, ties broken by host name for a total order."""
    from .ordering import with_global_seq

    counts = df.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").cast("long").alias("n")
    )
    ranked = with_global_seq(counts, ["n", "host"], out_col="seq", start=1)
    return ranked.agg(
        F.count("*").cast("long").alias("n_hosts"),
        F.sum("n").cast("long").alias("total_pages"),
        F.expr(
            "(2 * sum(seq * n) - (count(*) + 1) * sum(n)) * 1000000L"
            " DIV (count(*) * sum(n))"
        ).cast("long").alias("gini_ppm"),
    )


def duck_crawl_equity_sql(table: str, host_col: str = "host") -> str:
    """DuckDB twin of :func:`crawl_equity`."""
    return rf"""
WITH counts AS (
  SELECT {host_col} AS host, count(*)::BIGINT AS n FROM {table} GROUP BY 1
),
ranked AS (
  SELECT n, row_number() OVER (ORDER BY n, host)::BIGINT AS seq FROM counts
)
SELECT count(*)::BIGINT AS n_hosts,
       sum(n)::BIGINT AS total_pages,
       ((2 * sum(seq * n) - (count(*) + 1) * sum(n)) * 1000000
         // (count(*) * sum(n)))::BIGINT AS gini_ppm
FROM ranked
"""


# --- consistent-hash ring assignment (Karger et al. '97) ----------------------
#
# The classic alternative to rendezvous hashing for crawler-shard
# assignment: agents own V virtual points on a 2^32 ring, a host belongs
# to the first vnode clockwise from its own point.  Same minimal-
# disruption property as HRW (resizing moves ~1/(S+1) of keys), different
# trade-off: ring lookups are O(log SV) on a real coordinator (vs HRW's
# O(S) scoring) but balance depends on V — which is exactly what the
# audit columns measure.  All ring arithmetic is 32-bit md5 points in
# BIGINTs (wrap via +2^32 mod), bit-identical across engines.

RING_SHARDS = HRW_SHARDS
RING_VNODES = 64


def ring_shard_assignment(
    df: DataFrame,
    host_col: str = "host",
    n_shards: int = RING_SHARDS,
    vnodes: int = RING_VNODES,
) -> DataFrame:
    """(host, shard, n_pages): consistent-hash-ring agent assignment for
    every distinct host.

    Scale shape: the SV-point ring is a literal array folded per host
    (map-side JVM aggregate, zero exchange beyond the host rollup —
    the hrw_shard_assignment shape); clockwise distance
    ``(vp - hp + 2^32) % 2^32`` is argmin'd with an exact integer fold."""
    hosts = df.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").cast("long").alias("n_pages")
    )
    ring = (
        f"flatten(transform(sequence(0, {n_shards - 1}), a -> "
        f"transform(sequence(0, {vnodes - 1}), v -> named_struct("
        "'vp', cast(conv(substring(md5(concat('ring#', a, '#', v)), 1, 8),"
        " 16, 10) as bigint), 'agent', cast(a as bigint)))))"
    )
    hp = "cast(conv(substring(md5(host), 1, 8), 16, 10) as bigint)"
    dist = f"pmod(x.vp - {hp} + 4294967296L, 4294967296L)"
    pick = (
        f"aggregate({ring}, named_struct('d', 4294967296L, 'agent', -1L), "
        f"(acc, x) -> CASE WHEN {dist} < acc.d THEN"
        f" named_struct('d', {dist}, 'agent', x.agent) ELSE acc END).agent"
    )
    return hosts.select(
        "host", F.expr(pick).cast("long").alias("shard"), "n_pages"
    )


def duck_ring_shard_sql(
    table: str,
    host_col: str = "host",
    n_shards: int = RING_SHARDS,
    vnodes: int = RING_VNODES,
) -> str:
    """DuckDB twin: same ring points, clockwise argmin via a window rank
    over the host x vnode join (oracle scale only — the engine folds)."""
    return rf"""
WITH hosts AS (
  SELECT {host_col} AS host, count(*)::BIGINT AS n_pages
  FROM {table} GROUP BY 1
),
ring AS (
  SELECT a.a::BIGINT AS agent,
         ('0x' || substring(md5('ring#' || a.a || '#' || v.v), 1, 8))::BIGINT
           AS vp
  FROM (SELECT unnest(range({n_shards})) AS a) a,
       (SELECT unnest(range({vnodes})) AS v) v
),
scored AS (
  SELECT h.host, h.n_pages, r.agent,
         (r.vp - ('0x' || substring(md5(h.host), 1, 8))::BIGINT
          + 4294967296) % 4294967296 AS d
  FROM hosts h, ring r
)
SELECT host, agent AS shard, n_pages FROM (
  SELECT host, n_pages, agent,
         row_number() OVER (PARTITION BY host ORDER BY d, agent) AS rn
  FROM scored
) WHERE rn = 1
"""
# -- politeness budget sensitivity (capacity planning) --------------------------
#
# The scheduler runs at ONE budget; choosing it is a capacity decision —
# raising the per-host cap grows the round's fetch batch only until hosts
# stop saturating, and the marginal yield of each extra slot is exactly
# what this curve reports.  One ranking pass (the scheduler's own
# WindowGroupLimit partial top-k at the LARGEST candidate budget) feeds
# every curve point: past the window, the relation is host-grain, so the
# sweep costs nothing extra at any corpus size.

CURVE_BUDGETS = (1, 2, 5, 10, 16)


def budget_yield_curve(
    frontier: DataFrame,
    order_cols: list[str],
    budgets: tuple = CURVE_BUDGETS,
    host_col: str = "host",
) -> DataFrame:
    """(budget, n_scheduled, n_hosts, n_hosts_saturated) for each candidate
    budget: n_scheduled = sum over hosts of min(host rows, budget) — the
    batch size the scheduler WOULD emit at that budget; n_hosts_saturated
    = hosts whose demand meets or exceeds it (the politeness-bound hosts).

    Scale shape: one host-partitioned top-max(budgets) window (identical
    plan to select_host_budget_batch — WindowGroupLimit partial top-k,
    bounded rows past the exchange), one host-grain partial agg, then the
    |budgets|-point sweep over the host relation.  No second frontier
    pass, no Python."""
    cap = max(budgets)
    batch = select_host_budget_batch(frontier, order_cols, budget=cap)
    per_host = batch.groupBy(host_col).agg(F.max("host_rank").alias("n_rows"))
    exp = per_host.select(
        "n_rows",
        F.explode(
            F.array([F.lit(int(b)).cast("long") for b in budgets])
        ).alias("budget"),
    )
    return exp.groupBy("budget").agg(
        F.sum(F.least(F.col("n_rows"), F.col("budget"))).cast("long").alias("n_scheduled"),
        F.count("*").cast("long").alias("n_hosts"),
        F.sum((F.col("n_rows") >= F.col("budget")).cast("long"))
        .cast("long")
        .alias("n_hosts_saturated"),
    )


def duck_budget_curve_sql(
    frontier: str, budgets: tuple = CURVE_BUDGETS, host_col: str = "host"
) -> str:
    """DuckDB twin of :func:`budget_yield_curve`.  The oracle needs no
    ranking at all — min(host count, budget) is a pure function of the
    per-host count, which is the point: the curve certifies the engine's
    windowed plan against count arithmetic."""
    blist = ", ".join(str(int(b)) for b in budgets)
    return f"""
WITH r AS (
  SELECT {host_col} AS host, count(*)::BIGINT AS cnt
  FROM {frontier} GROUP BY 1
),
b AS (SELECT unnest([{blist}])::BIGINT AS budget)
SELECT budget,
       sum(least(cnt, budget))::BIGINT AS n_scheduled,
       count(*)::BIGINT AS n_hosts,
       sum(CASE WHEN cnt >= budget THEN 1 ELSE 0 END)::BIGINT
         AS n_hosts_saturated
FROM r, b GROUP BY 1
"""

