"""Freshness-driven recrawl scheduling — the incremental-crawl half of the
frontier (Cho & Garcia-Molina, "Synchronizing a database to improve
freshness", SIGMOD 2000: revisit stalest-first under a politeness budget).

The reference crawler is single-shot (no revisit policy); a production
Common-Crawl-style pipeline re-fetches, and the engine's own primitives
already compose into it:

* ``recrawl_batch`` — pages whose last capture (``warc_ts``) is at least
  ``min_age`` old, stalest-first per host, budget-capped.  Ordering is
  ``(warc_ts, url)`` ascending, so the rank is the same
  WindowGroupLimit-compiled per-host top-k the fetch scheduler uses — a
  map-side partial top-k; no new plan shape.
* ``expire`` — un-sees the selected batch so the *fetch* scheduler treats
  those URLs as new again: the exact seen set drops them via anti-join
  (in store mode, rewrite-on-expire of the affected buckets only), and the
  cuckoo sidecar — the deletable sketch; a Bloom would force a rebuild —
  deletes their fingerprints driver-side.  The batch is budget x hosts
  bounded, so the driver-side hash collection is a bounded aggregate (the
  crawl loop's own convention for scalar probes).

End-to-end (pytest ``tests/test_schedule.py``): schedule -> fetched urls
enter seen -> recrawl_batch picks the stalest -> expire -> the next
``schedule_frontier`` round reschedules exactly those urls.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..operators.cuckoo import ShardedCuckoo
from ..operators.politeness import select_host_budget_batch, with_host


def recrawl_batch(
    pages: DataFrame,
    now_us: int,
    min_age_us: int,
    budget: int | None,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """(url, host, age_us, host_rank): per host, the ``budget`` stalest
    pages at least ``min_age_us`` old at ``now_us`` (epoch micros).

    Scale shape: the age filter is a map-side scan predicate (pushed to the
    parquet/Iceberg scan when ``ts_col`` is a partition or stats column);
    the per-host rank compiles to the WindowGroupLimit partial top-k, so
    only ~budget rows per host per task reach the one host exchange."""
    aged = with_host(
        pages.select(
            F.col(url_col).alias("url"),
            (F.lit(now_us) - F.unix_micros(F.col(ts_col))).alias("age_us"),
            F.col(ts_col),
        )
    ).filter(F.col("age_us") >= F.lit(min_age_us))
    batch = select_host_budget_batch(aged, order_cols=[ts_col, "url"], budget=budget)
    return batch.select(
        "url", "host", F.col("age_us").cast("long").alias("age_us"),
        F.col("host_rank").cast("long").alias("host_rank"),
    )


def expire(
    seen: DataFrame,
    batch: DataFrame,
    sketch: ShardedCuckoo | None = None,
    url_col: str = "url",
) -> DataFrame:
    """Remove a recrawl batch from the seen state: returns the exact seen
    set minus the batch; if a cuckoo sketch rides along, its fingerprints
    are deleted in place (no rebuild — the operation a Bloom cannot do).
    ``batch`` is budget-bounded by construction, so collecting its 8-byte
    hashes is a bounded driver aggregate."""
    if sketch is not None:
        hashes = np.array(
            [r[0] for r in batch.select(F.xxhash64(F.col(url_col))).collect()],
            dtype=np.int64,
        )
        if len(hashes):
            sketch.delete(hashes)
    return seen.join(batch.select(url_col), on=url_col, how="left_anti")


def duck_recrawl_sql(pages: str, now_sql: str, min_age_us: int, budget: int) -> str:
    """DuckDB twin of ``recrawl_batch``; ``now_sql`` is a SQL expression for
    the epoch-micros clock (a scalar subquery over the data keeps the oracle
    deterministic without wall-clock input)."""
    return rf"""
WITH nowc AS (SELECT {now_sql} AS now_us),
aged AS (
  SELECT url,
         lower(split_part(split_part(split_part(url, '://', 2), '/', 1), ':', 1))
           AS host,
         ((SELECT now_us FROM nowc) - epoch_us(warc_ts))::BIGINT AS age_us,
         warc_ts
  FROM {pages}
  WHERE (SELECT now_us FROM nowc) - epoch_us(warc_ts) >= {min_age_us}
)
SELECT url, host, age_us,
       row_number() OVER (PARTITION BY host ORDER BY warc_ts, url) AS host_rank
FROM aged QUALIFY host_rank <= {budget}
"""


# -- snapshot diffing (incremental-crawl delta) -------------------------------
#
# Common-Crawl-style corpora ship as periodic snapshots; the delta between
# two snapshots (what appeared, vanished, changed) drives recrawl priority,
# dedup maintenance, and training-data freshness accounting.  The reference
# is single-shot and has no counterpart — this is the incremental half the
# engine adds.


def snapshot_diff(
    prev: DataFrame,
    curr: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
    text_col: str = "text",
) -> DataFrame:
    """Delta between two crawl snapshots of the pages table.

    Output: (url, status, prev_ts_us, curr_ts_us, html_changed,
    text_changed) with status in {added, gone, changed, unchanged};
    the *_changed flags are NULL for added/gone rows.

    Scale shape: each side is first projected to (url, ts, md5(html),
    md5(text)) map-side, so the full-outer join moves 8+16-byte digests,
    never page bodies; with both snapshots stored bucketed by url (the
    seen-store layout) the join is a zipper sort-merge with no exchange."""
    def digest(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(url_col).alias("url"),
            F.unix_micros(F.col(ts_col)).alias(f"{tag}_ts_us"),
            F.md5(F.col(html_col)).alias(f"{tag}_h"),
            F.md5(F.encode(F.col(text_col), "UTF-8")).alias(f"{tag}_t"),
        )

    p, c = digest(prev, "prev"), digest(curr, "curr")
    j = p.join(c, on="url", how="full_outer")
    in_prev = F.col("prev_h").isNotNull()
    in_curr = F.col("curr_h").isNotNull()
    html_changed = F.when(
        in_prev & in_curr, F.col("prev_h") != F.col("curr_h")
    )
    text_changed = F.when(
        in_prev & in_curr, F.col("prev_t") != F.col("curr_t")
    )
    status = (
        F.when(~in_prev, F.lit("added"))
        .when(~in_curr, F.lit("gone"))
        .when(html_changed | text_changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        "url",
        status.alias("status"),
        F.col("prev_ts_us").cast("long"),
        F.col("curr_ts_us").cast("long"),
        html_changed.alias("html_changed"),
        text_changed.alias("text_changed"),
    )


def duck_snapshot_diff_sql(prev: str, curr: str) -> str:
    """DuckDB twin: direct byte comparison (equivalent to the engine's
    digest compare) over the same full-outer join."""
    return rf"""
SELECT coalesce(p.url, c.url) AS url,
  CASE WHEN p.url IS NULL THEN 'added'
       WHEN c.url IS NULL THEN 'gone'
       WHEN p.html IS DISTINCT FROM c.html
            OR p.text IS DISTINCT FROM c.text THEN 'changed'
       ELSE 'unchanged' END AS status,
  epoch_us(p.warc_ts)::BIGINT AS prev_ts_us,
  epoch_us(c.warc_ts)::BIGINT AS curr_ts_us,
  CASE WHEN p.url IS NULL OR c.url IS NULL THEN NULL
       ELSE p.html IS DISTINCT FROM c.html END AS html_changed,
  CASE WHEN p.url IS NULL OR c.url IS NULL THEN NULL
       ELSE p.text IS DISTINCT FROM c.text END AS text_changed
FROM {prev} p FULL OUTER JOIN {curr} c ON p.url = c.url
"""


# -- change-rate-aware recrawl (adaptive revisit policy) ----------------------

ADAPTIVE_BUDGET = 5


def adaptive_batch(
    prev: DataFrame,
    curr: DataFrame,
    budget: int | None = ADAPTIVE_BUDGET,
) -> DataFrame:
    """Adaptive revisit priority (Cho & Garcia-Molina freshness estimation,
    one-observation form): pages whose content changed between the last two
    snapshots refetch first (priority 0), newly discovered pages next (1),
    stable pages last (2); ``gone`` URLs leave the frontier.  Per-host
    politeness budget on top.

    Output: (url, host, status, priority, host_rank).

    Scale shape: composes ``snapshot_diff`` (digest-only full-outer join)
    with the scheduler's WindowGroupLimit per-host top-k — the same two
    exchanges the fetch scheduler already pays, nothing new."""
    diff = snapshot_diff(prev, curr)
    pri = (
        F.when(F.col("status") == "changed", F.lit(0))
        .when(F.col("status") == "added", F.lit(1))
        .otherwise(F.lit(2))
    )
    live = with_host(
        diff.filter(F.col("status") != "gone").select(
            "url", "status", pri.cast("long").alias("priority")
        )
    )
    batch = select_host_budget_batch(
        live, order_cols=["priority", "url"], budget=budget
    )
    return batch.select(
        "url", "host", "status", "priority",
        F.col("host_rank").cast("long").alias("host_rank"),
    )


def duck_adaptive_sql(prev: str, curr: str, budget: int = ADAPTIVE_BUDGET) -> str:
    host = "lower(split_part(split_part(split_part(url, '://', 2), '/', 1), ':', 1))"
    return rf"""
WITH diff AS ({duck_snapshot_diff_sql(prev, curr)}),
live AS (
  SELECT url, {host} AS host, status,
         CASE status WHEN 'changed' THEN 0 WHEN 'added' THEN 1 ELSE 2 END
           ::BIGINT AS priority
  FROM diff WHERE status <> 'gone'
)
SELECT url, host, status, priority,
       row_number() OVER (PARTITION BY host ORDER BY priority, url)::BIGINT
         AS host_rank
FROM live QUALIFY host_rank <= {budget}
"""


# -- cross-snapshot content dedup (canonical-version selection) ---------------


def dedup_snapshots(
    snapshots: "list[DataFrame]",
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """One row per distinct extracted TEXT across all snapshots — the
    earliest capture wins (ties by url).  A page unchanged between two
    monthly snapshots must not enter the training set twice (the
    cross-snapshot half of exact dedup; Lee et al. dedup within one
    snapshot is ``dedup_exact``).

    Output: (digest, n_copies, url, ts_us) — the canonical capture plus the
    duplicate count per content digest.

    Scale shape: each snapshot digests map-side (16-byte md5, bodies stay in
    the scan); the union is one first-wins min-struct aggregation keyed by
    digest with map-side partials — the same single-exchange plan as the
    frontier's url dedup, with the copy count riding the same exchange."""
    from ..operators.dedup import first_wins

    digested = [
        s.select(
            F.md5(F.encode(F.col(text_col), "UTF-8")).alias("digest"),
            F.unix_micros(F.col(ts_col)).alias("ts_us"),
            F.col(url_col).alias("url"),
        )
        for s in snapshots
    ]
    both = digested[0]
    for d in digested[1:]:
        both = both.unionByName(d)
    counts = both.groupBy("digest").agg(F.count("*").alias("n_copies"))
    winners = first_wins(both, "digest", ["ts_us", "url"])
    return winners.join(counts, on="digest").select(
        "digest", F.col("n_copies").cast("long"), "url", F.col("ts_us").cast("long")
    )


def duck_dedup_snapshots_sql(tables: "list[str]") -> str:
    union = " UNION ALL ".join(
        f"SELECT md5(text) AS digest, epoch_us(warc_ts) AS ts_us, url FROM {t}"
        for t in tables
    )
    return rf"""
WITH allsnap AS ({union}),
ranked AS (
  SELECT digest, ts_us, url,
         row_number() OVER (PARTITION BY digest ORDER BY ts_us, url) AS rn,
         count(*) OVER (PARTITION BY digest) AS n_copies
  FROM allsnap
)
SELECT digest, n_copies::BIGINT AS n_copies, url, ts_us::BIGINT AS ts_us
FROM ranked WHERE rn = 1
"""


def write_snapshot_bucketed(
    df: DataFrame, table_name: str, buckets: int = 64, url_col: str = "url"
) -> None:
    """Persist a crawl snapshot hash-bucketed (+sorted) by url — the storage
    layout that turns ``snapshot_diff`` into a ZIPPER sort-merge join: both
    sides arrive pre-distributed and pre-sorted on url, so the full-outer
    join runs with zero Exchange (plan-tested in tests/test_schedule.py).
    The same only-the-small-side-moves property the bucketed seen store
    gives the frontier anti-join (operators/dedup.write_bucketed_seen)."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, url_col)
        .sortBy(url_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


# --- cross-host content mirrors (content-based mirror detection) ---------------

MIRROR_HOST_CAP = 10


def content_mirrors(
    df: DataFrame,
    text_col: str = "text",
    host_col: str = "host",
    cap: int = MIRROR_HOST_CAP,
) -> DataFrame:
    """(text_md5, n_hosts, n_pages, hosts): text digests served by MORE
    than one host — the content-based evidence for mirror families
    (complement of the link-based ``linkstats.host_components``; a crawl
    dedups mirrors by digest even when the mirrors never link each other).

    Scale shape: map-side md5 digest (bodies never shuffle), distinct
    (digest, host) with partials, per-digest host count + first-``cap``
    host sample via sort_array+slice (the postings champion-list trick —
    a digest mirrored by 10^4 hosts ships a bounded list); page count
    rides the same digest-keyed exchange."""
    digests = df.select(
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("text_md5"),
        F.col(host_col).alias("host"),
    )
    per_digest = digests.groupBy("text_md5").agg(
        F.count("*").cast("long").alias("n_pages"),
        F.countDistinct("host").cast("long").alias("n_hosts"),
        F.slice(F.sort_array(F.collect_set("host")), 1, cap).alias("hosts"),
    )
    return per_digest.filter(F.col("n_hosts") > 1)


def duck_content_mirrors_sql(
    pages: str, cap: int = MIRROR_HOST_CAP
) -> str:
    return rf"""
WITH d AS (
  SELECT md5(text) AS text_md5, host FROM {pages}
),
g AS (
  SELECT text_md5,
         count(*)::BIGINT AS n_pages,
         count(DISTINCT host)::BIGINT AS n_hosts,
         list_sort(list(DISTINCT host))[1:{cap}] AS hosts
  FROM d GROUP BY 1
)
SELECT * FROM g WHERE n_hosts > 1
"""


# -- conditional-GET revalidation planning (HTTP 304 / If-None-Match) ----------


def conditional_get_plan(prev: DataFrame, curr: DataFrame) -> DataFrame:
    """(host, n_not_modified, n_modified, n_new, bytes_saved, bytes_fetch,
    saved_ppm) — the bandwidth case for validator-based revalidation: on a
    recrawl of the current snapshot's URLs, pages whose bytes are
    unchanged since the previous snapshot answer 304 Not Modified (body
    not transferred — its size is "saved"); changed and newly discovered
    pages pay a full fetch.  saved_ppm = bytes_saved * 1e6 DIV total —
    the per-host revalidation win a crawl scheduler weighs against
    holding validators in frontier state (reference has no counterpart;
    cf. crawler ETag/Last-Modified practice, RFC 9110 s13.1).

    Scale shape: both snapshots project to (url, md5 digest, byte size)
    MAP-SIDE, so the url-grain full-outer join moves ~40-byte rows, never
    page bodies (the snapshot_diff economics); the host rollup is one
    partial-agg'd exchange bounded by host count."""
    def proj(df: DataFrame, tag: str) -> DataFrame:
        # NULL html (unfetchable page) folds to the empty body BEFORE the
        # digest, with presence carried by an explicit flag — digest
        # nullness must not double as row-existence (the oracle mirrors
        # the same coalesce so NULL==NULL compares unchanged)
        return df.select(
            F.col("url"),
            F.lit(1).alias(f"{tag}_in"),
            F.md5(F.expr("coalesce(html, X'')")).alias(f"{tag}_h"),
            F.expr("octet_length(coalesce(html, X''))")
            .cast("long")
            .alias(f"{tag}_b"),
        )

    j = (
        proj(prev, "prev")
        .join(proj(curr, "curr"), on="url", how="full_outer")
        .filter(F.col("curr_in").isNotNull())  # gone pages are not refetched
    )
    status = (
        F.when(F.col("prev_in").isNull(), F.lit("new"))
        .when(F.col("prev_h") == F.col("curr_h"), F.lit("not_modified"))
        .otherwise(F.lit("modified"))
    )
    host = F.lower(F.regexp_extract(F.col("url"), r"(?i)^https?://([^/:?#]+)", 1))
    per = j.select(host.alias("host"), status.alias("status"), F.col("curr_b"))
    nm = F.col("status") == "not_modified"
    return (
        per.filter(F.col("host") != "")
        .groupBy("host")
        .agg(
            F.count(F.when(nm, 1)).cast("long").alias("n_not_modified"),
            F.count(F.when(F.col("status") == "modified", 1))
            .cast("long")
            .alias("n_modified"),
            F.count(F.when(F.col("status") == "new", 1)).cast("long").alias("n_new"),
            F.coalesce(F.sum(F.when(nm, F.col("curr_b"))), F.lit(0))
            .cast("long")
            .alias("bytes_saved"),
            F.coalesce(F.sum(F.when(~nm, F.col("curr_b"))), F.lit(0))
            .cast("long")
            .alias("bytes_fetch"),
        )
        .withColumn(
            "saved_ppm",
            F.expr(
                "bytes_saved * 1000000 DIV greatest(bytes_saved + bytes_fetch, 1)"
            ).cast("long"),
        )
    )


def duck_conditional_get_sql(prev: str, curr: str) -> str:
    """DuckDB twin: direct byte comparison stands in for the digest
    equality (same equivalence on these snapshots)."""
    return rf"""
WITH j AS (
  SELECT c.url,
    CASE WHEN p.url IS NULL THEN 'new'
         WHEN coalesce(p.html, ''::BLOB) = coalesce(c.html, ''::BLOB)
           THEN 'not_modified'
         ELSE 'modified' END AS status,
    octet_length(coalesce(c.html, ''::BLOB))::BIGINT AS curr_b,
    lower(coalesce(regexp_extract(c.url, '(?i)^https?://([^/:?#]+)', 1), ''))
      AS host
  FROM {curr} c LEFT JOIN {prev} p ON p.url = c.url
),
agg AS (
  SELECT host,
    count(CASE WHEN status = 'not_modified' THEN 1 END)::BIGINT AS n_not_modified,
    count(CASE WHEN status = 'modified' THEN 1 END)::BIGINT AS n_modified,
    count(CASE WHEN status = 'new' THEN 1 END)::BIGINT AS n_new,
    coalesce(sum(CASE WHEN status = 'not_modified' THEN curr_b END), 0)::BIGINT
      AS bytes_saved,
    coalesce(sum(CASE WHEN status <> 'not_modified' THEN curr_b END), 0)::BIGINT
      AS bytes_fetch
  FROM j WHERE host <> '' GROUP BY host
)
SELECT *, (bytes_saved * 1000000
             // greatest(bytes_saved + bytes_fetch, 1))::BIGINT AS saved_ppm
FROM agg
"""


# --- capture-recapture frontier-size estimation -------------------------------
#
# "How many URLs exist that we have NOT crawled yet?"  The ecology
# estimator (Lincoln-Petersen; Chapman's bias-corrected form) answers it
# from two independent samples and their overlap — the method Lawrence &
# Giles (Science '98) used to size the indexable web from search-engine
# overlap.  Two crawl snapshots of the same web are the two samples:
# N_hat = (n1+1)(n2+1)/(m+1) - 1, undiscovered = N_hat - |union|.
# Exact integer DIV throughout; the denominators are +1-shifted so the
# estimator is defined even at zero overlap.


def capture_recapture(prev, curr, url_col: str = "url"):
    """(n_prev, n_curr, n_overlap, n_union, n_hat_chapman, n_hat_petersen,
    undiscovered_est) — population estimate of the crawlable URL space from
    two snapshot samples.

    Scale shape: two distinct projections + one url-keyed join; everything
    that moves is a url string; outputs are one row of BIGINTs.  Petersen
    (n1*n2 DIV m) rides alongside Chapman for the classical comparison and
    is 0-guarded the same way."""
    from pyspark.sql import functions as F

    a = prev.select(F.col(url_col).alias("url")).distinct()
    b = curr.select(F.col(url_col).alias("url")).distinct()
    counts = (
        a.withColumn("in_a", F.lit(1))
        .join(b.withColumn("in_b", F.lit(1)), on="url", how="full")
        .agg(
            F.sum(F.coalesce(F.col("in_a"), F.lit(0))).cast("long").alias("n_prev"),
            F.sum(F.coalesce(F.col("in_b"), F.lit(0))).cast("long").alias("n_curr"),
            F.sum(
                F.when(F.col("in_a").isNotNull() & F.col("in_b").isNotNull(), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_overlap"),
            F.count("*").cast("long").alias("n_union"),
        )
    )
    return counts.select(
        "n_prev",
        "n_curr",
        "n_overlap",
        "n_union",
        F.expr("(n_prev + 1) * (n_curr + 1) DIV (n_overlap + 1) - 1")
        .cast("long")
        .alias("n_hat_chapman"),
        F.expr("n_prev * n_curr DIV greatest(n_overlap, 1L)")
        .cast("long")
        .alias("n_hat_petersen"),
        F.expr(
            "greatest(0L, (n_prev + 1) * (n_curr + 1) DIV (n_overlap + 1) - 1"
            " - n_union)"
        )
        .cast("long")
        .alias("undiscovered_est"),
    )


def duck_capture_recapture_sql(prev: str, curr: str) -> str:
    return f"""
WITH a AS (SELECT DISTINCT url FROM {prev}),
b AS (SELECT DISTINCT url FROM {curr}),
c AS (
  SELECT count(a.url)::BIGINT AS n_prev, count(b.url)::BIGINT AS n_curr,
         sum(CASE WHEN a.url IS NOT NULL AND b.url IS NOT NULL
             THEN 1 ELSE 0 END)::BIGINT AS n_overlap,
         count(*)::BIGINT AS n_union
  FROM a FULL JOIN b ON a.url = b.url
)
SELECT n_prev, n_curr, n_overlap, n_union,
       ((n_prev + 1) * (n_curr + 1) // (n_overlap + 1) - 1)::BIGINT
         AS n_hat_chapman,
       (n_prev * n_curr // greatest(n_overlap, 1))::BIGINT AS n_hat_petersen,
       greatest(0, (n_prev + 1) * (n_curr + 1) // (n_overlap + 1) - 1
                - n_union)::BIGINT AS undiscovered_est
FROM c
"""


# -- freshness economics (revisit-interval planning) ---------------------------
#
# Cho & Garcia-Molina's freshness model, in the engine's exact-integer
# discipline: the two snapshots give each surviving url one Bernoulli
# change observation; pooled per host that is a per-period change
# probability p, and a page revisited every k periods is stale just
# before its revisit with probability 1-(1-p)^k.  The k-sweep is what a
# recrawl planner actually reads — "how much staleness do I buy by
# stretching this host's revisit interval 2x/4x/8x" — and, pooled with
# the host's page count, prices a global revisit budget.

FRESHNESS_KS = (1, 2, 4, 8)


def host_freshness(
    prev: DataFrame, curr: DataFrame, url_col: str = "url"
) -> DataFrame:
    """(host, n_eval, n_changed, change_ppm, stale_ppm_k1, stale_ppm_k2,
    stale_ppm_k4, stale_ppm_k8): per-host one-observation change rate and
    the expected staleness at revisit-every-k-periods, all exact BIGINT
    ppm.  (1-p)^k is computed by repeated squaring with a floor-div
    rescale per squaring — x_{2k} = x_k^2 div 1e6, every intermediate
    <= 1e12 — so the sweep is bit-identical in any engine at any scale.

    Scale shape: rides snapshot_diff's digest join (hashes move, bodies
    never); one host-grain partial-agg rollup; the k-sweep is map-side
    arithmetic on the host relation."""
    diff = snapshot_diff(prev, curr)
    lab = with_host(
        diff.filter(F.col("status").isin("changed", "unchanged")).select(
            "url", (F.col("status") == "changed").alias("chg")
        )
    )
    agg = lab.groupBy("host").agg(
        F.count("*").cast("long").alias("n_eval"),
        F.sum(F.col("chg").cast("long")).cast("long").alias("n_changed"),
    )
    p = F.expr("(n_changed * 1000000) div n_eval")
    out = agg.withColumn("change_ppm", p.cast("long"))
    x1 = F.lit(1000000).cast("long") - F.col("change_ppm")  # (1-p) in ppm
    return (
        out.withColumn("__x1", x1)
        .withColumn("__x2", F.expr("(__x1 * __x1) div 1000000"))
        .withColumn("__x4", F.expr("(__x2 * __x2) div 1000000"))
        .withColumn("__x8", F.expr("(__x4 * __x4) div 1000000"))
        .select(
            "host",
            "n_eval",
            "n_changed",
            "change_ppm",
            (F.lit(1000000) - F.col("__x1")).cast("long").alias("stale_ppm_k1"),
            (F.lit(1000000) - F.col("__x2")).cast("long").alias("stale_ppm_k2"),
            (F.lit(1000000) - F.col("__x4")).cast("long").alias("stale_ppm_k4"),
            (F.lit(1000000) - F.col("__x8")).cast("long").alias("stale_ppm_k8"),
        )
    )


def duck_host_freshness_sql(prev: str, curr: str) -> str:
    """DuckDB twin of :func:`host_freshness`."""
    host = "lower(split_part(split_part(split_part(url, '://', 2), '/', 1), ':', 1))"
    return rf"""
WITH diff AS ({duck_snapshot_diff_sql(prev, curr)}),
lab AS (
  SELECT {host} AS host, (status = 'changed') AS chg
  FROM diff WHERE status IN ('changed', 'unchanged')
),
agg AS (
  SELECT host, count(*)::BIGINT AS n_eval,
         sum(CASE WHEN chg THEN 1 ELSE 0 END)::BIGINT AS n_changed
  FROM lab GROUP BY 1
),
x AS (
  SELECT host, n_eval, n_changed,
         ((n_changed * 1000000) // n_eval)::BIGINT AS change_ppm,
         (1000000 - (n_changed * 1000000) // n_eval)::BIGINT AS x1
  FROM agg
),
sq AS (
  SELECT *, ((x1 * x1) // 1000000)::BIGINT AS x2 FROM x
),
sq2 AS (
  SELECT *, ((x2 * x2) // 1000000)::BIGINT AS x4 FROM sq
),
sq3 AS (
  SELECT *, ((x4 * x4) // 1000000)::BIGINT AS x8 FROM sq2
)
SELECT host, n_eval, n_changed, change_ppm,
       (1000000 - x1)::BIGINT AS stale_ppm_k1,
       (1000000 - x2)::BIGINT AS stale_ppm_k2,
       (1000000 - x4)::BIGINT AS stale_ppm_k4,
       (1000000 - x8)::BIGINT AS stale_ppm_k8
FROM sq3
"""


def host_turnover(
    prev: DataFrame, curr: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Per-host page turnover between snapshots: (host, n_prev, n_curr,
    n_added, n_gone, n_kept, added_ppm, gone_ppm) — the URL-grain
    complement of :func:`host_freshness` (which rates content change on
    SURVIVING urls).  added_ppm = floor(1e6*added/n_curr) prices the
    host's discovery need; gone_ppm = floor(1e6*gone/n_prev) its decay;
    a parked-domain flip shows as both ≈ 1e6.

    Scale shape: identical to host_freshness — the digest join's status
    column partial-aggs at host grain; ratios are post-agg integer
    floors, NULL-guarded for hosts absent from one side."""
    diff = snapshot_diff(prev, curr)
    lab = with_host(diff.select("url", "status"))
    one = lambda s: F.sum(F.when(F.col("status") == s, 1).otherwise(0)).cast("long")  # noqa: E731
    agg = lab.groupBy("host").agg(
        one("added").alias("n_added"),
        one("gone").alias("n_gone"),
        (one("changed") + one("unchanged")).alias("n_kept"),
    )
    n_prev = (F.col("n_kept") + F.col("n_gone")).cast("long")
    n_curr = (F.col("n_kept") + F.col("n_added")).cast("long")
    return agg.select(
        "host",
        n_prev.alias("n_prev"),
        n_curr.alias("n_curr"),
        "n_added",
        "n_gone",
        "n_kept",
        F.when(n_curr > 0, F.expr("(n_added * 1000000) div (n_kept + n_added)"))
        .cast("long")
        .alias("added_ppm"),
        F.when(n_prev > 0, F.expr("(n_gone * 1000000) div (n_kept + n_gone)"))
        .cast("long")
        .alias("gone_ppm"),
    )


def duck_host_turnover_sql(prev: str, curr: str) -> str:
    """DuckDB twin of :func:`host_turnover`."""
    host = "lower(split_part(split_part(split_part(url, '://', 2), '/', 1), ':', 1))"
    return rf"""
WITH diff AS ({duck_snapshot_diff_sql(prev, curr)}),
lab AS (SELECT {host} AS host, status FROM diff),
agg AS (
  SELECT host,
         sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END)::BIGINT AS n_added,
         sum(CASE WHEN status = 'gone' THEN 1 ELSE 0 END)::BIGINT AS n_gone,
         sum(CASE WHEN status IN ('changed', 'unchanged')
             THEN 1 ELSE 0 END)::BIGINT AS n_kept
  FROM lab GROUP BY 1
)
SELECT host,
       (n_kept + n_gone)::BIGINT AS n_prev,
       (n_kept + n_added)::BIGINT AS n_curr,
       n_added, n_gone, n_kept,
       CASE WHEN n_kept + n_added > 0 THEN
         ((n_added * 1000000) // (n_kept + n_added))::BIGINT END AS added_ppm,
       CASE WHEN n_kept + n_gone > 0 THEN
         ((n_gone * 1000000) // (n_kept + n_gone))::BIGINT END AS gone_ppm
FROM agg
"""


REVISIT_TARGET_STALE_PPM = 200_000


def revisit_policy(
    prev: DataFrame,
    curr: DataFrame,
    target_stale_ppm: int = REVISIT_TARGET_STALE_PPM,
) -> DataFrame:
    """The planner DECISION on top of :func:`host_freshness`: per host,
    the LARGEST revisit multiplier k in {1,2,4,8} whose projected
    staleness stays within ``target_stale_ppm`` (cheapest schedule that
    meets the freshness SLA), the staleness it buys, and an ``sla_ok``
    flag — false means even revisit-every-period misses the target (the
    host needs sub-period polling or conditional GETs).

    Output: (host, n_eval, change_ppm, k_star, projected_stale_ppm,
    sla_ok).  Map-side CASE over the freshness relation — staleness is
    monotone in k, so the selection is a 4-arm conditional, no join."""
    f = host_freshness(prev, curr)
    t = F.lit(int(target_stale_ppm)).cast("long")
    k_star = (
        F.when(F.col("stale_ppm_k8") <= t, F.lit(8))
        .when(F.col("stale_ppm_k4") <= t, F.lit(4))
        .when(F.col("stale_ppm_k2") <= t, F.lit(2))
        .otherwise(F.lit(1))
        .cast("long")
    )
    projected = (
        F.when(F.col("stale_ppm_k8") <= t, F.col("stale_ppm_k8"))
        .when(F.col("stale_ppm_k4") <= t, F.col("stale_ppm_k4"))
        .when(F.col("stale_ppm_k2") <= t, F.col("stale_ppm_k2"))
        .otherwise(F.col("stale_ppm_k1"))
        .cast("long")
    )
    return f.select(
        "host",
        "n_eval",
        "change_ppm",
        k_star.alias("k_star"),
        projected.alias("projected_stale_ppm"),
        (F.col("stale_ppm_k1") <= t).alias("sla_ok"),
    )


def duck_revisit_policy_sql(
    prev: str, curr: str, target_stale_ppm: int = REVISIT_TARGET_STALE_PPM
) -> str:
    """DuckDB twin of :func:`revisit_policy` — composes the freshness
    oracle verbatim."""
    t = int(target_stale_ppm)
    return f"""
WITH f AS ({duck_host_freshness_sql(prev, curr)})
SELECT host, n_eval, change_ppm,
       (CASE WHEN stale_ppm_k8 <= {t} THEN 8
             WHEN stale_ppm_k4 <= {t} THEN 4
             WHEN stale_ppm_k2 <= {t} THEN 2
             ELSE 1 END)::BIGINT AS k_star,
       (CASE WHEN stale_ppm_k8 <= {t} THEN stale_ppm_k8
             WHEN stale_ppm_k4 <= {t} THEN stale_ppm_k4
             WHEN stale_ppm_k2 <= {t} THEN stale_ppm_k2
             ELSE stale_ppm_k1 END)::BIGINT AS projected_stale_ppm,
       (stale_ppm_k1 <= {t}) AS sla_ok
FROM f
"""
