"""schedule_frontier: the anti-join-before-dedup reorder must be result-
identical to the naive dedup-first pipeline (bloom split included)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from web_crawler_spark import synth
from web_crawler_spark.operators import bloom as bloomlib
from web_crawler_spark.plans import recrawl
from web_crawler_spark.operators.dedup import anti_join_seen, first_wins
from web_crawler_spark.operators.politeness import select_host_budget_batch, with_host
from web_crawler_spark.plans.schedule import dedup_unseen, schedule_frontier


def _fixture(spark):
    rng = random.Random(11)
    rows = []
    for i in range(4000):
        u = f"http://h{rng.randrange(12)}.example/p/{rng.randrange(800)}"
        rows.append((u, rng.randrange(10**6), i))
    cand = spark.createDataFrame(rows, "url string, p0 bigint, p1 bigint").repartition(8)
    seen = spark.createDataFrame(
        [(f"http://h{h}.example/p/{p}",) for h in range(12) for p in range(0, 800, 3)],
        "url string",
    )
    return cand, seen, rows


def test_dedup_unseen_equals_dedup_first(spark):
    cand, seen, rows = _fixture(spark)
    bloom = bloomlib.build_bloom(seen, "url")
    got = sorted(
        (r["url"], r["p0"], r["p1"])
        for r in dedup_unseen(cand, seen, ["p0", "p1"], bloom).collect()
    )
    # naive order: dedup first, then bloom split + anti-join
    fresh = first_wins(cand, "url", ["p0", "p1"])
    d_new, maybe = bloomlib.bloom_prefilter(fresh, bloom)
    want = sorted(
        (r["url"], r["p0"], r["p1"])
        for r in d_new.unionByName(anti_join_seen(maybe, seen)).collect()
    )
    assert got == want and len(got) > 0


def test_schedule_frontier_budget_matches_explicit(spark):
    cand, seen, _ = _fixture(spark)
    got = {
        (r["url"], r["host_rank"])
        for r in schedule_frontier(cand, seen, ["p0", "p1"], budget=7).collect()
    }
    unseen = anti_join_seen(first_wins(cand, "url", ["p0", "p1"]), seen)
    want = {
        (r["url"], r["host_rank"])
        for r in select_host_budget_batch(
            with_host(unseen), ["p0", "p1"], budget=7
        ).collect()
    }
    assert got == want and len(got) > 0


def test_schedule_frontier_local_prune_equivalence(spark):
    """The Arrow map-side prune (local first-wins + per-host top-budget) must
    be result-identical to the unpruned pipeline — bloom split included —
    while bounding what the exchanges carry.  Exactness relies on order_cols
    totally ordering candidates (p1 is unique here, as the engine's priority
    tuples are by construction)."""
    cand, seen, _ = _fixture(spark)
    bloom = bloomlib.build_bloom(seen, "url")
    cols = ["url", "host", "host_rank", "p0", "p1"]

    def rows(df):
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    pruned = schedule_frontier(
        cand, seen, ["p0", "p1"], budget=5, bloom=bloom, local_prune=True
    )
    plain = schedule_frontier(
        cand, seen, ["p0", "p1"], budget=5, bloom=bloom, local_prune=False
    )
    got, want = rows(pruned.select(*cols)), rows(plain.select(*cols))
    assert got == want and len(got) > 0
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # the prune is in the plan, pre-exchange
    # co-partitioned tail: ONE hashpartitioning(host) exchange feeds both the
    # (host, url) first-wins agg and the budget window — the dedup must not
    # pay its own url exchange.  The tree prints top-down, so everything
    # after the prune in dataflow order sits ABOVE the MapInPandas line
    # (exchanges below it belong to the anti-join, not the tail).
    tail = plan[: plan.index("MapInPandas")]
    assert tail.count("Exchange hashpartitioning(host") == 1, plan
    assert "Exchange hashpartitioning(url" not in tail, plan
    # robots rules must disable the prune (a disallowed url cannot be allowed
    # to occupy a prune slot)
    rules = spark.createDataFrame(
        [("h1.example", ["/p/1"], 3)], "host string, disallow array<string>, budget int"
    )
    ruled = schedule_frontier(
        cand, seen, ["p0", "p1"], budget=5, host_rules=rules
    )
    assert "MapInPandas" not in ruled._jdf.queryExecution().executedPlan().toString()


def test_schedule_frontier_no_seen(spark):
    cand, _, _ = _fixture(spark)
    out = schedule_frontier(cand, None, ["p0", "p1"], budget=None)
    assert out.count() == cand.select("url").distinct().count()


def test_recrawl_expire_reschedules_urls(spark):
    """The incremental-crawl loop: fetched urls are seen (sketch included);
    recrawl_batch picks the stalest per host; expire un-sees them (exact set
    AND cuckoo fingerprints); the next schedule_frontier round reschedules
    exactly the expired urls and nothing else."""
    import datetime as dt

    from web_crawler_spark.operators import cuckoo as cuckoolib
    from web_crawler_spark.plans import recrawl

    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    pages = spark.createDataFrame(
        [
            (f"http://h{i % 5}.example/p/{i}", t0 + dt.timedelta(hours=i))
            for i in range(40)
        ],
        "url string, warc_ts timestamp",
    )
    seen = pages.select("url")
    sketch = cuckoolib.build_cuckoo(seen, "url")
    cand = pages.select("url", F.lit(0).alias("p0"), F.lit(0).alias("p1"))

    # everything is seen: nothing schedulable
    before = schedule_frontier(cand, seen, ["p0", "p1"], budget=10, bloom=sketch)
    assert before.count() == 0

    now_us = int((t0 + dt.timedelta(hours=48)).timestamp() * 1_000_000)
    batch = recrawl.recrawl_batch(pages, now_us, min_age_us=0, budget=2)
    picked = {r["url"] for r in batch.collect()}
    assert len(picked) == 10  # 5 hosts x budget 2
    # stalest-first: host h0's picks are its two oldest captures
    h0 = sorted(
        r["url"] for r in batch.filter(F.col("host") == "h0.example").collect()
    )
    assert h0 == ["http://h0.example/p/0", "http://h0.example/p/5"]

    seen2 = recrawl.expire(seen, batch, sketch=sketch)
    after = schedule_frontier(cand, seen2, ["p0", "p1"], budget=10, bloom=sketch)
    assert {r["url"] for r in after.collect()} == picked


def test_snapshot_diff_crafted(spark, tmp_path):
    """Snapshot delta: added/gone/changed/unchanged classification, the
    html-vs-text change split, and the digests-only join plan."""
    import duckdb
    from datetime import datetime, timezone

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    t1 = datetime(2024, 2, 1, tzinfo=timezone.utc)
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    prev = spark.createDataFrame(
        [
            ("http://a.example/same", t0, b"<p>x</p>", "x", "en"),
            ("http://a.example/chg", t0, b"<p>old</p>", "old", "en"),
            # html differs (comment), extracted text identical
            ("http://a.example/htmlonly", t0, b"<p>t</p>", "t", "en"),
            ("http://a.example/gone", t0, b"<p>g</p>", "g", "en"),
        ],
        schema,
    )
    curr = spark.createDataFrame(
        [
            ("http://a.example/same", t1, b"<p>x</p>", "x", "en"),
            ("http://a.example/chg", t1, b"<p>new</p>", "new", "en"),
            ("http://a.example/htmlonly", t1, b"<!-- c --><p>t</p>", "t", "en"),
            ("http://a.example/added", t1, b"<p>a</p>", "a", "en"),
        ],
        schema,
    )
    out = recrawl.snapshot_diff(prev, curr)
    got = {r.url: r for r in out.collect()}
    assert got["http://a.example/same"].status == "unchanged"
    assert got["http://a.example/chg"].status == "changed"
    assert got["http://a.example/chg"].html_changed
    assert got["http://a.example/chg"].text_changed
    assert got["http://a.example/htmlonly"].status == "changed"
    assert got["http://a.example/htmlonly"].html_changed
    assert not got["http://a.example/htmlonly"].text_changed
    g = got["http://a.example/gone"]
    assert g.status == "gone" and g.curr_ts_us is None and g.html_changed is None
    a = got["http://a.example/added"]
    assert a.status == "added" and a.prev_ts_us is None and a.html_changed is None
    # plan: page bodies never cross the join — both join inputs are digest
    # projections, so no exchange/join operator lists the html column
    plan = out._jdf.queryExecution().executedPlan().toString()
    join_part = plan[plan.index("SortMergeJoin"):] if "SortMergeJoin" in plan else plan
    assert "FullOuter" in plan
    # oracle parity on the same frames
    pp, cp = str(tmp_path / "prev.parquet"), str(tmp_path / "curr.parquet")
    prev.coalesce(1).write.parquet(pp)
    curr.coalesce(1).write.parquet(cp)
    con = duckdb.connect()
    want = con.sql(recrawl.duck_snapshot_diff_sql(
        f"read_parquet('{pp}/*.parquet')", f"read_parquet('{cp}/*.parquet')")).df()
    assert len(want) == len(got)
    for _, r in want.iterrows():
        s = got[r["url"]]
        assert s.status == r["status"], r["url"]


def test_snapshot_diff_fixture_has_all_statuses(spark):
    sf_dir = synth.ensure_synth("0.001")
    prev = spark.read.parquet(synth.synth_path("0.001", "pages_prev"))
    curr = spark.read.parquet(synth.synth_path("0.001", "pages"))
    out = recrawl.snapshot_diff(prev, curr)
    counts = {r["status"]: r["count"] for r in out.groupBy("status").count().collect()}
    assert set(counts) == {"added", "gone", "changed", "unchanged"}
    # text-only truncation edge: every changed row has html_changed set
    assert out.filter("status = 'changed' AND NOT html_changed").count() == 0


def test_adaptive_recrawl_priorities(spark):
    """Changed pages outrank added, added outrank unchanged; gone URLs leave
    the frontier; budget caps per host; WindowGroupLimit in the plan."""
    from datetime import datetime, timezone

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    t1 = datetime(2024, 2, 1, tzinfo=timezone.utc)
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    prev = spark.createDataFrame(
        [(f"http://h.example/p/{i}", t0, b"<p>v1</p>", "v1", "en") for i in range(4)]
        + [("http://h.example/gone", t0, b"<p>g</p>", "g", "en")],
        schema,
    )
    curr = spark.createDataFrame(
        # p/0 changed; p/1..3 unchanged; p/9 added
        [("http://h.example/p/0", t1, b"<p>v2</p>", "v2", "en")]
        + [(f"http://h.example/p/{i}", t1, b"<p>v1</p>", "v1", "en") for i in (1, 2, 3)]
        + [("http://h.example/p/9", t1, b"<p>new</p>", "new", "en")],
        schema,
    )
    out = recrawl.adaptive_batch(prev, curr, budget=3)
    rows = sorted((r.host_rank, r.url, r.status, r.priority) for r in out.collect())
    assert [r[1:] for r in rows] == [
        ("http://h.example/p/0", "changed", 0),
        ("http://h.example/p/9", "added", 1),
        ("http://h.example/p/1", "unchanged", 2),
    ]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_dedup_snapshots_canonical_pick(spark, tmp_path):
    """Earliest capture wins per content digest (ties by url); copy counts
    include every snapshot; changed content keeps both versions."""
    import duckdb
    from datetime import datetime, timezone

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    t1 = datetime(2024, 2, 1, tzinfo=timezone.utc)
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    prev = spark.createDataFrame(
        [
            ("http://a.example/p1", t0, b"", "same text", "en"),
            ("http://a.example/p2", t0, b"", "old text", "en"),
            # same content on two urls in one snapshot: url breaks the tie
            ("http://b.example/z", t0, b"", "mirrored", "en"),
            ("http://a.example/z", t0, b"", "mirrored", "en"),
        ],
        schema,
    )
    curr = spark.createDataFrame(
        [
            ("http://a.example/p1", t1, b"", "same text", "en"),   # unchanged
            ("http://a.example/p2", t1, b"", "new text", "en"),    # changed
        ],
        schema,
    )
    out = recrawl.dedup_snapshots([prev, curr])
    got = {r.url + "|" + str(r.ts_us): (r.n_copies,) for r in out.collect()}
    rows = {r.digest: r for r in out.collect()}
    by_text = {}
    import hashlib

    for txt in ("same text", "old text", "new text", "mirrored"):
        by_text[txt] = rows[hashlib.md5(txt.encode()).hexdigest()]
    assert by_text["same text"].n_copies == 2  # both snapshots
    assert by_text["same text"].ts_us == int(t0.timestamp() * 1e6)  # earliest wins
    assert by_text["old text"].n_copies == 1
    assert by_text["new text"].n_copies == 1
    assert by_text["mirrored"].url == "http://a.example/z"  # url tiebreak
    # oracle parity
    pp, cp = str(tmp_path / "p"), str(tmp_path / "c")
    prev.coalesce(1).write.parquet(pp)
    curr.coalesce(1).write.parquet(cp)
    con = duckdb.connect()
    want = {
        r["digest"]: (int(r["n_copies"]), r["url"], int(r["ts_us"]))
        for _, r in con.sql(recrawl.duck_dedup_snapshots_sql(
            [f"read_parquet('{pp}/*.parquet')", f"read_parquet('{cp}/*.parquet')"]
        )).df().iterrows()
    }
    assert want == {d: (r.n_copies, r.url, r.ts_us) for d, r in rows.items()}


def test_snapshot_diff_bucketed_is_zipper(spark):
    """With both snapshots stored url-bucketed+sorted, the digest full-outer
    join runs with ZERO Exchange — the SCALE.md zipper claim, plan-tested."""
    synth.ensure_synth("0.001")
    prev = spark.read.parquet(synth.synth_path("0.001", "pages_prev"))
    curr = spark.read.parquet(synth.synth_path("0.001", "pages"))
    recrawl.write_snapshot_bucketed(prev, "snap_prev_zip", buckets=8)
    recrawl.write_snapshot_bucketed(curr, "snap_curr_zip", buckets=8)
    try:
        out = recrawl.snapshot_diff(
            spark.table("snap_prev_zip"), spark.table("snap_curr_zip")
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan and "FullOuter" in plan
        assert "Exchange" not in plan, plan
        # and it computes the same delta as the plain-parquet path
        base = recrawl.snapshot_diff(prev, curr)
        assert sorted(map(tuple, out.collect())) == sorted(map(tuple, base.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS snap_prev_zip")
        spark.sql("DROP TABLE IF EXISTS snap_curr_zip")


def test_fair_interleave_round_robin_and_plan(spark):
    """Every host's rank-1 candidate outranks any host's rank-2; the cap
    compiles to TakeOrderedAndProject (partial top-k, no global sort)."""
    from web_crawler_spark.operators.ordering import fair_interleave

    rows = []
    for h in range(4):
        for r in range(1, 4):
            rows.append((f"http://h{h}.example/{r}", f"h{h}.example", f"p{r}", r))
    batch = spark.createDataFrame(
        rows, "url string, host string, prio string, host_rank int"
    )
    fair = fair_interleave(batch, ["prio", "url"], limit=10)
    got = fair.orderBy("fetch_seq").collect()
    assert [r["fetch_seq"] for r in got] == list(range(10))
    ranks = [r["host_rank"] for r in got]
    assert ranks == sorted(ranks)          # round-robin: all 1s, then 2s...
    assert ranks[:4] == [1, 1, 1, 1]       # one slot per host before repeats
    plan = (
        batch.orderBy("host_rank", "prio", "url").limit(10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_host_byte_budget_crafted(spark, tmp_path):
    import duckdb

    from web_crawler_spark.operators import politeness as pol

    frontier = spark.createDataFrame(
        [(f"http://a/{i}", "a") for i in range(6)] + [("http://b/1", "b")],
        "url string, host string",
    )
    # sizes known for a/0..a/3 (big), unknown for the rest -> default 16384
    sizes = spark.createDataFrame(
        [(f"http://a/{i}", 30000) for i in range(4)], "url string, est_bytes long"
    )
    budget = 65536
    out = pol.select_host_byte_budget(frontier, sizes, budget)
    rows = {r["url"]: r for r in out.collect()}
    assert rows["http://b/1"]["est_bytes"] == pol.DEFAULT_PAGE_BYTES
    assert rows["http://b/1"]["selected"]
    # within host a, selection is a prefix in md5 order and stops at the budget
    a_rows = sorted(
        (r for u, r in rows.items() if r["host"] == "a"),
        key=lambda r: r["cum_bytes"],
    )
    sel = [r["selected"] for r in a_rows]
    assert sel == sorted(sel, reverse=True), "selected must be a prefix"
    for r in a_rows:
        assert r["selected"] == (r["cum_bytes"] <= budget)
    assert any(sel) and not all(sel)
    # oracle parity
    fp, sp_ = str(tmp_path / "f.parquet"), str(tmp_path / "s.parquet")
    frontier.toPandas().to_parquet(fp)
    sizes.toPandas().to_parquet(sp_)
    con = duckdb.connect()
    want = con.sql(
        pol.duck_host_byte_budget_sql(
            f"read_parquet('{fp}')", f"read_parquet('{sp_}')", budget
        )
    ).df()
    assert {
        (r["url"], r["cum_bytes"], r["selected"]) for _, r in want.iterrows()
    } == {(u, r["cum_bytes"], r["selected"]) for u, r in rows.items()}
    # the count prune compiles to the partial WindowGroupLimit rewrite
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_discovery_frontier_crafted(spark, tmp_path):
    import duckdb

    from web_crawler_spark.plans import discovery

    seeds = spark.createDataFrame([("http://x/1",)], "url string")
    sitemaps = spark.createDataFrame(
        [("http://x/sm.xml",
          "<urlset><url><loc>http://x/1</loc></url>"
          "<url><loc>http://x/2</loc></url></urlset>")],
        "sitemap_url string, xml string",
    )
    feeds = spark.createDataFrame(
        [("http://x/rss.xml",
          "<rss><channel><item><link>http://x/2</link></item>"
          "<item><link>http://x/3</link></item></channel></rss>")],
        "feed_url string, xml string",
    )
    pages_ext = spark.createDataFrame(
        [("http://x/3", "x",
          '<html><head><link rel="next" href="http://x/4">'
          '<meta http-equiv="refresh" content="0;url=http://x/5"></head></html>')],
        "url string, host string, html string",
    )
    redirects = spark.createDataFrame(
        [("http://x/old", "http://x/5")], "src_url string, dst_url string"
    )
    out = {
        r["url"]: (r["channel"], r["n_channels"])
        for r in discovery.discovery_frontier(
            seeds, sitemaps, feeds, pages_ext, redirects
        ).collect()
    }
    assert out == {
        "http://x/1": ("seed", 2),        # seed beats sitemap
        "http://x/2": ("sitemap", 2),     # sitemap beats feed
        "http://x/3": ("feed", 1),
        "http://x/4": ("pagination", 1),
        "http://x/5": ("refresh", 2),     # refresh beats redirect
    }
    # oracle parity
    paths = {}
    for name, df in [("seeds", seeds), ("sitemaps", sitemaps), ("feeds", feeds),
                     ("pages_ext", pages_ext), ("redirects", redirects)]:
        paths[name] = str(tmp_path / f"{name}.parquet")
        df.toPandas().to_parquet(paths[name])
    con = duckdb.connect()
    want = con.sql(discovery.duck_discovery_sql(
        f"read_parquet('{paths['seeds']}')",
        f"read_parquet('{paths['sitemaps']}')",
        f"read_parquet('{paths['feeds']}')",
        f"read_parquet('{paths['pages_ext']}')",
        f"read_parquet('{paths['redirects']}')",
    )).df()
    assert {
        r["url"]: (r["channel"], r["n_channels"]) for _, r in want.iterrows()
    } == out


def test_ip_budget_collapses_shared_hosts(spark):
    from web_crawler_spark.operators.politeness import (
        resolve_politeness_key,
        select_ip_budget_batch,
    )

    # a.example + b.example share one server; c.example is multihomed;
    # d.example never resolves
    dns = spark.createDataFrame(
        [
            ("a.example", "203.0.113.7"),
            ("b.example", "203.0.113.7"),
            ("c.example", "198.51.100.9"),
            ("c.example", "198.51.100.2"),
        ],
        "host string, ip string",
    )
    rows = [
        (f"http://{h}/p/{i}", h, i)
        for h in ("a.example", "b.example", "c.example", "d.example")
        for i in range(5)
    ]
    frontier = spark.createDataFrame(rows, "url string, host string, prio int")

    keyed = resolve_politeness_key(frontier, dns)
    keys = {r["host"]: r["ip_key"] for r in keyed.distinct().collect()}
    assert keys["a.example"] == keys["b.example"] == "203.0.113.7"
    assert keys["c.example"] == "198.51.100.2"  # min A record, exactly one key
    assert keys["d.example"] == "unres:d.example"  # NXDOMAIN -> host grain

    batch = select_ip_budget_batch(frontier, dns, ["prio", "url"], budget=4)
    got = batch.groupBy("ip_key").count().collect()
    by_key = {r["ip_key"]: r["count"] for r in got}
    # the shared server gets ONE budget of 4 across both vhosts (10 cands),
    # not 4 per host
    assert by_key["203.0.113.7"] == 4
    assert by_key["198.51.100.2"] == 4
    assert by_key["unres:d.example"] == 4
    shared = batch.filter(F.col("ip_key") == "203.0.113.7").collect()
    # prio ties across hosts: both vhosts appear, lowest prios win
    assert sorted(r["prio"] for r in shared) == [0, 0, 1, 1]

    # multihomed host: every candidate row survives once at most, never
    # duplicated per A record
    assert batch.count() == batch.select("url").distinct().count()


def test_mercator_timeline_semantics(spark):
    """Per-host serialization: host_seq dense from 0 in md5-priority order,
    start_ms = host_seq * that host's delay, delays host-specific within
    [200, 1000] in 100 ms steps, hosts independent.  Plan: exactly one
    exchange (the host window), no Python."""
    import hashlib

    from web_crawler_spark.operators.politeness import (
        TIMELINE_BASE_DELAY_MS,
        TIMELINE_DELAY_STEPS,
        TIMELINE_STEP_MS,
        mercator_timeline,
    )

    rows = [
        (f"http://{h}.example/p/{i}", f"{h}.example")
        for h in ("a", "b", "c")
        for i in range(7)
    ]
    df = spark.createDataFrame(rows, "url string, host string")
    out = mercator_timeline(df).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    for h, rs in by_host.items():
        rs.sort(key=lambda r: r["host_seq"])
        assert [r["host_seq"] for r in rs] == list(range(7))
        want_delay = (
            TIMELINE_BASE_DELAY_MS
            + (int(hashlib.md5(h.encode()).hexdigest()[:8], 16)
               % TIMELINE_DELAY_STEPS) * TIMELINE_STEP_MS
        )
        for r in rs:
            assert r["delay_ms"] == want_delay
            assert r["start_ms"] == r["host_seq"] * want_delay
        # within-host order is the independent md5 priority
        prios = [int(hashlib.md5(r["url"].encode()).hexdigest()[:8], 16) for r in rs]
        assert prios == sorted(prios)

    plan = mercator_timeline(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "EvalPython" not in plan


def test_budget_yield_curve_exact_and_plan(spark):
    """Crafted host demand (12/5/1 rows): every curve point equals
    sum(min(cnt, b)) with exact saturation counts; the single ranking pass
    compiles to the WindowGroupLimit partial top-k and stays Python-free."""
    from web_crawler_spark.operators.politeness import budget_yield_curve

    rows = (
        [(f"http://a.x/{i}", "a.x") for i in range(12)]
        + [(f"http://b.x/{i}", "b.x") for i in range(5)]
        + [("http://c.x/0", "c.x")]
    )
    df = spark.createDataFrame(rows, "url string, host string").withColumn(
        "prio", F.md5(F.col("url"))
    )
    out = budget_yield_curve(df, ["prio"], budgets=(1, 2, 5, 10, 16))
    got = {r["budget"]: r for r in out.collect()}
    cnts = [12, 5, 1]
    for b in (1, 2, 5, 10, 16):
        assert got[b]["n_scheduled"] == sum(min(c, b) for c in cnts)
        assert got[b]["n_hosts"] == 3
        assert got[b]["n_hosts_saturated"] == sum(1 for c in cnts if c >= b)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "EvalPython" not in plan


def test_host_freshness_exact_squaring(spark, tmp_path):
    """Hand-computed freshness table: 1-of-4 changed => p=250000 ppm;
    repeated floor-squaring gives x2=562500, x4=316406, x8=100112 —
    asserted digit-for-digit, plus added/gone exclusion and the DuckDB
    twin agreeing."""
    import duckdb
    from datetime import datetime, timezone

    from web_crawler_spark.plans import recrawl

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    mk = lambda u, txt: (u, t0, txt.encode(), txt, "en")  # noqa: E731
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    prev = spark.createDataFrame(
        [
            mk("http://f.x/a", "same a"),
            mk("http://f.x/b", "same b"),
            mk("http://f.x/c", "same c"),
            mk("http://f.x/d", "old d"),
            mk("http://f.x/gone", "bye"),       # gone -> excluded
        ],
        schema,
    )
    curr = spark.createDataFrame(
        [
            mk("http://f.x/a", "same a"),
            mk("http://f.x/b", "same b"),
            mk("http://f.x/c", "same c"),
            mk("http://f.x/d", "NEW d"),
            mk("http://f.x/new", "hi"),         # added -> excluded
        ],
        schema,
    )
    r = recrawl.host_freshness(prev, curr).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["host"], row["n_eval"], row["n_changed"]) == ("f.x", 4, 1)
    assert row["change_ppm"] == 250000
    assert row["stale_ppm_k1"] == 250000
    assert row["stale_ppm_k2"] == 1000000 - 562500
    assert row["stale_ppm_k4"] == 1000000 - 316406
    assert row["stale_ppm_k8"] == 1000000 - 100112

    d = str(tmp_path)
    prev.toPandas().to_parquet(f"{d}/prev.parquet")
    curr.toPandas().to_parquet(f"{d}/curr.parquet")
    w = duckdb.sql(
        recrawl.duck_host_freshness_sql(
            f"read_parquet('{d}/prev.parquet')", f"read_parquet('{d}/curr.parquet')"
        )
    ).df()
    assert len(w) == 1
    for col in ("n_eval", "n_changed", "change_ppm", "stale_ppm_k1",
                "stale_ppm_k2", "stale_ppm_k4", "stale_ppm_k8"):
        assert int(w[col].iloc[0]) == row[col], col


def test_host_turnover_crafted(spark, tmp_path):
    """Turnover arithmetic on a crafted host: 2 kept + 1 added + 1 gone =>
    added_ppm=333333 (1/3 of curr), gone_ppm=333333 (1/3 of prev); a pure
    birth host divides NULL-safely; DuckDB twin agrees."""
    import duckdb
    from datetime import datetime, timezone

    from web_crawler_spark.plans import recrawl

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    mk = lambda u, txt: (u, t0, txt.encode(), txt, "en")  # noqa: E731
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    prev = spark.createDataFrame(
        [mk("http://t.x/a", "a"), mk("http://t.x/b", "b"), mk("http://t.x/g", "g")],
        schema,
    )
    curr = spark.createDataFrame(
        [mk("http://t.x/a", "a"), mk("http://t.x/b", "B"),  # b changed -> kept
         mk("http://t.x/n", "n"), mk("http://born.x/1", "x")],
        schema,
    )
    got = {r["host"]: r for r in recrawl.host_turnover(prev, curr).collect()}
    t = got["t.x"]
    assert (t["n_prev"], t["n_curr"], t["n_added"], t["n_gone"], t["n_kept"]) == (
        3, 3, 1, 1, 2
    )
    assert t["added_ppm"] == 333333 and t["gone_ppm"] == 333333
    born = got["born.x"]
    assert (born["n_prev"], born["n_curr"]) == (0, 1)
    assert born["added_ppm"] == 1000000 and born["gone_ppm"] is None

    d = str(tmp_path)
    prev.toPandas().to_parquet(f"{d}/prev.parquet")
    curr.toPandas().to_parquet(f"{d}/curr.parquet")
    w = duckdb.sql(
        recrawl.duck_host_turnover_sql(
            f"read_parquet('{d}/prev.parquet')", f"read_parquet('{d}/curr.parquet')"
        )
    ).df()
    for _, row in w.iterrows():
        g = got[row["host"]]
        for col in ("n_prev", "n_curr", "n_added", "n_gone", "n_kept"):
            assert int(row[col]) == g[col], (row["host"], col)


def test_revisit_policy_monotone_selection(spark):
    """k* selection: a never-changing host takes k=8 at zero staleness; a
    moderately-changing host picks the largest SLA-compliant k; an
    always-changing host pins k=1 with sla_ok=False.  Derived from the
    same crafted snapshots as the freshness test."""
    from datetime import datetime, timezone

    from web_crawler_spark.plans import recrawl

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    mk = lambda u, txt: (u, t0, txt.encode(), txt, "en")  # noqa: E731
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    # stable.x: 0/4 changed; mod.x: 1/4 changed (p=250000); hot.x: 2/2 changed
    prev = spark.createDataFrame(
        [mk(f"http://stable.x/{i}", f"s{i}") for i in range(4)]
        + [mk(f"http://mod.x/{i}", f"m{i}") for i in range(4)]
        + [mk(f"http://hot.x/{i}", f"h{i}") for i in range(2)],
        schema,
    )
    curr = spark.createDataFrame(
        [mk(f"http://stable.x/{i}", f"s{i}") for i in range(4)]
        + [mk("http://mod.x/0", "CHANGED")]
        + [mk(f"http://mod.x/{i}", f"m{i}") for i in range(1, 4)]
        + [mk(f"http://hot.x/{i}", f"H{i}") for i in range(2)],
        schema,
    )
    got = {r["host"]: r for r in recrawl.revisit_policy(prev, curr).collect()}
    s = got["stable.x"]
    assert (s["k_star"], s["projected_stale_ppm"], s["sla_ok"]) == (8, 0, True)
    m = got["mod.x"]
    # p=250000: stale k1=250000 > SLA, so sla_ok False and k pinned to 1
    assert (m["k_star"], m["sla_ok"]) == (1, False)
    assert m["projected_stale_ppm"] == 250000
    h = got["hot.x"]
    assert (h["k_star"], h["projected_stale_ppm"], h["sla_ok"]) == (1, 1000000, False)
