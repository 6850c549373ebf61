"""Physical-plan shape guards — the scale properties SURVEY.md §4 commits to:

* column pruning keeps ``html BINARY`` out of scheduling-side scans;
* the fetch join broadcasts the (small) frontier batch, never shuffling pages;
* first-wins dedup is a partial-aggregated hash agg, not a global window;
* the politeness selector is the two-pass salted window design;
* no plan anywhere contains BatchEvalPython (row-at-a-time Python) —
  Arrow-vectorized Python only (SURVEY.md §7 hard-part 5).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from web_crawler_spark import synth
from web_crawler_spark.operators.dedup import first_wins
from web_crawler_spark.operators.politeness import select_host_budget_batch, with_host


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scheduling_scan_prunes_html(spark, sf_small):
    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    sched = pages.select("url").filter(F.col("url").startswith("http://host0"))
    plan = _plan(sched)
    assert "html" not in plan, "scheduling scan must never read the binary column"
    assert "PushedFilters: [IsNotNull(url), StringStartsWith(url" in plan


def test_fetch_join_broadcasts_batch(spark, sf_small):
    from web_crawler_spark.plans.crawl import ChainCrawl, CrawlConfig

    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    batch = spark.createDataFrame(
        [("http://host0.example/p/1", 0)], "url string, pos bigint"
    )
    matched = pages.select("url", "html").join(F.broadcast(batch), "url", "inner")
    plan = _plan(matched)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_first_wins_is_partial_hash_agg(spark):
    df = spark.createDataFrame(
        [("u1", 1, 2), ("u1", 0, 5), ("u2", 3, 1)], "url string, p0 bigint, p1 bigint"
    )
    plan = _plan(first_wins(df, "url", ["p0", "p1"]))
    # struct-min compiles to SortAggregate (structs have no mutable hash
    # buffer), but the scale properties hold: map-side partial aggregation
    # and exactly one shuffle on the key — and never a global window.
    assert "partial_min" in plan
    assert plan.count("Exchange") == 1
    assert "Window" not in plan


def test_politeness_default_uses_partial_group_limit(spark):
    """Default path: one window whose rank filter compiles to a partial
    per-input-partition top-k BEFORE the shuffle (the skew defense)."""
    df = with_host(
        spark.createDataFrame(
            [(f"http://h{i%3}.example/{i}", 0, 0, i, 0) for i in range(20)],
            "url string, attempt int, depth int, p0 bigint, p1 bigint",
        )
    )
    plan = _plan(
        select_host_budget_batch(df, ["attempt", "depth", "p0", "p1"], budget=2)
    )
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert plan.count("Exchange") == 1  # exactly one shuffle


def test_politeness_salted_is_two_pass(spark):
    df = with_host(
        spark.createDataFrame(
            [(f"http://h{i%3}.example/{i}", 0, 0, i, 0) for i in range(20)],
            "url string, attempt int, depth int, p0 bigint, p1 bigint",
        )
    )
    plan = _plan(
        select_host_budget_batch(
            df, ["attempt", "depth", "p0", "p1"], budget=2, salt_buckets=8
        )
    )
    assert "Window [" in plan and plan.count("Exchange") == 2  # salted + exact


def test_dedup_lines_prunes_before_exchange(spark, sf_small):
    """Corpus line dedup: the rn=1 filter must compile to WindowGroupLimit
    with a Partial mode below the line-hash exchange (one candidate per key
    per map partition — the defense against boilerplate-heavy corpora), and
    the whole plan must stay JVM-side."""
    from web_crawler_spark import synth
    from web_crawler_spark.functions import webtext

    wd = spark.read.parquet(synth.synth_path("0.001", "webdocs"))
    plan = _plan(webtext.dedup_corpus_lines(wd))
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan[plan.index("WindowGroupLimit"):]
    assert "EvalPython" not in plan


def test_gopher_quality_is_one_mapside_stage(spark, sf_small):
    """The Gopher gate must compile to a single shuffle-free JVM projection:
    no Exchange, no explode-driven Generate, no Python — the plan that scales
    as a pure map over a 100 TB corpus."""
    from web_crawler_spark import synth
    from web_crawler_spark.functions import webtext

    wd = spark.read.parquet(synth.synth_path("0.001", "webdocs"))
    plan = _plan(webtext.gopher_quality(wd))
    assert "Exchange" not in plan
    assert "Generate" not in plan
    assert "EvalPython" not in plan


def test_no_row_at_a_time_python_in_contract_queries(spark, sf_small):
    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.001"
    for name, fn in entrymod.queries().items():
        if name in ("crawl_fetch_log", "crawl_stats"):
            continue  # materialized via the round loop; parse/canon plans
            # are covered by their own queries
        plan = _plan(fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan, f"{name} uses row-at-a-time Python"


def test_bucketed_pages_join_shuffles_only_the_batch(spark, sf_small, tmp_path):
    """With a url-bucketed pages table, the fetch join must not exchange the
    pages side — only the frontier batch redistributes into the bucket
    layout (the beyond-broadcast scale strategy)."""
    from web_crawler_spark import synth
    from web_crawler_spark.sources import pages as pages_src

    import shutil

    spark.sql("CREATE DATABASE IF NOT EXISTS wcs_test")
    spark.sql("DROP TABLE IF EXISTS wcs_test.pages_bucketed")
    # the in-memory catalog forgets tables across sessions but the warehouse
    # dir persists — clear it so reruns don't hit LOCATION_ALREADY_EXISTS
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(wh, "wcs_test.db", "pages_bucketed"), ignore_errors=True)
    pages = spark.read.parquet(synth.synth_path("0.001", "pages")).select("url", "html")
    pages_src.write_bucketed_pages(pages, "wcs_test.pages_bucketed", buckets=8)
    bucketed = pages_src.read_bucketed_pages(spark, "wcs_test.pages_bucketed")

    batch = spark.range(500).select(
        F.concat(F.lit("http://host0.example/p/"), F.col("id").cast("string")).alias("url")
    ).hint("shuffle_merge")  # force SMJ so the bucketed-scan property is visible
    joined = bucketed.join(batch, "url", "inner")
    plan = _plan(joined)
    # exactly one exchange: the batch side; the bucketed scan provides its own
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" in plan


def test_bucketed_seen_anti_join_shuffles_only_candidates(spark, sf_small, tmp_path):
    """With a url-bucketed url_seen table, the per-round exact anti-join must
    not exchange the seen side — at 10^10 seen urls re-shuffling the seen set
    every round would dominate the crawl; bucketing moves only the
    (bloom-thinned) candidate side."""
    import shutil

    from web_crawler_spark import synth
    from web_crawler_spark.operators import dedup as dedup_ops

    spark.sql("CREATE DATABASE IF NOT EXISTS wcs_test")
    spark.sql("DROP TABLE IF EXISTS wcs_test.seen_bucketed")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(wh, "wcs_test.db", "seen_bucketed"), ignore_errors=True)
    seen = spark.read.parquet(synth.synth_path("0.001", "pages")).select("url")
    dedup_ops.write_bucketed_seen(seen, "wcs_test.seen_bucketed", buckets=8)
    bucketed = dedup_ops.read_bucketed_seen(spark, "wcs_test.seen_bucketed")

    cand = spark.range(2000).select(
        F.concat(F.lit("http://host0.example/p/"), F.col("id").cast("string")).alias("url")
    ).hint("shuffle_merge")
    unseen = dedup_ops.anti_join_seen(cand, bucketed)
    plan = _plan(unseen)
    assert plan.count("Exchange hashpartitioning") == 1  # candidates only
    assert "SortMergeJoin" in plan and "LeftAnti" in plan
    assert "SelectedBucketsCount" in plan  # the seen scan provides its layout
    # semantics unchanged vs a plain-parquet seen
    want = dedup_ops.anti_join_seen(cand, seen).count()
    assert unseen.count() == want


def test_scale_loop_seen_anti_join_moves_only_candidates(spark, sf_small):
    """Through the ROUND LOOP, not just the standalone operator: with the
    bucketed-delta seen store (the scale-mode default), every round's exact
    anti-join reads the seen side's bucket layout — only the candidate side
    exchanges — and the first-wins dedup REUSES the join's url partitioning
    (no second exchange).  Also: the pages fetch join executes once per
    round (the miss anti-join reads the materialized matched frame, never
    re-running the pages join)."""
    from web_crawler_spark.plans.crawl import ChainCrawl, CrawlConfig

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
        seeds = spark.read.parquet(synth.synth_path("0.001", "seeds"))
        cfg = CrawlConfig(
            rounds=3, mode="scale", host_budget=20, use_bloom=False,
            capture_plans=True, seen_buckets=8,
        )
        eng = ChainCrawl(spark, pages, cfg)
        try:
            eng.run(seeds)
            dedup_plans = [
                p["dedup"] for _, p in sorted(eng.debug_plans.items()) if "dedup" in p
            ]
            assert dedup_plans, "no dedup plans captured"
            import re

            for plan in dedup_plans:
                assert "SelectedBucketsCount" in plan  # seen: bucketed scan
                assert "SortMergeJoin" in plan and "LeftAnti" in plan
                # the seen side moves ZERO rows: no attribute produced by the
                # bucketed seen scan ever feeds an exchange (the plan string
                # embeds the cached parse plan, so property > raw counts)
                seen_ids = set()
                for line in plan.splitlines():
                    if "SelectedBucketsCount" in line:
                        seen_ids.update(re.findall(r"#(\d+)", line))
                assert seen_ids
                exchanged = set()
                for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
                    exchanged.update(re.findall(r"#(\d+)", m.group(1)))
                assert not (seen_ids & exchanged), "seen side was exchanged"
                # and the first-wins dedup reuses the join's partitioning:
                # no exchange between the aggregate and the anti-join below it
                agg_i = plan.index("partial_min")
                smj_i = plan.index("SortMergeJoin")
                assert agg_i < smj_i  # aggregate sits directly above the join
                assert "Exchange" not in plan[agg_i:smj_i]
            fetch_plans = [
                p["fetched"] for _, p in sorted(eng.debug_plans.items()) if "fetched" in p
            ]
            assert fetch_plans
            for plan in fetch_plans:
                # the pages join itself ran once behind the checkpoint: the
                # consuming plan scans its RDD and joins only for the misses
                assert "ExistingRDD" in plan
                assert "InMemoryTableScan" not in plan and "FileScan" not in plan
        finally:
            eng.close()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_tpch_plans_scale_shapes(spark):
    """The relational-analytics queries keep the shapes that survive 100x:
    top-N compiles to TakeOrderedAndProject, the 6-table join broadcasts
    its true dims, and the pricing rollup pushes its date filter to the
    scan."""
    import __spark_entry__ as e

    sf_dir = "/root/testdata/sf0.001"
    p3 = e.q_tpch_revenue_topn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p3 and "Sort [revenue_c" not in p3
    p5 = e.q_tpch_nation_revenue(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p5
    p1 = e.q_tpch_pricing(spark, sf_dir)._jdf.queryExecution().toString()
    assert "PushedFilters" in p1 and "l_shipdate" in p1
    # Q10 shape: both selective filters reach their scans
    p10 = e.q_tpch_returned_items(spark, sf_dir)._jdf.queryExecution().toString()
    assert "l_returnflag" in p10.split("PushedFilters", 1)[1]
    assert "o_orderdate" in p10
    # Q16 shape: the complaints exclusion is a broadcast ANTI join, and the
    # (part,supplier) pair relation dedups before the count
    p16 = e.q_tpch_parts_suppliers(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p16 and "LeftAnti" in p16
    # Q18 shape: the having-filter lands on the aggregate BEFORE the
    # dimension joins (survivor set shrinks first)
    p18 = e.q_tpch_large_orders(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
    agg_i = p18.index("Aggregate")
    assert "Filter (total_qty_c" in p18 or p18.index("Filter") < agg_i


def test_char_diversity_plan_jvm_and_bounded_exchanges(spark, sf_small):
    """The char gate must stay JVM-side (no Python) and pay at most the
    (doc, ch) partial agg, the doc rollup, and the ids join — partial
    aggregation (map-side combine) must appear below the first exchange."""
    from web_crawler_spark import synth
    from web_crawler_spark.functions import webtext

    wd = spark.read.parquet(synth.synth_path("0.001", "webdocs"))
    plan = _plan(webtext.char_diversity(wd))
    assert "EvalPython" not in plan
    assert plan.count("Exchange") <= 4
    assert "partial_count" in plan or "Partial" in plan


def test_host_lang_mix_plan_jvm_single_rollup(spark, sf_small):
    """Language-mix: pure JVM, exchanges bounded by the (host, lang)
    partial agg + host rollup; the dominant-language pick is an agg-side
    struct min, never a window."""
    from web_crawler_spark import synth
    from web_crawler_spark.functions import webtext

    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    plan = _plan(webtext.host_lang_mix(pages.select("url", "lang")))
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert plan.count("Exchange") <= 3


def test_watermark_plan_is_one_mapside_stage(spark):
    """Watermark scoring must compile to a shuffle-free JVM projection —
    no Exchange, no explode-driven Generate, no Python: the 100 TB
    screening-pass shape."""
    from web_crawler_spark.functions import textstats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(textstats.watermark_scores(docs))
    assert "Exchange" not in plan
    assert "Generate" not in plan
    assert "EvalPython" not in plan


def test_hrw_shard_plan_single_exchange(spark, sf_small):
    """HRW assignment: the only exchange is the host partial agg; the
    S-way argmax is a per-row JVM array expression (no explode, no window,
    no Python)."""
    from web_crawler_spark.operators.politeness import hrw_shard_assignment

    meta = spark.read.parquet(synth.synth_path("0.001", "pages_meta"))
    plan = _plan(hrw_shard_assignment(meta))
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan  # map-side combine before the exchange
    assert "Generate" not in plan and "Window" not in plan
    assert "EvalPython" not in plan


def test_gazetteer_plan_broadcasts_dictionary(spark):
    """The gazetteer join must broadcast the (entity, slot, term) dim so
    non-gazetteer tokens die map-side; no corpus-side shuffle before it."""
    from web_crawler_spark.functions import textstats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(textstats.gazetteer_tag(docs))
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan
    # token relation must not be exchanged ahead of the broadcast join:
    # the only exchanges are the two partial-agg'd aggregations
    assert plan.count("Exchange hashpartitioning") <= 2


def test_typosquat_plan_broadcast_no_cartesian(spark, sf_small):
    """Brand comparison is a broadcast nested loop with the length
    prefilter — never a CartesianProduct, never Python."""
    from web_crawler_spark.functions import urlfilter

    meta = spark.read.parquet(synth.synth_path("0.001", "pages_meta"))
    plan = _plan(urlfilter.typosquat_candidates(meta))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "EvalPython" not in plan


def test_link_prediction_plan_anti_join_no_cartesian(spark, sf_small):
    """Link prediction: equi-keyed wedge join (never a cross product) and
    a left-anti adjacency filter; all JVM."""
    from web_crawler_spark.functions import linkstats

    meta = spark.read.parquet(synth.synth_path("0.001", "pages_meta"))
    plan = _plan(linkstats.host_link_prediction(meta))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "LeftAnti" in plan
    assert "EvalPython" not in plan
    # the graph build is materialized once: the wedge self-join and the
    # adjacency anti-join read checkpointed relations, never re-scanning
    # the corpus per branch (the winnow branch-recompute lesson)
    assert plan.count("Scan parquet") == 0


def test_attribution_plan_equi_range_join(spark):
    """The touch->conversion lookback join must keep user_id as an equi
    key (SMJ/hash join with the time bounds as post-conditions), never a
    cross/nested-loop join."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_events_attribution(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "EvalPython" not in plan


def test_tpch_disjunctive_and_waiting_plan_shapes(spark):
    """Q19 shape: the derived conjunctive prefilter (brand IN, size <= 35)
    must PUSH to the part scan even though the query predicate is an
    OR-of-ANDs; part broadcasts.  Q21 shape: the double correlation is
    decorrelated into order-grain aggregates (no per-row subquery, no
    nested-loop join); top-20 compiles to TakeOrderedAndProject."""
    import __spark_entry__ as e

    sf_dir = "/root/testdata/sf0.001"
    q19 = e.q_tpch_disjunctive(spark, sf_dir)._jdf.queryExecution()
    full = q19.toString()
    assert "PushedFilters" in full
    assert "In(p_brand" in full.split("PushedFilters", 1)[1]
    assert "BroadcastHashJoin" in q19.executedPlan().toString()

    q21 = e.q_tpch_waiting(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in q21 and "CartesianProduct" not in q21
    assert "TakeOrderedAndProject" in q21
    assert "EvalPython" not in q21


def test_tpch_q2_q20_plan_shapes(spark):
    """Q2 shape: the selective part filter must PUSH to the part scan and
    the supply relation must build via broadcast joins (part + supplier
    dims), never a shuffled fact-vs-fact join; no per-row subquery
    artifacts (nested loop / cartesian).  Q20 shape: both year sums ride
    ONE lineitem aggregation (a single lineitem scan in the plan), the
    threshold is a post-agg Filter, and the supplier semi-chain
    broadcasts."""
    import __spark_entry__ as e

    sf_dir = "/root/testdata/sf0.001"
    q2 = e.q_tpch_min_cost_supplier(spark, sf_dir)._jdf.queryExecution()
    full = q2.toString()
    assert "PushedFilters" in full
    pushed = full.split("PushedFilters", 1)[1]
    assert "p_size" in pushed and "p_type" in pushed
    phys = q2.executedPlan().toString()
    assert "BroadcastHashJoin" in phys
    assert "NestedLoop" not in phys and "CartesianProduct" not in phys
    assert "TakeOrderedAndProject" in phys
    assert "EvalPython" not in phys

    q20 = e.q_tpch_excess_inventory(spark, sf_dir)._jdf.queryExecution()
    phys20 = q20.executedPlan().toString()
    assert phys20.count("lineitem.parquet") == 1
    assert "BroadcastHashJoin" in phys20
    assert "NestedLoop" not in phys20 and "CartesianProduct" not in phys20
    assert "EvalPython" not in phys20


def test_trust_and_agreement_plan_shapes(spark):
    """sitemap_trust: the snapshot scans must prune to (url, warc_ts, text)
    — html BINARY never reads — and the rollup stays free of nested-loop
    artifacts and Python.  dedup_agreement: both family pair sets reach the
    audit via bucketed equi-joins, never a cartesian, and the one allowed
    Python node is the corpus-side shingle/token machinery (ArrowEval),
    never row-at-a-time BatchEval."""
    import __spark_entry__ as e

    sf_dir = "/root/testdata/sf0.001"
    qt = e.q_sitemap_trust(spark, sf_dir)._jdf.queryExecution()
    full = qt.toString()
    assert "html" not in full.split("ReadSchema", 1)[1][:400]
    phys = qt.executedPlan().toString()
    assert "NestedLoop" not in phys and "CartesianProduct" not in phys
    assert "EvalPython" not in phys

    qa = e.q_dedup_agreement(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in qa and "CartesianProduct" not in qa
    assert "BatchEvalPython" not in qa


def test_manifest_scan_plan_crafted(spark):
    """Pruning math on a crafted layout: two hosts across three days; the
    head window must open only day-0 files, and over-read ppm must match a
    hand evaluation of the same (day, md5-bucket) file model."""
    import hashlib
    from datetime import datetime, timezone

    from web_crawler_spark.plans.manifest import (
        MANIFEST_BUCKETS,
        PROBE_WINDOWS_PPM,
        US_PER_DAY,
        file_manifest,
        manifest_scan_plan,
    )

    def ts(day, hour):
        return datetime(2024, 1, 1 + day, hour, tzinfo=timezone.utc)

    rows = [
        (f"http://{h}/p{d}{hh}", ts(d, hh), b"", "t", "en")
        for h in ("a.example", "b.example")
        for d in (0, 1, 2)
        for hh in (1, 13)
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )

    def bucket(host):
        return int(hashlib.md5(host.encode()).hexdigest()[:8], 16) % MANIFEST_BUCKETS

    n_files_expect = len(
        {(d, bucket(h)) for h in ("a.example", "b.example") for d in (0, 1, 2)}
    )
    man = {
        (r["file_day"], r["file_bucket"]): (r["min_ts_us"], r["max_ts_us"], r["n_rows"])
        for r in file_manifest(pages).collect()
    }
    assert len(man) == n_files_expect
    assert sum(n for _, _, n in man.values()) == len(rows)
    assert {d for d, _ in man} == {
        int(ts(d, 1).timestamp() * 1_000_000) // US_PER_DAY for d in (0, 1, 2)
    }

    got = {r["window_id"]: r for r in manifest_scan_plan(pages).collect()}
    assert set(got) == {0, 1, 2}
    gmin = int(ts(0, 1).timestamp() * 1_000_000)
    gmax = int(ts(2, 13).timestamp() * 1_000_000)
    span = gmax - gmin
    for i, (lo_ppm, hi_ppm) in enumerate(PROBE_WINDOWS_PPM):
        lo = gmin + span * lo_ppm // 1_000_000
        hi = gmin + span * hi_ppm // 1_000_000 + (1 if hi_ppm == 1_000_000 else 0)
        r = got[i]
        assert (r["lo_us"], r["hi_us"]) == (lo, hi)
        assert r["n_files"] == n_files_expect
        scanned = {
            k: v for k, v in man.items() if v[1] >= lo and v[0] < hi
        }
        assert r["n_files_scanned"] == len(scanned)
        assert r["rows_in_scanned"] == sum(v[2] for v in scanned.values())
        match = sum(
            1
            for h in ("a.example", "b.example")
            for d in (0, 1, 2)
            for hh in (1, 13)
            if lo <= int(ts(d, hh).timestamp() * 1_000_000) < hi
        )
        assert r["rows_matching"] == match
        assert r["overread_ppm"] == (r["rows_in_scanned"] - match) * 1_000_000 // max(
            r["rows_in_scanned"], 1
        )
    # head window must not open day-2 files
    day2 = int(ts(2, 1).timestamp() * 1_000_000) // US_PER_DAY
    scanned0 = {
        k for k, v in man.items() if v[1] >= got[0]["lo_us"] and v[0] < got[0]["hi_us"]
    }
    assert all(d != day2 for d, _ in scanned0)


def test_frontcode_plan_single_exchange_no_python(spark, sf_small):
    """Front-coding must pay exactly ONE exchange (host_key — the
    adjacency dedup rides the lag window instead of a second
    (host_key, urlkey)-grain distinct exchange) and stay JVM-side."""
    from web_crawler_spark.sources.warc import cdx_frontcode

    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    plan = _plan(cdx_frontcode(pages))
    assert "EvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_anf_round_plan_partial_bitor_no_python(spark, sf_small):
    """One ANF round = edge join + bit_or groupBy with map-side partial
    aggregation; registers never touch Python."""
    from web_crawler_spark.functions.linkstats import host_anf

    pm = spark.read.parquet(synth.synth_path("0.001", "pages_meta"))
    plan = _plan(host_anf(pm, trials=2, depth=1, checkpoint=False))
    assert "EvalPython" not in plan
    assert "partial_bit_or" in plan or "Partial" in plan


def test_urlnorm_audit_plan_rule_predicates_stay_jvm(spark, sf_small):
    """The audit's rule predicates must ride the scan as JVM regexes; the
    only Python node is the canonicalizer's documented Arrow pass, and it
    runs once (the flag scan reuses the checkpointed canon frame)."""
    from web_crawler_spark.functions.urlnorm import urlnorm_audit

    cands = spark.read.parquet(synth.synth_path("0.001", "url_candidates"))
    plan = _plan(urlnorm_audit(cands))
    assert plan.count("ArrowEvalPython") == 0  # checkpoint cut the lineage
    assert "EvalPython" not in plan


def test_scan_prune_plan_broadcast_windows_no_python(spark, sf_small):
    """Both window joins must broadcast the 3-row window frame; no Python
    anywhere; the truth pass is the only full scan in the final plan (the
    manifest is checkpointed)."""
    from web_crawler_spark.plans.manifest import manifest_scan_plan

    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    plan = _plan(manifest_scan_plan(pages))
    assert "EvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("Scan parquet") <= 1


def test_manifest_scan_plan_empty_table(spark):
    """An empty pages table yields an empty planning table, not a crash."""
    from web_crawler_spark.plans.manifest import manifest_scan_plan

    empty = spark.createDataFrame(
        [], "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    assert manifest_scan_plan(empty).count() == 0
