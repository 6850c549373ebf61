"""Regenerate PLANS.md — formatted physical plans for the scale-critical
operators, with the property each plan is expected to show."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from web_crawler_spark import synth  # noqa: E402
from web_crawler_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=8)
    sf_dir = "/root/testdata/sf0.001"
    out = []

    def cap(title: str, df, note: str) -> None:
        mode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        s = df._jdf.queryExecution().explainString(mode)
        out.append(f"## {title}\n\n{note}\n\n```\n{s.strip()}\n```\n")

    cap(
        "parse_extract — Arrow UDF over the html scan",
        E.q_parse_extract(spark, sf_dir),
        "Want: ArrowEvalPython (never BatchEvalPython); scan reads only (url, html).",
    )
    cap(
        "host_budget — politeness ranking",
        E.q_host_budget(spark, sf_dir),
        "Want: WindowGroupLimit Partial below the exchange (pre-shuffle top-k = skew defense), single shuffle.",
    )
    cap(
        "seed_dedup — order-stable first-wins",
        E.q_seed_dedup(spark, sf_dir),
        "Want: partial_min before one exchange; no Window, no global sort.",
    )
    cap(
        "scheduling-side scan pruning",
        spark.read.parquet(synth.synth_path("0.001", "pages"))
        .select("url")
        .filter(F.col("url").startswith("http://host0")),
        "Want: ReadSchema excludes html BINARY; filter pushed to the parquet scan.",
    )
    cap(
        "ann_brute — broadcast cross join + ranked window",
        E.q_ann_brute(spark, sf_dir),
        "Want: BroadcastNestedLoopJoin with the tiny query side broadcast; WindowGroupLimit for top-k.",
    )

    from web_crawler_spark.functions import urlnorm  # noqa: E402
    from web_crawler_spark.operators import bloom as bloomlib  # noqa: E402
    from web_crawler_spark.plans.schedule import schedule_frontier  # noqa: E402

    meta = spark.read.parquet(synth.synth_path("0.001", "pages_meta"))
    links = meta.select(
        F.xxhash64("url").alias("p0"), F.posexplode("links").alias("p1", "url")
    ).select("url", "p0", F.col("p1").cast("long").alias("p1"))
    cand = urlnorm.with_canonical_split(links).filter(F.col("url").isNotNull())
    seen = meta.select("url").limit(100)
    cap(
        "frontier scheduling — anti-join, then map-side prune, then dedup",
        schedule_frontier(cand, seen, ["p0", "p1"], budget=5),
        "Want: rediscoveries die at a BroadcastHashJoin LeftAnti BEFORE any\n"
        "exchange; the MapInPandas prune (local first-wins + per-host\n"
        "top-budget) sits between the anti-join and the tail; the tail has\n"
        "exactly ONE exchange — hashpartitioning(host) — feeding the\n"
        "(host, url) first-wins aggregate AND the host budget window with no\n"
        "url exchange in between (host = f(url); Catalyst subset rule), and\n"
        "it carries at most budget x hosts x partitions rows thanks to the\n"
        "prune; ArrowEvalPython appears only on the slow canonicalize branch\n"
        "(the fast branch is a codegen'd rlike).",
    )
    bloom = bloomlib.build_bloom(seen, "url")
    cap(
        "frontier scheduling — with the sharded bloom split",
        schedule_frontier(cand, seen, ["p0", "p1"], budget=5, bloom=bloom),
        "Want: the bloom probe (ArrowEvalPython over xxhash64) splits\n"
        "candidates map-side; only the maybe-seen branch reaches the exact\n"
        "anti-join; the union feeds the prune, then one dedup exchange.",
    )

    from web_crawler_spark.operators import dedup as dedup_ops  # noqa: E402

    spark.sql("CREATE DATABASE IF NOT EXISTS wcs_plans")
    spark.sql("DROP TABLE IF EXISTS wcs_plans.seen_demo")
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(wh, "wcs_plans.db", "seen_demo"), ignore_errors=True)
    dedup_ops.write_bucketed_seen(
        spark.read.parquet(synth.synth_path("0.001", "pages")).select("url"),
        "wcs_plans.seen_demo",
        buckets=8,
    )
    cap(
        "url_seen anti-join — bucketed-delta store layout (scale-mode loop)",
        dedup_ops.anti_join_seen(
            cand.select("url").hint("shuffle_merge"),
            dedup_ops.read_bucketed_seen(spark, "wcs_plans.seen_demo"),
        ),
        "Want: the seen side scans its bucket layout (SelectedBucketsCount,\n"
        "no Exchange on the seen attributes) — only the candidate side\n"
        "exchanges; this is the join the round loop runs every round against\n"
        "the delta-appended seen table (operators/seen_store.py).",
    )

    from web_crawler_spark.functions import webtext  # noqa: E402

    wd = spark.read.parquet(synth.synth_path("0.001", "webdocs"))
    cap(
        "dedup_lines — corpus-level first-occurrence line dedup",
        webtext.dedup_corpus_lines(wd),
        "Want: the rn=1 filter compiles to WindowGroupLimit (Partial below\n"
        "the line-hash exchange: each map partition ships one candidate per\n"
        "key, so duplicate-heavy corpora — boilerplate, syndication — don't\n"
        "flood the shuffle); no Python node anywhere.",
    )

    ev = spark.read.parquet(synth.synth_path("0.001", "evaldocs"))
    cap(
        "doc_decontaminate — eval-set n-gram decontamination",
        webtext.decontaminate(wd, ev),
        "Want: the benchmark gram side enters via BroadcastExchange (eval\n"
        "suites are tiny at any corpus scale) so the contamination probe is\n"
        "a map-side BroadcastHashJoin on the corpus scan; grams are\n"
        "xxhash64 bigints (no raw strings shuffle); the only exchange is\n"
        "the per-doc partial-agg'd groupBy.",
    )

    from web_crawler_spark.functions import urlfilter  # noqa: E402

    wu = spark.read.parquet(synth.synth_path("0.001", "weburls"))
    cap(
        "url_gate — URL-level quality gate",
        urlfilter.url_quality_gate(wu),
        "Want: a single whole-stage-codegen Project over the scan — no\n"
        "Exchange, no Python; the cheapest filter in the pipeline because\n"
        "it runs before any fetch.",
    )

    from web_crawler_spark.operators import cuckoo as cuckoolib  # noqa: E402

    cap(
        "frontier scheduling — with the cuckoo sketch split",
        schedule_frontier(
            cand, seen, ["p0", "p1"], budget=5,
            bloom=cuckoolib.build_cuckoo(seen, "url"),
        ),
        "Want: same shape as the bloom split (the sketch swap is plan-\n"
        "invisible): an ArrowEvalPython probe over xxhash64 splits\n"
        "candidates map-side, only the maybe-seen branch reaches the exact\n"
        "anti-join, then the pruned one-exchange tail.",
    )

    from web_crawler_spark.functions import linkstats  # noqa: E402

    edges = linkstats.host_graph(meta)
    out_w = edges.groupBy("src_host").agg(F.sum("n_links").alias("w_out"))
    ranks0 = (
        edges.select(F.col("src_host").alias("host")).distinct()
        .select("host", F.lit(10**9).alias("rank"))
    )
    cap(
        "link_pagerank — one power iteration (contribution join + inflow agg)",
        edges.select("src_host", "dst_host", "n_links")
        .join(out_w, on="src_host")
        .join(ranks0.withColumnRenamed("host", "src_host"), on="src_host")
        .select(F.col("dst_host").alias("host"), F.expr("rank * n_links DIV w_out").alias("c"))
        .groupBy("host").agg(F.sum("c").alias("in_c")),
        "Want: the edge relation exchanges once on src_host and serves both\n"
        "the out-degree agg and the rank join (co-partitioned); the inflow\n"
        "groupBy is partial-agg'd; all arithmetic is JVM-side BIGINT (no\n"
        "Python anywhere).  In the real loop the edges frame is\n"
        "localCheckpointed once and every iteration reuses it.",
    )

    from web_crawler_spark.plans import recrawl  # noqa: E402

    cap(
        "recrawl_sched — freshness-driven per-host stalest top-k",
        recrawl.recrawl_batch(
            spark.read.parquet(synth.synth_path("0.001", "pages")),
            now_us=1_710_000_000_000_000, min_age_us=3_600_000_000, budget=4,
        ),
        "Want: the age predicate is a pushed scan filter (PushedFilters on\n"
        "warc_ts once rewritten as a timestamp bound; at minimum it runs\n"
        "pre-shuffle), ReadSchema excludes html BINARY, and the per-host\n"
        "rank compiles to WindowGroupLimit Partial below the one host\n"
        "exchange — the fetch scheduler's budget plan, reused.",
    )

    from web_crawler_spark.functions import sampling  # noqa: E402

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    cap(
        "corpus_sample — deterministic stratified sampling",
        sampling.stratified_sample(docs),
        "Want: map-side md5-bucket + literal CASE rate table fused into the\n"
        "scan; no Exchange (the sample decision is per-row and\n"
        "deterministic, so retries/resume pick identical rows).",
    )

    from web_crawler_spark.functions import linkstats, textstats, urlfilter, webtext  # noqa: E402
    from web_crawler_spark.plans import recrawl as recrawl_mod  # noqa: E402

    prev = spark.read.parquet(synth.synth_path("0.001", "pages_prev"))
    curr = spark.read.parquet(synth.synth_path("0.001", "pages"))
    cap(
        "crawl_diff — snapshot delta (digest-only full-outer join)",
        recrawl_mod.snapshot_diff(prev, curr),
        "Want: each join input is a Project to (url, ts, md5, md5) BELOW the\n"
        "exchange — html BINARY never crosses the shuffle; the join is a\n"
        "FullOuter SortMergeJoin on url (a zipper with zero exchange once\n"
        "both snapshots are stored url-bucketed).",
    )
    cap(
        "url_traps — crawl-trap template counts + broadcast prune gate",
        urlfilter.prune_trapped(
            spark.read.parquet(synth.synth_path("0.001", "weburls")),
            urlfilter.url_trap_templates(
                spark.read.parquet(synth.synth_path("0.001", "weburls"))
            ),
        ),
        "Want: template projection map-side (JVM regex, codegen); the\n"
        "distinct-URL count is a two-level partial agg on (host, template);\n"
        "the trap list re-enters as a BroadcastHashJoin LeftAnti — the\n"
        "frontier side never shuffles for the gate.",
    )
    cap(
        "frontier_rank — PageRank-prioritized frontier batch",
        linkstats.rank_frontier(
            spark.read.parquet(synth.synth_path("0.001", "pages_meta"))
            .select(F.explode("links").alias("url")).distinct(),
            spark.read.parquet(synth.synth_path("0.001", "pages_meta"))
            .select(F.col("host"), F.lit(0).cast("long").alias("rank_ppb"))
            .distinct(),
        ),
        "Want: the per-host cap compiles to WindowGroupLimit Partial below\n"
        "the host exchange; the rank table joins as BroadcastHashJoin — no\n"
        "global sort anywhere (priority order is realized as sort keys).",
    )
    cap(
        "doc_unigram — integer-exact unigram LM score",
        textstats.unigram_score(docs),
        "Want: term frequency via two-level partial agg; the corpus total\n"
        "comes from the SMALL freq table (one extra agg, not a second pass\n"
        "over the token stream); the per-occurrence lookup is a join on\n"
        "term with map-side partials on the doc agg.",
    )
    cap(
        "index_postings — capped inverted index",
        textstats.inverted_postings(docs),
        "Want: distinct (term, doc) with partial aggregation; the\n"
        "constant-k cap compiles to WindowGroupLimit Partial, so hot\n"
        "boilerplate terms ship <= cap rows per map partition — collect_list\n"
        "only ever sees capped groups.",
    )
    cap(
        "doc_unicode — encoding-quality gate",
        webtext.unicode_quality(curr.select("url", "text"), id_col="url"),
        "Want: one whole-stage-codegen Project over the scan; no Exchange,\n"
        "no Python — fuses with the other text gates into a single pass.",
    )
    cap(
        "search_bm25 — integer-exact top-k retrieval",
        textstats.bm25_topk(docs),
        "Want: ONE doc-grain exchange (the per-doc dl+tf agg with partial\n"
        "aggregation); idf re-enters as BroadcastHashJoin; the row_number<=k\n"
        "collapses to TakeOrderedAndProject (per-partition partial top-k,\n"
        "no global sort) with Window only ranking the k survivors.",
    )
    cap(
        "sketch_cms — Count-Min counter table",
        __import__("web_crawler_spark.operators.bloom", fromlist=["x"]).cms_counters(
            docs.select(
                F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("term")
            ).filter(F.col("term") != ""),
            "term",
        ),
        "Want: md5 bucket projection + posexplode map-side (JVM, codegen);\n"
        "ONE exchange carrying partial_count rows bounded at d*w per map\n"
        "partition — constant in corpus size.",
    )
    cap(
        "index_merge — posting-shard merge",
        textstats.merge_postings(
            textstats.inverted_postings(docs.filter(F.col("doc_id") % 2 == 0)),
            textstats.inverted_postings(docs.filter(F.col("doc_id") % 2 == 1)),
        ),
        "Want: the merge itself is ONE join on term with JVM array\n"
        "concat/sort/slice in the project — no re-tokenization above the\n"
        "shard builds; term-bucketed shard storage would drop the exchange.",
    )

    cap(
        "doc_classifier — hashed linear inference",
        E.q_doc_classifier(spark, sf_dir),
        "Want: ZERO exchange, zero Python — the whole unigram+bigram\n"
        "feature hash + weight sum lives in one whole-stage-codegen\n"
        "projection over the documents scan.",
    )
    cap(
        "robots_acl_batch — RFC 9309 gate + budget ranking",
        E.q_robots_acl_batch(spark, sf_dir),
        "Want: ACL rules enter via BroadcastExchange only (the frontier\n"
        "side is gated map-side by the per-row RLIKE filter); the budget\n"
        "rank is the salted two-pass window; no url-grain shuffle beyond\n"
        "the ranking exchanges.",
    )
    cap(
        "frontier_topic — focused-crawl candidate scoring",
        E.q_frontier_topic(spark, sf_dir),
        "Want: parent classifier score computed INLINE in the link-explode\n"
        "projection (no self-join of the pages scan); exactly ONE exchange\n"
        "— the partial-agg'd candidate rollup.",
    )

    cap(
        "sched_bytes — byte-budget selection with map-side count prune",
        E.q_sched_bytes(spark, sf_dir),
        "Want: WindowGroupLimit Partial below the host exchange (the count\n"
        "cap prunes the hot host BEFORE the byte cumsum window); est-bytes\n"
        "join moves (url, est_bytes) pairs only.",
    )
    from web_crawler_spark.operators import bloom as _kmvlib  # noqa: E402

    cap(
        "sketch_kmv — bottom-k via TakeOrderedAndProject",
        _kmvlib.kmv_sketch(
            spark.read.parquet(synth.synth_path("0.001", "pages_meta")).select("url")
        ),
        "Want: TakeOrderedAndProject (per-partition k-heap), never a global Sort.",
    )
    cap(
        "frontier_discovery — seven channels, one exchange",
        E.q_frontier_discovery(spark, sf_dir),
        "Want: every channel a map-side extraction (regex/posexplode) under a\n"
        "Union; the distinct-channel count compiles to the standard two-phase\n"
        "shape — partial agg on (url, prio) before the first exchange (duplicate\n"
        "discoveries die map-side), then the url-grain merge; both exchanges\n"
        "carry channel-grain rows, never page bodies.",
    )

    cap(
        "warc_revisit — digest-keyed revisit typing",
        E.q_warc_revisit(spark, sf_dir),
        "Want: md5/octet_length projected BELOW the union (bodies digested\n"
        "map-side), every Exchange keyed on digest (one per snapshot branch —\n"
        "each capture row moves exactly once), one Window resolves originals.",
    )
    cap(
        "corpus_dsir — trained weights as a literal array, zero-exchange scoring",
        E.q_corpus_dsir(spark, sf_dir),
        "Want: scoring is Project-over-Scan only — no Exchange, no Python\n"
        "(the 4096-entry weight table is a literal; training ran as two\n"
        "bounded bucket aggregations before this plan was built).",
    )
    cap(
        "ip_budget — IP-grain politeness through the salted rank",
        E.q_ip_budget(spark, sf_dir),
        "Want: the dns min-ip agg is its own tiny exchange; the attach join\n"
        "is a BroadcastHashJoin (the frontier side never shuffles for\n"
        "resolution); ranking shows the two-pass salted window pair.",
    )
    cap(
        "events_pivot — wide matrix via single-pass conditional agg",
        E.q_events_pivot(spark, sf_dir),
        "Want: exactly ONE Exchange (user_id) with a partial HashAggregate\n"
        "below it — not DataFrame.pivot()'s two-level aggregation.",
    )

    cap(
        "doc_classifier_auc — rank statistics without a corpus window",
        E.q_doc_classifier_auc(spark, sf_dir),
        "Want: the plan's heavy side is the classifier projection + ONE\n"
        "(score)-grain partial HashAggregate; the prefix-sum stamp shows as\n"
        "a checkpointed scan (with_prefix_sums ran its two bounded jobs\n"
        "before this plan was built) — no single-partition Window, no\n"
        "corpus-wide Sort.",
    )
    cap(
        "sched_waterfill — allocation after the bounded level search",
        E.q_sched_waterfill(spark, sf_dir),
        "Want: a union of two host-grain branches (saturated filter;\n"
        "unsaturated via the checkpointed seq stamp); the distinct-demand\n"
        "level search ran as bounded pre-jobs — nothing here sorts or\n"
        "windows the host relation globally.",
    )
    cap(
        "events_dau — trailing distinct window as deduped fan-out",
        E.q_events_dau(spark, sf_dir),
        "Want: one partial-agg'd distinct of (user, day), then the <=7x\n"
        "explode feeding count_distinct per day; the DAU-WAU join is on\n"
        "day grain (tiny).  No event-grain self-join, no range window.",
    )
    cap(
        "doc_char_diversity — codepoint gate as two partial aggs",
        E.q_doc_char_diversity(spark, sf_dir),
        "Want: map-side char explode (Generate below the first Exchange),\n"
        "partial HashAggregate on (doc, ch), doc-grain rollup, ids left\n"
        "join — zero Python, no Window.",
    )
    cap(
        "host_lang_mix — dominant language without a window",
        E.q_host_lang_mix(spark, sf_dir),
        "Want: one (host, lang) partial agg + host rollup whose top-lang\n"
        "pick is a min(struct(-cnt, lang)) inside the aggregate — no\n"
        "Window, no Python, host-grain exchanges only.",
    )
    cap(
        "link_gapcode — gamma costs as JVM array folds",
        E.q_link_gapcode(spark, sf_dir),
        "Want: the successor sort lives inside ONE partial-agg'd\n"
        "collect_set groupBy; gamma costs are aggregate/transform\n"
        "expressions (whole-stage codegen), and the lexicographic id\n"
        "stamp shows as checkpointed scans (with_global_seq's bounded\n"
        "two-job pass ran before this plan) — no 1-partition window.",
    )
    cap(
        "events_cascade — raw scanned once, coarser grains off partials",
        E.q_events_cascade(spark, sf_dir),
        "Want: exactly ONE parquet scan of the events source (the minute\n"
        "grain, materialized); the hour/day branches read the checkpointed\n"
        "minute/hour relations — never a second pass over raw (the\n"
        "branch-recompute trap this plan originally exhibited and now\n"
        "guards against).",
    )

    cap(
        "doc_watermark — green-list z-test screening pass",
        E.q_doc_watermark(spark, sf_dir),
        "Want: ZERO exchange, zero Python, zero Generate — tokenize, pair\n"
        "scoring and the squared-integer z-test are array lambdas in one\n"
        "whole-stage-codegen projection over the documents scan.",
    )
    cap(
        "sched_shards — rendezvous-hash agent assignment",
        E.q_sched_shards(spark, sf_dir),
        "Want: ONE exchange (the partial-agg'd host rollup); the S-way\n"
        "argmax is a per-row JVM array expression — no explode, no window.",
    )
    cap(
        "doc_entities — gazetteer dictionary tagging",
        E.q_doc_entities(spark, sf_dir),
        "Want: the (entity, slot, term) dictionary enters via\n"
        "BroadcastExchange so non-gazetteer tokens die map-side; the\n"
        "exchanges carry only gazetteer-term occurrences (anchor agg +\n"
        "mention rollup), never the corpus.",
    )
    cap(
        "sched_timeline — Mercator politeness timeline",
        E.q_sched_timeline(spark, sf_dir),
        "Want: exactly ONE exchange — the host window; delay derivation and\n"
        "start-time arithmetic are map-side JVM; no global window.",
    )
    cap(
        "link_prediction — Adamic-Adar / resource-allocation",
        E.q_link_prediction(spark, sf_dir),
        "Want: equi-keyed center-out wedge join (no cross product); the\n"
        "adjacency filter is a LeftAnti join on the distinct edge relation;\n"
        "integer ppm weights, partial-agg'd pair rollup.",
    )

    cap(
        "warc_frontcode — CDX front-coding cost",
        E.q_warc_frontcode(spark, sf_dir),
        "Want: exactly ONE Exchange hashpartitioning(host_key) — duplicate\n"
        "captures dedup by adjacency inside the lag window (no second\n"
        "(host_key, urlkey)-grain distinct exchange); the common-prefix\n"
        "length is a JVM higher-order filter-over-sequence, no Python.",
    )
    cap(
        "scan_prune — Iceberg-manifest pruning planner",
        E.q_scan_prune(spark, sf_dir),
        "Want: the 3-row window frame enters both joins via broadcast; the\n"
        "manifest is checkpointed so the final plan scans pages once (row\n"
        "truth) — at deployment the stats side is table metadata.",
    )
    cap(
        "urlnorm_audit — canonicalization rule audit",
        E.q_urlnorm_audit(spark, sf_dir),
        "Want: every rule predicate is a JVM rlike on one scan of the\n"
        "checkpointed canon frame; stack() long-format projection; the two\n"
        "distinct counts share one partial-agg'd exchange.",
    )
    cap(
        "corpus_pack_semantic — in-context-pretraining packing",
        E.q_corpus_pack_semantic(spark, sf_dir),
        "Want: identical shape to corpus_pack (range exchange + mapInPandas\n"
        "stamp): the semantic signature is JVM transform/zip_with/aggregate\n"
        "integer lambdas, adding zero exchanges.",
    )
    from web_crawler_spark.functions.linkstats import host_anf

    cap(
        "link_anf round — HyperBall register union",
        host_anf(
            spark.read.parquet(synth.synth_path("0.001", "pages_meta")),
            trials=2,
            depth=1,
            checkpoint=False,
        ),
        "Want: per round ONE edge-vs-mask join + ONE partial-agg'd bit_or\n"
        "groupBy (map-side combine collapses duplicate (host, t) rows\n"
        "before the exchange); registers are BIGINTs, never Python.",
    )
    cap(
        "sched_budget_curve — budget sensitivity from one scheduler pass",
        E.q_sched_budget_curve(spark, sf_dir),
        "Want: ONE WindowGroupLimit-partial host window feeds every curve\n"
        "point; the sweep runs over the host-grain relation (explode of a\n"
        "5-element literal array), no second frontier scan, no Python.",
    )
    cap(
        "link_churn — host-graph evolution between snapshots",
        E.q_link_churn(spark, sf_dir),
        "Want: per snapshot a map-side regexp href pass + partial-agg'd\n"
        "(src_host, dst_host) groupBy; ONE full-outer SMJ/hash join on the\n"
        "edge key; one src_host rollup; html never shuffles.",
    )
    cap(
        "tpch_min_cost_supplier — Q2 correlated-MIN decorrelated",
        E.q_tpch_min_cost_supplier(spark, sf_dir),
        "Want: part filter pushed to the scan + broadcast into lineitem;\n"
        "(part, supplier) partial agg is the only fact-sized exchange;\n"
        "achiever join at part grain; TakeOrderedAndProject top-100.",
    )
    cap(
        "corpus_batches — length-bucketed batch planning",
        E.q_corpus_batches(spark, sf_dir),
        "Want: the two-job range-partition sequencer (range exchange +\n"
        "mapInPandas stamp) + a broadcast bucket-start join — NO per-bucket\n"
        "window anywhere; batch rollup is a partial-agg'd groupBy.",
    )
    cap(
        "recrawl_freshness — revisit-interval staleness pricing",
        E.q_recrawl_freshness(spark, sf_dir),
        "Want: the digest-only snapshot join (hashes move, bodies never),\n"
        "ONE host-grain partial agg, and the (1-p)^k sweep as map-side\n"
        "integer arithmetic — no Python, no second scan.",
    )
    cap(
        "crawl_turnover — per-host birth/death rates",
        E.q_crawl_turnover(spark, sf_dir),
        "Want: identical join shape to recrawl_freshness; status counts\n"
        "partial-agg at host grain; ratios are post-agg NULL-guarded\n"
        "integer floors.",
    )
    cap(
        "html_microdata_nested — real HTML walk (round 4)",
        E.q_html_microdata_nested(spark, sf_dir),
        "Want: ONE MapInPandas stage over the (url, html) scan, no Exchange\n"
        "— html dies in the map; only scalar property rows continue.",
    )
    cap(
        "dedup_lsh_pairs_capped — skew-proof banded join (round 4)",
        E.q_dedup_lsh_pairs_capped(spark, sf_dir),
        "Want: every consumer (cold left/right, hot-band star) reads the\n"
        "eagerly-materialized sized-band frame (Scan ExistingRDD), so the\n"
        "minhash pipeline executes ONCE — the unmaterialized form showed\n"
        "12 parquet scans / 6 recomputations of the signature agg.",
    )
    cap(
        "url_domains_psl — PSL rollup (round 4)",
        E.q_url_domains_psl(spark, sf_dir),
        "Want: the 9.5k-rule PSL relation enters via BroadcastExchange\n"
        "(never shuffled); candidate explode + prevailing-rule agg at\n"
        "DISTINCT-host grain; one join back to pages.",
    )
    cap(
        "media_phash — decoded-domain perceptual hash (round 4 real decode)",
        E.q_media_phash(spark, sf_dir),
        "Want: payloads stay inside the MapInPandas stage; the only\n"
        "exchange carries (phash, count) — 8-byte hashes, never bytes.",
    )
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("# PLANS — physical-plan evidence for the scale-critical operators\n\n")
        f.write(
            "Captured with `.explain('formatted')` at sf0.001 (plan shape is scale-independent);\n"
            "regenerate with `python scripts/gen_plans.py`.  The properties asserted here are\n"
            "enforced continuously by tests/test_plans.py.\n\n"
        )
        f.write("\n".join(out))
    print("WROTE PLANS.md")


if __name__ == "__main__":
    main()
