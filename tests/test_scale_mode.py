"""Scale-mode invariants: global seen-set discipline (no URL fetched twice),
politeness budgets respected per round, canonicalization collapsing messy
hrefs, bloom-on == bloom-off, and checkpoint/resume determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_crawler_spark import synth
from web_crawler_spark.plans.crawl import ChainCrawl, CrawlConfig


def _run_scale(
    spark,
    tmpdir=None,
    resume=False,
    rounds=4,
    budget=20,
    use_bloom=True,
    stop_after_round=None,
):
    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    seeds = spark.read.parquet(synth.synth_path("0.001", "seeds"))
    cfg = CrawlConfig(
        rounds=rounds,
        mode="scale",
        host_budget=budget,
        use_bloom=use_bloom,
        bloom_min_seen=0,  # force the bloom path at test scale
        checkpoint_dir=str(tmpdir) if tmpdir else None,
        resume=resume,
    )
    eng = ChainCrawl(spark, pages, cfg)
    state = eng.run(seeds, stop_after_round=stop_after_round)
    log = ChainCrawl.fetch_log(state).toPandas().sort_values("fetch_seq")
    return state, log.reset_index(drop=True)


def test_seen_store_equivalent_to_inmemory_seen(spark, sf_small):
    """The bucketed-delta seen store (default) must be byte-equivalent to the
    legacy in-memory union path — it changes maintenance cost, never
    membership semantics."""
    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    seeds = spark.read.parquet(synth.synth_path("0.001", "seeds"))

    def run(use_store):
        cfg = CrawlConfig(
            rounds=4, mode="scale", host_budget=20, use_bloom=False,
            use_seen_store=use_store, seen_buckets=8,
        )
        eng = ChainCrawl(spark, pages, cfg)
        try:
            state = eng.run(seeds)
            return (
                ChainCrawl.fetch_log(state)
                .toPandas()
                .sort_values("fetch_seq")
                .reset_index(drop=True)
            )
        finally:
            eng.close()

    with_store, without = run(True), run(False)
    assert list(with_store["url"]) == list(without["url"])
    assert list(with_store["fetch_seq"]) == list(without["fetch_seq"])
    assert list(with_store["ok"]) == list(without["ok"])


def test_seen_store_compaction(spark, sf_small):
    """compact() bounds the delta-append file growth at one file per bucket,
    preserves membership exactly, keeps the bucketed-scan layout, and
    in-loop compaction (seen_compact_every) leaves crawl results unchanged."""
    import glob
    import os

    from web_crawler_spark.operators.seen_store import BucketedSeenStore

    store = BucketedSeenStore(spark, "wcs_test_compact", buckets=4)
    base = spark.range(100).selectExpr("concat('http://h/', id) AS url")
    store.create(base)
    for lo in (100, 150, 200):
        store.append(
            spark.range(lo, lo + 50).selectExpr("concat('http://h/', id) AS url")
        )
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    files = lambda: [  # noqa: E731
        f
        for f in glob.glob(os.path.join(wh, "wcs_test_compact", "*"))
        if not os.path.basename(f).startswith("_")
    ]
    assert len(files()) == 16  # create + 3 appends, 4 buckets each
    before = {r["url"] for r in store.df().collect()}
    store.compact()
    assert len(files()) == 4  # one file per bucket
    assert {r["url"] for r in store.df().collect()} == before
    plan = (
        spark.range(240, 260)
        .selectExpr("concat('http://h/', id) AS url")
        .hint("shuffle_merge")
        .join(store.df(), "url", "left_anti")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SelectedBucketsCount" in plan  # layout survives compaction
    store.drop()

    # in-loop compaction changes nothing about crawl results
    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    seeds = spark.read.parquet(synth.synth_path("0.001", "seeds"))

    def run(compact_every):
        cfg = CrawlConfig(
            rounds=4, mode="scale", host_budget=20, use_bloom=False,
            seen_buckets=4, seen_compact_every=compact_every,
        )
        eng = ChainCrawl(spark, pages, cfg)
        try:
            return (
                ChainCrawl.fetch_log(eng.run(seeds))
                .toPandas()
                .sort_values("fetch_seq")
                .reset_index(drop=True)
            )
        finally:
            eng.close()

    compacted, plain = run(2), run(None)
    assert list(compacted["url"]) == list(plain["url"])
    assert list(compacted["ok"]) == list(plain["ok"])


def test_add_urls_mid_crawl(spark, sf_small):
    """The reference's add_urls (crawler.py:373-376) analog: urls injected
    between rounds are fetched in the NEXT round, already-seen injections are
    dropped, ordering keys are deterministic (injected urls sort after the
    wave's natural discoveries), and later natural rediscoveries of injected
    urls never refetch."""
    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    seeds = spark.read.parquet(synth.synth_path("0.001", "seeds"))
    cfg = CrawlConfig(rounds=3, mode="scale", host_budget=None, use_bloom=False,
                      seen_buckets=8)

    # pick two urls the unmodified crawl never fetches, plus one it fetches
    # in round 0 (the already-seen injection that must be dropped)
    eng0 = ChainCrawl(spark, pages, cfg)
    base = ChainCrawl.fetch_log(eng0.run(seeds)).toPandas()
    eng0.close()
    fetched_r0 = set(base[base["round"] == 0]["url"])
    never = [
        r["url"]
        for r in pages.select("url").limit(2000).collect()
        if r["url"] not in set(base["url"])
    ][:2]
    assert len(never) == 2, "fixture unexpectedly fetches every page"
    seen_dup = sorted(fetched_r0)[0]

    injected = spark.createDataFrame(
        [(never[0], 0), (never[1], 1), (seen_dup, 2)], "url string, pos long"
    )

    def provider(finished_round, state):
        return injected if finished_round == 0 else None

    eng = ChainCrawl(spark, pages, cfg)
    try:
        state = eng.run(seeds, extra_urls_provider=provider)
        log = ChainCrawl.fetch_log(state).toPandas()
        r1 = log[log["round"] == 1]
        assert never[0] in set(r1["url"]), "injected url not fetched next round"
        assert never[1] in set(r1["url"])
        # the seen injection was dropped, not refetched
        assert (log["url"] == seen_dup).sum() == 1
        # no url fetched twice even after injection
        assert log["url"].is_unique
        # determinism of the full injected run
        eng2 = ChainCrawl(spark, pages, cfg)
        log2 = ChainCrawl.fetch_log(
            eng2.run(seeds, extra_urls_provider=provider)
        ).toPandas()
        eng2.close()
        assert list(log.sort_values("fetch_seq")["url"]) == list(
            log2.sort_values("fetch_seq")["url"]
        )
    finally:
        eng.close()


def test_scale_no_url_fetched_twice(spark, sf_small):
    _, log = _run_scale(spark)
    assert log["url"].is_unique


def test_scale_urls_are_canonical(spark, sf_small):
    from web_crawler_spark.functions.urlnorm import canonicalize_url

    _, log = _run_scale(spark)
    urls = list(log["url"])
    assert all(canonicalize_url(u) == u for u in urls)


def test_scale_host_budget_respected(spark, sf_small):
    _, log = _run_scale(spark, budget=7)
    log["host"] = log["url"].str.split("/").str[2].str.lower()
    per = log.groupby(["round", "host"]).size()
    assert per.max() <= 7


def test_scale_bloom_equivalence(spark, sf_small):
    """Bloom is a volume optimization, never a semantics change."""
    _, with_bloom = _run_scale(spark, use_bloom=True)
    _, without = _run_scale(spark, use_bloom=False)
    assert list(with_bloom["url"]) == list(without["url"])
    assert list(with_bloom["fetch_seq"]) == list(without["fetch_seq"])


def test_scale_messy_links_collapse(spark, sf_small):
    """Messy variants (uppercase host, :80, %70, dot segments) canonicalize to
    live pages — scale mode fetches them; parity mode would fail them."""
    _, log = _run_scale(spark, rounds=3, budget=None)
    ok_rate = log["ok"].mean()
    assert ok_rate > 0.8  # most canonical links resolve against pages


def test_resume_identical_to_straight_run(spark, sf_small, tmp_path):
    d1 = tmp_path / "straight"
    d2 = tmp_path / "resumed"
    _, straight = _run_scale(spark, tmpdir=d1, rounds=4)
    # same 4-round plan interrupted after round 1's commit, then resumed
    _, _ = _run_scale(spark, tmpdir=d2, rounds=4, stop_after_round=1)
    _, resumed = _run_scale(spark, tmpdir=d2, rounds=4, resume=True)
    assert list(straight["url"]) == list(resumed["url"])
    assert list(straight["fetch_seq"]) == list(resumed["fetch_seq"])
    assert list(straight["ok"]) == list(resumed["ok"])


def test_crash_mid_round_leaves_no_marker(spark, sf_small, tmp_path):
    """An uncommitted round dir (no _COMMITTED) is ignored by resume."""
    from web_crawler_spark.plans.checkpoint import Checkpointer

    d = tmp_path / "ck"
    _, _ = _run_scale(spark, tmpdir=d, rounds=2)
    ck = Checkpointer(str(d))
    assert ck.last_committed() == 1
    # simulate crash: round 2 dir exists but no marker
    import os

    os.makedirs(d / "round=0002" / "results", exist_ok=True)
    assert ck.last_committed() == 1


def test_resume_preserves_host_cooldowns(spark, sf_small, tmp_path):
    """A crawl with host cooldowns interrupted and resumed must equal the
    uninterrupted run — host_state is checkpointed per round, so a failing
    host's cooldown survives the restart (ADVICE r1)."""
    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    seeds = spark.read.parquet(synth.synth_path("0.001", "seeds"))

    def run(ckpt=None, resume=False, stop_after=None):
        cfg = CrawlConfig(
            rounds=4,
            mode="scale",
            host_budget=20,
            use_bloom=False,
            host_cooldown_rounds=2,
            host_cooldown_min_fetches=1,
            host_cooldown_fail_ratio=0.5,
            checkpoint_dir=str(ckpt) if ckpt else None,
            resume=resume,
        )
        state = ChainCrawl(spark, pages, cfg).run(seeds, stop_after_round=stop_after)
        return (
            ChainCrawl.fetch_log(state)
            .toPandas()
            .sort_values("fetch_seq")
            .reset_index(drop=True)
        )

    straight = run(ckpt=tmp_path / "s")
    # dead hosts exist in the fixture => cooldowns actually engage
    dead_fetches = straight[~straight["ok"]]
    assert len(dead_fetches) > 0
    run(ckpt=tmp_path / "r", stop_after=1)
    resumed = run(ckpt=tmp_path / "r", resume=True)
    assert list(straight["url"]) == list(resumed["url"])
    assert list(straight["fetch_seq"]) == list(resumed["fetch_seq"])
    assert list(straight["ok"]) == list(resumed["ok"])


def test_bloom_saturation_rebuild_preserves_results(spark, sf_small, monkeypatch):
    """Force the first bloom build to be absurdly small so it saturates and
    the fill-ratio check triggers a rebuild from the post-round seen set;
    results must stay identical to the no-bloom run and the filter must
    actually grow + desaturate."""
    import web_crawler_spark.operators.bloom as bl
    from web_crawler_spark.plans import crawl as crawl_mod

    orig_params_for = bl.params_for
    calls = []

    def tiny_then_real(n_keys, **kw):
        calls.append(n_keys)
        if len(calls) == 1:  # initial sidecar: 2^10 bits => saturates fast
            return bl.BloomParams(m_per_shard=1 << 10, k=7, n_shards=1)
        return orig_params_for(n_keys, **kw)

    monkeypatch.setattr(bl, "params_for", tiny_then_real)
    monkeypatch.setattr(crawl_mod.bloomlib, "params_for", tiny_then_real)

    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    seeds = spark.read.parquet(synth.synth_path("0.001", "seeds"))
    cfg = CrawlConfig(
        rounds=4, mode="scale", host_budget=20, use_bloom=True, bloom_min_seen=0
    )
    eng = ChainCrawl(spark, pages, cfg)
    state = eng.run(seeds)
    with_bloom = (
        ChainCrawl.fetch_log(state).toPandas().sort_values("fetch_seq").reset_index(drop=True)
    )
    assert len(calls) >= 2, "saturation rebuild never triggered"
    assert eng._bloom.params.total_bits > (1 << 10)  # rebuilt at a real size
    assert eng._bloom.fill_ratio() < 0.55  # desaturated

    monkeypatch.setattr(bl, "params_for", orig_params_for)
    monkeypatch.setattr(crawl_mod.bloomlib, "params_for", orig_params_for)
    _, without = _run_scale(spark, use_bloom=False)
    assert list(with_bloom["url"]) == list(without["url"])
    assert list(with_bloom["fetch_seq"]) == list(without["fetch_seq"])


def test_scale_crawl_with_acl_rules(spark, tmp_path):
    """RFC 9309 ACL wired into the round loop: disallowed urls are never
    fetched and leave the frontier permanently (no round-over-round
    re-filtering of dead candidates)."""
    from web_crawler_spark import synth
    from web_crawler_spark.plans.crawl import ChainCrawl, CrawlConfig
    from web_crawler_spark.sources import robots as robots_src

    synth.ensure_synth("0.001")
    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    seeds = spark.read.parquet(synth.synth_path("0.001", "seeds"))
    # block the hot host's /p/1* section except /p/12*
    body = "User-agent: *\nDisallow: /p/1*\nAllow: /p/12*\n"
    acl = robots_src.acl_rules_from_robots(
        spark.createDataFrame([("host0.example", body)], "host string, content string")
    )
    eng = ChainCrawl(
        spark, pages,
        CrawlConfig(rounds=2, mode="scale", host_budget=50),
        acl_rules=acl,
    )
    state = eng.run(seeds)
    fetched = [r["url"] for r in ChainCrawl.fetch_log(state).collect()]
    assert fetched, "crawl fetched nothing"
    for u in fetched:
        if u.startswith("http://host0.example/p/1"):
            assert u.startswith("http://host0.example/p/12"), u
    # baseline without ACL fetches at least one blocked url (the gate matters)
    eng2 = ChainCrawl(spark, pages, CrawlConfig(rounds=2, mode="scale", host_budget=50))
    base = [r["url"] for r in ChainCrawl.fetch_log(eng2.run(seeds)).collect()]
    blocked = [
        u for u in base
        if u.startswith("http://host0.example/p/1")
        and not u.startswith("http://host0.example/p/12")
    ]
    assert blocked, "fixture never exercises the gate"


def test_scale_ip_budget_collapses_vhosts(spark):
    """With a dns table, hosts sharing an IP share ONE per-round budget in
    the crawl loop itself; without it, each host gets its own."""
    # two vhosts on one server, each with 3 pages; seeds cover all 6 urls
    rows = []
    for h in ("va.example", "vb.example"):
        for i in range(3):
            rows.append((f"http://{h}/p/{i}", bytearray(f"<html><body>{h} {i}</body></html>".encode())))
    pages = spark.createDataFrame(rows, "url string, html binary")
    seeds = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(rows)], "seed_idx long, url string"
    )
    dns = spark.createDataFrame(
        [("va.example", "203.0.113.9"), ("vb.example", "203.0.113.9")],
        "host string, ip string",
    )
    cfg = CrawlConfig(rounds=1, mode="scale", host_budget=2, use_seen_store=False)

    eng = ChainCrawl(spark, pages, cfg, dns=dns)
    log = ChainCrawl.fetch_log(eng.run(seeds))
    assert log.count() == 2  # one shared budget across both vhosts

    eng2 = ChainCrawl(spark, pages, CrawlConfig(rounds=1, mode="scale", host_budget=2, use_seen_store=False))
    log2 = ChainCrawl.fetch_log(eng2.run(seeds))
    assert log2.count() == 4  # host-grain: 2 per vhost


def test_checkpoint_gc_keeps_resume_working(spark, sf_small, tmp_path):
    """checkpoint_gc drops superseded heavy state but resume and the
    reconstructed fetch log stay identical to the un-GC'd run."""
    import os

    base, log_plain = _run_scale(spark, tmpdir=str(tmp_path / "plain"), rounds=3)
    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    seeds = spark.read.parquet(synth.synth_path("0.001", "seeds"))
    ck = str(tmp_path / "gc")
    cfg = CrawlConfig(
        rounds=3, mode="scale", host_budget=20, use_bloom=True,
        bloom_min_seen=0, checkpoint_dir=ck, checkpoint_gc=True,
    )
    eng = ChainCrawl(spark, pages, cfg)
    state = eng.run(seeds)
    log_gc = (
        ChainCrawl.fetch_log(state).orderBy("fetch_seq").toPandas()
    )
    # superseded heavy state is gone, last round's is intact
    assert not os.path.exists(os.path.join(ck, "round=0000", "url_seen"))
    assert not os.path.exists(os.path.join(ck, "round=0000", "frontier"))
    assert os.path.exists(os.path.join(ck, "round=0002", "frontier"))
    # results of every round survive (fetch-log reconstruction reads them)
    assert os.path.exists(os.path.join(ck, "round=0000", "results"))
    # resume from the GC'd checkpoint still replays to the same log
    cfg_r = CrawlConfig(
        rounds=3, mode="scale", host_budget=20, use_bloom=True,
        bloom_min_seen=0, checkpoint_dir=ck, checkpoint_gc=True, resume=True,
    )
    eng3 = ChainCrawl(spark, pages, cfg_r)
    state3 = eng3.run(seeds)
    log_resumed = ChainCrawl.fetch_log(state3).orderBy("fetch_seq").toPandas()
    assert log_resumed["url"].tolist() == log_gc["url"].tolist()
