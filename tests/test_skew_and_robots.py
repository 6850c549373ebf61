"""Engine-level skew + robots coverage (SURVEY.md §5.2 items 5-6):
an 80%-hot-host frontier must respect budgets exactly, and host_rules must
shape the full crawl, not just the operator."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from web_crawler_spark import synth
from web_crawler_spark.operators.politeness import select_host_budget_batch, with_host
from web_crawler_spark.plans.crawl import ChainCrawl, CrawlConfig


def test_extreme_hot_host_budget(spark):
    """80% of a 50k frontier on one host: both the WindowGroupLimit default
    and the salted plan must return exactly budget rows for the hot host and
    the true priority-minimal rows."""
    rng = random.Random(11)
    rows = []
    for i in range(50_000):
        host = "hot.example" if rng.random() < 0.8 else f"h{rng.randrange(50)}.example"
        rows.append((f"http://{host}/p/{i}", 0, 0, rng.randrange(10**9), i))
    df = with_host(
        spark.createDataFrame(
            rows, "url string, attempt int, depth int, p0 bigint, p1 bigint"
        ).repartition(16)
    )
    for salt in (None, 16):
        batch = select_host_budget_batch(
            df, ["attempt", "depth", "p0", "p1"], budget=10, salt_buckets=salt
        )
        per_host = {
            r["host"]: r["n"]
            for r in batch.groupBy("host").agg(F.count("*").alias("n")).collect()
        }
        assert per_host["hot.example"] == 10
        assert all(n <= 10 for n in per_host.values())
        # the hot host's winners are its true global top-10 by priority
        got = sorted(
            r["p0"]
            for r in batch.filter(F.col("host") == "hot.example").collect()
        )
        want = sorted(p0 for (u, a, d, p0, p1) in rows if "hot." in u)[:10]
        assert got == want


def test_robots_rules_shape_full_crawl(spark, sf_small):
    """host_rules with a disallow prefix: the engine must never fetch a
    blocked path, and budgets from the rules table are enforced per round."""
    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    seeds = spark.read.parquet(synth.synth_path("0.001", "seeds"))
    rules = spark.createDataFrame(
        [("host0.example", 3, ["/p/"])],  # block ALL of host0's pages
        "host string, budget int, disallow array<string>",
    )
    cfg = CrawlConfig(rounds=3, mode="scale", host_budget=10)
    eng = ChainCrawl(spark, pages, cfg, host_rules=rules)
    log = ChainCrawl.fetch_log(eng.run(seeds)).toPandas()
    hosts = log["url"].str.split("/").str[2]
    assert not (hosts == "host0.example").any(), "robots-disallowed urls fetched"
    # other hosts obey the default budget (10/round)
    per = log.assign(host=hosts).groupby(["round", "host"]).size()
    assert per.max() <= 10


def test_host_cooldown(spark):
    """A host that fails hard in round 0 sits out the cooldown window and its
    urls resurface afterwards (Retry-After analog, reference crawler.py:169-178)."""
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(
        [(f"http://good.example/p/{i}", f"<p>page {i}</p>".encode()) for i in range(20)],
        "url string, html binary",
    )
    seeds = spark.createDataFrame(
        [(i, f"http://good.example/p/{i}") for i in range(5)]
        + [(10 + i, f"http://flaky.example/x/{i}") for i in range(5)],
        "seed_idx bigint, url string",
    )
    cfg = CrawlConfig(
        rounds=5,
        mode="scale",
        host_budget=None,
        max_retries=4,
        host_cooldown_rounds=2,
        host_cooldown_fail_ratio=0.5,
        host_cooldown_min_fetches=3,
        use_bloom=False,
    )
    log = (
        ChainCrawl.fetch_log(ChainCrawl(spark, pages, cfg).run(seeds))
        .toPandas()
    )
    log["host"] = log["url"].str.split("/").str[2]
    flaky_rounds = sorted(log[log["host"] == "flaky.example"]["round"].unique())
    # fetched in round 0, then on cooldown for rounds 1-2, retried in round 3
    assert flaky_rounds[0] == 0
    assert 1 not in flaky_rounds and 2 not in flaky_rounds
    assert 3 in flaky_rounds
    # the healthy host is never held up
    good_rounds = sorted(log[log["host"] == "good.example"]["round"].unique())
    assert 0 in good_rounds


def test_ring_shard_assignment_matches_replica_and_minimal_disruption(spark):
    """Ring assignment equals an independent Python replica of the same
    md5 ring, and growing the ring S -> S+1 moves hosts ONLY to the new
    agent (the consistent-hashing contract)."""
    import hashlib

    from web_crawler_spark.operators.politeness import (
        RING_VNODES,
        ring_shard_assignment,
    )

    hosts = [f"h{i}.example" for i in range(64)]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def replica(host, n_shards, vnodes=RING_VNODES):
        hp = h32(host)
        best, best_d = -1, 1 << 33
        for a in range(n_shards):
            for v in range(vnodes):
                d = (h32(f"ring#{a}#{v}") - hp + (1 << 32)) % (1 << 32)
                if d < best_d:
                    best, best_d = a, d
        return best

    got4 = {r["host"]: r["shard"] for r in ring_shard_assignment(df, n_shards=4).collect()}
    assert got4 == {h: replica(h, 4) for h in hosts}

    got5 = {r["host"]: r["shard"] for r in ring_shard_assignment(df, n_shards=5).collect()}
    moved = {h for h in hosts if got5[h] != got4[h]}
    assert all(got5[h] == 4 for h in moved)  # movers go only TO the new agent
    assert 0 < len(moved) < len(hosts)       # some move, not all
