"""Property-style parity: on randomly generated link graphs (seeded), the
distributed parity-mode engine must reproduce the reference simulator's fetch
sequence exactly — including duplicate links, self-links, cross-round
rediscovery (the reference re-fetches: no global seen set in parity mode),
dead links, and empty pages."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from web_crawler_spark import refsim
from web_crawler_spark.plans.crawl import ChainCrawl, CrawlConfig


def _random_web(seed: int, n_pages: int = 80, n_seeds: int = 6):
    rng = random.Random(seed)
    urls = [f"http://h{rng.randrange(6)}.example/p/{i}" for i in range(n_pages)]
    pages = {}
    for i, u in enumerate(urls):
        n_links = rng.randrange(0, 8)
        hrefs = []
        for _ in range(n_links):
            r = rng.random()
            if r < 0.6:
                hrefs.append(urls[rng.randrange(n_pages)])  # live (maybe self)
            elif r < 0.75 and hrefs:
                hrefs.append(rng.choice(hrefs))  # duplicate link
            elif r < 0.9:
                hrefs.append(f"http://dead{rng.randrange(9)}.example/x")
            else:
                hrefs.append(f"/rel/{rng.randrange(50)}")  # relative -> dead
        body = " ".join(
            rng.choice(["alpha", "beta", "gamma  delta", "x" * 40]) for _ in range(rng.randrange(0, 30))
        )
        html = (
            "<html><body><p>" + body + "</p>"
            + "".join(f'<a href="{h}">l</a>' for h in hrefs)
            + "</body></html>"
        )
        pages[u] = html.encode()
    seeds = [urls[rng.randrange(n_pages)] for _ in range(n_seeds)]
    if rng.random() < 0.5:
        seeds.append(seeds[0])  # duplicate seed
    seeds.append(f"http://dead0.example/seed")
    return pages, seeds


@pytest.mark.parametrize("seed", [7, 99, 1234])
def test_random_web_parity(spark, seed):
    pages_map, seeds = _random_web(seed)
    sim = refsim.simulate_chain_crawl(pages_map, seeds, rounds=3)

    pages_df = spark.createDataFrame(
        [(u, h) for u, h in pages_map.items()], "url string, html binary"
    ).repartition(6)
    seeds_df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(seeds)], "seed_idx bigint, url string"
    )
    eng = ChainCrawl(spark, pages_df, CrawlConfig(rounds=3, mode="parity"))
    log = (
        ChainCrawl.fetch_log(eng.run(seeds_df))
        .orderBy("fetch_seq")
        .collect()
    )
    assert [r["url"] for r in log] == sim.fetch_sequence
    assert [r["ok"] for r in log] == [r.ok for r in sim.records]
    got_text = [r["text"] for r in log if r["ok"]]
    want_text = [r.text for r in sim.records if r.ok]
    assert got_text == want_text  # byte-identical extraction on random html
