"""Per-step ChainStep configuration (reference chain_crawler.py:24-43):
per-step parsers and next-URL extraction rules, parity-tested against the
refsim simulator extended with the same step semantics."""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from web_crawler_spark import refsim, synth
from web_crawler_spark.functions import registry
from web_crawler_spark.plans.crawl import ChainCrawl, CrawlConfig, StepConfig


def _fixture(spark):
    synth.ensure_synth("0.001")
    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    seeds = spark.read.parquet(synth.synth_path("0.001", "seeds"))
    raw = {
        r["url"]: bytes(r["html"]) for r in pages.select("url", "html").collect()
    }
    seed_list = [r["url"] for r in seeds.orderBy("seed_idx").collect()]
    return pages, seeds, raw, seed_list


def test_chain_step_extractor_parity(spark, sf_small):
    """Engine with a per-step Column extractor == refsim with the equivalent
    pure-Python rule, row for row including global fetch order."""
    pages, seeds, raw, seed_list = _fixture(spark)
    state = ChainCrawl(
        spark, pages, CrawlConfig(steps=synth.chain_spark_steps(), mode="parity")
    ).run(seeds)
    got = (
        ChainCrawl.fetch_log(state)
        .select("fetch_seq", "round", "url", "ok", "title", "links_count")
        .orderBy("fetch_seq")
        .collect()
    )
    sim = refsim.simulate_chain_crawl(raw, seed_list, steps=synth.chain_sim_steps())
    assert len(got) == len(sim.records)
    for g, w in zip(got, sim.records):
        assert (g["fetch_seq"], g["round"], g["url"], g["ok"]) == (
            w.fetch_seq,
            w.round,
            w.url,
            w.ok,
        )
        if w.ok:
            assert g["title"] == w.title and g["links_count"] == w.links_count
    # the step-0 rule actually pruned something: round-1 frontier differs
    # from the default chain's
    flat = ChainCrawl(
        spark, pages, CrawlConfig(rounds=3, mode="parity")
    ).run(seeds)
    flat_r1 = {
        r["url"]
        for r in ChainCrawl.fetch_log(flat).filter(F.col("round") == 1).collect()
    }
    step_r1 = {r["url"] for r in got if r["round"] == 1}
    assert step_r1 and step_r1 != flat_r1 and step_r1 <= flat_r1


CUSTOM_SCHEMA = StructType(
    [
        StructField("n_links", IntegerType()),
        StructField("first2", ArrayType(StringType())),
    ]
)


def _make_listing_batch():
    def _batch(urls: pd.Series, htmls: pd.Series) -> pd.DataFrame:
        from web_crawler_spark.functions.html_parse import extract_one

        n_links, first2 = [], []
        for h in htmls:
            if h is None:
                n_links.append(None)
                first2.append(None)
                continue
            _, _, cnt, links = extract_one(bytes(h).decode("utf-8", errors="ignore"))
            n_links.append(cnt)
            first2.append(links[:2])
        return pd.DataFrame({"n_links": n_links, "first2": first2})

    return _batch


registry.register_parser(
    "listing2",
    _make_listing_batch(),
    CUSTOM_SCHEMA,
    links_extractor=lambda parsed: parsed["first2"],
)


def _sim_listing_parser(url: str, html: str) -> dict:
    parsed = refsim.parse_html(url, html)
    # refsim's parse_html truncates links to 10 AFTER counting — mirror the
    # untruncated count the Spark-side extract_one sees
    return {"n_links": parsed["links_count"], "first2": parsed["links"][:2]}


def test_mixed_parser_chain_parity(spark, sf_small):
    """Step 0: custom listing parser (own schema + extractor); step 1: the
    default parser.  Heterogeneous schemas serialize as JSON in the log and
    the fetch sequence matches refsim with the equivalent SimSteps."""
    pages, seeds, raw, seed_list = _fixture(spark)
    steps = [
        StepConfig(parser_name="listing2", name="listing"),
        StepConfig(parser_name="default", name="detail"),
    ]
    state = ChainCrawl(spark, pages, CrawlConfig(steps=steps, mode="parity")).run(seeds)
    log = ChainCrawl.fetch_log(state)
    assert set(log.columns) == {"fetch_seq", "round", "url", "ok", "data"}
    got = log.orderBy("fetch_seq").collect()

    sim_steps = [
        refsim.SimStep(parser=_sim_listing_parser, extract=lambda d: d["first2"]),
        refsim.SimStep(),
    ]
    sim = refsim.simulate_chain_crawl(raw, seed_list, steps=sim_steps)
    assert [(g["fetch_seq"], g["round"], g["url"], g["ok"]) for g in got] == [
        (w.fetch_seq, w.round, w.url, w.ok) for w in sim.records
    ]
    # round-0 rows carry the custom schema's fields as JSON
    r0 = next(g for g in got if g["round"] == 0 and g["ok"])
    w0 = next(w for w in sim.records if w.round == 0 and w.ok)
    d0 = json.loads(r0["data"])
    assert d0["n_links"] == w0.data["n_links"]
    assert d0.get("first2", []) == w0.data["first2"]
    # round-1 rows carry default-parser fields as JSON
    r1 = next(g for g in got if g["round"] == 1 and g["ok"])
    w1 = next(w for w in sim.records if w.round == 1 and w.ok)
    assert json.loads(r1["data"])["text"] == w1.data["text"]


def test_final_step_none_extractor_stops_chain(spark, sf_small):
    """StepConfig(links_extractor=None) == reference extract_next_urls=None:
    the step saves results but feeds no frontier; the chain drains."""
    pages, seeds, _, _ = _fixture(spark)
    steps = [StepConfig(links_extractor=None), StepConfig(), StepConfig()]
    state = ChainCrawl(spark, pages, CrawlConfig(steps=steps, mode="parity")).run(seeds)
    log = ChainCrawl.fetch_log(state)
    assert log.select(F.max("round")).first()[0] == 0
    assert len(state.metrics) == 1
