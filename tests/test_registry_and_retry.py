"""Custom-parser registry (X1/X2) and retry routing (O4)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from web_crawler_spark import synth
from web_crawler_spark.functions import registry
from web_crawler_spark.plans.crawl import ChainCrawl, CrawlConfig

CUSTOM_SCHEMA = StructType(
    [
        StructField("n_bytes", IntegerType()),
        StructField("first_links", ArrayType(StringType())),
    ]
)


def _make_custom_batch():
    # nested so cloudpickle serializes it BY VALUE — a module-level function
    # in tests/ would pickle by reference and fail to import in the Python
    # workers (exactly what happens for user parsers defined in notebooks)
    def _custom_batch(urls: pd.Series, htmls: pd.Series) -> pd.DataFrame:
        from web_crawler_spark.functions.html_parse import extract_one

        n_bytes, first_links = [], []
        for h in htmls:
            if h is None:
                n_bytes.append(None)
                first_links.append(None)
                continue
            text = bytes(h).decode("utf-8", errors="ignore")
            _, _, _, links = extract_one(text)
            n_bytes.append(len(h))
            first_links.append(links[:3])
        return pd.DataFrame({"n_bytes": n_bytes, "first_links": first_links})

    return _custom_batch


registry.register_parser(
    "bytes3links",
    _make_custom_batch(),
    CUSTOM_SCHEMA,
    links_extractor=lambda parsed: parsed["first_links"],
)


def test_custom_parser_crawl(spark, sf_small):
    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    seeds = spark.read.parquet(synth.synth_path("0.001", "seeds"))
    cfg = CrawlConfig(rounds=2, mode="scale", host_budget=10, parser_name="bytes3links")
    state = ChainCrawl(spark, pages, cfg).run(seeds)
    log = ChainCrawl.fetch_log(state)
    assert set(log.columns) == {"fetch_seq", "round", "url", "ok", "data"}
    ok_rows = log.filter(F.col("ok")).select("data.n_bytes", "data.first_links").collect()
    assert all(r["n_bytes"] > 0 for r in ok_rows)
    assert all(len(r["first_links"]) <= 3 for r in ok_rows)
    # chaining used the custom extractor: round 1 exists and fetched something
    assert log.filter(F.col("round") == 1).count() > 0


def test_unknown_parser_raises():
    with pytest.raises(KeyError):
        registry.get_parser("nope")


def test_retry_routing(spark, sf_small):
    """Dead URLs with retries re-enter the frontier with attempt+1 and a
    demoted priority; they are re-attempted on later rounds (O4)."""
    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    seeds = spark.createDataFrame(
        [(0, "http://deadhost.example/x"), (1, "http://host0.example/p/0")],
        "seed_idx bigint, url string",
    )
    cfg = CrawlConfig(rounds=3, mode="scale", max_retries=2, use_bloom=False)
    state = ChainCrawl(spark, pages, cfg).run(seeds)
    log = ChainCrawl.fetch_log(state).toPandas()
    dead = log[log["url"] == "http://deadhost.example/x"]
    # attempted once per round while retries remain
    assert len(dead) >= 2
    assert not dead["ok"].any()
