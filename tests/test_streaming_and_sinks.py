"""Streaming parse stage: output equality with the batch path, checkpointed
incremental processing.  Sinks: envelope shape + per-url bucketing."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from web_crawler_spark import synth
from web_crawler_spark.functions.html_parse import with_parsed
from web_crawler_spark.sources import sinks
from web_crawler_spark.streaming.parse_stream import run_available_now


def test_stream_matches_batch(spark, sf_small, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    src = spark.read.parquet(synth.synth_path("0.001", "pages")).limit(200)
    src.repartition(4).write.parquet(pages_dir)

    run_available_now(spark, pages_dir, out_dir, ck)

    got = (
        spark.read.parquet(out_dir)
        .select("url", "title", "text", "links_count")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = (
        with_parsed(spark.read.parquet(pages_dir).select("url", "html"))
        .select("url", "parsed.title", "parsed.text", "parsed.links_count")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == 200
    assert (got["text"] == want["text"]).all()
    assert (got["links_count"] == want["links_count"]).all()


def test_stream_incremental_resume(spark, sf_small, tmp_path):
    """New files after a run are processed exactly once on the next trigger."""
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    all_pages = spark.read.parquet(synth.synth_path("0.001", "pages")).limit(100)
    all_pages.limit(60).write.parquet(pages_dir)
    run_available_now(spark, pages_dir, out_dir, ck)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == 60
    # drop 40 more rows in; only they are processed
    all_pages.subtract(all_pages.limit(60)).write.mode("append").parquet(pages_dir)
    run_available_now(spark, pages_dir, out_dir, ck)
    out = spark.read.parquet(out_dir)
    assert out.count() == 100
    assert out.select("url").distinct().count() == 100  # exactly-once per url


def test_sink_envelope_and_buckets(spark, sf_small, tmp_path):
    df = spark.createDataFrame(
        [("http://a.example/1", "t1", 3), ("http://b.example/2", "t2", 0)],
        "url string, title string, links_count int",
    )
    env = sinks.with_envelope(df, "2024-01-01 00:00:00", ["title", "links_count"])
    assert set(env.columns) == {"url", "ts", "data"}
    rows = {r["url"]: r for r in env.collect()}
    assert rows["http://a.example/1"]["data"]["title"] == "t1"

    out = str(tmp_path / "perurl")
    sinks.write_per_url_json(env, out, buckets=8)
    back = spark.read.json(out)
    assert back.count() == 2
    assert any(e.startswith("bucket=") for e in os.listdir(out))
