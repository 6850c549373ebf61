"""Stateful streaming URL-seen dedup (applyInPandasWithState): exactly-once
emission across micro-batches, state survival through the checkpoint."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_streaming_seen_dedup_across_batches(spark, tmp_path):
    from web_crawler_spark.streaming.seen_state import run_dedup_available_now

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    batch1 = ["http://a/1", "http://a/2", "http://a/1", "http://b/3"]
    spark.createDataFrame([(u,) for u in batch1], "url string").coalesce(1).write.parquet(in_dir)
    run_dedup_available_now(spark, in_dir, out_dir, ck, buckets=4)
    got1 = sorted(r["url"] for r in spark.read.parquet(out_dir).collect())
    assert got1 == ["http://a/1", "http://a/2", "http://b/3"]

    # second micro-batch: overlap with batch1 + new urls
    batch2 = ["http://a/2", "http://c/4", "http://b/3", "http://c/5", "http://c/4"]
    spark.createDataFrame([(u,) for u in batch2], "url string").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    run_dedup_available_now(spark, in_dir, out_dir, ck, buckets=4)
    got2 = sorted(r["url"] for r in spark.read.parquet(out_dir).collect())
    # previously-seen urls are NOT re-emitted; new ones exactly once
    assert got2 == ["http://a/1", "http://a/2", "http://b/3", "http://c/4", "http://c/5"]
