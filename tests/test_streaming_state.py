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


def test_hash_collision_does_not_drop_distinct_url():
    """A 64-bit hash collision between two distinct urls must not drop the
    second url (hash membership is a prefilter, not the decision)."""
    import numpy as np
    import pandas as pd

    from web_crawler_spark.streaming.seen_state import _dedup_batch

    seen_hashes = np.array([12345], dtype=np.int64)
    seen_urls = {"http://a.example/x"}
    pdf = pd.DataFrame(
        {
            # same fabricated hash value: one true dup, one collision victim
            "url": ["http://a.example/x", "http://collides.example/y"],
            "url_hash": np.array([12345, 12345], dtype=np.int64),
        }
    )
    emit = _dedup_batch(seen_hashes, seen_urls, pdf)
    assert list(emit) == [False, True]


def test_dedup_batch_within_batch_first_wins():
    import numpy as np
    import pandas as pd

    from web_crawler_spark.streaming.seen_state import _dedup_batch

    pdf = pd.DataFrame(
        {
            "url": ["u1", "u2", "u1"],
            "url_hash": np.array([1, 2, 1], dtype=np.int64),
        }
    )
    emit = _dedup_batch(np.empty(0, dtype=np.int64), set(), pdf)
    assert list(emit) == [True, True, False]
