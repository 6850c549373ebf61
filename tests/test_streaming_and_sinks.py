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


def test_storage_backend_envelope(spark, tmp_path):
    """write_storage_backend routes records through a StorageBackend-shaped
    handler with the reference's MongoDB envelope semantics (storage.py:189):
    insert_one({url, timestamp: RAW datetime, data}), one backend per
    partition, finalize() at the end.  The fake backend persists to shared
    files because handlers run on the executors."""
    import glob
    import json
    import os

    outdir = str(tmp_path / "fake_mongo")
    os.makedirs(outdir, exist_ok=True)
    df = spark.createDataFrame(
        [("http://a/1", "T1", 3), ("http://a/2", "T2", 5), ("http://a/3", "T3", 0)],
        "url string, title string, links_count int",
    )

    def factory(outdir=outdir):
        import datetime
        import json as _json
        import os as _os
        import uuid

        class FakeMongoCollection:
            def __init__(self):
                self.recs = []

            def insert_one(self, doc):
                # reference stores a raw datetime, not an isoformat string
                assert isinstance(doc["timestamp"], datetime.datetime)
                assert set(doc) == {"url", "timestamp", "data"}
                self.recs.append(doc)

            def finalize(self):
                p = _os.path.join(outdir, f"part-{uuid.uuid4().hex}.jsonl")
                with open(p, "w") as f:
                    for d in self.recs:
                        f.write(
                            _json.dumps(
                                {
                                    "url": d["url"],
                                    "timestamp": d["timestamp"].isoformat(),
                                    "data": d["data"],
                                },
                                default=lambda o: o.item() if hasattr(o, "item") else str(o),
                            )
                            + "\n"
                        )

        return FakeMongoCollection()

    n = sinks.write_storage_backend(
        df, factory, "2024-01-01 00:00:00", ["title", "links_count"]
    )
    assert n == 3
    recs = []
    for p in glob.glob(os.path.join(outdir, "part-*.jsonl")):
        with open(p) as f:
            recs += [json.loads(line) for line in f]
    assert len(recs) == 3
    by_url = {r["url"]: r for r in recs}
    assert by_url["http://a/1"]["data"] == {"title": "T1", "links_count": 3}
    assert all(r["timestamp"].startswith("2024-01-01T00:00:00") for r in recs)


def test_storage_backend_insert_many_batching(spark, tmp_path):
    """batch_size + an insert_many-capable backend => chunked bulk calls with
    envelopes byte-identical to the insert_one path, and never a chunk larger
    than batch_size."""
    import glob
    import json
    import os

    outdir = str(tmp_path / "fake_mongo_many")
    os.makedirs(outdir, exist_ok=True)
    rows = [(f"http://a/{i}", f"T{i}", i) for i in range(7)]
    df = spark.createDataFrame(rows, "url string, title string, links_count int").coalesce(1)

    def factory(outdir=outdir):
        import datetime
        import json as _json
        import os as _os
        import uuid

        class FakeBulkCollection:
            def __init__(self):
                self.calls = []

            def insert_one(self, doc):  # must NOT be used when batching
                raise AssertionError("insert_one called despite batch_size")

            def insert_many(self, docs):
                assert 0 < len(docs) <= 3
                for doc in docs:
                    assert isinstance(doc["timestamp"], datetime.datetime)
                    assert set(doc) == {"url", "timestamp", "data"}
                self.calls.append(list(docs))

            def finalize(self):
                p = _os.path.join(outdir, f"part-{uuid.uuid4().hex}.jsonl")
                with open(p, "w") as f:
                    for chunk_idx, chunk in enumerate(self.calls):
                        for d in chunk:
                            f.write(
                                _json.dumps(
                                    {
                                        "url": d["url"],
                                        "chunk": chunk_idx,
                                        "data": d["data"],
                                    },
                                    default=lambda o: o.item() if hasattr(o, "item") else str(o),
                                )
                                + "\n"
                            )

        return FakeBulkCollection()

    n = sinks.write_storage_backend(
        df, factory, "2024-01-01 00:00:00", ["title", "links_count"], batch_size=3
    )
    assert n == 7
    recs = []
    for p in glob.glob(os.path.join(outdir, "part-*.jsonl")):
        with open(p) as f:
            recs += [json.loads(line) for line in f]
    assert len(recs) == 7
    by_url = {r["url"]: r for r in recs}
    assert by_url["http://a/4"]["data"] == {"title": "T4", "links_count": 4}
    # 7 records at batch_size 3 on one partition => chunks of 3/3/1
    assert max(r["chunk"] for r in recs) == 2


def test_foreach_batch_sink_pandas_batches(spark, tmp_path):
    """The generic plug point hands Arrow-sized pandas batches (never
    row-at-a-time) to the handler on the executors."""
    import glob
    import os

    outdir = str(tmp_path / "batches")
    os.makedirs(outdir, exist_ok=True)
    df = spark.range(100).selectExpr("concat('u', id) AS url")

    def handler(pdf, outdir=outdir):
        import pandas as _pd
        import uuid

        assert isinstance(pdf, _pd.DataFrame)
        pdf.to_json(
            os.path.join(outdir, f"b-{uuid.uuid4().hex}.jsonl"),
            orient="records",
            lines=True,
        )

    n = sinks.foreach_batch_sink(df, handler)
    assert n == 100
    total = sum(
        sum(1 for _ in open(p)) for p in glob.glob(os.path.join(outdir, "b-*.jsonl"))
    )
    assert total == 100
