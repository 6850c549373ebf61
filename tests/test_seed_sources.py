"""Seed sources: list/file/parquet + dynamic add_urls (S1-S3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_crawler_spark.sources import seeds as seeds_src


def test_from_list_preserves_positions(spark):
    df = seeds_src.from_list(spark, ["http://a/1", "http://b/2", "http://a/1"])
    rows = {r["url"]: r["seed_idx"] for r in seeds_src.dedup_seeds(df).collect()}
    assert rows == {"http://a/1": 0, "http://b/2": 1}


def test_from_text_file(spark, tmp_path):
    f = tmp_path / "seeds.txt"
    f.write_text("# comment\n\nhttp://a/1\nhttp://b/2\nhttp://a/1\n  http://c/3  \n")
    got = sorted(
        (r["seed_idx"], r["url"]) for r in seeds_src.from_text_file(spark, str(f)).collect()
    )
    assert got == [(0, "http://a/1"), (1, "http://b/2"), (2, "http://c/3")]


def test_add_urls_keeps_existing_priority(spark):
    frontier = spark.createDataFrame(
        [("http://a/1", 0, 0, 0, 0), ("http://b/2", 0, 1, 0, 0)],
        "url string, depth int, p0 bigint, p1 bigint, attempt int",
    )
    out = seeds_src.add_urls(frontier, ["http://b/2", "http://c/3"])
    rows = {r["url"]: r["p0"] for r in out.collect()}
    assert rows["http://a/1"] == 0
    assert rows["http://b/2"] == 1  # existing entry wins over the re-add
    assert rows["http://c/3"] >= 1 << 32  # appended behind existing work
