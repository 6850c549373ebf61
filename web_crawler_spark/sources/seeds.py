"""Seed frontier sources (SURVEY.md §2.1 S1-S3).

The reference takes ``urls: list[str]`` (reference crawler.py:65) or a
one-URL-per-line file skipping blanks and ``#`` comments with ordered dedup
(reference cli.py:31-46).  Position in the seed list is the crawl-order key,
so every source materializes an explicit ``seed_idx``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dedup import first_wins
from ..operators.ordering import with_global_seq


def from_list(spark: SparkSession, urls: list[str]) -> DataFrame:
    """Seed frontier from an in-memory list; seed_idx = list position."""
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "seed_idx bigint, url string"
    )


def from_text_file(spark: SparkSession, path: str) -> DataFrame:
    """One URL per line; skip blank and ``#``-comment lines (cli.py:37-40);
    line order preserved via a scale-safe dense sequence over the file's
    natural order (file offset is not exposed, so we read with
    ``zipWithIndex``-free technique: wholetext lines keep input order only
    within a split — instead use the line's first-occurrence order key from
    ``monotonically_increasing_id`` on a coalesced single-split read for
    small seed files, which is the common case)."""
    raw = spark.read.text(path)
    lines = raw.select(F.trim(F.col("value")).alias("url")).withColumn(
        "seed_idx", F.monotonically_increasing_id()
    )
    kept = lines.filter(
        (F.length("url") > 0) & ~F.col("url").startswith("#")
    )
    # ordered first-wins dedup (cli.py:46 dict.fromkeys)
    deduped = first_wins(kept, "url", ["seed_idx"])
    # re-densify seed_idx so downstream order keys are contiguous
    return with_global_seq(
        deduped.select("url", F.col("seed_idx").alias("file_pos")),
        ["file_pos"],
        out_col="seed_idx",
    ).select("seed_idx", "url")


def from_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Seed table with explicit (seed_idx, url) columns (synth fixture shape)."""
    return spark.read.parquet(path).select("seed_idx", "url")


def dedup_seeds(seeds: DataFrame) -> DataFrame:
    """Ordered first-wins dedup on url, keeping the smallest seed_idx."""
    return first_wins(seeds, "url", ["seed_idx"])


def add_urls(frontier: DataFrame, urls: list[str], base_priority: int = 1 << 32) -> DataFrame:
    """Dynamic frontier append — the reference's ``add_urls`` (S3,
    reference crawler.py:373-376): new urls enter behind all existing work
    (demoted p0), then the frontier re-dedups first-wins so already-queued
    urls keep their original priority."""
    spark = frontier.sparkSession
    new = spark.createDataFrame(
        [(u, i) for i, u in enumerate(urls)], "url string, add_idx bigint"
    ).select(
        "url",
        F.lit(0).alias("depth"),
        (F.lit(base_priority) + F.col("add_idx")).alias("p0"),
        F.lit(0).cast("long").alias("p1"),
        F.lit(0).alias("attempt"),
    )
    for c in frontier.columns:
        if c not in new.columns:  # e.g. scale mode's host column
            from ..operators.politeness import with_host

            new = with_host(new)
            break
    merged = frontier.unionByName(new.select(*frontier.columns))
    return first_wins(merged, "url", ["attempt", "depth", "p0", "p1"])
