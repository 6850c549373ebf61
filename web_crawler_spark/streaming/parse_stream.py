"""Streaming variant of the extraction stage (SURVEY.md §2.9 R3 note).

The reference is strictly batch-round-based, so the crawl loop itself stays a
driver loop; but the *extraction* stage — pages in, parsed records out — is
naturally incremental: new WARC-style page files appear, we parse exactly the
new ones.  ``readStream`` over the pages directory + the same Arrow parse UDF
+ ``Trigger.AvailableNow`` gives exactly-once file-granularity processing with
a resumable checkpoint, i.e. the JSONL-append sink of the reference
(reference storage.py:100-150) upgraded to a transactional streaming sink.

Semantics are identical to the batch path (same UDF); tests assert
batch-vs-stream output equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.html_parse import with_parsed
from ..sources.pages import PAGES_SCHEMA


def parsed_pages_stream(spark: SparkSession, pages_dir: str) -> DataFrame:
    """Streaming DataFrame of parsed pages from a growing parquet directory."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(pages_dir)
    )
    return with_parsed(stream.select("url", "warc_ts", "html")).select(
        "url",
        "warc_ts",
        F.col("parsed.title").alias("title"),
        F.col("parsed.text").alias("text"),
        F.col("parsed.links_count").alias("links_count"),
        F.col("parsed.links").alias("links"),
    )


def run_available_now(
    spark: SparkSession, pages_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """Process everything currently in ``pages_dir`` and stop — the streaming
    analog of one batch round, resumable from the stream checkpoint."""
    q = (
        parsed_pages_stream(spark, pages_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
