"""The pages table — "the web" the engine crawls.

Fetch = equi-join of the frontier batch against this table on ``url``
(SURVEY.md §2.1 S4, §2.4 J1): present row => HTTP 200 with ``html`` payload;
missing => fetch failure.  Column pruning matters here more than anywhere —
``html BINARY`` is the dominant byte volume and must only be read by the parse
stage (scan's ReadSchema should exclude it for scheduling-only queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def read_pages(
    spark: SparkSession,
    path: str,
    with_html: bool = True,
    fmt: str = "parquet",
) -> DataFrame:
    """Read the Common-Crawl-style pages table (input_hint shape).  Pass
    ``with_html=False`` for scheduling-side uses so Parquet never materializes
    the binary column.

    ``fmt``: ``parquet`` (default — a path), ``iceberg`` (an Iceberg table
    identifier, e.g. ``catalog.db.pages``; requires the iceberg-spark
    runtime on the cluster classpath — the deployment target, not this
    sandbox), or ``table`` (any metastore/catalog table).  Column pruning
    and predicate pushdown behave identically through all three: the
    engine only ever expresses projections/filters on the DataFrame, so
    Iceberg's scan planning (partition pruning by url bucket / warc_ts
    range, snapshot isolation for resumable rounds) is picked up with no
    plan change."""
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "iceberg":
        try:
            df = spark.read.format("iceberg").load(path)
        except Exception as exc:  # pragma: no cover - no runtime jar here
            raise RuntimeError(
                "iceberg format requires the iceberg-spark-runtime jar "
                "(spark.jars.packages org.apache.iceberg:...); falling back "
                "is unsafe because snapshot isolation would silently vanish"
            ) from exc
    elif fmt == "table":
        df = spark.table(path)
    else:
        raise ValueError(f"unknown pages format: {fmt!r}")
    cols = ["url", "warc_ts", "html", "text", "lang"] if with_html else ["url", "warc_ts", "lang"]
    return df.select(*[c for c in cols if c in df.columns])


def fetch_join(frontier_batch: DataFrame, pages: DataFrame) -> DataFrame:
    """frontier ⋈ pages on url, left outer: null html = failed fetch
    (non-200 / dead URL).  At scale AQE picks broadcast when the round's batch
    is small, else sort-merge with skew splitting."""
    return frontier_batch.join(pages, on="url", how="left")


BUCKETS = 64


def write_bucketed_pages(pages: DataFrame, table_name: str, buckets: int = BUCKETS) -> None:
    """Persist the pages table hash-bucketed (+sorted) by url.

    This is the strategy for round batches too large to broadcast: a bucketed
    pages table gives the fetch join its build-side distribution for free —
    only the (much smaller) frontier batch shuffles into the bucket layout,
    and the multi-TB html payloads never move.  At 10^10 pages this is the
    difference between shuffling ~100 TB per round and shuffling the batch."""
    (
        pages.write.mode("overwrite")
        .bucketBy(buckets, "url")
        .sortBy("url")
        .format("parquet")
        .saveAsTable(table_name)
    )


def read_bucketed_pages(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
