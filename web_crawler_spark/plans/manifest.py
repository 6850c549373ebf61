"""Iceberg-manifest-style metadata scan planning over the pages table.

The north-star design checkpoints crawl state as Iceberg snapshots; the
property that makes that work at 10^10 rows is MANIFEST PRUNING — every
data file carries column min/max stats in the table metadata, and a
time/host-scoped reader (recrawl scheduling, drift windows, incident
forensics) opens only the files whose stat range overlaps its predicate.
This module models that contract end-to-end: build the per-file stats
relation a writer would commit, then evaluate — for a set of probe
windows — how many files a range predicate opens and how many rows it
over-reads, i.e. the exact planning table an engineer reads before
choosing a partition layout.

File model: the layout the engine's own sinks produce — data files keyed
by (ingest day, host-hash bucket).  Day partitioning matches the append
pattern (each crawl round writes its own days), and host-hash bucketing
matches the bucketed seen/pages stores, so a file is
``(warc day, md5(host) % n_buckets)``.

Determinism contract: timestamps become exact epoch microseconds
(``unix_micros`` / ``epoch_us``), the probe windows derive from the
global [min, max] span by integer-ppm arithmetic, and the over-read
ratio is an integer DIV ppm — bit-identical in Spark and DuckDB.

Scale shape: the manifest is one partial-agg'd exchange at file grain
(days x buckets — metadata-sized, like a real Iceberg manifest list);
window evaluation joins the 3-row window frame via broadcast on BOTH
passes, so the pages scan happens exactly once for the row-truth column
and never for the file stats after the manifest is built.  On a real
deployment the manifest relation IS the table metadata — the first agg
disappears and planning is metadata-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MANIFEST_BUCKETS = 8
US_PER_DAY = 86_400_000_000

# Probe windows as [lo, hi) ppm offsets into the global timestamp span:
# a narrow head slice, a mid decile, and the tail decile — the recrawl /
# drift / forensics access patterns respectively.
PROBE_WINDOWS_PPM = [(0, 100_000), (450_000, 550_000), (900_000, 1_000_000)]


def _host_bucket(url_col: str, n_buckets: int):
    host = F.lower(F.regexp_extract(F.col(url_col), r"(?i)^https?://([^/:?#]+)", 1))
    h32 = F.expr(
        f"cast(conv(substr(md5(lower(regexp_extract({url_col},"
        " '(?i)^https?://([^/:?#]+)', 1))), 1, 8), 16, 10) as bigint)"
    )
    return F.pmod(h32, F.lit(n_buckets)).cast("long"), host


def file_manifest(pages: DataFrame, n_buckets: int = MANIFEST_BUCKETS) -> DataFrame:
    """(file_day, file_bucket, min_ts_us, max_ts_us, n_rows) — the
    per-data-file stats relation an Iceberg writer commits to the manifest."""
    bucket, _ = _host_bucket("url", n_buckets)
    rows = pages.select(
        F.expr("unix_micros(warc_ts)").alias("ts_us"), bucket.alias("file_bucket")
    ).withColumn("file_day", F.expr(f"ts_us DIV {US_PER_DAY}").cast("long"))
    return rows.groupBy("file_day", "file_bucket").agg(
        F.min("ts_us").cast("long").alias("min_ts_us"),
        F.max("ts_us").cast("long").alias("max_ts_us"),
        F.count("*").cast("long").alias("n_rows"),
    )


def manifest_scan_plan(
    pages: DataFrame, n_buckets: int = MANIFEST_BUCKETS
) -> DataFrame:
    """(window_id, lo_us, hi_us, n_files, n_files_scanned,
    rows_in_scanned, rows_matching, overread_ppm) — pruning efficiency of
    the (day, host-bucket) file layout for each probe window.

    ``overread_ppm`` is the ppm share of rows the pruned scan still reads
    but the predicate discards — the number that tells you whether the
    layout matches the access pattern."""
    spark = pages.sparkSession
    manifest = file_manifest(pages, n_buckets).localCheckpoint(eager=True)
    bounds = manifest.agg(
        F.min("min_ts_us").alias("gmin"), F.max("max_ts_us").alias("gmax")
    ).first()
    if bounds["gmin"] is None:  # empty table: no files, no windows
        return spark.createDataFrame(
            [],
            "window_id long, lo_us long, hi_us long, n_files long,"
            " n_files_scanned long, rows_in_scanned long, rows_matching long,"
            " overread_ppm long",
        )
    gmin, gmax = int(bounds["gmin"]), int(bounds["gmax"])
    span = gmax - gmin
    wrows = []
    for i, (lo_ppm, hi_ppm) in enumerate(PROBE_WINDOWS_PPM):
        lo = gmin + span * lo_ppm // 1_000_000
        hi = gmin + span * hi_ppm // 1_000_000 + (1 if hi_ppm == 1_000_000 else 0)
        wrows.append((i, lo, hi))
    windows = F.broadcast(
        spark.createDataFrame(wrows, "window_id long, lo_us long, hi_us long")
    )
    per_file = (
        manifest.crossJoin(windows)
        .groupBy("window_id", "lo_us", "hi_us")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum(
                F.when(
                    (F.col("max_ts_us") >= F.col("lo_us"))
                    & (F.col("min_ts_us") < F.col("hi_us")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_files_scanned"),
            F.sum(
                F.when(
                    (F.col("max_ts_us") >= F.col("lo_us"))
                    & (F.col("min_ts_us") < F.col("hi_us")),
                    F.col("n_rows"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("rows_in_scanned"),
        )
    )
    truth = (
        pages.select(F.expr("unix_micros(warc_ts)").alias("ts_us"))
        .crossJoin(windows)
        .filter((F.col("ts_us") >= F.col("lo_us")) & (F.col("ts_us") < F.col("hi_us")))
        .groupBy("window_id")
        .agg(F.count("*").cast("long").alias("rows_matching"))
    )
    return (
        per_file.join(truth, on="window_id", how="left")
        .select(
            "window_id",
            "lo_us",
            "hi_us",
            "n_files",
            "n_files_scanned",
            "rows_in_scanned",
            F.coalesce(F.col("rows_matching"), F.lit(0))
            .cast("long")
            .alias("rows_matching"),
        )
        .withColumn(
            "overread_ppm",
            F.expr(
                "(rows_in_scanned - rows_matching) * 1000000"
                " DIV greatest(rows_in_scanned, 1L)"
            ).cast("long"),
        )
    )


def duck_manifest_scan_sql(pages: str, n_buckets: int = MANIFEST_BUCKETS) -> str:
    """DuckDB twin: same (day, md5-host-bucket) file model, same
    integer-ppm probe windows off the global span."""
    wins = ", ".join(
        f"({i}, {lo}, {hi})" for i, (lo, hi) in enumerate(PROBE_WINDOWS_PPM)
    )
    return rf"""
WITH rows_t AS MATERIALIZED (
  SELECT epoch_us(warc_ts) AS ts_us,
         ('0x' || substr(md5(lower(coalesce(regexp_extract(url,
            '(?i)^https?://([^/:?#]+)', 1), ''))), 1, 8))::BIGINT
           % {n_buckets} AS file_bucket
  FROM {pages}
),
manifest AS MATERIALIZED (
  SELECT ts_us // {US_PER_DAY} AS file_day, file_bucket,
         min(ts_us)::BIGINT AS min_ts_us, max(ts_us)::BIGINT AS max_ts_us,
         count(*)::BIGINT AS n_rows
  FROM rows_t GROUP BY 1, 2
),
bounds AS (SELECT min(min_ts_us) AS gmin, max(max_ts_us) AS gmax FROM manifest),
windows AS (
  SELECT w.window_id::BIGINT AS window_id,
         (b.gmin + (b.gmax - b.gmin) * w.lo_ppm // 1000000)::BIGINT AS lo_us,
         (b.gmin + (b.gmax - b.gmin) * w.hi_ppm // 1000000
          + CASE WHEN w.hi_ppm = 1000000 THEN 1 ELSE 0 END)::BIGINT AS hi_us
  FROM (VALUES {wins}) w(window_id, lo_ppm, hi_ppm), bounds b
),
per_file AS (
  SELECT w.window_id, w.lo_us, w.hi_us,
         count(*)::BIGINT AS n_files,
         sum(CASE WHEN m.max_ts_us >= w.lo_us AND m.min_ts_us < w.hi_us
             THEN 1 ELSE 0 END)::BIGINT AS n_files_scanned,
         sum(CASE WHEN m.max_ts_us >= w.lo_us AND m.min_ts_us < w.hi_us
             THEN m.n_rows ELSE 0 END)::BIGINT AS rows_in_scanned
  FROM manifest m, windows w GROUP BY 1, 2, 3
),
truth AS (
  SELECT w.window_id, count(*)::BIGINT AS rows_matching
  FROM rows_t r JOIN windows w
    ON r.ts_us >= w.lo_us AND r.ts_us < w.hi_us
  GROUP BY 1
)
SELECT p.window_id, p.lo_us, p.hi_us, p.n_files, p.n_files_scanned,
       p.rows_in_scanned,
       coalesce(t.rows_matching, 0)::BIGINT AS rows_matching,
       ((p.rows_in_scanned - coalesce(t.rows_matching, 0)) * 1000000
        // greatest(p.rows_in_scanned, 1))::BIGINT AS overread_ppm
FROM per_file p LEFT JOIN truth t USING (window_id)
"""
