"""Bucketed, delta-appended ``url_seen`` store — the scale-mode loop's
persistent membership set (SURVEY.md §4 item 2; VERDICT r2 "next round" #1).

The naive loop maintenance (``seen ∪ delta`` + full materialization each
round) rewrites and re-shuffles O(|seen|) every round — a round-time killer
at the 10^10-URL design point.  This store keeps the seen set as a
url-bucketed warehouse table (``operators/dedup.write_bucketed_seen``) and
per-round work strictly O(|delta|):

* **append** writes only the round's newly-enqueued urls, pre-partitioned by
  the bucket hash so each append adds exactly one file per bucket;
* **reads** (the per-round exact anti-join) get the seen side's distribution
  from the bucket layout for free — only the (bloom-thinned) candidate side
  exchanges, never the seen set (plan-asserted in
  ``tests/test_plans.py::test_bucketed_seen_anti_join_shuffles_only_candidates``
  and, through the round loop, ``test_scale_mode``);
* duplicates are harmless by construction (membership via ``left_anti``),
  so appends need no read-modify-write.

At small scale AQE is still free to broadcast the (small) table scan instead
of using the bucketed SMJ — the layout only ever adds the exchange-free
option, it never forces a sort-merge.

File growth is one file per bucket per round; a real deployment compacts
periodically (``compact()``) — the rewrite is off the round loop's critical
path and amortizes over many rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import SEEN_BUCKETS, write_bucketed_seen


class BucketedSeenStore:
    def __init__(self, spark: SparkSession, table: str, buckets: int = SEEN_BUCKETS):
        self.spark = spark
        self.table = table
        self.buckets = buckets

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.table)

    def create(self, urls: DataFrame) -> None:
        """(Re)initialize the table from a url frame (drops any leftover).
        Pre-partitioned onto the bucket hash so the write emits one file per
        bucket (the bucketed writer otherwise emits one per bucket per
        input task)."""
        self.drop()
        write_bucketed_seen(
            urls.select("url").repartition(self.buckets, F.col("url")),
            self.table,
            self.buckets,
        )

    def append(self, delta: DataFrame) -> None:
        """Append a round's delta: repartitioned onto the bucket hash first so
        the append writes exactly one file per bucket (Spark would otherwise
        emit one file per bucket per input task)."""
        (
            delta.select("url")
            .repartition(self.buckets, F.col("url"))
            .write.mode("append")
            .bucketBy(self.buckets, "url")
            .sortBy("url")
            .format("parquet")
            .saveAsTable(self.table)
        )

    def df(self) -> DataFrame:
        """Current membership set (bucketed scan; may contain duplicate urls
        across deltas — harmless for ``left_anti`` membership)."""
        return self.spark.table(self.table)

    def compact(self) -> None:
        """Rewrite the table into one file per bucket (bounds file count
        after many delta appends; schedule off the hot path or via
        ``CrawlConfig.seen_compact_every``).  The snapshot is materialized
        BEFORE the drop so the rewrite never reads the files it is
        replacing."""
        snapshot = (
            self.df().dropDuplicates(["url"]).localCheckpoint(eager=True)
        )
        self.create(snapshot)

    def drop(self) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.table}")
        # the in-memory catalog can forget tables whose files survive in the
        # warehouse dir; clear them so a re-create never hits
        # LOCATION_ALREADY_EXISTS
        import os
        import shutil

        wh = self.spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        parts = self.table.split(".")
        if len(parts) == 2:
            path = os.path.join(wh, f"{parts[0]}.db", parts[1])
        else:
            path = os.path.join(wh, parts[0])
        shutil.rmtree(path, ignore_errors=True)
