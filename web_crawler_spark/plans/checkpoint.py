"""Snapshot-per-round checkpoint protocol (SURVEY.md §4 item 4).

Each round commits its state tables (frontier, url_seen, results, metrics,
lineage) as immutable parquet snapshot directories under
``<root>/round=NNNN/<table>/`` and then atomically drops a ``_COMMITTED``
marker file in the round dir.  A crash mid-round leaves no marker, so resume
(``last_committed``) replays from the previous round — Iceberg-snapshot-style
all-or-nothing visibility without needing the Iceberg runtime in this sandbox.

Reading a table back from parquet each round also truncates the iterative
lineage chain — without it the logical plan grows by one join+agg stack per
round and the 100th round would take minutes to just analyze.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession


class Checkpointer:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _round_dir(self, round_idx: int) -> str:
        return os.path.join(self.root, f"round={round_idx:04d}")

    def table_path(self, round_idx: int, name: str) -> str:
        return os.path.join(self._round_dir(round_idx), name)

    def commit_round(
        self,
        round_idx: int,
        tables: dict[str, DataFrame],
        info: dict | None = None,
    ) -> None:
        rd = self._round_dir(round_idx)
        if os.path.exists(rd):  # re-run of an uncommitted round: start clean
            shutil.rmtree(rd)
        os.makedirs(rd)
        for name, df in tables.items():
            df.write.mode("overwrite").parquet(self.table_path(round_idx, name))
        if info is not None:
            with open(os.path.join(rd, "info.json"), "w") as f:
                json.dump(info, f)
        with open(os.path.join(rd, "_COMMITTED"), "w") as f:
            f.write("ok")

    def last_committed(self) -> int | None:
        best = None
        if not os.path.isdir(self.root):
            return None
        for entry in os.listdir(self.root):
            m = re.fullmatch(r"round=(\d{4})", entry)
            if m and os.path.exists(os.path.join(self.root, entry, "_COMMITTED")):
                r = int(m.group(1))
                best = r if best is None else max(best, r)
        return best

    def read(self, spark: SparkSession, round_idx: int, name: str) -> DataFrame:
        return spark.read.parquet(self.table_path(round_idx, name))

    def read_info(self, round_idx: int) -> dict:
        p = os.path.join(self._round_dir(round_idx), "info.json")
        with open(p) as f:
            return json.load(f)

    # heavy per-round STATE tables: resume only ever reads these from the
    # LAST committed round (plans/crawl.py run()); everything else —
    # results, url_seen_delta, info.json — is read from every round and
    # must survive GC
    GC_STATE_TABLES = ("url_seen", "frontier", "host_state")

    def gc_state(self, keep_last: int = 1, last: "int | None" = None) -> int:
        """Drop the heavy state snapshots of committed rounds older than the
        newest ``keep_last`` — a 1000-round crawl otherwise stores ~1000
        copies of the full seen set (O(rounds x |seen|)); after GC storage
        is O(|seen| + rounds x |delta|).  Round dirs, commit markers,
        results, deltas, and info are untouched, so resume and fetch-log
        reconstruction still work.  Returns the number of table dirs
        removed.

        ``last``: the caller's notion of the newest round (the crawl loop
        passes the round it JUST committed).  Defaults to the scan-derived
        ``last_committed()`` — but a fresh run over a dir holding STALE
        later rounds must pass its own round, else the stale markers would
        GC the state it just wrote."""
        if last is None:
            last = self.last_committed()
        if last is None:
            return 0
        cutoff = last - keep_last + 1
        removed = 0
        for r in range(cutoff):
            rd = self._round_dir(r)
            if not os.path.exists(os.path.join(rd, "_COMMITTED")):
                continue
            for name in self.GC_STATE_TABLES:
                p = os.path.join(rd, name)
                if os.path.exists(p):
                    shutil.rmtree(p)
                    removed += 1
        return removed
