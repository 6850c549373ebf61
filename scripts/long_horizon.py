"""Round-4 long-horizon crawl evidence (r3 VERDICT item 7): run the
scale-mode loop 20+ rounds with ``seen_compact_every`` and
``checkpoint_gc`` active and chart (a) per-round wall time against the
round's processed volume and (b) seen-store FILE COUNT per bucket — the
two curves that must stay flat/bounded for the 10^10-frontier design
point to hold over a long crawl, extending the round-3 six-round
flatness datapoint (scripts/round_flatness.py).

A small host budget keeps rounds small so the finite sandbox web sustains
20+ rounds before frontier exhaustion.

Usage: python scripts/long_horizon.py [sf] [rounds] [host_budget]
       (defaults 0.01, 22, 4)
Prints one JSON line per round plus a summary line; paste into BENCH.md.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from web_crawler_spark import synth  # noqa: E402
from web_crawler_spark.plans.crawl import ChainCrawl, CrawlConfig  # noqa: E402
from web_crawler_spark.session import get_spark  # noqa: E402

COMPACT_EVERY = 5


def seen_store_files(spark, table: str) -> int:
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    d = os.path.join(wh, table)
    if not os.path.isdir(d):
        return -1
    return len(glob.glob(os.path.join(d, "part-*")))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "0.01"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 22
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = get_spark()
    synth.ensure_synth(sf)
    pages = spark.read.parquet(synth.synth_path(sf, "pages"))
    seeds = spark.read.parquet(synth.synth_path(sf, "seeds"))
    ck = os.path.join(synth.SYNTH_ROOT, f"long_horizon_sf{sf}")
    shutil.rmtree(ck, ignore_errors=True)
    cfg = CrawlConfig(
        rounds=rounds,
        mode="scale",
        host_budget=budget,
        checkpoint_dir=ck,
        checkpoint_gc=True,
        seen_compact_every=COMPACT_EVERY,
    )
    eng = ChainCrawl(spark, pages, cfg)

    def store_table() -> "str | None":
        # the store is created lazily at run() start
        return eng._seen_store.table if eng._seen_store is not None else None

    rows: list = []
    clock = {"t": None}

    def hook(finished_round: int, state):
        now = time.time()
        rows.append(
            {
                "round": finished_round,
                "sec": round(now - clock["t"], 2),
                "processed": state.metrics[-1].get("urls_processed")
                if state.metrics
                else None,
                "store_files": seen_store_files(spark, store_table())
                if store_table()
                else None,
                "ck_entries": len(os.listdir(ck)) if os.path.isdir(ck) else 0,
            }
        )
        print(json.dumps(rows[-1]), flush=True)
        clock["t"] = time.time()  # exclude the probe from the next round
        return None

    clock["t"] = time.time()
    state = eng.run(seeds, extra_urls_provider=hook)
    now = time.time()
    rows.append(
        {
            "round": state.round_idx - 1,
            "sec": round(now - clock["t"], 2),
            "processed": state.metrics[-1].get("urls_processed")
            if state.metrics
            else None,
            "store_files": seen_store_files(spark, store_table())
            if store_table()
            else None,
            "ck_entries": len(os.listdir(ck)) if os.path.isdir(ck) else 0,
        }
    )
    print(json.dumps(rows[-1]), flush=True)
    seen_total = state.seen.count() if state.seen is not None else None
    secs = [r["sec"] for r in rows]
    per_url = [
        round(r["sec"] / r["processed"], 4) if r["processed"] else None
        for r in rows
    ]
    print(
        json.dumps(
            {
                "sf": sf,
                "host_budget": budget,
                "compact_every": COMPACT_EVERY,
                "rounds_run": len(rows),
                "seen_total": int(seen_total) if seen_total is not None else None,
                "first3_sec": secs[:3],
                "last3_sec": secs[-3:],
                "max_store_files": max(
                    (r["store_files"] for r in rows if r["store_files"] is not None),
                    default=None,
                ),
                "sec_per_url_first3": per_url[:3],
                "sec_per_url_last3": per_url[-3:],
            }
        )
    )
    eng.close()
    shutil.rmtree(ck, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
