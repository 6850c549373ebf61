"""Empirical round-time flatness for the scale-mode crawl loop.

The 10^10-frontier design point requires per-round cost to track the
ROUND's candidate volume, not the accumulated seen-set size (the round-2
verdict's scale-killer: a loop that rewrites/re-shuffles the whole seen
set gets slower every round; the bucketed-delta seen store is the fix).
This harness runs one multi-round scale crawl and prints per-round wall
seconds next to the cumulative seen size: seen grows monotonically while
round time tracks the per-round processed volume — not the seen curve.

Timing uses the between-rounds hook (``extra_urls_provider``), so the
seen-count probe itself is excluded from the next round's clock.

Usage: python scripts/round_flatness.py [sf] [rounds]   (default 0.1, 6)
"""

from __future__ import annotations

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


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark()
    synth.ensure_synth(sf)
    pages = spark.read.parquet(synth.synth_path(sf, "pages"))
    seeds = spark.read.parquet(synth.synth_path(sf, "seeds"))
    ck = os.path.join(synth.SYNTH_ROOT, f"round_flatness_sf{sf}")
    shutil.rmtree(ck, ignore_errors=True)
    eng = ChainCrawl(
        spark,
        pages,
        CrawlConfig(rounds=rounds, mode="scale", host_budget=50, checkpoint_dir=ck),
    )

    rows: list[dict] = []
    clock = {"t": None}

    def hook(finished_round: int, state):
        now = time.time()
        rows.append(
            {
                "round": finished_round,
                "sec": round(now - clock["t"], 2),
                "seen": int(state.seen.count()) if state.seen is not None else None,
                "processed": state.metrics[-1].get("urls_processed")
                if state.metrics
                else None,
            }
        )
        print(json.dumps(rows[-1]), flush=True)
        clock["t"] = time.time()  # exclude the seen-count probe
        return None

    clock["t"] = time.time()
    state = eng.run(seeds, extra_urls_provider=hook)
    now = time.time()
    rows.append(
        {
            "round": state.round_idx - 1,
            "sec": round(now - clock["t"], 2),
            "seen": int(state.seen.count()) if state.seen is not None else None,
            "processed": state.metrics[-1].get("urls_processed")
            if state.metrics
            else None,
        }
    )
    print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"sf": sf, "host_budget": 50, "rounds": rows}))
    shutil.rmtree(ck, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
