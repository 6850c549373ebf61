"""spark-submit entry point — the engine's ops surface, mirroring the
reference CLI (reference cli.py:50-76) plus the distributed-only flags
(checkpoint/resume, budgets, rounds).

  spark-submit --py-files wcs.zip jobs/crawl.py \\
      --pages /data/pages_parquet --seeds-file seeds.txt \\
      --rounds 5 --mode scale --host-budget 5 \\
      --max-urls-per-step 100000 --retries 3 \\
      --checkpoint-dir /ckpt/crawl1 [--resume] \\
      --output /out/results --storage jsonl

Prints the run's stats JSON to stdout on completion (cli.py:120-122).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from web_crawler_spark import sources  # noqa: E402
from web_crawler_spark.plans.crawl import ChainCrawl, CrawlConfig  # noqa: E402
from web_crawler_spark.session import get_spark  # noqa: E402
from web_crawler_spark.sources import pages as pages_src  # noqa: E402
from web_crawler_spark.sources import seeds as seeds_src  # noqa: E402
from web_crawler_spark.sources import sinks  # noqa: E402


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Distributed chain crawl over a pages table")
    p.add_argument("urls", nargs="*", help="seed URLs (positional, like the reference CLI)")
    p.add_argument("--urls-file", help="one URL per line; blanks and # comments skipped")
    p.add_argument("--seeds-parquet", help="(seed_idx, url) parquet table")
    p.add_argument("--pages", required=True, help="pages parquet/Iceberg path")
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--mode", choices=["parity", "scale"], default="scale")
    p.add_argument("--max-urls-per-step", type=int, default=None)
    p.add_argument("--host-budget", type=int, default=None)
    p.add_argument("--retries", type=int, default=0, help="max retries (crawler.py:56)")
    p.add_argument("--no-bloom", action="store_true")
    p.add_argument("--checkpoint-dir")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--output", help="results sink path")
    p.add_argument(
        "--storage",
        choices=["aggregated", "jsonl", "per-url"],
        default="jsonl",
        help="sink flavor (cli.py --storage)",
    )
    p.add_argument("--master", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = get_spark(
        app_name="wcs-crawl",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    if args.seeds_parquet:
        seeds = seeds_src.from_parquet(spark, args.seeds_parquet)
    elif args.urls_file:
        seeds = seeds_src.from_text_file(spark, args.urls_file)
    elif args.urls:
        seeds = seeds_src.from_list(spark, args.urls)
    else:
        print("error: no seeds given (urls, --urls-file, or --seeds-parquet)", file=sys.stderr)
        return 2

    pages = pages_src.read_pages(spark, args.pages)
    cfg = CrawlConfig(
        rounds=args.rounds,
        mode=args.mode,
        max_urls_per_step=args.max_urls_per_step,
        host_budget=args.host_budget,
        max_retries=args.retries,
        use_bloom=not args.no_bloom,
        checkpoint_dir=args.checkpoint_dir,
        resume=args.resume,
    )
    state = ChainCrawl(spark, pages, cfg).run(seeds)
    log = ChainCrawl.fetch_log(state)

    if args.output and log is not None:
        if args.storage == "aggregated":
            sinks.write_aggregated_json(log, args.output)
        elif args.storage == "per-url":
            sinks.write_per_url_json(log, args.output)
        else:
            sinks.append_jsonl(log, args.output)

    total = sum(m["urls_processed"] for m in state.metrics)
    ok = sum(m["urls_succeeded"] for m in state.metrics)
    stats = {
        "total_urls": total,
        "successful": ok,
        "failed": total - ok,
        "rounds": len(state.metrics),
        "per_round": state.metrics,
    }
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
