"""spark-submit entry point — the engine's ops surface, mirroring the
reference CLI (reference cli.py:50-76) plus the distributed-only flags
(checkpoint/resume, budgets, rounds).

  python scripts/make_pyfiles.py          # builds dist/wcs.zip
  spark-submit --master <cluster> --py-files dist/wcs.zip jobs/crawl.py \\
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
    p.add_argument(
        "--pages-format",
        choices=["parquet", "iceberg", "table"],
        default="parquet",
        help="pages source: parquet path (default), iceberg table identifier"
        " (needs the iceberg-spark runtime jar), or catalog table name",
    )
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--mode", choices=["parity", "scale"], default="scale")
    p.add_argument("--max-urls-per-step", type=int, default=None)
    p.add_argument("--host-budget", type=int, default=None)
    p.add_argument("--retries", type=int, default=0, help="max retries (crawler.py:56)")
    p.add_argument("--no-bloom", action="store_true")
    p.add_argument(
        "--robots-parquet",
        help="(host, content) robots.txt table -> politeness rules "
        "(disallow prefixes + crawl-delay budgets)",
    )
    p.add_argument("--robots-round-seconds", type=float, default=60.0,
                   help="round window used to convert Crawl-delay to a budget")
    p.add_argument(
        "--dns-parquet",
        help="(host, ip) resolver table -> IP-grain politeness: vhosts "
        "sharing a server share one per-round budget (ignored when "
        "--robots-parquet supplies host-grain budget rules)",
    )
    p.add_argument("--checkpoint-dir")
    p.add_argument(
        "--checkpoint-gc",
        action="store_true",
        help="drop superseded heavy state snapshots after each commit "
        "(keeps results/deltas/markers; resume unchanged)",
    )
    p.add_argument("--resume", action="store_true")
    p.add_argument("--output", help="results sink path")
    p.add_argument(
        "--storage",
        choices=["aggregated", "jsonl", "per-url", "mongodb"],
        default="jsonl",
        help="sink flavor (cli.py --storage)",
    )
    # ---- reference cli.py:50-76 parity flags.  The fetch-shaped ones are
    # offline no-ops in this engine (fetch = join against the pages table;
    # there is no HTTP layer to configure) — they are ACCEPTED and warned
    # about so reference invocations run unmodified ----
    p.add_argument("--workers", type=int, default=None,
                   help="reference concurrency level (offline no-op: task slots rule)")
    p.add_argument("--timeout", type=int, default=None,
                   help="request timeout (offline no-op)")
    p.add_argument("--retry-delay", type=float, default=None,
                   help="base retry delay (offline analog: round demotion)")
    p.add_argument("--header", action="append",
                   help="request header 'Key: Value', repeatable (offline no-op)")
    p.add_argument("--user-agent", help="User-Agent override (offline no-op)")
    p.add_argument("--insecure", action="store_true",
                   help="disable SSL verification (offline no-op)")
    p.add_argument("--no-progress", action="store_true",
                   help="disable progress bar (driver logs are the progress surface)")
    p.add_argument("--no-proxy", action="store_true", help="disable proxy usage")
    p.add_argument("--proxy-file", help="load a proxy pool file (one per line)")
    p.add_argument("--validate-proxies", action="store_true",
                   help="summarize pool health before crawling")
    p.add_argument("--mongodb-uri", help="MongoDB connection string (mongodb storage)")
    p.add_argument("--mongodb-db", default="web_crawler")
    p.add_argument("--mongodb-collection", default="crawl_results")
    p.add_argument("--master", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def _parse_headers(header_args: list[str] | None) -> dict[str, str]:
    """Reference cli.py:19-28 'Key: Value' parsing (validated, then unused
    offline)."""
    headers: dict[str, str] = {}
    for h in header_args or []:
        if ":" not in h:
            raise SystemExit(f"Invalid header '{h}'. Expected 'Key: Value'.")
        k, v = h.split(":", 1)
        headers[k.strip()] = v.strip()
    return headers


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    headers = _parse_headers(args.header)
    for flag, val in [
        ("--workers", args.workers),
        ("--timeout", args.timeout),
        ("--retry-delay", args.retry_delay),
        ("--user-agent", args.user_agent),
        ("--header", headers or None),
        ("--insecure", args.insecure or None),
        ("--no-progress", args.no_progress or None),
    ]:
        if val is not None:
            print(
                f"warning: {flag} accepted for reference-CLI parity but is an "
                "offline no-op (fetch is a join against the pages table)",
                file=sys.stderr,
            )
    if args.storage == "mongodb" and not args.mongodb_uri:
        print("error: --mongodb-uri is required when --storage=mongodb", file=sys.stderr)
        return 2
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

    if args.proxy_file and not args.no_proxy:
        # offline analog of proxy import + optional validation summary
        # (reference cli.py:117-118, proxy_manager.py:331-352)
        from web_crawler_spark.sources import proxypool

        pool = proxypool.load_sources(spark, [args.proxy_file], fmt="plain")
        n_pool = pool.count()
        print(f"proxy pool loaded: {n_pool} entries", file=sys.stderr)
        if args.validate_proxies:
            empty_failed = spark.createDataFrame([], "proxy string")
            print(
                f"proxy validation summary: {proxypool.pool_stats(pool, empty_failed)}",
                file=sys.stderr,
            )

    pages = pages_src.read_pages(spark, args.pages, fmt=args.pages_format)
    cfg = CrawlConfig(
        rounds=args.rounds,
        mode=args.mode,
        max_urls_per_step=args.max_urls_per_step,
        host_budget=args.host_budget,
        max_retries=args.retries,
        use_bloom=not args.no_bloom,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_gc=args.checkpoint_gc,
        resume=args.resume,
    )
    host_rules = None
    if args.robots_parquet:
        from web_crawler_spark.sources import robots as robots_src

        host_rules = robots_src.host_rules_from_robots(
            spark.read.parquet(args.robots_parquet),
            default_budget=args.host_budget or 5,
            round_seconds=args.robots_round_seconds,
        )
    dns = spark.read.parquet(args.dns_parquet) if args.dns_parquet else None
    state = ChainCrawl(spark, pages, cfg, host_rules=host_rules, dns=dns).run(seeds)
    log = ChainCrawl.fetch_log(state)

    if log is not None and args.storage == "mongodb":
        uri, db, coll = args.mongodb_uri, args.mongodb_db, args.mongodb_collection

        def backend_factory():
            try:
                import pymongo  # type: ignore
            except ImportError as e:  # mirror storage.py:177's clear error
                raise ImportError(
                    "MongoDB storage requires 'pymongo' on the executors"
                ) from e
            return pymongo.MongoClient(uri)[db][coll]

        data_cols = [c for c in log.columns if c not in ("url",)]
        n = sinks.write_storage_backend(
            log, backend_factory, "2024-01-01 00:00:00", data_cols
        )
        print(f"mongodb: inserted {n} documents", file=sys.stderr)
    elif args.output and log is not None:
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
        "master": spark.sparkContext.master,
    }
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
