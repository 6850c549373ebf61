"""Round-4 LSH hot-band skew study (r3 VERDICT item 3): measure what an
identical-template clone burst does to the banded candidate self-join, with
AQE skew-join on vs off, and what the capped star join does instead.

Fixture: the sf documents table plus ``CLONE_FRAC`` identical-template
clones (every clone shares every band — the worst case).  For each
configuration we record wall time, output pair count, and the join-output
partition row-count histogram (the skew observable: one partition holding
the clique is the straggler task).

Usage: python scripts/skew_bench.py [sf_dir] [clone_frac]
Prints one JSON line; paste/append into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from web_crawler_spark.functions import dedupsim as ds  # noqa: E402
from web_crawler_spark.session import get_spark  # noqa: E402

TEMPLATE = (
    "breaking exclusive deal today only limited offer click subscribe now "
    "best price guaranteed free shipping worldwide order before midnight"
)


def partition_histogram(df) -> list:
    """Row count per output partition, descending (task-volume skew)."""
    counts = (
        df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    )
    return sorted(counts, reverse=True)


def run_case(spark, bands, capped: bool, skew_join: bool) -> dict:
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_join).lower())
    t0 = time.monotonic()
    pairs = (
        ds.lsh_candidate_pairs_capped(bands)
        if capped
        else ds.lsh_candidate_pairs(bands)
    )
    n = pairs.count()
    wall = round(time.monotonic() - t0, 2)
    hist = partition_histogram(pairs)
    return {
        "capped": capped,
        "aqe_skew_join": skew_join,
        "wall_s": wall,
        "n_pairs": n,
        "n_partitions": len(hist),
        "top_partition_rows": hist[:5],
        "max_over_median": round(
            hist[0] / max(hist[len(hist) // 2], 1), 1
        ) if hist else None,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    clone_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.15
    spark = get_spark(app_name="skew_bench")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    n_clones = int(n_docs * clone_frac)
    clones = docs.filter(F.col("doc_id") < n_clones).select(
        (F.col("doc_id") + F.lit(1_000_000_000)).alias("doc_id"),
        F.lit(TEMPLATE).alias("text"),
    )
    corpus = docs.unionByName(clones)
    bands = ds.lsh_bands(
        ds.minhash_signatures(ds.shingles(corpus))
    ).localCheckpoint(eager=True)  # isolate the join under test

    results = [
        run_case(spark, bands, capped=False, skew_join=False),
        run_case(spark, bands, capped=False, skew_join=True),
        run_case(spark, bands, capped=True, skew_join=True),
    ]
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "n_clones": n_clones,
                "cap": ds.MAX_BAND_DOCS,
                "cases": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
