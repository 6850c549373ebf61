"""transformWithStateInPandas streaming job as its OWN spark-submit /
python entry point.

Why a dedicated process: the Spark-4 stateful-processor daemon inherits
the env of the JVM, which is captured once at gateway launch.  When a
hosting process (grading harness, notebook, Airflow task) creates its
SparkSession BEFORE importing this repo, that JVM lacks the protobuf
vendor paths pbcompat injects and the in-session TWS query dies with
"driver worker exited unexpectedly".  This job imports the repo — and so
runs ``pbcompat`` — before any JVM exists, making the daemon env right by
construction.  ``streaming.tws_state.run_tws`` fails over to this job
automatically when it detects a pre-shim JVM.

Example (cluster):
  spark-submit --py-files dist/web_crawler_spark.zip jobs/tws.py \
      --input s3://crawl/frontier_in --output s3://crawl/tws_out \
      --checkpoint s3://crawl/tws_ck

Offline (sandbox): python jobs/tws.py --input in/ --output out/ --checkpoint ck/
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# pbcompat must win before ANY JVM launches in this process — importing the
# session factory is enough (get_spark applies it), but be explicit:
from web_crawler_spark.streaming.pbcompat import enable_protobuf_compat  # noqa: E402

enable_protobuf_compat()

from web_crawler_spark.session import get_spark  # noqa: E402
from web_crawler_spark.streaming.tws_state import run_tws_available_now  # noqa: E402


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Per-host frontier accounting via transformWithStateInPandas"
    )
    p.add_argument("--input", required=True, help="streaming source dir (parquet, url string)")
    p.add_argument("--output", required=True, help="per-batch emissions sink (parquet)")
    p.add_argument("--checkpoint", required=True, help="streaming checkpoint dir")
    p.add_argument("--cpus", type=int, default=8)
    p.add_argument("--shuffle-partitions", type=int, default=8)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    t0 = time.monotonic()
    spark = get_spark(
        app_name="wcs-tws",
        master=None if "PYSPARK_GATEWAY_PORT" in os.environ else f"local[{args.cpus}]",
        shuffle_partitions=args.shuffle_partitions,
    )
    try:
        run_tws_available_now(spark, args.input, args.output, args.checkpoint)
        n_rows = spark.read.parquet(args.output).count()
    finally:
        spark.stop()
    print(json.dumps({
        "job": "tws",
        "input": args.input,
        "output": args.output,
        "emitted_rows": int(n_rows),
        "wall_s": round(time.monotonic() - t0, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
