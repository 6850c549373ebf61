"""One scaling-bench measurement at a given executor count (subprocess of
scaling_bench.py — each level gets a fresh JVM).

Cluster model: ``local-cluster[N,1,2048]`` — N separate single-core executor
JVM processes, each with its own Python worker.  This is the faithful sandbox
stand-in for "N executors on a cluster": process-level parallelism scales on
this box (verified: mp.Pool 4->16 procs = 4.0x), while thread-level
parallelism inside one JVM saturates around ~8 effective cores (a VM
scheduling artifact that would not exist across real cluster nodes).  Python
workers are warmed (daemon fork + pandas/numpy imports) before timing — cold
worker startup is a fixed cost per executor that a long-running cluster job
amortizes to zero.

Workloads (fixed input, independent of parallelism):
  * sched — the north-star scheduling op over an amplified candidate set:
    canonicalize (JVM fast-path mask; Arrow UDF only for the messy residue)
    -> seen anti-join before the dedup exchange -> first-wins dedup ->
    politeness budget rank (plans/schedule.py).
  * parse — the HTML extraction kernel over the amplified pages table.

Prints one JSON line {"cpus": N, "sched_sec": ..., "sched_rows": ...,
"parse_sec": ..., "parse_rows": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from web_crawler_spark import synth  # noqa: E402
from web_crawler_spark.functions import html_parse, urlnorm  # noqa: E402
from web_crawler_spark.plans.schedule import schedule_frontier  # noqa: E402
from web_crawler_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_exec = int(sys.argv[1])
    sf = sys.argv[2] if len(sys.argv) > 2 else "0.1"
    mult = int(os.environ.get("SPARK_GRAFT_SCALE_MULT", "16"))
    synth.ensure_synth(sf)
    extra = {
        # a cluster-sized job reads thousands of files; model that split
        # granularity so pre-shuffle stages aren't capped at 2-3 scan tasks
        "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
        "spark.executor.memory": "3g",
        # 2 cores per executor, 1 task slot: the Python worker and the JVM
        # scan/Arrow feed each get a core — realistic cluster slot sizing for
        # python-UDF-heavy stages
        "spark.task.cpus": "2",
    }
    if os.path.isdir("/dev/shm"):
        extra["spark.local.dir"] = "/dev/shm/wcs-shuffle"
    spark = get_spark(
        app_name=f"wcs-scaling-{n_exec}",
        master=f"local-cluster[{n_exec},2,3072]",
        shuffle_partitions=max(n_exec * 2, 8),
        extra_conf=extra,
    )

    # warm every executor's Python worker (fork + imports) and JVM codegen
    warm = spark.range(0, n_exec * 8, 1, n_exec * 8).select(
        urlnorm.canonicalize_udf(F.concat(F.lit("http://w.example/"), F.col("id").cast("string")))
    )
    warm.write.mode("overwrite").format("noop").save()

    meta = spark.read.parquet(synth.synth_path(sf, "pages_meta"))
    meta.count()

    workloads = set(
        os.environ.get("SPARK_GRAFT_SCALE_WORKLOADS", "sched,shuffle,parse").split(",")
    )
    out: dict[str, object] = {"cpus": n_exec}

    # ---- sched ----
    links = meta.select(
        F.xxhash64("url").alias("p0"), F.posexplode("links").alias("p1", "url")
    ).repartition(n_exec * 2)
    amplified = links.crossJoin(
        spark.range(mult).select(F.col("id").alias("v"))
    ).select(
        F.concat(F.col("url"), F.lit("?v="), F.col("v")).alias("url"),
        "p0",
        (F.col("p1") * mult + F.col("v")).cast("long").alias("p1"),
    )
    seen = meta.select(F.concat(F.col("url"), F.lit("?v=0")).alias("url"))
    # candidates arrive materialized from the (persisted) parse stage in the
    # engine; model that so the canonicalize split reads a materialized input
    amplified = amplified.localCheckpoint(eager=True)
    n_cand = amplified.count()

    if "sched" in workloads:
        t0 = time.time()
        cand = urlnorm.with_canonical_split(amplified).filter(F.col("url").isNotNull())
        batch = schedule_frontier(cand, seen, ["p0", "p1"], budget=1000)
        batch.write.mode("overwrite").format("noop").save()
        out["sched_sec"] = round(time.time() - t0, 3)
        out["sched_rows"] = n_cand

    # ---- shuffle control: 4 back-to-back full-data exchanges, no Python,
    # no aggregation — the isolated fabric-ceiling measurement (all executor
    # processes share ONE box's tmpfs + loopback; a real cluster adds
    # disks/NICs per node) ----
    if "shuffle" in workloads:
        t0 = time.time()
        ctl = amplified
        for key in ("url", "p0", "p1", "url"):
            ctl = ctl.repartition(max(n_exec * 2, 8), F.col(key))
        ctl.write.mode("overwrite").format("noop").save()
        out["shuffle_sec"] = round(time.time() - t0, 3)
        out["shuffle_rows"] = n_cand

    # ---- parse ----
    # amplify so total work is hundreds of core-seconds — at sandbox scale the
    # raw table is ~45 core-s and fixed startup costs would swamp the 4N level
    if "parse" in workloads:
        pages = spark.read.parquet(synth.synth_path(sf, "pages")).select("url", "html")
        amplified_pages = pages.crossJoin(
            spark.range(mult).select(F.col("id").alias("rep"))
        ).select(F.concat(F.col("url"), F.lit("#"), F.col("rep")).alias("url"), "html")
        n_pages = amplified_pages.count()
        t0 = time.time()
        html_parse.with_parsed(amplified_pages).select(
            "url", "parsed.links_count"
        ).write.mode("overwrite").format("noop").save()
        out["parse_sec"] = round(time.time() - t0, 3)
        out["parse_rows"] = n_pages

    print(json.dumps(out))


if __name__ == "__main__":
    main()
