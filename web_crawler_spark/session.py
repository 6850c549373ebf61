"""SparkSession factory tuned for the frontier engine.

Arrow on (all Python compute crosses as Arrow batches — no row-at-a-time
Python, SURVEY.md §7 hard-part 5), AQE on (broadcast-vs-SMJ selection, skew
splitting, shuffle-partition coalescing), shuffle partitions sized for the
local harness but overridable for cluster runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "web_crawler_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    # protobuf compat must be decided BEFORE the JVM gateway launches — the
    # transformWithState daemon inherits the JVM's env, captured once at
    # gateway launch.  scoped_pythonpath (around getOrCreate below) injects
    # the vendor paths for exactly that launch and restores the driver env
    # after, so nothing leaks into unrelated subprocesses (ADVICE r4).
    # (no-op fast path when google.protobuf is properly installed)
    from web_crawler_spark.streaming.pbcompat import (
        enable_protobuf_compat,
        scoped_pythonpath,
    )

    enable_protobuf_compat()
    # Python workers deserialize our UDFs by module reference, so the package
    # root must be importable in them regardless of the caller's cwd.  Local
    # mode: workers inherit the JVM env, captured at gateway launch => put
    # pkg_root on PYTHONPATH only for that launch (scoped below).  Cluster
    # mode: ship the package with spark-submit --py-files instead.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cpus = DEFAULT_CPUS
    # under spark-submit (gateway pre-launched => PYSPARK_GATEWAY_PORT set)
    # a None master must fall through to the submit-level --master; calling
    # .master() here would silently demote a cluster submit to local mode
    if master is None and "PYSPARK_GATEWAY_PORT" not in os.environ:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 32)
    b = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # pages rows carry ~2KB html binary; default 128MB splits leave a
        # 200MB local file at 2 tasks — size splits so scans parallelize
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        b = b.master(master)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    with scoped_pythonpath(extra=[pkg_root]):
        return b.getOrCreate()
