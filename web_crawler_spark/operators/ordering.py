"""Scale-correct dense global sequencing.

The reference's FIFO queue gives every URL an implicit global position
(reference crawler.py:302-306); reproducing that order distributed needs a
dense 0-based sequence over a total sort key.  A single-partition
``row_number() over (order by ...)`` is the classic anti-pattern (the whole
round funnels through one task), so this implements the two-job range-partition
technique:

  1. ``repartitionByRange`` on the sort key + ``sortWithinPartitions`` — each
     partition holds a contiguous, sorted key range;
  2. count rows per partition (tiny aggregate, collected to the driver),
     prefix-sum into per-partition offsets, broadcast;
  3. ``mapInPandas`` adds ``seq = offset[pid] + local_index`` — Arrow-batched,
     no per-row Python.

Deterministic when the sort key is a total key (ties never straddle a round's
identity).  Cost: one range-partition shuffle + one pass — O(n/p) per task at
any scale, vs O(n) on one task for the naive window.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType


def with_global_seq(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "seq",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a dense global sequence (start, start+1, ...) in the total order
    of ``order_cols``.

    The intermediate range-partitioned frame must be cached across the two
    passes (count + sequence-stamp); DataFrame cache entries are pinned in
    Spark's CacheManager and are NOT GC-cleaned, so the output is eagerly
    localCheckpointed and the intermediate explicitly unpersisted before
    returning — a loop calling this every round (the crawl engine) holds
    zero cached plans between rounds.  The eager materialization is not
    extra work for such callers: they need an action on the batch anyway,
    and the checkpoint doubles as lineage truncation."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = max(2, spark.sparkContext.defaultParallelism)
    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offsets_bc = spark.sparkContext.broadcast(offsets)

    out_schema = StructType(
        [f for f in df.schema.fields] + [StructField(out_col, LongType(), False)]
    )
    in_cols = [f.name for f in df.schema.fields]

    def add_seq(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = offsets_bc.value[int(pdf["__pid"].iloc[0])]
            out = pdf[in_cols].copy()
            out[out_col] = range(base + local, base + local + len(pdf))
            local += len(pdf)
            yield out

    out = ranged.mapInPandas(add_seq, schema=out_schema).localCheckpoint(eager=True)
    ranged.unpersist()
    return out


def with_prefix_sums(
    df: DataFrame,
    order_cols: list[str],
    sum_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach EXCLUSIVE prefix sums of ``sum_cols`` in the total order of
    ``order_cols`` — the running-total primitive behind rank-statistic
    evaluation (AUC), CDF/quantile tables, and water-level searches.

    Same two-job range-partition shape as :func:`with_global_seq` (never a
    single-partition ``sum() over (order by ...)``): per-partition totals
    are a tiny collected aggregate prefix-summed on the driver and
    broadcast; the stamp pass is one Arrow-batched scan adding
    ``{c}_before`` = sum of ``c`` over rows STRICTLY earlier in the total
    order.  Ties in ``order_cols`` must not straddle row identity (callers
    aggregate to one row per key first — range partitioning routes equal
    keys to one partition, but intra-key "before" would be arbitrary).

    Cache discipline mirrors with_global_seq: eager localCheckpoint of the
    output, explicit unpersist of the ranged intermediate."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = max(2, spark.sparkContext.defaultParallelism)
    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    partials = {
        r["__pid"]: [r[f"__s_{c}"] or 0 for c in sum_cols]
        for r in ranged.groupBy("__pid")
        .agg(*[F.sum(c).alias(f"__s_{c}") for c in sum_cols])
        .collect()
    }
    offsets, acc = {}, [0] * len(sum_cols)
    for pid in sorted(partials):
        offsets[pid] = list(acc)
        acc = [a + p for a, p in zip(acc, partials[pid])]
    offsets_bc = spark.sparkContext.broadcast(offsets)

    out_schema = StructType(
        [f for f in df.schema.fields]
        + [StructField(f"{c}_before", LongType(), False) for c in sum_cols]
    )
    in_cols = [f.name for f in df.schema.fields]

    def add_prefix(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = list(offsets_bc.value[int(pdf["__pid"].iloc[0])])
            out = pdf[in_cols].copy()
            for i, c in enumerate(sum_cols):
                vals = pdf[c].fillna(0).astype("int64")
                out[f"{c}_before"] = run[i] + vals.cumsum() - vals
                run[i] += int(vals.sum())
            yield out

    out = ranged.mapInPandas(add_prefix, schema=out_schema).localCheckpoint(
        eager=True
    )
    ranged.unpersist()
    return out


def fair_interleave(
    batch: DataFrame,
    order_cols: list[str],
    rank_col: str = "host_rank",
    limit: int | None = None,
    out_col: str = "fetch_seq",
) -> DataFrame:
    """Round-robin-across-hosts fetch order: the global sequence sorts by
    (host_rank, *order_cols), so every host's rank-1 candidate precedes any
    host's rank-2 — a hot host cannot occupy the head of the fetch queue
    (head-of-line fairness), and a global ``limit`` takes the fairest
    prefix instead of one host's run.

    Scale shape: ``limit`` compiles to TakeOrderedAndProject (per-partition
    partial top-k before the single-row-stream take), and the dense
    sequence is the two-job range-partition stamp (with_global_seq) — no
    single-partition window anywhere.  Input is the budget batch, already
    bounded at hosts x budget rows."""
    keys = [rank_col] + list(order_cols)
    df = batch
    if limit is not None:
        df = df.orderBy(*[F.col(c) for c in keys]).limit(limit)
    return with_global_seq(df, keys, out_col=out_col)
