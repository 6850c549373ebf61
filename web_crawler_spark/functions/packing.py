"""Sequence packing for LLM training: concatenate the corpus in a
deterministic total order and chunk the token stream into fixed-size context
windows (GPT-style packing) — every document gets its global token offset
and the id of the training sequence its first token lands in.

A global cumulative sum is the textbook single-partition-window anti-pattern
(``sum() over (order by ...)`` funnels the corpus through one task), so this
reuses the engine's two-job range-partition technique
(operators/ordering.py): range-partition on the order key, per-partition
token SUBTOTALS to the driver (one tiny row per partition), prefix-sum into
exclusive offsets, broadcast, then an Arrow-batched per-partition cumsum.
O(n/p) per task at any scale; deterministic because the order key
(md5 of the doc id) is total and tie-free — the same doc lands at the same
offset on any cluster, any retry, any resume.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

PACK_CTX = 2048


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ctx: int = PACK_CTX,
    num_partitions: int | None = None,
) -> DataFrame:
    """Output: (doc_id, n_tokens, tok_offset, seq_id) where tok_offset is the
    document's exclusive global token offset in md5(doc_id) order and
    seq_id = tok_offset // ctx (the training sequence holding its first
    token; a document may span into following sequences).

    Same cache discipline as operators/ordering.with_global_seq: the
    range-partitioned frame persists across the subtotal and stamp passes,
    the output is eagerly localCheckpointed, and the intermediate is
    unpersisted before returning."""
    spark = df.sparkSession
    t = F.col(text_col)
    n_tok = (
        F.when(F.length(F.trim(t)) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(t), r"\s+")))
        .cast("long")
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("__k"),
    )
    if num_partitions is None:
        num_partitions = max(2, spark.sparkContext.defaultParallelism)
    ranged = (
        base.repartitionByRange(num_partitions, F.col("__k"))
        .sortWithinPartitions("__k")
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    sums = {
        r["__pid"]: r["s"] or 0
        for r in ranged.groupBy("__pid").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    offsets_bc = spark.sparkContext.broadcast(offsets)

    schema = StructType(
        [
            StructField("doc_id", ranged.schema["doc_id"].dataType, False),
            StructField("n_tokens", LongType(), False),
            StructField("tok_offset", LongType(), False),
            StructField("seq_id", LongType(), False),
        ]
    )

    def stamp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = offsets_bc.value[int(pdf["__pid"].iloc[0])]
            csum = pdf["n_tokens"].cumsum()
            start = (run + csum - pdf["n_tokens"]).astype("int64")
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pdf["n_tokens"].astype("int64"),
                    "tok_offset": start,
                    "seq_id": start // ctx,
                }
            )
            run = run + int(csum.iloc[-1])
            yield out

    out = ranged.mapInPandas(stamp, schema=schema).localCheckpoint(eager=True)
    ranged.unpersist()
    return out


def duck_pack_sequences_sql(table: str, ctx: int = PACK_CTX) -> str:
    return rf"""
WITH t AS (
  SELECT doc_id,
         len(CASE WHEN trim(text) = '' THEN []
                  ELSE regexp_split_to_array(trim(text), '\s+') END)::BIGINT AS n_tokens,
         md5(doc_id::VARCHAR) AS k
  FROM {table}
)
SELECT doc_id, n_tokens,
  coalesce(sum(n_tokens) OVER (
    ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  ), 0)::BIGINT AS tok_offset,
  (coalesce(sum(n_tokens) OVER (
    ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  ), 0) // {ctx})::BIGINT AS seq_id
FROM t
"""
