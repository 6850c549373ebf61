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
    key_col=None,
) -> DataFrame:
    """Output: (doc_id, n_tokens, tok_offset, seq_id) where tok_offset is the
    document's exclusive global token offset in ``key_col`` order (default:
    md5(doc_id) — a deterministic shuffle) and seq_id = tok_offset // ctx
    (the training sequence holding its first token; a document may span
    into following sequences).

    ``key_col``: any deterministic Column over ``df`` — e.g. a semantic
    signature so related documents land in the same context window (the
    in-context-pretraining ordering).  Ties always break on md5(doc_id),
    keeping the global order total whatever the key's collision rate.

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
    tiebreak = F.md5(F.col(id_col).cast("string"))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tokens"),
        (tiebreak if key_col is None else key_col).alias("__k"),
        tiebreak.alias("__k2"),
    )
    if num_partitions is None:
        num_partitions = max(2, spark.sparkContext.defaultParallelism)
    ranged = (
        base.repartitionByRange(num_partitions, F.col("__k"), F.col("__k2"))
        .sortWithinPartitions("__k", "__k2")
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


def duck_pack_sequences_sql(
    table: str, ctx: int = PACK_CTX, key_sql: str | None = None
) -> str:
    key = key_sql if key_sql is not None else "md5(doc_id::VARCHAR)"
    return rf"""
WITH t AS (
  SELECT doc_id,
         len(CASE WHEN trim(text) = '' THEN []
                  ELSE regexp_split_to_array(trim(text), '\s+') END)::BIGINT AS n_tokens,
         {key} AS k,
         md5(doc_id::VARCHAR) AS k2
  FROM {table}
)
SELECT doc_id, n_tokens,
  coalesce(sum(n_tokens) OVER (
    ORDER BY k, k2 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  ), 0)::BIGINT AS tok_offset,
  (coalesce(sum(n_tokens) OVER (
    ORDER BY k, k2 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  ), 0) // {ctx})::BIGINT AS seq_id
FROM t
"""


# --- semantic packing key (in-context-pretraining ordering) -------------------
#
# Shi et al. 2023 ("In-Context Pretraining") show LMs train better when the
# documents sharing a context window are RELATED, not random.  At corpus
# scale the practical ordering is a locality-sensitive sort: documents with
# similar embeddings receive equal (or near-equal) sort keys, so the global
# token-offset pass — unchanged — packs semantic neighbors into the same
# ctx-token sequence.
#
# Determinism contract: sign-LSH over floats risks cross-engine sign flips
# when a projection lands within float-epsilon of zero, so the key uses the
# engine's integer discipline end-to-end: embeddings quantize to
# floor(v * 1000) BIGINTs (float32 -> double -> *1000 -> floor is exact
# IEEE in both engines) and project onto md5-derived INTEGER weights in
# [-1000, 1000]; the bit is proj > 0 on a BIGINT.  Bit-identical keys in
# Spark and DuckDB, no epsilon anywhere.

SEM_PLANES = 10
SEM_QUANT = 1000


def _sem_weight(plane: int, dim: int) -> int:
    import hashlib

    h = hashlib.md5(f"sem{plane}:dim{dim}".encode()).hexdigest()[:8]
    return int(h, 16) % (2 * SEM_QUANT + 1) - SEM_QUANT


def semantic_sort_key(vec_col, n_dims: int, n_planes: int = SEM_PLANES):
    """BIGINT sign-signature of the quantized embedding — equal keys =
    same semantic bucket; JVM higher-order expressions only."""
    q = F.transform(
        vec_col.cast("array<double>"),
        lambda x: F.floor(x * SEM_QUANT).cast("long"),
    )
    acc = F.lit(0).cast("long")
    for p in range(n_planes):
        w = F.array(
            *[F.lit(_sem_weight(p, d)).cast("long") for d in range(n_dims)]
        )
        proj = F.aggregate(
            F.zip_with(q, w, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda s, x: s + x,
        )
        acc = acc + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return acc


def duck_semantic_key_sql(
    vec_expr: str, n_dims: int, n_planes: int = SEM_PLANES
) -> str:
    """DuckDB twin of :func:`semantic_sort_key` over a FLOAT[] column."""
    planes = []
    for p in range(n_planes):
        w = ", ".join(str(_sem_weight(p, d)) for d in range(n_dims))
        planes.append(
            f"(CASE WHEN list_sum(list_transform(range(1, {n_dims + 1}),"
            f" d -> floor(({vec_expr})[d]::DOUBLE * {SEM_QUANT})::BIGINT"
            f" * ([{w}]::BIGINT[])[d])) > 0 THEN {1 << p} ELSE 0 END)"
        )
    return "(" + " + ".join(planes) + ")::BIGINT"


# --- length-bucketed batch planning (padded fine-tuning) ----------------------
#
# Packing suits pretraining; padded fine-tuning instead batches WHOLE
# documents and pays max(len)-len padding per batch member.  The standard
# mitigation is length bucketing: route each document to its power-of-two
# length bucket, sort within the bucket, and cut fixed-size batches — waste
# is then bounded by the bucket's 2x spread and in practice collapses,
# because neighbours in the sorted order have near-equal lengths.
#
# The padding-waste number this produces is the input to the real capacity
# decision (tokens billed vs tokens learned), so it must be exact: every
# output column is BIGINT arithmetic over the same whitespace token count
# the rest of the corpus layer uses.

BATCH_SIZE = 32


def bucket_batches(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = BATCH_SIZE,
    num_partitions: int | None = None,
) -> DataFrame:
    """Batch plan: (len_bucket, batch_id, n_docs, max_tokens, sum_tokens,
    pad_tokens) — documents grouped into power-of-two length buckets
    (bucket b holds 2^(b-1) <= n_tokens < 2^b; 0 = empty docs), sorted
    within each bucket by (n_tokens, md5(doc_id)) — a total, engine-portable
    order — and cut into consecutive batches of ``batch_size``.  Per batch:
    pad_tokens = n_docs * max_tokens - sum_tokens, the exact padding the
    trainer pays when every member pads to the batch max.

    Scale shape: a per-bucket ``row_number`` window would funnel each
    bucket (a corpus-scale partition — there are only ~60 buckets) through
    ONE task, so the rank comes from the engine's two-job range-partition
    sequencer over the composite key (bucket, n_tokens, tiebreak) plus a
    broadcast ~60-row bucket-start join: rank_in_bucket = global_seq -
    min(seq) over the bucket.  O(n/p) per task at any corpus size; the
    final rollup is a partial-agg'd groupBy at batch grain."""
    from web_crawler_spark.operators import ordering

    t = F.col(text_col)
    n_tok = (
        F.when(F.length(F.trim(t)) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(t), r"\s+")))
        .cast("long")
    )
    bucket = (
        F.when(n_tok == 0, F.lit(0))
        .otherwise(F.length(F.conv(n_tok.cast("string"), 10, 2)))
        .cast("long")
    )
    base = df.select(
        n_tok.alias("n_tokens"),
        bucket.alias("len_bucket"),
        F.md5(F.col(id_col).cast("string")).alias("__tie"),
    )
    seq = ordering.with_global_seq(
        base,
        ["len_bucket", "n_tokens", "__tie"],
        out_col="__seq",
        num_partitions=num_partitions,
    )
    starts = seq.groupBy(F.col("len_bucket").alias("__b")).agg(
        F.min("__seq").alias("__start")
    )
    ranked = seq.join(
        F.broadcast(starts), on=F.col("len_bucket") == F.col("__b")
    ).withColumn(
        "batch_id",
        F.floor((F.col("__seq") - F.col("__start")) / F.lit(batch_size)).cast("long"),
    )
    return (
        ranked.groupBy("len_bucket", "batch_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
        )
        .withColumn(
            "pad_tokens",
            (F.col("n_docs") * F.col("max_tokens") - F.col("sum_tokens")).cast("long"),
        )
    )


def duck_bucket_batches_sql(table: str, batch_size: int = BATCH_SIZE) -> str:
    return rf"""
WITH t AS (
  SELECT len(CASE WHEN trim(text) = '' THEN []
                  ELSE regexp_split_to_array(trim(text), '\s+') END)::BIGINT AS n_tokens,
         md5(doc_id::VARCHAR) AS tie
  FROM {table}
),
b AS (
  SELECT n_tokens,
         CASE WHEN n_tokens = 0 THEN 0
              ELSE length(bin(n_tokens)) END::BIGINT AS len_bucket,
         tie
  FROM t
),
r AS (
  SELECT len_bucket, n_tokens,
         ((row_number() OVER (PARTITION BY len_bucket
                              ORDER BY n_tokens, tie) - 1)
          // {batch_size})::BIGINT AS batch_id
  FROM b
)
SELECT len_bucket, batch_id,
       count(*)::BIGINT AS n_docs,
       max(n_tokens)::BIGINT AS max_tokens,
       sum(n_tokens)::BIGINT AS sum_tokens,
       (count(*) * max(n_tokens) - sum(n_tokens))::BIGINT AS pad_tokens
FROM r GROUP BY 1, 2
"""
