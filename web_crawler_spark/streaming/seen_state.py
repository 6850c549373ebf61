"""Custom stateful streaming operator: incremental URL-seen dedup via
``applyInPandasWithState``.

The batch engine's seen-set is a table + anti-join; the streaming analog keeps
the seen-set as *operator state*, hash-bucketed so each state key holds a
bounded shard: candidate urls are grouped by ``pmod(xxhash64(url), buckets)``
and each group's state stores the 64-bit hashes of every url it has ever
emitted.  A url is emitted exactly once across all micro-batches — the
streaming first-wins dedup — with state checkpointed/restored by the
Structured Streaming runtime (resume-for-free, matching the batch engine's
snapshot semantics).

State per bucket is a packed int64 numpy array (hashes, not strings): 8 bytes
per seen url, vectorized membership via ``np.isin`` — no per-row Python.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DEFAULT_BUCKETS = 64

OUTPUT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("bucket", LongType()),
    ]
)
# state: the bucket's seen url-hashes, packed as binary-ish long array
STATE_SCHEMA = StructType([StructField("hashes", ArrayType(LongType()))])


def _dedup_group(
    key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        (hashes_list,) = state.get
        seen = np.asarray(hashes_list, dtype=np.int64)
    else:
        seen = np.empty(0, dtype=np.int64)
    for pdf in pdfs:
        h = pdf["url_hash"].to_numpy(np.int64)
        # within-batch first-wins + against-state membership, vectorized
        mask_new = ~np.isin(h, seen)
        first_mask = ~pd.Series(h).duplicated(keep="first").to_numpy()
        emit = pdf[mask_new & first_mask]
        if len(emit):
            seen = np.concatenate([seen, emit["url_hash"].to_numpy(np.int64)])
            yield pd.DataFrame(
                {"url": emit["url"], "bucket": np.full(len(emit), key[0], dtype=np.int64)}
            )
    state.update((seen.tolist(),))


def streaming_seen_dedup(
    candidates: DataFrame, buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """candidates: a STREAMING DataFrame with a ``url`` column.  Returns the
    first-seen urls (exactly once across micro-batches)."""
    keyed = candidates.select(
        "url",
        F.xxhash64("url").alias("url_hash"),
        F.pmod(F.xxhash64("url"), F.lit(buckets)).alias("bucket"),
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_available_now(
    spark, in_dir: str, out_dir: str, checkpoint_dir: str, buckets: int = DEFAULT_BUCKETS
) -> None:
    """Process all files currently in ``in_dir`` (schema: url string),
    emitting never-before-seen urls to ``out_dir``; state persists in the
    stream checkpoint, so re-runs only emit genuinely new urls."""
    stream = spark.readStream.schema("url string").parquet(in_dir)
    deduped = streaming_seen_dedup(stream, buckets)
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
