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

State per bucket keeps the packed int64 hash array as the vectorized fast
path (``np.isin``, 8 bytes/url) PLUS the url strings: a hash hit is only a
*candidate* duplicate and is confirmed by exact url membership before the
row is dropped — at ~10^10 urls a few 64-bit collisions are expected, and a
hash-only seen set would silently lose distinct urls (the batch engine's
rule in operators/dedup.py: membership is never hash/Bloom-only).
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
# state: the bucket's seen url-hashes (fast prefilter) + the urls themselves
# (exact membership — collisions must not drop distinct urls)
STATE_SCHEMA = StructType(
    [
        StructField("hashes", ArrayType(LongType())),
        StructField("urls", ArrayType(StringType())),
    ]
)


def _dedup_batch(
    seen_hashes: np.ndarray, seen_urls: set, pdf: pd.DataFrame
) -> np.ndarray:
    """Pure core (unit-testable without a streaming runtime): the emit mask
    for one batch.  Hash membership is only a prefilter; rows whose hash hits
    are confirmed against the exact url set before being dropped."""
    h = pdf["url_hash"].to_numpy(np.int64)
    maybe_seen = np.isin(h, seen_hashes)
    first_mask = ~pdf["url"].duplicated(keep="first").to_numpy()
    if maybe_seen.any():
        confirmed = pdf["url"].isin(seen_urls).to_numpy()
    else:
        confirmed = np.zeros(len(pdf), dtype=bool)
    return ~confirmed & first_mask


def _dedup_group(
    key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        hashes_list, urls_list = state.get
        seen_h = np.asarray(hashes_list, dtype=np.int64)
        seen_u = list(urls_list)
    else:
        seen_h = np.empty(0, dtype=np.int64)
        seen_u = []
    seen_set = set(seen_u)
    for pdf in pdfs:
        emit = pdf[_dedup_batch(seen_h, seen_set, pdf)]
        if len(emit):
            seen_h = np.concatenate([seen_h, emit["url_hash"].to_numpy(np.int64)])
            seen_u.extend(emit["url"])
            seen_set.update(emit["url"])
            yield pd.DataFrame(
                {"url": emit["url"], "bucket": np.full(len(emit), key[0], dtype=np.int64)}
            )
    state.update((seen_h.tolist(), seen_u))


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
