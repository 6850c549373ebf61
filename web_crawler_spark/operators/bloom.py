"""Partitioned Bloom-filter prefilter for the URL-seen set (SURVEY.md §4 item 2).

At 10^10 frontier scale the exact ``left_anti`` join against ``url_seen``
shuffles every candidate link.  The Bloom sidecar cuts that shuffle volume:
definitely-unseen candidates (the vast majority of fresh links) skip the join
input entirely; only Bloom-positive rows (seen ∪ false positives) go through
the exact anti-join, which removes the false positives.  Semantics are owned
by the anti-join — the Bloom is purely a volume optimization, and
``tests/test_bloom.py`` asserts result-equivalence with the exact path.

Build is distributed: each partition folds its key hashes into a local bitmap
(numpy, vectorized) via ``mapInPandas``; the driver ORs the ~m/8-byte bitmaps
(1 MiB at m=2^23 — trivially collectable even from thousands of partitions)
and broadcasts the merged filter.  Probe is an Arrow-batched pandas UDF doing
pure numpy bit tests — no per-row Python.

Keys are 64-bit ``xxhash64(url)`` computed JVM-side; k index functions derive
from the split halves (Kirsch–Mitzenmacher double hashing).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, StructType, StructField, BinaryType

DEFAULT_BITS = 1 << 23  # 8M bits = 1 MiB; ~0.05% fp at 500k keys, k=7
DEFAULT_K = 7


def _indexes(hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) bit indexes via double hashing of the 64-bit key halves."""
    h = hashes.astype(np.uint64)
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = (h >> np.uint64(32)).astype(np.uint64) | np.uint64(1)  # odd => full cycle
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(np.int64)


def _fold_bitmap(hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    bits = np.zeros(m // 8, dtype=np.uint8)
    if len(hashes):
        idx = _indexes(hashes, m, k).ravel()
        np.bitwise_or.at(bits, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))
    return bits


def build_bloom(
    df: DataFrame, key_col: str = "url", m: int = DEFAULT_BITS, k: int = DEFAULT_K
) -> bytes:
    """Distributed build: per-partition numpy bitmaps, driver OR-merge."""
    hashed = df.select(F.xxhash64(F.col(key_col)).alias("h"))
    schema = StructType([StructField("bitmap", BinaryType(), False)])

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(m // 8, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if len(pdf):
                any_rows = True
                bits |= _fold_bitmap(pdf["h"].to_numpy(np.int64), m, k)
        if any_rows:
            yield pd.DataFrame({"bitmap": [bits.tobytes()]})

    merged = np.zeros(m // 8, dtype=np.uint8)
    for row in hashed.mapInPandas(fold, schema=schema).collect():
        merged |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return merged.tobytes()


def bloom_might_contain_udf(spark, bloom_bytes: bytes, m: int = DEFAULT_BITS, k: int = DEFAULT_K):
    """Pandas UDF over the JVM-computed xxhash64 key: vectorized numpy probe."""
    bc = spark.sparkContext.broadcast(bloom_bytes)

    @pandas_udf(BooleanType())
    def might_contain(h: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        hv = h.to_numpy(np.int64)
        idx = _indexes(hv, m, k)
        hit = (bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1).astype(bool))

    return might_contain


def bloom_prefilter(
    candidates: DataFrame,
    bloom_bytes: bytes | None,
    key_col: str = "url",
    m: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
) -> tuple[DataFrame, DataFrame]:
    """Split candidates into (definitely_unseen, maybe_seen).  The maybe_seen
    side still needs the exact anti-join; definitely_unseen skips it."""
    if bloom_bytes is None:
        return candidates.limit(0), candidates
    udf = bloom_might_contain_udf(candidates.sparkSession, bloom_bytes, m, k)
    tagged = candidates.withColumn("__maybe", udf(F.xxhash64(F.col(key_col))))
    fresh = tagged.filter(~F.col("__maybe")).drop("__maybe")
    maybe = tagged.filter(F.col("__maybe")).drop("__maybe")
    return fresh, maybe
