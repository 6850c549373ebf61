"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
the public MOSS algorithm): k-gram rolling hashes, then the minimum hash per
sliding window of w hashes.  Guarantees any shared substring of length
>= w + k - 1 between two documents yields at least one shared fingerprint —
the standard local-similarity / plagiarism primitive, complementing the
global-similarity MinHash in dedupsim.py.

Vectorized: one numpy pass per document inside an Arrow batch (polynomial
rolling hash via cumulative products is O(n) per doc, no python-per-char).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

K_GRAM = 8
WINDOW = 6
_BASE = np.uint64(1000003)
_MASK = np.uint64((1 << 61) - 1)


def _kgram_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """Polynomial hashes of every k-byte gram, vectorized: h[i] =
    sum_{j<k} data[i+j] * BASE^(k-1-j)  (mod 2^64, masked to 61 bits)."""
    n = len(data)
    if n < k:
        return np.array([], dtype=np.uint64)
    d = data.astype(np.uint64)
    powers = np.empty(k, dtype=np.uint64)
    powers[k - 1] = np.uint64(1)
    with np.errstate(over="ignore"):  # wraparound mod 2^64 is intentional
        for j in range(k - 2, -1, -1):
            powers[j] = powers[j + 1] * _BASE
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    # uint64 wraparound (mod 2^64) is the hash definition here — silence the
    # expected overflow warning so real warnings stay visible
    with np.errstate(over="ignore"):
        for j in range(k):  # k tiny (8): k vectorized adds over the whole doc
            acc += d[j : n - k + 1 + j] * powers[j]
    return acc & _MASK


def winnow_fingerprints(text: str, k: int = K_GRAM, w: int = WINDOW) -> list[int]:
    """Distinct winnowed fingerprints of a document, sorted."""
    data = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)
    hashes = _kgram_hashes(data, k)
    if len(hashes) == 0:
        return []
    if len(hashes) <= w:
        return [int(hashes.min())]
    view = np.lib.stride_tricks.sliding_window_view(hashes, w)
    mins = view.min(axis=1)
    return sorted({int(x) for x in mins})


def naive_winnow_fingerprints(text: str, k: int = K_GRAM, w: int = WINDOW) -> list[int]:
    """Independent per-row reimplementation (plain Python ints, no numpy) used
    as the differential oracle for the vectorized path: same k-gram polynomial
    hash mod 2^64 masked to 61 bits, same window-min rule, distinct sorted."""
    data = text.lower().encode("utf-8")
    n = len(data)
    base, mask64, mask61 = 1000003, (1 << 64) - 1, (1 << 61) - 1
    if n < k:
        return []
    powers = [1] * k
    for j in range(k - 2, -1, -1):
        powers[j] = (powers[j + 1] * base) & mask64
    hashes = []
    for i in range(n - k + 1):
        h = 0
        for j in range(k):
            h = (h + data[i + j] * powers[j]) & mask64
        hashes.append(h & mask61)
    if len(hashes) <= w:
        return [min(hashes)]
    mins = {min(hashes[i : i + w]) for i in range(len(hashes) - w + 1)}
    return sorted(mins)


@pandas_udf(ArrayType(LongType()))
def winnow_udf(texts: pd.Series) -> pd.Series:
    out = []
    for t in texts:
        if t is None:
            out.append(None)
        else:
            # mask to 61 bits keeps values inside signed int64 for Spark
            out.append(winnow_fingerprints(t))
    return pd.Series(out)


def with_winnow(df: DataFrame, text_col: str = "text", out: str = "winnow_fp") -> DataFrame:
    return df.withColumn(out, winnow_udf(F.col(text_col)))


MAX_FP_DOC_FREQ = 128  # postings-list prune: a fingerprint in > this many
# docs is boilerplate (headers/footers/license blocks), contributes k² join
# rows, and carries no discriminative signal — standard df-cut (cf. MOSS)


def shared_fingerprint_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 2,
    max_doc_freq: int | None = MAX_FP_DOC_FREQ,
) -> DataFrame:
    """Candidate local-overlap pairs: docs sharing >= min_shared winnowed
    fingerprints (explode -> self-join on fingerprint -> count).

    Scale shape: the exploded fingerprint frame is MATERIALIZED before the
    self-join (a DataFrame self-join re-executes unmaterialized branches, so
    the winnow UDF would otherwise run twice over the corpus), and
    fingerprints with document frequency > ``max_doc_freq`` are dropped
    before pairing — without the cap a fingerprint shared by k docs emits k²
    pre-aggregation rows, and near-universal boilerplate fingerprints blow
    up at corpus scale.  The df-count window partitions by fp, and the
    self-join joins on fp: one exchange, reused by both (ReuseExchange)."""
    fp = (
        with_winnow(df)
        .select(F.col(id_col).alias("doc_id"), F.explode("winnow_fp").alias("fp"))
        .localCheckpoint(eager=True)  # one winnow UDF pass, ever
    )
    if max_doc_freq is not None:
        from pyspark.sql import Window

        fp = fp.withColumn(
            "__df", F.count("*").over(Window.partitionBy("fp"))
        ).filter(F.col("__df") <= max_doc_freq).drop("__df")
    return (
        fp.alias("l")
        .join(fp.alias("r"), on=[F.col("l.fp") == F.col("r.fp"), F.col("l.doc_id") < F.col("r.doc_id")])
        .groupBy(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
