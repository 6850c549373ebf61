"""Result sinks — the reference's four storage backends re-expressed as
DataFrame writes (SURVEY.md §2.8).

| reference (storage.py)          | here                                     |
|---------------------------------|------------------------------------------|
| AggregatedStorage (RAM->1 JSON) | ``write_aggregated_json`` (coalesce(1))  |
| JSONLStorage (append + flush)   | ``append_jsonl`` (partitioned append)    |
| PerURLStorage (file per URL)    | ``write_per_url_json`` (hash-partitioned;|
|                                 | one-file-per-row is an anti-pattern at   |
|                                 | scale — kept for small parity runs only) |
| MongoDBStorage                  | ``foreachBatch`` plug point (optional)   |

Every sink stamps the envelope the reference writes —
``{url, ts, data}`` (storage.py:58) — but with a *per-round constant*
timestamp instead of ``datetime.now()`` per record (nondeterministic;
SURVEY.md §7 hard-part 6).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def with_envelope(df: DataFrame, round_ts: str, data_cols: list[str]) -> DataFrame:
    """Wrap result columns in the reference's storage envelope."""
    return df.select(
        "url",
        F.lit(round_ts).cast("timestamp").alias("ts"),
        F.struct(*[F.col(c) for c in data_cols]).alias("data"),
    )


def write_aggregated_json(df: DataFrame, path: str) -> None:
    """Single JSON-lines file (AggregatedStorage parity; small runs only —
    coalesce(1) funnels everything through one task by design)."""
    df.coalesce(1).write.mode("overwrite").json(path)


def append_jsonl(df: DataFrame, path: str) -> None:
    """Partitioned JSON-lines append — the scalable default (JSONLStorage)."""
    df.write.mode("append").json(path)


def write_per_url_json(df: DataFrame, path: str, buckets: int = 64) -> None:
    """Per-URL-addressable output: hash-bucketed by url so any url's record
    is findable by recomputing its bucket.  True file-per-row (md5-named
    files, storage.py:44-52) does not survive 10^10 rows; bucketing is the
    scale-safe equivalent."""
    (
        df.withColumn("bucket", F.pmod(F.xxhash64("url"), F.lit(buckets)))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .json(path)
    )


def foreach_batch_sink(df: DataFrame, handler: Callable[[pd.DataFrame], None]) -> int:
    """Custom-backend plug point (the StorageBackend ABC analog,
    storage.py:24-31): ``handler(pandas_batch)`` called per Arrow chunk on
    the executors — pandas-batched like every other Python crossing in the
    engine, never row-at-a-time.  Returns the number of rows routed.

    The handler runs ON THE EXECUTORS: it must write to an external system
    or shared storage (driver-side object mutations are lost).  For the
    reference's MongoDB-shaped ``insert_one`` envelope contract use
    ``write_storage_backend``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        for pdf in batches:
            if len(pdf):
                handler(pdf)
                n += len(pdf)
        yield pd.DataFrame({"n": [n]})

    counted = df.mapInPandas(run, schema="n long")
    return int(counted.agg(F.sum("n")).first()[0] or 0)


def write_storage_backend(
    df: DataFrame,
    backend_factory: Callable[[], object],
    round_ts: str,
    data_cols: list[str],
    batch_size: int | None = None,
) -> int:
    """Route results through a StorageBackend-shaped handler — the concrete
    MongoDB-adapter path (reference storage.py:153-199): one backend per
    partition (connection amortized, like the reference's lazy
    ``_ensure_connected``), ``insert_one({url, timestamp, data})`` per
    record with a RAW datetime timestamp (storage.py:189 stores
    ``datetime.now()``, not an isoformat string — here the deterministic
    per-round constant), then ``finalize()`` if the backend has one.
    ``backend_factory`` must be picklable (executors construct the backend;
    e.g. ``lambda: pymongo.MongoClient(uri)[db][coll]``-style wrapper).
    Returns the number of records inserted.

    ``batch_size``: when set and the backend exposes ``insert_many``, records
    are inserted in chunks of at most ``batch_size`` (one round-trip per
    chunk — what a real cluster wants); the documents are byte-identical to
    the ``insert_one`` envelopes.  Backends without ``insert_many`` (or
    ``batch_size=None``) keep the reference's per-record ``insert_one``
    contract (storage.py:189)."""
    env = with_envelope(df, round_ts, data_cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = backend_factory()
        many = batch_size if (batch_size and hasattr(backend, "insert_many")) else None
        n = 0
        buf: list[dict] = []
        for pdf in batches:
            for rec in pdf.to_dict("records"):
                ts = rec["ts"]
                ts = ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts
                doc = {"url": rec["url"], "timestamp": ts, "data": rec["data"]}
                if many:
                    buf.append(doc)
                    if len(buf) >= many:
                        backend.insert_many(buf)
                        buf = []
                else:
                    backend.insert_one(doc)
                n += 1
        if buf:
            backend.insert_many(buf)
        if hasattr(backend, "finalize"):
            backend.finalize()
        yield pd.DataFrame({"n": [n]})

    counted = env.mapInPandas(run, schema="n long")
    return int(counted.agg(F.sum("n")).first()[0] or 0)
