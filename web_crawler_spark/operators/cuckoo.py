"""Sharded cuckoo-filter URL-seen sidecar — the deletable alternative to the
Bloom prefilter (SURVEY.md §2.3 F2; the north-star design names a
"bloom/cuckoo URL-seen set" and this is the cuckoo half).

Same contract as ``operators.bloom``: the sketch is a pure volume
optimization in front of the exact ``left_anti`` join — definitely-unseen
candidates skip the join input; sketch-positive rows still go through the
exact check, which owns semantics.  Equivalence with the exact path is
pytest-asserted just like the Bloom.

Why a cuckoo filter at all (Fan, Andersen, Kaminsky, Mitzenmacher,
"Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014):

* **Deletion.**  A Bloom cannot un-see a URL; a cuckoo filter removes one
  stored fingerprint copy per delete.  Recrawl scheduling (freshness-driven
  re-fetch) and retry eviction both want exactly that: drop the URL from the
  sidecar and the next scheduling round treats it as new without rebuilding
  the whole sketch.
* **Lower fp at the same space.**  4-slot buckets with 16-bit fingerprints
  give ~2*SLOTS/2^16 ≈ 0.012% false positives at ~2.2 bytes/key, vs ~0.8%
  for the 10-bits/key Bloom.

Layout: ``n_shards`` independent tables of ``buckets_per_shard`` (power of
two) buckets × ``SLOTS`` uint16 fingerprints (0 = empty).  Shard routing is
``hash % n_shards`` (the Bloom's convention); bucket₁ is masked from the
post-shard hash bits, bucket₂ = bucket₁ XOR murmur(fingerprint) — an
involution, so a stored fingerprint's alternate bucket is computable from
where it sits.  Keys a bounded eviction walk cannot place land in a tiny
per-shard stash (membership- and delete-checked), so the filter NEVER false
negatives regardless of load.

Build is distributed: keys hash JVM-side (``xxhash64``), the 8-byte hashes
repartition by shard id, and each task builds its shards' tables whole with
vectorized numpy placement (rank-th pending key takes the rank-th empty
slot of its bucket; eviction swaps one victim per full bucket per round).
Hash partitioning never splits a shard across tasks, so tables need no
merge — unlike Bloom bitmaps, cuckoo tables are not OR-mergeable, which is
why the build is shard-parallel rather than partition-parallel (parallelism
= n_shards; at the 10^10-key design point that is hundreds of tasks).
Incremental maintenance at scale pairs with the bucketed seen store: shard
boundaries align with store buckets, so appending a round's delta rebuilds
only the touched shards from their buckets — O(bucket), not O(seen).

Probe is an Arrow-batched pandas UDF doing pure numpy compares on the
broadcast tables — no per-row Python anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    StructField,
    StructType,
)

SLOTS = 4
FP_MULT = np.uint64(0x5BD1E995)  # odd Murmur constant for the partner bucket
TARGET_LOAD = 0.90  # sizing target; (2,4)-cuckoo sustains ~0.95
MAX_KICK_ROUNDS = 256
MAX_SHARD_BYTES = 256 << 20
MIN_BUCKETS = 1 << 12  # floor: 4096 buckets = 16k slots = 32 KiB


@dataclass(frozen=True)
class CuckooParams:
    buckets_per_shard: int  # power of two
    n_shards: int

    @property
    def shard_bytes(self) -> int:
        return self.buckets_per_shard * SLOTS * 2

    @property
    def total_slots(self) -> int:
        return self.buckets_per_shard * SLOTS * self.n_shards


def params_for(
    n_keys: int,
    target_load: float = TARGET_LOAD,
    max_shard_bytes: int = MAX_SHARD_BYTES,
    min_buckets: int = MIN_BUCKETS,
) -> CuckooParams:
    """Size from the expected key count: total slots = next power-of-two
    bucket count >= n_keys / target_load, split into the fewest power-of-two
    shards keeping any one table <= max_shard_bytes."""
    want_buckets = max(min_buckets, -(-int(n_keys / target_load) // SLOTS))
    total = 1
    while total < want_buckets:
        total <<= 1
    n_shards = 1
    while (total // n_shards) * SLOTS * 2 > max_shard_bytes:
        n_shards <<= 1
    return CuckooParams(buckets_per_shard=total // n_shards, n_shards=n_shards)


def _fingerprint(h: np.ndarray) -> np.ndarray:
    fp = ((h.astype(np.uint64) >> np.uint64(48)) & np.uint64(0xFFFF)).astype(
        np.uint16
    )
    fp[fp == 0] = 1  # 0 is the empty-slot sentinel
    return fp


def _bucket1(h: np.ndarray, n_shards: int, n_buckets: int) -> np.ndarray:
    shard_bits = int(n_shards - 1).bit_length()
    return (
        (h.astype(np.uint64) >> np.uint64(shard_bits)) % np.uint64(n_buckets)
    ).astype(np.int64)


def _alt(b: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    """Partner bucket — XOR form, an involution: _alt(_alt(b)) == b."""
    mix = (fp.astype(np.uint64) * FP_MULT) & np.uint64(n_buckets - 1)
    return (b.astype(np.uint64) ^ mix).astype(np.int64)


def _shard_of(h: np.ndarray, n_shards: int) -> np.ndarray:
    return (h.astype(np.uint64) % np.uint64(n_shards)).astype(np.int64)


def _batch_insert(
    table: np.ndarray, fps: np.ndarray, b1: np.ndarray, stash: list[int]
) -> None:
    """Vectorized batch placement with bounded eviction.  Each round: every
    pending key tries its current bucket (the rank-th pending key of a
    bucket takes the bucket's rank-th empty slot); keys that miss flip to
    their partner bucket; from round 2 on, the first pending key of each
    still-full bucket evicts the ``round % SLOTS`` victim, which re-enters
    the pending set aimed at ITS partner.  Leftovers after MAX_KICK_ROUNDS
    go to the stash (encoded bucket*2^16+fp) — exactness is preserved, the
    stash is just slower to probe; it stays empty below the sizing load."""
    n_buckets = table.shape[0]
    cur_fp = fps.astype(np.uint16).copy()
    cur_b = b1.astype(np.int64).copy()
    for rnd in range(MAX_KICK_ROUNDS):
        if cur_fp.size == 0:
            return
        order = np.argsort(cur_b, kind="stable")
        b_o, f_o = cur_b[order], cur_fp[order]
        empties = table[b_o] == 0  # (n, SLOTS)
        newgrp = np.empty(len(b_o), dtype=bool)
        newgrp[0] = True
        newgrp[1:] = b_o[1:] != b_o[:-1]
        starts = np.flatnonzero(newgrp)
        gid = np.cumsum(newgrp) - 1
        rank = np.arange(len(b_o)) - starts[gid]
        nth_empty = empties & (empties.cumsum(axis=1) == (rank + 1)[:, None])
        placed = nth_empty.any(axis=1)
        table[b_o[placed], nth_empty[placed].argmax(axis=1)] = f_o[placed]
        b_r, f_r = b_o[~placed], f_o[~placed]
        if b_r.size == 0:
            return
        if rnd >= 2:
            full_b, first = np.unique(b_r, return_index=True)
            victim = rnd % SLOTS
            evicted = table[full_b, victim].copy()
            table[full_b, victim] = f_r[first]
            rest = np.ones(len(b_r), dtype=bool)
            rest[first] = False
            cur_fp = np.concatenate([evicted, f_r[rest]])
            cur_b = np.concatenate(
                [_alt(full_b, evicted, n_buckets), _alt(b_r[rest], f_r[rest], n_buckets)]
            )
        else:
            cur_fp = f_r
            cur_b = _alt(b_r, f_r, n_buckets)
    stash.extend(
        (int(b) << 16) | int(f) for b, f in zip(cur_b, cur_fp)
    )


class ShardedCuckoo:
    """n_shards × (buckets_per_shard, SLOTS) uint16 tables + per-shard stash."""

    def __init__(
        self,
        params: CuckooParams,
        tables: np.ndarray | None = None,
        stashes: list[np.ndarray] | None = None,
    ):
        self.params = params
        if tables is None:
            tables = np.zeros(
                (params.n_shards, params.buckets_per_shard, SLOTS), dtype=np.uint16
            )
        assert tables.shape == (params.n_shards, params.buckets_per_shard, SLOTS)
        self.tables = tables
        self.stashes = (
            stashes
            if stashes is not None
            else [np.empty(0, dtype=np.int64) for _ in range(params.n_shards)]
        )

    # -- key decomposition ---------------------------------------------
    def _parts(self, hashes: np.ndarray):
        p = self.params
        h = hashes.astype(np.int64)
        shard = _shard_of(h, p.n_shards)
        fp = _fingerprint(h)
        b1 = _bucket1(h, p.n_shards, p.buckets_per_shard)
        b2 = _alt(b1, fp, p.buckets_per_shard)
        return shard, fp, b1, b2

    # -- maintenance -----------------------------------------------------
    def insert(self, hashes: np.ndarray) -> None:
        shard, fp, b1, _ = self._parts(hashes)
        for s in np.unique(shard):
            m = shard == s
            st: list[int] = []
            _batch_insert(self.tables[s], fp[m], b1[m], st)
            if st:
                self.stashes[s] = np.concatenate(
                    [self.stashes[s], np.asarray(st, dtype=np.int64)]
                )

    def delete(self, hashes: np.ndarray) -> int:
        """Remove one stored fingerprint copy per key (present keys only —
        deleting a never-inserted key can, on fp collision, strip a copy
        another key needs: the standard cuckoo-filter contract).  Driver-side
        maintenance (recrawl eviction batches), not a query-plan op."""
        shard, fp, b1, b2 = self._parts(hashes)
        removed = 0
        for s, f, x, y in zip(shard, fp, b1, b2):
            row = self.tables[s, x]
            hit = np.flatnonzero(row == f)
            if hit.size:
                row[hit[0]] = 0
                removed += 1
                continue
            row = self.tables[s, y]
            hit = np.flatnonzero(row == f)
            if hit.size:
                row[hit[0]] = 0
                removed += 1
                continue
            for b in (x, y):
                enc = (int(b) << 16) | int(f)
                pos = np.flatnonzero(self.stashes[s] == enc)
                if pos.size:
                    self.stashes[s] = np.delete(self.stashes[s], pos[0])
                    removed += 1
                    break
        return removed

    # -- probe -----------------------------------------------------------
    def might_contain(self, hashes: np.ndarray) -> np.ndarray:
        shard, fp, b1, b2 = self._parts(hashes)
        fpc = fp[:, None]
        hit = (self.tables[shard, b1] == fpc).any(axis=1) | (
            self.tables[shard, b2] == fpc
        ).any(axis=1)
        if any(len(st) for st in self.stashes):
            enc1 = (b1 << 16) | fp
            enc2 = (b2 << 16) | fp
            for s in np.unique(shard[~hit]):
                st = self.stashes[s]
                if len(st):
                    m = (shard == s) & ~hit
                    hit[m] = np.isin(enc1[m], st) | np.isin(enc2[m], st)
        return hit

    def load_factor(self) -> float:
        return float((self.tables != 0).mean())

    def stash_size(self) -> int:
        return int(sum(len(s) for s in self.stashes))


def build_cuckoo(
    df: DataFrame, key_col: str = "url", params: CuckooParams | None = None
) -> ShardedCuckoo:
    """Distributed build: JVM-side xxhash64, shuffle of the 8-byte hashes by
    shard id (hash partitioning keeps each shard whole within one task), one
    vectorized table build per shard, driver placement — no merge step."""
    if params is None:
        params = params_for(df.count())
    p = params
    hashed = df.select(F.xxhash64(F.col(key_col)).alias("h"))
    if p.n_shards > 1:
        hashed = hashed.repartition(p.n_shards, F.pmod(F.col("h"), F.lit(p.n_shards)))
    else:
        hashed = hashed.repartition(1)
    schema = StructType(
        [
            StructField("shard", IntegerType(), False),
            StructField("table", BinaryType(), False),
            StructField("stash", BinaryType(), False),
        ]
    )

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hs: list[np.ndarray] = []
        for pdf in batches:
            if len(pdf):
                hs.append(pdf["h"].to_numpy(np.int64))
        if not hs:
            return
        h = np.concatenate(hs)
        shards = _shard_of(h, p.n_shards)
        out_s, out_t, out_st = [], [], []
        for s in np.unique(shards):
            hh = h[shards == s]
            table = np.zeros((p.buckets_per_shard, SLOTS), dtype=np.uint16)
            stash: list[int] = []
            _batch_insert(table, _fingerprint(hh), _bucket1(hh, p.n_shards, p.buckets_per_shard), stash)
            out_s.append(int(s))
            out_t.append(table.tobytes())
            out_st.append(np.asarray(stash, dtype=np.int64).tobytes())
        yield pd.DataFrame({"shard": out_s, "table": out_t, "stash": out_st})

    out = ShardedCuckoo(p)
    seen_shards: set[int] = set()
    for row in hashed.mapInPandas(fold, schema=schema).collect():
        s = int(row["shard"])
        assert s not in seen_shards, "shard split across tasks"
        seen_shards.add(s)
        out.tables[s] = np.frombuffer(row["table"], dtype=np.uint16).reshape(
            p.buckets_per_shard, SLOTS
        )
        out.stashes[s] = np.frombuffer(row["stash"], dtype=np.int64).copy()
    return out


def cuckoo_might_contain_udf(spark, cuckoo: ShardedCuckoo):
    """Pandas UDF over the JVM-computed xxhash64 key: vectorized numpy probe
    against the broadcast shard tables."""
    bc = spark.sparkContext.broadcast(
        (cuckoo.params, cuckoo.tables, cuckoo.stashes)
    )

    @pandas_udf(BooleanType())
    def might_contain(h: pd.Series) -> pd.Series:
        params, tables, stashes = bc.value
        probe = ShardedCuckoo(params, tables, stashes)
        return pd.Series(probe.might_contain(h.to_numpy(np.int64)).astype(bool))

    return might_contain


def cuckoo_prefilter(
    candidates: DataFrame,
    cuckoo: ShardedCuckoo | None,
    key_col: str = "url",
) -> tuple[DataFrame, DataFrame]:
    """Split candidates into (definitely_unseen, maybe_seen) — same contract
    as ``bloom.bloom_prefilter``; the exact anti-join still owns semantics."""
    if cuckoo is None:
        return candidates.limit(0), candidates
    udf = cuckoo_might_contain_udf(candidates.sparkSession, cuckoo)
    tagged = candidates.withColumn("__maybe", udf(F.xxhash64(F.col(key_col))))
    fresh = tagged.filter(~F.col("__maybe")).drop("__maybe")
    maybe = tagged.filter(F.col("__maybe")).drop("__maybe")
    return fresh, maybe
