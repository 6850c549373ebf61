"""Similarity search over an embedding column (array<float>).

Two paths, per the large-scale playbook:

* brute-force top-k — the exactness baseline: broadcast the (small) query set,
  cross-join against the corpus, cosine via JVM-side ``aggregate``/``zip_with``
  (no Python), per-query top-k via a window over the query partition.  At
  100 TB corpus scale this is one pass over the data per query batch with a
  broadcast on the small side — the right plan as long as |queries| is modest.

* LSH-bucketed (sign-random-projection) — the scale path: H deterministic
  hyperplanes derived from md5 of the dimension index (seeded, no RNG state),
  bucket = sign-bit string; candidates = corpus rows sharing the query's
  bucket (plus optional 1-bit-flip probes); exact cosine re-rank inside the
  bucket.  Shuffle is on bucket keys; recall/efficiency tradeoff is tested in
  tests/test_simsearch.py against the brute-force oracle.

All arithmetic in double precision with sequential summation so the DuckDB
oracle (``list_cosine_similarity`` on ``::DOUBLE[]``) computes bit-identical
values.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_K = 5
LSH_PLANES = 12


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_col(a, b):
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = DEFAULT_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank): per query, k nearest by cosine
    (self excluded), ties broken by neighbor id."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_col(F.col("q_vec"), F.col("c_vec")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _plane_weight(plane: int, dim: int) -> float:
    """Deterministic pseudo-random weight in [-1, 1) from md5 — no RNG state,
    reproducible across engines and runs."""
    h = hashlib.md5(f"plane{plane}:dim{dim}".encode()).hexdigest()[:8]
    return int(h, 16) / float(1 << 31) - 1.0


def lsh_bucket_col(vec, n_dims: int, n_planes: int = LSH_PLANES):
    """Sign-projection bucket id as a bigint bitmask, JVM-side: for each
    hyperplane, bit = (sum_d vec[d] * w[p,d] > 0)."""
    v = vec.cast("array<double>")
    acc = F.lit(0).cast("long")
    for p in range(n_planes):
        w = F.array(*[F.lit(_plane_weight(p, d)) for d in range(n_dims)])
        proj = _dot(v, w)
        acc = acc + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return acc


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_dims: int,
    k: int = DEFAULT_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = LSH_PLANES,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket (or, with
    multiprobe, a bucket within Hamming distance 1 — the standard recall
    boost that costs n_planes extra probes per query, not extra shuffles of
    the corpus).  Exact cosine re-rank within candidates.
    Returns (query_id, neighbor_id, rank)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_bucket_col(F.col(vec_col), n_dims, n_planes).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket_col(F.col(vec_col), n_dims, n_planes).alias("bucket0"),
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket0"),
            *[
                F.col("bucket0").bitwiseXOR(F.lit(1 << p)).cast("long")
                for p in range(n_planes)
            ],
        )
        qb = qb.select(
            "query_id", "q_vec", F.explode(probes).alias("bucket")
        )
    else:
        qb = qb.withColumnRenamed("bucket0", "bucket")
    q = F.broadcast(qb)
    scored = (
        q.join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_col(F.col("q_vec"), F.col("c_vec")).alias("sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("sim").alias("sim"))  # a pair can match via several probes
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def duck_brute_force_sql(table: str, n_queries: int, k: int = DEFAULT_K) -> str:
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM {table} WHERE vec_id < {n_queries}),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM {table}),
scored AS (
  SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS sim
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {k}
"""
