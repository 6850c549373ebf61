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

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf

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


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant — the coarse-quantizer scale path
# ---------------------------------------------------------------------------

IVF_LISTS = 16
IVF_NPROBE = 4


def ivf_centroids(corpus: DataFrame, n_lists: int = IVF_LISTS, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Deterministic coarse centroids: the n_lists corpus vectors whose
    md5(vec_id) sorts first — a seeded sample without RNG state (k-means
    would converge better but adds iterations; for an inverted file the
    partition just needs to be balanced-ish and deterministic)."""
    rows = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cv"))
        .withColumn("__o", F.md5(F.col("cid").cast("string")))
        .orderBy("__o")
        .limit(n_lists)
        .drop("__o")
        .collect()
    )
    import numpy as np

    ids = [r["cid"] for r in rows]
    mat = np.array([r["cv"] for r in rows])  # (n_lists, dim)
    return ids, mat


def _assign_udf(spark, mat, nprobe: int):
    """Vectorized cluster assignment: argmax-cosine over the centroid matrix,
    top-nprobe lists per vector (numpy matmul per Arrow batch)."""
    import numpy as np

    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast(norm)

    from pyspark.sql.types import ArrayType, IntegerType

    @pandas_udf(ArrayType(IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        cent = bc.value
        out = []
        for v in vecs:
            a = np.asarray(v, dtype=np.float64)
            n = np.linalg.norm(a)
            sims = cent @ (a / n if n else a)
            top = np.argsort(-sims)[:nprobe]
            out.append([int(x) for x in top])
        return pd.Series(out)

    return assign


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = DEFAULT_K,
    n_lists: int = IVF_LISTS,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: corpus rows live in their single nearest list; queries
    probe their nprobe nearest lists; exact cosine re-rank inside the probed
    candidates.  The corpus-side shuffle key is the list id — at 100 TB the
    inverted file is the partition layout, and a query touches nprobe/n_lists
    of the data."""
    spark = corpus.sparkSession
    _, mat = ivf_centroids(corpus, n_lists, id_col, vec_col)
    c_assign = _assign_udf(spark, mat, 1)
    q_assign = _assign_udf(spark, mat, nprobe)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.element_at(c_assign(F.col(vec_col)), 1).alias("list_id"),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode(q_assign(F.col(vec_col))).alias("list_id"),
        )
    )
    scored = (
        q.join(c, on="list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_col(F.col("q_vec"), F.col("c_vec")).alias("sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("sim").alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate detection (the dedup-flavored use of ANN)
# ---------------------------------------------------------------------------


def cosine_dup_pairs_exact(
    corpus: DataFrame,
    threshold_ppm: int = 900_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (a < b) pairs with cosine >= threshold — the exact baseline
    (O(n^2); fine for oracle-scale corpora).  Emits jaccard-style integer
    ppm so the DuckDB oracle compares exactly."""
    a = corpus.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    sim = cosine_col(F.col("va"), F.col("vb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .select("a", "b", F.floor(sim * 1e6).cast("long").alias("cos_ppm"))
        .filter(F.col("cos_ppm") >= threshold_ppm)
    )


def cosine_dup_pairs_lsh(
    corpus: DataFrame,
    n_dims: int,
    threshold_ppm: int = 900_000,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path: candidate pairs share a sign-projection bucket (plus
    1-bit-flip probes via the multiprobe trick applied to one side), exact
    cosine check inside buckets.  Shuffles on bucket keys, never n^2."""
    v = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket_col(F.col(vec_col), n_dims, n_planes).alias("bucket0"),
    )
    probes = F.array(
        F.col("bucket0"),
        *[F.col("bucket0").bitwiseXOR(F.lit(1 << p)).cast("long") for p in range(n_planes)],
    )
    left = v.select(
        F.col("id").alias("a"), F.col("vec").alias("va"), F.explode(probes).alias("bucket")
    )
    right = v.select(
        F.col("id").alias("b"), F.col("vec").alias("vb"), F.col("bucket0").alias("bucket")
    )
    sim = cosine_col(F.col("va"), F.col("vb"))
    return (
        left.join(right, on="bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.floor(sim * 1e6).cast("long").alias("cos_ppm"))
        .filter(F.col("cos_ppm") >= threshold_ppm)
        .distinct()
    )


def duck_cosine_dups_sql(table: str, threshold_ppm: int = 900_000) -> str:
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM {table})
SELECT a.vec_id AS a, b.vec_id AS b,
       floor(list_cosine_similarity(a.vec, b.vec) * 1e6)::BIGINT AS cos_ppm
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE floor(list_cosine_similarity(a.vec, b.vec) * 1e6) >= {threshold_ppm}
"""


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
