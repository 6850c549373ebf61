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


def _plane_weight(plane: int, dim: int, table: int = 0) -> float:
    """Deterministic pseudo-random weight in [-1, 1) from md5 — no RNG state,
    reproducible across engines and runs.  ``table`` varies the seed so
    multi-table LSH gets independent hyperplane sets (table 0 keeps the
    original seeds for backward-compatible bucket values)."""
    seed = f"plane{plane}:dim{dim}" if table == 0 else f"tab{table}:plane{plane}:dim{dim}"
    h = hashlib.md5(seed.encode()).hexdigest()[:8]
    return int(h, 16) / float(1 << 31) - 1.0


def lsh_bucket_col(vec, n_dims: int, n_planes: int = LSH_PLANES, table: int = 0):
    """Sign-projection bucket id as a bigint bitmask, JVM-side: for each
    hyperplane, bit = (sum_d vec[d] * w[p,d] > 0)."""
    v = vec.cast("array<double>")
    acc = F.lit(0).cast("long")
    for p in range(n_planes):
        w = F.array(*[F.lit(_plane_weight(p, d, table)) for d in range(n_dims)])
        proj = _dot(v, w)
        acc = acc + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return acc


def _hamming_probes(bucket, n_planes: int, radius: int) -> list:
    """Bucket ids within Hamming distance <= radius of ``bucket`` (the
    multiprobe trick: probing nearby buckets buys recall with extra probe
    rows on the SMALL side, never extra passes over the corpus)."""
    probes = [bucket.cast("long")]
    if radius >= 1:
        probes += [
            bucket.bitwiseXOR(F.lit(1 << p)).cast("long") for p in range(n_planes)
        ]
    if radius >= 2:
        probes += [
            bucket.bitwiseXOR(F.lit((1 << p) | (1 << q))).cast("long")
            for p in range(n_planes)
            for q in range(p + 1, n_planes)
        ]
    if radius >= 3:
        raise ValueError("probe radius > 2 unsupported (use more tables instead)")
    return probes


def _with_table_keys(
    df: DataFrame,
    id_alias: str,
    vec_alias: str,
    n_dims: int,
    n_planes: int,
    n_tables: int,
    probe_radius: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, vec, tab, bucket) rows: one per (row, table, probe).  Buckets are
    materialized through a projection first so each table's 6-plane projection
    is computed once per row, not once per probe."""
    base = df.select(
        F.col(id_col).alias(id_alias),
        F.col(vec_col).alias(vec_alias),
        *[
            lsh_bucket_col(F.col(vec_col), n_dims, n_planes, t).alias(f"__b{t}")
            for t in range(n_tables)
        ],
    )
    keys = F.array(
        *[
            F.struct(F.lit(t).alias("tab"), p.alias("bucket"))
            for t in range(n_tables)
            for p in _hamming_probes(F.col(f"__b{t}"), n_planes, probe_radius)
        ]
    )
    return base.select(
        id_alias, vec_alias, F.explode(keys).alias("__k")
    ).select(id_alias, vec_alias, F.col("__k.tab").alias("tab"), F.col("__k.bucket").alias("bucket"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_dims: int,
    k: int = DEFAULT_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 8,
    probe_radius: int = 1,
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH: L independent hyperplane
    tables; candidates share any table's bucket with the query (queries
    additionally probe buckets within Hamming distance ``probe_radius``).
    Exact cosine re-rank within candidates.  Corpus-side cost is one bucket
    key per table (no probe amplification on the big side); shuffle is on
    (table, bucket) keys.  Returns (query_id, neighbor_id, rank)."""
    c = _with_table_keys(
        corpus, "neighbor_id", "c_vec", n_dims, n_planes, n_tables, 0, id_col, vec_col
    )
    q = F.broadcast(
        _with_table_keys(
            queries, "query_id", "q_vec", n_dims, n_planes, n_tables, probe_radius,
            id_col, vec_col,
        )
    )
    scored = (
        q.join(c, on=["tab", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_col(F.col("q_vec"), F.col("c_vec")).alias("sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("sim").alias("sim"))  # a pair can match via several tables
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def recall_flags(
    exact: DataFrame, approx: DataFrame, min_recall_ppm: int
) -> DataFrame:
    """Per-query recall of ``approx`` vs the ``exact`` top-k, reduced to a
    boolean: (query_id, recall_ok).  Both inputs are (query_id, neighbor_id,
    ...) result sets.  This makes an approximate-search query self-verifying
    against a SQL oracle (`SELECT query_id, TRUE AS recall_ok ...`): the hash
    matches iff every query clears the pinned recall bar."""
    n_exact = exact.groupBy("query_id").agg(F.count("*").alias("__n"))
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(
            approx.select("query_id", "neighbor_id").distinct(),
            on=["query_id", "neighbor_id"],
            how="left_semi",
        )
        .groupBy("query_id")
        .agg(F.count("*").alias("__hit"))
    )
    return (
        n_exact.join(hits, on="query_id", how="left")
        .select(
            "query_id",
            (
                F.coalesce(F.col("__hit"), F.lit(0)) * F.lit(1_000_000)
                >= F.lit(min_recall_ppm) * F.col("__n")
            ).alias("recall_ok"),
        )
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant — the coarse-quantizer scale path
# ---------------------------------------------------------------------------

IVF_LISTS = 16
IVF_NPROBE = 4


IVF_KMEANS_ITERS = 10
IVF_SAMPLE = 4096


def ivf_centroids(
    corpus: DataFrame,
    n_lists: int = IVF_LISTS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = IVF_KMEANS_ITERS,
    sample_size: int = IVF_SAMPLE,
):
    """Deterministic spherical-k-means coarse centroids.

    A deterministic sample (md5(vec_id) order — seeded, no RNG state) is
    collected to the driver and Lloyd-iterated with cosine assignment and
    mean updates (numpy, a few ms for a 4k×d sample).  At 100 TB the sample
    is a vanishing fraction of one scan and the centroid matrix broadcast is
    n_lists×d doubles — driver-side training is the right plan; the expensive
    part (assigning every corpus row) stays a vectorized Arrow UDF pass.
    Returns the (n_lists, dim) centroid matrix (rows l2-normalized)."""
    import numpy as np

    rows = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cv"))
        .withColumn("__o", F.md5(F.col("cid").cast("string")))
        .orderBy("__o")
        .limit(sample_size)
        .drop("__o")
        .collect()
    )
    X = np.array([r["cv"] for r in rows])  # (sample, dim)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    Xn = X / np.where(norms == 0, 1.0, norms)
    k = min(n_lists, len(Xn))
    C = Xn[:k].copy()  # md5-order init: deterministic, well-spread on the sphere
    for _ in range(kmeans_iters):
        cn = np.linalg.norm(C, axis=1, keepdims=True)
        Cn = C / np.where(cn == 0, 1.0, cn)
        assign = (Xn @ Cn.T).argmax(axis=1)
        for l in range(k):
            mask = assign == l
            if mask.any():
                C[l] = Xn[mask].mean(axis=0)
    cn = np.linalg.norm(C, axis=1, keepdims=True)
    return C / np.where(cn == 0, 1.0, cn)


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
    mat = ivf_centroids(corpus, n_lists, id_col, vec_col)
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
    n_planes: int = 6,
    n_tables: int = 8,
    probe_radius: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path: candidate pairs share a (table, bucket) key in any of
    ``n_tables`` independent sign-projection tables — one side additionally
    probes buckets within Hamming distance ``probe_radius`` — then an exact
    cosine check inside buckets.  Shuffles on (table, bucket) keys, never n^2.

    Recall amplification is the multi-table OR: a pair is missed only if
    every table separates it by more than probe_radius bits.  For true
    near-dups (cosine >= 0.9, the production regime) 2-3 tables suffice; the
    defaults (6 planes, 8 tables, radius 2) are sized so even the weakly
    similar cosine~0.4 pairs of random test embeddings are recovered
    exhaustively (verified vs the exact-n^2 oracle at two scales, every pair
    caught by >= 2 tables).  Tables/probes multiply only the probe-side row
    count; at lower thresholds turn n_tables up, never the join shape."""
    left = _with_table_keys(
        corpus, "a", "va", n_dims, n_planes, n_tables, probe_radius, id_col, vec_col
    )
    right = _with_table_keys(
        corpus, "b", "vb", n_dims, n_planes, n_tables, 0, id_col, vec_col
    )
    sim = cosine_col(F.col("va"), F.col("vb"))
    return (
        left.join(right, on=["tab", "bucket"])
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


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized inverted file (Jégou et al., TPAMI 2011)
# ---------------------------------------------------------------------------
#
# The compressed-index scale path: IVF alone still stores full vectors;
# PQ encodes each corpus vector's RESIDUAL (v - coarse centroid) as M
# subspace codebook ids — PQ_M bytes per vector instead of 4*d, which is
# what makes a 10^10-vector index fit a cluster's memory.  Search is
# asymmetric distance (decode-free LUT in spirit; here the decoded-vector
# form, vectorized per Arrow batch) over the probed lists, then an exact
# re-rank of the top ADC candidates against the true vectors.
#
# Training follows the IVF discipline: codebooks fit driver-side on the
# deterministic md5-order sample (no RNG state), broadcast everywhere; the
# corpus-side work stays vectorized Arrow passes keyed by list id.

PQ_M = 8       # subspaces (8x8 dims; 4 was too coarse beyond ~10^3 vecs)
PQ_K = 16      # codewords per subspace (4-bit codes)
PQ_ITERS = 8
PQ_RERANK = 400


def _pq_codebooks(Xn, C, assign, m: int = PQ_M, k: int = PQ_K,
                  iters: int = PQ_ITERS):
    """(m, k, d/m) codebooks over residuals; deterministic sample-order
    init, euclidean Lloyd iterations."""
    import numpy as np

    res = Xn - C[assign]
    d = res.shape[1]
    sub = d // m
    books = []
    for mi in range(m):
        S = res[:, mi * sub : (mi + 1) * sub]
        kk = min(k, len(S))
        B = S[:kk].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - B[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(kk):
                mask = a == c
                if mask.any():
                    B[c] = S[mask].mean(axis=0)
        books.append(B)
    return np.stack(books)  # (m, k', sub)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = DEFAULT_K,
    n_lists: int = IVF_LISTS,
    nprobe: int = IVF_NPROBE,
    pq_m: int = PQ_M,
    pq_k: int = PQ_K,
    rerank: int = PQ_RERANK,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ search: (1) encode the corpus once as (list_id, codes) — the
    compressed index; (2) ADC-score the probed lists per query in a
    vectorized Arrow pass; (3) exact-cosine re-rank of the top ``rerank``
    ADC candidates.  Shuffles: the list-id equi-join (queries broadcast)
    and the candidate re-rank join — codes, never full vectors, move in
    step 2."""
    import numpy as np

    from pyspark.sql.types import ArrayType, DoubleType, IntegerType

    spark = corpus.sparkSession
    C = ivf_centroids(corpus, n_lists, id_col, vec_col)
    # deterministic sample (same md5 order as ivf_centroids) for PQ training
    rows = (
        corpus.select(F.col(id_col).alias("cid"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
        .withColumn("__o", F.md5(F.col("cid").cast("string")))
        .orderBy("__o")
        .limit(IVF_SAMPLE)
        .collect()
    )
    X = np.array([r["cv"] for r in rows])
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    Xn = X / np.where(norms == 0, 1.0, norms)
    assign = (Xn @ C.T).argmax(axis=1)
    books = _pq_codebooks(Xn, C, assign, pq_m, pq_k)
    bc_C = spark.sparkContext.broadcast(C)
    bc_B = spark.sparkContext.broadcast(books)
    sub = C.shape[1] // pq_m

    @pandas_udf(ArrayType(IntegerType()))
    def encode(vecs: pd.Series) -> pd.Series:
        Cv, Bv = bc_C.value, bc_B.value
        out = []
        for v in vecs:
            a = np.asarray(v, dtype=np.float64)
            n = np.linalg.norm(a)
            an = a / n if n else a
            li = int((Cv @ an).argmax())
            r = an - Cv[li]
            codes = [li]
            for mi in range(pq_m):
                S = r[mi * sub : (mi + 1) * sub]
                d2 = ((Bv[mi] - S[None, :]) ** 2).sum(axis=1)
                codes.append(int(d2.argmin()))
            out.append(codes)
        return pd.Series(out)

    enc = corpus.select(
        F.col(id_col).alias("neighbor_id"), encode(F.col(vec_col)).alias("cd")
    ).select(
        "neighbor_id",
        F.element_at("cd", 1).alias("list_id"),
        F.slice("cd", 2, pq_m).alias("codes"),
    ).localCheckpoint(eager=True)  # the compressed index, built ONCE

    q_assign = _assign_udf(spark, C, nprobe)
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("q_vec"),
            F.explode(q_assign(F.col(vec_col))).alias("list_id"),
        )
    )

    @pandas_udf(DoubleType())
    def adc(q_vecs: pd.Series, list_ids: pd.Series, codes: pd.Series) -> pd.Series:
        Cv, Bv = bc_C.value, bc_B.value
        out = np.empty(len(q_vecs))
        for i, (qv, li, cd) in enumerate(zip(q_vecs, list_ids, codes)):
            a = np.asarray(qv, dtype=np.float64)
            n = np.linalg.norm(a)
            an = a / n if n else a
            dec = Cv[int(li)].copy()
            for mi in range(pq_m):
                dec[mi * sub : (mi + 1) * sub] += Bv[mi][int(cd[mi])]
            dn = np.linalg.norm(dec)
            out[i] = float(an @ dec / dn) if dn else 0.0
        return pd.Series(out)

    cand = (
        q.join(enc, on="list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            adc(F.col("q_vec"), F.col("list_id"), F.col("codes")).alias("adc_sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("adc_sim").alias("adc_sim"))
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("adc_sim"), F.asc("neighbor_id"))
    shortlist = cand.withColumn("r", F.row_number().over(wr)).filter(
        F.col("r") <= rerank
    ).select("query_id", "neighbor_id")
    # exact re-rank: candidates join true vectors; full vectors move only
    # for the <= rerank-per-query shortlist
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_full")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_full")
    )
    exact = (
        shortlist.join(cv, on="neighbor_id")
        .join(F.broadcast(qv), on="query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_col(F.col("q_full"), F.col("c_full")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


# ---------------------------------------------------------------------------
# SemDeDup: semantic deduplication via cluster-then-pairwise (Abbas et al.
# 2023, arXiv:2303.09540) — the embedding-space analogue of MinHash dedup
# used on web-scale LLM pretraining corpora.
# ---------------------------------------------------------------------------
#
# Shape: k-means clusters the corpus (deterministic driver-side training on
# an md5-ordered sample, exactly :func:`ivf_centroids`), every vector gets
# its argmax-cosine cluster in one Arrow pass, and the quadratic duplicate
# check runs ONLY inside clusters — at 10^10 docs with n/k ~ 10^4-vector
# clusters the pair join is k independent bounded self-joins on the cluster
# key, never a global n^2.  The keep rule is deterministic first-wins: a
# vector is dropped iff some same-cluster vector with a SMALLER id sits
# above the cosine threshold (the paper keeps one exemplar per dup group;
# id-order makes that choice engine-independent).

SEMDEDUP_LISTS = 16


def _assign_top1_udf(spark, mat):
    """argmax-cosine cluster id per vector (ties impossible up to float
    equality; argmax — not argsort — so the golden twin's tie rule is
    identical)."""
    import numpy as np

    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast(norm)

    from pyspark.sql.types import IntegerType

    @pandas_udf(IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        cent = bc.value
        out = []
        for v in vecs:
            a = np.asarray(v, dtype=np.float64)
            n = np.linalg.norm(a)
            out.append(int(np.argmax(cent @ (a / n if n else a))))
        return pd.Series(out)

    return assign


def semantic_dedup(
    corpus: DataFrame,
    n_lists: int = SEMDEDUP_LISTS,
    threshold_ppm: int = 900_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, kept) — SemDeDup over the embedding column.

    The intra-cluster pair join shuffles once on the cluster key; the drop
    list is the distinct larger-id side of above-threshold pairs, removed
    with a broadcastable anti-join (dup lists are tiny next to the corpus).
    The assignment frame is localCheckpointed so the cluster UDF runs once,
    not once per join branch (branch-recompute discipline)."""
    spark = corpus.sparkSession
    mat = ivf_centroids(corpus, n_lists, id_col, vec_col)
    assign = _assign_top1_udf(spark, mat)
    assigned = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        assign(F.col(vec_col).cast("array<double>")).alias("cluster"),
    ).localCheckpoint(eager=True)
    a = assigned.select(
        F.col("cluster"), F.col("vec_id").alias("a"), F.col("vec").alias("va")
    )
    b = assigned.select(
        F.col("cluster"), F.col("vec_id").alias("b"), F.col("vec").alias("vb")
    )
    sim = cosine_col(F.col("va"), F.col("vb"))
    drops = (
        a.join(b, on="cluster")
        .filter(F.col("a") < F.col("b"))
        .filter(F.floor(sim * 1e6).cast("long") >= threshold_ppm)
        .select(F.col("b").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.join(F.broadcast(drops.withColumn("__drop", F.lit(True))),
                      on="vec_id", how="left")
        .select(
            "vec_id",
            F.col("cluster").cast("long").alias("cluster"),
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("kept"),
        )
    )


# --- hybrid retrieval: reciprocal-rank fusion (Cormack et al., SIGIR'09) -------

RRF_K = 60  # the canonical RRF damping constant


def hybrid_topk(
    docs: DataFrame,
    emb: DataFrame,
    n_queries: int,
    k: int = DEFAULT_K,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """(query_id, neighbor_id, rrf_micro, fused_rank) — query-by-document
    hybrid search: for each query doc, a LEXICAL arm (distinct-term
    overlap ranking) and a SEMANTIC arm (cosine ranking over the aligned
    embedding) are fused by reciprocal-rank fusion, the standard
    ensemble that needs no score calibration because it consumes only
    RANKS: rrf(d) = sum over arms of 1e6 DIV (rrf_k + rank_arm(d)),
    missing-from-an-arm contributing 0 — all integer, hash-stable.

    Scale shape: the lexical arm is a term-keyed join of the (tiny)
    query-doc token set against the corpus token set — at web scale the
    join prunes stop-terms by document frequency first (the co-citation
    hub cap; at this fixture's size the raw join is exact and cheap);
    the semantic arm is the broadcast brute-force kernel (swap in the
    IVF/LSH path beyond memory).  Each arm emits its top-k only; fusion
    and the final top-k run on <= 2k rows per query."""
    from pyspark.sql import Window

    toks = (
        docs.select(
            F.col("doc_id"),
            F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    qt = toks.filter(F.col("doc_id") < n_queries).select(
        F.col("doc_id").alias("query_id"), "term"
    )
    overlap = (
        qt.join(toks.withColumnRenamed("doc_id", "neighbor_id"), on="term")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    w_lex = Window.partitionBy("query_id").orderBy(
        F.desc("n_shared"), F.asc("neighbor_id")
    )
    lex = (
        overlap.withColumn("lex_rank", F.row_number().over(w_lex))
        .filter(F.col("lex_rank") <= k)
        .select("query_id", "neighbor_id", "lex_rank")
    )
    sem = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < n_queries), k=k
    ).withColumnRenamed("rank", "sem_rank")
    fused = (
        lex.join(sem, on=["query_id", "neighbor_id"], how="full_outer")
        .select(
            "query_id",
            "neighbor_id",
            (
                F.coalesce(
                    F.expr(f"1000000 DIV ({rrf_k} + lex_rank)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"1000000 DIV ({rrf_k} + sem_rank)"), F.lit(0)
                )
            )
            .cast("long")
            .alias("rrf_micro"),
        )
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_micro"), F.asc("neighbor_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w_f))
        .filter(F.col("fused_rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rrf_micro",
            F.col("fused_rank").cast("long").alias("fused_rank"),
        )
    )


def duck_hybrid_sql(
    docs: str, emb: str, n_queries: int, k: int = DEFAULT_K, rrf_k: int = RRF_K
) -> str:
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM {docs}
),
overlap AS (
  SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
         count(*)::BIGINT AS n_shared
  FROM toks q JOIN toks c USING (term)
  WHERE q.doc_id < {n_queries} AND q.doc_id <> c.doc_id
  GROUP BY 1, 2
),
lex AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
           ORDER BY n_shared DESC, neighbor_id ASC) AS lex_rank
  FROM overlap QUALIFY lex_rank <= {k}
),
qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS v FROM {emb}
       WHERE vec_id < {n_queries}),
cv AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS v FROM {emb}),
sem AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
           ORDER BY list_cosine_similarity(qv.v, cv.v) DESC,
                    neighbor_id ASC) AS sem_rank
  FROM qv CROSS JOIN cv WHERE query_id <> neighbor_id
  QUALIFY sem_rank <= {k}
),
fused AS (
  SELECT coalesce(l.query_id, s.query_id) AS query_id,
         coalesce(l.neighbor_id, s.neighbor_id) AS neighbor_id,
         (coalesce(1000000 // ({rrf_k} + l.lex_rank), 0)
          + coalesce(1000000 // ({rrf_k} + s.sem_rank), 0))::BIGINT AS rrf_micro
  FROM lex l FULL OUTER JOIN sem s
    ON l.query_id = s.query_id AND l.neighbor_id = s.neighbor_id
)
SELECT query_id, neighbor_id, rrf_micro,
       row_number() OVER (PARTITION BY query_id
         ORDER BY rrf_micro DESC, neighbor_id ASC)::BIGINT AS fused_rank
FROM fused QUALIFY fused_rank <= {k}
"""


# --- MMR diversified reranking (Carbonell & Goldstein, SIGIR'98) ----------------
#
# Top-k lists from any retriever collapse onto near-duplicates; MMR greedily
# re-picks results trading relevance against similarity to what's already
# picked: argmax over remaining c of
#     lambda * rel(q, c) - (1 - lambda) * max_{s in picked} sim(c, s).
# Determinism contract: embeddings quantize to milli-integers component-wise
# and every rel/sim is the exact INTEGER dot product of those quantized
# vectors (the module's no-float-compare doctrine — cosine differs only by
# per-vector normalization, which callers can pre-apply); lambda is a milli
# ratio; ties break to the smallest neighbor id.  The greedy is therefore
# bit-identical across engines, and the oracle unrolls the k selection steps
# as a CTE chain (the coreness precedent).

MMR_LAMBDA_MILLI = 700
MMR_POOL = 20


def _milli(vec):
    return F.transform(
        vec.cast("array<double>"),
        lambda x: F.floor(x * 1000).cast("long"),
    )


def mmr_rerank(
    emb: DataFrame,
    n_queries: int,
    k: int = 10,
    pool: int = MMR_POOL,
    lambda_milli: int = MMR_LAMBDA_MILLI,
) -> DataFrame:
    """(query_id, neighbor_id, mmr_rank) — MMR over each query's
    cosine-brute top-``pool`` candidates.

    Scale shape: the pool comes from the existing top-k kernel (swap in
    the IVF/LSH path at 10^10 vectors); the greedy itself runs per query
    over <= pool rows inside one applyInPandas group — O(k * pool^2)
    integer ops on a frame whose size is queries x pool, independent of
    corpus size."""
    import numpy as np
    import pandas as pd

    cands = brute_force_topk(emb, emb.filter(F.col("vec_id") < n_queries), k=pool)
    qv = emb.select(
        F.col("vec_id").alias("query_id"), _milli(F.col("embedding")).alias("q_m")
    )
    cv = emb.select(
        F.col("vec_id").alias("neighbor_id"), _milli(F.col("embedding")).alias("c_m")
    )
    joined = cands.join(F.broadcast(qv), on="query_id").join(cv, on="neighbor_id")

    lam, lam_c = int(lambda_milli), 1000 - int(lambda_milli)

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        qm = np.asarray(pdf["q_m"].iloc[0], dtype=np.int64)
        V = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["c_m"]])
        ids = pdf["neighbor_id"].to_numpy()
        rel = V @ qm  # exact int64 dots
        order = np.argsort(ids, kind="stable")
        remaining = list(order)  # id-ascending: ties pick the smallest id
        picked: list[int] = []
        out_ids = []
        while remaining and len(picked) < k:
            best_i, best_score = None, None
            for i in remaining:
                div = max((int(V[i] @ V[j]) for j in picked), default=0)
                score = lam * int(rel[i]) - lam_c * div
                if best_score is None or score > best_score:
                    best_i, best_score = i, score
            picked.append(best_i)
            out_ids.append(ids[best_i])
            remaining.remove(best_i)
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "neighbor_id": out_ids,
                "mmr_rank": np.arange(1, len(out_ids) + 1, dtype=np.int64),
            }
        )

    return joined.groupBy("query_id").applyInPandas(
        greedy, schema="query_id long, neighbor_id long, mmr_rank long"
    )


def duck_mmr_sql(
    emb: str,
    n_queries: int,
    k: int = 10,
    pool: int = MMR_POOL,
    lambda_milli: int = MMR_LAMBDA_MILLI,
) -> str:
    """Unrolled-greedy oracle: k selection steps as a CTE chain; integer
    milli-dots via list_zip folds, same tie rule (smallest neighbor id)."""
    lam, lam_c = int(lambda_milli), 1000 - int(lambda_milli)
    dot = (
        "list_sum(list_transform(list_zip({a}, {b}),"
        " x -> x[1] * x[2]))::BIGINT"
    )
    head = f"""
WITH mv AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding::DOUBLE[],
                                x -> floor(x * 1000)::BIGINT) AS m
  FROM {emb}
),
cand AS MATERIALIZED (
  SELECT b.query_id, b.neighbor_id,
         qm.m AS q_m, cm.m AS c_m,
         {dot.format(a='qm.m', b='cm.m')} AS rel
  FROM ({duck_brute_force_sql(emb, n_queries, pool)}) b
  JOIN mv qm ON qm.vec_id = b.query_id
  JOIN mv cm ON cm.vec_id = b.neighbor_id
),
p0 AS (SELECT query_id, neighbor_id, c_m, rel FROM cand WHERE FALSE)
"""
    steps = []
    for s in range(1, k + 1):
        p = s - 1
        steps.append(f""",
sc{s} AS (
  SELECT c.query_id, c.neighbor_id, c.c_m, c.rel,
         {lam} * c.rel - {lam_c} * coalesce((
            SELECT max({dot.format(a='c.c_m', b='pp.c_m')})
            FROM p{p} pp WHERE pp.query_id = c.query_id
         ), 0) AS score
  FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM p{p} pp
                    WHERE pp.query_id = c.query_id
                      AND pp.neighbor_id = c.neighbor_id)
),
pick{s} AS (
  SELECT query_id, neighbor_id, c_m, rel, {s}::BIGINT AS mmr_rank
  FROM sc{s}
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY score DESC, neighbor_id ASC) = 1
),
p{s} AS (
  SELECT query_id, neighbor_id, c_m, rel FROM p{p}
  UNION ALL SELECT query_id, neighbor_id, c_m, rel FROM pick{s}
)""")
        
    picks = " UNION ALL ".join(
        f"SELECT query_id, neighbor_id, mmr_rank FROM pick{s}"
        for s in range(1, k + 1)
    )
    return head + "".join(steps) + f"\n{picks}"
