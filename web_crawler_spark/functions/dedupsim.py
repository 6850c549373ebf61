"""Deduplication & similarity for training-data pipelines.

Five dedup families over a (doc_id, text) corpus, designed Spark-first:

* exact       — group by md5(text): one shuffle, map-side partial agg.
* fingerprint — group by whitespace-normalized md5 (textstats.fingerprint).
* MinHash+LSH — word-3-gram shingles -> per-seed min(md5(shingle || seed))
                signatures -> band keys -> candidate pairs via self-join on
                (band_idx, band_key).  All hashes are md5 hex strings with
                lexicographic min, chosen specifically so DuckDB can compute
                the identical signature in SQL (the correctness oracle);
                xxhash64 would be faster but is not portable across engines.
* n-gram Jaccard — exact Jaccard over distinct shingles for LSH candidate
                pairs (explode -> pair join -> |A∩B| / (|A|+|B|-|A∩B|)).
* SimHash     — 32-bit majority-vote over token md5 bits, computed via
                explode over bit positions (JVM-side, no Python); near-dup
                candidates = identical simhash value.

Scale notes: the LSH self-join shuffles on band keys — band cardinality is
high (md5 of 3 shingles' mins), so keys distribute well; the pair join is
bounded by bucket sizes, and a hot bucket (all-identical spam docs) is the
data's own skew — AQE skew-join splits it.  At 100 TB, shingling explodes
~n_tokens rows per doc; that stage is embarrassingly parallel and feeds a
partial-aggregated groupBy, so no single-task hotspots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SHINGLE_K = 3
N_HASHES = 12
BAND_SIZE = 3  # 4 bands of 3 hashes
SIMHASH_BITS = 32


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct word-k-gram shingles per doc.  Docs shorter than k words get
    their whole token list as one shingle (so they still participate)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - SHINGLE_K, F.lit(0)))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, SHINGLE_K)),
    )
    return (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, sig array<string>): sig[i] = min(md5(shingle || '#' || i))."""
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"h{i}")
        for i in range(N_HASHES)
    ]
    wide = sh.groupBy("doc_id").agg(*aggs)
    return wide.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(N_HASHES)]).alias("sig")
    )


def minhash_exploded(sigs: DataFrame) -> DataFrame:
    """(doc_id, hash_idx, hash_val) — the signature exploded one row per hash.
    Scalar columns only, so engines/harnesses that hash result values (the
    driver's correctness compare) can canonicalize it; the array form is the
    compact wire format, this is the comparable one."""
    return sigs.select(
        "doc_id", F.posexplode("sig").alias("hash_idx", "hash_val")
    ).select(
        "doc_id", F.col("hash_idx").cast("long").alias("hash_idx"), "hash_val"
    )


def lsh_bands(sigs: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_key): band_key = md5 of the band's hashes."""
    n_bands = N_HASHES // BAND_SIZE
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col("sig")[b * BAND_SIZE + j] for j in range(BAND_SIZE)]
                    )
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return sigs.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band_idx").alias("band_idx"), F.col("b.band_key").alias("band_key")
    )


def lsh_candidate_pairs(bands: DataFrame) -> DataFrame:
    """Distinct (a, b) doc pairs (a < b) sharing at least one band."""
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col("l.band_idx") == F.col("r.band_idx"),
                F.col("l.band_key") == F.col("r.band_key"),
                F.col("l.doc_id") < F.col("r.doc_id"),
            ],
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )


MAX_BAND_DOCS = 64  # all-pairs cap: a band with more docs joins as a star


def lsh_candidate_pairs_capped(
    bands: DataFrame, max_band_docs: int = MAX_BAND_DOCS
) -> DataFrame:
    """Skew-proof candidate pairs: bands at or under ``max_band_docs`` join
    all-pairs exactly as :func:`lsh_candidate_pairs`; HOT bands (identical-
    template spam clones — every member shares every band) emit a STAR to
    the band's minimum doc_id instead of the k^2/2 clique.

    Connected components over the star equal components over the clique
    (a star is a spanning structure of the same vertex set), so dedup
    keep-one/cluster semantics are unchanged; only the per-pair candidate
    list for hot bands is reduced — which is the point.  Measured this
    round (BENCH.md round-4 skew study, sf0.1 documents + clones):
    a 100% clone burst (5k identical docs) makes the uncapped join emit
    12.50M pairs in 25.5 s, and AQE's skew-join split only trims that to
    21.8 s because the blowup is join OUTPUT volume, not input-partition
    imbalance (post-shuffle partitions are balanced at ~391k rows each);
    the capped join emits 5,268 pairs in 1.5 s — ~15x wall, ~2400x
    volume.  At a 15% clone rate the volume gap is 281k vs 1,018 pairs.
    The cap bounds per-band output at O(k), all-pairs elsewhere.

    Scale shape: band sizes ride the same (band_idx, band_key) partitioning
    as the self-join (one extra partial-agg'd pass, no new exchange
    pattern); the hot-band star is a per-band min + join-back.  The sized
    band frame is eagerly materialized (localCheckpoint) before fan-out:
    three consumers (cold left, cold right, star) would otherwise each
    recompute the WHOLE minhash pipeline — shingle explode + signature agg
    — which a formatted-plan audit showed as 12 scans / 6 bands
    computations (caught in round 4; the winnow fp-frame discipline)."""
    sized = bands.join(
        bands.groupBy("band_idx", "band_key").agg(
            F.count("*").alias("n_docs"), F.min("doc_id").alias("hub")
        ),
        on=["band_idx", "band_key"],
    ).localCheckpoint(eager=True)
    cold = sized.filter(F.col("n_docs") <= max_band_docs)
    left = cold.alias("l")
    right = cold.alias("r")
    all_pairs = left.join(
        right,
        on=[
            F.col("l.band_idx") == F.col("r.band_idx"),
            F.col("l.band_key") == F.col("r.band_key"),
            F.col("l.doc_id") < F.col("r.doc_id"),
        ],
    ).select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
    star = (
        sized.filter(
            (F.col("n_docs") > max_band_docs) & (F.col("doc_id") != F.col("hub"))
        )
        .select(F.col("hub").alias("a"), F.col("doc_id").alias("b"))
    )
    return all_pairs.unionByName(star).distinct()


def duck_lsh_pairs_capped_sql(table: str, max_band_docs: int = MAX_BAND_DOCS) -> str:
    """DuckDB twin of :func:`lsh_candidate_pairs_capped`."""
    n_bands = N_HASHES // BAND_SIZE
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, md5({parts}) AS band_key FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(
                f"sig[{b * BAND_SIZE + j + 1}]" for j in range(BAND_SIZE)
            ),
        )
        for b in range(n_bands)
    )
    mins = ", ".join(f"min(md5(shingle || '#{i}'))" for i in range(N_HASHES))
    return rf"""
WITH {duck_shingles_cte(table)},
sigs AS (SELECT doc_id, [{mins}] AS sig FROM shingles GROUP BY doc_id),
bands AS ({band_rows}),
sized AS (
  SELECT b.doc_id, b.band_idx, b.band_key, s.n_docs, s.hub
  FROM bands b JOIN (
    SELECT band_idx, band_key, count(*)::BIGINT AS n_docs,
           min(doc_id) AS hub
    FROM bands GROUP BY 1, 2
  ) s USING (band_idx, band_key)
)
SELECT DISTINCT a, b FROM (
  SELECT l.doc_id AS a, r.doc_id AS b
  FROM sized l JOIN sized r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key
   AND l.doc_id < r.doc_id
  WHERE l.n_docs <= {max_band_docs}
  UNION ALL
  SELECT hub AS a, doc_id AS b FROM sized
  WHERE n_docs > {max_band_docs} AND doc_id <> hub
)
"""


def connected_components(
    pairs: DataFrame,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """(doc_id, component) over the undirected candidate-pair graph, where
    ``component`` is the minimum doc_id reachable — the canonical
    near-duplicate CLUSTERING step after LSH pair generation (keep one doc
    per component, drop the rest).

    Iterative min-label propagation: each round every node takes the min of
    its own label and its neighbors' labels; converged when the (strictly
    decreasing) label sum stops changing.  The driver loop holds only a
    scalar; per-iteration ``localCheckpoint`` truncates the lineage so round
    r's plan never embeds rounds 0..r-1 (same discipline as the crawl loop).
    Rounds needed = graph diameter — small for near-dup clusters (spam
    farms are star-shaped, not paths).  ``docs`` (optional) adds singleton
    documents so every doc gets a component (its own id)."""
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    if docs is not None:
        nodes = docs.select(F.col(id_col).alias("node")).distinct()
    else:
        nodes = edges.select(F.col("src").alias("node")).distinct()
    edges = edges.localCheckpoint(eager=True)
    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint(
        eager=True
    )
    prev_sum = None
    for _ in range(max_iter):
        prop = edges.join(
            labels.withColumnRenamed("node", "dst"), on="dst"
        ).select(F.col("src").alias("node"), "label")
        new = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        # labels only ever decrease, so an unchanged sum == fixpoint (decimal
        # guards against int64 overflow at 10^10-node scale)
        s = new.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]
        labels = new
        if prev_sum is not None and s == prev_sum:
            break
        prev_sum = s
    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("component")
    )


def jaccard_for_pairs(pairs: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact shingle Jaccard for candidate pairs, in parts-per-million.

    inter = |A ∩ B| via join of the two docs' shingle sets through the pair
    list; sizes via a broadcastable per-doc count."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        pairs.join(sh.select(F.col("doc_id").alias("a"), "shingle"), on="a")
        .join(sh.select(F.col("doc_id").alias("b"), "shingle"), on=["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na")), on="a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb")), on="b")
        .select(
            "a",
            "b",
            F.floor(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
                * 1e6
            )
            .cast("long")
            .alias("jaccard_ppm"),
        )
    )


def exact_dup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", min_count: int = 2
) -> DataFrame:
    """(text_md5, n_docs, min_doc_id) per text group; ``min_count=2`` keeps
    only duplicated texts, ``min_count=1`` emits the full content index."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("min_doc_id"))
        .filter(F.col("n_docs") >= min_count)
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash over token md5s, fully JVM-side.

    bit b of md5's first 8 hex chars (a 32-bit int) votes +1/-1; the sign of
    the per-bit sum over all tokens forms the fingerprint.  explode(tokens) x
    shift-and-mask per bit => groupBy(doc) agg of 32 sums — partial aggregation
    keeps the shuffle narrow (one row per doc)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    h32 = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    votes = toks.select("doc_id", h32.alias("h"))
    sums = votes.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    fp = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return sums.select("doc_id", fp.cast("long").alias("simhash"))


# --------------------------------------------------------------------------
# DuckDB oracle SQL (same md5-based pipeline, DuckDB dialect)
# --------------------------------------------------------------------------


def duck_shingles_cte(table: str) -> str:
    return rf"""
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
  FROM {table} WHERE length(trim(text)) > 0
),
shingles AS (
  SELECT DISTINCT doc_id,
    array_to_string(w[i : i + {SHINGLE_K - 1}], ' ') AS shingle
  FROM toks, LATERAL unnest(generate_series(1, greatest(len(w) - {SHINGLE_K - 1}, 1))) AS t(i)
)"""


def duck_minhash_sql(table: str) -> str:
    mins = ", ".join(
        f"min(md5(shingle || '#{i}'))" for i in range(N_HASHES)
    )
    return rf"""
WITH {duck_shingles_cte(table)}
SELECT doc_id, [{mins}] AS sig FROM shingles GROUP BY doc_id
"""


def duck_minhash_exploded_sql(table: str) -> str:
    mins = ", ".join(f"min(md5(shingle || '#{i}'))" for i in range(N_HASHES))
    return rf"""
WITH {duck_shingles_cte(table)},
sigs AS (SELECT doc_id, [{mins}] AS sig FROM shingles GROUP BY doc_id)
SELECT doc_id, (i - 1)::BIGINT AS hash_idx, sig[i] AS hash_val
FROM sigs, LATERAL unnest(generate_series(1, {N_HASHES})) AS t(i)
"""


def duck_simhash_sql(table: str) -> str:
    """The identical 32-bit shift/mask vote pipeline in DuckDB: hex->int via
    ('0x'||substr(md5,1,8))::BIGINT matches Spark's conv(...,16,10)."""
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM {table} WHERE length(trim(text)) > 0
),
h AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
  FROM toks WHERE length(tok) > 0
),
votes AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, LATERAL unnest(generate_series(0, {SIMHASH_BITS - 1})) AS t(b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
FROM votes GROUP BY doc_id
"""


def duck_lsh_pairs_sql(table: str) -> str:
    n_bands = N_HASHES // BAND_SIZE
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, md5({parts}) AS band_key FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig[{b * BAND_SIZE + j + 1}]" for j in range(BAND_SIZE)),
        )
        for b in range(n_bands)
    )
    mins = ", ".join(f"min(md5(shingle || '#{i}'))" for i in range(N_HASHES))
    return rf"""
WITH {duck_shingles_cte(table)},
sigs AS (SELECT doc_id, [{mins}] AS sig FROM shingles GROUP BY doc_id),
bands AS ({band_rows})
SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
FROM bands l JOIN bands r
  ON l.band_idx = r.band_idx AND l.band_key = r.band_key AND l.doc_id < r.doc_id
"""


def duck_components_sql(table: str) -> str:
    """Recursive-CTE oracle for connected_components over the LSH candidate
    pairs: the transitive closure of reachable labels, min per node — an
    implementation-independent fixpoint the iterative Spark propagation must
    land on exactly."""
    n_bands = N_HASHES // BAND_SIZE
    mins = ", ".join(f"min(md5(shingle || '#{i}'))" for i in range(N_HASHES))
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, md5({parts}) AS band_key FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig[{b * BAND_SIZE + j + 1}]" for j in range(BAND_SIZE)),
        )
        for b in range(n_bands)
    )
    return rf"""
WITH RECURSIVE {duck_shingles_cte(table)},
sigs AS (SELECT doc_id, [{mins}] AS sig FROM shingles GROUP BY doc_id),
bands AS ({band_rows}),
pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key AND l.doc_id < r.doc_id
),
edges AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
walk(node, label) AS (
  SELECT doc_id, doc_id FROM {table}
  UNION
  SELECT e.src, w.label FROM edges e JOIN walk w ON w.node = e.dst
)
SELECT node AS doc_id, min(label) AS component FROM walk GROUP BY node
"""


def duck_exact_dups_sql(table: str, min_count: int = 2) -> str:
    return rf"""
SELECT md5(text) AS text_md5, count(*)::BIGINT AS n_docs, min(doc_id) AS min_doc_id
FROM {table} GROUP BY 1 HAVING count(*) >= {min_count}
"""


def duck_jaccard_sql(table: str) -> str:
    """Exact shingle Jaccard (ppm) for the LSH candidate pairs — the full
    minhash->bands->pairs->intersection pipeline in one DuckDB query."""
    n_bands = N_HASHES // BAND_SIZE
    mins = ", ".join(f"min(md5(shingle || '#{i}'))" for i in range(N_HASHES))
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, md5({parts}) AS band_key FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig[{b * BAND_SIZE + j + 1}]" for j in range(BAND_SIZE)),
        )
        for b in range(n_bands)
    )
    return rf"""
WITH {duck_shingles_cte(table)},
sigs AS (SELECT doc_id, [{mins}] AS sig FROM shingles GROUP BY doc_id),
bands AS ({band_rows}),
pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key AND l.doc_id < r.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT p.a, p.b, count(*) AS inter
  FROM pairs p
  JOIN shingles sa ON sa.doc_id = p.a
  JOIN shingles sb ON sb.doc_id = p.b AND sb.shingle = sa.shingle
  GROUP BY p.a, p.b
)
SELECT i.a, i.b,
  floor(i.inter / (za.n_sh + zb.n_sh - i.inter)::DOUBLE * 1e6)::BIGINT AS jaccard_ppm
FROM inter i JOIN sizes za ON za.doc_id = i.a JOIN sizes zb ON zb.doc_id = i.b
"""


# --------------------------------------------------------------------------
# SimHash near-dup PAIR detection (banded, pigeonhole-exact)
# --------------------------------------------------------------------------

SIMHASH_PAIR_BANDS = 4           # 32 bits / 4 bands = 8 bits per band
SIMHASH_PAIR_MAX_HAMMING = 3     # pigeonhole: <=3 flipped bits across 4
#                                  bands => at least one band identical, so
#                                  banding has EXACT recall at this radius
SIMHASH_HOT_BUCKET_CAP = 64      # drop degenerate band buckets (the winnow
#                                  lesson: a key shared by k docs emits k^2
#                                  rows); production widens the fingerprint
#                                  instead of raising the cap


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = SIMHASH_PAIR_MAX_HAMMING,
    bands: int = SIMHASH_PAIR_BANDS,
    hot_bucket_cap: int = SIMHASH_HOT_BUCKET_CAP,
) -> DataFrame:
    """(a, b, hamming): document pairs whose SimHash differs in at most
    ``max_hamming`` bits — the second LSH family next to MinHash banding
    (Manku et al., WWW'07 use exactly this split-and-bucket trick).

    Scale shape: signatures materialize once (one narrow row per doc);
    band keys explode bands-per-doc; candidates come from a bucketed
    self-join on (band, key) — never all pairs — with over-full buckets
    dropped (counted via one partial-agg'd groupBy) before the join; the
    Hamming verify is a JVM bit_count on the pair rows."""
    sig = simhash(df, id_col=id_col, text_col=text_col).localCheckpoint(
        eager=True  # reused by both join branches — never recompute
    )
    width = SIMHASH_BITS // bands
    mask = (1 << width) - 1
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright(F.col("simhash"), i * width)
                    .bitwiseAND(F.lit(mask))
                    .alias("key"),
                )
                for i in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    sizes = banded.groupBy("band", "key").agg(F.count("*").alias("__n"))
    kept = banded.join(
        sizes.filter(F.col("__n") <= hot_bucket_cap).select("band", "key"),
        on=["band", "key"],
    )
    l = kept.select(
        "band", "key", F.col("doc_id").alias("a"), F.col("simhash").alias("ha")
    )
    r = kept.select(
        "band", "key", F.col("doc_id").alias("b"), F.col("simhash").alias("hb")
    )
    cand = (
        l.join(r, on=["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.select("a", "b", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def duck_simhash_pairs_sql(
    table: str,
    max_hamming: int = SIMHASH_PAIR_MAX_HAMMING,
    bands: int = SIMHASH_PAIR_BANDS,
    hot_bucket_cap: int = SIMHASH_HOT_BUCKET_CAP,
) -> str:
    width = SIMHASH_BITS // bands
    mask = (1 << width) - 1
    return rf"""
WITH sig AS ({duck_simhash_sql(table)}),
banded AS (
  SELECT doc_id, simhash, b.band,
         (simhash >> (b.band * {width})) & {mask} AS key
  FROM sig, (SELECT unnest(generate_series(0, {bands - 1})) AS band) b
),
kept AS (
  SELECT * FROM banded
  QUALIFY count(*) OVER (PARTITION BY band, key) <= {hot_bucket_cap}
),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
         l.simhash AS ha, r.simhash AS hb
  FROM kept l JOIN kept r
    ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
)
SELECT a, b, bit_count(xor(ha, hb))::BIGINT AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= {max_hamming}
"""


# -- asymmetric containment (subset/quotation) dedup -----------------------------

CONTAIN_DF_CAP = 64        # shingles in more docs than this are boilerplate
CONTAIN_MIN_PPM = 500_000  # report pairs where >=50% of the smaller doc is shared


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_cap: int = CONTAIN_DF_CAP,
    min_ppm: int = CONTAIN_MIN_PPM,
) -> DataFrame:
    """(doc_a, doc_b, n_inter, n_a, n_b, containment_ppm): document pairs
    where the smaller document's shingle set is substantially contained in
    the larger's — ``containment_ppm = (1e6 * |A∩B|) div min(|A|,|B|)`` in
    exact BIGINT arithmetic.  Catches the asymmetric near-dups Jaccard-LSH
    systematically misses (a short article quoted inside a long aggregator
    page has Jaccard ≈ |A|/|B| → tiny, but containment ≈ 1; Broder 1997
    defines both resemblance and containment for exactly this reason).
    The reference's pipeline has no containment pass; this extends its
    dedup story for training-corpus curation.

    Scale shape: the pair join is an inverted-index (postings) join on the
    shingle — never all-pairs.  Shingles with document frequency > df_cap
    are pruned from BOTH the numerator and the denominators (consistent
    "discriminative shingle space"), which is standard postings-list
    pruning: a boilerplate shingle in k docs would otherwise emit k² join
    rows.  df=1 shingles stay in the denominators (they dilute containment
    — dropping them would report two mostly-disjoint docs as contained)
    but are filtered from the join side as a no-op optimization.  Both
    df-count groupBys partial-aggregate map-side; fan-out per surviving
    shingle is ≤ df_cap², and AQE splits any residual skew.
    """
    sh = shingles(df, id_col, text_col)
    dfc = sh.groupBy("shingle").agg(F.count("*").alias("n_docs"))
    informative = sh.join(
        dfc.where(F.col("n_docs") <= df_cap).select("shingle"), "shingle"
    )
    sizes = informative.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    joinable = sh.join(
        dfc.where((F.col("n_docs") >= 2) & (F.col("n_docs") <= df_cap)).select("shingle"),
        "shingle",
    )
    inter = (
        joinable.alias("l")
        .join(
            joinable.select(
                F.col("shingle").alias("r_shingle"), F.col("doc_id").alias("doc_b")
            ),
            F.col("shingle") == F.col("r_shingle"),
        )
        .where(F.col("doc_id") < F.col("doc_b"))
        .groupBy(F.col("doc_id").alias("doc_a"), "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")),
            "doc_b",
        )
        .select(
            "doc_a", "doc_b", "n_inter", "n_a", "n_b",
            F.expr("(1000000 * n_inter) div least(n_a, n_b)").alias("containment_ppm"),
        )
        .where(F.col("containment_ppm") >= min_ppm)
    )


def duck_containment_sql(
    table: str,
    df_cap: int = CONTAIN_DF_CAP,
    min_ppm: int = CONTAIN_MIN_PPM,
) -> str:
    return rf"""
WITH {duck_shingles_cte(table)},
dfc AS (
  SELECT shingle, count(*)::BIGINT AS n_docs FROM shingles GROUP BY 1
),
informative AS (
  SELECT s.doc_id, s.shingle
  FROM shingles s JOIN dfc USING (shingle) WHERE dfc.n_docs <= {df_cap}
),
sizes AS (
  SELECT doc_id, count(*)::BIGINT AS n_sh FROM informative GROUP BY 1
),
joinable AS (
  SELECT s.doc_id, s.shingle
  FROM shingles s JOIN dfc USING (shingle)
  WHERE dfc.n_docs BETWEEN 2 AND {df_cap}
),
inter AS (
  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, count(*)::BIGINT AS n_inter
  FROM joinable l JOIN joinable r
    ON l.shingle = r.shingle AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
       (1000000 * i.n_inter) // least(sa.n_sh, sb.n_sh) AS containment_ppm
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE (1000000 * i.n_inter) // least(sa.n_sh, sb.n_sh) >= {min_ppm}
"""


# --------------------------------------------------------------------------
# Exact set-similarity join via prefix filtering (PPJoin-style)
# --------------------------------------------------------------------------
#
# MinHash-LSH (above) trades recall for speed; some curation steps need the
# EXACT pair set (legal dedup audits, eval-set leakage reports).  The
# scalable exact method is prefix filtering (Chaudhuri et al. 2006, PPJoin
# Xiao et al. 2008): order every doc's shingles by global rarity; if
# J(A,B) >= t, then A and B must share one of each other's first
# n - ceil(t*n) + 1 shingles — so joining on prefix shingles alone loses
# NOTHING, and rare-first ordering keeps the join groups small.

PPJOIN_T_PPM = 500_000


def ppjoin_exact_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    t_ppm: int = PPJOIN_T_PPM,
) -> DataFrame:
    """ALL pairs with shingle Jaccard >= t (complete, not probabilistic).

    Output: (a, b, jaccard_ppm), a < b — provably the same set a brute
    force produces, graded against a DuckDB all-pairs oracle.

    Scale shape: the rarity order is a dense global seq over the VOCAB
    (operators/ordering's range-partition trick — no 1-partition window);
    prefix tokens are by construction the rarest, so join groups on them
    stay small where the data allows it at all; the exact Jaccard verify
    touches only surviving candidates (reuses jaccard_for_pairs)."""
    from ..operators.ordering import with_global_seq

    sh = shingles(df, id_col, text_col)
    vocab = sh.groupBy("shingle").agg(F.count("*").alias("df_sh"))
    ranked = with_global_seq(vocab, ["df_sh", "shingle"], out_col="rnk")
    g = sh.join(ranked.select("shingle", "rnk"), "shingle")
    sets = g.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("rnk")).alias("rnks")
    )
    # prefix length n - ceil(t*n) + 1, in exact integer arithmetic
    plen = F.expr(f"size(rnks) - ((size(rnks) * {t_ppm} + 999999) div 1000000) + 1")
    pre = sets.select(
        "doc_id", F.explode(F.slice("rnks", F.lit(1), plen)).alias("rnk")
    )
    cands = (
        pre.alias("l")
        .join(pre.alias("r"), "rnk")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )
    return jaccard_for_pairs(cands, sh).where(
        F.col("jaccard_ppm") >= F.lit(t_ppm)
    )


def duck_ppjoin_sql(table: str, t_ppm: int = PPJOIN_T_PPM) -> str:
    """Brute-force truth: exact Jaccard over EVERY co-shingled pair — the
    completeness of the prefix filter is what the hash-match proves."""
    return rf"""
WITH {duck_shingles_cte(table)},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS inter
  FROM shingles sa JOIN shingles sb
    ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
  GROUP BY 1, 2
)
SELECT i.a, i.b,
  floor(i.inter / (za.n_sh + zb.n_sh - i.inter)::DOUBLE * 1e6)::BIGINT
    AS jaccard_ppm
FROM inter i
JOIN sizes za ON za.doc_id = i.a
JOIN sizes zb ON zb.doc_id = i.b
WHERE floor(i.inter / (za.n_sh + zb.n_sh - i.inter)::DOUBLE * 1e6) >= {t_ppm}
"""


# --- leakage-safe train/validation split -------------------------------------
#
# Splitting by doc_id hash leaks: a document and its near-duplicate land on
# opposite sides and the validation loss silently measures memorization
# (the classic C4/GPT-3-era eval-contamination failure).  The fix is to
# split by NEAR-DUP COMPONENT — every doc in a duplicate cluster goes to
# the same side — which composes directly from the LSH pair graph's
# connected components; the side is a deterministic hash of the component
# id, so the split is resume-stable and engine-independent.

SPLIT_VALID_PCT = 5


def leakage_safe_split(components: DataFrame, valid_pct: int = SPLIT_VALID_PCT) -> DataFrame:
    """(doc_id, component, split): hash-split at COMPONENT grain —
    'valid' for md5(component) % 100 < valid_pct, else 'train'.  Pure
    map over the components frame; near-dups cannot straddle sides by
    construction."""
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("component").cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(100),
    )
    return components.select(
        "doc_id",
        "component",
        F.when(bucket < valid_pct, F.lit("valid"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def duck_split_sql(table: str, valid_pct: int = SPLIT_VALID_PCT) -> str:
    """DuckDB twin over the recursive-closure components oracle."""
    return rf"""
SELECT doc_id, component,
       CASE WHEN ('0x' || substr(md5(component::VARCHAR), 1, 8))::BIGINT % 100
                 < {valid_pct}
            THEN 'valid' ELSE 'train' END AS split
FROM ({duck_components_sql(table)})
"""


def lsh_eval_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    t_ppm: int = PPJOIN_T_PPM,
) -> DataFrame:
    """Candidate-quality evaluation of MinHash-LSH against exact truth —
    the report a dedup pipeline publishes before trusting its banding
    constants: recall (what fraction of true Jaccard>=t pairs the bands
    surface) and precision (what fraction of surfaced candidates are
    truly >=t).  Truth is the prefix-filter EXACT join (ppjoin_exact_pairs
    — scalable, provably complete), never an all-pairs scan.

    Single row: (n_true, n_cand, n_hit, recall_ppm, precision_ppm), ppm
    NULL when the denominator is empty.  Both pair relations are
    localCheckpointed before reuse (each feeds a count AND the
    intersection join — the engine's branch-recompute discipline); the
    final assembly cross-joins three single-row aggregates (bounded)."""
    truth = (
        ppjoin_exact_pairs(df, id_col, text_col, t_ppm)
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    sh = shingles(df, id_col, text_col)
    cand = (
        lsh_candidate_pairs(lsh_bands(minhash_signatures(sh)))
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    n_true = truth.agg(F.count("*").cast("long").alias("n_true"))
    n_cand = cand.agg(F.count("*").cast("long").alias("n_cand"))
    n_hit = truth.join(cand, ["a", "b"]).agg(
        F.count("*").cast("long").alias("n_hit")
    )
    return (
        n_true.crossJoin(n_cand)
        .crossJoin(n_hit)
        .select(
            "n_true",
            "n_cand",
            "n_hit",
            F.expr("n_hit * 1000000L DIV nullif(n_true, 0)").alias("recall_ppm"),
            F.expr("n_hit * 1000000L DIV nullif(n_cand, 0)").alias(
                "precision_ppm"
            ),
        )
    )


def duck_lsh_eval_sql(table: str, t_ppm: int = PPJOIN_T_PPM) -> str:
    """DuckDB twin of :func:`lsh_eval_report`."""
    return rf"""
WITH truth AS (SELECT a, b FROM ({duck_ppjoin_sql(table, t_ppm)})),
cand AS (SELECT a, b FROM ({duck_lsh_pairs_sql(table)})),
counts AS (
  SELECT
    (SELECT count(*) FROM truth)::BIGINT AS n_true,
    (SELECT count(*) FROM cand)::BIGINT AS n_cand,
    (SELECT count(*) FROM truth t JOIN cand c
       ON t.a = c.a AND t.b = c.b)::BIGINT AS n_hit
)
SELECT n_true, n_cand, n_hit,
       (n_hit * 1000000 // nullif(n_true, 0))::BIGINT AS recall_ppm,
       (n_hit * 1000000 // nullif(n_cand, 0))::BIGINT AS precision_ppm
FROM counts
"""


# -- cross-family agreement audit ------------------------------------------------
#
# The pipeline fields TWO LSH families over the same corpus: MinHash
# banding (shingle-set resemblance) and SimHash banding (weighted-token
# Hamming).  They target the same notion — near-duplicate text — through
# different geometry, so their pair sets should mostly agree; the
# disagreement volume is the evaluation number a curation run watches when
# tuning thresholds (a family drifting away from the other flags a
# threshold/shingling bug long before eyeballing documents would).

AGREE_JACCARD_MIN_PPM = 500_000


def method_agreement(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_min_ppm: int = AGREE_JACCARD_MIN_PPM,
) -> DataFrame:
    """One-row summary: (n_minhash, n_simhash, n_both, n_union,
    agreement_ppm) where the MinHash side is the LSH candidate set
    verified at shingle Jaccard >= ``jaccard_min_ppm`` and the SimHash
    side is the banded Hamming<=3 pair set; agreement_ppm = floor(1e6 *
    n_both / n_union) (NULL when both sets are empty).

    Scale shape: both pair relations are the engine's existing bucketed
    self-joins (never all-pairs); the audit adds ONE pair-key full-outer
    join and a scalar aggregate over relations that are near-dup-sized,
    not corpus-sized."""
    sh = shingles(df, id_col=id_col, text_col=text_col)
    mh = (
        jaccard_for_pairs(
            lsh_candidate_pairs(lsh_bands(minhash_signatures(sh))), sh
        )
        .where(F.col("jaccard_ppm") >= jaccard_min_ppm)
        .select("a", "b", F.lit(1).alias("m"))
    )
    sp = simhash_pairs(df, id_col=id_col, text_col=text_col).select(
        "a", "b", F.lit(1).alias("s")
    )
    j = mh.join(sp, on=["a", "b"], how="full_outer")
    # coalesce(..., 0): SUM over an empty pair universe is NULL, but the
    # documented contract is NULL only for agreement_ppm — counts are 0.
    agg = j.agg(
        F.coalesce(
            F.sum(F.when(F.col("m").isNotNull(), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_minhash"),
        F.coalesce(
            F.sum(F.when(F.col("s").isNotNull(), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_simhash"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("m").isNotNull() & F.col("s").isNotNull(), 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_both"),
        F.count("*").cast("long").alias("n_union"),
    )
    return agg.select(
        "*",
        F.when(
            F.col("n_union") > 0,
            F.expr("n_both * 1000000L DIV n_union"),
        )
        .cast("long")
        .alias("agreement_ppm"),
    )


def duck_method_agreement_sql(
    table: str, jaccard_min_ppm: int = AGREE_JACCARD_MIN_PPM
) -> str:
    """DuckDB twin of :func:`method_agreement` — composes the two
    family oracles verbatim so threshold drift is impossible."""
    return f"""
WITH mh AS (
  SELECT a, b FROM ({duck_jaccard_sql(table)})
  WHERE jaccard_ppm >= {jaccard_min_ppm}
),
sp AS (
  SELECT a, b FROM ({duck_simhash_pairs_sql(table)})
),
j AS (
  SELECT mh.a AS ma, sp.a AS sa
  FROM mh FULL OUTER JOIN sp ON mh.a = sp.a AND mh.b = sp.b
),
agg AS (
  SELECT coalesce(sum(CASE WHEN ma IS NOT NULL THEN 1 ELSE 0 END),
                  0)::BIGINT AS n_minhash,
         coalesce(sum(CASE WHEN sa IS NOT NULL THEN 1 ELSE 0 END),
                  0)::BIGINT AS n_simhash,
         coalesce(sum(CASE WHEN ma IS NOT NULL AND sa IS NOT NULL
                  THEN 1 ELSE 0 END), 0)::BIGINT AS n_both,
         count(*)::BIGINT AS n_union
  FROM j
)
SELECT n_minhash, n_simhash, n_both, n_union,
       CASE WHEN n_union > 0
            THEN (n_both * 1000000 // n_union)::BIGINT END
         AS agreement_ppm
FROM agg
"""
