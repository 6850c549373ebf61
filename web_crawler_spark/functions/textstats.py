"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID, document fingerprinting.

Everything here is JVM-side (`pyspark.sql.functions` only — whole-stage
codegen, no Python in the hot path), and each operator ships a matching DuckDB
oracle SQL template (the driver's correctness gate).  Cross-engine value
equality dictates the design rules:

* ratios are emitted as integer parts-per-million (``floor(x * 1e6)``) —
  integer division of identical IEEE doubles is bit-deterministic across
  engines, while ``round()`` tie-breaking and libm functions (exp/log) differ;
* regex character classes are ASCII-explicit (Java regex vs RE2 agree there);
* tokenization = split on ``\\s+`` of trimmed text, empty text => 0 tokens.

The reference has no text analytics beyond ``len(text)``-style example counts
(reference test_quick.py:28-38); this layer is the "beyond the reference"
training-data surface the engine adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

STOPWORDS = ["the", "a", "an", "of", "and", "to", "in", "is", "that", "it"]

_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit"],
    "es": ["el", "la", "los", "de", "que", "y", "en"],
    "fr": ["le", "les", "des", "et", "est", "une", "dans"],
}
CJK_PATTERN = r"[\x{4e00}-\x{9fff}]"
PUNCT_PATTERN = r"[.,;:!?]"
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def tokens_col(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.trim(text), r"\s+")
    )


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    return F.size(tokens_col(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-shaped segmentation count: letter runs / digit runs / symbol runs,
    each with optional leading space — a cheap proxy for subword token cost."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def _ppm(num: Column, den: Column) -> Column:
    return F.floor(num.cast("double") / F.greatest(den.cast("double"), F.lit(1.0)) * 1e6).cast("long")


def quality_columns(text: Column) -> dict[str, Column]:
    """Deterministic quality signals (all integer outputs)."""
    toks = tokens_col(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    punct = F.size(F.regexp_extract_all(text, F.lit(PUNCT_PATTERN), F.lit(0)))
    stop_hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS))
    )
    nonspace = F.length(F.regexp_replace(text, r"\s", ""))
    return {
        "n_chars_m": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "punct_ppm": _ppm(punct, n_chars),
        "stopword_ppm": _ppm(stop_hits, n_tok),
        "mean_word_len_ppm": _ppm(nonspace, n_tok),
    }


def lang_scores(text: Column) -> dict[str, Column]:
    toks = F.transform(tokens_col(text), lambda t: F.lower(t))
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(markers)))
        for lang, markers in _LANG_MARKERS.items()
    }
    scores["zh"] = F.size(F.regexp_extract_all(text, F.lit(CJK_PATTERN), F.lit(0)))
    return scores


def lang_pred(text: Column) -> Column:
    """Argmax of marker scores with a fixed tie priority en>de>es>fr>zh;
    'und' when nothing matches.  Same CASE cascade as the DuckDB oracle."""
    s = lang_scores(text)
    all_zero = (
        (s["en"] == 0) & (s["de"] == 0) & (s["es"] == 0) & (s["fr"] == 0) & (s["zh"] == 0)
    )
    return (
        F.when(all_zero, F.lit("und"))
        .when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["zh"]),
            F.lit("en"),
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]) & (s["de"] >= s["zh"]), F.lit("de"))
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["zh"]), F.lit("es"))
        .when((s["fr"] >= s["zh"]), F.lit("fr"))
        .otherwise(F.lit("zh"))
    )


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text —
    identical in Spark and DuckDB, the key for exact near-whitespace dedup."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


TOP_TERMS_K = 5


def top_terms(
    df: DataFrame, k: int = TOP_TERMS_K, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc top-``k`` distinctive terms — keyword extraction for corpus
    curation.  Rank = (term frequency DESC, document frequency ASC, term
    ASC): frequent in THIS doc, rare across the corpus.  Deliberately
    integer-only (no float idf) so the ranking is bit-identical across
    engines; exact ``tf``/``df`` ride along for any downstream idf
    weighting.  Plan shape: tf agg (shuffle on doc,term) -> df agg +
    term-keyed join (shuffle on term) -> per-doc window whose constant-k
    row_number compiles to WindowGroupLimit partial top-k (skew-safe)."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        tf.join(dfreq, on="term")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "doc_id", "term", "tf", "df", F.col("rnk").cast("long").alias("rnk")
        )
    )


def duck_top_terms_sql(table: str, k: int = TOP_TERMS_K) -> str:
    return rf"""
WITH toks AS (
  SELECT doc_id, t.term
  FROM {table}, UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
  WHERE t.term <> ''
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1)
SELECT doc_id, term, tf, df, rnk FROM (
  SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
         row_number() OVER (
           PARTITION BY tf.doc_id ORDER BY tf.tf DESC, dfq.df ASC, tf.term ASC
         ) AS rnk
  FROM tf JOIN dfq USING (term)
) WHERE rnk <= {k}
"""


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    cols = quality_columns(t)
    out = df
    for name, c in cols.items():
        out = out.withColumn(name, c)
    return (
        out.withColumn("n_tokens_bpe", bpe_ish_token_count(t).cast("long"))
        .withColumn("lang_pred", lang_pred(t))
        .withColumn("fingerprint", fingerprint(t))
    )


# --------------------------------------------------------------------------
# DuckDB oracle SQL fragments (same semantics, DuckDB dialect).
# {T} = table/view name holding (doc_id, text).
# --------------------------------------------------------------------------

_DUCK_TOKS = r"CASE WHEN trim(text) = '' THEN [] ELSE regexp_split_to_array(trim(text), '\s+') END"

DUCK_QUALITY_SQL = rf"""
SELECT
  doc_id,
  length(text)::BIGINT AS n_chars_m,
  len({_DUCK_TOKS})::BIGINT AS n_tokens,
  floor(len(regexp_extract_all(text, '[.,;:!?]')) / greatest(length(text), 1)::DOUBLE * 1e6)::BIGINT AS punct_ppm,
  floor(len(list_filter({_DUCK_TOKS}, t -> lower(t) IN ({{stopwords}}))) / greatest(len({_DUCK_TOKS}), 1)::DOUBLE * 1e6)::BIGINT AS stopword_ppm,
  floor(length(regexp_replace(text, '\s', '', 'g')) / greatest(len({_DUCK_TOKS}), 1)::DOUBLE * 1e6)::BIGINT AS mean_word_len_ppm
FROM {{T}}
"""


def duck_quality_sql(table: str) -> str:
    stop = ", ".join(f"'{w}'" for w in STOPWORDS)
    return DUCK_QUALITY_SQL.format(T=table, stopwords=stop)


def duck_langid_sql(table: str) -> str:
    toks = rf"list_transform({_DUCK_TOKS}, t -> lower(t))"
    score = {
        lang: f"len(list_filter({toks}, t -> t IN ({', '.join(repr(w) for w in ws)})))"
        for lang, ws in _LANG_MARKERS.items()
    }
    score["zh"] = r"len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]'))"
    return rf"""
SELECT doc_id,
  CASE
    WHEN {score['en']} = 0 AND {score['de']} = 0 AND {score['es']} = 0 AND {score['fr']} = 0 AND {score['zh']} = 0 THEN 'und'
    WHEN {score['en']} >= {score['de']} AND {score['en']} >= {score['es']} AND {score['en']} >= {score['fr']} AND {score['en']} >= {score['zh']} THEN 'en'
    WHEN {score['de']} >= {score['es']} AND {score['de']} >= {score['fr']} AND {score['de']} >= {score['zh']} THEN 'de'
    WHEN {score['es']} >= {score['fr']} AND {score['es']} >= {score['zh']} THEN 'es'
    WHEN {score['fr']} >= {score['zh']} THEN 'fr'
    ELSE 'zh'
  END AS lang_pred
FROM {table}
"""


def duck_tokens_sql(table: str) -> str:
    return rf"""
SELECT doc_id,
  len({_DUCK_TOKS})::BIGINT AS n_tokens,
  len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))::BIGINT AS n_tokens_bpe
FROM {table}
"""


def duck_fingerprint_sql(table: str) -> str:
    return rf"""
SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
FROM {table}
"""


def length_histogram(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Corpus token-length distribution in power-of-two buckets: the
    sanity/curation view every training-data run starts from ("how long are
    my documents?").  Output: (len_bucket, n_docs, total_tokens, min_tokens,
    max_tokens); bucket b holds docs with 2^(b-1) <= n_tokens < 2^b, and
    bucket 0 is empty docs.

    The bucket is the BINARY-STRING LENGTH of the token count — an
    integer-exact floor(log2(n))+1 that is bit-identical across engines
    (floating log2 at power-of-two boundaries is not).  Scale shape: map-side
    projection into a partial-agg'd groupBy on ~60 buckets — the shuffled
    relation is O(buckets x partitions), independent of corpus size."""
    t = F.col(text_col)
    toks = F.when(
        F.length(F.trim(t)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(t), r"\s+"))
    n_tok = F.size(toks).cast("long")
    bucket = F.when(n_tok == 0, F.lit(0)).otherwise(
        F.length(F.conv(n_tok.cast("string"), 10, 2))
    ).cast("long")
    return (
        df.select(n_tok.alias("n_tokens"), bucket.alias("len_bucket"))
        .groupBy("len_bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
        )
    )


def duck_length_histogram_sql(table: str) -> str:
    return rf"""
WITH n AS (
  SELECT len({_DUCK_TOKS})::BIGINT AS n_tokens FROM {table}
)
SELECT
  CASE WHEN n_tokens = 0 THEN 0 ELSE length(bin(n_tokens)) END::BIGINT AS len_bucket,
  count(*)::BIGINT AS n_docs,
  sum(n_tokens)::BIGINT AS total_tokens,
  min(n_tokens)::BIGINT AS min_tokens,
  max(n_tokens)::BIGINT AS max_tokens
FROM n GROUP BY 1
"""


# -- unigram corpus-LM quality score (CCNet-lite) -----------------------------
#
# CCNet/RefinedWeb bucket documents by LM perplexity; the integer-exact
# distributed stand-in is the mean corpus-frequency of a document's terms
# (common-language prose scores high, gibberish / rare-token spam scores
# low).  Float log-probs cannot hash-match across engines (order-dependent
# summation), so every step here is BIGINT floor arithmetic — the same
# determinism contract as host_pagerank.


def unigram_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_terms, score_ppm): per-document mean term frequency, each
    term's frequency expressed in ppm of total corpus tokens (floor), then
    floor-averaged over the document's term occurrences.

    Scale shape: one explode -> per-term partial agg builds the frequency
    table; the corpus total is derived from that (small) table, not from a
    second pass over the token stream; the per-occurrence lookup joins on
    term.  Production crawls cap the table to the top-K vocabulary and
    broadcast it (rare terms default to 0 ppm — same integer contract),
    turning the lookup map-side."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
        ).alias("term"),
    ).filter(F.col("term") != "")
    freq = toks.groupBy("term").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("n_total"))
    ppm = freq.crossJoin(F.broadcast(total)).select(
        "term", F.expr("c * 1000000 DIV n_total").alias("term_ppm")
    )
    per_doc = (
        toks.join(ppm, on="term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            F.expr("sum(term_ppm) DIV count(*)").alias("score_ppm"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_terms"), F.lit(0)).cast("long").alias("n_terms"),
            F.coalesce(F.col("score_ppm"), F.lit(0)).cast("long").alias("score_ppm"),
        )
    )


def duck_unigram_sql(table: str, id_col: str = "doc_id") -> str:
    return rf"""
WITH toks AS (
  SELECT {id_col} AS doc_id, t.term
  FROM {table}, UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
  WHERE t.term <> ''
),
freq AS (SELECT term, count(*)::BIGINT AS c FROM toks GROUP BY 1),
tot AS (SELECT sum(c)::BIGINT AS n_total FROM freq),
ppm AS (SELECT term, c * 1000000 // (SELECT n_total FROM tot) AS term_ppm FROM freq),
per_doc AS (
  SELECT doc_id, count(*)::BIGINT AS n_terms,
         sum(term_ppm) // count(*) AS score_ppm
  FROM toks JOIN ppm USING (term) GROUP BY 1
)
SELECT d.{id_col} AS doc_id,
       coalesce(p.n_terms, 0)::BIGINT AS n_terms,
       coalesce(p.score_ppm, 0)::BIGINT AS score_ppm
FROM {table} d LEFT JOIN per_doc p ON p.doc_id = d.{id_col}
"""


# -- capped inverted index (postings build) -----------------------------------
#
# The classic crawl downstream: term -> posting list.  The cap is standard
# postings pruning (champion lists): boilerplate terms appearing in most of
# a 10^10-doc corpus must not materialize 10^10-element arrays on one
# reducer.  Full document frequency still rides the same exchange, so
# ranking signals survive the cap.

POSTINGS_CAP = 20


def inverted_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cap: int = POSTINGS_CAP,
) -> DataFrame:
    """(term, df, postings): per term, the full document frequency and the
    first ``cap`` doc ids ascending.

    Scale shape: explode -> distinct (term, doc) with map-side partials ->
    the per-term cap is a constant-k row_number that compiles to
    WindowGroupLimit (each map partition ships <= cap rows per term), so the
    hot boilerplate term costs cap x partitions rows, never its true
    posting list; collect_list only ever sees <= cap rows per group."""
    from pyspark.sql import Window

    td = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    dfreq = td.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("term").orderBy("doc_id")
    top = (
        td.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .groupBy("term")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("postings"))
    )
    return top.join(dfreq, on="term").select("term", "df", "postings")


def duck_postings_sql(table: str, cap: int = POSTINGS_CAP) -> str:
    return rf"""
WITH td AS (
  SELECT DISTINCT doc_id, t.term
  FROM {table}, UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
  WHERE t.term <> ''
),
dfq AS (SELECT term, count(*)::BIGINT AS df FROM td GROUP BY 1),
top AS (
  SELECT term, doc_id FROM (
    SELECT term, doc_id,
           row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
    FROM td
  ) WHERE rn <= {cap}
)
SELECT t.term, d.df, list_sort(list(t.doc_id)) AS postings
FROM top t JOIN dfq d USING (term)
GROUP BY t.term, d.df
"""


# -- BM25 ranked retrieval (integer-exact, Robertson et al.) -------------------
#
# The retrieval scorer every crawl corpus ultimately feeds (and the standard
# relevance prior for LLM-data curation, e.g. retrieval-based quality
# filtering).  Real BM25's log-idf is not reproducible bit-for-bit across
# engines (libm vs JVM transcendentals), so this uses the same monotone
# rational surrogate family (RSJ odds without the log) with every step in
# BIGINT floor arithmetic — bit-identical across engines, partition counts,
# and reduction orders, like host_pagerank:
#
#   idf_ppm  = 1e6 * (2*(N - df) + 1) / (2*df + 1)            [RSJ odds]
#   tfc_ppm  = 1e6 * tf*(k1+1) / (tf + k1*((1-b) + b*dl/avgdl))
#   score    = sum over query terms of idf_ppm * tfc_ppm / 1e6
#
# with k1=1.2, b=0.75 held as exact /1000 rationals.  Overflow bound:
# idf_ppm * tfc_ppm <= ~2e6*(2N+1) must stay < 2^63, i.e. N up to ~2e12
# docs per corpus shard; beyond that, cap idf_ppm (mirrored in the oracle).

BM25_K1_MILLI = 1200  # k1 = 1.2
BM25_B_MILLI = 750    # b = 0.75
BM25_TOPK = 20
BM25_QUERY = ("spark", "join", "window")


def _bm25_contrib_expr(scale_b: int = BM25_B_MILLI, k1: int = BM25_K1_MILLI) -> str:
    """The shared integer BM25 term formula over columns (tf, dl, idf_ppm)
    and the scalar avgdl_ppm placeholder — identical text is used to build
    both the Spark expression and the DuckDB oracle, divergence-proof."""
    one_minus_b = (1000 - scale_b) * 1000  # (1-b) in ppm
    return (
        "(idf_ppm * ((tf * 2200000000000) {div} "
        f"(tf * 1000000 + ({k1} * ({one_minus_b} + ({scale_b} * "
        "(dl * 1000000000000 {div} {avgdl_ppm})) {div} 1000)) {div} 1000)"
        ")) {div} 1000000"
    )


def bm25_topk(
    df: DataFrame,
    query_terms: tuple[str, ...] = BM25_QUERY,
    k: int = BM25_TOPK,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score_ppm, rnk): top-k documents for a fixed query under
    integer-exact BM25 (module docstring), ties broken by doc_id ascending.

    Scale shape: ONE tokenize pass computes doc length and per-query-term
    tf together (conditional partial-agg'd sums keyed on doc_id — no
    tf-to-dl join, no second token pass); the per-term document frequencies
    and the corpus totals derive from that per-doc frame (tiny aggregates);
    idf joins back as a broadcast of |query| rows.  The final top-k
    collapses to TakeOrderedAndProject (per-partition partial top-k — each
    map partition ships <= k candidate rows, no global sort), with Window
    only ranking the k survivors."""
    from pyspark.sql import Window

    qt = [t.lower() for t in dict.fromkeys(query_terms)]
    toks = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    aggs = [F.count("*").cast("long").alias("dl")]
    for i, t in enumerate(qt):
        aggs.append(
            F.sum(F.when(F.col("term") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"tf_{i}")
        )
    per_doc = toks.groupBy("doc_id").agg(*aggs).localCheckpoint(eager=True)
    n_docs = df.count()
    total_toks = per_doc.agg(F.coalesce(F.sum("dl"), F.lit(0))).first()[0]
    if n_docs == 0 or int(total_toks) == 0:
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.lit(0).cast("long").alias("score_ppm"),
            F.lit(0).cast("long").alias("rnk"),
        ).limit(0)
    avgdl_ppm = (int(total_toks) * 1_000_000) // int(n_docs)
    tf = per_doc.select(
        "doc_id",
        "dl",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("term"), F.col(f"tf_{i}").alias("tf")
                    )
                    for i, t in enumerate(qt)
                ]
            )
        ).alias("z"),
    ).select("doc_id", "dl", "z.term", "z.tf").filter(F.col("tf") > 0)
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df_t"))
    idf = dfreq.select(
        "term",
        F.expr(
            f"(2 * ({n_docs}L - df_t) + 1) * 1000000L DIV (2 * df_t + 1)"
        ).alias("idf_ppm"),
    )
    contrib = _bm25_contrib_expr().format(div="DIV", avgdl_ppm=f"{avgdl_ppm}L")
    scored = (
        tf.join(F.broadcast(idf), on="term")
        .withColumn("c_ppm", F.expr(contrib))
        .groupBy("doc_id")
        .agg(F.sum("c_ppm").cast("long").alias("score_ppm"))
    )
    # global top-k via orderBy+limit => TakeOrderedAndProject (per-partition
    # partial top-k; each map task ships <= k rows) — NOT a row_number over
    # an unpartitioned window, which would sort every scored doc in one
    # task.  The rank window then runs over the <= k survivors only (the
    # bloom.py bounded-single-partition convention).
    top = scored.orderBy(F.desc("score_ppm"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score_ppm"), F.asc("doc_id"))
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("long"))
        .select("doc_id", "score_ppm", "rnk")
    )


def duck_bm25_sql(
    table: str,
    query_terms: tuple[str, ...] = BM25_QUERY,
    k: int = BM25_TOPK,
    id_col: str = "doc_id",
) -> str:
    qt = [t.lower() for t in dict.fromkeys(query_terms)]
    tf_cols = ",\n         ".join(
        f"sum(CASE WHEN term = '{t}' THEN 1 ELSE 0 END)::BIGINT AS tf_{i}"
        for i, t in enumerate(qt)
    )
    tf_union = "\n  UNION ALL ".join(
        f"SELECT doc_id, dl, '{t}' AS term, tf_{i} AS tf FROM per_doc WHERE tf_{i} > 0"
        for i, t in enumerate(qt)
    )
    contrib = _bm25_contrib_expr().format(
        div="//", avgdl_ppm="(SELECT avgdl_ppm FROM av)"
    )
    return rf"""
WITH toks AS (
  SELECT {id_col} AS doc_id, t.term
  FROM {table}, UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
  WHERE t.term <> ''
),
per_doc AS (
  SELECT doc_id, count(*)::BIGINT AS dl,
         {tf_cols}
  FROM toks GROUP BY 1
),
nn AS (SELECT count(*)::BIGINT AS n FROM {table}),
av AS (
  SELECT sum(dl)::BIGINT * 1000000 // (SELECT n FROM nn) AS avgdl_ppm
  FROM per_doc
),
tf AS (
  {tf_union}
),
dfq AS (SELECT term, count(*)::BIGINT AS df_t FROM tf GROUP BY 1),
idf AS (
  SELECT term,
         (2 * ((SELECT n FROM nn) - df_t) + 1) * 1000000 // (2 * df_t + 1)
           AS idf_ppm
  FROM dfq
),
sc AS (
  SELECT t.doc_id, sum({contrib})::BIGINT AS score_ppm
  FROM tf t JOIN idf ON idf.term = t.term
  GROUP BY 1
)
SELECT doc_id, score_ppm, rnk FROM (
  SELECT doc_id, score_ppm,
         row_number() OVER (ORDER BY score_ppm DESC, doc_id)::BIGINT AS rnk
  FROM sc
) WHERE rnk <= {k}
"""


def merge_postings(a: DataFrame, b: DataFrame, cap: int = POSTINGS_CAP) -> DataFrame:
    """Merge two capped inverted-index shards built over DISJOINT doc-id
    sets (incremental index maintenance: base + new-crawl delta).  df adds
    exactly because each doc lives in one shard; merged postings = first
    ``cap`` ascending of the union, exact because each shard's cap already
    kept its smallest doc ids — champion lists are mergeable summaries, the
    same algebra as HLL registers and CMS counters.

    Scale shape: ONE full-outer join on term with JVM array ops (concat /
    sort_array / slice) — no re-tokenization of either corpus; co-locate by
    writing shards bucketed on term to make the exchange disappear."""
    empty = F.array().cast("array<bigint>")
    a2 = a.select(
        "term", F.col("df").alias("df_a"), F.col("postings").alias("p_a")
    )
    b2 = b.select(
        "term", F.col("df").alias("df_b"), F.col("postings").alias("p_b")
    )
    return a2.join(b2, on="term", how="full_outer").select(
        "term",
        (F.coalesce("df_a", F.lit(0)) + F.coalesce("df_b", F.lit(0)))
        .cast("long")
        .alias("df"),
        F.slice(
            F.sort_array(
                F.concat(
                    F.coalesce(F.col("p_a"), empty), F.coalesce(F.col("p_b"), empty)
                )
            ),
            1,
            cap,
        ).alias("postings"),
    )


# -- per-language length quantiles (from the histogram, not a sort) -----------

QUANTILE_PCTS = (50, 90, 99)


def length_quantiles(
    df: DataFrame,
    pcts: tuple[int, ...] = QUANTILE_PCTS,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """(lang, q_pct, len_bucket): per-language token-length quantiles at
    BUCKET grain — the smallest power-of-two bucket whose cumulative doc
    count covers q% of the language.  Quantiles-from-histogram is the
    scale-right shape: a 10^10-doc exact quantile needs a global sort per
    language, while the histogram is one O(langs x buckets x partitions)
    partial-agg exchange and the cumsum runs over ~60 rows per language.
    The integer coverage predicate (cum * 100 >= q * total) makes the
    answer bit-identical across engines — no float percentile semantics.

    Bucket b holds docs with 2^(b-1) <= n_tokens < 2^b (0 = empty), same
    encoding as :func:`length_histogram`."""
    t = F.col(text_col)
    toks = F.when(
        F.length(F.trim(t)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(t), r"\s+"))
    n_tok = F.size(toks).cast("long")
    bucket = F.when(n_tok == 0, F.lit(0)).otherwise(
        F.length(F.conv(n_tok.cast("string"), 10, 2))
    ).cast("long")
    from pyspark.sql import Window

    hist = (
        df.select(F.col(lang_col).alias("lang"), bucket.alias("len_bucket"))
        .groupBy("lang", "len_bucket")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("len_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("lang")
    cum = hist.withColumn("cum", F.sum("n_docs").over(w_cum)).withColumn(
        "total", F.sum("n_docs").over(w_tot)
    )
    qs = F.explode(F.array(*[F.lit(q) for q in pcts])).alias("q_pct")
    return (
        cum.select("lang", "len_bucket", "cum", "total", qs)
        .filter(F.col("cum") * 100 >= F.col("q_pct") * F.col("total"))
        .groupBy("lang", F.col("q_pct").cast("long").alias("q_pct"))
        .agg(F.min("len_bucket").cast("long").alias("len_bucket"))
    )


def duck_length_quantiles_sql(
    table: str, pcts: tuple[int, ...] = QUANTILE_PCTS
) -> str:
    qlist = ", ".join(f"({q})" for q in pcts)
    return rf"""
WITH hist AS (
  SELECT lang,
         CASE WHEN len({_DUCK_TOKS}) = 0 THEN 0
              ELSE length(bin(len({_DUCK_TOKS})::BIGINT)) END AS len_bucket,
         count(*)::BIGINT AS n_docs
  FROM {table} GROUP BY 1, 2
),
cum AS (
  SELECT lang, len_bucket, n_docs,
         sum(n_docs) OVER (PARTITION BY lang ORDER BY len_bucket) AS cum,
         sum(n_docs) OVER (PARTITION BY lang) AS total
  FROM hist
)
SELECT lang, q.q_pct::BIGINT AS q_pct, min(len_bucket)::BIGINT AS len_bucket
FROM cum CROSS JOIN (VALUES {qlist}) AS q(q_pct)
WHERE cum * 100 >= q.q_pct * total
GROUP BY 1, 2
"""


# -- exact phrase search (positional postings) ---------------------------------

PHRASE_QUERY = ("part", "filter", "scan")


def phrase_search(
    df: DataFrame,
    phrase: tuple[str, ...] = PHRASE_QUERY,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hits): documents containing the exact consecutive token
    phrase, with per-document occurrence counts — the positional-postings
    phrase query a web index answers after BM25 recall.

    Scale shape: tokenization is map-side JVM (split + array filter +
    posexplode); a broadcast join against the k-row (slot, term) phrase
    table kills every occurrence of a non-phrase term in the SAME map
    stage, so the only exchange — on (doc_id, anchor = pos - slot) — moves
    just the phrase-term occurrences (k tiny posting lists, never the
    corpus).  An anchor holding all k slots is one phrase occurrence
    (pos = anchor + slot is injective per slot, so a plain count reaches k
    exactly when every slot matched).  Repeated phrase terms fan out in the
    broadcast join and are handled exactly.  No Python anywhere.
    """
    k = len(phrase)
    slot_df = df.sparkSession.createDataFrame(
        [(i, t.lower()) for i, t in enumerate(phrase)], "slot int, term string"
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("pos", "term"),
    )
    cand = toks.join(F.broadcast(slot_df), "term").select(
        "doc_id", (F.col("pos") - F.col("slot")).alias("anchor")
    )
    hits = (
        cand.groupBy("doc_id", "anchor")
        .agg(F.count("*").alias("ns"))
        .where(F.col("ns") == k)
    )
    return hits.groupBy("doc_id").agg(F.count("*").alias("n_hits"))


def duck_phrase_sql(table: str, phrase: tuple[str, ...] = PHRASE_QUERY) -> str:
    k = len(phrase)
    slot_rows = ", ".join(f"({i}, '{t.lower()}')" for i, t in enumerate(phrase))
    return rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(arr) AS term,
         unnest(range(len(arr))) AS pos
  FROM (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       x -> x <> '') AS arr
    FROM {table}
  )
),
slots(slot, term) AS (VALUES {slot_rows}),
cand AS (
  SELECT t.doc_id, t.pos - s.slot AS anchor
  FROM toks t JOIN slots s USING (term)
),
hits AS (
  SELECT doc_id, anchor FROM cand
  GROUP BY doc_id, anchor HAVING count(*) = {k}
)
SELECT doc_id, count(*)::BIGINT AS n_hits FROM hits GROUP BY doc_id
"""


# -- collocation mining (Dice-scored bigrams) ----------------------------------

COLLOC_MIN_SUPPORT = 20


def collocations(
    df: DataFrame,
    min_support: int = COLLOC_MIN_SUPPORT,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(t1, t2, n_pair, n_t1, n_t2, dice_ppm): corpus bigram collocations
    scored by the Dice coefficient in exact BIGINT floor arithmetic —
    ``dice_ppm = (2e6 * n_pair) div (n_t1 + n_t2)`` (bit-identical across
    engines; overflows only past ~4.6e12 occurrences of one bigram).
    Standard phrase-mining / tokenizer-merge-candidate pass over a crawl
    corpus (Manning & Schütze ch. 5 collocation measures).

    Scale shape: bigrams are built MAP-SIDE by zipping the token array with
    itself shifted one (two slices + arrays_zip + explode) — no positional
    self-join, no exchange until the counting groupBys (both partial-agg'd).
    The support filter lands before the unigram joins, so only surviving
    pair types (vocab², bounded hard by min_support) ever join; unigram
    counts join on term equality.  No Python.
    """
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
    )
    toks = df.select(F.col(id_col).alias("doc_id"), arr.alias("arr"))
    uni = (
        toks.select(F.explode("arr").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    n = F.size("arr")
    pairs = (
        toks.where(n >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("arr", 1, n - 1).alias("t1"),
                    F.slice("arr", 2, n - 1).alias("t2"),
                )
            ).alias("p")
        )
        .select(F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2"))
        .groupBy("t1", "t2")
        .agg(F.count("*").alias("n_pair"))
        .where(F.col("n_pair") >= min_support)
    )
    return (
        pairs.join(uni.select(F.col("term").alias("t1"), F.col("c").alias("n_t1")), "t1")
        .join(uni.select(F.col("term").alias("t2"), F.col("c").alias("n_t2")), "t2")
        .select(
            "t1", "t2", "n_pair", "n_t1", "n_t2",
            F.expr("(2000000 * n_pair) div (n_t1 + n_t2)").alias("dice_ppm"),
        )
    )


def duck_collocations_sql(table: str, min_support: int = COLLOC_MIN_SUPPORT) -> str:
    return rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS arr
  FROM {table}
),
uni AS (
  SELECT term, count(*)::BIGINT AS c
  FROM (SELECT unnest(arr) AS term FROM toks) GROUP BY 1
),
pairs AS (
  SELECT t1, t2, count(*)::BIGINT AS n_pair
  FROM (
    SELECT unnest(arr[1:len(arr)-1]) AS t1, unnest(arr[2:len(arr)]) AS t2
    FROM toks WHERE len(arr) >= 2
  )
  GROUP BY 1, 2 HAVING count(*) >= {min_support}
)
SELECT p.t1, p.t2, p.n_pair, u1.c AS n_t1, u2.c AS n_t2,
       (2000000 * p.n_pair) // (u1.c + u2.c) AS dice_ppm
FROM pairs p
JOIN uni u1 ON p.t1 = u1.term
JOIN uni u2 ON p.t2 = u2.term
"""


# -- BPE merge-candidate pair counting (tokenizer training) ---------------------

BPE_MIN_SUPPORT = 4


def bpe_pair_counts(
    df: DataFrame,
    min_support: int = BPE_MIN_SUPPORT,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(s1, s2, n_pair): corpus-wide adjacent-character pair frequencies —
    the counting stage of byte-pair-encoding tokenizer training (Sennrich
    et al. 2016): the argmax row is the first merge.  The reference's
    pipeline feeds crawled text to downstream training; this is the first
    thing a tokenizer-training job computes over that corpus.

    Scale shape: the ONLY corpus-scale pass is the word-frequency groupBy
    (map-side partial agg on the exploded tokens).  Pair extraction then
    runs over the *distinct-word* table — vocabulary-sized, orders of
    magnitude smaller than the corpus — weighting each word's pairs by its
    count, exactly how production BPE trainers exploit word frequency
    tables instead of rescanning text per merge.  All JVM (sequence +
    transform + explode), no Python.
    """
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
    )
    words = (
        df.select(F.explode(arr).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    pairs = (
        words.where(F.length("word") >= 2)
        .select(
            "c",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word) - 1),"
                    " i -> struct(substr(word, i, 1) AS s1,"
                    "             substr(word, i + 1, 1) AS s2))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"))
        .agg(F.sum("c").alias("n_pair"))
        .where(F.col("n_pair") >= min_support)
    )
    return pairs


def duck_bpe_pairs_sql(table: str, min_support: int = BPE_MIN_SUPPORT) -> str:
    return rf"""
WITH words AS (
  SELECT word, count(*)::BIGINT AS c
  FROM (
    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                              x -> x <> '')) AS word
    FROM {table}
  ) GROUP BY 1
),
pairs AS (
  SELECT substr(word, i, 1) AS s1, substr(word, i + 1, 1) AS s2, c
  FROM words, LATERAL unnest(generate_series(1, length(word) - 1)) AS t(i)
  WHERE length(word) >= 2
)
SELECT s1, s2, sum(c)::BIGINT AS n_pair
FROM pairs GROUP BY 1, 2 HAVING sum(c) >= {min_support}
"""


# -- bigram LM fluency scoring (integer-exact) -----------------------------------


def bigram_lm_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_bigrams, score_ppm): per-document mean conditional bigram
    probability under the corpus's own bigram model, in exact BIGINT ppm —
    ``cond_ppm(t1,t2) = (1e6 * n_pair) div n_t1``, doc score = mean over its
    bigram tokens.  The word-order fluency axis of CCNet-style LM quality
    filtering: a doc of common words in gibberish order scores high on the
    unigram model (unigram_lm_scores) but low here.  Floor division keeps
    it bit-identical across engines (no float log-perplexity).

    Scale shape: two corpus passes (count + score), both map-side-partial
    explodes.  The conditional-probability model table is vocab²-bounded
    (pair TYPES, not tokens) and usually broadcastable; the scoring join
    shuffles on the pair key only when it isn't.  Docs with <2 tokens score
    0 via the left join (no divide-by-zero branch).  All JVM.
    """
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
    )
    toks = df.select(F.col(id_col).alias("doc_id"), arr.alias("arr"))
    uni = (
        toks.select(F.explode("arr").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n_t1"))
    )
    n = F.size("arr")
    big = (
        toks.where(n >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("arr", 1, n - 1).alias("t1"),
                    F.slice("arr", 2, n - 1).alias("t2"),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2"))
    )
    cond = (
        big.groupBy("t1", "t2")
        .agg(F.count("*").alias("n_pair"))
        .join(uni.select(F.col("term").alias("t1"), "n_t1"), "t1")
        .select("t1", "t2", F.expr("(1000000 * n_pair) div n_t1").alias("cond_ppm"))
    )
    scored = (
        big.join(cond, ["t1", "t2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.expr("sum(cond_ppm) div count(*)").alias("score_ppm"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("score_ppm", F.lit(0)).cast("long").alias("score_ppm"),
        )
    )


def duck_bigram_lm_sql(table: str, id_col: str = "doc_id") -> str:
    return rf"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS arr
  FROM {table}
),
uni AS (
  SELECT term, count(*)::BIGINT AS n_t1
  FROM (SELECT unnest(arr) AS term FROM toks) GROUP BY 1
),
big AS (
  SELECT doc_id, t1, t2 FROM (
    SELECT doc_id, unnest(arr[1:len(arr)-1]) AS t1, unnest(arr[2:len(arr)]) AS t2
    FROM toks WHERE len(arr) >= 2
  )
),
cond AS (
  SELECT b.t1, b.t2, (1000000 * count(*)) // any_value(u.n_t1) AS cond_ppm
  FROM big b JOIN uni u ON b.t1 = u.term
  GROUP BY b.t1, b.t2
),
scored AS (
  SELECT b.doc_id, count(*)::BIGINT AS n_bigrams,
         sum(c.cond_ppm) // count(*) AS score_ppm
  FROM big b JOIN cond c ON b.t1 = c.t1 AND b.t2 = c.t2
  GROUP BY 1
)
SELECT d.{id_col} AS doc_id,
       coalesce(s.n_bigrams, 0)::BIGINT AS n_bigrams,
       coalesce(s.score_ppm, 0)::BIGINT AS score_ppm
FROM {table} d LEFT JOIN scored s ON s.doc_id = d.{id_col}
"""


# -- per-source quality priors -------------------------------------------------
#
# RefinedWeb/DCLM-style curation gates documents on BOTH a per-document
# signal and a prior over the document's origin (domain / dump / source):
# a mediocre page from a consistently high-quality source survives, a
# plausible-looking page from a spam farm does not.  The prior table is
# O(#sources) — broadcastable at any corpus scale.

# fixture-sized thresholds (ppm of stopword density); production swaps in
# calibrated values — the plan is threshold-invariant
PRIOR_MIN_PPM = 65_000
DOC_QUALITY_MIN_PPM = 20_000


def source_quality_prior(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    prior_min_ppm: int = PRIOR_MIN_PPM,
    doc_min_ppm: int = DOC_QUALITY_MIN_PPM,
) -> DataFrame:
    """Gate documents on doc-level quality AND a mined per-source prior.

    Output: (doc_id, source, doc_q_ppm, prior_ppm, keep) — integer-exact
    (prior = integer mean of per-doc stopword ppm).

    Scale shape: the quality score is a map-side JVM projection over the
    document scan; the prior is a two-phase (partial-agg) groupBy whose
    output is one row per source; joining it back is an explicit broadcast,
    so the document side never shuffles — two scans, zero exchanges on the
    big table."""
    q = df.select(
        "doc_id",
        F.col(source_col).alias("source"),
        quality_columns(F.col(text_col))["stopword_ppm"].alias("doc_q_ppm"),
    )
    prior = q.groupBy("source").agg(
        F.expr("sum(doc_q_ppm) div count(1)").cast("long").alias("prior_ppm")
    )
    return q.join(F.broadcast(prior), "source").select(
        "doc_id",
        "source",
        "doc_q_ppm",
        "prior_ppm",
        (
            (F.col("prior_ppm") >= F.lit(prior_min_ppm))
            & (F.col("doc_q_ppm") >= F.lit(doc_min_ppm))
        ).alias("keep"),
    )


def duck_source_prior_sql(
    table: str,
    prior_min_ppm: int = PRIOR_MIN_PPM,
    doc_min_ppm: int = DOC_QUALITY_MIN_PPM,
) -> str:
    stop = ", ".join(f"'{w}'" for w in STOPWORDS)
    return rf"""
WITH q AS (
  SELECT doc_id, source,
    floor(len(list_filter({_DUCK_TOKS}, t -> lower(t) IN ({stop})))
          / greatest(len({_DUCK_TOKS}), 1)::DOUBLE * 1e6)::BIGINT AS doc_q_ppm
  FROM {table}
),
prior AS (
  SELECT source, (sum(doc_q_ppm) // count(*))::BIGINT AS prior_ppm
  FROM q GROUP BY source
)
SELECT q.doc_id, q.source, q.doc_q_ppm, prior.prior_ppm,
       (prior.prior_ppm >= {prior_min_ppm} AND q.doc_q_ppm >= {doc_min_ppm})
         AS keep
FROM q JOIN prior USING (source)
"""


# -- fastText-style hashed linear classifier (inference) -----------------------
#
# The DCLM/CCNet curation gate shape: a linear model over hashed bag-of-
# features (unigrams + word bigrams, fastText's default).  Training happens
# offline on a labeled sample; what the ENGINE owes is the inference plan,
# and at 100 TB that plan must be a pure map — which this is: tokens ->
# hashed buckets -> weight lookup -> per-doc sum, all inside ONE row via
# JVM higher-order functions.  No exchange, no Python, no weight-table
# join (the model is a closed-form function of the bucket here; a real
# trained model ships as a 4096-entry literal array the same way).
#
# Bucket hash reuses the engine's cross-engine idiom: first 8 md5 hex
# chars as a 32-bit int (dedupsim.py:221), pmod into CLS_BUCKETS.  The
# stand-in weights are a deterministic function of the bucket id, integer
# in [-CLS_W_SHIFT, CLS_W_MOD-1-CLS_W_SHIFT] — integer-exact across
# engines, no float drift.

CLS_BUCKETS = 4096
CLS_W_MULT = 2654435761   # Knuth multiplicative constant
CLS_W_MOD = 1997
CLS_W_SHIFT = 998


def classifier_features(text_col: str = "text"):
    """Column: the hashed feature array (unigrams + word bigrams)."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        lambda x: x.contains(" "),
    )
    return F.concat(toks, bigrams)


def classifier_w_sum(text_col: str = "text"):
    """Column: the model's summed feature weights — a pure map-side
    expression, so callers (focused_frontier etc.) can score inline in an
    existing projection without a join."""

    def weight(t):
        h32 = F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        b = F.pmod(h32, F.lit(CLS_BUCKETS))
        return (b * CLS_W_MULT) % CLS_W_MOD - CLS_W_SHIFT

    return F.aggregate(
        F.transform(classifier_features(text_col), weight),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def classifier_score(df, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_features, w_sum, keep): hashed-linear-model inference.
    ``n_features`` counts unigrams + bigrams, ``w_sum`` their summed
    weights, ``keep`` the gate (w_sum >= 0; empty docs keep).  One
    zero-exchange whole-stage-codegen projection."""
    feats = classifier_features(text_col)
    w_sum = classifier_w_sum(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(feats).cast("long").alias("n_features"),
        w_sum.alias("w_sum"),
        (w_sum >= 0).alias("keep"),
    )


def duck_classifier_sql(docs: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB twin of :func:`classifier_score` (1-indexed lists)."""
    w = (
        f"((('0x' || substr(md5(t), 1, 8))::BIGINT % {CLS_BUCKETS})"
        f" * {CLS_W_MULT}) % {CLS_W_MOD} - {CLS_W_SHIFT}"
    )
    return rf"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         list_filter(string_split_regex(lower(coalesce({text_col}, '')), '[^a-z0-9]+'),
                     x -> x <> '') AS ts
  FROM {docs}
),
feats AS (
  SELECT doc_id,
         ts || list_transform(range(1, len(ts)),
                              i -> ts[i] || ' ' || ts[i + 1]) AS fs
  FROM toks
)
SELECT doc_id,
       len(fs)::BIGINT AS n_features,
       coalesce(list_sum(list_transform(fs, t -> {w})), 0)::BIGINT AS w_sum,
       coalesce(list_sum(list_transform(fs, t -> {w})), 0) >= 0 AS keep
FROM feats
"""


def classifier_auc(df, label_col, text_col: str = "text"):
    """Exact ROC-AUC of the classifier score against a boolean label column
    — the evaluation every curation gate ships with (DCLM reports AUC for
    its fastText filter).  Single row ``(n_pos, n_neg, u_x2, auc_ppm)``
    via the Mann-Whitney rank-sum identity with mid-rank tie handling:

        2*U = sum over distinct scores s of
                n_pos(s) * (2 * n_neg_below(s) + n_neg_at(s))
        AUC   = U / (n_pos * n_neg)

    kept integer-exact cross-engine by carrying 2*U and emitting ppm.

    Scale shape: the per-doc pass is the classifier's zero-exchange
    projection; the rank statistics aggregate to ONE ROW PER DISTINCT
    SCORE before any ordering, and the cumulative counts come from the
    two-job range-partition prefix sum (ordering.with_prefix_sums) — no
    single-partition window over the corpus.  BIGINT bounds: u_x2 <=
    2*n_pos*n_neg, so the ppm math is exact to ~2e9 evaluated docs per
    side — evaluation runs on labeled samples, not the raw 10^10 corpus."""
    from web_crawler_spark.operators.ordering import with_prefix_sums

    scored = df.select(
        classifier_w_sum(text_col).alias("score"),
        F.when(label_col, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("pos"),
    )
    by_score = scored.groupBy("score").agg(
        F.sum("pos").alias("np_"), F.count("*").alias("n_")
    )
    cum = with_prefix_sums(by_score, ["score"], ["np_", "n_"])
    totals = cum.agg(
        F.sum("np_").cast("long").alias("n_pos"),
        F.sum(F.col("n_") - F.col("np_")).cast("long").alias("n_neg"),
        F.sum(
            F.col("np_")
            * (
                2 * (F.col("n__before") - F.col("np__before"))
                + (F.col("n_") - F.col("np_"))
            )
        )
        .cast("long")
        .alias("u_x2"),
    )
    return totals.select(
        "n_pos",
        "n_neg",
        "u_x2",
        F.expr("u_x2 * 1000000L DIV (2 * n_pos * n_neg)").alias("auc_ppm"),
    )


def duck_classifier_auc_sql(
    docs: str, label_sql: str = "d.lang = 'en'", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`classifier_auc` (window prefix is fine at
    oracle scale)."""
    return f"""
WITH scored AS (
  SELECT s.w_sum AS score,
         CASE WHEN {label_sql} THEN 1 ELSE 0 END AS pos
  FROM ({duck_classifier_sql(docs, text_col=text_col)}) s
  JOIN {docs} d USING (doc_id)
),
by_score AS (
  SELECT score, sum(pos)::BIGINT AS np, count(*)::BIGINT AS n
  FROM scored GROUP BY 1
),
cum AS (
  SELECT np, n,
         coalesce(sum(n)  OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bn,
         coalesce(sum(np) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bp
  FROM by_score
)
SELECT sum(np)::BIGINT AS n_pos,
       (sum(n) - sum(np))::BIGINT AS n_neg,
       sum(np * (2 * (bn - bp) + (n - np)))::BIGINT AS u_x2,
       (sum(np * (2 * (bn - bp) + (n - np))) * 1000000
          // (2 * sum(np) * (sum(n) - sum(np))))::BIGINT AS auc_ppm
FROM cum
"""



CAL_BUCKETS = 10


def classifier_calibration(df, label_col, text_col: str = "text", n_buckets: int = CAL_BUCKETS):
    """Reliability diagram for the curation gate: rank-decile score buckets
    vs observed label rate — the companion evaluation to ROC-AUC (AUC says
    the ordering works; calibration says WHERE on the score axis the
    gate's threshold should sit).  Output: (bucket, n_docs, n_pos,
    pos_ppm, min_score, max_score), one row per non-empty bucket.

    Buckets are assigned at DISTINCT-SCORE grain from the two-job
    range-partition prefix sum: bucket = min(n_buckets - 1,
    docs_before * n_buckets DIV total_docs) — a tied score never splits
    across buckets, so the bucketing is order-free and hash-stable
    cross-engine.  Scale shape: identical to classifier_auc (one exchange
    at distinct-score grain + the prefix-sum stamp); the only driver
    scalar is the total doc count."""
    from web_crawler_spark.operators.ordering import with_prefix_sums

    scored = df.select(
        classifier_w_sum(text_col).alias("score"),
        F.when(label_col, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("pos"),
    )
    by_score = scored.groupBy("score").agg(
        F.sum("pos").alias("np_"), F.count("*").alias("n_")
    )
    cum = with_prefix_sums(by_score, ["score"], ["n_"])
    total = max(int(by_score.agg(F.sum("n_")).first()[0] or 0), 1)
    return (
        cum.select(
            F.expr(
                f"least({n_buckets - 1}L, n__before * {n_buckets} DIV {total})"
            ).alias("bucket"),
            "np_",
            "n_",
            "score",
        )
        .groupBy("bucket")
        .agg(
            F.sum("n_").cast("long").alias("n_docs"),
            F.sum("np_").cast("long").alias("n_pos"),
            F.min("score").cast("long").alias("min_score"),
            F.max("score").cast("long").alias("max_score"),
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_docs",
            "n_pos",
            F.expr("n_pos * 1000000 DIV n_docs").cast("long").alias("pos_ppm"),
            "min_score",
            "max_score",
        )
    )


def duck_classifier_calibration_sql(
    docs: str,
    label_sql: str = "d.lang = 'en'",
    text_col: str = "text",
    n_buckets: int = CAL_BUCKETS,
) -> str:
    """DuckDB twin of :func:`classifier_calibration`."""
    return f"""
WITH scored AS (
  SELECT s.w_sum AS score,
         CASE WHEN {label_sql} THEN 1 ELSE 0 END AS pos
  FROM ({duck_classifier_sql(docs, text_col=text_col)}) s
  JOIN {docs} d USING (doc_id)
),
by_score AS (
  SELECT score, sum(pos)::BIGINT AS np, count(*)::BIGINT AS n
  FROM scored GROUP BY 1
),
cum AS (
  SELECT score, np, n,
         coalesce(sum(n) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before,
         greatest((SELECT sum(n) FROM by_score), 1) AS tot
  FROM by_score
)
SELECT least({n_buckets - 1}, before * {n_buckets} // tot)::BIGINT AS bucket,
       sum(n)::BIGINT AS n_docs,
       sum(np)::BIGINT AS n_pos,
       (sum(np) * 1000000 // sum(n))::BIGINT AS pos_ppm,
       min(score)::BIGINT AS min_score,
       max(score)::BIGINT AS max_score
FROM cum GROUP BY 1
"""



def vocab_growth(df, id_col: str = "doc_id", text_col: str = "text"):
    """Heaps'-law vocabulary-growth curve: distinct-term count after the
    first 1, 3, 7, ..., 2^b - 1 documents of the deterministic corpus
    order — the tokenizer-budget / OOV-planning view (how fast does the
    vocabulary still grow at the corpus tail?).  Output: (band,
    prefix_docs, new_terms, vocab_size), band b covering docs
    [2^(b-1), 2^b - 1] in the doc_id order.

    Exact integers, no sampling: doc ranks come from the two-job
    range-partition sequence (ordering.with_global_seq, start=1); each
    term's first-seen rank is one (term) partial agg min; the
    power-of-two band is the binary-string bit-length idiom; the
    cumulative vocab size is a window over the ~log2(n_docs)-row band
    frame (bounded-single-partition convention).  Scale shape: the heavy
    exchange is the (term, min seq) agg — term grain, map-side combined;
    nothing corpus-wide sorts or windows."""
    from pyspark.sql import Window

    from web_crawler_spark.operators.ordering import with_global_seq

    seq = with_global_seq(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
        ["doc_id"],
        out_col="seq",
        start=1,
    )
    total = seq.count()
    toks = seq.select(
        "seq",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("term"),
    ).filter(F.col("term") != "")
    first = toks.groupBy("term").agg(F.min("seq").alias("fs"))
    bands = first.groupBy(
        F.length(F.conv(F.col("fs").cast("string"), 10, 2)).cast("long").alias("band")
    ).agg(F.count("*").cast("long").alias("new_terms"))
    w = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    return bands.select(
        "band",
        F.expr(f"least(shiftleft(1L, cast(band as int)) - 1, {total}L)")
        .cast("long")
        .alias("prefix_docs"),
        "new_terms",
        F.sum("new_terms").over(w).cast("long").alias("vocab_size"),
    )


def duck_vocab_growth_sql(docs: str) -> str:
    """DuckDB twin of :func:`vocab_growth`."""
    return rf"""
WITH seq AS (
  SELECT row_number() OVER (ORDER BY doc_id) AS seq, text FROM {docs}
),
toks AS (
  SELECT seq, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
  FROM seq
),
first_seen AS (
  SELECT term, min(seq)::BIGINT AS fs FROM toks WHERE term <> '' GROUP BY 1
),
bands AS (
  SELECT length(bin(fs))::BIGINT AS band, count(*)::BIGINT AS new_terms
  FROM first_seen GROUP BY 1
)
SELECT band,
  least((1::BIGINT << band) - 1, (SELECT count(*) FROM {docs}))::BIGINT
    AS prefix_docs,
  new_terms,
  sum(new_terms) OVER (ORDER BY band
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS vocab_size
FROM bands
"""



def zipf_curve(df, id_col: str = "doc_id", text_col: str = "text"):
    """Zipf rank-frequency profile: corpus term-occurrence mass by
    power-of-two RANK band (ranks 1, 2-3, 4-7, ...) — Heaps' companion
    view (vocab_growth says how fast new types arrive; this says how
    concentrated the token mass is on the head).  Output: (band,
    n_terms, mass, max_freq, min_freq, cum_mass_ppm), band b covering
    ranks [2^(b-1), 2^b - 1] under (freq DESC, term ASC) — the
    deterministic total order, so ties never straddle engines.

    Scale shape: term-frequency agg is the one heavy exchange (term
    grain, map-side combined); ranks come from the two-job
    range-partition sequence over the TERM frame (never a corpus
    window); bands + cumulative mass live on the ~log2(V)-row band frame
    (bounded-single-partition convention)."""
    from pyspark.sql import Window

    from web_crawler_spark.operators.ordering import with_global_seq

    toks = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias("term")
    ).filter(F.col("term") != "")
    freq = toks.groupBy("term").agg(F.count("*").cast("long").alias("freq"))
    ranked = with_global_seq(
        freq.withColumn("neg", -F.col("freq")), ["neg", "term"], out_col="rank", start=1
    )
    bands = ranked.groupBy(
        F.length(F.conv(F.col("rank").cast("string"), 10, 2)).cast("long").alias("band")
    ).agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum("freq").cast("long").alias("mass"),
        F.max("freq").cast("long").alias("max_freq"),
        F.min("freq").cast("long").alias("min_freq"),
    )
    w_cum = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        bands.withColumn("cum", F.sum("mass").over(w_cum))
        .withColumn("tot", F.sum("mass").over(w_all))
        .select(
            "band",
            "n_terms",
            "mass",
            "max_freq",
            "min_freq",
            F.expr("cum * 1000000 DIV tot").cast("long").alias("cum_mass_ppm"),
        )
    )


def duck_zipf_curve_sql(docs: str) -> str:
    """DuckDB twin of :func:`zipf_curve`."""
    return rf"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
  FROM {docs}
),
freq AS (
  SELECT term, count(*)::BIGINT AS freq FROM toks WHERE term <> '' GROUP BY 1
),
ranked AS (
  SELECT freq, row_number() OVER (ORDER BY freq DESC, term ASC) AS rank
  FROM freq
),
bands AS (
  SELECT length(bin(rank))::BIGINT AS band, count(*)::BIGINT AS n_terms,
         sum(freq)::BIGINT AS mass, max(freq)::BIGINT AS max_freq,
         min(freq)::BIGINT AS min_freq
  FROM ranked GROUP BY 1
)
SELECT band, n_terms, mass, max_freq, min_freq,
  (sum(mass) OVER (ORDER BY band ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
     * 1000000 // (SELECT sum(mass) FROM bands))::BIGINT AS cum_mass_ppm
FROM bands
"""



def ccnet_buckets(df, id_col: str = "doc_id", text_col: str = "text"):
    """CCNet's head / middle / tail corpus split (Wenzek et al. 2020):
    rank every document by LM quality and cut the corpus into fluency
    terciles — training recipes then sample the head harder and audit or
    drop the tail.  The quality axis is the engine's exact-integer bigram
    LM (bigram_lm_scores); HIGHER score = more fluent = head.  Output:
    (bucket, n_docs, total_bigrams, min_score_ppm, max_score_ppm).

    Tercile assignment is tie-consistent at DISTINCT-SCORE grain off the
    two-job range-partition prefix sum over DESCENDING score (same
    machinery as classifier_calibration — a tied score never splits
    across buckets, hash-stable cross-engine).  Scale shape: the LM
    scoring's two corpus passes dominate; the bucketing adds one
    distinct-score-grain exchange + the prefix-sum stamp."""
    from web_crawler_spark.operators.ordering import with_prefix_sums

    scored = bigram_lm_scores(df, id_col=id_col, text_col=text_col)
    by_score = scored.groupBy("score_ppm").agg(
        F.count("*").alias("n_"), F.sum("n_bigrams").alias("nb_")
    )
    cum = with_prefix_sums(
        by_score.withColumn("neg", -F.col("score_ppm")), ["neg"], ["n_"]
    )
    total = max(int(by_score.agg(F.sum("n_")).first()[0] or 0), 1)
    return (
        cum.select(
            F.expr(f"least(2L, n__before * 3 DIV {total})").alias("b"),
            "n_",
            "nb_",
            "score_ppm",
        )
        .groupBy("b")
        .agg(
            F.sum("n_").cast("long").alias("n_docs"),
            F.sum("nb_").cast("long").alias("total_bigrams"),
            F.min("score_ppm").cast("long").alias("min_score_ppm"),
            F.max("score_ppm").cast("long").alias("max_score_ppm"),
        )
        .select(
            F.element_at(
                F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
                (F.col("b") + 1).cast("int"),
            ).alias("bucket"),
            "n_docs",
            "total_bigrams",
            "min_score_ppm",
            "max_score_ppm",
        )
    )


def duck_ccnet_buckets_sql(docs: str) -> str:
    """DuckDB twin of :func:`ccnet_buckets` (window prefix over the
    distinct-score frame at oracle scale)."""
    return rf"""
WITH scored AS ({duck_bigram_lm_sql(docs)}),
by_score AS (
  SELECT score_ppm, count(*)::BIGINT AS n_, sum(n_bigrams)::BIGINT AS nb_
  FROM scored GROUP BY 1
),
cum AS (
  SELECT score_ppm, n_, nb_,
         coalesce(sum(n_) OVER (ORDER BY score_ppm DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before,
         greatest((SELECT sum(n_) FROM by_score), 1) AS tot
  FROM by_score
)
SELECT ['head', 'middle', 'tail'][(least(2, before * 3 // tot) + 1)::INT]
         AS bucket,
       sum(n_)::BIGINT AS n_docs,
       sum(nb_)::BIGINT AS total_bigrams,
       min(score_ppm)::BIGINT AS min_score_ppm,
       max(score_ppm)::BIGINT AS max_score_ppm
FROM cum GROUP BY 1
"""


# ---------------------------------------------------------------------------
# DSIR — data selection with importance resampling (Xie et al., NeurIPS'23)
# ---------------------------------------------------------------------------
#
# DSIR reweights a raw pool toward a target-domain sample by comparing the
# two corpora's distributions over HASHED n-gram buckets (the same
# unigram+bigram feature space as the classifier gate above), then scoring
# every pool document by how much more target-like than pool-like its
# features are.  The published method uses log-probability ratios; the
# engine's integer-exact surrogate is the ppm-difference weight
#
#   w[b] = target_count[b]*1e6 // target_total - pool_count[b]*1e6 // pool_total
#   score(doc) = sum over the doc's features f of w[bucket(f)]
#
# which is monotone in the same direction (positive = target-enriched
# bucket) and bit-identical across engines (BIGINT floor division only).
#
# Scale shape — the part the engine owes at 100 TB:
#   * training = TWO bucket-count aggregations whose exchanges carry at
#     most DSIR_BUCKETS rows per map task (partial agg over a 4096-bucket
#     key space), regardless of corpus size;
#   * the trained table is bounded (4096 ints), so it ships into the
#     scoring pass as a bucket-indexed LITERAL array — the classifier
#     block's "a real model ships as a literal array" discipline — and
#     scoring is a PURE MAP over the pool scan: no join, no exchange, no
#     Python, empty docs score 0 without special casing.

DSIR_BUCKETS = 4096
_DSIR_PPM = 1_000_000


def dsir_bucket_counts(df, text_col: str = "text") -> "DataFrame":
    """(b, c): hashed-feature bucket counts over a corpus — the exchange
    carries <= DSIR_BUCKETS rows per map task (partial agg)."""
    h32 = F.conv(F.substring(F.md5(F.col("t")), 1, 8), 16, 10).cast("long")
    return (
        df.select(F.explode(classifier_features(text_col)).alias("t"))
        .select(F.pmod(h32, F.lit(DSIR_BUCKETS)).alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("c"))
    )


def train_dsir_weights(pool, target, text_col: str = "text") -> "list[int]":
    """The DSIR_BUCKETS-entry integer weight table: target ppm minus pool
    ppm per bucket.  Driver-side state is the bounded bucket summary (the
    IVF-sample discipline), never document rows."""
    def counts(df) -> dict:
        return {r["b"]: r["c"] for r in dsir_bucket_counts(df, text_col).collect()}

    tc, sc = counts(target), counts(pool)
    t_tot, s_tot = max(sum(tc.values()), 1), max(sum(sc.values()), 1)
    return [
        tc.get(b, 0) * _DSIR_PPM // t_tot - sc.get(b, 0) * _DSIR_PPM // s_tot
        for b in range(DSIR_BUCKETS)
    ]


def dsir_scores(pool, weights: "list[int]", id_col: str = "doc_id",
                text_col: str = "text") -> "DataFrame":
    """(doc_id, n_features, dsir_score): importance score per pool document
    under a trained weight table — one zero-exchange projection."""
    w_arr = F.array(*[F.lit(int(x)) for x in weights])
    feats = classifier_features(text_col)
    score = F.aggregate(
        F.transform(
            feats,
            lambda t: F.element_at(
                w_arr,
                (
                    F.pmod(
                        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
                        F.lit(DSIR_BUCKETS),
                    )
                    + 1
                ).cast("int"),
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return pool.select(
        F.col(id_col).alias("doc_id"),
        F.size(feats).cast("long").alias("n_features"),
        score.alias("dsir_score"),
    )


def duck_dsir_sql(pool: str, target: str, id_col: str = "doc_id",
                  text_col: str = "text") -> str:
    """DuckDB twin of train+score: the whole DSIR pipeline as one query
    (bucket ppm tables -> full-outer weight join -> per-doc feature sum)."""
    b_of = f"(('0x' || substr(md5(t), 1, 8))::BIGINT % {DSIR_BUCKETS})"

    def mk_feats(src: str, id_sql: str) -> str:
        toks = (
            f"list_filter(string_split_regex(lower(coalesce({text_col}, '')),"
            " '[^a-z0-9]+'), x -> x <> '')"
        )
        return (
            f"SELECT ts_id, ts || list_transform(range(1, len(ts)),"
            f" i -> ts[i] || ' ' || ts[i + 1]) AS fs FROM ("
            f"SELECT {id_sql} AS ts_id, {toks} AS ts FROM {src})"
        )

    return rf"""
WITH pf AS ({mk_feats(pool, id_col)}),
tf AS ({mk_feats(target, "1")}),
sb AS (
  SELECT {b_of} AS b, count(*)::BIGINT AS c
  FROM (SELECT unnest(fs) AS t FROM pf) GROUP BY 1
),
tb AS (
  SELECT {b_of} AS b, count(*)::BIGINT AS c
  FROM (SELECT unnest(fs) AS t FROM tf) GROUP BY 1
),
w AS (
  SELECT coalesce(tb.b, sb.b) AS b,
         coalesce(tb.c, 0) * {_DSIR_PPM}
           // greatest((SELECT sum(c) FROM tb), 1)
         - coalesce(sb.c, 0) * {_DSIR_PPM}
           // greatest((SELECT sum(c) FROM sb), 1) AS wt
  FROM tb FULL OUTER JOIN sb ON tb.b = sb.b
),
doc_feats AS (
  SELECT ts_id AS doc_id, {b_of} AS b
  FROM (SELECT ts_id, unnest(fs) AS t FROM pf)
),
sums AS (
  SELECT d.doc_id, count(*)::BIGINT AS n_features,
         sum(coalesce(w.wt, 0))::BIGINT AS dsir_score
  FROM doc_feats d LEFT JOIN w ON w.b = d.b GROUP BY 1
)
SELECT p.ts_id AS doc_id,
       coalesce(s.n_features, 0)::BIGINT AS n_features,
       coalesce(s.dsir_score, 0)::BIGINT AS dsir_score
FROM pf p LEFT JOIN sums s ON s.doc_id = p.ts_id
"""


# ---------------------------------------------------------------------------
# Readability (integer-exact Flesch-Kincaid surrogate)
# ---------------------------------------------------------------------------
#
# Classic readability gates (pre-LM curation used e.g. in early C4 variants)
# score text by words-per-sentence and syllables-per-word.  The float
# Flesch formulas are not cross-engine reproducible, so each ratio term is
# floored independently in milli-units (integer division of identical IEEE
# doubles — the repo-wide determinism rule), giving a bit-identical
# "FK-ish" grade both engines agree on:
#
#   fk_grade_milli     = floor(390*w/s) + floor(11800*y/w) - 15590
#   reading_ease_milli = 206835 - floor(1015*w/s) - floor(84600*y/w)
#
# with s,w floored at 1.  Syllables are estimated as [aeiouy]+ vowel groups
# (the standard cheap surrogate); sentences as [.!?]+ runs.  Pure map over
# the scan — no shuffle, no Python.

def readability_columns(text: Column) -> dict[str, Column]:
    """Integer readability signals: word/sentence/syllable counts plus the
    milli-scaled FK grade and reading-ease surrogates (see module note)."""
    words = token_count(text).cast("long")
    sents = F.size(F.regexp_extract_all(text, F.lit(r"[.!?]+"), F.lit(0))).cast("long")
    sylls = F.size(F.regexp_extract_all(F.lower(text), F.lit("[aeiouy]+"), F.lit(0))).cast("long")
    s1 = F.greatest(sents, F.lit(1)).cast("double")
    w1 = F.greatest(words, F.lit(1)).cast("double")
    wps = F.floor(words.cast("double") * 390.0 / s1)
    spw = F.floor(sylls.cast("double") * 11800.0 / w1)
    ease_wps = F.floor(words.cast("double") * 1015.0 / s1)
    ease_spw = F.floor(sylls.cast("double") * 84600.0 / w1)
    return {
        "n_words": words,
        "n_sents": sents,
        "n_syllables": sylls,
        "fk_grade_milli": (wps + spw - F.lit(15590)).cast("long"),
        "reading_ease_milli": (F.lit(206835) - ease_wps - ease_spw).cast("long"),
    }


def duck_readability_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB twin of :func:`readability_columns`."""
    return rf"""
SELECT doc_id, n_words, n_sents, n_syllables,
  (floor(390.0 * n_words / greatest(n_sents, 1))
   + floor(11800.0 * n_syllables / greatest(n_words, 1)) - 15590)::BIGINT AS fk_grade_milli,
  (206835 - floor(1015.0 * n_words / greatest(n_sents, 1))
   - floor(84600.0 * n_syllables / greatest(n_words, 1)))::BIGINT AS reading_ease_milli
FROM (
  SELECT {id_col} AS doc_id,
         len({_DUCK_TOKS.replace('text', text_col)})::BIGINT AS n_words,
         len(regexp_extract_all({text_col}, '[.!?]+'))::BIGINT AS n_sents,
         len(regexp_extract_all(lower({text_col}), '[aeiouy]+'))::BIGINT AS n_syllables
  FROM {table}
)
"""


# ---------------------------------------------------------------------------
# Keyphrase extraction (RAKE-style stopword-delimited candidates)
# ---------------------------------------------------------------------------
#
# RAKE's core insight (Rose et al. 2010): content keyphrases are the maximal
# token runs BETWEEN stopwords and punctuation.  The candidate mining is
# pure string surgery — lowercase, punctuation -> boundary, stopword ->
# boundary, split — so it runs as one zero-Python map over the scan in both
# engines; corpus-level ranking is one partial-agg'd exchange on phrase and
# a TakeOrderedAndProject top-k.  (RAKE's degree/frequency word score needs
# float division; corpus frequency of the multiword phrase is the
# integer-exact surrogate and ranks near-identically on prose.)

KEYPHRASE_TOP_K = 100
_STOPWORD_BOUNDARY_RE = r"\b(" + "|".join(STOPWORDS) + r")\b"


def keyphrase_candidates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, phrase) — one row per multiword (>=2 token) candidate
    occurrence, normalized to single-spaced lowercase alnum."""
    t = F.lower(F.col(text_col))
    t = F.regexp_replace(t, r"[^a-z0-9\s]+", "|")
    t = F.regexp_replace(t, _STOPWORD_BOUNDARY_RE, "|")
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(t, r"\|")).alias("raw"),
        )
        .select(
            "doc_id",
            F.trim(F.regexp_replace(F.col("raw"), r"\s+", " ")).alias("phrase"),
        )
        .where(F.col("phrase").contains(" "))
    )


def corpus_keyphrases(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = KEYPHRASE_TOP_K,
) -> DataFrame:
    """(phrase, n_words, n_occur, n_docs) — corpus top-k keyphrases by
    occurrence count (ties break on phrase text).  One exchange (partial
    agg on phrase), then the top-k compiles to TakeOrderedAndProject."""
    cand = keyphrase_candidates(df, id_col=id_col, text_col=text_col)
    agg = cand.groupBy("phrase").agg(
        F.count("*").cast("long").alias("n_occur"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    return (
        agg.select(
            "phrase",
            F.size(F.split(F.col("phrase"), " ")).cast("long").alias("n_words"),
            "n_occur",
            "n_docs",
        )
        .orderBy(F.col("n_occur").desc(), F.col("phrase").asc())
        .limit(k)
    )


def duck_keyphrases_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text",
    k: int = KEYPHRASE_TOP_K,
) -> str:
    """DuckDB twin of :func:`corpus_keyphrases`."""
    return rf"""
WITH cand AS (
  SELECT {id_col} AS doc_id,
         trim(regexp_replace(raw, '\s+', ' ', 'g')) AS phrase
  FROM (
    SELECT {id_col},
           unnest(string_split(
             regexp_replace(
               regexp_replace(lower({text_col}), '[^a-z0-9\s]+', '|', 'g'),
               '{_STOPWORD_BOUNDARY_RE}', '|', 'g'),
             '|')) AS raw
    FROM {table}
  )
  WHERE trim(regexp_replace(raw, '\s+', ' ', 'g')) LIKE '% %'
)
SELECT phrase,
       len(string_split(phrase, ' '))::BIGINT AS n_words,
       count(*)::BIGINT AS n_occur,
       count(DISTINCT doc_id)::BIGINT AS n_docs
FROM cand
GROUP BY phrase
ORDER BY n_occur DESC, phrase ASC
LIMIT {k}
"""


# --- LLM-watermark detection (green-list z-test) ------------------------------
#
# Kirchenbauer et al. 2023 ("A Watermark for Large Language Models"): a
# watermarking LLM seeds a PRNG with the previous token and biases sampling
# toward the resulting "green list" (fraction gamma of the vocabulary).
# The detector needs no model: for each adjacent token pair, recompute the
# green/red split from the previous token and z-test whether the green
# fraction exceeds gamma.  A training-data pipeline runs this to keep
# synthetic (machine-generated, watermarked) text out of the corpus.
#
# Determinism contract: the green predicate is md5-derived (Spark
# conv(substr(md5,1,8),16,10) == DuckDB ('0x'||substr(md5,1,8))::BIGINT,
# the repo's cross-engine hash), gamma is the exact ratio NUM/DEN, and the
# z-test is evaluated in squared integer form —
#   g - gamma*T > z*sqrt(T*gamma*(1-gamma))
#   <=>  d := g*DEN - T*NUM > 0  AND  d*d > z^2 * T * NUM * (DEN-NUM)
# so the flag is bit-identical across engines with no float sqrt.
#
# Scale shape: entirely map-side — token split, pair scoring, and the
# green count are array lambdas inside one projection (no explode, no
# exchange); the output is doc-grain.

WM_GAMMA_NUM, WM_GAMMA_DEN = 1, 4  # gamma = 0.25
WM_Z2 = 16                         # z = 4 (detection threshold)


def watermark_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_scored, n_green, green_ppm, is_watermarked) for every
    document with at least one adjacent token pair.  Green predicate:
    md5(prev || ' ' || tok) mod DEN < NUM."""
    num, den, z2 = WM_GAMMA_NUM, WM_GAMMA_DEN, WM_Z2
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
    )
    scored = df.select("doc_id", toks.alias("toks")).select(
        "doc_id",
        (F.size("toks") - 1).cast("long").alias("n_scored"),
        F.expr(
            # greatest(..., 0): a zero-token doc would otherwise make the
            # slice length -1, which THROWS at runtime — the doc is filtered
            # below, but projections evaluate before filters
            f"""aggregate(
              transform(
                slice(toks, 2, greatest(size(toks) - 1, 0)),
                (t, i) -> IF(conv(substring(md5(concat(toks[i], ' ', t)), 1, 8),
                             16, 10) % {den} < {num}, 1L, 0L)),
              0L, (acc, x) -> acc + x)"""
        ).alias("n_green"),
    )
    d = F.col("n_green") * den - F.col("n_scored") * num
    return scored.where(F.col("n_scored") >= 1).select(
        "doc_id",
        "n_scored",
        "n_green",
        F.expr("n_green * 1000000L DIV n_scored").alias("green_ppm"),
        ((d > 0) & (d * d > F.col("n_scored") * (z2 * num * (den - num)))).alias(
            "is_watermarked"
        ),
    )


def duck_watermark_sql(documents: str, text_col: str = "text") -> str:
    """DuckDB twin of :func:`watermark_scores` (1-based list indexing)."""
    num, den, z2 = WM_GAMMA_NUM, WM_GAMMA_DEN, WM_Z2
    return rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower({text_col}), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM {documents}
),
sc AS (
  SELECT doc_id,
         (len(toks) - 1)::BIGINT AS n_scored,
         coalesce(list_sum(list_transform(range(2, len(toks) + 1),
           i -> CASE WHEN ('0x' || substr(md5(toks[i-1] || ' ' || toks[i]), 1, 8))::BIGINT
                          % {den} < {num} THEN 1 ELSE 0 END)), 0)::BIGINT AS n_green
  FROM toks WHERE len(toks) >= 2
)
SELECT doc_id, n_scored, n_green,
       (n_green * 1000000 // n_scored)::BIGINT AS green_ppm,
       (n_green * {den} - n_scored * {num} > 0 AND
        (n_green * {den} - n_scored * {num}) * (n_green * {den} - n_scored * {num})
          > n_scored * {z2 * num * (den - num)}) AS is_watermarked
FROM sc
"""


# -- RM3 pseudo-relevance feedback (query expansion) ---------------------------
#
# The classic two-pass retrieval refinement (Lavrenko & Croft relevance
# models, SIGIR'01; the RM3 variant of Abdul-Jaleel et al., TREC'04):
# retrieve a feedback set with the base query, estimate a relevance model
# over its terms, expand the query with the highest-weight terms, and
# re-retrieve.  Corpus curation uses this to harden retrieval-based
# quality filters against vocabulary mismatch.
#
# Deterministic simplification (graded contract): uniform P(d|q) over the
# feedback set, so the relevance-model weight of term w is
#   rm_ppm(w) = sum over feedback docs d of tf(w,d) * 1e6 DIV dl(d)
# (exact integers, reduction-order independent); the top-E non-query
# terms by (rm_ppm DESC, term ASC) join the query with uniform weight and
# the second pass is the same integer BM25 as bm25_topk.
#
# Scale shape: pass 1 is bm25_topk (one tokenize pass, partial top-k);
# the feedback set (<= fb_k rows) and the expansion term set (<= |q|+E
# rows) broadcast, so expansion weighting dies map-side outside the
# feedback docs and pass-2 term filtering dies map-side outside the
# expanded vocabulary — corpus rows never shuffle at full width.  A
# production deployment amortizes the re-scans through the capped
# inverted index (merge_postings / index_postings); the logical plan is
# identical.

RM3_FB_DOCS = 10
RM3_EXP_TERMS = 8
RM3_TOPK = BM25_TOPK


def rm3_topk(
    df: DataFrame,
    query_terms: tuple[str, ...] = BM25_QUERY,
    fb_k: int = RM3_FB_DOCS,
    n_exp: int = RM3_EXP_TERMS,
    k: int = RM3_TOPK,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score_ppm, rnk): top-k documents for the RM3-expanded
    query under the same integer-exact BM25 as :func:`bm25_topk`."""
    from pyspark.sql import Window

    qt = [t.lower() for t in dict.fromkeys(query_terms)]
    fb = bm25_topk(
        df, query_terms, k=fb_k, id_col=id_col, text_col=text_col
    ).select("doc_id")
    toks = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias(
                "term"
            ),
        )
        .filter(F.col("term") != "")
    )
    fb_toks = toks.join(F.broadcast(fb), on="doc_id")
    fb_dl = fb_toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    exp = (
        fb_toks.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .join(fb_dl, on="doc_id")
        .select("term", F.expr("tf * 1000000L DIV dl").alias("w_ppm"))
        .where(~F.col("term").isin(*qt))
        .groupBy("term")
        .agg(F.sum("w_ppm").cast("long").alias("rm_ppm"))
        .orderBy(F.desc("rm_ppm"), F.asc("term"))
        .limit(n_exp)
    )
    terms = (
        exp.select("term")
        .unionByName(
            df.sparkSession.createDataFrame([(t,) for t in qt], "term string")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # pass 2: generic weighted-by-idf BM25 over the expanded term set —
    # term filter is a broadcast semi-join (non-query tokens die map-side)
    per_doc = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    n_docs = df.count()
    total_toks = per_doc.agg(F.coalesce(F.sum("dl"), F.lit(0))).first()[0]
    if n_docs == 0 or int(total_toks) == 0:
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.lit(0).cast("long").alias("score_ppm"),
            F.lit(0).cast("long").alias("rnk"),
        ).limit(0)
    avgdl_ppm = (int(total_toks) * 1_000_000) // int(n_docs)
    tf = (
        toks.join(F.broadcast(terms), on="term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .join(per_doc, on="doc_id")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df_t"))
    idf = dfreq.select(
        "term",
        F.expr(
            f"(2 * ({n_docs}L - df_t) + 1) * 1000000L DIV (2 * df_t + 1)"
        ).alias("idf_ppm"),
    )
    contrib = _bm25_contrib_expr().format(div="DIV", avgdl_ppm=f"{avgdl_ppm}L")
    scored = (
        tf.join(F.broadcast(idf), on="term")
        .withColumn("c_ppm", F.expr(contrib))
        .groupBy("doc_id")
        .agg(F.sum("c_ppm").cast("long").alias("score_ppm"))
    )
    top = scored.orderBy(F.desc("score_ppm"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score_ppm"), F.asc("doc_id"))
    return top.withColumn("rnk", F.row_number().over(w).cast("long")).select(
        "doc_id", "score_ppm", "rnk"
    )


def duck_rm3_sql(
    table: str,
    query_terms: tuple[str, ...] = BM25_QUERY,
    fb_k: int = RM3_FB_DOCS,
    n_exp: int = RM3_EXP_TERMS,
    k: int = RM3_TOPK,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`rm3_topk` (first pass embeds duck_bm25_sql)."""
    qt = [t.lower() for t in dict.fromkeys(query_terms)]
    qlist = ", ".join(f"'{t}'" for t in qt)
    contrib = _bm25_contrib_expr().format(
        div="//", avgdl_ppm="(SELECT avgdl_ppm FROM av)"
    )
    return rf"""
WITH fb AS (
  SELECT doc_id FROM ({duck_bm25_sql(table, query_terms, k=fb_k, id_col=id_col)})
),
toks AS (
  SELECT {id_col} AS doc_id, t.term
  FROM {table}, UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
  WHERE t.term <> ''
),
fb_toks AS (SELECT toks.* FROM toks JOIN fb USING (doc_id)),
fb_dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM fb_toks GROUP BY 1),
exp AS (
  SELECT term, sum(tf * 1000000 // dl)::BIGINT AS rm_ppm
  FROM (
    SELECT ft.doc_id, ft.term, count(*)::BIGINT AS tf
    FROM fb_toks ft GROUP BY 1, 2
  ) x JOIN fb_dl USING (doc_id)
  WHERE term NOT IN ({qlist})
  GROUP BY term
  ORDER BY rm_ppm DESC, term ASC
  LIMIT {n_exp}
),
terms AS (
  SELECT term FROM exp UNION SELECT unnest([{qlist}])
),
per_doc AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
nn AS (SELECT count(*)::BIGINT AS n FROM {table}),
av AS (
  SELECT sum(dl)::BIGINT * 1000000 // (SELECT n FROM nn) AS avgdl_ppm
  FROM per_doc
),
tf AS (
  SELECT t.doc_id, t.term, count(*)::BIGINT AS tf, any_value(pd.dl) AS dl
  FROM toks t JOIN terms USING (term) JOIN per_doc pd USING (doc_id)
  GROUP BY 1, 2
),
dfq AS (SELECT term, count(*)::BIGINT AS df_t FROM tf GROUP BY 1),
idf AS (
  SELECT term,
         (2 * ((SELECT n FROM nn) - df_t) + 1) * 1000000 // (2 * df_t + 1)
           AS idf_ppm
  FROM dfq
),
sc AS (
  SELECT t.doc_id, sum({contrib})::BIGINT AS score_ppm
  FROM tf t JOIN idf ON idf.term = t.term
  GROUP BY 1
)
SELECT doc_id, score_ppm, rnk FROM (
  SELECT doc_id, score_ppm,
         row_number() OVER (ORDER BY score_ppm DESC, doc_id)::BIGINT AS rnk
  FROM sc
) WHERE rnk <= {k}
"""


# -- gazetteer entity tagging (dictionary NER) ---------------------------------
#
# Dictionary-based entity tagging — the exact-match NER pass every web-corpus
# pipeline runs before (or instead of) model NER: a curated gazetteer of
# typed surface forms (products, locations, orgs) is matched against the
# token stream and mention counts feed entity-level corpus statistics and
# filtering.  Multi-word surface forms use the positional-postings anchor
# trick of phrase_search generalized to many phrases at once: one broadcast
# (entity, slot, term) join kills every non-gazetteer token map-side, and
# the single exchange — keyed (doc, entity, anchor) — carries only
# gazetteer-term occurrences, never the corpus.  All matches count,
# including nested/overlapping ones (dictionary-tagging semantics).

GAZETTEER = (
    ("hash join", "OPERATOR"),
    ("sort merge", "OPERATOR"),
    ("merge join", "OPERATOR"),
    ("table scan", "OPERATOR"),
    ("window", "OPERATOR"),
    ("spark", "ENGINE"),
    ("batch stream", "MODE"),
)


def gazetteer_tag(
    df: DataFrame,
    gazetteer: tuple[tuple[str, str], ...] = GAZETTEER,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, entity, etype, n_mentions): occurrence counts of every
    gazetteer surface form per document (exact consecutive-token match,
    lowercase token normalization)."""
    slot_rows = []
    for entity, etype in gazetteer:
        toks = [t for t in entity.lower().split() if t]
        for i, t in enumerate(toks):
            slot_rows.append((entity, etype, i, t, len(toks)))
    slot_df = df.sparkSession.createDataFrame(
        slot_rows, "entity string, etype string, slot int, term string, plen int"
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("pos", "term"),
    )
    cand = toks.join(F.broadcast(slot_df), "term").select(
        "doc_id",
        "entity",
        "etype",
        (F.col("pos") - F.col("slot")).alias("anchor"),
        "plen",
    )
    hits = (
        cand.groupBy("doc_id", "entity", "etype", "anchor")
        .agg(F.count("*").alias("ns"), F.max("plen").alias("plen"))
        .where(F.col("ns") == F.col("plen"))
    )
    return hits.groupBy("doc_id", "entity", "etype").agg(
        F.count("*").cast("long").alias("n_mentions")
    )


def duck_gazetteer_sql(
    table: str, gazetteer: tuple[tuple[str, str], ...] = GAZETTEER
) -> str:
    """DuckDB twin of :func:`gazetteer_tag`."""
    slot_rows = []
    for entity, etype in gazetteer:
        toks = [t for t in entity.lower().split() if t]
        for i, t in enumerate(toks):
            slot_rows.append(
                f"('{entity}', '{etype}', {i}, '{t}', {len(toks)})"
            )
    values = ", ".join(slot_rows)
    return rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(arr) AS term,
         unnest(range(len(arr))) AS pos
  FROM (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       x -> x <> '') AS arr
    FROM {table}
  )
),
slots(entity, etype, slot, term, plen) AS (VALUES {values}),
cand AS (
  SELECT t.doc_id, s.entity, s.etype, t.pos - s.slot AS anchor, s.plen
  FROM toks t JOIN slots s USING (term)
),
hits AS (
  SELECT doc_id, entity, etype, anchor
  FROM cand
  GROUP BY doc_id, entity, etype, anchor, plen
  HAVING count(*) = plen
)
SELECT doc_id, entity, etype, count(*)::BIGINT AS n_mentions
FROM hits GROUP BY 1, 2, 3
"""


# -- WAND / MaxScore upper-bound metadata (index-time skipping structure) ------
#
# Per-term score upper bounds are what WAND (Broder et al., CIKM'03) and
# MaxScore (Turtle & Flood 1995) use to skip postings at query time: a
# term's max contribution over all documents bounds what any candidate can
# still gain, so blocks whose bound cannot reach the heap threshold are
# never decompressed.  Index builds precompute exactly this table.  Same
# integer BM25 surrogate as bm25_topk — the contribution expression is
# shared TEXT (_bm25_contrib_expr), divergence-proof across the ranker and
# its bounds.
#
# Scale shape: one doc-grain exchange (dl + per-term tf ride together),
# one term-grain partial-agg'd exchange for (df, max) — the standard
# index-build cost envelope; no query-time work here.


def maxscore_bounds(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, df_t, idf_ppm, max_score_ppm): per-term document frequency,
    integer idf, and the maximum single-document BM25 contribution."""
    toks = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias(
                "term"
            ),
        )
        .filter(F.col("term") != "")
    )
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .localCheckpoint(eager=True)  # feeds dl, dfreq and the scoring pass
    )
    per_doc = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    n_docs = df.count()
    total = per_doc.agg(F.coalesce(F.sum("dl"), F.lit(0))).first()[0]
    if n_docs == 0 or int(total) == 0:
        return df.sparkSession.createDataFrame(
            [], "term string, df_t long, idf_ppm long, max_score_ppm long"
        )
    avgdl_ppm = (int(total) * 1_000_000) // int(n_docs)
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df_t"))
    idf = dfreq.select(
        "term",
        "df_t",
        F.expr(
            f"(2 * ({n_docs}L - df_t) + 1) * 1000000L DIV (2 * df_t + 1)"
        ).alias("idf_ppm"),
    )
    contrib = _bm25_contrib_expr().format(div="DIV", avgdl_ppm=f"{avgdl_ppm}L")
    scored = (
        tf.join(per_doc, on="doc_id")
        .join(F.broadcast(idf), on="term")
        .withColumn("c_ppm", F.expr(contrib))
    )
    return scored.groupBy("term").agg(
        F.max("df_t").cast("long").alias("df_t"),
        F.max("idf_ppm").cast("long").alias("idf_ppm"),
        F.max("c_ppm").cast("long").alias("max_score_ppm"),
    )


def duck_maxscore_sql(table: str, id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`maxscore_bounds`."""
    contrib = _bm25_contrib_expr().format(
        div="//", avgdl_ppm="(SELECT avgdl_ppm FROM av)"
    )
    return rf"""
WITH toks AS (
  SELECT {id_col} AS doc_id, t.term
  FROM {table}, UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
  WHERE t.term <> ''
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
),
per_doc AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1),
nn AS (SELECT count(*)::BIGINT AS n FROM {table}),
av AS (
  SELECT sum(dl)::BIGINT * 1000000 // (SELECT n FROM nn) AS avgdl_ppm
  FROM per_doc
),
dfreq AS (SELECT term, count(*)::BIGINT AS df_t FROM tf GROUP BY 1),
idf AS (
  SELECT term, df_t,
         (2 * ((SELECT n FROM nn) - df_t) + 1) * 1000000 // (2 * df_t + 1)
           AS idf_ppm
  FROM dfreq
),
sc AS (
  SELECT t.term, idf.df_t, idf.idf_ppm, {contrib} AS c_ppm
  FROM tf t
  JOIN per_doc pd USING (doc_id)
  JOIN idf ON idf.term = t.term
)
SELECT term, max(df_t)::BIGINT AS df_t, max(idf_ppm)::BIGINT AS idf_ppm,
       max(c_ppm)::BIGINT AS max_score_ppm
FROM sc GROUP BY 1
"""


# -- BM25F fielded retrieval (Robertson & Zaragoza 2009 §7) --------------------
#
# Web ranking never scores body text alone: a title hit is worth more than
# a body hit, and BM25F is THE standard way to combine fields — per-field
# length-normalized tf, field weights applied BEFORE the k1 saturation
# (not a naive per-field-score sum, which double-saturates).  Same
# integer-exact discipline as bm25_topk: every step is BIGINT floor
# arithmetic over ppm-scaled rationals, shared expression text between the
# Spark plan and the DuckDB oracle.
#
#   tfn_f   = w_f * tf_f / ((1-b_f) + b_f * fl_f/avgfl_f)     [ppm]
#   tfn     = sum over fields of tfn_f
#   contrib = idf_ppm * (tfn / (tfn + k1)) / 1e6-scaling      [RSJ idf]

BM25F_FIELDS = (("title", 2000, 600), ("body", 1000, BM25_B_MILLI))
# (field, weight_milli, b_milli): title weighted 2x with lighter length
# normalization (b=0.6) — the Zaragoza et al. TREC settings' shape.
BM25F_TOPK = 20


def _bm25f_tfn_expr(b_milli: int, w_milli: int) -> str:
    """Weighted normalized field tf in ppm over columns (tf, fl) and the
    scalar {avgfl_ppm}; identical text feeds Spark and DuckDB."""
    one_minus_b = (1000 - b_milli) * 1000
    return (
        f"({w_milli} * ((tf * 1000000000000) {{div}} "
        f"({one_minus_b} + ({b_milli} * (fl * 1000000000000 {{div}} "
        f"{{avgfl_ppm}})) {{div}} 1000)) {{div}} 1000)"
    )


_BM25F_SAT_EXPR = (
    "(idf_ppm * ((tfn_ppm * 1000000) {div} (tfn_ppm + {k1} * 1000))) {div} 1000000"
)


def bm25f_topk(
    df: DataFrame,
    query_terms: tuple[str, ...] = BM25_QUERY,
    k: int = BM25F_TOPK,
    id_col: str = "url",
    fields: tuple = BM25F_FIELDS,
    field_cols: dict | None = None,
) -> DataFrame:
    """(doc, score_ppm, rnk): fielded BM25F top-k over (title, body).

    Scale shape: ONE union-of-fields tokenize pass -> per-(doc, field)
    conditional partial-agg (fl + per-term tf together, the bm25_topk
    trick); per-field average lengths are scalar aggregates; the weighted
    field combination and saturation are map-side integer expressions;
    idf joins back as a |query|-row broadcast; final top-k is
    TakeOrderedAndProject."""
    from pyspark.sql import Window

    field_cols = field_cols or {"title": "title", "body": "text"}
    qt = [t.lower() for t in dict.fromkeys(query_terms)]
    toks = None
    for fname, _, _ in fields:
        part = df.select(
            F.col(id_col).alias("doc"),
            F.lit(fname).alias("field"),
            F.explode(
                F.split(F.lower(F.col(field_cols[fname])), "[^a-z0-9]+")
            ).alias("term"),
        ).filter(F.col("term") != "")
        toks = part if toks is None else toks.unionByName(part)
    aggs = [F.count("*").cast("long").alias("fl")]
    for i, t in enumerate(qt):
        aggs.append(
            F.sum(F.when(F.col("term") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"tf_{i}")
        )
    per_field = toks.groupBy("doc", "field").agg(*aggs).localCheckpoint(eager=True)
    n_docs = int(df.count())
    if n_docs == 0:
        return df.select(
            F.col(id_col).alias("doc"),
            F.lit(0).cast("long").alias("score_ppm"),
            F.lit(0).cast("long").alias("rnk"),
        ).limit(0)
    avgfl = {
        r["field"]: (int(r["s"]) * 1_000_000) // n_docs
        for r in per_field.groupBy("field")
        .agg(F.sum("fl").alias("s"))
        .collect()
    }
    tfn_parts = []
    for fname, w_milli, b_milli in fields:
        if fname not in avgfl or avgfl[fname] == 0:
            continue
        e = _bm25f_tfn_expr(b_milli, w_milli).format(
            div="DIV", avgfl_ppm=avgfl[fname]
        )
        tfn_parts.append((fname, e))
    long_tf = per_field.select(
        "doc",
        "field",
        F.col("fl"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("term"), F.col(f"tf_{i}").alias("tf"))
                    for i, t in enumerate(qt)
                ]
            )
        ).alias("z"),
    ).select("doc", "field", "fl", "z.term", "z.tf").filter(F.col("tf") > 0)
    tfn_expr = "CASE " + " ".join(
        f"WHEN field = '{fname}' THEN cast({e} as bigint)"
        for fname, e in tfn_parts
    ) + " ELSE 0L END"
    per_doc_term = (
        long_tf.withColumn("tfn_f", F.expr(tfn_expr))
        .groupBy("doc", "term")
        .agg(F.sum("tfn_f").cast("long").alias("tfn_ppm"))
    )
    dfq = per_doc_term.groupBy("term").agg(F.count("*").cast("long").alias("df_t"))
    idf = dfq.select(
        "term",
        F.expr(
            f"(2 * ({n_docs} - df_t) + 1) * 1000000 DIV (2 * df_t + 1)"
        ).alias("idf_ppm"),
    )
    contrib = _BM25F_SAT_EXPR.format(div="DIV", k1=BM25_K1_MILLI)
    scored = (
        per_doc_term.join(F.broadcast(idf), on="term")
        .withColumn("c", F.expr(contrib).cast("long"))
        .groupBy("doc")
        .agg(F.sum("c").cast("long").alias("score_ppm"))
    )
    topk = scored.orderBy(F.desc("score_ppm"), F.asc("doc")).limit(k)
    w = Window.orderBy(F.desc("score_ppm"), F.asc("doc"))
    return topk.withColumn("rnk", F.row_number().over(w).cast("long"))


def duck_bm25f_sql(
    table: str,
    query_terms: tuple[str, ...] = BM25_QUERY,
    k: int = BM25F_TOPK,
    id_col: str = "url",
    fields: tuple = BM25F_FIELDS,
    field_cols: dict | None = None,
) -> str:
    field_cols = field_cols or {"title": "title", "body": "text"}
    qt = [t.lower() for t in dict.fromkeys(query_terms)]
    tok_union = "\n  UNION ALL ".join(
        f"SELECT {id_col} AS doc, '{fname}' AS field, t.term"
        f" FROM {table}, UNNEST(regexp_split_to_array(lower({field_cols[fname]}),"
        " '[^a-z0-9]+')) AS t(term) WHERE t.term <> ''"
        for fname, _, _ in fields
    )
    tf_cols = ",\n         ".join(
        f"sum(CASE WHEN term = '{t}' THEN 1 ELSE 0 END)::BIGINT AS tf_{i}"
        for i, t in enumerate(qt)
    )
    tf_union = "\n  UNION ALL ".join(
        f"SELECT doc, field, fl, '{t}' AS term, tf_{i} AS tf"
        f" FROM per_field WHERE tf_{i} > 0"
        for i, t in enumerate(qt)
    )
    tfn_case = "CASE " + " ".join(
        "WHEN field = '{f}' THEN ({e})".format(
            f=fname,
            e=_bm25f_tfn_expr(b_milli, w_milli).format(
                div="//",
                avgfl_ppm=(
                    f"(SELECT sum(fl)::BIGINT * 1000000 // (SELECT n FROM nn)"
                    f" FROM per_field WHERE field = '{fname}')"
                ),
            ),
        )
        for fname, w_milli, b_milli in fields
    ) + " ELSE 0 END"
    contrib = _BM25F_SAT_EXPR.format(div="//", k1=BM25_K1_MILLI)
    return rf"""
WITH toks AS (
  {tok_union}
),
per_field AS (
  SELECT doc, field, count(*)::BIGINT AS fl,
         {tf_cols}
  FROM toks GROUP BY 1, 2
),
nn AS (SELECT count(*)::BIGINT AS n FROM {table}),
tf AS (
  {tf_union}
),
pdt AS (
  SELECT doc, term, sum(({tfn_case})::BIGINT)::BIGINT AS tfn_ppm
  FROM tf GROUP BY 1, 2
),
dfq AS (SELECT term, count(*)::BIGINT AS df_t FROM pdt GROUP BY 1),
idf AS (
  SELECT term,
         (2 * ((SELECT n FROM nn) - df_t) + 1) * 1000000 // (2 * df_t + 1)
           AS idf_ppm
  FROM dfq
),
sc AS (
  SELECT p.doc, sum({contrib})::BIGINT AS score_ppm
  FROM pdt p JOIN idf ON idf.term = p.term
  GROUP BY 1
)
SELECT doc, score_ppm, rnk FROM (
  SELECT doc, score_ppm,
         row_number() OVER (ORDER BY score_ppm DESC, doc)::BIGINT AS rnk
  FROM sc
) WHERE rnk <= {k}
"""
