"""End-to-end training-corpus cleaning — the composition a 100 TB text
pipeline actually runs, built from the engine's graded primitives:

    documents -> exact dedup (md5 group, keep min doc_id)
              -> near-dup prune (MinHash -> LSH bands -> candidate pairs ->
                 exact shingle Jaccard; drop the larger id of any pair over
                 the threshold)
              -> quality gate (token count, punctuation ratio)
              -> language tag
              -> (doc_id, lang_pred, n_tokens)

Every stage is individually SQL-oracled elsewhere (dedupsim / textstats);
the composition is oracled as one DuckDB query so the stage WIRING — join
directions, drop rules, filter order — is value-hash-verified too, not just
the pieces.

Scale shape: exact dedup is one md5-keyed shuffle with map-side partials;
the near-dup stage shuffles on doc_id then uniform band keys (never
all-pairs); the drop list is a distinct projection of candidate pairs
(tiny vs the corpus) feeding a left-anti join; quality/langid are pure
map-side column functions.  Nothing here widens at 100x except the
embarrassingly parallel stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import dedupsim, textstats

NEAR_DUP_PPM = 500_000  # Jaccard >= 0.5 => near-duplicate
MIN_TOKENS = 5
MAX_PUNCT_PPM = 100_000  # drop punctuation-soup docs (>10% punct chars)


def clean_corpus(
    docs: DataFrame,
    near_dup_ppm: int = NEAR_DUP_PPM,
    min_tokens: int = MIN_TOKENS,
    max_punct_ppm: int = MAX_PUNCT_PPM,
) -> DataFrame:
    """(doc_id, lang_pred, n_tokens) for the cleaned corpus."""
    exact_keep = dedupsim.exact_dup_groups(docs, min_count=1).select(
        F.col("min_doc_id").alias("doc_id")
    )
    kept = docs.join(exact_keep, on="doc_id", how="left_semi")

    sh = dedupsim.shingles(kept)
    pairs = dedupsim.jaccard_for_pairs(
        dedupsim.lsh_candidate_pairs(dedupsim.lsh_bands(dedupsim.minhash_signatures(sh))),
        sh,
    )
    drop = (
        pairs.filter(F.col("jaccard_ppm") >= near_dup_ppm)
        .select(F.col("b").alias("doc_id"))
        .distinct()
    )
    kept2 = kept.join(drop, on="doc_id", how="left_anti")

    q = textstats.quality_columns(F.col("text"))
    return (
        kept2.select(
            "doc_id",
            textstats.lang_pred(F.col("text")).alias("lang_pred"),
            q["n_tokens"].alias("n_tokens"),
            q["punct_ppm"].alias("punct_ppm"),
        )
        .filter(
            (F.col("n_tokens") >= min_tokens) & (F.col("punct_ppm") <= max_punct_ppm)
        )
        .select("doc_id", "lang_pred", "n_tokens")
    )


def duck_clean_corpus_sql(
    table: str,
    near_dup_ppm: int = NEAR_DUP_PPM,
    min_tokens: int = MIN_TOKENS,
    max_punct_ppm: int = MAX_PUNCT_PPM,
) -> str:
    """The whole pipeline as one DuckDB query (CTE-scoped subqueries reuse
    the per-stage oracle SQL against intermediate CTEs)."""
    jac = dedupsim.duck_jaccard_sql("kept")
    quality = textstats.duck_quality_sql("kept2")
    langid = textstats.duck_langid_sql("kept2")
    return f"""
WITH exact_keep AS (
  SELECT min(doc_id) AS doc_id FROM {table} GROUP BY md5(text)
),
kept AS (
  SELECT d.* FROM {table} d WHERE EXISTS (
    SELECT 1 FROM exact_keep k WHERE k.doc_id = d.doc_id)
),
jac AS (SELECT * FROM ({jac})),
drops AS (SELECT DISTINCT b AS doc_id FROM jac WHERE jaccard_ppm >= {near_dup_ppm}),
kept2 AS (
  SELECT * FROM kept d WHERE NOT EXISTS (
    SELECT 1 FROM drops x WHERE x.doc_id = d.doc_id)
),
q AS (SELECT * FROM ({quality})),
l AS (SELECT * FROM ({langid}))
SELECT q.doc_id, l.lang_pred, q.n_tokens
FROM q JOIN l ON q.doc_id = l.doc_id
WHERE q.n_tokens >= {min_tokens} AND q.punct_ppm <= {max_punct_ppm}
"""


# -- html-to-corpus: the web-native composition --------------------------------
#
# clean_corpus above starts from already-extracted documents; a crawl
# starts from raw HTML.  This is the full web-native wiring: main-content
# extraction (density heuristic) -> empty-page gate -> quality + language
# tagging over the EXTRACTED text -> whitespace-fingerprint dedup with
# deterministic canonical selection (min url).  Each primitive is graded
# on its own; the composition is oracled as one DuckDB query so the wiring
# is value-verified too.

HTML_MIN_Q_PPM = 10_000  # stopword-density floor over extracted main text


def corpus_from_html(
    pages: DataFrame, min_q_ppm: int = HTML_MIN_Q_PPM
) -> DataFrame:
    """(url, lang_pred, q_ppm, n_chars) for the canonical, gated pages.

    Scale shape: extraction/quality/langid are one map-side JVM projection
    over the page scan (html never survives past it); the dedup is ONE
    md5-fingerprint exchange with map-side partial min; the winner join is
    co-keyed on (fingerprint, url).  The only wide data movement is the
    skinny (url, fp) projection."""
    from ..functions import html_parse

    # materialize the extraction: CollapseProject would otherwise inline the
    # block-regex expression tree into EVERY derived column below (lang
    # scores, quality, fingerprint), re-running it 5+ times per page —
    # measured 23s -> ~10s at sf0.1.  The checkpointed frame is the skinny
    # (url, main_text) projection, html is already gone.
    mc = (
        html_parse.main_content(pages)
        .where(F.col("n_kept") > 0)
        .select("url", "main_text")
        .localCheckpoint(eager=False)
    )
    scored = mc.select(
        "url",
        textstats.lang_pred(F.col("main_text")).alias("lang_pred"),
        textstats.quality_columns(F.col("main_text"))["stopword_ppm"].alias(
            "q_ppm"
        ),
        F.length("main_text").cast("long").alias("n_chars"),
        textstats.fingerprint(F.col("main_text")).alias("fp"),
    )
    gated = scored.where(F.col("q_ppm") >= min_q_ppm)
    winners = gated.groupBy("fp").agg(F.min("url").alias("url"))
    return gated.join(winners, ["fp", "url"]).select(
        "url", "lang_pred", "q_ppm", "n_chars"
    )


def duck_corpus_from_html_sql(
    table: str, min_q_ppm: int = HTML_MIN_Q_PPM
) -> str:
    from ..functions import html_parse

    mc = html_parse.duck_main_content_sql(table)
    stop = ", ".join(f"'{w}'" for w in textstats.STOPWORDS)
    toks = (
        r"CASE WHEN trim(main_text) = '' THEN [] "
        r"ELSE regexp_split_to_array(trim(main_text), '\s+') END"
    )
    lang_sql = textstats.duck_langid_sql("(SELECT url AS doc_id, main_text AS text FROM mc)")
    return rf"""
WITH mc AS ({mc}),
scored AS (
  SELECT url,
    floor(len(list_filter({toks}, t -> lower(t) IN ({stop})))
          / greatest(len({toks}), 1)::DOUBLE * 1e6)::BIGINT AS q_ppm,
    length(main_text)::BIGINT AS n_chars,
    md5(lower(regexp_replace(trim(main_text), '\s+', ' ', 'g'))) AS fp
  FROM mc WHERE n_kept > 0
),
langs AS ({lang_sql}),
gated AS (
  SELECT s.*, l.lang_pred FROM scored s JOIN langs l ON s.url = l.doc_id
  WHERE s.q_ppm >= {min_q_ppm}
),
winners AS (SELECT fp, min(url) AS url FROM gated GROUP BY fp)
SELECT g.url, g.lang_pred, g.q_ppm, g.n_chars
FROM gated g JOIN winners w ON g.fp = w.fp AND g.url = w.url
"""


def corpus_audit(
    pages: DataFrame, min_q_ppm: int = HTML_MIN_Q_PPM
) -> DataFrame:
    """Per-page drop-reason lineage for :func:`corpus_from_html` — every
    input URL labeled with the FIRST gate that removed it (or ``kept``):
    ``no_fetch`` (NULL html) -> ``no_content`` (no prose block survived
    extraction) -> ``low_quality`` (under the stopword floor) ->
    ``duplicate`` (lost the canonical-min-url election) -> ``kept``.

    Output: (url, reason, q_ppm) — q_ppm is NULL until the quality gate
    runs, mirroring what the pipeline actually computed for that page.

    Scale shape: identical to corpus_from_html (one extraction pass, one
    fingerprint exchange) — the audit rides the same plan with a CASE
    projection instead of filters, so auditing costs what the pipeline
    costs, not a second methodology.  The fetch flag rides the extraction
    projection (``main_content(passthrough=...)``); pages is scanned ONCE
    and nothing joins back on url."""
    from ..functions import html_parse

    src = pages.select(
        "url", "html", F.col("html").isNotNull().alias("fetched")
    )
    mc = (
        html_parse.main_content(src, passthrough=("fetched",))
        .select("url", "n_kept", "main_text", "fetched")
        .localCheckpoint(eager=False)
    )
    scored = mc.select(
        "url",
        "n_kept",
        "fetched",
        F.when(
            F.col("n_kept") > 0,
            textstats.quality_columns(F.col("main_text"))["stopword_ppm"],
        ).alias("q_ppm"),
        F.when(
            F.col("n_kept") > 0, textstats.fingerprint(F.col("main_text"))
        ).alias("fp"),
    )
    gated = scored.where(
        (F.col("n_kept") > 0) & (F.col("q_ppm") >= min_q_ppm)
    )
    winners = (
        gated.groupBy("fp")
        .agg(F.min("url").alias("win_url"))
        .withColumnRenamed("fp", "win_fp")
    )
    return (
        scored.join(winners, F.col("fp") == F.col("win_fp"), "left")
        .select(
            "url",
            F.when(~F.col("fetched"), F.lit("no_fetch"))
            .when(F.col("n_kept") == 0, F.lit("no_content"))
            .when(F.col("q_ppm") < min_q_ppm, F.lit("low_quality"))
            .when(F.col("url") != F.col("win_url"), F.lit("duplicate"))
            .otherwise(F.lit("kept"))
            .alias("reason"),
            "q_ppm",
        )
    )


def duck_corpus_audit_sql(
    table: str, min_q_ppm: int = HTML_MIN_Q_PPM
) -> str:
    from ..functions import html_parse

    mc = html_parse.duck_main_content_sql(table)
    stop = ", ".join(f"'{w}'" for w in textstats.STOPWORDS)
    toks = (
        r"CASE WHEN trim(main_text) = '' THEN [] "
        r"ELSE regexp_split_to_array(trim(main_text), '\s+') END"
    )
    return rf"""
WITH mc AS ({mc}),
scored AS (
  SELECT url, n_kept,
    CASE WHEN n_kept > 0 THEN
      floor(len(list_filter({toks}, t -> lower(t) IN ({stop})))
            / greatest(len({toks}), 1)::DOUBLE * 1e6)::BIGINT
    END AS q_ppm,
    CASE WHEN n_kept > 0 THEN
      md5(lower(regexp_replace(trim(main_text), '\s+', ' ', 'g')))
    END AS fp
  FROM mc
),
winners AS (
  SELECT fp, min(url) AS win_url FROM scored
  WHERE n_kept > 0 AND q_ppm >= {min_q_ppm} GROUP BY fp
),
fetched AS (SELECT url, html IS NOT NULL AS fetched FROM {table})
SELECT s.url,
  CASE WHEN NOT f.fetched THEN 'no_fetch'
       WHEN s.n_kept = 0 THEN 'no_content'
       WHEN s.q_ppm < {min_q_ppm} THEN 'low_quality'
       WHEN s.url <> w.win_url THEN 'duplicate'
       ELSE 'kept' END AS reason,
  s.q_ppm
FROM scored s
JOIN fetched f ON s.url = f.url
LEFT JOIN winners w ON s.fp = w.fp
"""
