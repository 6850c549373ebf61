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
