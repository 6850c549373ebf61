"""Web-corpus filtering for LLM training data: C4-style line filtering,
Gopher-style repetition statistics, PII detection/redaction, and corpus-level
line deduplication.

These are the document-structure-aware filters a Common-Crawl-scale training
pipeline runs after HTML extraction (the reference stops at ``len(text)``
example counts — reference test_quick.py:28-38; this whole layer is engine
added value).  They operate on the ``webdocs`` synthetic table
(``synth._gen_webdocs``): multi-line documents with boilerplate, syndicated
lines, PII, and in-document repetition.

Design rules shared with :mod:`textstats`:

* everything JVM-side (`pyspark.sql.functions` — whole-stage codegen; the
  only shuffles are keyed aggregations with map-side partial agg);
* ratios emitted as ``floor(x * 1e6)`` integer ppm (bit-deterministic across
  engines);
* regexes restricted to the Java-regex ∩ RE2 common subset (ASCII classes,
  no lookaround) so the DuckDB oracles match byte-for-byte.

Scale shape per operator (the 100 TB reading):

* ``clean_lines`` / ``pii_scrub`` — pure map-side (higher-order array
  functions / regexp over one row at a time); embarrassingly parallel.
* ``repetition_stats`` — explode → two keyed aggregations with partial agg;
  never materializes a per-doc cross product (a quadratic higher-order-
  function form would be O(tokens²) per doc — rejected by design).
* ``dedup_corpus_lines`` — explode → ``row_number() = 1`` over the line-hash
  key (compiles to WindowGroupLimit: per-partition top-1 prune BEFORE the
  exchange, so duplicate-heavy corpora ship one candidate per key per map
  partition) → per-doc reassembly agg.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

# C4 (Raffel et al., 2020) line heuristics: keep lines that end in terminal
# punctuation, have at least MIN_LINE_WORDS words, and carry no boilerplate
# marker ("javascript", "cookie", "copyright" — case-insensitive).
MIN_LINE_WORDS = 5
TERMINAL_RE = r'[.!?"]$'
BLACKLIST = ("javascript", "cookie", "copyright")

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


def _ppm(num: Column, den: Column) -> Column:
    return F.floor(
        num.cast("double") / F.greatest(den.cast("double"), F.lit(1.0)) * 1e6
    ).cast("long")


def _line_ok(line: Column) -> Column:
    ok = line.rlike(TERMINAL_RE) & (
        F.size(F.split(F.trim(line), r"\s+")) >= MIN_LINE_WORDS
    )
    for marker in BLACKLIST:
        ok = ok & ~F.contains(F.lower(line), F.lit(marker))
    return ok


def clean_lines(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """C4 line filter: per document, keep lines that look like prose
    (terminal punctuation, >= MIN_LINE_WORDS words, no boilerplate marker).
    Output: (doc_id, n_lines, n_kept, text_clean)."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, _line_ok)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.array_join(kept, "\n").alias("text_clean"),
    )


def duck_clean_lines_sql(table: str) -> str:
    pred = (
        rf"regexp_matches(l, '[.!?\"]$') "
        rf"AND len(regexp_split_to_array(trim(l), '\s+')) >= {MIN_LINE_WORDS}"
        + "".join(f" AND NOT contains(lower(l), '{m}')" for m in BLACKLIST)
    )
    return rf"""
WITH ls AS (SELECT doc_id, regexp_split_to_array(text, '\n') AS lines FROM {table})
SELECT doc_id,
  len(lines)::BIGINT AS n_lines,
  len(list_filter(lines, l -> {pred}))::BIGINT AS n_kept,
  coalesce(array_to_string(list_filter(lines, l -> {pred}), chr(10)), '') AS text_clean
FROM ls
"""


def repetition_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals: fraction of characters sitting in
    duplicated lines (all occurrences counted), and the share of the most
    frequent word 2-gram.  Output: (doc_id, n_lines, dup_line_ppm,
    n_bigrams, top_bigram_ppm)."""
    ids = df.select(F.col(id_col).alias("doc_id"))
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    )
    line_agg = (
        lines.groupBy("doc_id", "line")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_lines"),
            F.sum(F.col("cnt") * F.length("line")).alias("tot_chars"),
            F.sum(
                F.when(F.col("cnt") >= 2, F.col("cnt") * F.length("line")).otherwise(
                    F.lit(0)
                )
            ).alias("dup_chars"),
        )
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.when(
            F.length(F.trim(F.col(text_col))) == 0, F.array().cast("array<string>")
        )
        .otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
        .alias("t"),
    )
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.expr("transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1]))"),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bg"),
    )
    bg_agg = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top_cnt"), F.sum("cnt").alias("n_bigrams"))
    )
    return (
        ids.join(line_agg, "doc_id", "left")
        .join(bg_agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            _ppm(F.coalesce("dup_chars", F.lit(0)), F.coalesce("tot_chars", F.lit(0))).alias(
                "dup_line_ppm"
            ),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            _ppm(F.coalesce("top_cnt", F.lit(0)), F.coalesce("n_bigrams", F.lit(0))).alias(
                "top_bigram_ppm"
            ),
        )
    )


def duck_repetition_sql(table: str) -> str:
    return rf"""
WITH l AS (
  SELECT doc_id, u.line
  FROM {table}, UNNEST(regexp_split_to_array(text, '\n')) AS u(line)
),
lg AS (SELECT doc_id, line, count(*) AS c FROM l GROUP BY 1, 2),
la AS (
  SELECT doc_id, sum(c)::BIGINT AS n_lines,
         sum(c * length(line)) AS tot_chars,
         sum(CASE WHEN c >= 2 THEN c * length(line) ELSE 0 END) AS dup_chars
  FROM lg GROUP BY 1
),
tk AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []
              ELSE regexp_split_to_array(trim(text), '\s+') END AS t
  FROM {table}
),
bg AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS b
  FROM tk, UNNEST(range(1, len(t))) AS r(i)
  WHERE len(t) >= 2
),
bgc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
bga AS (SELECT doc_id, max(c) AS top_cnt, sum(c) AS n_bigrams FROM bgc GROUP BY 1)
SELECT d.doc_id,
  coalesce(la.n_lines, 0)::BIGINT AS n_lines,
  floor(coalesce(la.dup_chars, 0) / greatest(coalesce(la.tot_chars, 0), 1)::DOUBLE * 1e6)::BIGINT AS dup_line_ppm,
  coalesce(bga.n_bigrams, 0)::BIGINT AS n_bigrams,
  floor(coalesce(bga.top_cnt, 0) / greatest(coalesce(bga.n_bigrams, 0), 1)::DOUBLE * 1e6)::BIGINT AS top_bigram_ppm
FROM (SELECT doc_id FROM {table}) d
LEFT JOIN la USING (doc_id)
LEFT JOIN bga USING (doc_id)
"""


def pii_scrub(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Count and redact emails / NNN-NNN-NNNN phone numbers (emails first, so
    digits inside a redacted email are never double-counted as a phone).
    Output: (doc_id, n_emails, n_phones, text_redacted)."""
    t = F.col(text_col)
    no_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(no_email, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_replace(no_email, PHONE_RE, "<PHONE>").alias("text_redacted"),
    )


def duck_pii_sql(table: str) -> str:
    return rf"""
SELECT doc_id,
  len(regexp_extract_all(text, '{EMAIL_RE}'))::BIGINT AS n_emails,
  len(regexp_extract_all(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'), '{PHONE_RE}'))::BIGINT AS n_phones,
  regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'), '{PHONE_RE}', '<PHONE>', 'g') AS text_redacted
FROM {table}
"""


def dedup_corpus_lines(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-level line deduplication (the CCNet/C4 repeated-span rule at
    line granularity): a non-blank line survives only in its first occurrence
    across the whole corpus — "first" = lowest (doc_id, line position); the
    dedup key is the whitespace/case-normalized line, the survivor keeps its
    raw text.  Output: (doc_id, n_lines, n_kept, text_dedup) for every input
    document (documents that lose every line keep an empty text_dedup)."""
    lines = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
        )
        .filter(F.trim("line") != "")
        .withColumn("k", F.md5(F.lower(F.trim("line"))))
    )
    w = Window.partitionBy("k").orderBy("doc_id", "pos")
    winners = lines.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    n_all = lines.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_lines"))
    kept = winners.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_dedup"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(n_all, "doc_id", "left")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )


# Gopher-style document gates applied between line filtering and dedup: drop
# documents whose duplicated lines carry more than half their characters, or
# whose dominant word 2-gram exceeds a fifth of all 2-grams.
MAX_DUP_LINE_PPM = 500_000
MAX_TOP_BIGRAM_PPM = 200_000

# Gopher (Rae et al., 2021) document-level quality rules.  Thresholds are the
# published ones scaled to integer ppm; the stop-word list is the paper's
# 8-word English function-word set (>= MIN_STOP_HITS distinct hits required).
STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
MIN_DOC_WORDS, MAX_DOC_WORDS = 50, 100_000
MIN_MEAN_WORD_LEN_PPM, MAX_MEAN_WORD_LEN_PPM = 3_000_000, 10_000_000
MAX_SYMBOL_WORD_PPM = 100_000  # '#' + '...' occurrences per word
MAX_BULLET_LINE_PPM = 900_000  # lines starting with "- " / "* "
MAX_ELLIPSIS_LINE_PPM = 300_000  # lines ending with "..."
MIN_ALPHA_WORD_PPM = 800_000  # words containing at least one [A-Za-z]
MIN_STOP_HITS = 2

# Java-regex ∩ RE2 subset (module contract): ASCII classes only.
_WORD_EDGE_RE = "^[^a-z0-9]+|[^a-z0-9]+$"
_BULLET_RE = r"^\s*[-*] "
_ELLIPSIS_RE = r"\.\.\.$"
_NONASCII_RE = r"[^\x00-\x7f]"


def gopher_quality(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher document-level quality signals + the composed keep/drop gate.

    Per document (all integer, deterministic across engines):
    ``n_words``, ``mean_word_len_ppm`` (micro-chars), ``symbol_word_ppm``,
    ``bullet_line_ppm`` / ``ellipsis_line_ppm`` (over non-blank lines),
    ``alpha_word_ppm``, ``n_stop_hits`` (distinct stop words present, matched
    on edge-punctuation-stripped lowercase tokens), ``nonascii_ppm`` (per
    character — a charset signal, not part of the gate), and ``gopher_ok``
    (0/1 conjunction of the published thresholds).

    Scale shape: one map-side select — higher-order array functions over each
    row, no explode, no shuffle; embarrassingly parallel at corpus scale.
    """
    t = F.col(text_col)
    words = F.when(
        F.length(F.trim(t)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(t), r"\s+"))
    norm_words = F.transform(
        words, lambda w: F.regexp_replace(F.lower(w), _WORD_EDGE_RE, "")
    )
    lines_nb = F.filter(
        F.split(t, "\n"), lambda line: F.trim(line) != F.lit("")
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        t.alias("__text"),
        F.size(words).cast("long").alias("n_words"),
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).alias("__sum_len"),
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
        .cast("long")
        .alias("__n_alpha"),
        F.size(
            F.array_intersect(
                norm_words, F.array(*[F.lit(s) for s in STOP_WORDS])
            )
        )
        .cast("long")
        .alias("n_stop_hits"),
        F.size(lines_nb).cast("long").alias("__n_ln"),
        F.size(F.filter(lines_nb, lambda line: line.rlike(_BULLET_RE)))
        .cast("long")
        .alias("__n_bullet"),
        F.size(
            F.filter(lines_nb, lambda line: F.trim(line).rlike(_ELLIPSIS_RE))
        )
        .cast("long")
        .alias("__n_ellipsis"),
    )
    syms = (
        F.regexp_count(F.col("__text"), F.lit("#"))
        + F.regexp_count(F.col("__text"), F.lit(r"\.\.\."))
    ).cast("long")
    out = base.select(
        "doc_id",
        "n_words",
        _ppm(F.col("__sum_len"), F.col("n_words")).alias("mean_word_len_ppm"),
        _ppm(syms, F.col("n_words")).alias("symbol_word_ppm"),
        _ppm(F.col("__n_bullet"), F.col("__n_ln")).alias("bullet_line_ppm"),
        _ppm(F.col("__n_ellipsis"), F.col("__n_ln")).alias("ellipsis_line_ppm"),
        _ppm(F.col("__n_alpha"), F.col("n_words")).alias("alpha_word_ppm"),
        "n_stop_hits",
        _ppm(
            F.regexp_count(F.col("__text"), F.lit(_NONASCII_RE)).cast("long"),
            F.length(F.col("__text")).cast("long"),
        ).alias("nonascii_ppm"),
    )
    ok = (
        F.col("n_words").between(MIN_DOC_WORDS, MAX_DOC_WORDS)
        & F.col("mean_word_len_ppm").between(
            MIN_MEAN_WORD_LEN_PPM, MAX_MEAN_WORD_LEN_PPM
        )
        & (F.col("symbol_word_ppm") <= MAX_SYMBOL_WORD_PPM)
        & (F.col("bullet_line_ppm") <= MAX_BULLET_LINE_PPM)
        & (F.col("ellipsis_line_ppm") <= MAX_ELLIPSIS_LINE_PPM)
        & (F.col("alpha_word_ppm") >= MIN_ALPHA_WORD_PPM)
        & (F.col("n_stop_hits") >= MIN_STOP_HITS)
    )
    return out.withColumn("gopher_ok", ok.cast("long"))


def duck_gopher_sql(table: str) -> str:
    stops = ", ".join(f"'{s}'" for s in STOP_WORDS)
    return rf"""
WITH base AS (
  SELECT doc_id, text,
    CASE WHEN trim(text) = '' THEN []
         ELSE regexp_split_to_array(trim(text), '\s+') END AS w,
    list_filter(regexp_split_to_array(text, '\n'), l -> trim(l) <> '') AS ln
  FROM {table}
),
m AS (
  SELECT doc_id, text,
    len(w)::BIGINT AS n_words,
    coalesce(list_sum(list_transform(w, x -> length(x))), 0)::BIGINT AS sum_len,
    len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT AS n_alpha,
    len(list_intersect(
      list_transform(w, x -> regexp_replace(lower(x), '{_WORD_EDGE_RE}', '', 'g')),
      [{stops}]))::BIGINT AS n_stop_hits,
    (len(regexp_extract_all(text, '#'))
      + len(regexp_extract_all(text, '\.\.\.')))::BIGINT AS n_sym,
    len(ln)::BIGINT AS n_ln,
    len(list_filter(ln, l -> regexp_matches(l, '{_BULLET_RE}')))::BIGINT AS n_bullet,
    len(list_filter(ln, l -> regexp_matches(trim(l), '{_ELLIPSIS_RE}')))::BIGINT AS n_ellipsis,
    len(regexp_extract_all(text, '{_NONASCII_RE}'))::BIGINT AS n_nonascii,
    length(text)::BIGINT AS n_chars
  FROM base
),
p AS (
  SELECT doc_id, n_words, n_stop_hits,
    floor(sum_len / greatest(n_words, 1)::DOUBLE * 1e6)::BIGINT AS mean_word_len_ppm,
    floor(n_sym / greatest(n_words, 1)::DOUBLE * 1e6)::BIGINT AS symbol_word_ppm,
    floor(n_bullet / greatest(n_ln, 1)::DOUBLE * 1e6)::BIGINT AS bullet_line_ppm,
    floor(n_ellipsis / greatest(n_ln, 1)::DOUBLE * 1e6)::BIGINT AS ellipsis_line_ppm,
    floor(n_alpha / greatest(n_words, 1)::DOUBLE * 1e6)::BIGINT AS alpha_word_ppm,
    floor(n_nonascii / greatest(n_chars, 1)::DOUBLE * 1e6)::BIGINT AS nonascii_ppm
  FROM m
)
SELECT *,
  (n_words BETWEEN {MIN_DOC_WORDS} AND {MAX_DOC_WORDS}
   AND mean_word_len_ppm BETWEEN {MIN_MEAN_WORD_LEN_PPM} AND {MAX_MEAN_WORD_LEN_PPM}
   AND symbol_word_ppm <= {MAX_SYMBOL_WORD_PPM}
   AND bullet_line_ppm <= {MAX_BULLET_LINE_PPM}
   AND ellipsis_line_ppm <= {MAX_ELLIPSIS_LINE_PPM}
   AND alpha_word_ppm >= {MIN_ALPHA_WORD_PPM}
   AND n_stop_hits >= {MIN_STOP_HITS})::BIGINT AS gopher_ok
FROM p
"""


def clean_web_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_line_ppm: int = MAX_DUP_LINE_PPM,
    max_top_bigram_ppm: int = MAX_TOP_BIGRAM_PPM,
    gopher_gate: bool = False,
) -> DataFrame:
    """The composed web-corpus cleaning pipeline, C4/Gopher/CCNet order:
    line-filter each document, (optionally) apply the Gopher document-quality
    gate, drop repetition-heavy documents, deduplicate surviving lines
    corpus-wide (first occurrence wins), then redact PII.
    Output: (doc_id, n_pii, text_out) for documents that still hold text.

    ``gopher_gate=False`` by default: the published 50-word minimum is tuned
    for Common-Crawl pages and would dominate every later stage on short-doc
    corpora; enable it for production-scale web text.

    Plan shape: the line filter, gopher gate, and repetition stats are
    map-side + partial agg; the only corpus-wide exchanges are the line-hash
    WindowGroupLimit dedup and the per-doc reassembly — no stage touches more
    than (line, key) pairs, so the pipeline holds at Common-Crawl scale."""
    cleaned = clean_lines(df, id_col, text_col).filter(F.col("n_kept") > 0).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    if gopher_gate:
        gok = (
            gopher_quality(cleaned)
            .filter(F.col("gopher_ok") == 1)
            .select("doc_id")
        )
        cleaned = cleaned.join(gok, "doc_id", "left_semi")
    rep = repetition_stats(cleaned)
    keep = rep.filter(
        (F.col("dup_line_ppm") <= max_dup_line_ppm)
        & (F.col("top_bigram_ppm") <= max_top_bigram_ppm)
    ).select("doc_id")
    gated = cleaned.join(keep, "doc_id", "left_semi")
    deduped = dedup_corpus_lines(gated).filter(F.col("n_kept") > 0).select(
        "doc_id", F.col("text_dedup").alias("text")
    )
    return pii_scrub(deduped).select(
        "doc_id",
        (F.col("n_emails") + F.col("n_phones")).cast("long").alias("n_pii"),
        F.col("text_redacted").alias("text_out"),
    )


def duck_clean_web_corpus_sql(
    table: str,
    max_dup_line_ppm: int = MAX_DUP_LINE_PPM,
    max_top_bigram_ppm: int = MAX_TOP_BIGRAM_PPM,
    gopher_gate: bool = False,
) -> str:
    """One DuckDB query composing the stage oracles — verifies the stage
    WIRING, not just the pieces (same discipline as plans/corpus.py)."""
    gate_ctes = ""
    rep_src = "base"
    if gopher_gate:
        gate_ctes = rf"""g0 AS ({duck_gopher_sql("base")}),
baseg AS (SELECT * FROM base
          WHERE doc_id IN (SELECT doc_id FROM g0 WHERE gopher_ok = 1)),
"""
        rep_src = "baseg"
    return rf"""
WITH c0 AS ({duck_clean_lines_sql(table)}),
base AS (SELECT doc_id, text_clean AS text FROM c0 WHERE n_kept > 0),
{gate_ctes}r0 AS ({duck_repetition_sql(rep_src)}),
keep AS (
  SELECT doc_id FROM r0
  WHERE dup_line_ppm <= {max_dup_line_ppm}
    AND top_bigram_ppm <= {max_top_bigram_ppm}
),
base2 AS (SELECT * FROM base WHERE doc_id IN (SELECT doc_id FROM keep)),
d0 AS ({duck_dedup_lines_sql("base2")}),
base3 AS (SELECT doc_id, text_dedup AS text FROM d0 WHERE n_kept > 0),
p0 AS ({duck_pii_sql("base3")})
SELECT doc_id, (n_emails + n_phones)::BIGINT AS n_pii, text_redacted AS text_out
FROM p0
"""


DUP_NGRAM_N = 8


def duplicate_ngram_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DUP_NGRAM_N,
) -> DataFrame:
    """Corpus-wide duplicate n-gram coverage (the Dolma/Gopher n-gram dedup
    signal): per document, the fraction of its word ``n``-grams (lowercased
    whitespace tokens) that occur at least twice across the WHOLE corpus —
    within-doc repeats count.  Output: (doc_id, n_grams, dup_gram_ppm).

    Scale shape: tokens never leave the map side as raw strings — grams are
    xxhash64-compressed before any exchange, and the per-(doc, gram) partial
    aggregation collapses within-doc repeats first, so the shuffled relation
    is bounded by distinct (doc, gram) pairs.  The global-count join is
    hash-keyed on the same column the aggregation just partitioned by.
    (Collision note: a 64-bit gram-hash collision would merge two grams'
    counts; at the 10^10-gram design point the expected collision count is
    ~10^-9 of the corpus — accepted, same trade as minhash.)"""
    t = F.col(text_col)
    toks = F.when(
        F.length(F.trim(t)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.lower(F.trim(t)), r"\s+"))
    grams_expr = F.when(
        F.size(F.col("__t")) >= n,
        F.expr(
            f"transform(sequence(0, size(__t) - {n}), "
            f"i -> xxhash64(array_join(slice(__t, i + 1, {n}), ' ')))"
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    grams = df.select(F.col(id_col).alias("doc_id"), toks.alias("__t")).select(
        "doc_id", F.explode(grams_expr).alias("g")
    )
    # per-(doc, gram) multiplicity: partial agg collapses within-doc repeats
    per_doc = grams.groupBy("doc_id", "g").agg(F.count("*").alias("cnt"))
    glob = per_doc.groupBy("g").agg(F.sum("cnt").alias("tot"))
    stats = (
        per_doc.join(glob, "g")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            F.sum(F.when(F.col("tot") >= 2, F.col("cnt")).otherwise(F.lit(0)))
            .cast("long")
            .alias("dup"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            _ppm(F.coalesce("dup", F.lit(0)), F.coalesce("n_grams", F.lit(0))).alias(
                "dup_gram_ppm"
            ),
        )
    )


def duck_dup_ngrams_sql(table: str, n: int = DUP_NGRAM_N) -> str:
    # the oracle keys grams by their text (DuckDB has no xxhash64); counts
    # are identical unless Spark's 64-bit hash collides — see operator note
    return rf"""
WITH tk AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []
              ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS t
  FROM {table}
),
g AS (
  SELECT doc_id, array_to_string(t[i:i + {n} - 1], ' ') AS gram
  FROM tk, UNNEST(range(1, len(t) - {n} + 2)) AS r(i)
  WHERE len(t) >= {n}
),
pd AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
gl AS (SELECT gram, sum(cnt) AS tot FROM pd GROUP BY 1),
st AS (
  SELECT pd.doc_id, sum(pd.cnt)::BIGINT AS n_grams,
         sum(CASE WHEN gl.tot >= 2 THEN pd.cnt ELSE 0 END)::BIGINT AS dup
  FROM pd JOIN gl USING (gram) GROUP BY 1
)
SELECT d.doc_id,
  coalesce(st.n_grams, 0)::BIGINT AS n_grams,
  floor(coalesce(st.dup, 0) / greatest(coalesce(st.n_grams, 0), 1)::DOUBLE * 1e6)::BIGINT AS dup_gram_ppm
FROM (SELECT doc_id FROM {table}) d
LEFT JOIN st USING (doc_id)
"""


def duck_dedup_lines_sql(table: str) -> str:
    return rf"""
WITH l AS (
  SELECT doc_id, i AS pos, lines[i] AS line
  FROM (SELECT doc_id, regexp_split_to_array(text, '\n') AS lines FROM {table}),
       UNNEST(range(1, len(lines) + 1)) AS r(i)
  WHERE trim(lines[i]) <> ''
),
first_occ AS (
  SELECT doc_id, pos, line FROM (
    SELECT doc_id, pos, line,
           row_number() OVER (
             PARTITION BY md5(lower(trim(line))) ORDER BY doc_id, pos
           ) AS rn
    FROM l
  ) WHERE rn = 1
),
nl AS (SELECT doc_id, count(*)::BIGINT AS n_lines FROM l GROUP BY 1),
kp AS (
  SELECT doc_id, count(*)::BIGINT AS n_kept,
         string_agg(line, chr(10) ORDER BY pos) AS text_dedup
  FROM first_occ GROUP BY 1
)
SELECT d.doc_id,
  coalesce(nl.n_lines, 0)::BIGINT AS n_lines,
  coalesce(kp.n_kept, 0)::BIGINT AS n_kept,
  coalesce(kp.text_dedup, '') AS text_dedup
FROM (SELECT doc_id FROM {table}) d
LEFT JOIN nl USING (doc_id)
LEFT JOIN kp USING (doc_id)
"""


# -- benchmark decontamination ------------------------------------------------
#
# GPT-3 Appendix C / Dolma-style eval-set decontamination: a training document
# is contaminated when it shares any word n-gram (lowercased whitespace
# tokens) with the benchmark corpus.  The reference has no training-data
# layer at all (its pipeline stops at extracted text); this is engine added
# value alongside the dedup family.

DECON_N = 8


def _gram_rows(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gram-hash) rows, one per DISTINCT n-gram per document.  Grams are
    xxhash64-compressed map-side and deduped within the doc (array_distinct)
    before the explode, so nothing leaves the scan task as raw strings."""
    t = F.col(text_col)
    toks = F.when(
        F.length(F.trim(t)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.lower(F.trim(t)), r"\s+"))
    grams_expr = F.when(
        F.size(F.col("__t")) >= n,
        F.expr(
            f"transform(sequence(0, size(__t) - {n}), "
            f"i -> xxhash64(array_join(slice(__t, i + 1, {n}), ' ')))"
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return df.select(F.col(id_col).alias("__id"), toks.alias("__t")).select(
        "__id", F.explode(F.array_distinct(grams_expr)).alias("g")
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = DECON_N,
) -> DataFrame:
    """Flag training documents sharing any word ``n``-gram with the benchmark
    set.  Output: (doc_id, n_grams, n_contam, contaminated) — n_grams /
    n_contam count DISTINCT grams per document.

    Scale shape (the 100 TB reading): eval suites are ~10^6 grams while the
    corpus is ~10^10 documents, so the distinct benchmark grams BROADCAST and
    the contamination probe is a map-side hash join on the corpus scan — no
    corpus-sized gram relation is ever exchanged; the only shuffle is the
    per-doc partial-agg'd groupBy.  Gram identity is a 64-bit hash (same
    collision trade as minhash/dup-ngrams: ~10^-9 expected merges at design
    point, documented and accepted)."""
    doc_g = _gram_rows(docs, id_col, text_col, n)
    bench_g = (
        _gram_rows(bench, bench.columns[0], bench_text_col, n)
        .select("g")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    stats = (
        doc_g.join(F.broadcast(bench_g), "g", "left")
        .groupBy("__id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_contam"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(stats.withColumnRenamed("__id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_contam", F.lit(0)).cast("long").alias("n_contam"),
            (F.coalesce("n_contam", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def duck_decontaminate_sql(docs: str, bench: str, n: int = DECON_N) -> str:
    # oracle keys grams by text (no xxhash64 in DuckDB) — identical counts
    # barring a 64-bit collision, same caveat as duck_dup_ngrams_sql
    def grams(table: str, idc: str) -> str:
        return rf"""
  SELECT DISTINCT {idc}, array_to_string(t[i:i + {n} - 1], ' ') AS gram
  FROM (
    SELECT {idc},
           CASE WHEN trim(text) = '' THEN []
                ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS t
    FROM {table}
  ), UNNEST(range(1, len(t) - {n} + 2)) AS r(i)
  WHERE len(t) >= {n}"""

    return rf"""
WITH dg AS ({grams(docs, "doc_id")}),
bg AS (SELECT DISTINCT gram FROM ({grams(bench, "eval_id")})),
st AS (
  SELECT dg.doc_id, count(*)::BIGINT AS n_grams, count(bg.gram)::BIGINT AS n_contam
  FROM dg LEFT JOIN bg USING (gram) GROUP BY 1
)
SELECT d.doc_id,
  coalesce(st.n_grams, 0)::BIGINT AS n_grams,
  coalesce(st.n_contam, 0)::BIGINT AS n_contam,
  coalesce(st.n_contam, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM {docs}) d
LEFT JOIN st USING (doc_id)
"""


def export_corpus(
    df: DataFrame,
    bench: DataFrame,
    n_shards: int = 32,
    gopher_gate: bool = False,
) -> DataFrame:
    """The full training-data export: clean_web_corpus (line filter ->
    optional Gopher gate -> repetition gate -> corpus line dedup -> PII) ->
    eval-set decontamination OF THE CLEANED TEXT (what ships is what's
    checked) -> deterministic shard assignment for the writer.
    Output: (doc_id, n_pii, shard, text_out) for surviving documents.

    The cleaned frame is materialized once (localCheckpoint) before the
    decontamination branch — the flags join and the export select must not
    recompute the multi-exchange cleaning subplan twice (the repo's
    branch-recompute rule, see plans/schedule.py history)."""
    from .sampling import hash_bucket

    cleaned = clean_web_corpus(df, gopher_gate=gopher_gate).localCheckpoint(
        eager=True
    )
    flags = decontaminate(
        cleaned.select("doc_id", F.col("text_out").alias("text")), bench
    )
    keep = flags.filter(~F.col("contaminated")).select("doc_id")
    return cleaned.join(keep, "doc_id", "left_semi").select(
        "doc_id",
        "n_pii",
        hash_bucket(F.col("doc_id"), n_shards).alias("shard"),
        "text_out",
    )


def duck_export_corpus_sql(
    table: str, bench: str, n_shards: int = 32, gopher_gate: bool = False
) -> str:
    return rf"""
WITH cw AS ({duck_clean_web_corpus_sql(table, gopher_gate=gopher_gate)}),
cwt AS (SELECT doc_id, text_out AS text FROM cw),
dc AS ({duck_decontaminate_sql("cwt", bench)})
SELECT cw.doc_id, cw.n_pii,
  ('0x' || substr(md5(cw.doc_id::VARCHAR), 1, 8))::BIGINT % {n_shards} AS shard,
  cw.text_out
FROM cw JOIN dc ON cw.doc_id = dc.doc_id
WHERE NOT dc.contaminated
"""


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DUP_NGRAM_N,
) -> DataFrame:
    """Exact duplicated-span REMOVAL (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", at word-``n``-gram
    granularity): a token is dropped when ANY corpus-duplicated n-gram
    (>= 2 occurrences anywhere, within-doc repeats included; matching is
    lowercased, output keeps original case) covers it.  Where
    ``duplicate_ngram_stats`` only measures the coverage, this rewrites the
    corpus.  Output: (doc_id, n_tokens, n_removed, clean_text).

    Scale shape: grams leave the map side as xxhash64 bigints only (same
    collision trade as minhash, noted in duplicate_ngram_stats); the
    duplicated-gram relation is the output of one partial-agg'd count whose
    hash partitioning the start-position join reuses; covered positions
    collapse with a (doc, pos) distinct; the rebuild is one groupBy(doc)
    whose collect_list is bounded by document length — no global sort, no
    Python anywhere."""
    t = F.col(text_col)
    toks = F.when(
        F.length(F.trim(t)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(t), r"\s+"))
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("__t"))
    base = base.localCheckpoint(eager=True)  # grams + tokens + sizes: one pass
    grams_expr = F.when(
        F.size(F.col("__t")) >= n,
        F.expr(
            f"transform(sequence(0, size(__t) - {n}), i -> "
            f"named_struct('i', i, "
            f"'g', xxhash64(lower(array_join(slice(__t, i + 1, {n}), ' ')))))"
        ),
    ).otherwise(F.expr("array()").cast("array<struct<i:int,g:bigint>>"))
    starts = base.select("doc_id", F.explode(grams_expr).alias("z")).select(
        "doc_id", F.col("z.i").alias("i"), F.col("z.g").alias("g")
    )
    dup = starts.groupBy("g").agg(F.count("*").alias("tot")).filter(
        F.col("tot") >= 2
    )
    covered = (
        starts.join(dup.select("g"), on="g")
        .select("doc_id", F.explode(F.expr(f"sequence(i, i + {n - 1})")).alias("pos"))
        .distinct()
    )
    toks_rows = base.select(
        "doc_id", F.posexplode(F.col("__t")).alias("pos", "tok")
    )
    kept = toks_rows.join(covered, on=["doc_id", "pos"], how="left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("__n_kept"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, tok))),"
            " x -> x.tok), ' ')"
        ).alias("__ct"),
    )
    return (
        base.select("doc_id", F.size("__t").cast("long").alias("n_tokens"))
        .join(rebuilt, on="doc_id", how="left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("__n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce("__ct", F.lit("")).alias("clean_text"),
        )
    )


def duck_dedup_spans_sql(table: str, n: int = DUP_NGRAM_N) -> str:
    # gram identity is the lowercased text (no xxhash64 in DuckDB) — counts
    # identical barring a 64-bit collision, same caveat as duck_dup_ngrams_sql
    return rf"""
WITH tk AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []
              ELSE regexp_split_to_array(trim(text), '\s+') END AS t
  FROM {table}
),
g AS (
  SELECT doc_id, i, lower(array_to_string(t[i:i + {n} - 1], ' ')) AS gram
  FROM tk, UNNEST(range(1, len(t) - {n} + 2)) AS r(i)
  WHERE len(t) >= {n}
),
gl AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
cov AS (
  SELECT DISTINCT doc_id, pos
  FROM (SELECT g.doc_id, g.i FROM g JOIN gl USING (gram)),
       UNNEST(range(i, i + {n})) AS c(pos)
),
tok AS (
  SELECT doc_id, i AS pos, t[i] AS tok
  FROM tk, UNNEST(range(1, len(t) + 1)) AS r(i)
),
kept AS (SELECT tok.* FROM tok ANTI JOIN cov USING (doc_id, pos)),
re AS (
  SELECT doc_id, count(*) AS n_kept, string_agg(tok, ' ' ORDER BY pos) AS ct
  FROM kept GROUP BY 1
)
SELECT tk.doc_id, len(tk.t)::BIGINT AS n_tokens,
       (len(tk.t) - coalesce(re.n_kept, 0))::BIGINT AS n_removed,
       coalesce(re.ct, '') AS clean_text
FROM tk LEFT JOIN re USING (doc_id)
"""


# -- unicode / encoding quality gate ------------------------------------------
#
# Mojibake (UTF-8 bytes decoded as Latin-1/cp1252), stray replacement chars,
# and control bytes are the classic symptoms of mis-declared charsets in web
# crawls (ftfy's problem statement; CCNet/RefinedWeb both gate on encoding
# artifacts).  The reference parser trusts the transport decoding
# (parser.py decodes whatever bs4 yields); at Common-Crawl scale a cheap
# post-decode gate is mandatory.  All signals are JVM string/regex ops —
# map-side, shuffle-free, codegen-friendly.

_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"  # control chars minus \t\n\r
# cp1252-mojibake markers: lead bytes of UTF-8 sequences shown as Latin-1
_MOJIBAKE_MARKERS = ("Ã", "Â", "â€")  # 'Ã', 'Â', 'â€'
# non-ASCII budget for the clean flag: sized to the synthetic fixture;
# production pipelines tune this per detected language (a CJK page is all
# non-ASCII and perfectly fine) or drop the ppm term and gate on
# ctrl/replacement/mojibake only.  The plan is threshold-invariant.
MAX_NONASCII_PPM = 5_000


def _count_marker(text: Column, marker: str) -> Column:
    removed = F.length(text) - F.length(F.replace(text, F.lit(marker)))
    return (removed / F.lit(len(marker))).cast("long")


def unicode_quality(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document encoding-quality signals.

    Output: (id, n_chars, n_nonascii, nonascii_ppm, n_ctrl, n_replacement,
    n_mojibake, clean).  clean = no control chars, no U+FFFD, no mojibake
    markers, and non-ASCII density within MAX_NONASCII_PPM.

    Scale shape: pure map over the corpus scan — no exchange, no Python;
    composes with the C4/Gopher gates as one fused projection."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_nonascii = n_chars - F.length(F.regexp_replace(text, _NONASCII_RE, ""))
    n_ctrl = n_chars - F.length(F.regexp_replace(text, _CTRL_RE, ""))
    n_repl = _count_marker(text, "�")
    n_moji = None
    for m in _MOJIBAKE_MARKERS:
        c = _count_marker(text, m)
        n_moji = c if n_moji is None else n_moji + c
    ppm = _ppm(n_nonascii, n_chars)
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_nonascii.cast("long").alias("n_nonascii"),
        ppm.alias("nonascii_ppm"),
        n_ctrl.cast("long").alias("n_ctrl"),
        n_repl.alias("n_replacement"),
        n_moji.cast("long").alias("n_mojibake"),
        (
            (n_ctrl == 0) & (n_repl == 0) & (n_moji == 0)
            & (ppm <= MAX_NONASCII_PPM)
        ).alias("clean"),
    )


def duck_unicode_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    moji = " + ".join(
        f"((len({text_col}) - len(replace({text_col}, '{m}', ''))) / {len(m)})::BIGINT"
        for m in _MOJIBAKE_MARKERS
    )
    return rf"""
WITH s AS (
  SELECT {id_col},
    len({text_col})::BIGINT AS n_chars,
    (len({text_col}) - len(regexp_replace({text_col}, '[^\x00-\x7f]', '', 'g')))::BIGINT AS n_nonascii,
    (len({text_col}) - len(regexp_replace({text_col}, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g')))::BIGINT AS n_ctrl,
    (len({text_col}) - len(replace({text_col}, chr(65533), '')))::BIGINT AS n_replacement,
    ({moji})::BIGINT AS n_mojibake
  FROM {table}
)
SELECT {id_col}, n_chars, n_nonascii,
  floor(n_nonascii::DOUBLE / greatest(n_chars, 1)::DOUBLE * 1e6)::BIGINT AS nonascii_ppm,
  n_ctrl, n_replacement, n_mojibake,
  (n_ctrl = 0 AND n_replacement = 0 AND n_mojibake = 0
   AND floor(n_nonascii::DOUBLE / greatest(n_chars, 1)::DOUBLE * 1e6) <= {MAX_NONASCII_PPM}) AS clean
FROM s
"""


# -- per-host template (boilerplate) mining -------------------------------------
#
# Marker lists (BLACKLIST above) catch KNOWN boilerplate; real sites have
# their own nav/footer templates.  The production method (CCNet, jusText
# "site-level" mode) is frequency-based: a line that appears on most of a
# host's pages is template, whatever it says.  Mining then stripping is two
# co-keyed passes over the line grain — no pairwise page comparison.

TPL_RATIO_PPM = 600_000  # line is template when on >= 60% of the host's pages
TPL_MIN_PAGES = 3        # hosts with fewer pages are never template-mined


def host_template_lines(
    df: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    ratio_ppm: int = TPL_RATIO_PPM,
    min_pages: int = TPL_MIN_PAGES,
) -> DataFrame:
    """(host, line, df_pages, n_pages, ratio_ppm) for mined template lines.

    Scale shape: explode to line grain map-side; ONE exchange for the
    (host, line) page-frequency agg (distinct docs, two-phase); the
    per-host page count is an O(#hosts) agg that broadcasts back.  Group
    size per (host, line) is bounded by the host's page count — web-scale
    skew (a million-page host) is the host's own size, not cross-host."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), "\n"))).alias("line"),
    )
    pages = df.groupBy(F.col(host_col).alias("host")).agg(
        F.countDistinct(id_col).cast("long").alias("n_pages")
    )
    freq = lines.groupBy("host", "line").agg(
        F.countDistinct("doc_id").cast("long").alias("df_pages")
    )
    return (
        freq.join(F.broadcast(pages), "host")
        .withColumn(
            "ratio_ppm",
            F.floor(F.col("df_pages") * F.lit(1_000_000) / F.col("n_pages")).cast(
                "long"
            ),
        )
        .where(
            (F.col("n_pages") >= min_pages) & (F.col("ratio_ppm") >= ratio_ppm)
        )
    )


def strip_host_templates(
    df: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    ratio_ppm: int = TPL_RATIO_PPM,
    min_pages: int = TPL_MIN_PAGES,
) -> DataFrame:
    """Strip mined per-host template lines from every page.

    Output: (doc_id, host, n_lines, n_dropped, text_clean) with line order
    preserved.  The strip is a left-anti join of the (host, doc, pos,
    line) grain against the mined template table on (host, line) — both
    sides keyed the same way, so the exchange is shared — then one
    per-document reassembly agg ordered by the original position."""
    tpl = host_template_lines(
        df, host_col, id_col, text_col, ratio_ppm, min_pages
    ).select("host", "line")
    grain = df.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    kept = grain.join(tpl, ["host", "line"], "left_anti")
    counts = grain.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.first("host").alias("host"),
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_clean"),
    )
    return counts.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "host",
        "n_lines",
        (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_dropped"),
        F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
    )


def duck_strip_templates_sql(
    table: str,
    ratio_ppm: int = TPL_RATIO_PPM,
    min_pages: int = TPL_MIN_PAGES,
) -> str:
    return rf"""
WITH split_t AS (
  SELECT host, doc_id, string_split(text, chr(10)) AS lines FROM {table}
),
grain AS (
  SELECT host, doc_id, u.i - 1 AS pos, lines[u.i] AS line
  FROM split_t, UNNEST(range(1, len(lines) + 1)) AS u(i)
),
pages AS (SELECT host, count(DISTINCT doc_id)::BIGINT AS n_pages FROM {table} GROUP BY 1),
freq AS (
  SELECT host, line, count(DISTINCT doc_id)::BIGINT AS df_pages
  FROM grain GROUP BY 1, 2
),
tpl AS (
  SELECT f.host, f.line
  FROM freq f JOIN pages p USING (host)
  WHERE p.n_pages >= {min_pages}
    AND floor(f.df_pages * 1000000 / p.n_pages) >= {ratio_ppm}
),
kept AS (
  SELECT g.* FROM grain g ANTI JOIN tpl t ON g.host = t.host AND g.line = t.line
),
counts AS (
  SELECT doc_id, max(host) AS host, count(*)::BIGINT AS n_lines
  FROM grain GROUP BY 1
),
rebuilt AS (
  SELECT doc_id, count(*)::BIGINT AS n_kept,
         string_agg(line, chr(10) ORDER BY pos) AS text_clean
  FROM kept GROUP BY 1
)
SELECT c.doc_id, c.host, c.n_lines,
       (c.n_lines - coalesce(r.n_kept, 0))::BIGINT AS n_dropped,
       coalesce(r.text_clean, '') AS text_clean
FROM counts c LEFT JOIN rebuilt r USING (doc_id)
"""


# -- code/math content detection -----------------------------------------------
#
# The StarCoder/DCLM routing gate: pretraining mixes route code-shaped
# pages to a different pipeline (or drop them from the prose corpus).
# Pure structural signals — symbol density, indented-line share, brace
# balance — no language model needed; all integer ppm for cross-engine
# exactness.

CODE_SYMBOLS_RE = r"[{}();=<>\[\]]"
CODE_INDENT_RE = r"^(    |\t)"
CODE_MIN_SYMBOL_PPM = 40_000   # symbols per char
CODE_MIN_INDENT_PPM = 300_000  # indented lines per line


def code_detect(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, symbol_ppm, indent_line_ppm, is_code): code-shaped iff
    symbol density AND indented-line share both clear their floors.
    Zero-exchange JVM projection."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t)
    n_sym = F.size(F.regexp_extract_all(t, F.lit(CODE_SYMBOLS_RE), F.lit(0)))
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    n_indent = F.size(F.filter(lines, lambda l: l.rlike(CODE_INDENT_RE)))
    sym_ppm = F.when(n_chars > 0, (n_sym.cast("long") * 1_000_000) / n_chars).otherwise(0).cast("long")
    ind_ppm = F.when(n_lines > 0, (n_indent.cast("long") * 1_000_000) / n_lines).otherwise(0).cast("long")
    return df.select(
        F.col(id_col).alias("doc_id"),
        sym_ppm.alias("symbol_ppm"),
        ind_ppm.alias("indent_line_ppm"),
        ((sym_ppm >= CODE_MIN_SYMBOL_PPM) & (ind_ppm >= CODE_MIN_INDENT_PPM)).alias("is_code"),
    )


def duck_code_detect_sql(table: str) -> str:
    sym = r"len(regexp_extract_all(t, '[{}();=<>\[\]]'))"
    return rf"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS t FROM {table}
),
m AS (
  SELECT doc_id,
         CASE WHEN len(t) > 0
              THEN ({sym}::BIGINT * 1000000) // len(t) ELSE 0 END AS symbol_ppm,
         CASE WHEN len(string_split(t, chr(10))) > 0
              THEN (len(list_filter(string_split(t, chr(10)),
                                    l -> regexp_matches(l, '^(    |\t)')))::BIGINT
                    * 1000000) // len(string_split(t, chr(10)))
              ELSE 0 END AS indent_line_ppm
  FROM base
)
SELECT doc_id, symbol_ppm, indent_line_ppm,
       (symbol_ppm >= {CODE_MIN_SYMBOL_PPM} AND indent_line_ppm >= {CODE_MIN_INDENT_PPM}) AS is_code
FROM m
"""


# -- fixed-window token chunking -----------------------------------------------
#
# The context-window prep step every pretraining/RAG pipeline runs:
# documents split into fixed token windows with overlap, short tails
# kept.  Chunk boundaries are pure arithmetic over the token array, so
# the whole op is explode-free of shuffles: one projection computes the
# chunk starts, one posexplode emits the windows.

CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16


def chunk_docs(
    df: DataFrame,
    size: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk): whitespace tokens windowed at
    ``size`` with ``overlap`` carried between neighbors (stride =
    size - overlap); the final short tail is kept; empty docs emit
    nothing.  Map-side only — no exchange, no Python."""
    assert overlap < size
    stride = size - overlap
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"), lambda x: x != ""
    )
    n = F.size(toks)
    # chunk starts: 0, stride, 2*stride, ... while start < n
    n_chunks = F.when(n > 0, ((n - 1) / stride).cast("int") + 1).otherwise(0)
    starts = F.transform(F.sequence(F.lit(0), n_chunks - 1), lambda i: i * stride)
    chunks = F.filter(
        F.transform(starts, lambda s: F.slice(toks, s + 1, size)),
        lambda c: F.size(c) > 0,
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), chunks.alias("__c"))
        .select("doc_id", F.posexplode("__c").alias("chunk_idx", "__t"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size("__t").cast("long").alias("n_tokens"),
            F.array_join("__t", " ").alias("chunk"),
        )
    )


def duck_chunk_sql(table: str, size: int = CHUNK_TOKENS, overlap: int = CHUNK_OVERLAP) -> str:
    stride = size - overlap
    return rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(coalesce(text, ''), '\s+'), x -> x <> '') AS ts
  FROM {table}
),
chunks AS (
  SELECT doc_id, i AS chunk_idx, ts[1 + i * {stride} : i * {stride} + {size}] AS c
  FROM toks, LATERAL unnest(range(0, CASE WHEN len(ts) > 0
                                          THEN (len(ts) - 1) // {stride} + 1
                                          ELSE 0 END)) AS t(i)
)
SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
       len(c)::BIGINT AS n_tokens,
       array_to_string(c, ' ') AS chunk
FROM chunks
WHERE len(c) > 0
"""


# --- soft-404 detection (error pages served with 200) --------------------------
#
# Real sites answer missing pages with a styled "not found" page and HTTP
# 200; a crawler that trusts status codes fills the corpus and the frontier
# with them (Bar-Yossef et al., WWW'04).  Content-side detection: an error-
# phrase marker AND a body much thinner than the host's typical page.  The
# host norm is an integer floor-mean (medians need per-host sorts; the mean
# is one partial-agg'd exchange and is robust enough once the marker gates).

_SOFT404_MARKER_RE = (
    r"(?i)(page not found|does not exist|no longer available|\b404\b)"
)


def soft404_flags(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """(url, has_marker, n_tokens, host_mean_tokens, soft404) — soft404 is
    has_marker AND 2*n_tokens < host_mean_tokens.  One zero-Python map over
    the scan (tag-strip + token count + marker regex), one O(hosts)
    partial-agg'd exchange, broadcast join back."""
    txt = F.regexp_replace(F.col(html_col).cast("string"), "<[^>]*>", " ")
    toks = F.when(F.length(F.trim(txt)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(txt), r"\s+"))
    )
    flags = df.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        txt.rlike(_SOFT404_MARKER_RE).alias("has_marker"),
        toks.cast("long").alias("n_tokens"),
    )
    means = flags.groupBy("host").agg(
        F.expr("sum(n_tokens) DIV count(1)").alias("host_mean_tokens")
    )
    return flags.join(F.broadcast(means), on="host").select(
        "url",
        "has_marker",
        "n_tokens",
        F.col("host_mean_tokens").cast("long").alias("host_mean_tokens"),
        (F.col("has_marker") & (F.col("n_tokens") * 2 < F.col("host_mean_tokens"))).alias(
            "soft404"
        ),
    )


def duck_soft404_sql(table: str) -> str:
    """DuckDB twin of :func:`soft404_flags`."""
    return rf"""
WITH t AS MATERIALIZED (
  SELECT url, host,
         regexp_matches(txt, '{_SOFT404_MARKER_RE}') AS has_marker,
         (CASE WHEN trim(txt) = '' THEN 0
               ELSE len(regexp_split_to_array(trim(txt), '\s+')) END)::BIGINT AS n_tokens
  FROM (SELECT url, host, regexp_replace(html, '<[^>]*>', ' ', 'g') AS txt
        FROM {table})
),
m AS (SELECT host, sum(n_tokens) // count(*) AS host_mean_tokens FROM t GROUP BY 1)
SELECT t.url, t.has_marker, t.n_tokens, m.host_mean_tokens::BIGINT AS host_mean_tokens,
       (t.has_marker AND 2 * t.n_tokens < m.host_mean_tokens) AS soft404
FROM t JOIN m USING (host)
"""


# --- character-diversity gate (gibberish / binary-junk detection) --------------


def char_diversity(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_chars, n_distinct_chars, collision_ppm, top_char_ppm):
    codepoint-grain diversity.  collision_ppm is the exact collision
    probability sum c*(c-1) / (n*(n-1)) in integer ppm — the Renyi-2 /
    Simpson surrogate for character entropy: monotone in it but an exact
    rational, so it hash-matches across engines where float log-entropy
    cannot (the module's no-libm doctrine).  Low-entropy junk ("aaaa...",
    one-char padding, null-byte runs) scores high; natural prose sits low;
    top_char_ppm catches single-char domination directly.

    Scale shape: the char explode is map-side; the only exchange is the
    (doc_id, ch) partial agg (<= charset-size rows per doc after map-side
    combine), and the doc-grain rollup rides the same keying.  Overflow
    bound: n*(n-1)*1e6 < 2^63 needs n < ~3e6 chars/doc — shard longer docs
    first (web text is ~10^3-10^5).  Spark's split(text, '') and DuckDB's
    regexp_extract_all('(?s).') agree per codepoint over the BMP (parity
    probed; neither emits boundary empties)."""
    chars = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), "")).alias("ch"),
    ).where(F.col("ch") != "")  # split("", "") -> [""]; no other input emits ""
    agg = (
        chars.groupBy("doc_id", "ch")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_chars"),
            F.count("*").cast("long").alias("n_distinct_chars"),
            F.sum(F.expr("c * (c - 1)")).alias("coll"),
            F.max("c").alias("top"),
        )
        .select(
            "doc_id",
            "n_chars",
            "n_distinct_chars",
            F.expr("coll * 1000000 DIV greatest(n_chars * (n_chars - 1), 1)")
            .cast("long")
            .alias("collision_ppm"),
            F.expr("top * 1000000 DIV n_chars").cast("long").alias("top_char_ppm"),
        )
    )
    ids = df.select(F.col(id_col).alias("doc_id"))
    return ids.join(agg, on="doc_id", how="left").select(
        "doc_id",
        F.coalesce("n_chars", F.lit(0)).cast("long").alias("n_chars"),
        F.coalesce("n_distinct_chars", F.lit(0)).cast("long").alias(
            "n_distinct_chars"
        ),
        F.coalesce("collision_ppm", F.lit(0)).cast("long").alias("collision_ppm"),
        F.coalesce("top_char_ppm", F.lit(0)).cast("long").alias("top_char_ppm"),
    )


def duck_char_diversity_sql(table: str) -> str:
    return rf"""
WITH ch AS (
  SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''), '(?s).')) AS ch
  FROM {table}
),
per AS (SELECT doc_id, ch, count(*)::BIGINT AS c FROM ch GROUP BY 1, 2),
agg AS (
  SELECT doc_id, sum(c)::BIGINT AS n_chars,
         count(*)::BIGINT AS n_distinct_chars,
         sum(c * (c - 1))::BIGINT AS coll, max(c)::BIGINT AS top
  FROM per GROUP BY 1
)
SELECT d.doc_id,
  coalesce(a.n_chars, 0)::BIGINT AS n_chars,
  coalesce(a.n_distinct_chars, 0)::BIGINT AS n_distinct_chars,
  coalesce(a.coll * 1000000 // greatest(a.n_chars * (a.n_chars - 1), 1), 0)::BIGINT
    AS collision_ppm,
  coalesce(a.top * 1000000 // a.n_chars, 0)::BIGINT AS top_char_ppm
FROM {table} d LEFT JOIN agg a USING (doc_id)
"""


# --- host language mix (curation / geo-routing signal) -------------------------


def host_lang_mix(df: DataFrame, url_col: str = "url", lang_col: str = "lang") -> DataFrame:
    """(host, n_pages, n_langs, top_lang, top_lang_ppm, lang_collision_ppm)
    — per-host language concentration over the pages scan.  Mixed-language
    hosts are a known low-quality signal (scraped/aggregator sites), and
    the dominant language routes the host to the right language pipeline;
    collision ppm is the same exact Renyi-2 surrogate as char_diversity,
    at (host, lang) grain.  top_lang ties break to the lexicographically
    smallest language via min(struct(-cnt, lang)) — order-free and
    hash-stable cross-engine.

    Scale shape: one (host, lang) partial agg (bounded by hosts x
    languages), then a host-grain rollup riding the same keying; the url
    -> host parse is the map-side regex the host graph uses."""
    host = F.lower(
        F.regexp_extract(F.col(url_col), r"(?i)^https?://([^/:?#]+)", 1)
    )
    per = (
        df.select(host.alias("host"), F.coalesce(F.col(lang_col), F.lit("und")).alias("lang"))
        .filter(F.col("host") != "")
        .groupBy("host", "lang")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return (
        per.groupBy("host")
        .agg(
            F.sum("cnt").cast("long").alias("n_pages"),
            F.count("*").cast("long").alias("n_langs"),
            F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("lang").alias("lg"))).alias("m"),
            F.sum(F.expr("cnt * (cnt - 1)")).alias("coll"),
        )
        .select(
            "host",
            "n_pages",
            "n_langs",
            F.col("m.lg").alias("top_lang"),
            F.expr("(-m.nc) * 1000000 DIV n_pages").cast("long").alias("top_lang_ppm"),
            F.expr("coll * 1000000 DIV greatest(n_pages * (n_pages - 1), 1)")
            .cast("long")
            .alias("lang_collision_ppm"),
        )
    )


def duck_host_lang_mix_sql(pages: str) -> str:
    return rf"""
WITH per AS (
  SELECT lower(coalesce(regexp_extract(url, '(?i)^https?://([^/:?#]+)', 1), ''))
           AS host,
         coalesce(lang, 'und') AS lang, count(*)::BIGINT AS cnt
  FROM {pages}
  GROUP BY 1, 2
),
rk AS (
  SELECT host, lang, cnt,
         row_number() OVER (PARTITION BY host ORDER BY cnt DESC, lang ASC) AS rn
  FROM per WHERE host <> ''
)
SELECT host,
  sum(cnt)::BIGINT AS n_pages,
  count(*)::BIGINT AS n_langs,
  max(CASE WHEN rn = 1 THEN lang END) AS top_lang,
  (max(CASE WHEN rn = 1 THEN cnt END) * 1000000 // sum(cnt))::BIGINT
    AS top_lang_ppm,
  (sum(cnt * (cnt - 1)) * 1000000
     // greatest(sum(cnt) * (sum(cnt) - 1), 1))::BIGINT AS lang_collision_ppm
FROM rk GROUP BY host
"""


# --- cross-host syndication detection -------------------------------------------

SYND_MIN_HOSTS = 3


def syndicated_lines(
    df: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_hosts: int = SYND_MIN_HOSTS,
) -> DataFrame:
    """(line, n_hosts, n_docs) for every line appearing on >= ``min_hosts``
    DISTINCT hosts — wire-syndicated content (press releases, share
    widgets, legal boilerplate) that per-host template mining
    (host_template_lines) structurally cannot see: a line on 2% of each
    of 500 hosts' pages never clears any within-host ratio, yet it is
    pure duplication corpus-wide.  News/corpus dedup strips or
    down-weights these before training.

    Scale shape: line explode is map-side (array_distinct keeps a doc
    from voting twice); ONE (line) partial-agg exchange carrying exact
    two-level distincts (host, doc) — at 100 TB the line relation is
    bounded by distinct line text, and partial aggregation collapses the
    per-partition repeats before the shuffle."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), "\n"))).alias("line"),
    ).where(F.trim(F.col("line")) != "")
    return (
        lines.groupBy("line")
        .agg(
            F.countDistinct("host").cast("long").alias("n_hosts"),
            F.countDistinct("host", "doc_id").cast("long").alias("n_docs"),
        )
        .where(F.col("n_hosts") >= min_hosts)
    )


def duck_syndicated_lines_sql(hostdocs: str, min_hosts: int = SYND_MIN_HOSTS) -> str:
    return rf"""
WITH l AS (
  SELECT host, doc_id,
         unnest(list_distinct(string_split(text, chr(10)))) AS line
  FROM {hostdocs}
)
SELECT line, count(DISTINCT host)::BIGINT AS n_hosts,
       count(DISTINCT (host, doc_id))::BIGINT AS n_docs
FROM l WHERE trim(line) <> ''
GROUP BY line HAVING count(DISTINCT host) >= {min_hosts}
"""


# --- corpus distribution drift (snapshot-over-snapshot monitoring) ------------
#
# Data-drift monitoring for a standing ingestion pipeline: compare the
# unigram distributions of two crawl snapshots and surface (a) the
# total-variation distance and (b) the terms that moved most.  TV distance
# is the drift metric of choice here because — unlike KL — it needs no
# logarithm, so the whole computation stays in exact BIGINT ppm arithmetic
# (bit-identical across engines): share_ppm = tf * 1e6 DIV corpus_tokens,
# tv_ppm = sum(|share_a - share_b|) DIV 2.  A spike in tv_ppm between
# snapshots is the canonical "the crawl scope / spam mix changed" alarm
# before the data reaches training.
#
# Scale shape: each corpus collapses to its term-frequency relation with
# map-side partial aggregation (vocab-sized, not corpus-sized); the
# full-outer term join and the delta arithmetic run at vocab grain; the
# scalar TV re-enters as a broadcast of one row; top-k collapses to
# TakeOrderedAndProject.

DRIFT_TOPK = 50


def corpus_drift(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    k: int = DRIFT_TOPK,
) -> DataFrame:
    """(term, share_a_ppm, share_b_ppm, delta_ppm, tv_ppm, rnk): the top-k
    most-drifted terms between corpora ``a`` and ``b``, every row carrying
    the corpus-level total-variation distance; ties broken by term."""
    from pyspark.sql import Window

    def freqs(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.explode(
                    F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
                ).alias("term")
            )
            .filter(F.col("term") != "")
            .groupBy("term")
            .agg(F.count("*").cast("long").alias("tf"))
        )
    # materialize each vocab-grain freq table once: the totals action below
    # and the drift join would otherwise re-run the corpus tokenize+agg
    fa = freqs(a).localCheckpoint(eager=True)
    fb = freqs(b).localCheckpoint(eager=True)
    # corpus totals from the SMALL freq tables (no second token pass)
    ta = fa.agg(F.sum("tf").alias("t")).first()[0] or 0
    tb = fb.agg(F.sum("tf").alias("t")).first()[0] or 0
    if ta == 0 or tb == 0:
        return a.sparkSession.createDataFrame(
            [],
            "term string, share_a_ppm long, share_b_ppm long,"
            " delta_ppm long, tv_ppm long, rnk long",
        )
    joined = (
        fa.withColumnRenamed("tf", "tf_a")
        .join(fb.withColumnRenamed("tf", "tf_b"), on="term", how="full_outer")
        .select(
            "term",
            F.expr(f"coalesce(tf_a, 0L) * 1000000L DIV {ta}L").alias(
                "share_a_ppm"
            ),
            F.expr(f"coalesce(tf_b, 0L) * 1000000L DIV {tb}L").alias(
                "share_b_ppm"
            ),
        )
        .withColumn(
            "delta_ppm", F.abs(F.col("share_a_ppm") - F.col("share_b_ppm"))
        )
    )
    tv = joined.agg(
        F.expr("sum(delta_ppm) DIV 2").cast("long").alias("tv_ppm")
    )
    top = (
        joined.crossJoin(F.broadcast(tv))
        .orderBy(F.desc("delta_ppm"), F.asc("term"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("delta_ppm"), F.asc("term"))
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


def duck_corpus_drift_sql(
    table_a: str, table_b: str, text_col: str = "text", k: int = DRIFT_TOPK
) -> str:
    """DuckDB twin of :func:`corpus_drift`."""
    def freq(t: str) -> str:
        return (
            f"SELECT x.term, count(*)::BIGINT AS tf FROM {t}, "
            f"UNNEST(regexp_split_to_array(lower({text_col}), '[^a-z0-9]+'))"
            f" AS x(term) WHERE x.term <> '' GROUP BY 1"
        )
    return rf"""
WITH fa AS ({freq(table_a)}),
fb AS ({freq(table_b)}),
ta AS (SELECT sum(tf)::BIGINT AS t FROM fa),
tb AS (SELECT sum(tf)::BIGINT AS t FROM fb),
j AS (
  SELECT coalesce(fa.term, fb.term) AS term,
         coalesce(fa.tf, 0) * 1000000 // (SELECT t FROM ta) AS share_a_ppm,
         coalesce(fb.tf, 0) * 1000000 // (SELECT t FROM tb) AS share_b_ppm
  FROM fa FULL OUTER JOIN fb ON fa.term = fb.term
),
d AS (
  SELECT term, share_a_ppm::BIGINT AS share_a_ppm,
         share_b_ppm::BIGINT AS share_b_ppm,
         abs(share_a_ppm - share_b_ppm)::BIGINT AS delta_ppm
  FROM j
),
tv AS (SELECT (sum(delta_ppm) // 2)::BIGINT AS tv_ppm FROM d)
SELECT term, share_a_ppm, share_b_ppm, delta_ppm,
       (SELECT tv_ppm FROM tv) AS tv_ppm,
       row_number() OVER (ORDER BY delta_ppm DESC, term ASC)::BIGINT AS rnk
FROM d
ORDER BY delta_ppm DESC, term ASC
LIMIT {k}
"""


# --- compression-ratio quality signal (repetition catch-all) ------------------
#
# The deflate-ratio heuristic web-corpus pipelines run next to the Gopher
# gates (and WARC tooling reports natively): machine-generated spam,
# keyword stuffing and template dumps compress far better than natural
# prose, so a LOW compressed/raw ratio is a repetition catch-all that
# n-gram rules miss (long-period repeats, interleaved templates).  Python
# is unavoidable (no JVM-side zlib expression), so this is an honest
# Arrow-batched pandas UDF — one vectorized pass, no exchange; the graded
# oracle is an independently-computed row-at-a-time golden parquet (the
# winnow pattern), byte-deterministic because zlib at a fixed level is.

COMPRESS_LEVEL = 6


def compression_signal(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_bytes, n_compressed, ratio_ppm) per document with
    non-empty UTF-8 text; ratio_ppm = compressed * 1e6 DIV raw."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _clen(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), COMPRESS_LEVEL))
            if isinstance(t, str)
            else None
        )

    out = df.select(
        F.col(id_col).alias("doc_id"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        _clen(F.col(text_col)).alias("n_compressed"),
    ).where(F.col("n_bytes") >= 1)
    return out.withColumn(
        "ratio_ppm", F.expr("n_compressed * 1000000L DIV n_bytes")
    )


# --- content-defined chunking (FastCDC/gear) for archive storage dedup -------
#
# Web archives store the same page bytes over and over (recrawls, mirrors,
# boilerplate); chunk-level dedup — split content at CONTENT-defined
# boundaries and store each distinct chunk once — is how storage systems
# (LBFS, Venti, FastCDC'16, and WARC dedup backends) turn that redundancy
# into capacity.  Fixed-size blocks break on the first inserted byte;
# gear-hash boundaries survive shifts, so recrawled pages share most chunks
# with their previous capture.
#
# Determinism contract: the gear table derives from md5 (no RNG), the hash
# is exact uint64 shift-register arithmetic, and chunk ids are md5 of the
# chunk bytes — the whole relation is bit-stable across engines/partitions.
# The oracle is an independent naive shift-register golden.
#
# Scale/vectorization: h_i = (2*h_{i-1} + GEAR[b_i]) mod 2^64 telescopes to
# a 64-byte sliding dot product with kernel [2^63..2^0] (older terms vanish
# mod 2^64), so candidate boundaries come from ONE numpy windowed multiply
# with natural uint64 wraparound — no per-byte Python.  Only the sparse
# candidate list (avg one per 2^CDC_MASK_BITS bytes) is walked sequentially
# to enforce min/max chunk bounds.  Documents are independent, so the pass
# is an embarrassingly parallel Arrow-batched map, same shape as the
# compression signal.

CDC_MIN = 32
CDC_MAX = 256
CDC_MASK_BITS = 6  # boundary prob 1/64 -> ~96-byte average chunks


def _gear_table():
    import hashlib

    import numpy as np

    return np.array(
        [
            int(hashlib.md5(bytes([b])).hexdigest()[:16], 16)
            for b in range(256)
        ],
        dtype=np.uint64,
    )


def _cdc_cuts(data: bytes, min_len: int, max_len: int, mask: int, gear) -> list:
    """Chunk end offsets (exclusive) for one byte string — vectorized gear
    hash + sparse candidate walk."""
    import numpy as np

    n = len(data)
    if n == 0:
        return []
    g = gear[np.frombuffer(data, dtype=np.uint8)]
    pad = np.zeros(63, dtype=np.uint64)
    gp = np.concatenate([pad, g])
    win = np.lib.stride_tricks.sliding_window_view(gp, 64)
    kernel = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))
    with np.errstate(over="ignore"):
        h = (win * kernel).sum(axis=1, dtype=np.uint64)
    cand = np.nonzero((h & np.uint64(mask)) == 0)[0]
    cuts, start = [], 0
    while start < n:
        end = min(start + max_len, n)
        ci = int(np.searchsorted(cand, start + min_len - 1))
        cut = int(cand[ci]) + 1 if ci < len(cand) and cand[ci] < end else end
        cuts.append(cut)
        start = cut
    return cuts


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = CDC_MIN,
    max_len: int = CDC_MAX,
    mask_bits: int = CDC_MASK_BITS,
) -> DataFrame:
    """(doc_id, chunk_idx, start_off, n_bytes, chunk_hash) — gear-hash
    content-defined chunks of each document's UTF-8 bytes; chunk_hash is
    md5 hex of the chunk bytes."""
    import hashlib

    mask = (1 << mask_bits) - 1

    def _chunk_batches(it):
        gear = _gear_table()
        for pdf in it:
            ids, idxs, offs, lens, hashes = [], [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8") if isinstance(text, str) else b""
                start = 0
                for i, end in enumerate(
                    _cdc_cuts(data, min_len, max_len, mask, gear)
                ):
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(start)
                    lens.append(end - start)
                    hashes.append(hashlib.md5(data[start:end]).hexdigest())
                    start = end
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int64"),
                    "start_off": pd.Series(offs, dtype="int64"),
                    "n_bytes": pd.Series(lens, dtype="int64"),
                    "chunk_hash": pd.Series(hashes, dtype="object"),
                }
            )

    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    return src.mapInPandas(
        _chunk_batches,
        "doc_id long, chunk_idx long, start_off long, n_bytes long,"
        " chunk_hash string",
    )


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """(n_docs, n_chunks, n_distinct_chunks, total_bytes, unique_bytes,
    saved_ppm) — corpus storage-dedup summary.  unique_bytes counts each
    distinct chunk once; one partial-agg'd exchange on chunk_hash (the
    chunk relation is far smaller than the corpus), then a scalar agg."""
    per_hash = chunks.groupBy("chunk_hash").agg(
        F.count("*").cast("long").alias("n_copies"),
        F.min("n_bytes").cast("long").alias("c_bytes"),
        F.sum("n_bytes").cast("long").alias("t_bytes"),
    )
    docs = chunks.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    return (
        per_hash.agg(
            F.sum("n_copies").cast("long").alias("n_chunks"),
            F.count("*").cast("long").alias("n_distinct_chunks"),
            F.sum("t_bytes").cast("long").alias("total_bytes"),
            F.sum("c_bytes").cast("long").alias("unique_bytes"),
        )
        .crossJoin(F.broadcast(docs))
        .select(
            "n_docs",
            "n_chunks",
            "n_distinct_chunks",
            "total_bytes",
            "unique_bytes",
            F.expr(
                "(total_bytes - unique_bytes) * 1000000"
                " DIV greatest(total_bytes, 1L)"
            )
            .cast("long")
            .alias("saved_ppm"),
        )
    )


def naive_cdc_chunks(doc_id: int, text: str, min_len: int = CDC_MIN,
                     max_len: int = CDC_MAX,
                     mask_bits: int = CDC_MASK_BITS) -> list:
    """Independent golden: per-byte shift-register gear hash, no numpy.
    Returns (doc_id, chunk_idx, start_off, n_bytes, chunk_hash) tuples."""
    import hashlib

    gear = [
        int(hashlib.md5(bytes([b])).hexdigest()[:16], 16) for b in range(256)
    ]
    data = text.encode("utf-8") if isinstance(text, str) else b""
    mask = (1 << mask_bits) - 1
    out, start, idx = [], 0, 0
    while start < len(data):
        h = 0
        end = min(start + max_len, len(data))
        cut = end
        # the register carries history from before the chunk start, exactly
        # like the vectorized sliding window does
        first = min(start + min_len - 1, end)
        for i in range(max(0, first - 63), first):
            h = ((h << 1) + gear[data[i]]) & 0xFFFFFFFFFFFFFFFF
        for i in range(first, end):
            h = ((h << 1) + gear[data[i]]) & 0xFFFFFFFFFFFFFFFF
            if (h & mask) == 0:
                cut = i + 1
                break
        out.append(
            (
                doc_id,
                idx,
                start,
                cut - start,
                hashlib.md5(data[start:cut]).hexdigest(),
            )
        )
        start, idx = cut, idx + 1
    return out
