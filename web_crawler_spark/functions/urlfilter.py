"""URL-level quality gate for crawl-corpus curation (C4 / CCNet / RefinedWeb
style): before fetching or keeping a page, cheap URL-only signals prune
assets, tracking spam, over-long URLs, and blocklisted sites.

The reference crawler fetches whatever the frontier holds (crawler.py applies
no URL-content policy beyond scheme checks); a training-data crawl at
Common-Crawl scale cannot afford that — URL gating is the cheapest filter in
the whole pipeline because it runs BEFORE the fetch.  Everything here is
JVM-side regex/string ops (whole-stage codegen, zero shuffle, zero Python):
the gate is a pure map over the frontier scan, so it composes with the
scheduler plan without adding an exchange.

Regexes stay in the Java-regex ∩ RE2 common subset so the DuckDB oracles are
byte-identical (same rule as functions/webtext.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# non-text asset extensions (C4 keeps only pages that can contain prose)
MEDIA_EXTS = (
    "jpg", "jpeg", "png", "gif", "css", "js", "pdf", "mp4",
    "zip", "ico", "svg", "woff",
)
# substring blocklist over the lowercased URL (placeholder list; production
# swaps in the UT1/C4 badwords set — the plan shape is identical)
BLOCKLIST = ("casino", "gambling", "adultsite")
MAX_URL_LEN = 180
MAX_QUERY_PARAMS = 3

# extension = trailing .token of the path, i.e. before ?/# and after the last
# '.' in the last path segment; compound unknown extensions (.tar.gz) take
# the final token only
_EXT_RE = r"\.([A-Za-z0-9]{1,5})(?:[?#]|$)"


def url_quality_gate(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-URL gate flags.  Output: (url_id?, url, ext, n_params, ext_ok,
    params_ok, len_ok, block_ok, keep) — keep = every signal passes.

    Scale shape: single map-side projection over the URL scan; no exchange,
    no Python.  At 10^10 frontier URLs this is the cheapest stage in the
    plan and prunes fetch work by construction."""
    url = F.col(url_col)
    low = F.lower(url)
    ext = F.lower(F.regexp_extract(url, _EXT_RE, 1))
    # everything after the FIRST '?' (matches the oracle's substring/instr)
    query = F.when(
        F.instr(url, "?") > 0,
        F.expr(f"substring({url_col}, instr({url_col}, '?') + 1)"),
    ).otherwise(F.lit(""))
    n_params = F.when(
        F.length(query) == 0, F.lit(0)
    ).otherwise(F.size(F.split(query, "&")))
    block_hit = F.lit(False)
    for word in BLOCKLIST:
        block_hit = block_hit | F.contains(low, F.lit(word))
    keep_cols = [F.col(c) for c in df.columns]
    ext_ok = ~ext.isin(*MEDIA_EXTS)
    params_ok = n_params <= MAX_QUERY_PARAMS
    len_ok = F.length(url) <= MAX_URL_LEN
    block_ok = ~block_hit
    return df.select(
        *keep_cols,
        ext.alias("ext"),
        n_params.cast("long").alias("n_params"),
        ext_ok.alias("ext_ok"),
        params_ok.alias("params_ok"),
        len_ok.alias("len_ok"),
        block_ok.alias("block_ok"),
        (ext_ok & params_ok & len_ok & block_ok).alias("keep"),
    )


def duck_url_gate_sql(table: str, url_col: str = "url") -> str:
    exts = ", ".join(f"'{e}'" for e in MEDIA_EXTS)
    block = " OR ".join(
        f"contains(lower({url_col}), '{w}')" for w in BLOCKLIST
    )
    return rf"""
WITH g AS (
  SELECT *,
    lower(coalesce(regexp_extract({url_col}, '\.([A-Za-z0-9]{{1,5}})([?#]|$)', 1), '')) AS ext,
    CASE WHEN instr({url_col}, '?') > 0
              AND len(substring({url_col}, instr({url_col}, '?') + 1)) > 0
         THEN len(string_split(substring({url_col}, instr({url_col}, '?') + 1), '&'))
         ELSE 0 END::BIGINT AS n_params,
    ({block}) AS block_hit
  FROM {table}
)
SELECT * EXCLUDE (ext, n_params, block_hit),
  ext, n_params,
  ext NOT IN ({exts}) AS ext_ok,
  n_params <= {MAX_QUERY_PARAMS} AS params_ok,
  len({url_col}) <= {MAX_URL_LEN} AS len_ok,
  NOT block_hit AS block_ok,
  (ext NOT IN ({exts}) AND n_params <= {MAX_QUERY_PARAMS}
   AND len({url_col}) <= {MAX_URL_LEN} AND NOT block_hit) AS keep
FROM g
"""
