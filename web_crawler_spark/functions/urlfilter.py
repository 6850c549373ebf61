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

from pyspark.sql import Column, DataFrame, functions as F

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


# -- crawl-trap detection -----------------------------------------------------
#
# Calendar pages, session-id links, and faceted-search grids generate
# unbounded URL spaces that a frontier will chase forever (the reference
# crawler has no defense beyond max_urls, crawler.py's global cap).  The
# standard production heuristic (Heritrix "path-ology", IRLbot spam/trap
# control) collapses each URL to a structural template and flags templates
# whose *distinct-URL* population explodes within one host.

# template normalization: query values -> 'V', long hex runs -> 'H',
# digit runs -> 'N'; order matters and is mirrored in the oracle
_TRAP_AUTHORITY_RE = r"^[A-Za-z]+://([^/?#]+)"
_TRAP_VALUE_RE = r"=[^&#]*"
_TRAP_HEX_RE = r"[0-9a-f]{8,}"
_TRAP_NUM_RE = r"[0-9]+"
# distinct URLs one (host, template) must reach to be called a trap.  4 is
# sized to the synthetic fixture; production crawls use O(10^3) — the plan
# is threshold-invariant.
TRAP_MIN_URLS = 4


def url_template(url):  # Column -> Column
    """Structural template of a URL's path+query (host excluded)."""
    path = F.regexp_replace(url, _TRAP_AUTHORITY_RE, "")
    t = F.lower(path)
    t = F.regexp_replace(t, _TRAP_VALUE_RE, "=V")
    t = F.regexp_replace(t, _TRAP_HEX_RE, "H")
    return F.regexp_replace(t, _TRAP_NUM_RE, "N")


def url_trap_templates(
    df: DataFrame, url_col: str = "url", min_urls: int = TRAP_MIN_URLS
) -> DataFrame:
    """Per-(host, template) distinct-URL counts with a trap flag.

    Output: (host, template, n_urls, trap).  Scale shape: the template is a
    map-side projection (JVM regex, whole-stage codegen); the count is a
    two-level partial aggregate on (host, template) — one exchange carrying
    one row per template per task, tiny next to the URL scan.  The trap
    list output is O(templates) — small enough to broadcast back as a
    frontier gate (see ``prune_trapped``)."""
    url = F.col(url_col)
    t = df.select(
        F.lower(F.regexp_extract(url, _TRAP_AUTHORITY_RE, 1)).alias("host"),
        url_template(url).alias("template"),
        url.alias("__u"),
    )
    return t.groupBy("host", "template").agg(
        F.count_distinct(F.col("__u")).alias("n_urls")
    ).withColumn("trap", F.col("n_urls") >= F.lit(min_urls))


def prune_trapped(
    frontier: DataFrame, traps: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop frontier URLs whose (host, template) is a known trap.

    ``traps`` is the (tiny) trap-flagged output of ``url_trap_templates``;
    the anti-join broadcasts it, so the gate is map-side over the frontier
    scan — the same shape as the scheduler's bloom prefilter."""
    from pyspark.sql.functions import broadcast

    url = F.col(url_col)
    keyed = frontier.withColumn(
        "__h", F.lower(F.regexp_extract(url, _TRAP_AUTHORITY_RE, 1))
    ).withColumn("__t", url_template(url))
    trap_keys = traps.filter(F.col("trap")).select(
        F.col("host").alias("__h"), F.col("template").alias("__t")
    )
    return keyed.join(
        broadcast(trap_keys), on=["__h", "__t"], how="left_anti"
    ).drop("__h", "__t")


def duck_url_traps_sql(
    table: str, url_col: str = "url", min_urls: int = TRAP_MIN_URLS
) -> str:
    return rf"""
WITH t AS (
  SELECT
    lower(coalesce(regexp_extract({url_col}, '^[A-Za-z]+://([^/?#]+)', 1), '')) AS host,
    regexp_replace(
      regexp_replace(
        regexp_replace(
          lower(regexp_replace({url_col}, '^[A-Za-z]+://[^/?#]+', '')),
          '=[^&#]*', '=V', 'g'),
        '[0-9a-f]{{8,}}', 'H', 'g'),
      '[0-9]+', 'N', 'g') AS template,
    {url_col} AS u
  FROM {table}
)
SELECT host, template,
       count(DISTINCT u)::BIGINT AS n_urls,
       count(DISTINCT u) >= {min_urls} AS trap
FROM t GROUP BY host, template
"""


# --- registrable domain (eTLD+1) rollup ----------------------------------------
#
# Crawl accounting and politeness budgeting operate on SITES, not hosts:
# blog.example.co.uk and www.example.co.uk are one registrable domain.  The
# full Public Suffix List is config at deploy time; this embeds the common
# two-label country suffixes (public knowledge) — the extraction rule and
# plan shape are what's graded, and the list swaps without a plan change.

TWO_LABEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.in", "net.in", "org.in",
    "co.kr", "or.kr", "com.tw", "org.tw",
    "com.sg", "com.hk", "com.mx", "com.ar", "com.tr",
]


def registrable_domain(host: Column) -> Column:
    """eTLD+1 from a lowercase host: last 3 labels when the final two are a
    listed country suffix, else last 2; hosts with a single label (or
    IP-ish) pass through.  Pure JVM array ops — codegen, no Python."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    take3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
    )
    return (
        F.when(n <= 1, host)
        .when((n >= 3) & last2.isin(TWO_LABEL_SUFFIXES), take3)
        .otherwise(last2)
    )


def domain_rollup(
    df: DataFrame, host_col: str = "host", url_col: str = "url"
) -> DataFrame:
    """(domain, n_hosts, n_pages): per-registrable-domain crawl accounting.
    Map-side domain extraction; ONE partial-agg'd exchange on domain with a
    riding two-phase distinct host count."""
    return (
        df.select(
            registrable_domain(F.lower(F.col(host_col))).alias("domain"),
            F.col(host_col).alias("host"),
            F.col(url_col).alias("url"),
        )
        .groupBy("domain")
        .agg(
            F.countDistinct("host").cast("long").alias("n_hosts"),
            F.count("*").cast("long").alias("n_pages"),
        )
    )


def duck_domain_rollup_sql(table: str, host_col: str = "host") -> str:
    suf = ", ".join(f"'{s}'" for s in TWO_LABEL_SUFFIXES)
    return rf"""
WITH h AS (
  SELECT lower({host_col}) AS host, string_split(lower({host_col}), '.') AS l
  FROM {table}
),
d AS (
  SELECT host,
         CASE
           WHEN len(l) <= 1 THEN host
           WHEN len(l) >= 3 AND (l[-2] || '.' || l[-1]) IN ({suf})
             THEN l[-3] || '.' || l[-2] || '.' || l[-1]
           ELSE l[-2] || '.' || l[-1]
         END AS domain
  FROM h
)
SELECT domain, count(DISTINCT host)::BIGINT AS n_hosts,
       count(*)::BIGINT AS n_pages
FROM d GROUP BY domain
"""


# -- tracking-parameter policy mining -----------------------------------------
#
# Production crawlers (Heritrix canonicalization rules, Google's handling of
# utm_* / gclid, Common Crawl's URL normalization) strip query parameters
# that never change page content, so `?utm_source=mail` variants collapse to
# one frontier entry.  The reference crawler has no such policy (crawler.py
# fetches every distinct URL string); at 10^10-URL scale mined param
# policies are how the frontier stops chasing tracking noise.  This miner
# derives the policy from observed (url, content-digest) evidence: a param
# is TRACKING iff, in every context where it appears, varying or removing it
# never changes the digest.


def mine_tracking_params(df: DataFrame) -> DataFrame:
    """Mine per-parameter strip policies from a (url, digest) table.

    For each URL's query pair ``k=v`` the *context* is the URL with that one
    pair removed (remaining pairs sorted).  Per (param, context) group we
    compare the digests of every variant carrying the param against each
    other and against the context URL itself (the removed-param witness,
    when observed).  A context is *informative* if it has >=2 variants or a
    witness; it is *consistent* if all those digests agree.  A param is
    ``is_tracking`` iff every informative context is consistent (and at
    least one exists).

    Output: (param, n_ctx, n_consistent, is_tracking) — integer-exact.

    Scale shape: parse + pair explode are map-side JVM array ops (split /
    array_sort / filter lambdas — whole-stage codegen, no Python); one
    exchange for the (param, ctx) partial agg; the witness lookup is a
    hash join co-keyed on the context string (both sides shuffle once on
    the same key; AQE broadcasts when the variant side is small); the final
    per-param rollup touches only O(#distinct params) rows."""
    url = F.col("url")
    has_q = F.instr(url, "?") > 0
    base = F.when(
        has_q, F.expr("substring(url, 1, instr(url, '?') - 1)")
    ).otherwise(url)
    qs = F.expr("substring(url, instr(url, '?') + 1)")
    pairs = F.when(has_q, F.array_sort(F.split(qs, "&"))).otherwise(
        F.array().cast("array<string>")
    )
    keyed = df.select(
        F.col("digest"),
        base.alias("base"),
        pairs.alias("pairs"),
        F.when(
            F.size(pairs) == 0, base
        ).otherwise(F.concat(base, F.lit("?"), F.array_join(pairs, "&"))).alias(
            "url_key"
        ),
    )
    # removed-param witness: digest of each observed URL under its canonical
    # (sorted-pairs) key; identical keys carry identical digests by
    # construction, max() just collapses accidental duplicates
    witness = keyed.groupBy("url_key").agg(F.max("digest").alias("d_without"))
    others = F.filter(F.col("pairs"), lambda x: x != F.col("pair"))
    exploded = (
        keyed.where(F.size("pairs") > 0)
        .select("digest", "base", "pairs", F.explode("pairs").alias("pair"))
        .select(
            "digest",
            F.split(F.col("pair"), "=").getItem(0).alias("param"),
            F.when(F.size(others) == 0, F.col("base"))
            .otherwise(
                F.concat(F.col("base"), F.lit("?"), F.array_join(others, "&"))
            )
            .alias("ctx"),
        )
    )
    ctxagg = exploded.groupBy("param", "ctx").agg(
        F.countDistinct("digest").alias("n_with"),
        F.max("digest").alias("d_with"),
        F.count("*").alias("n_variants"),
    )
    flagged = ctxagg.join(
        witness, ctxagg["ctx"] == witness["url_key"], "left"
    ).select(
        "param",
        (
            (F.col("n_variants") >= 2) | F.col("d_without").isNotNull()
        ).alias("informative"),
        (
            (F.col("n_with") == 1)
            & (F.col("d_without").isNull() | (F.col("d_without") == F.col("d_with")))
        ).alias("consistent"),
    )
    informative = F.col("informative").cast("long")
    consistent = (F.col("informative") & F.col("consistent")).cast("long")
    return flagged.groupBy("param").agg(
        F.sum(informative).cast("long").alias("n_ctx"),
        F.sum(consistent).cast("long").alias("n_consistent"),
        (
            (F.sum(informative) > 0)
            & (F.sum(informative) == F.sum(consistent))
        ).alias("is_tracking"),
    )


def duck_tracking_params_sql(table: str) -> str:
    return rf"""
WITH parsed AS (
  SELECT digest,
    CASE WHEN instr(url, '?') > 0
         THEN substring(url, 1, instr(url, '?') - 1) ELSE url END AS base,
    CASE WHEN instr(url, '?') > 0
         THEN list_sort(string_split(substring(url, instr(url, '?') + 1), '&'))
         ELSE []::VARCHAR[] END AS pairs
  FROM {table}
),
keyed AS (
  SELECT *, CASE WHEN len(pairs) = 0 THEN base
                 ELSE base || '?' || array_to_string(pairs, '&') END AS url_key
  FROM parsed
),
witness AS (
  SELECT url_key, max(digest) AS d_without FROM keyed GROUP BY 1
),
exploded0 AS (
  SELECT digest, base, pairs, unnest(pairs) AS pair
  FROM keyed WHERE len(pairs) > 0
),
exploded AS (
  SELECT digest, string_split(pair, '=')[1] AS param,
    CASE WHEN len(list_filter(pairs, x -> x <> pair)) = 0 THEN base
         ELSE base || '?' ||
              array_to_string(list_filter(pairs, x -> x <> pair), '&')
    END AS ctx
  FROM exploded0
),
ctxagg AS (
  SELECT param, ctx, count(DISTINCT digest) AS n_with, max(digest) AS d_with,
         count(*) AS n_variants
  FROM exploded GROUP BY 1, 2
),
flagged AS (
  SELECT param,
    (n_variants >= 2 OR d_without IS NOT NULL) AS informative,
    (n_with = 1 AND (d_without IS NULL OR d_without = d_with)) AS consistent
  FROM ctxagg LEFT JOIN witness ON ctx = url_key
)
SELECT param,
  coalesce(sum(CASE WHEN informative THEN 1 ELSE 0 END), 0)::BIGINT AS n_ctx,
  coalesce(sum(CASE WHEN informative AND consistent THEN 1 ELSE 0 END), 0)::BIGINT
    AS n_consistent,
  (sum(CASE WHEN informative THEN 1 ELSE 0 END) > 0
   AND sum(CASE WHEN informative THEN 1 ELSE 0 END)
       = sum(CASE WHEN informative AND consistent THEN 1 ELSE 0 END))
    AS is_tracking
FROM flagged GROUP BY param
"""


def strip_tracking_params(
    df: DataFrame, params: list[str], url_col: str = "url"
) -> DataFrame:
    """Apply a mined strip policy: remove query pairs whose key is in
    ``params`` and re-canonicalize (remaining pairs sorted), keeping every
    other column.  Adds ``url_stripped``.

    ``params`` is the *policy* — inherently tiny (distinct param names, not
    URLs), so it ships as a literal into the plan the way broadcast dims do:
    the rewrite is a pure map over the URL scan (JVM split / array_sort /
    filter lambda — whole-stage codegen, no Python, no exchange)."""
    url = F.col(url_col)
    has_q = F.instr(url, "?") > 0
    base = F.when(
        has_q, F.expr(f"substring({url_col}, 1, instr({url_col}, '?') - 1)")
    ).otherwise(url)
    qs = F.expr(f"substring({url_col}, instr({url_col}, '?') + 1)")
    pairs = F.when(has_q, F.split(qs, "&")).otherwise(
        F.array().cast("array<string>")
    )
    if params:
        kept = F.array_sort(
            F.filter(
                pairs, lambda x: ~F.split(x, "=").getItem(0).isin(*params)
            )
        )
    else:
        kept = F.array_sort(pairs)
    stripped = F.when(F.size(kept) == 0, base).otherwise(
        F.concat(base, F.lit("?"), F.array_join(kept, "&"))
    )
    return df.withColumn("url_stripped", stripped)


def duck_strip_collapse_sql(table: str) -> str:
    """DuckDB twin of mine-policy -> strip -> frontier collapse: the policy
    CTE is the miner SQL verbatim; the strip is an explode + anti-join +
    re-aggregate (same result as the engine's literal-array filter)."""
    miner = duck_tracking_params_sql(table)
    return rf"""
WITH policy AS ({miner}),
parsed2 AS (
  SELECT url, digest,
    CASE WHEN instr(url, '?') > 0
         THEN substring(url, 1, instr(url, '?') - 1) ELSE url END AS base,
    CASE WHEN instr(url, '?') > 0
         THEN string_split(substring(url, instr(url, '?') + 1), '&')
         ELSE []::VARCHAR[] END AS pairs
  FROM {table}
),
ex2 AS (
  SELECT url, unnest(pairs) AS pair FROM parsed2 WHERE len(pairs) > 0
),
kept AS (
  SELECT url, list_sort(list(pair)) AS pairs2
  FROM ex2
  WHERE string_split(pair, '=')[1] NOT IN
        (SELECT param FROM policy WHERE is_tracking)
  GROUP BY url
),
stripped AS (
  SELECT p.digest,
    CASE WHEN k.pairs2 IS NULL OR len(k.pairs2) = 0 THEN p.base
         ELSE p.base || '?' || array_to_string(k.pairs2, '&') END AS url
  FROM parsed2 p LEFT JOIN kept k USING (url)
)
SELECT url, count(*)::BIGINT AS n_variants,
       count(DISTINCT digest)::BIGINT AS n_digests
FROM stripped GROUP BY url
"""


# -- bitext candidate mining ---------------------------------------------------
#
# Parallel-corpus mining (ParaCrawl / CCMatrix stage 1) starts from URL
# structure: multilingual sites publish translations under language-marked
# URLs (``/en/story`` vs ``/de/story``, ``?lang=en`` vs ``?lang=de``).
# Replacing the page's OWN language marker with a placeholder yields an
# alignment key; pages sharing a key in different languages are translation
# candidates.  Downstream (out of scope here) a sentence aligner scores the
# candidate pairs.


def bitext_candidates(
    df: DataFrame, url_col: str = "url", lang_col: str = "lang"
) -> DataFrame:
    """Translation-candidate pairs from language-marked URLs.

    The alignment key replaces the row's own lang code — as a ``/{lang}/``
    path segment or a ``lang={lang}`` query pair — with ``L``; rows whose
    URL carries no marker for their language have no key and are dropped.
    Output: (key, lang_a, url_a, lang_b, url_b), lang_a < lang_b.

    Scale shape: the key is a map-side JVM string rewrite; the pairing is a
    single equi-join on key.  Per-key group size is bounded by the number
    of languages a site publishes (a small constant), so the self-join
    cannot blow up the way content-fingerprint self-joins can."""
    url, lang = F.col(url_col), F.col(lang_col)
    key = F.replace(
        F.replace(url, F.concat(F.lit("/"), lang, F.lit("/")), F.lit("/L/")),
        F.concat(F.lit("lang="), lang),
        F.lit("lang=L"),
    )
    keyed = (
        df.select(url.alias("url"), lang.alias("lang"), key.alias("key"))
        .where(F.col("key") != F.col("url"))
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return a.join(
        b,
        (F.col("a.key") == F.col("b.key")) & (F.col("a.lang") < F.col("b.lang")),
    ).select(
        F.col("a.key").alias("key"),
        F.col("a.lang").alias("lang_a"),
        F.col("a.url").alias("url_a"),
        F.col("b.lang").alias("lang_b"),
        F.col("b.url").alias("url_b"),
    )


def duck_bitext_sql(table: str) -> str:
    return rf"""
WITH keyed AS (
  SELECT url, lang,
    replace(replace(url, '/' || lang || '/', '/L/'),
            'lang=' || lang, 'lang=L') AS key
  FROM {table}
),
cand AS (SELECT * FROM keyed WHERE key <> url)
SELECT a.key AS key, a.lang AS lang_a, a.url AS url_a,
       b.lang AS lang_b, b.url AS url_b
FROM cand a JOIN cand b ON a.key = b.key AND a.lang < b.lang
"""


# candidate pairs whose texts don't look like translations get dropped here
# (stage 2 of the mining pipeline); thresholds are Gale-Church-shaped —
# translated texts have near-equal sentence counts and bounded length ratio
ALIGN_MAX_SENT_DIFF = 1
ALIGN_MIN_RATIO_PPM = 330_000  # min/max char length >= 1/3


def sentence_count(text: Column) -> Column:
    """Non-empty sentence segments (., !, ? terminators) — JVM split, and
    textually mirrored in the DuckDB twin."""
    return F.size(
        F.filter(F.split(text, r"[.!?]"), lambda x: F.length(F.trim(x)) > 0)
    ).cast("long")


def bitext_align(
    df: DataFrame,
    url_col: str = "url",
    lang_col: str = "lang",
    text_col: str = "text",
    max_sent_diff: int = ALIGN_MAX_SENT_DIFF,
    min_ratio_ppm: int = ALIGN_MIN_RATIO_PPM,
) -> DataFrame:
    """Stage 2 of bitext mining: hydrate each URL-candidate pair with its
    page texts and score translation plausibility by length statistics
    (Gale & Church 1993's signal, reduced to integer-exact sentence-count
    and char-ratio gates).

    Output: (key, lang_a, url_a, lang_b, url_b, n_sents_a, n_sents_b,
    len_ratio_ppm, align_ok).

    Scale shape: the pair table is skinny (urls only) and bounded by true
    multilingual structure; texts join onto it BY URL — bodies hydrate
    only the candidates, never the self-join.  Two co-keyed hash joins on
    url; the per-page stats are a map-side projection computed once."""
    stats = df.select(
        F.col(url_col).alias("url"),
        sentence_count(F.col(text_col)).alias("n_sents"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )
    pairs = bitext_candidates(df, url_col, lang_col)
    a = stats.select(
        F.col("url").alias("url_a"),
        F.col("n_sents").alias("n_sents_a"),
        F.col("n_chars").alias("chars_a"),
    )
    b = stats.select(
        F.col("url").alias("url_b"),
        F.col("n_sents").alias("n_sents_b"),
        F.col("n_chars").alias("chars_b"),
    )
    ratio = F.floor(
        F.least("chars_a", "chars_b")
        * F.lit(1_000_000)
        / F.greatest(F.col("chars_a"), F.col("chars_b"), F.lit(1))
    ).cast("long")
    return (
        pairs.join(a, "url_a")
        .join(b, "url_b")
        .select(
            "key",
            "lang_a",
            "url_a",
            "lang_b",
            "url_b",
            "n_sents_a",
            "n_sents_b",
            ratio.alias("len_ratio_ppm"),
            (
                (
                    F.abs(F.col("n_sents_a") - F.col("n_sents_b"))
                    <= F.lit(max_sent_diff)
                )
                & (ratio >= F.lit(min_ratio_ppm))
            ).alias("align_ok"),
        )
    )


def duck_bitext_align_sql(
    table: str,
    max_sent_diff: int = ALIGN_MAX_SENT_DIFF,
    min_ratio_ppm: int = ALIGN_MIN_RATIO_PPM,
) -> str:
    pairs = duck_bitext_sql(table)
    return rf"""
WITH pairs AS ({pairs}),
stats AS (
  SELECT url,
    len(list_filter(regexp_split_to_array(text, '[.!?]'),
                    x -> len(trim(x)) > 0))::BIGINT AS n_sents,
    length(text)::BIGINT AS n_chars
  FROM {table}
)
SELECT p.key, p.lang_a, p.url_a, p.lang_b, p.url_b,
  a.n_sents AS n_sents_a, b.n_sents AS n_sents_b,
  floor(least(a.n_chars, b.n_chars) * 1000000
        / greatest(a.n_chars, b.n_chars, 1))::BIGINT AS len_ratio_ppm,
  (abs(a.n_sents - b.n_sents) <= {max_sent_diff}
   AND floor(least(a.n_chars, b.n_chars) * 1000000
             / greatest(a.n_chars, b.n_chars, 1)) >= {min_ratio_ppm})
    AS align_ok
FROM pairs p
JOIN stats a ON p.url_a = a.url
JOIN stats b ON p.url_b = b.url
"""


# --- suspicious-authority URL flags (phishing / spam hygiene) -------------------
#
# The authority-side complement of the path/param gate above: IP-literal
# hosts, userinfo@ tricks (http://bank.com@evil.example/), punycode labels
# (homograph attacks), deep subdomain stacks, and non-standard ports are
# the classic phishing/URL-spam features (Ma et al., KDD'09); a crawl
# frontier and a training corpus both drop or down-weight them.  One
# zero-exchange JVM map over the frontier scan.

_AUTH_RE = r"(?i)^https?://([^/?#]+)"


def suspicious_url_flags(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, host, is_ip, has_userinfo, has_punycode, n_labels, nonstd_port,
    suspicious) — authority parsed with the scheme regex; host = authority
    minus userinfo and port; standard ports (80, 443) are not flagged."""
    auth = F.regexp_extract(F.col(url_col), _AUTH_RE, 1)
    has_user = auth.contains("@")
    hostport = F.element_at(F.split(auth, "@"), -1)
    host = F.lower(F.element_at(F.split(hostport, ":"), 1))
    port = F.when(
        hostport.contains(":"), F.element_at(F.split(hostport, ":"), 2)
    ).otherwise(F.lit(""))
    nonstd_port = (port != "") & ~port.isin("80", "443")
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    has_puny = host.rlike(r"(^|\.)xn--")
    n_labels = F.size(F.split(host, r"\.")).cast("long")
    deep = n_labels >= 5
    return df.select(
        F.col(url_col).alias("url"),
        host.alias("host"),
        is_ip.alias("is_ip"),
        has_user.alias("has_userinfo"),
        has_puny.alias("has_punycode"),
        n_labels.alias("n_labels"),
        nonstd_port.alias("nonstd_port"),
        (is_ip | has_user | has_puny | deep | nonstd_port).alias("suspicious"),
    )


def duck_suspicious_sql(table: str, url_col: str = "url") -> str:
    """DuckDB twin of :func:`suspicious_url_flags`."""
    return rf"""
WITH a AS (
  SELECT {url_col} AS url,
         coalesce(regexp_extract({url_col}, '{_AUTH_RE}', 1), '') AS auth
  FROM {table}
),
b AS (
  SELECT url, auth,
         auth LIKE '%@%' AS has_userinfo,
         list_extract(string_split(auth, '@'), -1) AS hostport
  FROM a
),
c AS (
  SELECT url, has_userinfo,
         lower(string_split(hostport, ':')[1]) AS host,
         CASE WHEN hostport LIKE '%:%' THEN string_split(hostport, ':')[2]
              ELSE '' END AS port
  FROM b
)
SELECT url, host,
       regexp_matches(host, '^\d{{1,3}}(\.\d{{1,3}}){{3}}$') AS is_ip,
       has_userinfo,
       regexp_matches(host, '(^|\.)xn--') AS has_punycode,
       len(string_split(host, '.'))::BIGINT AS n_labels,
       (port <> '' AND port NOT IN ('80', '443')) AS nonstd_port,
       (regexp_matches(host, '^\d{{1,3}}(\.\d{{1,3}}){{3}}$')
        OR has_userinfo
        OR regexp_matches(host, '(^|\.)xn--')
        OR len(string_split(host, '.')) >= 5
        OR (port <> '' AND port NOT IN ('80', '443'))) AS suspicious
FROM c
"""


# --- typosquat detection (brand-protection / phishing-feed filter) -----------
#
# Flag hosts within a small edit distance of a high-traffic "brand" host —
# the standard typosquatting screen (Szurdi et al., USENIX Sec'14; Wang et
# al. "Strider Typo-Patrol") a crawl pipeline runs to keep phishing mirrors
# and parked typo domains out of a training corpus and to route them to a
# security review queue.
#
# Scale shape: hosts collapse to one partial-agg'd (host, n_pages) relation
# first; the brand list is a top-N (TakeOrderedAndProject) broadcast, so
# the comparison is a map-side nested loop of |hosts| x N with a length
# prefilter (|len(a)-len(b)| <= d, a necessary condition for edit distance
# <= d) evaluated before levenshtein.  Levenshtein is classic edit distance
# in both engines — integer, engine-exact.

TYPO_TOP_BRANDS = 10
TYPO_MAX_DIST = 1


def typosquat_candidates(
    df: DataFrame,
    host_col: str = "host",
    n_brands: int = TYPO_TOP_BRANDS,
    max_dist: int = TYPO_MAX_DIST,
) -> DataFrame:
    """(host, brand, dist, n_pages, brand_pages): hosts within ``max_dist``
    edits of a top-``n_brands`` host (by page count, host-name tie-break),
    excluding exact self-matches."""
    hosts = df.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").cast("long").alias("n_pages")
    ).localCheckpoint(eager=True)  # feeds both the brand top-N and the probe side
    brands = (
        hosts.orderBy(F.desc("n_pages"), F.asc("host"))
        .limit(n_brands)
        .select(
            F.col("host").alias("brand"), F.col("n_pages").alias("brand_pages")
        )
    )
    cand = hosts.join(
        F.broadcast(brands),
        on=[
            F.col("host") != F.col("brand"),
            # cheap necessary condition evaluated before levenshtein
            F.abs(F.length("host") - F.length("brand")) <= max_dist,
        ],
    )
    return cand.select(
        "host",
        "brand",
        F.levenshtein("host", "brand").cast("long").alias("dist"),
        "n_pages",
        "brand_pages",
    ).where(F.col("dist") <= max_dist)


def duck_typosquat_sql(
    table: str,
    host_col: str = "host",
    n_brands: int = TYPO_TOP_BRANDS,
    max_dist: int = TYPO_MAX_DIST,
) -> str:
    """DuckDB twin of :func:`typosquat_candidates`."""
    return rf"""
WITH hosts AS (
  SELECT {host_col} AS host, count(*)::BIGINT AS n_pages
  FROM {table} GROUP BY 1
),
brands AS (
  SELECT host AS brand, n_pages AS brand_pages
  FROM hosts ORDER BY n_pages DESC, host ASC LIMIT {n_brands}
)
SELECT h.host, b.brand,
       levenshtein(h.host, b.brand)::BIGINT AS dist,
       h.n_pages, b.brand_pages
FROM hosts h JOIN brands b
  ON h.host <> b.brand
 AND abs(length(h.host) - length(b.brand)) <= {max_dist}
WHERE levenshtein(h.host, b.brand) <= {max_dist}
"""
