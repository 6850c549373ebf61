"""Vectorized HTML extraction — the engine's per-page compute kernel.

Reproduces the reference default parser's output (title, whitespace-normalized
text truncated to 500 chars, link hrefs in document order, links_count;
``/root/reference/web_crawler/crawler.py:126-146``) as an Arrow-batched pandas
UDF over the pages table's ``html BINARY`` column.  This is a *separate*
implementation from the per-row oracle in ``refsim.py`` (an event-driven
single-pass collector vs the oracle's bs4-shaped accumulator) and is
differentially tested byte-identical against it (tests/test_parser.py).

Plan shape: the UDF appears as ArrowEvalPython (never BatchEvalPython); html
bytes stream JVM->Python via Arrow, one batch per ~maxRecordsPerBatch rows.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

PARSED_SCHEMA = StructType(
    [
        StructField("title", StringType(), True),
        StructField("text", StringType(), True),
        StructField("links_count", IntegerType(), True),
        StructField("links", ArrayType(StringType()), True),
    ]
)

TEXT_LIMIT = 500  # crawler.py:143
LINKS_LIMIT = 10  # crawler.py:145


class _Extractor(HTMLParser):
    """Single-pass event collector: text chunks (skipping script/style
    subtrees), first-title children, hrefs."""

    __slots__ = ("chunks", "hrefs", "_skip", "_title_state", "_title_chunks")

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.hrefs: list[str] = []
        self._skip = 0
        # 0 = before first title, 1 = inside it, 2 = done
        self._title_state = 0
        self._title_chunks: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.hrefs.append(v)
                    break
        elif tag in ("script", "style"):
            self._skip += 1
        elif tag == "title" and self._title_state == 0:
            self._title_state = 1

    def handle_endtag(self, tag):
        if tag in ("script", "style"):
            if self._skip:
                self._skip -= 1
        elif tag == "title" and self._title_state == 1:
            self._title_state = 2

    def handle_data(self, data):
        if not self._skip:
            self.chunks.append(data)
        if self._title_state == 1:
            self._title_chunks.append(data)

    def title(self) -> Optional[str]:
        # bs4 soup.title.string semantics: string only for exactly one child
        if self._title_state == 0:
            return ""  # no <title> at all -> reference stores ""
        if len(self._title_chunks) == 1:
            return self._title_chunks[0]
        return None  # empty or multi-child title -> .string is None


def extract_one(html_text: str) -> tuple[Optional[str], str, int, list[str]]:
    ex = _Extractor()
    try:
        ex.feed(html_text)
        ex.close()
    except Exception:
        pass  # lenient like bs4's html.parser fallback
    raw = "".join(ex.chunks)
    # crawler.py:134-137 whitespace pipeline
    out: list[str] = []
    for line in raw.splitlines():
        for phrase in line.strip().split("  "):
            phrase = phrase.strip()
            if phrase:
                out.append(phrase)
    text = " ".join(out)[:TEXT_LIMIT]
    return ex.title(), text, len(ex.hrefs), ex.hrefs[:LINKS_LIMIT]


def _parse_batch(html: pd.Series) -> pd.DataFrame:
    titles, texts, counts, links = [], [], [], []
    for payload in html:
        if payload is None:
            titles.append(None)
            texts.append(None)
            counts.append(None)
            links.append(None)
            continue
        if isinstance(payload, (bytes, bytearray)):
            payload = bytes(payload).decode("utf-8", errors="ignore")
        t, x, c, l = extract_one(payload)
        titles.append(t)
        texts.append(x)
        counts.append(c)
        links.append(l)
    return pd.DataFrame(
        {"title": titles, "text": texts, "links_count": counts, "links": links}
    )


@pandas_udf(PARSED_SCHEMA)
def parse_html_udf(html: pd.Series) -> pd.DataFrame:
    return _parse_batch(html)


def with_parsed(df, html_col: str = "html", out_col: str = "parsed"):
    """Attach the parsed struct; keep the html column out of downstream
    projections (column pruning keeps the BINARY scan local to this stage)."""
    return df.withColumn(out_col, parse_html_udf(F.col(html_col)))


# -- density-based main-content extraction ---------------------------------
#
# The reference parser (above) extracts ALL text byte-identically; corpus
# curation wants only the MAIN content — nav bars, link lists, and footers
# out.  The production heuristic (Boilerpipe, Arc90 readability,
# trafilatura's fallback) is block-level density: prose blocks are long
# and link-light, boilerplate blocks are short and link-heavy.  Everything
# below is JVM regex/array lambdas in the Java-regex ∩ RE2 subset, so the
# DuckDB twin is byte-identical — zero Python, zero shuffle.

MC_MIN_BLOCK_CHARS = 60        # a prose block has at least this much text
MC_MAX_LINK_DENSITY_PPM = 300_000  # anchor chars / text chars

_MC_SCRIPT_RE = r"(?s)<(script|style)[^>]*>.*?</(script|style)>"
_MC_BLOCK_RE = r"(?s)<p[^>]*>(.*?)</p>"
_MC_ANCHOR_RE = r"(?s)<a[^>]*>(.*?)</a>"
_MC_TAG_RE = r"<[^>]*>"


def _block_text(block):  # Column -> Column (tag-stripped, ws-squeezed)
    return F.trim(
        F.regexp_replace(F.regexp_replace(block, _MC_TAG_RE, " "), r"\s+", " ")
    )


def main_content(
    df,
    html_col: str = "html",
    url_col: str = "url",
    passthrough: tuple = (),
):
    """(url, n_blocks, n_kept, main_text, *passthrough): block-density
    main content.  ``passthrough`` names input columns carried through the
    projection unchanged — lets callers keep page metadata (fetch flags,
    timestamps) without re-scanning the pages table and joining back.

    Per page: drop <script>/<style>, split into <p> blocks, strip tags and
    squeeze whitespace per block, measure anchor-text share, keep blocks
    with >= MC_MIN_BLOCK_CHARS chars and link density <=
    MC_MAX_LINK_DENSITY_PPM; main_text joins kept blocks with newlines.
    Pages with NULL html (failed fetches) yield 0 blocks and ''.

    Scale shape: pure map over the page scan — regex extract + array
    lambdas, whole-stage codegen, no exchange, no Python; composes with
    any downstream corpus op without a shuffle."""
    html = F.regexp_replace(F.col(html_col).cast("string"), _MC_SCRIPT_RE, " ")
    blocks = F.regexp_extract_all(html, F.lit(_MC_BLOCK_RE), F.lit(1))
    texts = F.transform(blocks, _block_text)
    anchors = F.transform(
        blocks,
        lambda b: F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.array_join(
                        F.regexp_extract_all(b, F.lit(_MC_ANCHOR_RE), F.lit(1)),
                        " ",
                    ),
                    _MC_TAG_RE,
                    " ",
                ),
                r"\s+",
                " ",
            )
        ),
    )
    scored = F.zip_with(
        texts,
        anchors,
        lambda t, a: F.struct(
            t.alias("t"),
            (
                (F.length(t) >= MC_MIN_BLOCK_CHARS)
                & (
                    F.length(a) * F.lit(1_000_000)
                    <= F.lit(MC_MAX_LINK_DENSITY_PPM)
                    * F.greatest(F.length(t), F.lit(1))
                )
            ).alias("keep"),
        ),
    )
    kept = F.filter(scored, lambda s: s["keep"])
    return df.select(
        F.col(url_col).alias("url"),
        F.when(F.col(html_col).isNull(), F.lit(0))
        .otherwise(F.size(blocks))
        .cast("long")
        .alias("n_blocks"),
        F.when(F.col(html_col).isNull(), F.lit(0))
        .otherwise(F.size(kept))
        .cast("long")
        .alias("n_kept"),
        F.when(F.col(html_col).isNull(), F.lit("")).otherwise(
            F.array_join(F.transform(kept, lambda s: s["t"]), "\n")
        ).alias("main_text"),
        *[F.col(c) for c in passthrough],
    )


def duck_main_content_sql(table: str, html_col: str = "html", url_col: str = "url") -> str:
    strip = (
        lambda x: rf"trim(regexp_replace(regexp_replace({x}, '{_MC_TAG_RE}', ' ', 'g'), '\s+', ' ', 'g'))"
    )
    block_t = strip("b")
    anchor_t = strip(
        # coalesce: DuckDB's array_to_string([]) is NULL, Spark's array_join is ''
        rf"coalesce(array_to_string(regexp_extract_all(b, '{_MC_ANCHOR_RE}', 1), ' '), '')"
    )
    keep = (
        rf"len({block_t}) >= {MC_MIN_BLOCK_CHARS} AND "
        rf"len({anchor_t}) * 1000000 <= {MC_MAX_LINK_DENSITY_PPM} * greatest(len({block_t}), 1)"
    )
    return rf"""
WITH pages AS (
  SELECT {url_col} AS url,
    CASE WHEN {html_col} IS NULL THEN NULL
         ELSE regexp_replace(decode({html_col}), '{_MC_SCRIPT_RE}', ' ', 'g')
    END AS h
  FROM {table}
),
blk AS (
  SELECT url, h,
    CASE WHEN h IS NULL THEN []::VARCHAR[]
         ELSE regexp_extract_all(h, '{_MC_BLOCK_RE}', 1) END AS blocks
  FROM pages
)
SELECT url,
  len(blocks)::BIGINT AS n_blocks,
  len(list_filter(blocks, b -> {keep}))::BIGINT AS n_kept,
  coalesce(array_to_string(
    list_transform(list_filter(blocks, b -> {keep}), b -> {block_t}),
    chr(10)), '') AS main_text
FROM blk
"""


# -- head metadata extraction (title / description / rel=canonical / og) -------
#
# Trafilatura-shaped page metadata: the signals dedup and curation need
# beyond body text.  rel=canonical in particular is the duplicate-page
# declaration channel real sites use (CDNs, mirrors, tracking-URL
# variants all point at one canonical form) — `dedup_canonical` below
# consolidates on it.  Attribute ORDER varies in the wild, so every
# field matches both the name-first and content-first spellings.
#
# Scale shape: one zero-exchange JVM projection over the html scan —
# four regexp_extract pairs, no Python, composes with any downstream
# corpus op without a shuffle.

_META_FIELDS = [
    # out column -> (name-first regex, content-first regex)
    ("title", r"(?s)<title[^>]*>([^<]*)</title>", None),
    (
        "description",
        r'<meta[^>]*name="description"[^>]*content="([^"]*)"',
        r'<meta[^>]*content="([^"]*)"[^>]*name="description"',
    ),
    (
        "canonical",
        r'<link[^>]*rel="canonical"[^>]*href="([^"]*)"',
        r'<link[^>]*href="([^"]*)"[^>]*rel="canonical"',
    ),
    (
        "og_title",
        r'<meta[^>]*property="og:title"[^>]*content="([^"]*)"',
        r'<meta[^>]*content="([^"]*)"[^>]*property="og:title"',
    ),
]


def extract_meta(df, html_col: str = "html", url_col: str = "url"):
    """(url, title, description, canonical, og_title) — NULL when a field
    is absent (fields are never present-but-empty in valid heads; empty
    match folds to NULL)."""
    h = F.col(html_col).cast("string")
    cols = [F.col(url_col).alias("url")]
    for name, rx1, rx2 in _META_FIELDS:
        v = F.nullif(F.regexp_extract(h, rx1, 1), F.lit(""))
        if rx2 is not None:
            v = F.coalesce(v, F.nullif(F.regexp_extract(h, rx2, 1), F.lit("")))
        cols.append(v.alias(name))
    return df.select(*cols)


def duck_extract_meta_sql(table: str, html_col: str = "html", url_col: str = "url") -> str:
    fields = []
    for name, rx1, rx2 in _META_FIELDS:
        v1 = f"nullif(regexp_extract(h, '{rx1}', 1), '')"
        if rx2 is None:
            fields.append(f"{v1} AS {name}")
        else:
            v2 = f"nullif(regexp_extract(h, '{rx2}', 1), '')"
            fields.append(f"coalesce({v1}, {v2}) AS {name}")
    sel = ",\n       ".join(fields)
    return f"""
SELECT url, {sel}
FROM (SELECT {url_col} AS url, decode({html_col}) AS h FROM {table})
"""


def dedup_canonical(meta, url_col: str = "url", canonical_col: str = "canonical"):
    """Canonical-link consolidation: every page folds into the group of its
    declared rel=canonical target (itself when none declared).  Returns one
    row per group: (group_url, n_members, n_dupes) where dupes are members
    declaring a DIFFERENT url as canonical — the rows a curation pass
    drops.  Groups exist even when the target itself was never crawled
    (n_members counts only observed pages).

    Scale shape: map-side coalesce to the group key, then ONE
    partial-agg'd exchange on group_url — no join, no url-grain shuffle
    beyond the single groupBy."""
    group = F.coalesce(F.col(canonical_col), F.col(url_col)).alias("group_url")
    dupe = (F.col(canonical_col).isNotNull() & (F.col(canonical_col) != F.col(url_col))).cast("long")
    return (
        meta.select(group, dupe.alias("is_dupe"))
        .groupBy("group_url")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("is_dupe").alias("n_dupes"),
        )
    )


def duck_dedup_canonical_sql(meta_sql: str) -> str:
    return f"""
SELECT coalesce(canonical, url) AS group_url,
       count(*)::BIGINT AS n_members,
       sum(CASE WHEN canonical IS NOT NULL AND canonical <> url THEN 1 ELSE 0 END)::BIGINT AS n_dupes
FROM ({meta_sql})
GROUP BY 1
"""


# -- web-table extraction (the WDC web-tables shape) ---------------------------
#
# Relational data mining from the crawl: every <table> flattens to
# per-row cell arrays with (table, row) positions, cell text stripped of
# inner markup.  Two nested posexplodes over regexp block extraction —
# map-side only, no shuffle, no Python; at 100 TB the cost is the html
# scan the corpus pass already pays.

_TBL_TABLE_RE = r"(?s)<table[^>]*>(.*?)</table>"
_TBL_ROW_RE = r"(?s)<tr[^>]*>(.*?)</tr>"
_TBL_CELL_RE = r"(?s)<t[dh][^>]*>(.*?)</t[dh]>"
_TBL_TAG_RE = r"<[^>]*>"


def extract_tables(df, html_col: str = "html", url_col: str = "url"):
    """(url, table_idx, row_idx, n_cells, cells): one output row per <tr>,
    cells tag-stripped and whitespace-squeezed (empty cells stay as ''
    entries — column alignment matters downstream); header rows (<th>)
    flatten like data rows.  Pages without tables emit nothing."""
    h = F.col(html_col).cast("string")

    def clean(cell):
        return F.trim(
            F.regexp_replace(F.regexp_replace(cell, _TBL_TAG_RE, " "), r"\s+", " ")
        )

    tables = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.expr(f"regexp_extract_all(CAST({html_col} AS STRING), '{_TBL_TABLE_RE}', 1)")
        ).alias("table_idx", "__t"),
    )
    rows = tables.select(
        "url",
        "table_idx",
        F.posexplode(F.expr(f"regexp_extract_all(__t, '{_TBL_ROW_RE}', 1)")).alias(
            "row_idx", "__r"
        ),
    )
    cells = F.transform(
        F.expr(f"regexp_extract_all(__r, '{_TBL_CELL_RE}', 1)"), clean
    )
    return rows.select(
        "url",
        F.col("table_idx").cast("long").alias("table_idx"),
        F.col("row_idx").cast("long").alias("row_idx"),
        F.size(cells).cast("long").alias("n_cells"),
        cells.alias("cells"),
    )


def duck_extract_tables_sql(table: str, html_col: str = "html", url_col: str = "url") -> str:
    """DuckDB twin of :func:`extract_tables` (generate_series gives the
    0-based positions the posexplodes emit)."""
    clean = (
        "trim(regexp_replace(regexp_replace(c, '<[^>]*>', ' ', 'g'), "
        r"'\s+', ' ', 'g'))"
    )
    return rf"""
WITH t AS (
  SELECT {url_col} AS url, ts[i] AS tbl, (i - 1)::BIGINT AS table_idx
  FROM (
    SELECT {url_col}, regexp_extract_all(decode({html_col}), '{_TBL_TABLE_RE}', 1) AS ts
    FROM {table}
  ), LATERAL unnest(generate_series(1, len(ts))) AS g(i)
),
r AS (
  SELECT url, table_idx, rs[j] AS row, (j - 1)::BIGINT AS row_idx
  FROM (
    SELECT url, table_idx, regexp_extract_all(tbl, '{_TBL_ROW_RE}', 1) AS rs
    FROM t
  ), LATERAL unnest(generate_series(1, len(rs))) AS g(j)
)
SELECT url, table_idx, row_idx,
       len(cs)::BIGINT AS n_cells,
       list_transform(cs, c -> {clean}) AS cells
FROM (
  SELECT url, table_idx, row_idx,
         regexp_extract_all(row, '{_TBL_CELL_RE}', 1) AS cs
  FROM r
)
"""


_TBL_NUM_RE = r"^-?[0-9]+([.,][0-9]+)?$"


def table_column_types(tables_df, min_rows: int = 2, num_floor_ppm: int = 600_000):
    """WDC-style column typing over :func:`extract_tables` output:
    (url, table_idx, col_idx, n_values, numeric_ppm, col_type) — a column
    is 'numeric' when >= ``num_floor_ppm`` of its non-empty body cells
    (row_idx > 0; the header row votes nothing) parse as numbers, 'text'
    otherwise; tables with fewer than ``min_rows`` body rows emit nothing
    (too small to type).

    Scale shape: one posexplode over the cell arrays, one partial-agg'd
    exchange on (url, table, col) — table grain, orders below the page
    scan.  No Python."""
    body = tables_df.where(F.col("row_idx") > 0)
    cells = body.select(
        "url",
        "table_idx",
        F.posexplode("cells").alias("col_idx", "cell"),
    ).where(F.col("cell") != "")
    agg = cells.groupBy("url", "table_idx", F.col("col_idx").cast("long").alias("col_idx")).agg(
        F.count(F.lit(1)).alias("n_values"),
        F.sum(F.col("cell").rlike(_TBL_NUM_RE).cast("long")).alias("__num"),
    )
    n_body = tables_df.where(F.col("row_idx") > 0).groupBy("url", "table_idx").agg(
        F.count(F.lit(1)).alias("__rows")
    )
    ppm = F.expr("(1000000 * __num) div n_values")
    return (
        agg.join(n_body, ["url", "table_idx"])
        .where(F.col("__rows") >= min_rows)
        .select(
            "url",
            "table_idx",
            "col_idx",
            "n_values",
            ppm.cast("long").alias("numeric_ppm"),
            F.when(ppm >= num_floor_ppm, F.lit("numeric"))
            .otherwise(F.lit("text"))
            .alias("col_type"),
        )
    )


def duck_table_column_types_sql(
    tables_sql: str, min_rows: int = 2, num_floor_ppm: int = 600_000
) -> str:
    """DuckDB twin over the :func:`duck_extract_tables_sql` output."""
    return rf"""
WITH tbl AS ({tables_sql}),
body AS (SELECT * FROM tbl WHERE row_idx > 0),
nrows AS (
  SELECT url, table_idx, count(*)::BIGINT AS n_rows FROM body GROUP BY 1, 2
),
cells AS (
  SELECT url, table_idx, (i - 1)::BIGINT AS col_idx, cells[i] AS cell
  FROM body, LATERAL unnest(generate_series(1, len(cells))) AS g(i)
  WHERE cells[i] <> ''
),
agg AS (
  SELECT url, table_idx, col_idx,
         count(*)::BIGINT AS n_values,
         sum(CASE WHEN regexp_matches(cell, '{_TBL_NUM_RE}') THEN 1 ELSE 0 END)::BIGINT AS n_num
  FROM cells GROUP BY 1, 2, 3
)
SELECT a.url, a.table_idx, a.col_idx, a.n_values,
       ((1000000 * n_num) // n_values)::BIGINT AS numeric_ppm,
       CASE WHEN (1000000 * n_num) // n_values >= {num_floor_ppm}
            THEN 'numeric' ELSE 'text' END AS col_type
FROM agg a JOIN nrows r USING (url, table_idx)
WHERE r.n_rows >= {min_rows}
"""


# -- head link markup: JSON-LD / hreflang / rel=next pagination / meta refresh --
#
# The remaining machine-readable head channels a web-scale pipeline mines
# (beyond title/canonical/og above): schema.org JSON-LD blocks (structured
# metadata for articles/products), hreflang alternate clusters (the
# publisher-declared bitext-mining signal), rel=next/prev pagination chains
# (multi-page articles that training data should reassemble or dedup), and
# meta-refresh redirects (the html-side complement of the HTTP `redirects`
# fixture — the edges feed linkstats.resolve_redirects unchanged).
#
# All extraction is map-side block regexes in the Java-regex ∩ RE2 subset
# (the feeds/sitemap discipline): no shuffle, no Python.  The two composed
# ops that DO shuffle are head-grain, orders of magnitude below the corpus:
# hreflang confirmation self-joins the materialized edge set once, and
# pagination chain assembly is the bfs-depth loop at URL grain.

_JSONLD_BLOCK_RE = r'(?s)<script type="application/ld\+json">(.*?)</script>'
_JSONLD_FIELDS = [
    ("jtype", r'"@type": ?"([^"]*)"'),
    ("headline", r'"headline": ?"([^"]*)"'),
    ("name", r'"name": ?"([^"]*)"'),
    ("date_published", r'"datePublished": ?"([^"]*)"'),
]
_HREFLANG_TAG_RE = r'<link rel="alternate" hreflang="[^"]*" href="[^"]*">'
_NEXT_RE = r'<link rel="next" href="([^"]*)">'
_REFRESH_DELAY_RE = r'<meta http-equiv="refresh" content="([0-9]+);url=[^"]*">'
_REFRESH_URL_RE = r'<meta http-equiv="refresh" content="[0-9]+;url=([^"]*)">'


def extract_jsonld(df, html_col: str = "html", url_col: str = "url"):
    """(url, block_pos, jtype, headline, name, date_published) — one row per
    ld+json block in head order; absent fields are NULL; pages without
    blocks emit nothing.  Field values are pulled with exact-quote regexes
    (sufficient for schema.org's flat string fields; nested JSON walking
    would need an engine-specific JSONPath dialect the oracle can't share)."""
    blocks = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(_JSONLD_BLOCK_RE), F.lit(1))
        ).alias("block_pos", "b"),
    )
    return blocks.select(
        "url",
        F.col("block_pos").cast("long").alias("block_pos"),
        *[
            F.nullif(F.regexp_extract("b", rx, 1), F.lit("")).alias(name)
            for name, rx in _JSONLD_FIELDS
        ],
    )


def duck_jsonld_sql(table: str) -> str:
    """DuckDB twin of :func:`extract_jsonld`."""
    fields = ",\n       ".join(
        f"nullif(regexp_extract(bs[i], '{rx}', 1), '') AS {name}"
        for name, rx in _JSONLD_FIELDS
    )
    return rf"""
SELECT url, (i - 1)::BIGINT AS block_pos,
       {fields}
FROM (SELECT url, regexp_extract_all(html, '{_JSONLD_BLOCK_RE}', 1) AS bs FROM {table}),
     LATERAL unnest(generate_series(1, len(bs))) AS t(i)
"""


def hreflang_edges(df, html_col: str = "html", url_col: str = "url"):
    """(url, lang, href) — one row per declared hreflang alternate."""
    return (
        df.select(
            F.col(url_col).alias("url"),
            F.explode(
                F.regexp_extract_all(F.col(html_col), F.lit(_HREFLANG_TAG_RE), F.lit(0))
            ).alias("t"),
        )
        .select(
            "url",
            F.regexp_extract("t", r'hreflang="([^"]*)"', 1).alias("lang"),
            F.regexp_extract("t", r'href="([^"]*)"', 1).alias("href"),
        )
        .where(F.col("href") != "")
    )


def hreflang_pairs(df, html_col: str = "html", url_col: str = "url"):
    """(url_a, url_b, lang_a, lang_b) — BIDIRECTIONALLY-confirmed alternate
    pairs (a declares b AND b declares a; one-way declarations are the
    spam/misconfiguration case bitext mining must drop), url_a < url_b.

    The edge set is materialized before the self-join (one extraction pass,
    not two — the winnow branch-recompute lesson); the join shuffles only
    head-grain edges."""
    e = hreflang_edges(df, html_col=html_col, url_col=url_col).localCheckpoint(
        eager=True
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.href") == F.col("b.url"))
            & (F.col("b.href") == F.col("a.url")),
        )
        .where(F.col("a.url") < F.col("a.href"))
        .select(
            F.col("a.url").alias("url_a"),
            F.col("a.href").alias("url_b"),
            F.col("b.lang").alias("lang_a"),
            F.col("a.lang").alias("lang_b"),
        )
    )


def duck_hreflang_pairs_sql(table: str) -> str:
    """DuckDB twin of :func:`hreflang_pairs`."""
    return rf"""
WITH e AS MATERIALIZED (
  SELECT url,
         regexp_extract(t, 'hreflang="([^"]*)"', 1) AS lang,
         regexp_extract(t, 'href="([^"]*)"', 1) AS href
  FROM (SELECT url, unnest(regexp_extract_all(html, '{_HREFLANG_TAG_RE}')) AS t
        FROM {table})
  WHERE regexp_extract(t, 'href="([^"]*)"', 1) <> ''
)
SELECT a.url AS url_a, a.href AS url_b, b.lang AS lang_a, a.lang AS lang_b
FROM e a JOIN e b ON b.url = a.href AND b.href = a.url
WHERE a.url < a.href
"""


def pagination_chains(
    df, html_col: str = "html", url_col: str = "url", max_iter: int = 25
):
    """(url, chain_id, pos) — rel=next chains reassembled: chain_id is the
    chain's first page (a page with an outgoing next-edge that nothing
    points to), pos the hop count from it.  Level-synchronous BFS, so pos is
    the MINIMUM hop distance (ties/cycles converge; walk capped at
    ``max_iter`` in both engines).  Pages in no chain emit nothing.

    Scale shape: the next-edge relation (head-grain, tiny vs the corpus) is
    materialized once; each round is one join + an anti-join visited guard
    with per-round localCheckpoint — the bfs-depth loop at URL grain."""
    nxt = F.regexp_extract(F.col(html_col), _NEXT_RE, 1)
    edges = (
        df.select(F.col(url_col).alias("url"), nxt.alias("next_url"))
        .where(F.col("next_url") != "")
        .localCheckpoint(eager=True)
    )
    starts = edges.join(
        edges.select(F.col("next_url").alias("url")), on="url", how="left_anti"
    ).select("url")
    state = starts.select(
        "url", F.col("url").alias("chain_id"), F.lit(0).cast("long").alias("pos")
    ).localCheckpoint(eager=True)
    frontier = state
    for _ in range(max_iter):
        step = (
            frontier.where(F.col("pos") < max_iter)
            .join(edges, on="url")
            .select(
                F.col("next_url").alias("url"),
                "chain_id",
                (F.col("pos") + 1).alias("pos"),
            )
            .join(state.select("url", "chain_id"), on=["url", "chain_id"], how="left_anti")
            .groupBy("url", "chain_id")
            .agg(F.min("pos").alias("pos"))
            .localCheckpoint(eager=True)
        )
        if step.count() == 0:
            break
        state = state.unionByName(step).localCheckpoint(eager=True)
        frontier = step
    return state.select("url", "chain_id", F.col("pos").cast("long").alias("pos"))


def duck_pagination_sql(table: str, max_iter: int = 25) -> str:
    """Recursive-CTE twin of :func:`pagination_chains` (UNION dedups the
    walk; min(pos) mirrors the BFS first-reach)."""
    return rf"""
WITH RECURSIVE e AS MATERIALIZED (
  SELECT url, regexp_extract(html, '{_NEXT_RE}', 1) AS next_url
  FROM {table}
  WHERE regexp_extract(html, '{_NEXT_RE}', 1) <> ''
),
starts AS (SELECT url FROM e WHERE url NOT IN (SELECT next_url FROM e)),
walk(url, chain_id, pos) AS (
  SELECT url, url, 0::BIGINT FROM starts
  UNION
  SELECT e.next_url, w.chain_id, w.pos + 1
  FROM e JOIN walk w ON w.url = e.url
  WHERE w.pos < {max_iter}
)
SELECT url, chain_id, min(pos)::BIGINT AS pos FROM walk GROUP BY 1, 2
"""


def refresh_edges(df, html_col: str = "html", url_col: str = "url"):
    """(url, delay_s, target) — meta-refresh redirect declarations; the
    html-side complement of HTTP 3xx edges (same schema contract as the
    `redirects` fixture, so linkstats.resolve_redirects consumes them
    unchanged)."""
    h = F.col(html_col)
    return df.select(
        F.col(url_col).alias("url"),
        F.regexp_extract(h, _REFRESH_DELAY_RE, 1).cast("long").alias("delay_s"),
        F.regexp_extract(h, _REFRESH_URL_RE, 1).alias("target"),
    ).where(F.col("target") != "")


def duck_refresh_sql(table: str) -> str:
    """DuckDB twin of :func:`refresh_edges`."""
    return rf"""
SELECT url,
       regexp_extract(html, '{_REFRESH_DELAY_RE}', 1)::BIGINT AS delay_s,
       regexp_extract(html, '{_REFRESH_URL_RE}', 1) AS target
FROM {table}
WHERE regexp_extract(html, '{_REFRESH_URL_RE}', 1) <> ''
"""


# --- schema.org microdata (attribute-based structured data) ------------------
#
# The attribute sibling of the JSON-LD channel: itemscope/itemtype declare an
# item, itemprop tags inside carry its properties (inline text or content=).
# Same honest scope as extract_jsonld: FLAT items via shared-dialect regexes
# (nested itemscopes would need a real HTML walk both engines can't share);
# the fixture and real-world product/article markup are covered by the flat
# case.  Everything is map-side JVM string work — two generates, no shuffle,
# no Python.

_MICRO_BLOCK_RE = r'<div itemscope itemtype="[^"]*">.*?</div>'
_MICRO_TYPE_RE = r'itemtype="https?://schema\.org/([^"]+)"'
_MICRO_TAG_RE = r'<[a-z]+ itemprop="[^"]*"[^>]*>[^<]*'
_MICRO_PROP_RE = r'itemprop="([^"]+)"'
_MICRO_CONTENT_RE = r'content="([^"]*)"'
_MICRO_TEXT_RE = r">([^<]*)$"


def extract_microdata(df, html_col: str = "html", url_col: str = "url"):
    """(url, item_pos, prop_pos, itemtype, prop, value) — one row per
    itemprop in document order; a ``content=`` attribute wins over inline
    text, empty values are NULL; items without properties and pages without
    items emit nothing."""
    items = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(_MICRO_BLOCK_RE), F.lit(0))
        ).alias("item_pos", "blk"),
    )
    tags = items.select(
        "url",
        F.col("item_pos").cast("long").alias("item_pos"),
        F.regexp_extract("blk", _MICRO_TYPE_RE, 1).alias("itemtype"),
        F.posexplode(
            F.regexp_extract_all(F.col("blk"), F.lit(_MICRO_TAG_RE), F.lit(0))
        ).alias("prop_pos", "tag"),
    )
    value = F.coalesce(
        F.nullif(F.regexp_extract("tag", _MICRO_CONTENT_RE, 1), F.lit("")),
        F.nullif(F.regexp_extract("tag", _MICRO_TEXT_RE, 1), F.lit("")),
    )
    return tags.select(
        "url",
        "item_pos",
        F.col("prop_pos").cast("long").alias("prop_pos"),
        "itemtype",
        F.regexp_extract("tag", _MICRO_PROP_RE, 1).alias("prop"),
        value.alias("value"),
    )


def duck_microdata_sql(table: str) -> str:
    """DuckDB twin of :func:`extract_microdata` (1-indexed lists)."""
    return rf"""
WITH items AS (
  SELECT url, (i - 1)::BIGINT AS item_pos, bs[i] AS blk
  FROM (SELECT url,
               regexp_extract_all(html, '{_MICRO_BLOCK_RE}') AS bs
        FROM {table}),
       LATERAL unnest(generate_series(1, len(bs))) AS t(i)
),
tags AS (
  SELECT url, item_pos,
         regexp_extract(blk, '{_MICRO_TYPE_RE}', 1) AS itemtype,
         (j - 1)::BIGINT AS prop_pos, ts[j] AS tag
  FROM (SELECT url, item_pos, blk,
               regexp_extract_all(blk, '{_MICRO_TAG_RE}') AS ts
        FROM items),
       LATERAL unnest(generate_series(1, len(ts))) AS t(j)
)
SELECT url, item_pos, prop_pos, itemtype,
       regexp_extract(tag, '{_MICRO_PROP_RE}', 1) AS prop,
       coalesce(nullif(regexp_extract(tag, '{_MICRO_CONTENT_RE}', 1), ''),
                nullif(regexp_extract(tag, '{_MICRO_TEXT_RE}', 1), '')) AS value
FROM tags
"""


# --- NESTED microdata: the real HTML walk (round 4) ---------------------------
#
# The regex path above handles the flat single-level blocks the round-3
# fixture emits (documented limit).  Real schema.org markup nests:
# Product -> offers(Offer) -> priceSpecification(...), and the WHATWG
# microdata model says an element with BOTH itemscope and itemprop is a
# nested item serving as the enclosing item's property value, while plain
# itemprop elements bind to the NEAREST enclosing itemscope.  This section
# implements that walk in the module's Arrow-UDF convention and is graded
# against an INDEPENDENT hand-rolled tag tokenizer golden (the media/
# winnow differential pattern — no shared parser between the two paths).
#
# Emission contract (both implementations, pinned by pytest + golden):
# one row per SCALAR itemprop: (item_id, parent_id, parent_prop, itemtype,
# prop_pos, prop, value) where item_id numbers itemscope start tags in
# document order, parent_id/parent_prop link nested items (NULL at top
# level), prop_pos counts emitted rows per owning item, multi-name
# itemprop="a b" emits one row per token at consecutive positions, and
# value resolution is: content= attr, else the tag's URL/value attribute
# (a/link/area: href; img/audio/video/embed/iframe/source/track: src;
# time: datetime; data: value), else whitespace-squeezed textContent
# (entity-decoded); empty -> NULL.  itemscope+itemprop elements emit no
# scalar row (their props are their own rows).  Items with no scalar
# props surface through their children's parent linkage or, when leaf,
# a single (prop NULL, value NULL) marker row so props-less items are
# observable.

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_URL_ATTR = {
    "a": "href", "link": "href", "area": "area",
    "img": "src", "audio": "src", "video": "src", "embed": "src",
    "iframe": "src", "source": "src", "track": "track",
    "time": "datetime", "data": "value", "meta": "content",
}
_URL_ATTR["area"] = "href"
_URL_ATTR["track"] = "src"


def _squeeze_ws(s: str) -> "Optional[str]":
    out = " ".join(s.split())
    return out if out else None


class _MicroWalker(HTMLParser):
    """Engine path: event-driven nested-itemscope walk (stdlib HTMLParser,
    convert_charrefs on — entities decode in data and attr values)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.rows: list = []  # (item_id, parent, parent_prop, itemtype, pos, prop, value)
        self._depth = 0
        self._items: list = []  # open: [start_depth, id, parent, pprop, itype, n_props, n_rows]
        self._caps: list = []  # open prop captures: [start_depth, item_ref, names, attr_val, chunks]
        self._n_items = 0

    # -- item/prop helpers
    def _innermost(self):
        return self._items[-1] if self._items else None

    def _emit(self, item, names, value) -> None:
        for name in names:
            self.rows.append(
                (item[1], item[2], item[3], item[4], item[6], name, value)
            )
            item[6] += 1

    def _close_to(self, depth: int) -> None:
        while self._caps and self._caps[-1][0] >= depth:
            d, item, names, attr_val, chunks = self._caps.pop()
            value = attr_val if attr_val is not None else _squeeze_ws("".join(chunks))
            self._emit(item, names, value)
        while self._items and self._items[-1][0] >= depth:
            it = self._items.pop()
            if it[5] == 0 and it[6] == 0:
                # leaf item with no props at all: marker row
                self.rows.append((it[1], it[2], it[3], it[4], None, None, None))

    def _handle(self, tag, attrs, self_closing: bool) -> None:
        a = {}
        for k, v in attrs:
            if k not in a:  # first occurrence wins (duplicate-attr pin)
                a[k] = v
        scope = "itemscope" in a
        prop = (a.get("itemprop") or "").split()
        here = self._depth
        if scope:
            parent = self._innermost()
            if parent is not None:
                parent[5] += 1  # nested item counts as a property binding
            item = [
                here,
                self._n_items,
                parent[1] if parent else None,
                " ".join(prop) if prop else None,
                a.get("itemtype") or None,
                0,
                0,
            ]
            self._n_items += 1
            if self_closing or tag in _VOID_TAGS:
                # immediately-closed empty item
                self.rows.append(
                    (item[1], item[2], item[3], item[4], None, None, None)
                )
            else:
                self._items.append(item)
        elif prop:
            item = self._innermost()
            if item is not None:
                attr_val = None
                if a.get("content"):
                    attr_val = a["content"]
                else:
                    ua = _URL_ATTR.get(tag)
                    if ua and a.get(ua):
                        attr_val = a[ua]
                if self_closing or tag in _VOID_TAGS:
                    self._emit(item, prop, attr_val)
                else:
                    self._caps.append([here, item, prop, attr_val, []])
        if not self_closing and tag not in _VOID_TAGS:
            self._depth += 1

    def handle_starttag(self, tag, attrs):
        self._handle(tag, attrs, False)

    def handle_startendtag(self, tag, attrs):
        self._handle(tag, attrs, True)

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:
            return
        if self._depth > 0:
            self._depth -= 1
            self._close_to(self._depth)

    def handle_data(self, data):
        for cap in self._caps:
            if cap[3] is None:  # attribute value wins; no text collection
                cap[4].append(data)

    def finish(self):
        self._close_to(0)
        return self.rows


def microdata_nested_one(html_text: str) -> list:
    w = _MicroWalker()
    try:
        w.feed(html_text)
        w.close()
    except Exception:
        pass
    return w.finish()


MICRODATA_NESTED_SCHEMA = (
    "url string, item_id long, parent_id long, parent_prop string, "
    "itemtype string, prop_pos long, prop string, value string"
)


def extract_microdata_nested(df, html_col: str = "html", url_col: str = "url"):
    """Nested schema.org microdata over the html column: ONE Arrow-batched
    mapInPandas pass (html dies in the map — only the small scalar rows
    continue, nothing shuffles in this op)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            cols = {k: [] for k in (
                "url", "item_id", "parent_id", "parent_prop",
                "itemtype", "prop_pos", "prop", "value",
            )}
            for url, html in zip(pdf[url_col], pdf[html_col]):
                if html is None:
                    continue
                text = html if isinstance(html, str) else bytes(html).decode(
                    "utf-8", "replace"
                )
                for (iid, par, pprop, ity, pos, prop, val) in microdata_nested_one(text):
                    cols["url"].append(url)
                    cols["item_id"].append(iid)
                    cols["parent_id"].append(par)
                    cols["parent_prop"].append(pprop)
                    cols["itemtype"].append(ity)
                    cols["prop_pos"].append(pos)
                    cols["prop"].append(prop)
                    cols["value"].append(val)
            yield pd.DataFrame(
                {
                    "url": pd.Series(cols["url"], dtype="object"),
                    "item_id": pd.Series(cols["item_id"], dtype="int64"),
                    "parent_id": pd.Series(cols["parent_id"], dtype="object"),
                    "parent_prop": pd.Series(cols["parent_prop"], dtype="object"),
                    "itemtype": pd.Series(cols["itemtype"], dtype="object"),
                    "prop_pos": pd.Series(cols["prop_pos"], dtype="object"),
                    "prop": pd.Series(cols["prop"], dtype="object"),
                    "value": pd.Series(cols["value"], dtype="object"),
                }
            )

    return df.select(url_col, html_col).mapInPandas(
        run, schema=MICRODATA_NESTED_SCHEMA
    )


# -- independent golden: hand-rolled tag tokenizer (no HTMLParser) -----------

_GOLDEN_TAG_RE = None  # compiled lazily in naive_microdata_nested
_GOLDEN_ATTR_RE = None


def naive_microdata_nested(html_text: str) -> list:
    """Golden twin of :func:`microdata_nested_one`: a from-scratch
    character-scan tokenizer (comments, script/style raw-text modes,
    quoted/unquoted attributes, entity decoding via html.unescape) feeding
    the same emission contract.  Deliberately shares NO parsing code with
    the engine path."""
    import html as _htmllib
    import re as _re

    global _GOLDEN_TAG_RE, _GOLDEN_ATTR_RE
    if _GOLDEN_TAG_RE is None:
        _GOLDEN_TAG_RE = _re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9:-]*)")
        _GOLDEN_ATTR_RE = _re.compile(
            r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)"
            r"(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*))?"
        )
    rows: list = []
    n_items = 0
    depth = 0
    items: list = []  # [depth, id, parent, pprop, itype, n_bind, n_rows]
    caps: list = []  # [depth, item, names, attr_val, chunks]
    i, n = 0, len(html_text)

    def close_to(d: int) -> None:
        while caps and caps[-1][0] >= d:
            _d, item, names, attr_val, chunks = caps.pop()
            if attr_val is not None:
                value = attr_val
            else:
                joined = " ".join("".join(chunks).split())
                value = joined if joined else None
            for name in names:
                rows.append((item[1], item[2], item[3], item[4], item[6], name, value))
                item[6] += 1
        while items and items[-1][0] >= d:
            it = items.pop()
            if it[5] == 0 and it[6] == 0:
                rows.append((it[1], it[2], it[3], it[4], None, None, None))

    rawtext_until = None  # inside <script>/<style>: skip to the close tag
    while i < n:
        if rawtext_until is not None:
            j = html_text.lower().find(rawtext_until, i)
            if j < 0:
                break
            i = j
            rawtext_until = None
            continue
        lt = html_text.find("<", i)
        if lt < 0:
            for cap in caps:
                if cap[3] is None:
                    cap[4].append(_htmllib.unescape(html_text[i:]))
            break
        if lt > i:
            for cap in caps:
                if cap[3] is None:
                    cap[4].append(_htmllib.unescape(html_text[i:lt]))
        if html_text.startswith("<!--", lt):
            end = html_text.find("-->", lt + 4)
            i = n if end < 0 else end + 3
            continue
        m = _GOLDEN_TAG_RE.match(html_text, lt)
        if not m:
            # bogus markup: "<" data or declarations; skip past the bracket
            end = html_text.find(">", lt + 1)
            i = n if end < 0 else end + 1
            continue
        closing, tag = m.group(1) == "/", m.group(2).lower()
        gt = html_text.find(">", m.end())
        if gt < 0:
            break
        inner = html_text[m.end() : gt]
        self_closing = inner.rstrip().endswith("/")
        i = gt + 1
        if closing:
            if tag not in _VOID_TAGS and depth > 0:
                depth -= 1
                close_to(depth)
            continue
        attrs = {}
        for am in _GOLDEN_ATTR_RE.finditer(inner.rstrip("/ ")):
            k = am.group(1).lower()
            v = am.group(2)
            if v is None:
                v = None
            elif v[:1] in "\"'":
                v = _htmllib.unescape(v[1:-1])
            else:
                v = _htmllib.unescape(v)
            if k not in attrs:
                attrs[k] = v
        scope = "itemscope" in attrs
        prop = (attrs.get("itemprop") or "").split()
        if scope:
            parent = items[-1] if items else None
            if parent is not None:
                parent[5] += 1
            item = [
                depth, n_items, parent[1] if parent else None,
                " ".join(prop) if prop else None,
                attrs.get("itemtype") or None, 0, 0,
            ]
            n_items += 1
            if self_closing or tag in _VOID_TAGS:
                rows.append((item[1], item[2], item[3], item[4], None, None, None))
            else:
                items.append(item)
        elif prop and items:
            item = items[-1]
            attr_val = None
            if attrs.get("content"):
                attr_val = attrs["content"]
            else:
                ua = _URL_ATTR.get(tag)
                if ua and attrs.get(ua):
                    attr_val = attrs[ua]
            if self_closing or tag in _VOID_TAGS:
                for name in prop:
                    rows.append(
                        (item[1], item[2], item[3], item[4], item[6], name, attr_val)
                    )
                    item[6] += 1
            else:
                caps.append([depth, item, prop, attr_val, []])
        if not self_closing and tag not in _VOID_TAGS:
            depth += 1
            if tag in ("script", "style"):
                rawtext_until = f"</{tag}"
    close_to(0)
    return rows
