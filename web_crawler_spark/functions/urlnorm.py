"""RFC 3986 URL canonicalization — row function + vectorized pandas UDF.

The reference enqueues raw hrefs verbatim (a gap: SURVEY.md §2.2 P5); the
north rule requires canonicalization before the URL-seen check: lowercase
scheme/host, strip default ports, percent-decode unreserved characters,
uppercase remaining percent-escapes, remove dot segments, empty path -> "/",
drop fragments.  Everything is pure-Python-per-row *inside* an Arrow batch
(ArrowEvalPython), with a vectorized fast path that leaves already-canonical
URLs untouched without entering Python per-element work.
"""

from __future__ import annotations

import re
from typing import Optional
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_DEFAULT_PORTS = {"http": 80, "https": 443, "ws": 80, "wss": 443, "ftp": 21}
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_HEX = "0123456789ABCDEFabcdef"

# Fast path: urls that canonicalization cannot change — lowercase scheme+host,
# no port, no userinfo, no percent-escapes, no dot segments, no fragment,
# non-empty path of safe chars, optional query of safe chars.  The pattern
# strings are shared verbatim between the pandas fast path and the JVM-side
# rlike mask (Java and Python regex agree on this subset).
_CANONICAL_RE_STR = (
    r"^https?://[a-z0-9](?:[a-z0-9.-]*[a-z0-9])?"
    r"/[A-Za-z0-9\-._~!$&'()*+,;=:@/]*"
    # non-empty query only: a bare trailing '?' (empty query) is dropped by
    # canonicalization, so it must take the slow path
    r"(?:\?[A-Za-z0-9\-._~!$&'()*+,;=:@/?]+)?$"
)
_DOTSEG_RE_STR = r"/\.\.?(?:/|$)|^\.\.?(?:/|$)"
_CANONICAL_RE = re.compile(_CANONICAL_RE_STR)
_DOTSEG_RE = re.compile(_DOTSEG_RE_STR)


def _norm_pct(component: str) -> str:
    """Percent-decode unreserved chars; uppercase the hex of remaining escapes."""
    if "%" not in component:
        return component
    out = []
    i, n = 0, len(component)
    while i < n:
        ch = component[i]
        if ch == "%" and i + 2 <= n - 1 and component[i + 1] in _HEX and component[i + 2] in _HEX:
            decoded = chr(int(component[i + 1 : i + 3], 16))
            if decoded in _UNRESERVED:
                out.append(decoded)
            else:
                out.append("%" + component[i + 1 : i + 3].upper())
            i += 3
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _encode_ws(component: str) -> str:
    """Percent-encode whitespace in a path/query component.  Raw whitespace
    is illegal in a URL, and edge whitespace breaks the canonical fixpoint:
    'http://h/ #' would canonicalize to 'http://h/ ', which the next pass
    strip()s to 'http://h/' — found by the hypothesis fixpoint property in
    tests/test_urlnorm.py."""
    if not any(c.isspace() for c in component):
        return component
    out = []
    for c in component:
        if c.isspace():
            out.extend(f"%{b:02X}" for b in c.encode("utf-8"))
        else:
            out.append(c)
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    output: list[str] = []
    buf = path
    while buf:
        if buf.startswith("../"):
            buf = buf[3:]
        elif buf.startswith("./"):
            buf = buf[2:]
        elif buf.startswith("/./"):
            buf = "/" + buf[3:]
        elif buf == "/.":
            buf = "/"
        elif buf.startswith("/../"):
            buf = "/" + buf[4:]
            if output:
                output.pop()
        elif buf == "/..":
            buf = "/"
            if output:
                output.pop()
        elif buf in (".", ".."):
            buf = ""
        else:
            i = buf.find("/", 1) if buf.startswith("/") else buf.find("/")
            if i == -1:
                output.append(buf)
                buf = ""
            else:
                output.append(buf[:i])
                buf = buf[i:]
    return "".join(output)


def canonicalize_url(url: Optional[str]) -> Optional[str]:
    """Canonical form of an absolute http(s)/ws/ftp URL; None for non-absolute
    or unparseable input (relative hrefs have no authority -> not fetchable,
    mirroring the reference where they simply fail to fetch)."""
    if url is None:
        return None
    url = url.strip()
    if not url:
        return None
    try:
        parts = urlsplit(url)
        host = parts.hostname
        port = parts.port
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if not scheme or host is None or host == "":
        return None
    host = host.lower().rstrip(".")
    if not host:
        # a dots-only authority ("http://.") strips to nothing — not a
        # fetchable host; returning "http:///" would break idempotence
        # (canon(canon(u)) flips to None), caught by the hypothesis fixpoint
        # property in tests/test_urlnorm.py
        return None
    netloc = host
    if "@" in parts.netloc:
        userinfo = parts.netloc.rsplit("@", 1)[0]
        netloc = f"{userinfo}@{host}"
    if port is not None and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{netloc}:{port}"
    path = _encode_ws(_norm_pct(parts.path))
    path = _remove_dot_segments(path)
    if not path:
        path = "/"
    out = f"{scheme}://{netloc}{path}"
    if parts.query:
        out += "?" + _encode_ws(_norm_pct(parts.query))
    return out  # fragment dropped


def _canonicalize_series(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalization: a regex fast path keeps already-canonical
    urls out of per-element Python; only the messy residue is mapped."""
    s = urls.astype("object")
    mask_str = s.notna()
    fast = pd.Series(False, index=s.index)
    if mask_str.any():
        fast = s.where(mask_str, "").astype(str).str.match(_CANONICAL_RE) & mask_str
        # fast-path candidates must also be free of dot segments
        has_dotseg = s.where(mask_str, "").astype(str).str.contains(_DOTSEG_RE)
        fast &= ~has_dotseg
    out = s.copy()
    slow_idx = s.index[mask_str & ~fast]
    if len(slow_idx):
        out.loc[slow_idx] = [canonicalize_url(u) for u in s.loc[slow_idx]]
    out.loc[~mask_str] = None
    return out


@pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return _canonicalize_series(urls)


def fast_canonical_mask(col) -> "F.Column":
    """JVM-side already-canonical test (same patterns as the pandas fast
    path): true => canonicalize_url(u) == u, whole-stage-codegen cheap."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        c.rlike(_CANONICAL_RE_STR) & ~c.rlike(_DOTSEG_RE_STR), F.lit(False)
    )


def with_canonical_split(
    df,
    src_col: str = "url",
    out_col: str = "url",
    assume_materialized: bool = True,
):
    """Canonicalize a column with the Arrow crossing paid ONLY by the messy
    residue: a JVM rlike mask routes already-canonical urls (the vast
    majority of real link corpora) around the Python UDF entirely.  The
    per-row Python canonicalizer is the single source of truth — the mask is
    provably conservative (property-tested: mask => fixpoint).

    Plan shape: filter(mask) ∪ filter(!mask)->ArrowEvalPython.  The two
    branches recompute their common input, so feed this from a materialized
    (persisted / checkpointed / scanned) frame — in the engine the upstream
    parse output is already persisted, making the recompute a cache read.
    A caller that CANNOT guarantee that (r3 ADVICE: an expensive lazy
    upstream would silently execute twice) passes
    ``assume_materialized=False`` and this function eagerly
    localCheckpoints the input before branching.
    Scale note: this turns canonicalization from an every-row Python
    crossing (Arrow serialize + socket + deserialize per url, the dominant
    sched cost at high executor counts) into a codegen'd regex."""
    if not assume_materialized:
        df = df.localCheckpoint(eager=True)
    fast = df.filter(fast_canonical_mask(src_col))
    if out_col != src_col:
        fast = fast.withColumn(out_col, F.col(src_col))
    slow = df.filter(~fast_canonical_mask(src_col)).withColumn(
        out_col, canonicalize_udf(F.col(src_col))
    )
    return fast.unionByName(slow)


def with_canonical_url(df, src_col: str = "url", out_col: str = "url_canon"):
    """Attach canonical url + 64-bit JVM-side hash key (the seen-set key)."""
    return df.withColumn(out_col, canonicalize_udf(F.col(src_col))).withColumn(
        out_col + "_hash", F.xxhash64(F.col(out_col))
    )


def host_of(col):
    """Politeness partition key: JVM-side host extraction (SURVEY §2.2 P7)."""
    return F.lower(F.parse_url(col, F.lit("HOST")))


# --- canonicalization rule audit ---------------------------------------------
#
# Before standing up a 10^10-URL frontier you want to know WHICH
# normalization rules actually move URLs on your crawl's candidate mix —
# rules that fire on ~0 ppm are dead plan weight, rules that collapse many
# distinct raw URLs are the dedup win that sizes the seen store.  The audit
# counts, per rule, how many candidates exhibit the rule's precondition
# (all JVM regex predicates — the scan never enters Python), plus the
# end-to-end effect rows: how many URLs the full canonicalizer changes and
# how many distinct raw spellings collapse into shared canonical forms.

_AUDIT_RULES = [
    # (rule, regex over the raw URL; path-scoped rules extract the path first)
    ("fragment", r"#"),
    ("whitespace", r"[ \t\n\r]"),
    ("upper_authority", r"^([^:/?#]*[A-Z][^:/?#]*://|[^:/?#]*://[^/?#]*[A-Z])"),
    ("default_port", r"(?i)^(http://[^/?#]*:80|https://[^/?#]*:443)([/?#]|$)"),
    ("pct_triplet", r"%[0-9A-Fa-f]{2}"),
    ("empty_path", r"^[^:/?#]+://[^/?#]+([?#].*)?$"),
]
_AUDIT_PATH_RULE = ("dot_segments", r"/\.\.?(/|$)|^\.\.?(/|$)")
_AUDIT_PATH_EXTRACT = r"^[^:/?#]*://[^/?#]*([^?#]*)"


def urlnorm_audit(df, raw_col: str = "raw"):
    """(rule, n_urls, n_affected, affected_ppm) — one row per
    canonicalization rule precondition plus 'changed' (full canonicalizer
    output differs) and 'collapsed' (distinct raw spellings minus distinct
    canonical forms).  One pass over the candidates: every predicate is a
    JVM regex riding the same scan; the canonical form itself is the
    existing fast-path/Arrow split, and the two distinct counts share one
    partial-agg'd exchange."""
    raw = F.col(raw_col)
    canon = df.select(
        raw.alias("raw_u"), canonicalize_udf(raw).alias("canon_u")
    ).localCheckpoint(eager=True)
    flags = [
        F.sum(F.when(F.col("raw_u").rlike(rx), 1).otherwise(0))
        .cast("long")
        .alias(f"n_{name}")
        for name, rx in _AUDIT_RULES
    ]
    path = F.regexp_extract(F.col("raw_u"), _AUDIT_PATH_EXTRACT, 1)
    flags.append(
        F.sum(F.when(path.rlike(_AUDIT_PATH_RULE[1]), 1).otherwise(0))
        .cast("long")
        .alias(f"n_{_AUDIT_PATH_RULE[0]}")
    )
    agg = canon.agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum(F.when(F.col("canon_u") != F.col("raw_u"), 1).otherwise(0))
        .cast("long")
        .alias("n_changed"),
        F.countDistinct("raw_u").cast("long").alias("n_raw_d"),
        F.countDistinct("canon_u").cast("long").alias("n_canon_d"),
        *flags,
    )
    names = [n for n, _ in _AUDIT_RULES] + [_AUDIT_PATH_RULE[0], "changed"]
    pairs = ", ".join(
        f"'{n}', n_total, n_{n}" if n != "changed" else "'changed', n_total, n_changed"
        for n in names
    )
    stacked = agg.select(
        F.expr(
            f"stack({len(names) + 1}, {pairs},"
            " 'collapsed', n_raw_d, n_raw_d - n_canon_d)"
            " as (rule, n_urls, n_affected)"
        )
    )
    return stacked.select(
        "rule",
        F.col("n_urls").cast("long").alias("n_urls"),
        F.col("n_affected").cast("long").alias("n_affected"),
        F.expr("n_affected * 1000000 DIV greatest(n_urls, 1L)")
        .cast("long")
        .alias("affected_ppm"),
    )


def duck_urlnorm_audit_sql(cands: str) -> str:
    """DuckDB twin over the synth candidates table, whose ``expected``
    column is the independently generated canonical form (same golden the
    urlnorm parity query grades against)."""
    flag_cols = ",\n         ".join(
        f"sum(CASE WHEN regexp_matches(raw, '{rx}') THEN 1 ELSE 0 END)::BIGINT"
        f" AS n_{name}"
        for name, rx in _AUDIT_RULES
    )
    rows = "\n  UNION ALL\n".join(
        f"  SELECT '{n}' AS rule, n_total AS n_urls, n_{n} AS n_affected FROM agg"
        for n, _ in _AUDIT_RULES + [_AUDIT_PATH_RULE]
    )
    return rf"""
WITH agg AS MATERIALIZED (
  SELECT count(*)::BIGINT AS n_total,
         sum(CASE WHEN expected <> raw THEN 1 ELSE 0 END)::BIGINT AS n_changed,
         count(DISTINCT raw)::BIGINT AS n_raw_d,
         count(DISTINCT expected)::BIGINT AS n_canon_d,
         {flag_cols},
         sum(CASE WHEN regexp_matches(
               coalesce(regexp_extract(raw, '{_AUDIT_PATH_EXTRACT}', 1), ''),
               '{_AUDIT_PATH_RULE[1]}') THEN 1 ELSE 0 END)::BIGINT
           AS n_{_AUDIT_PATH_RULE[0]}
  FROM {cands}
),
stacked AS (
{rows}
  UNION ALL
  SELECT 'changed', n_total, n_changed FROM agg
  UNION ALL
  SELECT 'collapsed', n_raw_d, n_raw_d - n_canon_d FROM agg
)
SELECT rule, n_urls, n_affected,
       (n_affected * 1000000 // greatest(n_urls, 1))::BIGINT AS affected_ppm
FROM stacked
"""
