"""Proxy-pool surface (SURVEY.md §2.1 S5/S6, §2.3 F5/F6, §2.5 A3/A4, §2.8 K5).

The reference manages a live proxy pool (fetch from 11 public sources, parse
4 list formats, rotate, validate — reference proxy_manager.py).  An offline
Spark engine has no network, but the *dataflow* is fully reproducible and
useful: multi-source scan -> per-format parse -> union -> ordered dedup ->
failure filtering -> pool stats.  Everything runs as DataFrame ops so a
million-line proxy dump processes the same as ten lines.

Format parsers mirror the reference's:
  * plain text       one ``ip:port`` per line            (:94-104)
  * generic          regex ``(\\d{1,3}\\.){3}\\d{1,3}:\\d{2,5}`` scraped out
                     of arbitrary HTML/text              (:123-133)
  * freeproxy-world  table scrape: >=8-col rows, col6 'no' => dead, col0 ip,
                     col1 port, col5 anchor texts = protocols (:135-161)
  * proxydb          table scrape: >=9-col rows, col0 ip, col1 (anchor or
                     text) port, col2 protocol           (:163-181)
The table scrapes run as an Arrow-batched pandas UDF over whole-file content
(one blob per source page) using a stdlib-HTMLParser row collector — the
reference's bs4 CSS scoping is approximated structurally by column count,
matching its own "best-effort, layout can change" stance (:142).
Protocol prefixes are normalized to ``protocol://ip:port``; entries without a
``:`` are dropped (:75).  SOCKS detection = scheme prefix test
(http_client.py:27-31).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from ..operators.dedup import first_wins

PROXY_RE = r"(\d{1,3}\.){3}\d{1,3}:\d{2,5}"
_EXTRACT_RE = r"((?:\d{1,3}\.){3}\d{1,3}:\d{2,5})"


def parse_plain(df: DataFrame, protocol: str = "http") -> DataFrame:
    """One proxy per line; skip blanks; default protocol prefix."""
    line = F.trim(F.col("value"))
    return (
        df.select(line.alias("entry"), F.col("src_pos"))
        .filter((F.length("entry") > 0) & F.col("entry").contains(":"))
        .select(
            F.when(F.col("entry").contains("://"), F.col("entry"))
            .otherwise(F.concat(F.lit(f"{protocol}://"), F.col("entry")))
            .alias("proxy"),
            "src_pos",
        )
    )


def parse_generic(df: DataFrame, protocol: str = "http") -> DataFrame:
    """Regex-scrape ip:port pairs out of arbitrary text/HTML (the reference's
    fallback parser) — JVM-side regexp_extract_all + posexplode.  The
    within-line hit position folds into src_pos low bits (lines are bounded
    far below 1024 hits; monotonically_increasing_id rows-per-partition
    leave 2^63/2^33/1024 headroom)."""
    hits = F.regexp_extract_all(F.col("value"), F.lit(_EXTRACT_RE), F.lit(1))
    return df.select("src_pos", F.posexplode(hits).alias("hit_pos", "entry")).select(
        F.concat(F.lit(f"{protocol}://"), F.col("entry")).alias("proxy"),
        (F.col("src_pos") * 1024 + F.least(F.col("hit_pos"), F.lit(1023))).alias(
            "src_pos"
        ),
    )


_PROTOCOLS = {"http", "https", "socks4", "socks5"}


class _TableRows(HTMLParser):
    """Collect <tr> rows as lists of cells; each cell records its flat text
    and the texts of its <a> children (what the reference's col.select('a')
    reads)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.rows: list[list[dict]] = []
        self._row: "list[dict] | None" = None
        self._cell: "dict | None" = None
        self._in_a = False

    def handle_starttag(self, tag, attrs):
        if tag == "tr":
            self._row = []
        elif tag == "td" and self._row is not None:
            self._cell = {"text": [], "a": []}
        elif tag == "a" and self._cell is not None:
            self._in_a = True
            self._cell["a"].append([])

    def handle_endtag(self, tag):
        if tag == "td" and self._cell is not None:
            self._row.append(
                {
                    "text": "".join(self._cell["text"]).strip(),
                    "a": ["".join(x).strip() for x in self._cell["a"]],
                }
            )
            self._cell = None
        elif tag == "tr" and self._row is not None:
            if self._row:
                self.rows.append(self._row)
            self._row = None
        elif tag == "a":
            self._in_a = False

    def handle_data(self, data):
        if self._cell is not None:
            self._cell["text"].append(data)
            if self._in_a and self._cell["a"]:
                self._cell["a"][-1].append(data)


def _scrape_freeproxy_world(content: str) -> list[str]:
    """proxy_manager.py:135-161 column logic."""
    p = _TableRows()
    try:
        p.feed(content)
        p.close()
    except Exception:
        return []
    out = []
    for cols in p.rows:
        if len(cols) < 8:
            continue
        if cols[6]["text"].lower() == "no":  # marked not alive
            continue
        ip, port, types = cols[0]["text"], cols[1]["text"], cols[5]["a"]
        if not ip or not port or not types:
            continue
        for t in types:
            proto = t.lower()
            if proto in _PROTOCOLS:
                out.append(f"{proto}://{ip}:{port}")
    return out


def _scrape_proxydb(content: str) -> list[str]:
    """proxy_manager.py:163-181 column logic."""
    p = _TableRows()
    try:
        p.feed(content)
        p.close()
    except Exception:
        return []
    out = []
    for cols in p.rows:
        if len(cols) < 9:
            continue
        ip = cols[0]["text"]
        port = cols[1]["a"][0] if cols[1]["a"] else cols[1]["text"]
        proto = cols[2]["text"].lower()
        if ip and port and proto in _PROTOCOLS:
            out.append(f"{proto}://{ip}:{port}")
    return out


def _table_scrape_udf(kind: str):
    fn = _scrape_freeproxy_world if kind == "freeproxy-world" else _scrape_proxydb

    @pandas_udf(ArrayType(StringType()))
    def scrape(contents: pd.Series) -> pd.Series:
        return contents.map(lambda c: fn(c) if c is not None else [])

    return scrape


def parse_table(df: DataFrame, kind: str) -> DataFrame:
    """HTML-table scrape formats (S6): ``df`` holds whole-page ``value``
    content rows; emits (proxy, src_pos) preserving in-page row order."""
    hits = _table_scrape_udf(kind)(F.col("value"))
    return df.select("src_pos", F.posexplode(hits).alias("hit_pos", "proxy")).select(
        "proxy",
        (F.col("src_pos") * 1024 + F.least(F.col("hit_pos"), F.lit(1023))).alias(
            "src_pos"
        ),
    )


def load_sources(spark: SparkSession, paths: list[str], fmt: str = "plain") -> DataFrame:
    """Fan-out scan over proxy source files -> union -> ordered first-wins
    dedup (proxy_manager.py:61-77): all of source i orders before source i+1
    (the reference's sequential extend).  The cross-source order key is the
    composite (src_idx, src_pos) — an additive offset over
    monotonically_increasing_id would collide with its partition_id*2^33
    encoding for any multi-partition source and scramble source order."""
    parts = []
    table_fmt = fmt in ("freeproxy-world", "proxydb")
    for i, p in enumerate(paths):
        raw = spark.read.text(p, wholetext=table_fmt).withColumn(
            "src_pos", F.monotonically_increasing_id()
        )
        if table_fmt:
            parsed = parse_table(raw, fmt)
        elif fmt == "plain":
            parsed = parse_plain(raw)
        else:
            parsed = parse_generic(raw)
        parts.append(parsed.withColumn("src_idx", F.lit(i)))
    merged = parts[0]
    for d in parts[1:]:
        merged = merged.unionByName(d)
    return first_wins(merged, "proxy", ["src_idx", "src_pos"]).select(
        "proxy", "src_idx", "src_pos"
    )


def assign_proxy(
    df: DataFrame,
    pool: list[str],
    url_col: str = "url",
    attempt_col: str | None = None,
    out: str = "proxy",
) -> DataFrame:
    """J3: stateless deterministic proxy assignment — the engine's analog of
    the reference's ``random.choice(available)`` per attempt
    (proxy_manager.py:187-201).  Uniform over the pool via
    ``pmod(xxhash64(url, attempt), n)``: retries rotate to a (usually)
    different proxy, assignment is reproducible across runs (no RNG state),
    and the pool rides as a plan literal (config-side, like the reference's
    in-memory list — not a data-plane table)."""
    if not pool:
        return df.withColumn(out, F.lit(None).cast("string"))
    keys = [F.col(url_col)]
    if attempt_col is not None:
        keys.append(F.col(attempt_col))
    idx = (F.pmod(F.xxhash64(*keys), F.lit(len(pool))) + 1).cast("int")
    return df.withColumn(out, F.element_at(F.array(*[F.lit(p) for p in pool]), idx))


def is_socks(col) -> F.Column:
    """SOCKS-scheme predicate (http_client.py:27-31)."""
    return F.col(col).rlike(r"^socks[45]?://") if isinstance(col, str) else col.rlike(r"^socks[45]?://")


def available(pool: DataFrame, failed: DataFrame) -> DataFrame:
    """pool − failed (proxy_manager.py:187-201); empty result => caller
    refetches/resets, mirroring the reference's self-healing."""
    return pool.join(failed.select("proxy"), on="proxy", how="left_anti")


def pool_stats(pool: DataFrame, failed: DataFrame) -> dict:
    """total/failed/available/failure_rate (proxy_manager.py:203-211)."""
    total = pool.count()
    n_failed = failed.join(pool, "proxy", "left_semi").count()
    avail = total - n_failed
    return {
        "total": total,
        "failed": n_failed,
        "available": avail,
        "failure_rate": (n_failed / total) if total else 0.0,
    }


def validation_summary(results: DataFrame) -> DataFrame:
    """Aggregate a validation-run table (proxy, ok, response_time_ms) into
    the reference's summary (proxy_manager.py:331-352)."""
    return results.agg(
        F.count("*").alias("tested"),
        F.sum(F.col("ok").cast("long")).alias("working"),
        F.sum((~F.col("ok")).cast("long")).alias("failed"),
        F.avg(F.when(F.col("ok"), F.col("response_time_ms"))).alias("avg_ms_working"),
    )


def export_pool(pool: DataFrame, path: str) -> None:
    """One proxy per line (proxy_manager.py:357-363)."""
    pool.select("proxy").coalesce(1).write.mode("overwrite").text(path)


PROXY_FAIL_STATUSES = [407, 502, 503, 504]  # crawler.py:163-166


def proxy_failure_filter(fetch_log: DataFrame) -> DataFrame:
    """Rows whose status marks the proxy as failed (F5)."""
    return fetch_log.filter(F.col("status").isin(PROXY_FAIL_STATUSES))
