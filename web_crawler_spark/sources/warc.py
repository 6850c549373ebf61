"""WARC ingestion — Common Crawl's native archive format.

The engine's pages table (`url, warc_ts, html, ...`) models Common-Crawl
content; this source closes the loop by reading that table's shape straight
out of WARC response records.

Scale model: Common Crawl ships each monthly crawl as ~64-90k WARC files of
~1 GB; the unit of parallelism is the FILE (gzip members are not
byte-splittable, and the file count already exceeds any cluster's task
slots), so the reader enumerates the glob on the driver and assigns exactly
one file per task.  This is one of the rare legitimate RDD uses
(per-partition imperative byte scanning over an opaque format); everything
downstream is a DataFrame.  The sandbox writes/reads uncompressed ``.warc``
— real ``.warc.gz`` only changes the decode step, not the plan.

Record simplification vs warcio (absent from this container): payload bytes
are the raw html (no nested HTTP headers); the header grammar parsed here
(``WARC/1.0`` + ``Name: value`` lines + ``Content-Length`` + blank line +
payload + CRLF CRLF) is the real framing per ISO 28500.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StructField,
    StructType,
    StringType,
    TimestampType,
)

WARC_DT = "%Y-%m-%dT%H:%M:%SZ"

READ_SCHEMA = StructType(
    [
        StructField("url", StringType(), True),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
    ]
)


def write_warc(records, path: str) -> int:
    """Write (url, ts, html) records as WARC response records; returns the
    record count.  Atomic (tmp + rename) so cached fixtures never go half
    written."""
    n = 0
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        for url, ts, html in records:
            payload = bytes(html) if html is not None else b""
            head = (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: {ts.strftime(WARC_DT)}\r\n"
                f"Content-Length: {len(payload)}\r\n"
                "\r\n"
            ).encode("utf-8")
            f.write(head)
            f.write(payload)
            f.write(b"\r\n\r\n")
            n += 1
    os.replace(tmp, path)
    return n


def parse_warc_member(data: bytes) -> Iterator[tuple]:
    """Yield (url, warc_ts, html) from one WARC file's bytes.  Tolerant:
    records that are not type=response, lack a target URI, or are truncated
    are skipped, never raised — a 90k-file ingest must not die on one bad
    record."""
    i, n = 0, len(data)
    while i < n:
        j = data.find(b"\r\n\r\n", i)
        if j < 0:
            break
        head = data[i : j].decode("utf-8", "replace")
        if not head.startswith("WARC/"):
            # resync: find the next record marker
            k = data.find(b"WARC/1.0", i + 1)
            if k < 0:
                break
            i = k
            continue
        fields = {}
        for line in head.split("\r\n")[1:]:
            if ": " in line:
                key, val = line.split(": ", 1)
                fields[key.strip().lower()] = val.strip()
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            i = j + 4
            continue
        payload = data[j + 4 : j + 4 + length]
        i = j + 4 + length + 4  # skip the CRLF CRLF record separator
        if len(payload) < length:
            break  # truncated tail
        if fields.get("warc-type", "response") != "response":
            continue
        url = fields.get("warc-target-uri")
        if not url:
            continue
        ts = None
        raw_ts = fields.get("warc-date")
        if raw_ts:
            try:
                ts = datetime.strptime(raw_ts, WARC_DT).replace(
                    tzinfo=timezone.utc
                )
            except ValueError:
                ts = None
        yield url, ts, payload


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """DataFrame(url, warc_ts, html) over a WARC file glob, exactly one task
    per file — the Common-Crawl parallelism unit (~64-90k files/crawl; gzip
    members are not byte-splittable, so the file IS the split).  The file
    list is enumerated on the driver (tiny: one string per file) and each
    task opens its own file, so partitioning never depends on input-format
    split grouping.  Paths are whatever the executors can open (posix here;
    an object-store deployment mounts or swaps the open())."""
    import glob as _glob

    files = sorted(_glob.glob(path_glob))
    if not files:
        return spark.createDataFrame([], READ_SCHEMA)

    def to_rows(paths):
        for p in paths:
            with open(p, "rb") as f:
                data = f.read()
            for url, ts, payload in parse_warc_member(data):
                yield (
                    url,
                    ts.replace(tzinfo=None) if ts else None,
                    bytearray(payload),
                )

    rdd = spark.sparkContext.parallelize(files, len(files)).mapPartitions(to_rows)
    return spark.createDataFrame(rdd, READ_SCHEMA)


def ensure_warc_fixture(sf: str, n_files: int = 4) -> str:
    """Derive (once) a deterministic WARC rendering of the synth pages table:
    row i goes to file i % n_files, preserving order within each file.
    Cached under the synth dir, keyed by the synth version marker the pages
    table itself is keyed by."""
    from .. import synth

    synth.ensure_synth(sf)
    out_dir = os.path.join(synth.synth_dir(sf), f"warc{n_files}")
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(synth.synth_path(sf, "pages"), columns=["url", "warc_ts", "html"])
    urls = t.column("url").to_pylist()
    tss = t.column("warc_ts").to_pylist()
    htmls = t.column("html").to_pylist()
    for f_idx in range(n_files):
        recs = [
            (urls[i], tss[i], htmls[i])
            for i in range(f_idx, len(urls), n_files)
        ]
        write_warc(recs, os.path.join(out_dir, f"part-{f_idx:05d}.warc"))
    with open(marker, "w") as f:
        f.write(synth.SYNTH_VERSION)
    return out_dir


def write_warc_dir(df: DataFrame, out_dir: str, n_files: int | None = None) -> None:
    """Distributed WARC sink — the inverse of :func:`read_warc`: every task
    renders its partition as one ``part-{pid}.warc`` file (atomic tmp+rename
    per file, so a retried task overwrites rather than corrupts).  Executors
    must share ``out_dir`` (same box here; a cluster points this at shared
    storage).  ``n_files`` optionally repartitions first to bound the
    archive count."""
    from pyspark import TaskContext

    os.makedirs(out_dir, exist_ok=True)
    data = df.select("url", "warc_ts", "html")
    if n_files is not None:
        data = data.repartition(n_files)

    def dump(rows) -> None:
        rows = list(rows)
        if not rows:
            return
        pid = TaskContext.get().partitionId()
        write_warc(
            ((r["url"], r["warc_ts"], r["html"]) for r in rows),
            os.path.join(out_dir, f"part-{pid:05d}.warc"),
        )

    data.foreachPartition(dump)


# --- revisit records (archive-side payload dedup) ---------------------------


def revisit_records(
    snapshots: "list[DataFrame]",
    carry_payload: bool = False,
    repartition_to: "int | None" = None,
) -> DataFrame:
    """WARC ``revisit`` typing (WARC 1.1 §6.7.2, "identical payload digest"
    profile) across one or more crawl snapshots: the FIRST capture of each
    distinct payload is archived as a full ``response`` record; every later
    byte-identical capture becomes a ``revisit`` record that points at the
    original capture instead of re-storing the body — the dedup that keeps a
    monthly re-crawl's archives from carrying unchanged pages twice.

    Output (one row per capture): ``url, ts_us, digest, record_type``
    (``response`` | ``revisit``), ``refers_to_url, refers_to_ts_us`` (NULL
    on response rows), ``bytes_saved`` (the payload length the archive did
    NOT store again; 0 on response rows).

    Scale shape: each snapshot is digested map-side (md5 + octet_length —
    page bodies never enter the shuffle), the union exchanges ONCE on
    digest, and the original-capture winner resolves inside that partition
    with a single (ts, url)-ordered window.  A payload shared by k captures
    costs k rows in one partition — linear, unlike pairwise-join dedup.
    Parity: the reference sink stores every fetch unconditionally
    (web_crawler/storage.py:47-58); revisit typing is that sink's
    archive-scale upgrade, composing with :func:`dedup
    <..plans.recrawl.dedup_snapshots>` which keeps only canonical bodies.

    ``carry_payload=True`` keeps the body column on the typed rows (nulled
    on revisit rows) so a rewriting sink can consume this frame directly —
    bodies then ride the ONE digest exchange and never move again
    (jobs/archive.py); the default drops bodies before the shuffle."""
    from pyspark.sql import Window

    caps = None
    for s in snapshots:
        d = s.select(
            "url",
            F.unix_micros("warc_ts").alias("ts_us"),
            F.md5("html").alias("digest"),
            F.octet_length("html").cast("long").alias("n_bytes"),
            *([F.col("html")] if carry_payload else []),
        )
        caps = d if caps is None else caps.unionByName(d)
    if repartition_to is not None:
        caps = caps.repartition(repartition_to, "digest")
    w = Window.partitionBy("digest").orderBy("ts_us", "url")
    rn = F.row_number().over(w)
    is_orig = rn == 1
    return caps.select(
        "url",
        "ts_us",
        "digest",
        F.when(is_orig, F.lit("response")).otherwise(F.lit("revisit")).alias(
            "record_type"
        ),
        F.when(is_orig, F.lit(None).cast("string"))
        .otherwise(F.first("url").over(w))
        .alias("refers_to_url"),
        F.when(is_orig, F.lit(None).cast("long"))
        .otherwise(F.first("ts_us").over(w))
        .alias("refers_to_ts_us"),
        F.when(is_orig, F.lit(0).cast("long"))
        .otherwise(F.col("n_bytes"))
        .alias("bytes_saved"),
        *([F.when(is_orig, F.col("html")).alias("html")] if carry_payload else []),
    )


def duck_revisit_sql(snapshots: "list[str]") -> str:
    """DuckDB twin of :func:`revisit_records` (md5 over the decoded utf-8
    payload, same convention as :func:`duck_cdx_sql`)."""
    sides = " UNION ALL ".join(
        f"SELECT url, epoch_us(warc_ts)::BIGINT AS ts_us,"
        f" md5(decode(html)) AS digest,"
        f" octet_length(html)::BIGINT AS n_bytes FROM {t}"
        for t in snapshots
    )
    return f"""
WITH caps AS ({sides}),
w AS (
  SELECT url, ts_us, digest, n_bytes,
    row_number() OVER (PARTITION BY digest ORDER BY ts_us, url) AS rn,
    first_value(url) OVER
      (PARTITION BY digest ORDER BY ts_us, url) AS o_url,
    first_value(ts_us) OVER
      (PARTITION BY digest ORDER BY ts_us, url) AS o_ts
  FROM caps)
SELECT url, ts_us, digest,
  CASE WHEN rn = 1 THEN 'response' ELSE 'revisit' END AS record_type,
  CASE WHEN rn = 1 THEN NULL ELSE o_url END AS refers_to_url,
  CASE WHEN rn = 1 THEN NULL ELSE o_ts END AS refers_to_ts_us,
  CASE WHEN rn = 1 THEN 0 ELSE n_bytes END::BIGINT AS bytes_saved
FROM w
"""


# --- CDX capture index -----------------------------------------------------

_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)"


def cdx_index(pages: DataFrame) -> DataFrame:
    """CDX(J)-style capture index over a pages table — the lookup artifact
    every web archive publishes next to its WARCs (Common Crawl's
    ``cc-index``, IA Wayback): one row per capture with a SURT url key so a
    plain lexicographic sort clusters captures of the same page (and of the
    same registrable-domain subtree) together.

    Columns: ``urlkey`` (SURT: lowercased host labels reversed and
    comma-joined, then ``)`` + path — ``http://a.b.example/p`` ->
    ``example,b,a)/p``; fragment dropped, empty path -> ``/``), ``ts14``
    (14-digit UTC capture timestamp), ``url`` (original), ``digest``
    (md5 of the raw payload bytes; the real format uses sha1-b32 — same
    plan, different hash), ``length`` (payload bytes).

    Scale shape: pure map-side JVM string ops — NO shuffle, no Python; at
    100 TB this is a single scan-project pass whose output is written
    sorted-by-urlkey via :func:`write_cdx` (range partition + in-partition
    sort, never a single-task global sort).  Parity target: the reference
    stores per-URL hashed filenames (`web_crawler/storage.py:47-58`); the
    CDX key generalizes that lookup to archive scale.
    """
    host = F.lower(F.regexp_extract("url", _SCHEME_RE, 1))
    path = F.regexp_extract("url", _PATH_RE, 1)
    urlkey = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.lit(")"),
        F.when(F.length(path) == 0, F.lit("/")).otherwise(path),
    )
    return pages.select(
        urlkey.alias("urlkey"),
        F.date_format("warc_ts", "yyyyMMddHHmmss").alias("ts14"),
        F.col("url"),
        F.md5("html").alias("digest"),
        F.octet_length("html").alias("length"),
    )


def duck_cdx_sql(pages: str) -> str:
    """DuckDB twin of :func:`cdx_index` (md5 over decoded utf-8 payload —
    DuckDB 1.0 has no blob md5; the synth html is always valid utf-8)."""
    path = f"regexp_extract(url, '{_PATH_RE}', 1)"
    return f"""
        SELECT
          array_to_string(list_reverse(string_split(
            lower(regexp_extract(url, '{_SCHEME_RE}', 1)), '.')), ',')
            || ')' || (CASE WHEN {path} = '' THEN '/' ELSE {path} END)
            AS urlkey,
          strftime(timezone('UTC', warc_ts), '%Y%m%d%H%M%S') AS ts14,
          url,
          md5(decode(html)) AS digest,
          octet_length(html)::INT AS length
        FROM {pages}
    """


def write_cdx(pages: DataFrame, out_dir: str, n_shards: int = 32) -> None:
    """Write the CDX index as ``n_shards`` lexicographically-ordered text
    shards: ``repartitionByRange(urlkey, ts14)`` picks split points by
    sampling (so hot domains spread across shards by key range, not by
    hash), ``sortWithinPartitions`` orders each shard, and shard files are
    themselves in range order — the standard sorted-run layout a binary
    search / zipper-merge lookup needs.  No global single-task sort."""
    idx = cdx_index(pages)
    line = F.concat_ws(" ", "urlkey", "ts14", "url", "digest", "length")
    (
        idx.repartitionByRange(n_shards, "urlkey", "ts14")
        .sortWithinPartitions("urlkey", "ts14")
        .select(line.alias("value"))
        .write.mode("overwrite")
        .text(out_dir)
    )


# --- revisit-aware WARC writing / reading ------------------------------------


def write_warc_revisits(records, path: str) -> int:
    """Write typed records — ``(url, ts, html, record_type, refers_to_url,
    refers_to_ts)`` — as WARC response/revisit records (WARC 1.1 §6.7.2
    identical-payload-digest profile: revisit records carry
    ``WARC-Refers-To-Target-URI``/``-Date`` and an EMPTY payload — the
    storage saving is the whole point).  Atomic tmp+rename like
    :func:`write_warc`."""
    n = 0
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        for url, ts, html, rtype, ref_url, ref_ts in records:
            is_rev = rtype == "revisit"
            payload = b"" if is_rev else (bytes(html) if html is not None else b"")
            lines = [
                "WARC/1.0",
                f"WARC-Type: {'revisit' if is_rev else 'response'}",
                f"WARC-Target-URI: {url}",
                f"WARC-Date: {ts.strftime(WARC_DT)}",
            ]
            if is_rev:
                lines.append(
                    "WARC-Profile: http://netpreserve.org/warc/1.1/revisit/"
                    "identical-payload-digest"
                )
                lines.append(f"WARC-Refers-To-Target-URI: {ref_url}")
                lines.append(f"WARC-Refers-To-Date: {ref_ts.strftime(WARC_DT)}")
            lines.append(f"Content-Length: {len(payload)}")
            f.write(("\r\n".join(lines) + "\r\n\r\n").encode("utf-8"))
            f.write(payload)
            f.write(b"\r\n\r\n")
            n += 1
    os.replace(tmp, path)
    return n


def parse_warc_typed(data: bytes) -> Iterator[tuple]:
    """Yield (url, warc_ts, payload, record_type, refers_to_url,
    refers_to_ts) from one WARC file's bytes — :func:`parse_warc_member`'s
    grammar, but keeping revisit records instead of skipping them (the
    archive-reader side of :func:`write_warc_revisits`); other non-response
    types are still skipped, and the same malformed-record tolerance
    applies."""
    i, n = 0, len(data)
    while i < n:
        j = data.find(b"\r\n\r\n", i)
        if j < 0:
            break
        head = data[i:j].decode("utf-8", "replace")
        if not head.startswith("WARC/"):
            k = data.find(b"WARC/1.0", i + 1)
            if k < 0:
                break
            i = k
            continue
        fields = {}
        for line in head.split("\r\n")[1:]:
            if ": " in line:
                key, val = line.split(": ", 1)
                fields[key.strip().lower()] = val.strip()
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            i = j + 4
            continue
        payload = data[j + 4 : j + 4 + length]
        i = j + 4 + length + 4
        if len(payload) < length:
            break
        rtype = fields.get("warc-type", "response")
        if rtype not in ("response", "revisit"):
            continue
        url = fields.get("warc-target-uri")
        if not url:
            continue

        def _ts(raw):
            if not raw:
                return None
            try:
                return datetime.strptime(raw, WARC_DT).replace(tzinfo=timezone.utc)
            except ValueError:
                return None

        yield (
            url,
            _ts(fields.get("warc-date")),
            payload,
            rtype,
            fields.get("warc-refers-to-target-uri"),
            _ts(fields.get("warc-refers-to-date")),
        )


# --- CDX front-coding cost model ---------------------------------------------
#
# Published CDX indexes are not stored as plain lines: the sorted urlkey
# stream is prefix-compressed (front-coded — each key stores only the
# suffix after its shared prefix with the previous key, the zipnum /
# WebGraph-successor-list trick), which is why a SURT sort order exists at
# all.  Before committing an index layout you want the exact saving the
# sort buys: per host subtree, how many bytes of sorted-neighbor shared
# prefix disappear.  That number justifies (or kills) the range-partition
# + in-partition sort that write_cdx pays.

def cdx_frontcode(pages: DataFrame) -> DataFrame:
    """(host_key, n_keys, bytes_plain, bytes_shared, saved_ppm) — exact
    front-coding saving of the sorted distinct urlkey stream, per SURT
    host subtree.  bytes_shared is the sum of sorted-neighbor common
    prefixes (the real format re-spends ~1-2 bytes/key on length varints —
    a constant the reader applies; the plan stays integer-exact).

    Scale shape: ONE exchange on host_key — there is no separate distinct
    pass (which would force a second, (host_key, urlkey)-grain exchange):
    duplicate captures sort adjacent inside the lag window, so rows whose
    key equals their predecessor are dropped post-window, and the kept
    rows' lag values are exactly the distinct-stream predecessors.  The
    prefix length is a JVM higher-order expression (filter over sequence,
    no Python): common-prefix equality is monotone, so
    ``array_max(filter(sequence(0, len), n -> substr equal))`` is exact.
    Front-coding never crosses host_key boundaries, matching sharded CDX
    files that reset the coder per shard."""
    from pyspark.sql import Window

    keys = cdx_index(pages).select(
        F.split(F.col("urlkey"), r"\)", 2).getItem(0).alias("host_key"), "urlkey"
    )
    w = Window.partitionBy("host_key").orderBy("urlkey")
    with_prev = keys.withColumn("prev_key", F.lag("urlkey").over(w)).filter(
        F.col("prev_key").isNull() | (F.col("prev_key") != F.col("urlkey"))
    )
    shared = F.expr(
        "CASE WHEN prev_key IS NULL THEN 0L ELSE cast(array_max(filter("
        " sequence(0, least(length(prev_key), length(urlkey))),"
        " n -> substring(prev_key, 1, n) = substring(urlkey, 1, n))) as bigint)"
        " END"
    )
    return (
        with_prev.select("host_key", F.length("urlkey").cast("long").alias("klen"),
                         shared.alias("shared"))
        .groupBy("host_key")
        .agg(
            F.count("*").cast("long").alias("n_keys"),
            F.sum("klen").cast("long").alias("bytes_plain"),
            F.sum("shared").cast("long").alias("bytes_shared"),
        )
        .withColumn(
            "saved_ppm",
            F.expr("bytes_shared * 1000000 DIV greatest(bytes_plain, 1L)").cast("long"),
        )
    )


def duck_cdx_frontcode_sql(pages: str) -> str:
    """DuckDB twin: same SURT keys; the common-prefix length is the max n
    in a correlated generate_series whose substr halves agree (monotone,
    so max over the equal set is exact)."""
    return f"""
WITH keys AS MATERIALIZED (
  SELECT DISTINCT split_part(urlkey, ')', 1) AS host_key, urlkey
  FROM ({duck_cdx_sql(pages)})
),
lagged AS (
  SELECT host_key, urlkey,
         lag(urlkey) OVER (PARTITION BY host_key ORDER BY urlkey) AS prev_key
  FROM keys
),
scored AS (
  SELECT host_key, length(urlkey)::BIGINT AS klen,
         CASE WHEN prev_key IS NULL THEN 0 ELSE list_max(list_filter(
           range(0, least(length(prev_key), length(urlkey)) + 1),
           n -> substr(prev_key, 1, n::INT) = substr(urlkey, 1, n::INT)
         )) END::BIGINT AS shared
  FROM lagged
)
SELECT host_key, count(*)::BIGINT AS n_keys,
       sum(klen)::BIGINT AS bytes_plain,
       sum(shared)::BIGINT AS bytes_shared,
       (sum(shared) * 1000000 // greatest(sum(klen), 1))::BIGINT AS saved_ppm
FROM scored GROUP BY 1
"""
