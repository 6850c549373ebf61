"""WARC source (sources/warc.py): byte-exact round-trip vs the pages table
and malformed-record tolerance."""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import functions as F

from web_crawler_spark import synth
from web_crawler_spark.sources import warc

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def test_parse_round_trip(tmp_path):
    recs = [
        ("http://a.example/1", TS, "<html>one</html>".encode()),
        ("http://a.example/2", TS, b""),  # empty payload
        ("http://b.example/é", TS, "café bytes".encode()),
    ]
    p = str(tmp_path / "rt.warc")
    assert warc.write_warc(recs, p) == 3
    with open(p, "rb") as f:
        got = list(warc.parse_warc_member(f.read()))
    assert [(u, t, bytes(h)) for u, t, h in got] == recs


def test_parse_tolerates_malformed(tmp_path):
    good = ("http://ok.example/x", TS, b"payload")
    p = str(tmp_path / "bad.warc")
    warc.write_warc([good], p)
    data = open(p, "rb").read()
    blob = (
        b"garbage leading bytes\r\n\r\n"  # resyncs to the next WARC/1.0
        + data
        + b"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: http://skip.example\r\n"
        b"Content-Length: 2\r\n\r\nab\r\n\r\n"  # non-response: skipped
        + b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 2\r\n\r\nab\r\n\r\n"  # no URI
        + data[: len(data) - 10]  # truncated tail record
    )
    got = list(warc.parse_warc_member(blob))
    assert [(u, bytes(h)) for u, _, h in got] == [(good[0], good[2])]


def test_read_warc_matches_pages(spark):
    """The graded round-trip in miniature: WARC-rendered pages read back
    equal the parquet pages table byte-for-byte, one task per file."""
    synth.ensure_synth("0.001")
    d = warc.ensure_warc_fixture("0.001", n_files=3)
    got = warc.read_warc(spark, os.path.join(d, "part-*.warc")).select(
        "url",
        F.unix_micros("warc_ts").alias("ts_us"),
        F.md5("html").alias("h"),
    )
    want = spark.read.parquet(synth.synth_path("0.001", "pages")).select(
        "url",
        F.unix_micros("warc_ts").alias("ts_us"),
        F.md5("html").alias("h"),
    )
    assert got.count() == want.count() == 1000
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # exactly one task per file — the Common-Crawl parallelism unit
    assert (
        warc.read_warc(spark, os.path.join(d, "part-*.warc")).rdd.getNumPartitions()
        == 3
    )


def test_write_warc_dir_round_trip(spark, tmp_path):
    """Distributed sink -> reader round-trip on the pages fixture."""
    synth.ensure_synth("0.001")
    pages = spark.read.parquet(synth.synth_path("0.001", "pages")).select(
        "url", "warc_ts", "html"
    )
    out = str(tmp_path / "warcout")
    warc.write_warc_dir(pages, out, n_files=5)
    files = sorted(os.listdir(out))
    assert len(files) == 5 and all(f.endswith(".warc") for f in files)
    back = warc.read_warc(spark, os.path.join(out, "part-*.warc"))
    key = lambda df: df.select(  # noqa: E731
        "url", F.unix_micros("warc_ts").alias("t"), F.md5("html").alias("h")
    )
    assert key(back).exceptAll(key(pages)).count() == 0
    assert key(pages).exceptAll(key(back)).count() == 0


def test_cdx_index_surt_and_plan(spark):
    """SURT key grammar on crafted URLs + the plan is a pure map (no
    exchange, no Python eval)."""
    rows = [
        ("http://A.B.Example/p/1?q=2#frag", TS, b"xy"),
        ("https://example/", TS, b""),
        ("http://example",  TS, b"z"),  # empty path -> '/'
    ]
    df = spark.createDataFrame(
        [(u, t.replace(tzinfo=None), bytearray(h)) for u, t, h in rows],
        warc.READ_SCHEMA,
    )
    got = {r["url"]: r for r in warc.cdx_index(df).collect()}
    assert got["http://A.B.Example/p/1?q=2#frag"]["urlkey"] == "example,b,a)/p/1?q=2"
    assert got["https://example/"]["urlkey"] == "example)/"
    assert got["http://example"]["urlkey"] == "example)/"
    assert got["http://example"]["ts14"] == "20240301120000"
    assert got["http://example"]["length"] == 1
    plan = warc.cdx_index(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_write_cdx_sorted_shards(spark, tmp_path):
    """Shards are each internally sorted and the shard files are in key
    range order (sorted-run layout for binary-search lookup)."""
    import glob

    synth.ensure_synth("0.001")
    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    out = str(tmp_path / "cdx")
    warc.write_cdx(pages, out, n_shards=4)
    files = sorted(glob.glob(os.path.join(out, "part-*")))
    assert len(files) >= 2
    last_key_prev = None
    all_lines = 0
    for p in files:
        keys = []
        with open(p) as f:
            for line in f:
                keys.append(tuple(line.split(" ", 3)[:2]))
        assert keys == sorted(keys)  # in-shard order
        if keys:
            if last_key_prev is not None:
                assert last_key_prev <= keys[0]  # cross-shard range order
            last_key_prev = keys[-1]
            all_lines += len(keys)
    assert all_lines == pages.count()


def test_revisit_records_typing_and_plan(spark):
    ts1 = datetime(2024, 3, 1, 12, 0, 0)
    ts2 = datetime(2024, 4, 1, 12, 0, 0)
    prev = spark.createDataFrame(
        [
            ("http://a.example/1", ts1, bytearray(b"<html>same</html>")),
            ("http://a.example/2", ts1, bytearray(b"<html>old</html>")),
        ],
        "url string, warc_ts timestamp, html binary",
    )
    curr = spark.createDataFrame(
        [
            # unchanged body, later capture -> revisit pointing at prev
            ("http://a.example/1", ts2, bytearray(b"<html>same</html>")),
            # changed body -> fresh response
            ("http://a.example/2", ts2, bytearray(b"<html>new</html>")),
            # different URL, identical body to /1 -> url-agnostic revisit
            ("http://b.example/copy", ts2, bytearray(b"<html>same</html>")),
        ],
        "url string, warc_ts timestamp, html binary",
    )
    out = warc.revisit_records([prev, curr])
    rows = {(r["url"], r["ts_us"]): r for r in out.collect()}
    us1 = int(ts1.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
    orig = rows[("http://a.example/1", us1)]
    assert orig["record_type"] == "response"
    assert orig["refers_to_url"] is None and orig["bytes_saved"] == 0
    us2 = int(ts2.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
    rev = rows[("http://a.example/1", us2)]
    assert rev["record_type"] == "revisit"
    assert rev["refers_to_url"] == "http://a.example/1"
    assert rev["refers_to_ts_us"] == us1
    assert rev["bytes_saved"] == len(b"<html>same</html>")
    # url-agnostic dedup: b.example/copy refers to the a.example original
    xrev = rows[("http://b.example/copy", us2)]
    assert xrev["record_type"] == "revisit"
    assert xrev["refers_to_url"] == "http://a.example/1"
    # changed body is a fresh response on both captures
    assert rows[("http://a.example/2", us1)]["record_type"] == "response"
    assert rows[("http://a.example/2", us2)]["record_type"] == "response"
    # scale shape: every capture row moves exactly once, keyed by digest
    # (Spark pushes the exchange below the union: one Exchange node per
    # snapshot branch, all on digest) — and bodies are digested map-side,
    # so no other partitioning key appears anywhere in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_digest = plan.count("Exchange hashpartitioning(digest")
    assert 1 <= n_digest <= 2
    assert plan.count("Exchange hashpartitioning") == n_digest


def test_revisit_warc_round_trip(tmp_path):
    ts1 = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)
    ts2 = datetime(2024, 4, 1, 12, 0, 0, tzinfo=timezone.utc)
    body = b"<html>same</html>"
    recs = [
        ("http://a.example/1", ts1, body, "response", None, None),
        ("http://a.example/1", ts2, body, "revisit", "http://a.example/1", ts1),
        ("http://b.example/2", ts2, b"<html>x</html>", "response", None, None),
    ]
    p = str(tmp_path / "rv.warc")
    assert warc.write_warc_revisits(recs, p) == 3
    data = open(p, "rb").read()
    # revisit bodies are NOT stored — that's the saving the record encodes
    assert data.count(body) == 1
    assert b"identical-payload-digest" in data
    got = list(warc.parse_warc_typed(data))
    assert [(u, t, bytes(pl), rt, ru, rts) for u, t, pl, rt, ru, rts in got] == [
        ("http://a.example/1", ts1, body, "response", None, None),
        ("http://a.example/1", ts2, b"", "revisit", "http://a.example/1", ts1),
        ("http://b.example/2", ts2, b"<html>x</html>", "response", None, None),
    ]
    # the plain reader still sees only full response records
    plain = list(warc.parse_warc_member(data))
    assert [u for u, _, _ in plain] == ["http://a.example/1", "http://b.example/2"]


def test_revisit_warc_round_trip_property():
    """Property: write -> typed-parse is identity for arbitrary payloads —
    including payloads that EMBED the record separator and the WARC/1.0
    magic (Content-Length framing must win over any content sniffing)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    payloads = st.binary(max_size=200) | st.just(
        b"\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\n"
    )
    urls = st.from_regex(r"http://[a-z]{1,8}\.example/[a-z0-9]{0,12}", fullmatch=True)
    rec = st.tuples(urls, payloads, st.booleans())

    @settings(max_examples=60, deadline=None)
    @given(st.lists(rec, max_size=6))
    def run(recs):
        typed = []
        for k, (u, p, is_rev) in enumerate(recs):
            if is_rev:
                typed.append((u, TS, b"ignored", "revisit", u + "#orig", TS))
            else:
                typed.append((u, TS, p, "response", None, None))
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".warc") as f:
            warc.write_warc_revisits(typed, f.name)
            got = list(warc.parse_warc_typed(open(f.name, "rb").read()))
        want = [
            (u, ts, b"" if rt == "revisit" else bytes(p), rt, ru, rts)
            for (u, ts, p, rt, ru, rts) in typed
        ]
        assert [
            (u, t, bytes(p), rt, ru, rts) for u, t, p, rt, ru, rts in got
        ] == want

    run()


def test_cdx_frontcode_crafted(spark):
    """Front-coding byte math pinned by hand: sorted neighbors within one
    host subtree share prefixes; coding never crosses host_key boundaries;
    duplicate captures of one URL collapse before coding."""
    from datetime import datetime, timezone

    from web_crawler_spark.sources.warc import cdx_frontcode

    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [
        ("http://a.example/p/1", ts, b"x", "t", "en"),
        ("http://a.example/p/1", ts, b"y", "t", "en"),   # dup capture
        ("http://a.example/p/2", ts, b"x", "t", "en"),
        ("http://a.example/q", ts, b"x", "t", "en"),
        ("http://b.example/p/1", ts, b"x", "t", "en"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    got = {r["host_key"]: r for r in cdx_frontcode(pages).collect()}
    # a.example keys sorted: example,a)/p/1  example,a)/p/2  example,a)/q
    a = got["example,a"]
    assert a["n_keys"] == 3
    assert a["bytes_plain"] == len("example,a)/p/1") * 2 + len("example,a)/q")
    # shared: 0 (first), len("example,a)/p/") = 13, len("example,a)/") = 11
    assert a["bytes_shared"] == 13 + 11
    b = got["example,b"]
    assert (b["n_keys"], b["bytes_shared"]) == (1, 0)
    assert a["saved_ppm"] == a["bytes_shared"] * 1_000_000 // a["bytes_plain"]
