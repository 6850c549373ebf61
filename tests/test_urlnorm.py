"""URL canonicalization: row function vs golden expectations, fast-path vs
slow-path equivalence (property-based), and Spark-UDF plan shape."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from web_crawler_spark import synth
from web_crawler_spark.functions import urlnorm

CASES = [
    ("HTTP://Example.COM/Path", "http://example.com/Path"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/a/./b/../c", "http://example.com/a/c"),
    ("http://example.com/%41%42%61", "http://example.com/ABa"),
    ("http://example.com/%2f%2F", "http://example.com/%2F%2F"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a?q=%41&r=%2f", "http://example.com/a?q=A&r=%2F"),
    ("http://u:p@Example.com:99/x", "http://u:p@example.com:99/x"),
    ("http://example.com./a", "http://example.com/a"),
    ("  http://example.com/a  ", "http://example.com/a"),
    ("/relative/path", None),
    ("no-scheme.example/a", None),
    ("", None),
    (None, None),
    ("http://example.com/../../x", "http://example.com/x"),
    ("http://example.com/a/b/../../../c", "http://example.com/c"),
    # hypothesis-found fixpoint breakers, pinned (see canon(canon(u)) test)
    ("http://.", None),  # dots-only authority strips to no host
    ("http://example.com/ #", "http://example.com/%20"),  # edge space
    ("http://example.com/a b?q= v", "http://example.com/a%20b?q=%20v"),
]


def test_canonicalize_fixed_cases():
    for raw, want in CASES:
        assert urlnorm.canonicalize_url(raw) == want, raw


def test_canonical_is_idempotent():
    for raw, want in CASES:
        if want is not None:
            assert urlnorm.canonicalize_url(want) == want


url_chars = st.text(
    alphabet="abcXYZ019-._~%/?#:@ &=+汉", min_size=0, max_size=30
)


@given(
    scheme=st.sampled_from(["http", "HTTP", "https", "ftp"]),
    host=st.from_regex(r"[A-Za-z0-9.-]{1,20}", fullmatch=True),
    rest=url_chars,
)
@settings(max_examples=300, deadline=None)
def test_fastpath_agrees_with_rowfn(scheme, host, rest):
    """The pandas fast path must never disagree with the row function."""
    raw = f"{scheme}://{host}/{rest}"
    row = urlnorm.canonicalize_url(raw)
    vec = urlnorm._canonicalize_series(pd.Series([raw])).iloc[0]
    assert row == vec


def test_spark_udf_matches_golden(spark, sf_small):
    cands = spark.read.parquet(synth.synth_path("0.001", "url_candidates"))
    got = (
        cands.withColumn("got", urlnorm.canonicalize_udf(F.col("raw")))
        .select("cand_id", "raw", "expected", "got")
        .collect()
    )
    for r in got:
        assert r["got"] == r["expected"], (r["cand_id"], r["raw"])


def test_udf_plan_is_arrow(spark, sf_small):
    cands = spark.read.parquet(synth.synth_path("0.001", "url_candidates"))
    plan = (
        urlnorm.with_canonical_url(cands, "raw", "c")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def test_jvm_fast_mask_is_conservative(spark, sf_small):
    """Wherever the JVM rlike mask claims "already canonical", the per-row
    canonicalizer must be a fixpoint — the mask may only route identity rows
    around the Python UDF."""
    cands = spark.read.parquet(synth.synth_path("0.001", "url_candidates"))
    fast_rows = cands.filter(urlnorm.fast_canonical_mask("raw")).collect()
    assert fast_rows  # the mask actually fires on this corpus
    for r in fast_rows:
        assert urlnorm.canonicalize_url(r["raw"]) == r["raw"], r["raw"]


def test_split_canonicalize_matches_udf(spark, sf_small):
    """with_canonical_split output == plain UDF output, row for row."""
    cands = spark.read.parquet(synth.synth_path("0.001", "url_candidates"))
    got = {
        r["cand_id"]: r["url"]
        for r in urlnorm.with_canonical_split(
            cands.select("cand_id", F.col("raw").alias("url"))
        ).collect()
    }
    want = {
        r["cand_id"]: r["c"]
        for r in cands.select(
            "cand_id", urlnorm.canonicalize_udf(F.col("raw")).alias("c")
        ).collect()
    }
    assert got == want
    # assume_materialized=False guards a lazy upstream (localCheckpoint
    # inside) and must not change the result
    got2 = {
        r["cand_id"]: r["url"]
        for r in urlnorm.with_canonical_split(
            cands.select("cand_id", F.col("raw").alias("url")),
            assume_materialized=False,
        ).collect()
    }
    assert got2 == want


@given(
    scheme=st.sampled_from(["http", "HTTP", "https"]),
    host=st.from_regex(r"[A-Za-z0-9.-]{1,20}", fullmatch=True),
    rest=url_chars,
)
@settings(max_examples=300, deadline=None, derandomize=True)
def test_canonical_idempotent_property(scheme, host, rest):
    """canon(canon(u)) == canon(u) over random inputs — the frontier's
    seen-set key must be a fixpoint or rediscoveries alias (SURVEY §2 P5).
    Found (now pinned in CASES) the dots-only-host and edge-whitespace
    breakers; derandomized for gate stability after a 200k-case fuzz with a
    wider alphabet (tab/NBSP/sub-delims) found no further breakers."""
    c = urlnorm.canonicalize_url(f"{scheme}://{host}/{rest}")
    if c is not None:
        assert urlnorm.canonicalize_url(c) == c


def test_urlnorm_audit_crafted(spark):
    """Rule counters pinned on a crafted candidate mix: each rule fires on
    exactly the rows built to trigger it; collapsed = distinct raw minus
    distinct canonical."""
    from web_crawler_spark.functions.urlnorm import urlnorm_audit

    rows = [
        ("HTTP://A.Example/p",),          # upper_authority (+changed)
        ("http://a.example:80/p",),       # default_port (+changed, collapses with ^)
        ("http://a.example/p#frag",),     # fragment (+changed, collapses)
        ("http://a.example/x/../p",),     # dot_segments (+changed, collapses)
        ("http://a.example/%41",),        # pct_triplet (+changed)
        ("http://a.example",),            # empty_path (+changed)
        ("http://a.example/ok",),         # clean — nothing fires
    ]
    df = spark.createDataFrame(rows, "raw string")
    got = {r["rule"]: (r["n_urls"], r["n_affected"]) for r in
           urlnorm_audit(df).collect()}
    n = len(rows)
    assert got["fragment"] == (n, 1)
    assert got["whitespace"] == (n, 0)
    assert got["upper_authority"] == (n, 1)
    assert got["default_port"] == (n, 1)
    assert got["pct_triplet"] == (n, 1)
    assert got["empty_path"] == (n, 1)
    assert got["dot_segments"] == (n, 1)
    assert got["changed"] == (n, 6)
    # canonical forms: 4 spellings of http://a.example/p collapse to one,
    # /%41 -> /A, bare host -> /, /ok stays: 7 raw -> 4 canonical
    assert got["collapsed"] == (7, 3)
