"""URL quality gate (functions/urlfilter.py) and deterministic sampling
(functions/sampling.py) vs DuckDB oracles — crafted boundary rows pin the
edge semantics, then the graded synth fixtures end-to-end.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from web_crawler_spark import synth
from web_crawler_spark.functions import sampling, urlfilter

BOUNDARY_URLS = [
    "http://host0.example/articles/fine-story.html",  # 0: clean
    "http://host1.example/img/banner.JPG",  # 1: ext case-folds -> blocked
    "http://host2.example/p/1?a=1&b=2&c=3",  # 2: exactly MAX params -> ok
    "http://host2.example/p/1?a=1&b=2&c=3&d=4",  # 3: one over -> blocked
    "http://host3.example/" + "x" * 180,  # 4: over MAX_URL_LEN
    # 5: exactly MAX_URL_LEN chars ("http://" = 7, ".example/" = 9)
    "http://" + "h" * (urlfilter.MAX_URL_LEN - 16) + ".example/",
    "http://casino.example/win",  # 6: blocklisted host
    "http://host4.example/GAMBLING/tips",  # 7: blocklisted path, mixed case
    "http://host5.example/style.css?v=3",  # 8: ext before query
    "http://host6.example/",  # 9: no path
    "http://host7.example/download.tar.gz",  # 10: compound ext, final token
    "http://host8.example/page?",  # 11: trailing ? -> zero params
    "http://host9.example/p#frag",  # 12: fragment only
    "http://host10.example/file.JPEG#sec",  # 13: ext before fragment
]


@pytest.fixture(scope="module")
def urls(spark, tmp_path_factory):
    pdf = pd.DataFrame({"url_id": range(len(BOUNDARY_URLS)), "url": BOUNDARY_URLS})
    p = str(tmp_path_factory.mktemp("urlgate") / "urls.parquet")
    pdf.to_parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW uu AS SELECT * FROM read_parquet('{p}')")
    return spark.read.parquet(p), con


def _cmp(spark_df, duck_rel, key):
    got = spark_df.toPandas().sort_values(key).reset_index(drop=True)
    want = duck_rel.df().sort_values(key).reset_index(drop=True)
    got, want = got[sorted(got.columns)], want[sorted(want.columns)]
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_url_gate_boundary(urls):
    df, con = urls
    _cmp(
        urlfilter.url_quality_gate(df),
        con.sql(urlfilter.duck_url_gate_sql("uu")),
        ["url_id"],
    )


def test_url_gate_semantics(urls):
    df, _ = urls
    out = {r["url_id"]: r for r in urlfilter.url_quality_gate(df).collect()}
    assert out[0]["keep"]
    assert not out[1]["ext_ok"] and out[1]["ext"] == "jpg"
    assert out[2]["params_ok"] and out[2]["n_params"] == 3
    assert not out[3]["params_ok"] and out[3]["n_params"] == 4
    assert not out[4]["len_ok"]
    assert out[5]["len_ok"]
    assert not out[6]["block_ok"] and not out[7]["block_ok"]
    assert not out[8]["ext_ok"] and out[8]["ext"] == "css"
    assert out[9]["keep"] and out[9]["ext"] == ""
    assert out[10]["keep"] and out[10]["ext"] == "gz"
    assert out[11]["n_params"] == 0
    assert out[12]["keep"]
    assert not out[13]["ext_ok"] and out[13]["ext"] == "jpeg"


def test_url_gate_no_shuffle_no_python(urls):
    """The gate must stay a pure map over the scan: no exchange, no Python."""
    df, _ = urls
    plan = urlfilter.url_quality_gate(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_url_gate_on_synth(spark):
    synth.ensure_synth("0.001")
    p = synth.synth_path("0.001", "weburls")
    df = spark.read.parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW wu AS SELECT * FROM read_parquet('{p}')")
    out = urlfilter.url_quality_gate(df)
    _cmp(out, con.sql(urlfilter.duck_url_gate_sql("wu")), ["url_id"])
    # each signal must fire independently somewhere in the graded fixture
    agg = out.groupBy().agg(
        *[
            F.sum((~out[c]).cast("int")).alias(c)
            for c in ("ext_ok", "params_ok", "len_ok", "block_ok")
        ]
    ).collect()[0]
    assert all(agg[c] > 0 for c in ("ext_ok", "params_ok", "len_ok", "block_ok"))


# -- sampling -----------------------------------------------------------------


@pytest.fixture(scope="module")
def docs(spark, tmp_path_factory):
    langs = ["en", "es", "de", "fr", "zh"]
    sources = [f"src{i % 7}" for i in range(1000)]
    pdf = pd.DataFrame(
        {
            "doc_id": range(1000),
            "lang": [langs[i % 5] for i in range(1000)],
            "source": sources,
        }
    )
    p = str(tmp_path_factory.mktemp("sampling") / "docs.parquet")
    pdf.to_parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW dd AS SELECT * FROM read_parquet('{p}')")
    return spark.read.parquet(p), con


def test_stratified_sample_parity(docs):
    df, con = docs
    _cmp(
        sampling.stratified_sample(df),
        con.sql(sampling.duck_stratified_sample_sql("dd")),
        ["doc_id"],
    )


def test_stratified_sample_semantics(docs):
    df, _ = docs
    out = sampling.stratified_sample(df).toPandas()
    # zh rate is 1000 per-mille: every zh row kept
    assert (out[out.lang == "zh"].shape[0]) == 200
    # en rate 250: binomial(200, .25) — loose determinism-friendly bounds
    n_en = out[out.lang == "en"].shape[0]
    assert 20 <= n_en <= 120
    # deterministic: a second run picks the identical rows
    again = sampling.stratified_sample(df).toPandas()
    assert sorted(out.doc_id) == sorted(again.doc_id)
    # map-side: no exchange in the plan
    plan = (
        sampling.stratified_sample(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_source_cap_parity_and_plan(docs):
    df, con = docs
    out = sampling.source_cap(df)
    _cmp(out, con.sql(sampling.duck_source_cap_sql("dd")), ["doc_id"])
    counts = out.groupBy("source").count().collect()
    assert all(r["count"] == 10 for r in counts)  # every source over-full
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan[plan.index("WindowGroupLimit"):]


def test_shard_stats_parity_and_balance(docs, spark, tmp_path):
    df, con = docs
    df = df.withColumn("n_chars", F.length(F.col("source")).cast("long"))
    import pandas as pd  # register the enriched frame for the oracle
    p = str(tmp_path / "docs_sized.parquet")
    df.toPandas().to_parquet(p)
    con.sql(f"CREATE VIEW ds AS SELECT * FROM read_parquet('{p}')")
    out = sampling.shard_stats(df)
    _cmp(out, con.sql(sampling.duck_shard_stats_sql("ds")), ["shard"])
    rows = out.collect()
    assert len(rows) == 32  # every shard populated at 1000 docs
    assert sum(r["n_docs"] for r in rows) == 1000
    # deterministic balance: no shard more than 3x the mean
    assert max(r["n_docs"] for r in rows) <= 3 * (1000 / 32)


def test_length_histogram_parity(spark, tmp_path):
    from web_crawler_spark.functions import textstats

    texts = ["", " ", "one", "one two", "a b c d", " ".join(["t"] * 8),
             " ".join(["t"] * 1024), " ".join(["t"] * 1023)]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    p = str(tmp_path / "lh.parquet")
    pdf.to_parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lh AS SELECT * FROM read_parquet('{p}')")
    df = spark.read.parquet(p)
    out = textstats.length_histogram(df)
    _cmp(out, con.sql(textstats.duck_length_histogram_sql("lh")), ["len_bucket"])
    got = {r["len_bucket"]: r for r in out.collect()}
    assert got[0]["n_docs"] == 2            # "" and " " are empty
    assert got[1]["n_docs"] == 1            # 1 token
    assert got[11]["min_tokens"] == 1024    # 2^10 sits in bucket 11
    assert got[10]["max_tokens"] == 1023    # 2^10 - 1 sits in bucket 10


# -- sequence packing ---------------------------------------------------------


def test_pack_sequences_parity_and_invariants(spark, tmp_path):
    from web_crawler_spark.functions import packing

    texts = ["", "one", "a b c", " ".join(["t"] * 7), " ".join(["u"] * 300)] + [
        f"w{i} " * (i % 11 + 1) for i in range(200)
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    p = str(tmp_path / "pack.parquet")
    pdf.to_parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW pk AS SELECT * FROM read_parquet('{p}')")
    df = spark.read.parquet(p)
    out = packing.pack_sequences(df, ctx=64, num_partitions=7)
    _cmp(out, con.sql(packing.duck_pack_sequences_sql("pk", ctx=64)), ["doc_id"])
    rows = sorted(out.collect(), key=lambda r: r["tok_offset"])
    # the packed stream is gapless: each doc starts where the previous ended
    pos = 0
    for r in rows:
        assert r["tok_offset"] == pos
        assert r["seq_id"] == pos // 64
        pos += r["n_tokens"]
    # partition-count independence: the same offsets on any cluster shape
    again = {
        r["doc_id"]: r["tok_offset"]
        for r in packing.pack_sequences(df, ctx=64, num_partitions=3).collect()
    }
    assert again == {r["doc_id"]: r["tok_offset"] for r in rows}


def test_bucket_batches_parity_and_invariants(spark, tmp_path):
    """Length-bucketed batch planning: DuckDB parity (the per-bucket window
    oracle vs the two-job range-partition rank), batch-size discipline
    (at most ONE partial batch per bucket, and it is the LAST batch),
    exact padding arithmetic, and partition-count independence."""
    from web_crawler_spark.functions import packing

    texts = ["", "  ", "one"] + [
        " ".join(["w"] * n) for n in [1, 1, 2, 3, 3, 3, 4, 7, 8, 9, 15, 16, 17, 31]
    ] + [f"t{i} " * (i % 37 + 1) for i in range(300)]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    p = str(tmp_path / "bb.parquet")
    pdf.to_parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW bb AS SELECT * FROM read_parquet('{p}')")
    df = spark.read.parquet(p)
    out = packing.bucket_batches(df, batch_size=8, num_partitions=5)
    _cmp(
        out,
        con.sql(packing.duck_bucket_batches_sql("bb", batch_size=8)),
        ["len_bucket", "batch_id"],
    )
    rows = out.collect()
    assert sum(r["n_docs"] for r in rows) == len(texts)
    by_bucket = {}
    for r in rows:
        assert 1 <= r["n_docs"] <= 8
        assert r["pad_tokens"] == r["n_docs"] * r["max_tokens"] - r["sum_tokens"]
        assert r["pad_tokens"] >= 0
        by_bucket.setdefault(r["len_bucket"], []).append(r)
    for b, rs in by_bucket.items():
        rs.sort(key=lambda r: r["batch_id"])
        assert [r["batch_id"] for r in rs] == list(range(len(rs)))
        for r in rs[:-1]:  # only the last batch may be partial
            assert r["n_docs"] == 8
        if b > 0:  # bucket b holds 2^(b-1) <= n_tokens < 2^b
            for r in rs:
                assert r["max_tokens"] < 2 ** b
    again = {
        (r["len_bucket"], r["batch_id"]): r["pad_tokens"]
        for r in packing.bucket_batches(df, batch_size=8, num_partitions=2).collect()
    }
    assert again == {(r["len_bucket"], r["batch_id"]): r["pad_tokens"] for r in rows}


def test_interleave_sources_wfq(spark, tmp_path):
    """Weighted-fair interleave: ranks follow md5 order per source across
    partitions/batches (two-job rank == window rank), vtimes are the exact
    WFQ finish times, and the DuckDB oracle reproduces them bit-for-bit."""
    import duckdb

    from web_crawler_spark.functions import sampling

    weights = {"web": 5, "code": 2, "books": 1}
    rows = [(i, ["web", "code", "books"][i % 3] if i % 7 else "web") for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id long, source string").repartition(7)
    got = sampling.interleave_sources(df, weights, num_partitions=5)
    g = {r["doc_id"]: (r["source"], r["src_rank"], r["vtime"]) for r in got.collect()}
    assert len(g) == 900

    # independent golden: per-source md5 rank + integer WFQ finish time
    import hashlib

    by_src: dict = {}
    for i, s in rows:
        by_src.setdefault(s, []).append(i)
    want = {}
    for s, ids in by_src.items():
        ids.sort(key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
        for r, i in enumerate(ids, 1):
            want[i] = (s, r, (r - 1) * sampling.MIX_SCALE // weights.get(s, 1))
    assert g == want

    # WFQ property: in (vtime, source, src_rank) order, a weight-5 source
    # fills a prefix ~5x faster than a weight-1 source
    ordered = sorted(g.values(), key=lambda t: (t[2], t[0], t[1]))
    prefix = ordered[:120]
    n_web = sum(1 for s, _, _ in prefix if s == "web")
    n_books = sum(1 for s, _, _ in prefix if s == "books")
    assert n_web > 3 * n_books

    # oracle parity
    p = str(tmp_path / "mix.parquet")
    df.toPandas().to_parquet(p)
    o = {
        int(r["doc_id"]): (r["source"], int(r["src_rank"]), int(r["vtime"]))
        for _, r in duckdb.sql(
            sampling.duck_interleave_sql(f"read_parquet('{p}')", weights)
        ).df().iterrows()
    }
    assert o == g


# -- crawl-trap detection -----------------------------------------------------

TRAP_URLS = (
    # calendar trap: one template, many distinct URLs on one host
    [f"http://cal.example/events/2024/{m}/{d}?sessionid=deadbeefcafe{m}{d}"
     for m in range(1, 4) for d in range(1, 4)]
    # same path shape on another host but below the threshold
    + ["http://quiet.example/events/2024/1/1?sessionid=deadbeefcafe11"]
    # distinct word slugs: templates do NOT collapse
    + [f"http://news.example/articles/5-{w}.html" for w in ("alpha", "beta", "gamma", "delta", "epsilon")]
    # duplicate URL rows: count is DISTINCT urls, not rows
    + ["http://dup.example/p/7?x=1"] * 6
)


@pytest.fixture(scope="module")
def trap_urls(spark, tmp_path_factory):
    pdf = pd.DataFrame({"url_id": range(len(TRAP_URLS)), "url": TRAP_URLS})
    p = str(tmp_path_factory.mktemp("urltraps") / "urls.parquet")
    pdf.to_parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW tu AS SELECT * FROM read_parquet('{p}')")
    return spark.read.parquet(p), con


def test_url_traps_boundary(trap_urls):
    df, con = trap_urls
    got = urlfilter.url_trap_templates(df)
    _cmp(got, con.sql(urlfilter.duck_url_traps_sql("tu")), ["host", "template"])
    rows = {(r.host, r.template): (r.n_urls, r.trap) for r in got.collect()}
    # 9 distinct calendar URLs collapse into one trapped template
    assert rows[("cal.example", "/events/N/N/N?sessionid=V")] == (9, True)
    # same shape, one URL -> not a trap
    assert rows[("quiet.example", "/events/N/N/N?sessionid=V")] == (1, False)
    # word slugs stay distinct templates, each count 1
    assert rows[("news.example", "/articles/N-alpha.html")] == (1, False)
    # duplicates of one URL never reach the threshold
    assert rows[("dup.example", "/p/N?x=V")] == (1, False)


def test_url_traps_prune_gate(trap_urls):
    df, _ = trap_urls
    traps = urlfilter.url_trap_templates(df)
    kept = urlfilter.prune_trapped(df, traps)
    kept_urls = {r.url for r in kept.collect()}
    assert not any(u.startswith("http://cal.example/") for u in kept_urls)
    assert "http://quiet.example/events/2024/1/1?sessionid=deadbeefcafe11" in kept_urls
    assert "http://dup.example/p/7?x=1" in kept_urls
    assert kept.columns == df.columns  # gate preserves the frontier schema
    # the gate is a broadcast anti-join: no exchange on the frontier side
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_select_token_budget_boundary(spark):
    import duckdb

    from web_crawler_spark.functions import sampling

    # quality order is driven by term rarity: give each doc a distinct
    # repeated token so scores differ deterministically, then check the
    # exact greedy boundary: the doc that crosses the budget is kept,
    # everything after it is cut
    docs = [
        (1, "aa aa aa aa"),      # 4 tokens
        (2, "bb bb bb"),         # 3 tokens
        (3, "cc cc"),            # 2 tokens
        (4, "dd"),               # 1 token
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got_all = sampling.select_token_budget(df, budget=10**9).toPandas()
    order = list(got_all.sort_values("tok_offset")["doc_id"])
    sel = sampling.select_token_budget(
        df, budget=int(got_all["n_tokens"].iloc[0]) + 1  # into doc #2
    ).toPandas()
    kept = set(sel["doc_id"])
    assert kept == set(order[:2])  # first doc + the overflowing second
    # offsets are the exclusive prefix sums of the full ordering
    full = got_all.sort_values("tok_offset")
    assert list(full["tok_offset"]) == [
        int(full["n_tokens"].iloc[:i].sum()) for i in range(len(full))
    ]
    # oracle parity on the same frame (window cumsum ordering must agree
    # with the range-partitioned two-job stamp exactly)
    con = duckdb.connect()
    con.register("docs4", df.toPandas())
    want = con.sql(
        sampling.duck_select_budget_sql("docs4", budget=10**9)
    ).df().sort_values("tok_offset")
    assert list(want["doc_id"]) == order


def test_registrable_domain_suffix_rules(spark, tmp_path):
    import duckdb

    from web_crawler_spark.functions import urlfilter

    rows = [
        ("http://x/1", "blog.example.co.uk"),   # 2-label suffix -> 3 labels
        ("http://x/2", "www.example.co.uk"),    # same domain, other host
        ("http://x/3", "sub.deep.example.com"), # generic tld -> last 2
        ("http://x/4", "example.com"),
        ("http://x/5", "localhost"),            # single label passes through
        ("http://x/6", "news.site.com.au"),
    ]
    df = spark.createDataFrame(rows, "url string, host string")
    got = {
        r["domain"]: (r["n_hosts"], r["n_pages"])
        for r in urlfilter.domain_rollup(df).collect()
    }
    assert got == {
        "example.co.uk": (2, 2),
        "example.com": (2, 2),
        "localhost": (1, 1),
        "site.com.au": (1, 1),
    }
    p = str(tmp_path / "d.parquet")
    df.toPandas().to_parquet(p)
    oracle = {
        r["domain"]: (int(r["n_hosts"]), int(r["n_pages"]))
        for _, r in duckdb.sql(
            urlfilter.duck_domain_rollup_sql(f"read_parquet('{p}')")
        ).df().iterrows()
    }
    assert oracle == got


# -- tracking-parameter policy mining ----------------------------------------

TRACKED_ROWS = [
    # utm is tracking: two values + bare witness, one context, same digest
    ("http://a.example/p", "d0"),
    ("http://a.example/p?utm=x", "d0"),
    ("http://a.example/p?utm=y", "d0"),
    # page is content-bearing: values change the digest
    ("http://a.example/q?page=2", "d2"),
    ("http://a.example/q?page=3", "d3"),
    # 'mixed' is consistent on b.example but NOT on c.example -> not tracking
    ("http://b.example/r", "d4"),
    ("http://b.example/r?mixed=1", "d4"),
    ("http://c.example/s", "d5"),
    ("http://c.example/s?mixed=1", "d6"),
    # 'lonely': single variant, no witness -> zero informative contexts
    ("http://d.example/t?lonely=1", "d7"),
    # stacked: utm strips inside a page context (witness is the page URL,
    # unsorted input pair order exercises the array_sort canonicalization)
    ("http://a.example/q?utm=z&page=2", "d2"),
]


def test_mine_tracking_params_semantics(spark, tmp_path):
    pdf = pd.DataFrame(TRACKED_ROWS, columns=["url", "digest"])
    p = str(tmp_path / "tracked.parquet")
    pdf.to_parquet(p)
    out = {
        r["param"]: r
        for r in urlfilter.mine_tracking_params(spark.read.parquet(p)).collect()
    }
    assert out["utm"]["is_tracking"] and out["utm"]["n_ctx"] == 2
    assert not out["page"]["is_tracking"] and out["page"]["n_consistent"] == 0
    assert not out["mixed"]["is_tracking"]
    assert out["mixed"]["n_ctx"] == 2 and out["mixed"]["n_consistent"] == 1
    # lonely has no informative context -> n_ctx 0 and NOT claimed tracking
    assert out["lonely"]["n_ctx"] == 0 and not out["lonely"]["is_tracking"]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW tr AS SELECT * FROM read_parquet('{p}')")
    _cmp(
        urlfilter.mine_tracking_params(spark.read.parquet(p)),
        con.sql(urlfilter.duck_tracking_params_sql("tr")),
        ["param"],
    )


def test_mine_tracking_params_synth_parity(spark):
    sf = synth.ensure_synth("0.001")
    path = synth.synth_path("0.001", "tracked")
    got = {
        r["param"]: r
        for r in urlfilter.mine_tracking_params(spark.read.parquet(path)).collect()
    }
    assert got["utm_source"]["is_tracking"] and got["sid"]["is_tracking"]
    assert not got["page"]["is_tracking"]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW trs AS SELECT * FROM read_parquet('{path}')")
    _cmp(
        urlfilter.mine_tracking_params(spark.read.parquet(path)),
        con.sql(urlfilter.duck_tracking_params_sql("trs")),
        ["param"],
    )


def test_strip_tracking_params_apply(spark, tmp_path):
    pdf = pd.DataFrame(TRACKED_ROWS, columns=["url", "digest"])
    p = str(tmp_path / "tracked2.parquet")
    pdf.to_parquet(p)
    df = spark.read.parquet(p)
    out = {
        r["url"]: r["url_stripped"]
        for r in urlfilter.strip_tracking_params(df, ["utm"]).collect()
    }
    assert out["http://a.example/p?utm=x"] == "http://a.example/p"
    assert out["http://a.example/q?utm=z&page=2"] == "http://a.example/q?page=2"
    assert out["http://a.example/q?page=2"] == "http://a.example/q?page=2"
    assert out["http://a.example/p"] == "http://a.example/p"
    # empty policy = canonicalize-only (pairs sorted), never a crash
    noop = urlfilter.strip_tracking_params(df, [])
    assert noop.where(F.col("url_stripped").isNull()).count() == 0


def test_strip_collapse_lossless_and_parity(spark):
    synth.ensure_synth("0.001")
    path = synth.synth_path("0.001", "tracked")
    df = spark.read.parquet(path)
    policy = sorted(
        r["param"]
        for r in urlfilter.mine_tracking_params(df)
        .where(F.col("is_tracking"))
        .collect()
    )
    assert policy == ["sid", "utm_source"]
    collapsed = (
        urlfilter.strip_tracking_params(df, policy)
        .groupBy(F.col("url_stripped").alias("url"))
        .agg(
            F.count("*").cast("long").alias("n_variants"),
            F.countDistinct("digest").cast("long").alias("n_digests"),
        )
    )
    # the mined policy is lossless: no two distinct contents ever collapse
    assert collapsed.agg(F.max("n_digests")).first()[0] == 1
    assert collapsed.where(F.col("n_variants") > 1).count() > 0
    con = duckdb.connect()
    _cmp(
        collapsed,
        con.sql(
            urlfilter.duck_strip_collapse_sql(f"read_parquet('{path}')")
        ),
        ["url"],
    )


# -- bitext candidate mining ---------------------------------------------------

BITEXT_ROWS = [
    ("http://s.example/en/story1", "en"),
    ("http://s.example/de/story1", "de"),
    ("http://s.example/fr/story1", "fr"),
    ("http://q.example/art?id=7&lang=en", "en"),
    ("http://q.example/art?id=7&lang=zh", "zh"),
    ("http://s.example/en/only-english", "en"),  # singleton: no pair
    ("http://s.example/plain/nothing", "en"),    # no marker: no key
    ("http://s.example/en/mismatch", "de"),      # marker != page lang: no key
]


def test_bitext_candidates_semantics(spark, tmp_path):
    pdf = pd.DataFrame(BITEXT_ROWS, columns=["url", "lang"])
    p = str(tmp_path / "bitext.parquet")
    pdf.to_parquet(p)
    df = spark.read.parquet(p)
    got = urlfilter.bitext_candidates(df).collect()
    pairs = {(r["lang_a"], r["lang_b"], r["key"]) for r in got}
    # 3-language article yields all 3 ordered pairs on one key
    k1 = "http://s.example/L/story1"
    assert ("de", "en", k1) in pairs and ("de", "fr", k1) in pairs and ("en", "fr", k1) in pairs
    assert ("en", "zh", "http://q.example/art?id=7&lang=L") in pairs
    assert len(got) == 4  # singleton / unmarked / mismatched rows pair with nothing
    con = duckdb.connect()
    _cmp(
        urlfilter.bitext_candidates(df),
        con.sql(urlfilter.duck_bitext_sql(f"read_parquet('{p}')")),
        ["key", "lang_a", "lang_b"],
    )


def test_bitext_synth_parity(spark):
    synth.ensure_synth("0.001")
    path = synth.synth_path("0.001", "bitext")
    df = spark.read.parquet(path)
    out = urlfilter.bitext_candidates(df)
    assert out.count() > 0
    # a pair never links a language to itself and never fabricates keys
    assert out.where(F.col("lang_a") >= F.col("lang_b")).count() == 0
    con = duckdb.connect()
    _cmp(
        out,
        con.sql(urlfilter.duck_bitext_sql(f"read_parquet('{path}')")),
        ["key", "lang_a", "lang_b"],
    )


ALIGN_ROWS = [
    ("http://s.example/en/a1", "en", "One sentence here. Two now. Three total."),
    ("http://s.example/de/a1", "de", "Ein Satz hier. Zwei jetzt. Drei gesamt."),
    # misaligned translation: sentence count differs by 5
    ("http://s.example/en/a2", "en", "Only one sentence."),
    ("http://s.example/de/a2", "de", "S1. S2. S3. S4. S5. S6."),
    # length-ratio failure: counts match but one side is 10x longer
    ("http://s.example/en/a3", "en", "Tiny. Text."),
    ("http://s.example/de/a3", "de",
     ("Lange " * 40 + "Zeile.") + " " + ("Noch " * 40 + "mehr.")),
]


def test_bitext_align_semantics(spark, tmp_path):
    pdf = pd.DataFrame(ALIGN_ROWS, columns=["url", "lang", "text"])
    p = str(tmp_path / "align.parquet")
    pdf.to_parquet(p)
    df = spark.read.parquet(p)
    out = {r["key"]: r for r in urlfilter.bitext_align(df).collect()}
    assert out["http://s.example/L/a1"]["align_ok"]
    assert out["http://s.example/L/a1"]["n_sents_a"] == 3
    assert not out["http://s.example/L/a2"]["align_ok"]  # sent-count gate
    a3 = out["http://s.example/L/a3"]
    assert a3["n_sents_a"] == a3["n_sents_b"] == 2
    assert not a3["align_ok"]  # ratio gate
    con = duckdb.connect()
    _cmp(
        urlfilter.bitext_align(df),
        con.sql(urlfilter.duck_bitext_align_sql(f"read_parquet('{p}')")),
        ["key", "lang_a", "lang_b"],
    )


def test_bitext_align_synth_parity(spark):
    synth.ensure_synth("0.001")
    path = synth.synth_path("0.001", "bitext")
    out = urlfilter.bitext_align(spark.read.parquet(path))
    ok = out.where(F.col("align_ok")).count()
    bad = out.where(~F.col("align_ok")).count()
    assert ok > 0 and bad > 0  # fixture has both translations and decoys
    con = duckdb.connect()
    _cmp(
        out,
        con.sql(urlfilter.duck_bitext_align_sql(f"read_parquet('{path}')")),
        ["key", "lang_a", "lang_b"],
    )


def test_suspicious_url_flags_pinned(spark, tmp_path):
    import duckdb

    from web_crawler_spark.functions import urlfilter

    rows = [
        ("http://host0.example/fine.html",),
        ("http://10.0.42.7/p/1",),
        ("http://admin@host1.example/login",),
        ("http://xn--mnchen-3ya.example/strasse",),
        ("http://a.b.c.d.host2.example/deep",),
        ("http://host3.example:8443/alt",),
        ("https://host4.example:443/std",),
        ("http://999.1.2.3.4/not-quite-ip-5-labels",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = {r["url"]: r for r in urlfilter.suspicious_url_flags(df).collect()}
    assert not got["http://host0.example/fine.html"]["suspicious"]
    assert got["http://10.0.42.7/p/1"]["is_ip"]
    assert got["http://admin@host1.example/login"]["has_userinfo"]
    assert got["http://admin@host1.example/login"]["host"] == "host1.example"
    assert got["http://xn--mnchen-3ya.example/strasse"]["has_punycode"]
    assert got["http://a.b.c.d.host2.example/deep"]["n_labels"] == 6
    assert got["http://a.b.c.d.host2.example/deep"]["suspicious"]
    assert got["http://host3.example:8443/alt"]["nonstd_port"]
    assert not got["https://host4.example:443/std"]["nonstd_port"]
    assert not got["https://host4.example:443/std"]["suspicious"]
    five = got["http://999.1.2.3.4/not-quite-ip-5-labels"]
    assert not five["is_ip"] and five["n_labels"] == 5 and five["suspicious"]
    # oracle parity on the crafted frame
    p = str(tmp_path / "sus.parquet")
    df.toPandas().to_parquet(p)
    con = duckdb.connect()
    want = con.sql(urlfilter.duck_suspicious_sql(f"read_parquet('{p}')")).df()
    for _, r in want.iterrows():
        g = got[r["url"]]
        for c in ["host", "is_ip", "has_userinfo", "has_punycode",
                  "n_labels", "nonstd_port", "suspicious"]:
            assert g[c] == r[c], (r["url"], c, g[c], r[c])


def test_typosquat_crafted(spark):
    """gooogle.example (one insertion) and googel.example (one transposition
    = 2 classic edits but levenshtein 2 -> NOT flagged at dist 1) pin the
    distance semantics; the brand itself is excluded; low-traffic hosts
    never become brands.  Oracle parity on the same frame."""
    import duckdb
    import pandas as pd

    from web_crawler_spark.functions import urlfilter

    rows = (
        [("google.example",)] * 50
        + [("gooogle.example",)] * 2   # insertion: dist 1 -> flagged
        + [("googel.example",)] * 2    # transposition: levenshtein 2 -> not at d=1
        + [("froogle.example",)] * 2   # dist 2 -> not flagged
        + [("other.example",)] * 40
    )
    df = spark.createDataFrame(rows, "host string")
    got = {
        (r["host"], r["brand"]): r
        for r in urlfilter.typosquat_candidates(
            df, n_brands=2, max_dist=1
        ).collect()
    }
    assert ("gooogle.example", "google.example") in got
    assert got[("gooogle.example", "google.example")]["dist"] == 1
    assert got[("gooogle.example", "google.example")]["brand_pages"] == 50
    assert ("googel.example", "google.example") not in got
    assert ("froogle.example", "google.example") not in got
    assert ("google.example", "google.example") not in got
    # brands are (google, other); no host is within 1 edit of other.example
    assert all(b == "google.example" for _, b in got)

    con = duckdb.connect()
    con.register("typodocs", df.toPandas())
    want = (
        con.sql(urlfilter.duck_typosquat_sql("typodocs", n_brands=2, max_dist=1))
        .df()
        .sort_values(["host", "brand"])
        .reset_index(drop=True)
    )
    got_df = (
        urlfilter.typosquat_candidates(df, n_brands=2, max_dist=1)
        .toPandas()
        .sort_values(["host", "brand"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got_df[sorted(got_df.columns)], want[sorted(want.columns)],
        check_dtype=False,
    )


def test_psl_registrable_domain_full_list(spark):
    """FULL Public Suffix List semantics (functions/psl.py): multi-label
    country suffixes, wildcard rules, exception rules — Spark candidate
    join == independent plain-Python spec transcription == DuckDB twin."""
    import duckdb
    import pandas as pd

    from web_crawler_spark.functions import psl

    hosts = [
        "www.example.co.uk",      # 2-label ccTLD suffix
        "blog.example.com.au",
        "foo.k12.va.us",          # 3-label US schools suffix -> is a PS
        "a.foo.k12.va.us",
        "x.www.ck",               # exception rule !www.ck
        "www.ck",
        "foo.bar.ck",             # wildcard *.ck -> bar.ck is a PS
        "sub.other.kawasaki.jp",  # wildcard *.kawasaki.jp
        "city.kawasaki.jp",       # exception !city.kawasaki.jp
        "sub.proj.github.io",     # private-section suffix
        "example.com",
        "localhost",
        # wildcard-PARENT hosts: equal to a '*.X' rule's X — the '*' must
        # consume one label, so these fall through to the default rule
        # (r4 bug: tail clamping made them match their own wildcard)
        "compute.amazonaws.com",
        "elb.amazonaws.com",
        "x.compute.amazonaws.com",  # the wildcard DOES apply one level down
    ]
    rules = psl.load_rules()
    want = {h: psl.naive_registrable_domain(h, rules) for h in hosts}
    # the cases the round-3 embedded list mis-grouped are now exact
    assert want["www.example.co.uk"] == "example.co.uk"
    assert want["blog.example.com.au"] == "example.com.au"
    assert want["foo.k12.va.us"] == "foo.k12.va.us"  # PS is k12.va.us
    assert want["a.foo.k12.va.us"] == "foo.k12.va.us"
    assert want["x.www.ck"] == "www.ck"
    assert want["sub.proj.github.io"] == "proj.github.io"
    assert want["compute.amazonaws.com"] == "amazonaws.com"
    assert want["elb.amazonaws.com"] == "amazonaws.com"
    assert want["x.compute.amazonaws.com"] == "x.compute.amazonaws.com"
    hdf = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r["host"]: r["domain"]
        for r in psl.host_registrable_domains(hdf).collect()
    }
    assert got == want
    # rollup parity vs the DuckDB twin (the graded url_domains_psl shape)
    pages = [(h, f"http://{h}/p{i}") for i, h in enumerate(hosts * 2)]
    pdf = spark.createDataFrame(pages, "host string, url string")
    eng = {
        r["domain"]: (r["n_hosts"], r["n_pages"])
        for r in psl.psl_domain_rollup(pdf).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(pages, columns=["host", "url"]))
    ora = {
        r[0]: (r[1], r[2])
        for r in con.sql(psl.duck_psl_domain_rollup_sql("t")).fetchall()
    }
    assert eng == ora
    # the rules relation is broadcast (scale guard: no shuffled rules side)
    plan = (
        psl.host_registrable_domains(hdf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
