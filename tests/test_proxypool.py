"""Proxy-pool dataflow: multi-source scan, format parsers, dedup, stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_crawler_spark.sources import proxypool


def test_plain_and_generic_parsers(spark, tmp_path):
    f1 = tmp_path / "plain.txt"
    f1.write_text("1.2.3.4:8080\n\nsocks5://5.6.7.8:1080\nnot-a-proxy\n1.2.3.4:8080\n")
    f2 = tmp_path / "scrape.html"
    f2.write_text("<tr><td>9.9.9.9:3128</td></tr> junk 1.2.3.4:8080 tail 10.0.0.1:80\n")

    plain = proxypool.load_sources(spark, [str(f1)], fmt="plain")
    got = sorted(r["proxy"] for r in plain.collect())
    assert got == ["http://1.2.3.4:8080", "socks5://5.6.7.8:1080"]

    scraped = proxypool.load_sources(spark, [str(f2)], fmt="generic")
    got2 = sorted(r["proxy"] for r in scraped.collect())
    assert got2 == ["http://1.2.3.4:8080", "http://10.0.0.1:80", "http://9.9.9.9:3128"]

    # union across sources keeps first occurrence; the scrape.html line
    # carries ':' so the plain parser keeps it as one (junk) entry — exactly
    # the reference's behavior of trusting ':'-bearing lines (:75)
    both = proxypool.load_sources(spark, [str(f1), str(f2)], fmt="plain")
    assert both.count() == 3


FREEPROXY_HTML = """<html><body><div class="table-container"><table><tbody>
<tr><th>ip</th></tr>
<tr><td>1.2.3.4</td><td>8080</td><td>US</td><td>city</td><td>fast</td>
    <td><a>HTTP</a><a>SOCKS5</a></td><td>yes</td><td>1m</td></tr>
<tr><td>5.6.7.8</td><td>3128</td><td>DE</td><td>x</td><td>y</td>
    <td><a>http</a></td><td>no</td><td>2m</td></tr>
<tr><td>9.9.9.9</td><td>1080</td><td>FR</td><td>x</td><td>y</td>
    <td><a>ftp</a></td><td>yes</td><td>3m</td></tr>
<tr><td>short</td><td>row</td></tr>
</tbody></table></div></body></html>"""

PROXYDB_HTML = """<html><body><div class="table-responsive"><table><tbody>
<tr><td>1.1.1.1</td><td><a href="#">80</a></td><td>http</td><td>x</td>
    <td>x</td><td>x</td><td>x</td><td>x</td><td>x</td></tr>
<tr><td>2.2.2.2</td><td>443</td><td>SOCKS4</td><td>x</td>
    <td>x</td><td>x</td><td>x</td><td>x</td><td>x</td></tr>
<tr><td>3.3.3.3</td><td>21</td><td>gopher</td><td>x</td>
    <td>x</td><td>x</td><td>x</td><td>x</td><td>x</td></tr>
<tr><td>tiny</td></tr>
</tbody></table></div></body></html>"""


def test_table_scrape_formats(spark, tmp_path):
    """The two HTML-table formats (proxy_manager.py:135-181): alive filter,
    multi-protocol fan-out, anchor-or-text port, protocol whitelist."""
    f1 = tmp_path / "freeproxy.html"
    f1.write_text(FREEPROXY_HTML)
    got1 = sorted(
        r["proxy"] for r in proxypool.load_sources(spark, [str(f1)], fmt="freeproxy-world").collect()
    )
    # row 2 is marked not-alive ('no'), row 3 has no whitelisted protocol
    assert got1 == ["http://1.2.3.4:8080", "socks5://1.2.3.4:8080"]

    f2 = tmp_path / "proxydb.html"
    f2.write_text(PROXYDB_HTML)
    got2 = sorted(
        r["proxy"] for r in proxypool.load_sources(spark, [str(f2)], fmt="proxydb").collect()
    )
    assert got2 == ["http://1.1.1.1:80", "socks4://2.2.2.2:443"]


def test_source_order_survives_multipartition(spark, tmp_path):
    """First-wins must follow SOURCE order even when an earlier source scans
    as many partitions (monotonically_increasing_id jumps by 2^33 per
    partition — an additive per-source offset would sort later sources
    before an earlier source's non-first partitions)."""
    d0 = tmp_path / "src0"
    d0.mkdir()
    for j in range(4):
        (d0 / f"part{j}.txt").write_text(f"10.0.{j}.1:80\n1.1.1.1:80\n")
    f1 = tmp_path / "src1.txt"
    f1.write_text("1.1.1.1:80\n2.2.2.2:80\n")
    pool = proxypool.load_sources(spark, [str(d0), str(f1)], fmt="plain")
    rows = {r["proxy"]: r["src_idx"] for r in pool.collect()}
    assert rows["http://1.1.1.1:80"] == 0  # source 0 wins the duplicate
    assert rows["http://2.2.2.2:80"] == 1
    assert len(rows) == 6


def test_socks_predicate(spark):
    df = spark.createDataFrame(
        [("socks5://a:1",), ("socks4://b:2",), ("socks://c:3",), ("http://d:4",)],
        "proxy string",
    )
    got = df.filter(proxypool.is_socks("proxy")).count()
    assert got == 3


def test_available_and_stats(spark):
    pool = spark.createDataFrame(
        [(f"http://p{i}:80", i) for i in range(10)], "proxy string, src_pos bigint"
    )
    failed = spark.createDataFrame(
        [("http://p1:80",), ("http://p3:80",), ("http://nope:1",)], "proxy string"
    )
    avail = proxypool.available(pool, failed)
    assert avail.count() == 8
    stats = proxypool.pool_stats(pool, failed)
    assert stats == {"total": 10, "failed": 2, "available": 8, "failure_rate": 0.2}


def test_validation_summary_and_export(spark, tmp_path):
    results = spark.createDataFrame(
        [("p1", True, 120.0), ("p2", False, None), ("p3", True, 80.0)],
        "proxy string, ok boolean, response_time_ms double",
    )
    row = proxypool.validation_summary(results).collect()[0]
    assert row["tested"] == 3 and row["working"] == 2 and row["failed"] == 1
    assert abs(row["avg_ms_working"] - 100.0) < 1e-9

    pool = results.select("proxy", F.lit(0).alias("src_pos"))
    out = tmp_path / "pool"
    proxypool.export_pool(pool, str(out))
    back = spark.read.text(str(out))
    assert back.count() == 3


def test_proxy_failure_statuses(spark):
    log = spark.createDataFrame(
        [(200,), (407,), (502,), (404,), (503,), (504,)], "status int"
    )
    assert proxypool.proxy_failure_filter(log).count() == 4


def test_assign_proxy_deterministic_uniform_and_rotating(spark):
    """J3: per-(url, attempt) assignment is deterministic, roughly uniform
    over the pool, and retries rotate proxies."""
    pool = [f"http://p{i}:80" for i in range(5)]
    df = spark.createDataFrame(
        [(f"http://h{i}.example/x", a) for i in range(400) for a in (0, 1)],
        "url string, attempt int",
    )
    got = proxypool.assign_proxy(df, pool, attempt_col="attempt").toPandas()
    counts = got["proxy"].value_counts()
    assert set(counts.index) == set(pool)  # every proxy used
    assert counts.min() > 80  # ~160 expected each; crude uniformity bar
    again = proxypool.assign_proxy(df, pool, attempt_col="attempt").toPandas()
    assert list(got["proxy"]) == list(again["proxy"])  # deterministic
    by_url = got.pivot_table(index="url", columns="attempt", values="proxy", aggfunc="first")
    rotated = (by_url[0] != by_url[1]).mean()
    assert rotated > 0.6  # retries usually move to a different proxy

    empty = proxypool.assign_proxy(df, [], attempt_col="attempt")
    assert empty.filter(empty.proxy.isNotNull()).count() == 0
