"""robots.txt parsing -> host_rules -> politeness integration (J4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_crawler_spark.sources import robots as robots_src
from web_crawler_spark.operators.politeness import select_host_budget_batch, with_host

ROBOTS_A = """
# comments everywhere
User-agent: googlebot
Disallow: /google-only/

User-agent: *
Disallow: /private/
Disallow: /tmp/
Crawl-delay: 10
Allow: /tmp/ok     # unknown-to-us directive, ignored
Disallow:          # empty => allow all, contributes nothing

User-agent: wcs
User-agent: *
Disallow: /both/
Crawl-delay: 30
"""

ROBOTS_B = """
User-agent: somebot
Disallow: /x/
"""


def test_parse_robots_text_groups_and_delay():
    dis, delay = robots_src.parse_robots_text(ROBOTS_A)
    # specific-agent group ignored; both *-groups contribute; min delay wins
    assert dis == ["/private/", "/tmp/", "/both/"]
    assert delay == 10.0
    dis_b, delay_b = robots_src.parse_robots_text(ROBOTS_B)
    assert dis_b == [] and delay_b is None
    assert robots_src.parse_robots_text("") == ([], None)


def test_parsed_rules_is_a_projection_not_a_join(spark):
    """Duplicate host rows must pass through 1:1 (the old self-join would
    multiply them quadratically) and the plan must contain no join."""
    robots = spark.createDataFrame(
        [("a.example", ROBOTS_A), ("a.example", ROBOTS_B), ("b.example", ROBOTS_B)],
        "host string, content string",
    )
    parsed = robots_src.with_parsed_rules(robots)
    assert parsed.count() == 3  # row-preserving, even with a duplicated host
    plan = parsed._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_rule_to_regex_translation():
    assert robots_src.rule_to_regex("/p/1*") == "^/p/1.*"
    assert robots_src.rule_to_regex("/p/123$") == "^/p/123$"
    assert robots_src.rule_to_regex("/p/*1$") == "^/p/.*1$"
    assert robots_src.rule_to_regex("/p/9.") == r"^/p/9\."
    assert robots_src.rule_to_regex("/a+b?(c)[d]{e}|f^g") == r"^/a\+b\?\(c\)\[d\]\{e\}\|f\^g"
    # inner $ is literal, only a trailing $ anchors
    assert robots_src.rule_to_regex("/x$y") == r"^/x\$y"


def test_parse_robots_acl_groups():
    rules = robots_src.parse_robots_acl(ROBOTS_A)
    # Allow lines now count; empty Disallow still contributes nothing;
    # the googlebot-only group still doesn't apply
    assert rules == [
        ("/private/", False),
        ("/tmp/", False),
        ("/tmp/ok", True),
        ("/both/", False),
    ]
    assert robots_src.parse_robots_acl(ROBOTS_B) == []


def test_robots_allowed_longest_match(spark):
    """RFC 9309 decision table: longest rule wins, Allow wins ties, no
    match (or no rules / unknown host) means allowed."""
    body = (
        "User-agent: otherbot\nDisallow: /\n\n"
        "User-agent: *\n"
        "Disallow: /p/1*\n"
        "Allow: /p/12*\n"
        "Disallow: /p/123$\n"
        "Disallow: /p/7\n"
        "Allow: /p/7\n"
    )
    robots = spark.createDataFrame([("a.example", body)], "host string, content string")
    rules = robots_src.acl_rules_from_robots(robots)
    urls = spark.createDataFrame(
        [
            ("http://a.example/p/15", "a.example"),     # /p/1* -> blocked
            ("http://a.example/p/125", "a.example"),    # allow /p/12* outranks /p/1*
            ("http://a.example/p/123", "a.example"),    # $-anchored longest -> blocked
            ("http://a.example/p/1234", "a.example"),   # $ doesn't hit; allow 12* wins
            ("http://a.example/p/7", "a.example"),      # tie -> allow
            ("http://a.example/p/5", "a.example"),      # no rule matches
            ("http://a.example", "a.example"),          # empty path -> "/"
            ("http://z.example/p/1", "z.example"),      # ruleless host
        ],
        "url string, host string",
    )
    got = {
        r["url"]: (r["allowed"], r["win_len"])
        for r in robots_src.robots_allowed(urls, rules).collect()
    }
    assert got == {
        "http://a.example/p/15": (False, 5),
        "http://a.example/p/125": (True, 6),
        "http://a.example/p/123": (False, 7),
        "http://a.example/p/1234": (True, 6),
        "http://a.example/p/7": (True, 4),
        "http://a.example/p/5": (True, 0),
        "http://a.example": (True, 0),
        "http://z.example/p/1": (True, 0),
    }
    # scale shape: rules broadcast; the URL side must not shuffle
    plan = (
        robots_src.robots_allowed(urls, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning" not in plan


def test_host_rules_and_politeness_integration(spark):
    robots = spark.createDataFrame(
        [("a.example", ROBOTS_A), ("b.example", ROBOTS_B)], "host string, content string"
    )
    rules = robots_src.host_rules_from_robots(
        robots, default_budget=5, round_seconds=60.0
    )
    got = {r["host"]: r for r in rules.collect()}
    assert got["a.example"]["disallow"] == ["/private/", "/tmp/", "/both/"]
    assert got["a.example"]["budget"] == 6  # 60s / 10s delay
    assert got["b.example"]["disallow"] == [] and got["b.example"]["budget"] == 5

    frontier = with_host(
        spark.createDataFrame(
            [
                (f"http://a.example/private/{i}", 0, 0, i, 0) for i in range(3)
            ]
            + [(f"http://a.example/ok/{i}", 0, 0, 10 + i, 0) for i in range(10)]
            + [(f"http://b.example/x/{i}", 0, 0, 20 + i, 0) for i in range(8)],
            "url string, attempt int, depth int, p0 bigint, p1 bigint",
        )
    )
    batch = select_host_budget_batch(
        frontier, ["attempt", "depth", "p0", "p1"], budget=5, host_rules=rules
    ).collect()
    urls = [r["url"] for r in batch]
    assert not any("/private/" in u for u in urls)  # robots block enforced
    per_host = {}
    for r in batch:
        per_host[r["host"]] = per_host.get(r["host"], 0) + 1
    assert per_host["a.example"] == 6  # crawl-delay-derived budget
    assert per_host["b.example"] == 5  # default budget


def test_sitemap_extraction_boundary(spark, tmp_path):
    """Sitemap: lines are cross-group; mixed case, no-space keys, comments,
    and sitemap-free hosts all behave; DuckDB twin agrees."""
    import duckdb

    from web_crawler_spark.sources import robots as robots_src

    rows = [
        ("a.example",
         "User-agent: x\nDisallow: /y\n"
         "Sitemap: http://a.example/s1.xml\n"
         "  SITEMAP:http://a.example/s2.xml   # trailing comment\n"
         "sitemap : http://a.example/s3.xml"),   # space before ':' -> valid key
        ("b.example", "User-agent: *\nDisallow: /"),          # none -> no rows
        ("c.example", "# Sitemap: http://c.example/hidden.xml"),  # commented out
        ("d.example", ""),
    ]
    df = spark.createDataFrame(rows, "host string, content string")
    got = {(r.host, r.sitemap) for r in robots_src.with_sitemaps(df).collect()}
    assert got == {
        ("a.example", "http://a.example/s1.xml"),
        ("a.example", "http://a.example/s2.xml"),
        ("a.example", "http://a.example/s3.xml"),
    }
    p = str(tmp_path / "robots.parquet")
    df.toPandas().to_parquet(p)
    con = duckdb.connect()
    want = {
        (r["host"], r["sitemap"])
        for _, r in con.sql(
            robots_src.duck_sitemaps_sql(f"read_parquet('{p}')")
        ).df().iterrows()
    }
    assert want == got
    # shuffle-free: a pure projection over the robots scan
    plan = robots_src.with_sitemaps(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_parse_sitemap_xml_crafted(spark, tmp_path):
    import duckdb

    from web_crawler_spark.sources import robots as robots_src

    urlset = (
        '<?xml version="1.0"?>\n<urlset>'
        "<url><loc>http://a.example/1</loc><lastmod>2024-01-02</lastmod></url>"
        "<url><loc>http://a.example/2</loc></url>"  # no lastmod -> NULL
        "</urlset>"
    )
    index = (
        '<?xml version="1.0"?>\n<sitemapindex>'
        "<sitemap><loc>http://b.example/sitemap-0.xml</loc>"
        "<lastmod>2024-02-03</lastmod></sitemap>"
        "<sitemap><loc>http://b.example/sitemap-1.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame(
        [("http://a.example/sitemap.xml", urlset),
         ("http://b.example/sitemap.xml", index)],
        "sitemap_url string, xml string",
    )
    got = {
        (r["sitemap_url"], r["kind"], r["loc"]): r["lastmod"]
        for r in robots_src.parse_sitemap_xml(df).collect()
    }
    assert got == {
        ("http://a.example/sitemap.xml", "url", "http://a.example/1"): "2024-01-02",
        ("http://a.example/sitemap.xml", "url", "http://a.example/2"): None,
        ("http://b.example/sitemap.xml", "sitemap",
         "http://b.example/sitemap-0.xml"): "2024-02-03",
        ("http://b.example/sitemap.xml", "sitemap",
         "http://b.example/sitemap-1.xml"): None,
    }
    p = str(tmp_path / "sm.parquet")
    df.toPandas().to_parquet(p)
    want = {
        (r["sitemap_url"], r["kind"], r["loc"]):
            (None if r["lastmod"] is None or r["lastmod"] != r["lastmod"]
             else r["lastmod"])
        for _, r in duckdb.sql(
            robots_src.duck_sitemap_xml_sql(f"read_parquet('{p}')")
        ).df().iterrows()
    }
    assert want == got


def test_sitemap_coverage_crafted(spark, tmp_path):
    """Declared∩crawled, declared-only, orphan pages, and an index-only
    host (NULL coverage); Spark and the DuckDB twin agree exactly."""
    import duckdb
    urlset = (
        "<urlset>"
        "<url><loc>http://a.example/1</loc></url>"
        "<url><loc>http://a.example/2</loc></url>"
        "<url><loc>http://a.example/2</loc></url>"  # dup declaration
        "<url><loc>http://a.example/gone</loc></url>"  # declared, not crawled
        "</urlset>"
    )
    index = (
        "<sitemapindex><sitemap><loc>http://b.example/sm-0.xml</loc>"
        "</sitemap></sitemapindex>"
    )
    sitemaps = spark.createDataFrame(
        [("http://a.example/sitemap.xml", urlset),
         ("http://b.example/sitemap.xml", index)],
        "sitemap_url string, xml string",
    )
    pages = spark.createDataFrame(
        [("http://a.example/1",), ("http://a.example/2",),
         ("http://a.example/orphan",), ("http://b.example/only",)],
        "url string",
    )
    got = {
        r["host"]: (r["n_declared"], r["n_crawled"], r["n_orphan"], r["coverage_ppm"])
        for r in robots_src.sitemap_coverage(sitemaps, pages).collect()
    }
    assert got == {
        "a.example": (3, 2, 1, 666666),
        "b.example": (0, 0, 1, None),
    }
    ps, pp = str(tmp_path / "sm.parquet"), str(tmp_path / "pg.parquet")
    sitemaps.toPandas().to_parquet(ps)
    pages.toPandas().to_parquet(pp)
    odf = duckdb.sql(
        robots_src.duck_sitemap_coverage_sql(
            f"read_parquet('{ps}')", f"read_parquet('{pp}')"
        )
    ).df()
    want = {
        r["host"]: (
            int(r["n_declared"]), int(r["n_crawled"]), int(r["n_orphan"]),
            None if r["coverage_ppm"] != r["coverage_ppm"] else int(r["coverage_ppm"]),
        )
        for _, r in odf.iterrows()
    }
    assert want == got


def test_sitemap_recrawl_staleness_and_budget(spark):
    from datetime import datetime, timezone

    xml = (
        "<urlset>"
        "<url><loc>http://r.example/a</loc><lastmod>2024-02-01</lastmod></url>"
        "<url><loc>http://r.example/a</loc><lastmod>2024-03-01</lastmod></url>"  # max wins
        "<url><loc>http://r.example/fresh</loc><lastmod>2024-01-01</lastmod></url>"
        "<url><loc>http://r.example/nolast</loc></url>"
        "<url><loc>http://r.example/uncrawled</loc><lastmod>2024-05-01</lastmod></url>"
        + "".join(
            f"<url><loc>http://r.example/s{i}</loc><lastmod>2024-0{i + 2}-15</lastmod></url>"
            for i in range(6)
        )
        + "</urlset>"
    )
    sitemaps = spark.createDataFrame(
        [("http://r.example/sitemap.xml", xml)], "sitemap_url string, xml string"
    )
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    pages = spark.createDataFrame(
        [("http://r.example/a", t0), ("http://r.example/fresh", t0),
         ("http://r.example/nolast", t0)]
        + [(f"http://r.example/s{i}", t0) for i in range(6)],
        "url string, warc_ts timestamp",
    )
    from web_crawler_spark.sources import robots as robots_src

    out = robots_src.sitemap_recrawl(sitemaps, pages, budget=6)
    rows = {r["url"]: r for r in out.collect()}
    # budget caps the host at 6: s5..s1 (stalest first), then /a; s0 (Feb 15)
    # falls off the batch
    assert len(rows) == 6
    assert "http://r.example/fresh" not in rows      # lastmod == capture day, not stale
    assert "http://r.example/uncrawled" not in rows  # never captured -> not a recrawl
    assert "http://r.example/nolast" not in rows
    assert "http://r.example/s0" not in rows
    assert rows["http://r.example/s5"]["host_rank"] == 1
    assert rows["http://r.example/a"]["host_rank"] == 6
    assert rows["http://r.example/a"]["age_s"] == 60 * 86400  # Mar 1 wins over Feb 1
    # bounded-k window compiles to a partial top-k
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_sitemap_lastmod_trust_four_cells(spark, tmp_path):
    """Crafted confusion matrix covering ALL four cells (the synth fixture
    only populates the claimed side): tp / fp / fn (both the stale-lastmod
    and the no-lastmod flavor) / tn, exact ppm ratios, eval-set exclusions
    (undeclared urls, urls missing from either snapshot), and the DuckDB
    twin agreeing bit-for-bit."""
    import duckdb
    import pandas as pd
    from datetime import datetime, timezone

    xml = (
        "<urlset>"
        "<url><loc>http://t.example/tp</loc><lastmod>2024-03-01</lastmod></url>"
        "<url><loc>http://t.example/fp</loc><lastmod>2024-03-01</lastmod></url>"
        "<url><loc>http://t.example/fn</loc><lastmod>2023-12-01</lastmod></url>"
        "<url><loc>http://t.example/fn2</loc></url>"
        "<url><loc>http://t.example/tn</loc><lastmod>2023-12-01</lastmod></url>"
        "<url><loc>http://t.example/bad</loc><lastmod>not-a-date</lastmod></url>"
        "<url><loc>http://t.example/gone</loc><lastmod>2024-03-01</lastmod></url>"
        "<url><loc>http://t.example/new</loc><lastmod>2024-03-01</lastmod></url>"
        "</urlset>"
    )
    sitemaps = spark.createDataFrame(
        [("http://t.example/sitemap.xml", xml)], "sitemap_url string, xml string"
    )
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    prev_rows = [
        ("http://t.example/bad", t0, "same bad"),  # malformed lastmod -> no claim (tn)
        ("http://t.example/tp", t0, "old tp"),
        ("http://t.example/fp", t0, "same fp"),
        ("http://t.example/fn", t0, "old fn"),
        ("http://t.example/fn2", t0, "old fn2"),
        ("http://t.example/tn", t0, "same tn"),
        ("http://t.example/gone", t0, "was here"),   # absent from curr -> excluded
        ("http://t.example/undeclared", t0, "x"),    # not in sitemap -> excluded
    ]
    curr_rows = [
        ("http://t.example/bad", t0, "same bad"),
        ("http://t.example/tp", t0, "NEW tp"),
        ("http://t.example/fp", t0, "same fp"),
        ("http://t.example/fn", t0, "NEW fn"),
        ("http://t.example/fn2", t0, "NEW fn2"),
        ("http://t.example/tn", t0, "same tn"),
        ("http://t.example/new", t0, "born"),        # absent from prev -> excluded
        ("http://t.example/undeclared", t0, "x"),
    ]
    schema = "url string, warc_ts timestamp, text string"
    prev = spark.createDataFrame(prev_rows, schema)
    curr = spark.createDataFrame(curr_rows, schema)
    out = robots_src.sitemap_lastmod_trust(sitemaps, prev, curr).collect()
    assert len(out) == 1
    r = out[0]
    assert r["host"] == "t.example"
    assert (r["n_eval"], r["n_claimed"], r["n_changed"]) == (6, 2, 3)
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (1, 1, 2, 2)
    assert r["precision_ppm"] == 500000   # 1 of 2 claims was real
    assert r["recall_ppm"] == 333333      # 1 of 3 changes was claimed

    # DuckDB twin parity on the same frames
    d = str(tmp_path)
    pd.DataFrame(
        [("http://t.example/sitemap.xml", xml)], columns=["sitemap_url", "xml"]
    ).to_parquet(f"{d}/sm.parquet")
    prev.toPandas().to_parquet(f"{d}/prev.parquet")
    curr.toPandas().to_parquet(f"{d}/curr.parquet")
    con = duckdb.connect()
    want = con.sql(
        robots_src.duck_sitemap_trust_sql(
            f"read_parquet('{d}/sm.parquet')",
            f"read_parquet('{d}/prev.parquet')",
            f"read_parquet('{d}/curr.parquet')",
        )
    ).df()
    assert len(want) == 1
    for col in ("n_eval", "n_claimed", "n_changed", "tp", "fp", "fn", "tn",
                "precision_ppm", "recall_ppm"):
        assert int(want[col].iloc[0]) == r[col], col


def test_feed_parse_crafted(spark, tmp_path):
    """RSS items and Atom entries, CDATA titles, missing fields, linkless
    entries dropped; DuckDB twin agrees."""
    import duckdb

    from web_crawler_spark.sources import feeds as feeds_src

    rss = (
        "<rss><channel><title>chan</title>"
        "<item><title><![CDATA[cdata one]]></title><link>http://a/1</link>"
        "<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>"
        "<item><link>http://a/2</link></item>"
        "<item><title>no link</title></item>"
        "</channel></rss>"
    )
    atom = (
        '<feed><title>f</title>'
        '<entry><title>e1</title><link href="http://b/1"/>'
        "<updated>2024-02-02T00:00:00Z</updated></entry>"
        '<entry><link href="http://b/2"/></entry></feed>'
    )
    df = spark.createDataFrame(
        [("http://a/rss.xml", rss), ("http://b/atom.xml", atom)],
        "feed_url string, xml string",
    )
    got = {
        (r["feed_url"], r["link"]): (r["kind"], r["title"], r["pubdate"])
        for r in feeds_src.parse_feed_xml(df).collect()
    }
    assert got == {
        ("http://a/rss.xml", "http://a/1"): ("rss", "cdata one", "Mon, 01 Jan 2024 00:00:00 GMT"),
        ("http://a/rss.xml", "http://a/2"): ("rss", None, None),
        ("http://b/atom.xml", "http://b/1"): ("atom", "e1", "2024-02-02T00:00:00Z"),
        ("http://b/atom.xml", "http://b/2"): ("atom", None, None),
    }
    p = str(tmp_path / "feeds.parquet")
    df.toPandas().to_parquet(p)
    odf = duckdb.sql(feeds_src.duck_feed_sql(f"read_parquet('{p}')")).df()
    want = {
        (r["feed_url"], r["link"]): (
            r["kind"],
            None if r["title"] != r["title"] or r["title"] is None else r["title"],
            None if r["pubdate"] != r["pubdate"] or r["pubdate"] is None else r["pubdate"],
        )
        for _, r in odf.iterrows()
    }
    assert want == got


def test_write_sitemaps_round_trip(spark, tmp_path):
    """Producer -> parser round trip: every page url appears exactly once
    across the emitted urlset shards, shards respect the 50k cap (here
    forced tiny), files are in sorted-run layout, and lastmod carries the
    capture date."""
    import glob
    import os

    from web_crawler_spark import synth
    from web_crawler_spark.sources import robots as robots_src

    synth.ensure_synth("0.001")
    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    out = str(tmp_path / "sitemaps")
    robots_src.write_sitemaps(pages, out, max_urls=300)
    files = sorted(glob.glob(os.path.join(out, "sitemap-*.xml")))
    assert len(files) >= 4  # 1000 urls / 300 cap
    # parse back with the engine's own sitemap parser
    sm = spark.createDataFrame(
        [(os.path.basename(p), open(p).read()) for p in files],
        "sitemap_url string, xml string",
    )
    parsed = robots_src.parse_sitemap_xml(sm).filter(F.col("kind") == "url")
    back = parsed.select(F.col("loc").alias("url")).toPandas()["url"]
    want = pages.select("url").toPandas()["url"]
    assert sorted(back) == sorted(want)
    assert len(back) == len(set(back)) == 1000
    # per-file cap + sorted-run layout (in-file order AND cross-file ranges)
    last_max = None
    for p in files:
        locs = [
            r["loc"]
            for r in parsed.filter(
                F.col("sitemap_url") == os.path.basename(p)
            ).collect()
        ]
        assert 0 < len(locs) <= 300
        assert locs == sorted(locs)
        if last_max is not None:
            assert last_max <= locs[0]
        last_max = locs[-1]
    # lastmod present and date-shaped
    lm = parsed.select("lastmod").distinct().collect()
    assert all(r["lastmod"] and len(r["lastmod"]) == 10 for r in lm)
