"""Parser parity: the vectorized UDF must be byte-identical to the reference
default-parser semantics (reference crawler.py:126-146) per url.

Three layers:
  1. adversarial unit cases, extract_one vs refsim.parse_html (both pure Python,
     independent implementations);
  2. full-corpus differential through Spark (ArrowEvalPython) vs the golden
     pages_meta table (computed by refsim at generation time);
  3. plan shape: the parse stage must be Arrow-vectorized, never BatchEvalPython.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_crawler_spark import refsim, synth
from web_crawler_spark.functions import html_parse

ADVERSARIAL = [
    "",
    "plain text, no tags at all",
    "<html><head><title>T</title></head><body>hi</body></html>",
    "<title>only title</title>",
    "<title></title><p>empty title -> .string is None -> stored None</p>",
    "<title>a<b>nested</b>c</title><p>multi-child title</p>",
    "<body>no title<a href='/x'>x</a></body>",
    "<script>var a = '<p>not text</p>';</script>visible",
    "<style>p { color: red }</style>styled",
    "<script><script>nested</script>after</script>tail",
    "<p>two  spaces  split</p>",
    "<p>  leading and trailing   </p>",
    "<p>line\nbreaks\r\nand\rmore</p>",
    "<p>" + "x" * 1200 + "</p>",
    "".join(f'<a href="http://h{i}.example/{i}">l{i}</a>' for i in range(25)),
    '<a>no href</a><a href="">empty href</a><a href="/rel">rel</a>',
    '<A HREF="/UPPER">case</A>',
    "<p>café straße 日本語</p>",
    "<p>&amp; &lt;escaped&gt; &#65;</p>",
    "<p>broken <b>unclosed",
    "<title>first</title><title>second</title>",
    "<!-- comment --><p>after comment</p>",
    "<p>a</p><script>s1</script><p>b</p><style>s2</style><p>c</p>",
    # --- round-4 additions: the known bs4-vs-html.parser divergence
    # classes (VERDICT r3 item 2).  refsim reimplements bs4 semantics on
    # stdlib html.parser; these pin the two independent implementations
    # (and thus the byte-parity invariant) on exactly the corners where
    # bs4's own html.parser tree-builder is known to differ from a naive
    # event walk.
    # misnested inline tags (bs4 reparents; an event stream just sees them)
    "<b><i>bold italic</b></i> tail",
    "<p><b>one<p>two</b>three",
    "<em><strong>x</em></strong><a href='/m'>m</a>",
    # <title> with entity-only / charref children
    "<title>&amp;</title><p>body</p>",
    "<title>&#65;&#66;</title>",
    "<title>&amp;&amp;</title>",
    "<title>  </title><p>ws-only title</p>",
    # CDATA-ish <script> payloads containing </ sequences
    "<script>if (a</b) { x(); }</script>after",
    "<script>var s = '</scr' + 'ipt>';</script>visible",
    "<script><!-- document.write('<p>no</p>') --></script>shown",
    "<style>a::before { content: '</div>' }</style>styled",
    # bare & and malformed entities
    "<p>a & b</p>",
    "<p>&notarealentity; &amp</p>",
    "<p>fish &chips; &lt</p>",
    "<p>&#</p><p>&#x</p>",
    "<a href='/q?a=1&b=2'>amp in href</a>",
    # non-BMP and edge charrefs
    "<p>&#128512; emoji</p>",
    "<p>&#x1F600;</p>",
    "<title>&#x1F680; rocket</title>",
    "<p>&#0; null &#xD800; surrogate</p>",
    # structure edge cases
    "<title/>self-closing title<p>x</p>",
    "<a href=/unquoted>u</a><a href = '/spaced'>s</a>",
    '<a href="/a" href="/b">dup attr</a>',
    "<a href='/outer'><a href='/inner'>nested anchors</a></a>",
    "<![CDATA[ raw <p>stuff</p> ]]><p>after cdata</p>",
    "<?php echo '<p>no</p>'; ?><p>after pi</p>",
    "<! broken decl><p>after decl</p>",
    "<p>truncated entity &am",
    "<script>unterminated script <p>swallowed",
    "<script><title>hidden</title></script><title>real</title>",
]


@pytest.mark.parametrize("html", ADVERSARIAL, ids=range(len(ADVERSARIAL)))
def test_extract_one_matches_refsim(html):
    ref = refsim.parse_html("http://t.example/", html)
    t, x, c, l = html_parse.extract_one(html)
    assert (t if t is not None else "") == ref["title"] or t == ref["title"]
    # reference stores "" when soup.title is absent, else .string (may be None)
    assert t == ref["title"] or (t == "" and ref["title"] == "")
    assert x == ref["text"]
    assert c == ref["links_count"]
    assert l == ref["links"]


def test_spark_parse_matches_golden_corpus(spark, sf_small):
    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    got = (
        html_parse.with_parsed(pages.select("url", "html"))
        .select("url", "parsed.*")
        .toPandas()
        .set_index("url")
        .sort_index()
    )
    want = (
        spark.read.parquet(synth.synth_path("0.001", "pages_meta"))
        .select("url", "title", "text", "links_count", "links")
        .toPandas()
        .set_index("url")
        .sort_index()
    )
    assert len(got) == len(want) == 1000
    assert (got["title"].fillna("") == want["title"].fillna("")).all()
    # byte-identical text per url (the driver's per-row invariant)
    assert (got["text"] == want["text"]).all()
    assert (got["links_count"] == want["links_count"]).all()
    assert all(list(a) == list(b) for a, b in zip(got["links"], want["links"]))


def test_parse_plan_is_arrow_vectorized(spark, sf_small):
    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    plan = (
        html_parse.with_parsed(pages.select("url", "html"))
        .select("url", "parsed.title")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF in plan"
    assert "ArrowEvalPython" in plan


def test_null_html_rows_pass_through(spark):
    df = spark.createDataFrame([("u1", None), ("u2", b"<p>ok</p>")], "url string, html binary")
    rows = {
        r["url"]: r
        for r in html_parse.with_parsed(df).select("url", "parsed.*").collect()
    }
    assert rows["u1"]["text"] is None and rows["u1"]["links_count"] is None
    assert rows["u2"]["text"] == "ok"


# -- density-based main-content extraction ----------------------------------

def test_main_content_boundaries(spark):
    """Block keep/drop semantics at the exact thresholds, script removal,
    null-html pass-through; Spark vs the DuckDB twin."""
    import duckdb
    import pandas as pd

    prose = "w" * html_parse.MC_MIN_BLOCK_CHARS           # exactly at min: kept
    short = "w" * (html_parse.MC_MIN_BLOCK_CHARS - 1)     # one under: dropped
    # link density exactly at 30%: 60 text chars of which 18 are anchor text
    linky_ok = "x" * 42 + '<a href="/z">' + "y" * 18 + "</a>"
    linky_bad = "x" * 41 + '<a href="/z">' + "y" * 19 + "</a>"
    docs = [
        ("u0", f"<p>{prose}</p><p>{short}</p>".encode()),
        ("u1", f"<p>{linky_ok}</p><p>{linky_bad}</p>".encode()),
        ("u2", ("<script>var x = '<p>" + "s" * 80 + "</p>';</script>"
                f"<p>{prose}</p>").encode()),
        ("u3", None),
        ("u4", b"<div>no p blocks at all</div>"),
    ]
    pdf = pd.DataFrame(docs, columns=["url", "html"])
    df = spark.createDataFrame(pdf)
    out = {r["url"]: r for r in html_parse.main_content(df).collect()}
    assert out["u0"]["n_blocks"] == 2 and out["u0"]["n_kept"] == 1
    assert out["u0"]["main_text"] == prose
    assert out["u1"]["n_kept"] == 1          # 30% density kept, over dropped
    assert out["u2"]["n_blocks"] == 1        # the script's fake <p> is gone
    assert out["u3"]["n_blocks"] == 0 and out["u3"]["main_text"] == ""
    assert out["u4"]["n_blocks"] == 0
    con = duckdb.connect()
    con.register("mc_pdf", pdf)
    got = html_parse.main_content(df).toPandas().sort_values("url").reset_index(drop=True)
    want = con.sql(html_parse.duck_main_content_sql("mc_pdf")).df().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False)


def test_main_content_plan_no_python_no_shuffle(spark, sf_small):
    from web_crawler_spark import synth

    pages = spark.read.parquet(synth.synth_path("0.001", "pages"))
    plan = (
        html_parse.main_content(pages.select("url", "html"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


META_HTML = """<html><head>
<meta charset="utf-8">
<title>T1 page</title>
<meta content="rev order desc" name="description">
<link href="http://a.example/p/1" rel="canonical">
<meta property="og:title" content="OG one">
</head><body><p>x</p></body></html>"""


def test_extract_meta_both_attr_orders(spark):
    rows = [
        ("u1", META_HTML.encode()),
        # name-first spellings + self-canonical
        ("u2", b'<head><title>T2</title>'
               b'<meta name="description" content="fwd desc">'
               b'<link rel="canonical" href="u2">'
               b'<meta content="OG two" property="og:title"></head>'),
        ("u3", b"<head></head><body>no metadata</body>"),  # all NULL
        ("u4", None),                                      # failed fetch
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r for r in html_parse.extract_meta(df).collect()}
    assert (got["u1"]["title"], got["u1"]["description"],
            got["u1"]["canonical"], got["u1"]["og_title"]) == (
        "T1 page", "rev order desc", "http://a.example/p/1", "OG one")
    assert (got["u2"]["title"], got["u2"]["description"],
            got["u2"]["canonical"], got["u2"]["og_title"]) == (
        "T2", "fwd desc", "u2", "OG two")
    for u in ("u3", "u4"):
        assert all(got[u][c] is None for c in ("title", "description", "canonical", "og_title"))
    plan = (
        html_parse.extract_meta(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_dedup_canonical_groups(spark):
    meta = spark.createDataFrame(
        [
            ("a", "c"),      # duplicate of c
            ("b", "c"),      # duplicate of c
            ("c", None),     # primary, observed
            ("d", "d"),      # self-canonical: member, not a dupe
            ("e", "ghost"),  # target never crawled
        ],
        "url string, canonical string",
    )
    got = {
        r["group_url"]: (r["n_members"], r["n_dupes"])
        for r in html_parse.dedup_canonical(meta).collect()
    }
    assert got == {"c": (3, 2), "d": (1, 0), "ghost": (1, 1)}


def test_extract_tables_crafted(spark):
    html = (
        b"<html><body><p>no table here</p>"
        b'<table class="x"><tr><th>A</th><th>B</th></tr>'
        b'<tr align="l"><td><b>bold</b> 1</td><td></td></tr>'
        b"<tr><td>only</td></tr></table>"
        b"<table><tr><td>t2</td></tr></table></body></html>"
    )
    df = spark.createDataFrame(
        [("u1", html), ("u2", b"<p>none</p>"), ("u3", None)],
        "url string, html binary",
    )
    got = {
        (r["url"], r["table_idx"], r["row_idx"]): (r["n_cells"], r["cells"])
        for r in html_parse.extract_tables(df).collect()
    }
    assert got == {
        ("u1", 0, 0): (2, ["A", "B"]),
        ("u1", 0, 1): (2, ["bold 1", ""]),   # inner markup stripped; empty cell kept
        ("u1", 0, 2): (1, ["only"]),         # ragged row keeps its true width
        ("u1", 1, 0): (1, ["t2"]),
    }
    plan = html_parse.extract_tables(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_table_column_types_crafted(spark):
    html = (
        b"<table>"
        b"<tr><th>name</th><th>qty</th><th>price</th></tr>"
        b"<tr><td>alpha</td><td>3</td><td>1.5</td></tr>"
        b"<tr><td>beta</td><td>12</td><td>2,75</td></tr>"
        b"<tr><td>gamma</td><td>x</td><td></td></tr>"
        b"</table>"
        b"<table><tr><th>h</th></tr><tr><td>only one body row</td></tr></table>"
    )
    df = spark.createDataFrame([("u", html)], "url string, html binary")
    tables = html_parse.extract_tables(df)
    got = {
        (r["table_idx"], r["col_idx"]): (r["n_values"], r["numeric_ppm"], r["col_type"])
        for r in html_parse.table_column_types(tables).collect()
    }
    # header row votes nothing; empty cell excluded from col 2's counts
    assert got[(0, 0)] == (3, 0, "text")
    assert got[(0, 1)] == (3, 666666, "numeric")   # 2/3 numeric clears 0.6 floor
    assert got[(0, 2)] == (2, 1000000, "numeric")  # both comma and dot decimals
    assert not any(t == 1 for t, _ in got)         # 1-body-row table skipped


def test_head_link_markup_crafted(spark, tmp_path):
    import duckdb

    from web_crawler_spark.functions import html_parse

    def page(url, head):
        return (url, f"<html><head>{head}</head><body><p>x</p></body></html>")

    rows = [
        # two jsonld blocks, order matters; one refresh; chain a1->a2->a3
        page("http://a/1",
             '<script type="application/ld+json">{"@type": "Article", "headline": "h one"}</script>'
             '<script type="application/ld+json">{"@type": "Product", "name": "n two"}</script>'
             '<link rel="next" href="http://a/2">'),
        page("http://a/2", '<link rel="prev" href="http://a/1"><link rel="next" href="http://a/3">'),
        page("http://a/3", '<link rel="prev" href="http://a/2">'),
        # confirmed hreflang pair b/en <-> b/de; one-way declaration to b/fr
        page("http://b/en",
             '<link rel="alternate" hreflang="de" href="http://b/de">'
             '<link rel="alternate" hreflang="fr" href="http://b/fr">'),
        page("http://b/de", '<link rel="alternate" hreflang="en" href="http://b/en">'),
        page("http://b/fr", ""),
        # rel=next cycle: c1 -> c2 -> c1 (no start => no chain rows)
        page("http://c/1", '<link rel="next" href="http://c/2">'),
        page("http://c/2", '<link rel="next" href="http://c/1">'),
        # meta refresh
        page("http://d/1", '<meta http-equiv="refresh" content="3;url=http://d/2">'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")

    jl = html_parse.extract_jsonld(df).collect()
    assert [(r["url"], r["block_pos"], r["jtype"], r["headline"], r["name"])
            for r in sorted(jl, key=lambda r: r["block_pos"])] == [
        ("http://a/1", 0, "Article", "h one", None),
        ("http://a/1", 1, "Product", None, "n two"),
    ]

    pairs = html_parse.hreflang_pairs(df).collect()
    assert [(r["url_a"], r["url_b"], r["lang_a"], r["lang_b"]) for r in pairs] == [
        ("http://b/de", "http://b/en", "de", "en")
    ]

    chains = {
        (r["url"], r["chain_id"]): r["pos"]
        for r in html_parse.pagination_chains(df).collect()
    }
    assert chains == {
        ("http://a/1", "http://a/1"): 0,
        ("http://a/2", "http://a/1"): 1,
        ("http://a/3", "http://a/1"): 2,
    }

    ref = html_parse.refresh_edges(df).collect()
    assert [(r["url"], r["delay_s"], r["target"]) for r in ref] == [
        ("http://d/1", 3, "http://d/2")
    ]

    # oracle parity on the same crafted frame (all four ops)
    p = str(tmp_path / "ext.parquet")
    df.toPandas().to_parquet(p)
    con = duckdb.connect()
    tbl = f"read_parquet('{p}')"
    assert len(con.sql(html_parse.duck_jsonld_sql(tbl)).df()) == 2
    got_pairs = con.sql(html_parse.duck_hreflang_pairs_sql(tbl)).df()
    assert len(got_pairs) == 1 and got_pairs.iloc[0]["lang_a"] == "de"
    got_chain = con.sql(html_parse.duck_pagination_sql(tbl)).df()
    assert {
        (r["url"], r["chain_id"]): r["pos"] for _, r in got_chain.iterrows()
    } == chains
    assert len(con.sql(html_parse.duck_refresh_sql(tbl)).df()) == 1


def test_extract_microdata_crafted(spark):
    from web_crawler_spark.functions import html_parse

    html = (
        "<html><body>"
        '<div itemscope itemtype="https://schema.org/Product">'
        '<span itemprop="name">Widget A</span> '
        '<meta itemprop="price" content="12.50"> '
        '<meta itemprop="sku" content=""></div> '
        '<div itemscope itemtype="https://schema.org/Person"></div> '
        '<div itemscope itemtype="https://schema.org/Article">'
        '<span itemprop="headline">Story</span></div>'
        "</body></html>"
    )
    df = spark.createDataFrame(
        [("http://m.example/1", html), ("http://m.example/2", "<html></html>")],
        "url string, html string",
    )
    rows = sorted(
        (
            (r["url"], r["item_pos"], r["prop_pos"], r["itemtype"], r["prop"], r["value"])
            for r in html_parse.extract_microdata(df).collect()
        )
    )
    assert rows == [
        ("http://m.example/1", 0, 0, "Product", "name", "Widget A"),
        ("http://m.example/1", 0, 1, "Product", "price", "12.50"),
        ("http://m.example/1", 0, 2, "Product", "sku", None),  # empty content
        # props-less Person item emits nothing; page 2 emits nothing
        ("http://m.example/1", 2, 0, "Article", "headline", "Story"),
    ]
    # map-side only: no exchange, no Python
    plan = (
        html_parse.extract_microdata(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


MICRO_NESTED_CASES = [
    # Product -> Offer -> PriceSpecification chain
    '<div itemscope itemtype="https://schema.org/Product">'
    '<span itemprop="name">Widget</span>'
    '<div itemprop="offers" itemscope itemtype="https://schema.org/Offer">'
    '<meta itemprop="priceCurrency" content="USD">'
    '<div itemprop="priceSpecification" itemscope>'
    '<span itemprop="price">9.99</span></div></div>'
    '<span itemprop="sku">ABC</span></div>',
    # multi-name props + URL attributes + empty content
    '<div itemscope itemtype="T"><a itemprop="url sameAs" href="/x">t</a>'
    '<img itemprop="image" src="/i.png">'
    '<time itemprop="datePublished" datetime="2026-01-01">Jan 1</time>'
    '<meta itemprop="empty" content=""></div>',
    # orphan prop outside scope; props-less item marker; self-closed scope
    '<span itemprop="orphan">x</span><div itemscope itemtype="E"></div>'
    '<meta itemscope itemtype="V">',
    # nested item text contributes to outer textContent prop (WHATWG)
    '<div itemscope><span itemprop="outer">A'
    '<span itemscope itemprop="inner"><span itemprop="x">B</span></span>'
    'C</span></div>',
    # script content invisible; entities decode; misnesting; unclosed EOF
    '<div itemscope><span itemprop="a">x &amp; y</span>'
    '<script><span itemprop="no">s</span></script></div>',
    '<div itemscope><b itemprop="a">bo<i>ld</b></i></div>',
    '<div itemscope itemtype="U"><span itemprop="p">unclosed',
    "", "<p>plain</p>",
]


def test_microdata_nested_engine_matches_independent_golden():
    """The HTMLParser engine walk and the hand-rolled-tokenizer golden
    (html_parse.naive_microdata_nested — zero shared parsing code) agree
    row-for-row on every adversarial nesting case."""
    from web_crawler_spark.functions.html_parse import (
        microdata_nested_one,
        naive_microdata_nested,
    )

    for html in MICRO_NESTED_CASES:
        assert microdata_nested_one(html) == naive_microdata_nested(html), html
    # semantic pins on the first case: nesting links and ownership
    rows = microdata_nested_one(MICRO_NESTED_CASES[0])
    by_item = {}
    for iid, par, pprop, ity, pos, prop, val in rows:
        by_item.setdefault(iid, []).append((par, pprop, ity, pos, prop, val))
    # item 0 = Product owns name+sku; item 1 = Offer child of 0 via
    # "offers"; item 2 = PriceSpecification child of 1
    assert {p for (_, _, _, _, p, _) in by_item[0]} == {"name", "sku"}
    assert by_item[1][0][0] == 0 and by_item[1][0][1] == "offers"
    assert by_item[2][0][0] == 1 and by_item[2][0][1] == "priceSpecification"
    assert by_item[2][0][4] == "price" and by_item[2][0][5] == "9.99"


def test_microdata_nested_spark_full_fixture(spark, sf_small):
    """Spark path == golden on the whole pages_micro_nested fixture, and
    the op is one Arrow stage with no exchange."""
    from web_crawler_spark.functions import html_parse

    df = spark.read.parquet(synth.synth_path("0.001", "pages_micro_nested"))
    out = html_parse.extract_microdata_nested(df)
    got = sorted(map(tuple, out.collect()))
    want = []
    for r in df.collect():
        for row in html_parse.naive_microdata_nested(r["html"]):
            want.append((r["url"],) + row)
    assert got == sorted(want) and len(got) > 100
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "ArrowEvalPython" not in plan  # mapInPandas stage
    assert "MapInPandas" in plan
