"""Web-corpus filter operators (functions/webtext.py) vs DuckDB oracles.

Two layers, per the repo's oracle-contract discipline: a CRAFTED boundary
fixture that pins every edge semantics (empty doc, blank lines, exact
word-count / terminal-punctuation boundaries, PII at string edges, case /
whitespace variant lines, all-lines-dropped docs), then the deterministic
synth ``webdocs`` table end-to-end — the same comparison the driver runs.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from web_crawler_spark import synth
from web_crawler_spark.functions import webtext

BOUNDARY_DOCS = [
    "",  # empty doc: 1 line (the empty string) in clean_lines, 0 in dedup
    "\n",  # two blank lines
    "One two three four five.",  # exactly MIN_LINE_WORDS -> kept
    "One two three four.",  # one word short -> dropped
    'He said the frontier was "done"?',  # ends with terminal ? and a quote
    'Quoted terminal words one two three four."',  # ends with "
    "a\tb\tc\td\te.",  # tabs are \s+ separators: 5 words
    "No terminal punctuation so this line is dropped",
    "This website uses cookies so drop it now.",  # blacklist: cookie
    "Enable JAVASCRIPT to continue reading this page today.",  # case-insensitive
    "Copyright notice follows the usual pattern here today.",
    "mail a.b+c-d@x-y.co now",  # email with +, -, subdomain-ish host
    "user@example.com",  # email is the whole line
    "555-123-4567",  # phone is the whole line
    "Call 555-123-4567 or 555-123-4567 to reach us.",  # two phones
    "Reach me at first.last@sub.domain.org or 200-300-4000 today.",
    "digits 1234-567-89012 overlap the phone shape.",  # embedded match
    "Shared syndicated line one two three four five six.\nUnique follow-up sentence two three four five six.",
    "shared SYNDICATED line one two three four five six.",  # case variant -> dedup
    "  Shared syndicated line one two three four five six.  ",  # ws variant
    "Repeat me twice in this doc.\nRepeat me twice in this doc.\nOther line.",
    "buy now buy now buy now buy now.",  # dominant 2-gram
    "tok",  # single token: zero bigrams
    "Trailing newline keeps an empty last line.\n",
    "café straße 数据 tiếng việt.",  # non-ASCII chars and lengths
    # Gopher-gate boundaries
    "the and " + " ".join(["crawl"] * 48) + ".",  # 25: exactly MIN_DOC_WORDS, ok
    "the and " + " ".join(["crawl"] * 47) + ".",  # 26: 49 words -> too short
    "- bullet one two\n* bullet three four\nProse line here.",  # 27: 2/3 bullets
    "Read more about the crawl frontier...",  # 28: ellipsis line
    "### hash # soup #",  # 29: symbol-heavy, no stop words
    "the, and. that; with!",  # 30: stop words behind edge punctuation
    # duplicate-ngram boundaries (8-grams)
    "alpha beta gamma delta epsilon zeta eta theta",  # 31: exactly 8 tokens
    "alpha beta gamma delta epsilon zeta eta",  # 32: 7 tokens -> 0 grams
    "ALPHA beta gamma delta epsilon zeta eta theta iota",  # 33: shares a gram
    "w1 w2 w3 w4 w5 w6 w7 w8 w1 w2 w3 w4 w5 w6 w7 w8",  # 34: self-repeat
]


@pytest.fixture(scope="module")
def boundary(spark, tmp_path_factory):
    pdf = pd.DataFrame(
        {"doc_id": range(len(BOUNDARY_DOCS)), "text": BOUNDARY_DOCS}
    )
    p = str(tmp_path_factory.mktemp("webtext") / "boundary.parquet")
    pdf.to_parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW wdocs AS SELECT * FROM read_parquet('{p}')")
    return spark.read.parquet(p), con


def _cmp(spark_df, duck_rel, key_cols=("doc_id",)):
    got = spark_df.toPandas().sort_values(list(key_cols)).reset_index(drop=True)
    want = duck_rel.df().sort_values(list(key_cols)).reset_index(drop=True)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_clean_lines_boundary(boundary):
    df, con = boundary
    _cmp(webtext.clean_lines(df), con.sql(webtext.duck_clean_lines_sql("wdocs")))


def test_repetition_boundary(boundary):
    df, con = boundary
    _cmp(webtext.repetition_stats(df), con.sql(webtext.duck_repetition_sql("wdocs")))


def test_pii_boundary(boundary):
    df, con = boundary
    _cmp(webtext.pii_scrub(df), con.sql(webtext.duck_pii_sql("wdocs")))


def test_dedup_lines_boundary(boundary):
    df, con = boundary
    _cmp(
        webtext.dedup_corpus_lines(df),
        con.sql(webtext.duck_dedup_lines_sql("wdocs")),
    )


def test_gopher_boundary(boundary):
    df, con = boundary
    _cmp(webtext.gopher_quality(df), con.sql(webtext.duck_gopher_sql("wdocs")))


def test_gopher_semantics(boundary):
    df, _ = boundary
    rows = {r["doc_id"]: r for r in webtext.gopher_quality(df).collect()}
    assert rows[25]["n_words"] == 50 and rows[25]["gopher_ok"] == 1
    assert rows[26]["n_words"] == 49 and rows[26]["gopher_ok"] == 0
    assert rows[27]["bullet_line_ppm"] == 666_666
    assert rows[28]["ellipsis_line_ppm"] == 1_000_000
    assert rows[29]["symbol_word_ppm"] > webtext.MAX_SYMBOL_WORD_PPM
    assert rows[29]["n_stop_hits"] == 0
    # edge punctuation is stripped before stop matching; hits are distinct
    assert rows[30]["n_stop_hits"] == 4
    assert rows[24]["nonascii_ppm"] > 0
    assert rows[0]["n_words"] == 0 and rows[0]["gopher_ok"] == 0


def test_dup_ngrams_boundary(boundary):
    df, con = boundary
    _cmp(
        webtext.duplicate_ngram_stats(df),
        con.sql(webtext.duck_dup_ngrams_sql("wdocs")),
    )


def test_dup_ngrams_semantics(boundary):
    df, _ = boundary
    rows = {r["doc_id"]: r for r in webtext.duplicate_ngram_stats(df).collect()}
    # 31 has exactly one 8-gram, shared (case-folded) with 33's first gram
    assert rows[31]["n_grams"] == 1 and rows[31]["dup_gram_ppm"] == 1_000_000
    assert rows[32]["n_grams"] == 0 and rows[32]["dup_gram_ppm"] == 0
    assert rows[33]["n_grams"] == 2 and rows[33]["dup_gram_ppm"] == 500_000
    # 34: 16 tokens -> 9 grams; 'w1..w8' occurs at offsets 0 and 8 (cnt 2);
    # every other gram is unique corpus-wide
    assert rows[34]["n_grams"] == 9
    assert rows[34]["dup_gram_ppm"] == 222_222
    assert rows[0]["n_grams"] == 0


def test_clean_web_corpus_boundary(boundary):
    df, con = boundary
    _cmp(
        webtext.clean_web_corpus(df),
        con.sql(webtext.duck_clean_web_corpus_sql("wdocs")),
    )


def test_clean_web_corpus_gopher_gate(boundary):
    """Gate-on wiring parity: the Gopher document gate slots between line
    filtering and the repetition gate, mirrored in the composed oracle."""
    df, con = boundary
    _cmp(
        webtext.clean_web_corpus(df, gopher_gate=True),
        con.sql(webtext.duck_clean_web_corpus_sql("wdocs", gopher_gate=True)),
    )


def test_clean_lines_semantics(boundary):
    df, _ = boundary
    rows = {r["doc_id"]: r for r in webtext.clean_lines(df).collect()}
    assert rows[2]["n_kept"] == 1  # exactly MIN_LINE_WORDS survives
    assert rows[3]["n_kept"] == 0  # one short
    assert rows[8]["n_kept"] == 0  # cookie blacklist
    assert rows[9]["n_kept"] == 0  # JAVASCRIPT case-insensitive
    assert rows[0]["n_lines"] == 1 and rows[0]["n_kept"] == 0
    assert rows[1]["n_lines"] == 2  # "\n" -> two empty lines


def test_pii_semantics(boundary):
    df, _ = boundary
    rows = {r["doc_id"]: r for r in webtext.pii_scrub(df).collect()}
    assert rows[13]["n_phones"] == 1 and rows[13]["text_redacted"] == "<PHONE>"
    assert rows[12]["n_emails"] == 1 and rows[12]["text_redacted"] == "<EMAIL>"
    assert rows[14]["n_phones"] == 2
    assert rows[15]["n_emails"] == 1 and rows[15]["n_phones"] == 1


def test_dedup_lines_first_wins(boundary):
    df, _ = boundary
    rows = {r["doc_id"]: r for r in webtext.dedup_corpus_lines(df).collect()}
    # doc 17 owns the first occurrence; 19 (case variant) and 20 (whitespace
    # variant) lose their copy; 21 keeps one of its two identical lines
    assert rows[17]["n_kept"] == 2
    assert rows[18]["n_kept"] == 0
    assert rows[19]["n_kept"] == 0
    assert rows[20]["n_kept"] == 2  # "Repeat me" once + "Other line."
    assert rows[0]["n_lines"] == 0 and rows[0]["text_dedup"] == ""


@pytest.mark.slow
def test_webtext_on_synth_webdocs(spark):
    """End-to-end parity on the graded fixture at sf0.001 — the driver's
    comparison, in miniature."""
    synth.ensure_synth("0.001")
    p = synth.synth_path("0.001", "webdocs")
    df = spark.read.parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW wd AS SELECT * FROM read_parquet('{p}')")
    _cmp(webtext.clean_lines(df), con.sql(webtext.duck_clean_lines_sql("wd")))
    _cmp(webtext.repetition_stats(df), con.sql(webtext.duck_repetition_sql("wd")))
    _cmp(webtext.pii_scrub(df), con.sql(webtext.duck_pii_sql("wd")))
    _cmp(
        webtext.dedup_corpus_lines(df), con.sql(webtext.duck_dedup_lines_sql("wd"))
    )
    _cmp(webtext.gopher_quality(df), con.sql(webtext.duck_gopher_sql("wd")))
    _cmp(
        webtext.duplicate_ngram_stats(df), con.sql(webtext.duck_dup_ngrams_sql("wd"))
    )
    # the enriched fixture must exercise both sides of the gate
    ok_counts = (
        webtext.gopher_quality(df).groupBy("gopher_ok").count().collect()
    )
    assert {r["gopher_ok"] for r in ok_counts} == {0, 1}
    _cmp(
        webtext.clean_web_corpus(df), con.sql(webtext.duck_clean_web_corpus_sql("wd"))
    )
    _cmp(
        webtext.clean_web_corpus(df, gopher_gate=True),
        con.sql(webtext.duck_clean_web_corpus_sql("wd", gopher_gate=True)),
    )


# -- decontamination ----------------------------------------------------------

BENCH_DOCS = [
    "alpha beta gamma delta epsilon zeta eta theta",  # = doc 31's one gram
    "W1 W2 W3 W4 W5 W6 W7 W8",  # uppercase copy of doc 34's repeat unit
    "fresh bench item sharing nothing with any training document at all.",
    "seven tokens only so zero grams",
    "",
]


@pytest.fixture(scope="module")
def bench(spark, tmp_path_factory):
    pdf = pd.DataFrame({"eval_id": range(len(BENCH_DOCS)), "text": BENCH_DOCS})
    p = str(tmp_path_factory.mktemp("bench") / "bench.parquet")
    pdf.to_parquet(p)
    return p


def test_decontaminate_boundary(boundary, bench, spark):
    df, con = boundary
    con.sql(f"CREATE VIEW bdocs AS SELECT * FROM read_parquet('{bench}')")
    bdf = spark.read.parquet(bench)
    _cmp(
        webtext.decontaminate(df, bdf),
        con.sql(webtext.duck_decontaminate_sql("wdocs", "bdocs")),
    )


def test_decontaminate_semantics(boundary, bench, spark):
    df, _ = boundary
    out = {
        r["doc_id"]: r
        for r in webtext.decontaminate(df, spark.read.parquet(bench)).collect()
    }
    # doc 31: exactly 8 tokens -> one gram, equal to bench item 0
    assert out[31]["n_grams"] == 1 and out[31]["n_contam"] == 1
    assert out[31]["contaminated"]
    # doc 32: 7 tokens -> zero grams, clean by construction
    assert out[32]["n_grams"] == 0 and not out[32]["contaminated"]
    # doc 33: case variant shares doc 31's gram after lowercasing
    assert out[33]["contaminated"] and out[33]["n_contam"] == 1
    # doc 34: 16 tokens, 9 gram positions but 8 DISTINCT grams; only the
    # repeat unit itself is in the bench (via the uppercase bench item)
    assert out[34]["n_grams"] == 8 and out[34]["n_contam"] == 1
    # empty doc: no grams
    assert out[0]["n_grams"] == 0 and not out[0]["contaminated"]


def test_decontaminate_on_synth(spark):
    """Graded-fixture parity at sf0.001 + both labels present + the
    benchmark join side is a broadcast (the 100 TB plan shape)."""
    synth.ensure_synth("0.001")
    wp = synth.synth_path("0.001", "webdocs")
    ep = synth.synth_path("0.001", "evaldocs")
    df, ev = spark.read.parquet(wp), spark.read.parquet(ep)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW wd AS SELECT * FROM read_parquet('{wp}')")
    con.sql(f"CREATE VIEW ed AS SELECT * FROM read_parquet('{ep}')")
    out = webtext.decontaminate(df, ev)
    _cmp(out, con.sql(webtext.duck_decontaminate_sql("wd", "ed")))
    labels = {r["contaminated"] for r in out.select("contaminated").distinct().collect()}
    assert labels == {True, False}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_export_corpus_composition(spark):
    """End-to-end export parity at sf0.001, plus a structural check that the
    kept set is exactly (cleaning survivors - contaminated) and that the
    graded fixture really exercises the decontamination drop."""
    synth.ensure_synth("0.001")
    wp = synth.synth_path("0.001", "webdocs")
    ep = synth.synth_path("0.001", "evaldocs")
    df, ev = spark.read.parquet(wp), spark.read.parquet(ep)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW wd AS SELECT * FROM read_parquet('{wp}')")
    con.sql(f"CREATE VIEW ed AS SELECT * FROM read_parquet('{ep}')")
    out = webtext.export_corpus(df, ev)
    _cmp(out, con.sql(webtext.duck_export_corpus_sql("wd", "ed")))
    got_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    # every excluded-but-clean doc fell to a cleaning gate, not decon; every
    # contaminated CLEANED doc is absent
    cleaned = webtext.clean_web_corpus(df)
    flags = webtext.decontaminate(
        cleaned.select("doc_id", F.col("text_out").alias("text")), ev
    )
    bad = {r["doc_id"] for r in flags.filter("contaminated").collect()}
    survivors = {r["doc_id"] for r in cleaned.select("doc_id").collect()}
    assert got_ids == survivors - bad
    assert bad, "fixture must exercise the decontamination drop"


def test_remove_duplicate_spans_crafted(spark, tmp_path):
    """Span removal semantics: case-insensitive gram matching, overlapping
    covered windows merge, short/empty docs pass through untouched, original
    case survives in the rewritten text; DuckDB oracle is bit-exact."""
    import duckdb
    import pandas as pd

    from web_crawler_spark.functions import webtext

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta COMMON one two "
            "three four five six seven eight tail1"),
        (2, "common one two three four five six seven eight tail2 unique "
            "words that stay here fine ok yes"),
        (3, "short doc"),
        (4, ""),
        (5, "alpha beta gamma delta epsilon zeta eta theta different ending "
            "here now ok fine sure yes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in webtext.remove_duplicate_spans(df).collect()
    }
    # doc1: shared 8-gram prefix with doc5 + case-folded COMMON..eight span
    # with doc2 cover 17 of 18 tokens
    assert got[1] == (18, 17, "tail1")
    assert got[2] == (18, 9, "tail2 unique words that stay here fine ok yes")
    assert got[3] == (2, 0, "short doc")
    assert got[4] == (0, 0, "")
    assert got[5] == (16, 8, "different ending here now ok fine sure yes")

    p = str(tmp_path / "spans.parquet")
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(p)
    want = {
        int(r["doc_id"]): (int(r["n_tokens"]), int(r["n_removed"]), r["clean_text"])
        for _, r in duckdb.sql(
            webtext.duck_dedup_spans_sql(f"read_parquet('{p}')")
        ).df().iterrows()
    }
    assert want == got


# -- unicode / encoding quality gate ------------------------------------------

UNICODE_DOCS = [
    "plain ascii text, perfectly clean.",  # 0
    "",  # 1: empty -> n_chars 0, ppm 0 via greatest(.,1), clean
    "one caf\u00e9 accent inside " + "plain word filler " * 12,  # 2: small ppm
    "\u6570\u636e \u65e5\u672c\u8a9e ti\u1ebfng vi\u1ec7t",  # 3: mostly non-ASCII -> over budget
    "mojibake: \u00c3\u00a9 and \u00c2\u00b7 and \u00e2\u20ac\u0153quoted\u00e2\u20ac",  # 4: cp1252 markers
    "bad byte \ufffd here",  # 5: replacement char
    "ctrl\x07bell and\x1bescape",  # 6: control chars
    "tabs\tand\nnewlines\rare fine.",  # 7: tab/newline/CR are NOT control hits
    "edge \u00c3",  # 8: marker at string end
]


@pytest.fixture(scope="module")
def unicode_docs(spark, tmp_path_factory):
    pdf = pd.DataFrame({"doc_id": range(len(UNICODE_DOCS)), "text": UNICODE_DOCS})
    p = str(tmp_path_factory.mktemp("unidocs") / "docs.parquet")
    pdf.to_parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW ud AS SELECT * FROM read_parquet('{p}')")
    return spark.read.parquet(p), con


def test_unicode_quality_boundary(unicode_docs, spark):
    df, con = unicode_docs
    got = webtext.unicode_quality(df)
    _cmp(got, con.sql(webtext.duck_unicode_sql("ud")))
    by_id = {r.doc_id: r for r in got.collect()}
    assert by_id[0].clean and by_id[0].n_nonascii == 0
    assert by_id[1].clean and by_id[1].nonascii_ppm == 0
    assert by_id[2].clean  # light accents within budget
    assert not by_id[3].clean and by_id[3].nonascii_ppm > webtext.MAX_NONASCII_PPM
    assert not by_id[4].clean and by_id[4].n_mojibake >= 4
    assert not by_id[5].clean and by_id[5].n_replacement == 1
    assert not by_id[6].clean and by_id[6].n_ctrl == 2
    assert by_id[7].clean and by_id[7].n_ctrl == 0
    assert by_id[8].n_mojibake == 1


def test_unicode_quality_on_pages(spark):
    synth.ensure_synth("0.001")
    p = synth.synth_path("0.001", "pages")
    pages = spark.read.parquet(p).select("url", "text")
    got = webtext.unicode_quality(pages, id_col="url")
    con = duckdb.connect()
    _cmp(
        got,
        con.sql(webtext.duck_unicode_sql(f"read_parquet('{p}')", id_col="url")),
        key_cols=("url",),
    )
    # the fixture must exercise both sides of the ppm gate
    assert got.filter("clean").count() > 0
    assert got.filter("NOT clean").count() > 0


# -- per-host template mining + strip ------------------------------------------

NAV = "Home | About | Contact"
FOOT = "Copyright tpl.example 2024."


def _hostdocs_df(spark, tmp_path):
    rows = []
    for p in range(5):  # 5 pages: NAV on all, FOOT on 4/5 (80% >= 60%)
        lines = [NAV, f"Unique content {p} paragraph one.", f"More text {p}."]
        if p != 0:
            lines.insert(2, FOOT)
        rows.append(("tpl.example", f"tpl/p{p}", "\n".join(lines)))
    # a line on 2/5 pages (40% < 60%) must survive
    rows[1] = ("tpl.example", "tpl/p1", rows[1][2].replace(
        "More text 1.", "Semi common line.\nMore text 1."))
    rows[2] = ("tpl.example", "tpl/p2", rows[2][2] + "\nSemi common line.")
    # tiny host below TPL_MIN_PAGES: identical lines survive
    rows += [("tiny.example", "tiny/p0", "Shared.\nBody zero."),
             ("tiny.example", "tiny/p1", "Shared.\nBody one.")]
    pdf = pd.DataFrame(rows, columns=["host", "doc_id", "text"])
    p = str(tmp_path / "hostdocs.parquet")
    pdf.to_parquet(p)
    return spark.read.parquet(p), p


def test_host_template_mining_semantics(spark, tmp_path):
    df, _ = _hostdocs_df(spark, tmp_path)
    tpl = {(r["host"], r["line"]) for r in webtext.host_template_lines(df).collect()}
    assert ("tpl.example", NAV) in tpl
    assert ("tpl.example", FOOT) in tpl  # 80% of pages clears the 60% bar
    assert all(l not in ("Semi common line.",) for _, l in tpl)
    assert all(h != "tiny.example" for h, _ in tpl)  # below min-pages floor


def test_strip_host_templates_order_and_parity(spark, tmp_path):
    df, p = _hostdocs_df(spark, tmp_path)
    out = {r["doc_id"]: r for r in webtext.strip_host_templates(df).collect()}
    # order preserved, only template lines gone
    assert out["tpl/p1"]["text_clean"] == (
        "Unique content 1 paragraph one.\nSemi common line.\nMore text 1."
    )
    assert out["tpl/p0"]["n_dropped"] == 1      # NAV only (no FOOT on p0)
    assert out["tiny/p0"]["n_dropped"] == 0     # tiny host untouched
    con = duckdb.connect()
    _cmp(
        webtext.strip_host_templates(df),
        con.sql(webtext.duck_strip_templates_sql(f"read_parquet('{p}')")),
        ["doc_id"],
    )


def test_strip_host_templates_synth_parity(spark):
    synth.ensure_synth("0.001")
    path = synth.synth_path("0.001", "hostdocs")
    df = spark.read.parquet(path)
    out = webtext.strip_host_templates(df)
    assert out.where(F.col("n_dropped") > 0).count() > 0
    assert (
        out.where((F.col("host") == "tiny.example") & (F.col("n_dropped") > 0)).count()
        == 0
    )
    con = duckdb.connect()
    _cmp(
        out,
        con.sql(webtext.duck_strip_templates_sql(f"read_parquet('{path}')")),
        ["doc_id"],
    )


def test_code_detect_signals(spark):
    from web_crawler_spark.functions import webtext

    code = "def f(x):\n    return {x: [1]};\n    y = f(2)\nz = []"
    prose = "The quick brown fox jumps over the lazy dog again and again."
    docs = spark.createDataFrame(
        [(1, code), (2, prose), (3, ""), (4, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in webtext.code_detect(docs).collect()}
    assert got[1]["is_code"]
    assert not got[2]["is_code"] and got[2]["symbol_ppm"] == 0
    assert not got[3]["is_code"] and not got[4]["is_code"]
    plan = webtext.code_detect(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_docs_windows(spark):
    from web_crawler_spark.functions import webtext

    words = " ".join(f"w{i}" for i in range(150))
    docs = spark.createDataFrame(
        [(1, words), (2, "a b"), (3, ""), (4, None)], "doc_id long, text string"
    )
    out = webtext.chunk_docs(docs, size=64, overlap=16).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 150 tokens, stride 48: starts 0,48,96,144 -> sizes 64,64,54,6
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["n_tokens"] for r in c1] == [64, 64, 54, 6]
    # overlap: chunk k starts at stride*k, so chunk1 begins at token 48
    assert c1[1]["chunk"].split()[0] == "w48"
    assert c1[0]["chunk"].split()[48] == "w48"   # shared overlap region
    assert c1[3]["chunk"].split() == [f"w{i}" for i in range(144, 150)]
    assert [r["n_tokens"] for r in by_doc[2]] == [2]  # short doc: one tail chunk
    assert 3 not in by_doc and 4 not in by_doc      # empty docs emit nothing


def test_soft404_flags_crafted(spark, tmp_path):
    import duckdb

    from web_crawler_spark.functions import webtext

    long_body = "<p>" + " ".join(["word"] * 100) + "</p>"
    rows = [
        # marker + thin vs host mean -> soft404
        ("http://a/404", "a", "<html><title>404 Not Found</title><body>Page Not Found</body></html>"),
        ("http://a/big1", "a", f"<html><body>{long_body}</body></html>"),
        ("http://a/big2", "a", f"<html><body>{long_body}</body></html>"),
        # marker but NOT thin (every page on host b is the same size)
        ("http://b/1", "b", "<html><body>404 things I did</body></html>"),
        ("http://b/2", "b", "<html><body>three more word rows</body></html>"),
        # thin but no marker
        ("http://a/stub", "a", "<html><body>short page</body></html>"),
    ]
    df = spark.createDataFrame(rows, "url string, host string, html string")
    got = {r["url"]: r for r in webtext.soft404_flags(df).collect()}
    assert got["http://a/404"]["has_marker"] and got["http://a/404"]["soft404"]
    assert got["http://b/1"]["has_marker"] and not got["http://b/1"]["soft404"]
    assert not got["http://a/stub"]["has_marker"] and not got["http://a/stub"]["soft404"]
    assert got["http://a/big1"]["host_mean_tokens"] == got["http://a/404"]["host_mean_tokens"]
    # oracle parity
    p = str(tmp_path / "s404.parquet")
    df.toPandas().to_parquet(p)
    con = duckdb.connect()
    want = con.sql(webtext.duck_soft404_sql(f"read_parquet('{p}')")).df()
    for _, r in want.iterrows():
        g = got[r["url"]]
        assert (g["has_marker"], g["n_tokens"], g["host_mean_tokens"], g["soft404"]) == (
            r["has_marker"], r["n_tokens"], r["host_mean_tokens"], r["soft404"]
        )


def test_char_diversity_boundary(boundary):
    df, con = boundary
    _cmp(
        webtext.char_diversity(df),
        con.sql(webtext.duck_char_diversity_sql("wdocs")),
    )


def test_char_diversity_pinned(spark):
    """Hand-computed collision / top-char values: all-same-char saturates
    at 1e6 ppm, alternation halves the top share, empty and NULL text are
    all-zeros rows (not dropped), all-distinct has zero collisions."""
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, ""), (4, None), (5, "abcd")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_chars"],
            r["n_distinct_chars"],
            r["collision_ppm"],
            r["top_char_ppm"],
        )
        for r in webtext.char_diversity(df).collect()
    }
    assert got == {
        1: (4, 1, 1_000_000, 1_000_000),
        2: (4, 2, 333_333, 500_000),
        3: (0, 0, 0, 0),
        4: (0, 0, 0, 0),
        5: (4, 4, 0, 250_000),
    }


def test_host_lang_mix_crafted(spark, tmp_path):
    """Hand-computed concentration: 2-of-3 English host, single-page
    host, an exact tie breaking to the lexicographically smaller lang,
    and NULL lang folding to 'und'.  DuckDB parity on the same frame."""
    import duckdb

    rows = [
        ("http://h1.example/a", "en"),
        ("http://h1.example/b", "en"),
        ("http://h1.example/c", "de"),
        ("http://h2.example/a", "fr"),
        ("http://h3.example/a", "en"),
        ("http://h3.example/b", "de"),
        ("http://h4.example/a", None),
    ]
    df = spark.createDataFrame(rows, "url string, lang string")
    got = {
        r["host"]: (
            r["n_pages"], r["n_langs"], r["top_lang"],
            r["top_lang_ppm"], r["lang_collision_ppm"],
        )
        for r in webtext.host_lang_mix(df).collect()
    }
    assert got == {
        "h1.example": (3, 2, "en", 666_666, 333_333),
        "h2.example": (1, 1, "fr", 1_000_000, 0),
        "h3.example": (2, 2, "de", 500_000, 0),
        "h4.example": (1, 1, "und", 1_000_000, 0),
    }
    p = str(tmp_path / "langmix.parquet")
    df.toPandas().to_parquet(p)
    oracle = {
        r["host"]: (
            r["n_pages"], r["n_langs"], r["top_lang"],
            r["top_lang_ppm"], r["lang_collision_ppm"],
        )
        for _, r in duckdb.sql(
            webtext.duck_host_lang_mix_sql(f"read_parquet('{p}')")
        ).df().iterrows()
    }
    assert oracle == got


def test_syndicated_lines_crafted(spark, tmp_path):
    """A line on 3 hosts qualifies; one on 2 hosts does not (even with
    many docs); within-host repeats don't inflate n_hosts; a doc
    repeating the line twice votes once (array_distinct); blank lines
    never qualify.  DuckDB parity."""
    import duckdb

    wire = "Share this story on your favorite network."
    local = "Local header only here."
    rows = [
        ("h1", "h1/a", wire + "\nUnique a\n" + wire),   # dup within doc
        ("h1", "h1/b", wire + "\nUnique b"),
        ("h2", "h2/a", wire + "\n" + local),
        ("h3", "h3/a", wire + "\n\n" + local),          # blank line too
        ("h4", "h4/a", "Nothing shared"),
    ]
    df = spark.createDataFrame(rows, "host string, doc_id string, text string")
    got = {
        r["line"]: (r["n_hosts"], r["n_docs"])
        for r in webtext.syndicated_lines(df).collect()
    }
    # wire: hosts {h1,h2,h3}, docs {h1/a, h1/b, h2/a, h3/a}; local only 2 hosts
    assert got == {wire: (3, 4)}
    p = str(tmp_path / "synd.parquet")
    df.toPandas().to_parquet(p)
    oracle = {
        r["line"]: (r["n_hosts"], r["n_docs"])
        for _, r in duckdb.sql(
            webtext.duck_syndicated_lines_sql(f"read_parquet('{p}')")
        ).df().iterrows()
    }
    assert oracle == got


def test_corpus_drift_exact_tv(spark):
    """Hand-computed drift: corpus A = 'x x y z', corpus B = 'x y y y'.
    Shares (ppm): A {x:500000, y:250000, z:250000}, B {x:250000, y:750000,
    z:0} -> deltas {x:250000, y:500000, z:250000}, TV = 500000.  Identical
    corpora -> TV 0.  Oracle parity."""
    import duckdb
    import pandas as pd

    from web_crawler_spark.functions import webtext

    a = spark.createDataFrame([("x x y z",)], "text string")
    b = spark.createDataFrame([("x y y y",)], "text string")
    rows = {r["term"]: r for r in webtext.corpus_drift(a, b, k=10).collect()}
    assert rows["x"]["share_a_ppm"] == 500_000
    assert rows["x"]["share_b_ppm"] == 250_000
    assert rows["y"]["delta_ppm"] == 500_000
    assert rows["z"]["share_b_ppm"] == 0 and rows["z"]["delta_ppm"] == 250_000
    assert all(r["tv_ppm"] == 500_000 for r in rows.values())
    # ranks: y (500000) first, then x before z by term tie-break
    assert [r["term"] for r in sorted(rows.values(), key=lambda r: r["rnk"])] \
        == ["y", "x", "z"]

    same = webtext.corpus_drift(a, a, k=10).collect()
    assert all(r["delta_ppm"] == 0 and r["tv_ppm"] == 0 for r in same)

    con = duckdb.connect()
    con.register("da", a.toPandas())
    con.register("db", b.toPandas())
    want = (
        con.sql(webtext.duck_corpus_drift_sql("da", "db", k=10))
        .df()
        .sort_values("rnk")
        .reset_index(drop=True)
    )
    got = (
        webtext.corpus_drift(a, b, k=10)
        .toPandas()
        .sort_values("rnk")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_compression_signal_orders_repetition(spark):
    """A template dump must compress far better (lower ratio) than
    high-entropy text; empty text is filtered, not crashed; values match
    an independent row-at-a-time zlib computation."""
    import zlib

    from web_crawler_spark.functions import webtext

    rep = "buy cheap widgets now " * 60
    import random as _r
    rng = _r.Random(7)
    rand = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(8))
        for _ in range(150)
    )
    df = spark.createDataFrame(
        [(1, rep), (2, rand), (3, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in webtext.compression_signal(df).collect()}
    assert set(out) == {1, 2}  # empty doc filtered
    assert out[1]["ratio_ppm"] < out[2]["ratio_ppm"] // 5  # repetition caught
    for doc_id, text in ((1, rep), (2, rand)):
        raw = text.encode("utf-8")
        want = len(zlib.compress(raw, webtext.COMPRESS_LEVEL))
        assert out[doc_id]["n_bytes"] == len(raw)
        assert out[doc_id]["n_compressed"] == want
        assert out[doc_id]["ratio_ppm"] == want * 10**6 // len(raw)


def test_cdc_chunks_vectorized_matches_naive_and_survives_shift(spark):
    """The numpy sliding-window gear hash must equal the per-byte
    shift-register golden chunk-for-chunk; chunks must exactly tile each
    document; and inserting one byte at the front of a long document must
    leave most chunk hashes intact (the content-defined property fixed-size
    blocks lack)."""
    import random

    from web_crawler_spark.functions.webtext import cdc_chunks, naive_cdc_chunks

    rng = random.Random(7)
    base = "".join(rng.choice("abcdefgh \n") for _ in range(3000))
    docs = [
        (0, base),
        (1, "x" + base),          # one-byte shift
        (2, "short"),             # below min chunk size
        (3, ""),                  # empty -> no chunks
        (4, "y" * 700),           # no boundary mass -> max-size cuts
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (
            (r["doc_id"], r["chunk_idx"], r["start_off"], r["n_bytes"], r["chunk_hash"])
            for r in cdc_chunks(df).collect()
        )
    )
    want = sorted(
        t for doc_id, text in docs for t in naive_cdc_chunks(doc_id, text)
    )
    assert got == want

    by_doc = {}
    for doc_id, _, start, nb, h in got:
        by_doc.setdefault(doc_id, []).append((start, nb, h))
    for doc_id, text in docs:
        chunks = sorted(by_doc.get(doc_id, []))
        assert sum(nb for _, nb, _ in chunks) == len(text.encode())
        pos = 0
        for start, nb, _ in chunks:
            assert start == pos
            pos += nb

    h0 = {h for _, _, h in by_doc[0]}
    h1 = {h for _, _, h in by_doc[1]}
    shared = len(h0 & h1)
    assert shared >= len(h0) * 6 // 10  # most chunks survive the shift
    # max-size enforcement on the boundary-free doc
    assert all(nb <= 256 for _, nb, _ in by_doc[4])
    assert max(nb for _, nb, _ in by_doc[4]) == 256


def test_lsh_capped_pairs_star_equals_clique_components(spark):
    """Hot bands (identical-template clones) emit a star, cold bands are
    byte-identical to the uncapped join; connected components agree
    between star and clique topologies; DuckDB twin matches."""
    import duckdb
    import pandas as pd

    from web_crawler_spark.functions import dedupsim as ds

    base = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3),
        (3, "totally different content words nothing shared here at all " * 3),
    ]
    spam = [(100 + i, "spam clone template " * 8) for i in range(10)]
    docs = spark.createDataFrame(base + spam, "doc_id long, text string")
    bands = ds.lsh_bands(ds.minhash_signatures(ds.shingles(docs)))
    capped = ds.lsh_candidate_pairs_capped(bands, max_band_docs=4)
    got = {(r["a"], r["b"]) for r in capped.collect()}
    # cold band: the near-dup pair survives all-pairs exactly
    assert (1, 2) in got
    # hot band (10 clones > cap 4): star to min id 100, no clique
    star = {(a, b) for a, b in got if a >= 100 or b >= 100}
    assert star == {(100, 100 + i) for i in range(1, 10)}
    # components equal the uncapped topology's components
    full = ds.lsh_candidate_pairs(bands)
    comp_full = {
        r["doc_id"]: r["component"]
        for r in ds.connected_components(full, docs.select("doc_id")).collect()
    }
    comp_star = {
        r["doc_id"]: r["component"]
        for r in ds.connected_components(capped, docs.select("doc_id")).collect()
    }
    assert comp_full == comp_star
    # DuckDB twin parity on the same corpus
    pdf = pd.DataFrame(base + spam, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        (r[0], r[1])
        for r in con.sql(ds.duck_lsh_pairs_capped_sql("t", 4)).fetchall()
    }
    assert got == want
