"""Winnowing fingerprints: the SWA guarantee (shared substrings => shared
fingerprints), shift invariance, and the pair-detection operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_crawler_spark.functions import winnow


def test_identical_docs_identical_fps():
    a = winnow.winnow_fingerprints("the quick brown fox jumps over the lazy dog")
    b = winnow.winnow_fingerprints("the quick brown fox jumps over the lazy dog")
    assert a == b and len(a) > 0


def test_shared_substring_guarantee():
    """Any shared run of >= w + k - 1 chars must share >= 1 fingerprint."""
    shared = "a long common passage that appears verbatim in both documents"
    d1 = "prefix one " + shared + " suffix alpha"
    d2 = "totally different lead-in " + shared + " other tail"
    f1 = set(winnow.winnow_fingerprints(d1))
    f2 = set(winnow.winnow_fingerprints(d2))
    assert f1 & f2, "winnowing guarantee violated"


def test_disjoint_docs_disjoint_fps():
    f1 = set(winnow.winnow_fingerprints("aaaa bbbb cccc dddd eeee ffff"))
    f2 = set(winnow.winnow_fingerprints("zzzz yyyy xxxx wwww vvvv uuuu"))
    assert not (f1 & f2)


def test_short_and_empty_docs():
    assert winnow.winnow_fingerprints("") == []
    assert winnow.winnow_fingerprints("abc") == []  # shorter than k
    assert len(winnow.winnow_fingerprints("abcdefgh")) == 1  # exactly one k-gram


def test_case_insensitive():
    assert winnow.winnow_fingerprints("Hello World Document") == winnow.winnow_fingerprints(
        "hello world document"
    )


def test_naive_oracle_matches_vectorized(spark):
    """The pure-Python per-row oracle (driver correctness golden) and the
    vectorized numpy path must agree exactly — including on unicode, empty,
    and shorter-than-k inputs — and no overflow warning may escape."""
    import warnings

    texts = [
        "",
        "abc",
        "abcdefgh",
        "the quick brown fox jumps over the lazy dog",
        "café naïve 数据 straße " * 5,
        "Hello World Document with MIXED case and   spaces",
        "x" * 200,
    ]
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning fails the test
        for t in texts:
            assert winnow.winnow_fingerprints(t) == winnow.naive_winnow_fingerprints(t), t


def test_spark_exploded_matches_naive(spark):
    rows = [
        (1, "a shared long passage of text for fingerprinting purposes"),
        (2, "short"),
        (3, "another document with wholly different content inside it"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(
        (r["doc_id"], r["fp"])
        for r in winnow.with_winnow(df)
        .select("doc_id", F.explode("winnow_fp").alias("fp"))
        .collect()
    )
    want = sorted(
        (i, fp) for i, t in rows for fp in winnow.naive_winnow_fingerprints(t)
    )
    assert got == want


def test_spark_pair_detection(spark):
    shared = "one common stretch of text long enough to fingerprint"
    rows = [
        (1, "intro " + shared + " end"),
        (2, "other beginning " + shared + " different end"),
        (3, "completely unrelated content with nothing in common here"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = winnow.shared_fingerprint_pairs(df, min_shared=1).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    assert (1, 2) in got
    assert not any(3 in p for p in got)


def test_pair_detection_single_udf_pass(spark):
    """The self-join must read a MATERIALIZED fingerprint frame — the winnow
    UDF never appears in the pair plan (it would otherwise execute once per
    join branch, i.e. twice over the corpus)."""
    df = spark.createDataFrame(
        [(i, f"document body number {i} with some shared boilerplate text") for i in range(4)],
        "doc_id bigint, text string",
    )
    pairs = winnow.shared_fingerprint_pairs(df, min_shared=1)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "ExistingRDD" in plan  # both branches scan the checkpointed frame


def test_pair_detection_doc_frequency_cap(spark):
    """A fingerprint hotter than max_doc_freq must not generate pairs (the
    k² boilerplate guard); rarer fingerprints still do."""
    boiler = "this exact boilerplate footer appears everywhere in the corpus"
    rare = "a genuinely rare shared passage found in just two documents"
    # byte-identical docs: every boilerplate fingerprint has df exactly 6
    # (doc-specific prefixes would create low-df junction fingerprints)
    rows = [(i, boiler) for i in range(1, 7)]
    rows += [(10, "first rare holder " + rare), (11, "second rare holder " + rare)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # cap of 5: the boilerplate fps (df=6) are pruned, the rare fps (df=2) kept
    pairs = winnow.shared_fingerprint_pairs(df, min_shared=1, max_doc_freq=5)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (10, 11) in got
    assert not any(a <= 6 and b <= 6 for a, b in got), "capped fps still paired"
    # with the cap off, the boilerplate docs do pair (sanity that the cap,
    # not the data, removed them)
    uncapped = winnow.shared_fingerprint_pairs(df, min_shared=1, max_doc_freq=None)
    got_all = {(r["a"], r["b"]) for r in uncapped.collect()}
    assert (1, 2) in got_all
