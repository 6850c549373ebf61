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
