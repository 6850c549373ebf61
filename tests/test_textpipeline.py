"""Training-data pipeline operators vs DuckDB oracles (differential tests on
the driver's documents/embeddings fixtures at sf0.001)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from web_crawler_spark.functions import dedupsim, simsearch, textstats

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    return con


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _cmp(spark_df, duck_rel, key_cols):
    got = spark_df.toPandas().sort_values(key_cols).reset_index(drop=True)
    want = duck_rel.df().sort_values(key_cols).reset_index(drop=True)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_quality_vs_duckdb(spark, duck, docs):
    t = F.col("text")
    cols = textstats.quality_columns(t)
    sdf = docs.select("doc_id", *[c.alias(n) for n, c in cols.items()])
    _cmp(sdf, duck.sql(textstats.duck_quality_sql("documents")), ["doc_id"])


def test_tokens_vs_duckdb(spark, duck, docs):
    sdf = docs.select(
        "doc_id",
        textstats.token_count(F.col("text")).cast("long").alias("n_tokens"),
        textstats.bpe_ish_token_count(F.col("text")).cast("long").alias("n_tokens_bpe"),
    )
    _cmp(sdf, duck.sql(textstats.duck_tokens_sql("documents")), ["doc_id"])


def test_langid_vs_duckdb(spark, duck, docs):
    sdf = docs.select("doc_id", textstats.lang_pred(F.col("text")).alias("lang_pred"))
    _cmp(sdf, duck.sql(textstats.duck_langid_sql("documents")), ["doc_id"])


def test_fingerprint_vs_duckdb(spark, duck, docs):
    sdf = docs.select("doc_id", textstats.fingerprint(F.col("text")).alias("fingerprint"))
    _cmp(sdf, duck.sql(textstats.duck_fingerprint_sql("documents")), ["doc_id"])


def test_minhash_vs_duckdb(spark, duck, docs):
    sh = dedupsim.shingles(docs)
    sdf = dedupsim.minhash_signatures(sh)
    got = sdf.toPandas().sort_values("doc_id").reset_index(drop=True)
    want = duck.sql(dedupsim.duck_minhash_sql("documents")).df().sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(want["doc_id"])
    for a, b in zip(got["sig"], want["sig"]):
        assert list(a) == list(b)


def test_lsh_pairs_vs_duckdb(spark, duck, docs):
    sh = dedupsim.shingles(docs)
    pairs = dedupsim.lsh_candidate_pairs(dedupsim.lsh_bands(dedupsim.minhash_signatures(sh)))
    got = sorted(map(tuple, pairs.toPandas()[["a", "b"]].values.tolist()))
    want = sorted(map(tuple, duck.sql(dedupsim.duck_lsh_pairs_sql("documents")).df()[["a", "b"]].values.tolist()))
    assert got == want


def test_exact_dups_vs_duckdb(spark, duck, docs):
    # corpus has no exact dups; add forced duplicates to exercise the operator
    dup = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 100000)
    corpus = docs.unionByName(dup)
    sdf = dedupsim.exact_dup_groups(corpus)
    duck.sql(
        "CREATE OR REPLACE VIEW corpus AS SELECT * FROM documents UNION ALL "
        "SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars FROM "
        "(SELECT * FROM documents ORDER BY doc_id LIMIT 5)"
    )
    _cmp(sdf, duck.sql(dedupsim.duck_exact_dups_sql("corpus")), ["text_md5"])


def test_minhash_exploded_vs_duckdb(spark, duck, docs):
    sh = dedupsim.shingles(docs)
    sdf = dedupsim.minhash_exploded(dedupsim.minhash_signatures(sh))
    _cmp(sdf, duck.sql(dedupsim.duck_minhash_exploded_sql("documents")), ["doc_id", "hash_idx"])


def test_simhash_vs_duckdb(spark, duck, docs):
    """The DuckDB port of the 32-bit shift/mask vote pipeline is exact."""
    _cmp(dedupsim.simhash(docs), duck.sql(dedupsim.duck_simhash_sql("documents")), ["doc_id"])


def test_connected_components_crafted_graph(spark):
    """Chain, star, triangle, and singletons — the iterative propagation must
    match a pure-python union-find exactly, including diameter > 1 chains
    (one propagation round is not enough)."""
    pairs = [
        (1, 2), (2, 3), (3, 4), (4, 5),        # chain: diameter 4
        (10, 11), (10, 12), (10, 13),          # star
        (20, 21), (21, 22), (20, 22),          # triangle
    ]
    all_docs = sorted({x for p in pairs for x in p} | {30, 31})  # +singletons
    pdf = spark.createDataFrame(pairs, "a bigint, b bigint")
    docs_df = spark.createDataFrame([(d,) for d in all_docs], "doc_id bigint")
    got = {
        (r["doc_id"], r["component"])
        for r in dedupsim.connected_components(pdf, docs=docs_df).collect()
    }

    parent = {d: d for d in all_docs}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        parent[max(ra, rb)] = min(ra, rb)
    want = {(d, find(d)) for d in all_docs}
    assert got == want
    assert (30, 30) in got  # singleton keeps its own id


def test_components_vs_duckdb(spark, duck, docs):
    _cmp(
        dedupsim.connected_components(
            dedupsim.lsh_candidate_pairs(
                dedupsim.lsh_bands(
                    dedupsim.minhash_signatures(dedupsim.shingles(docs))
                )
            ),
            docs=docs,
        ),
        duck.sql(dedupsim.duck_components_sql("documents")),
        ["doc_id"],
    )


def test_top_terms_vs_duckdb(spark, duck, docs):
    _cmp(
        textstats.top_terms(docs),
        duck.sql(textstats.duck_top_terms_sql("documents")),
        ["doc_id", "rnk"],
    )


def test_top_terms_ranking_semantics(spark):
    rows = [
        (1, "apple apple apple banana banana cherry"),
        (2, "banana banana banana apple"),
        (3, "unique unique unique words here apple"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["rnk"]): (r["term"], r["tf"], r["df"])
        for r in textstats.top_terms(df, k=2).collect()
    }
    # doc 1: apple tf=3 wins; banana tf=2 over cherry tf=1
    assert got[(1, 1)] == ("apple", 3, 3)
    assert got[(2, 1)] == ("banana", 3, 2)
    # doc 3: 'unique' tf=3 first; tf-1 tie among (apple df=3, here df=1,
    # words df=1) -> df ASC then term ASC picks 'here'
    assert got[(3, 1)] == ("unique", 3, 1)
    assert got[(3, 2)] == ("here", 1, 1)


def test_simhash_deterministic_and_groups_dups(spark, docs):
    dup = docs.limit(3).withColumn("doc_id", F.col("doc_id") + 100000)
    corpus = docs.unionByName(dup)
    fp = dedupsim.simhash(corpus).toPandas().set_index("doc_id")["simhash"]
    for i in range(3):
        orig = int(docs.orderBy("doc_id").limit(3).collect()[i]["doc_id"])
        assert fp[orig] == fp[orig + 100000]
    # determinism across runs
    fp2 = dedupsim.simhash(corpus).toPandas().set_index("doc_id")["simhash"]
    assert fp.sort_index().equals(fp2.sort_index())


def test_jaccard_identical_docs(spark, docs):
    dup = docs.limit(3).withColumn("doc_id", F.col("doc_id") + 100000)
    corpus = docs.unionByName(dup)
    sh = dedupsim.shingles(corpus)
    pairs = spark.createDataFrame(
        [(i, i + 100000) for r in docs.orderBy("doc_id").limit(3).collect() for i in [r["doc_id"]]],
        "a bigint, b bigint",
    )
    jac = dedupsim.jaccard_for_pairs(pairs, sh).toPandas()
    assert (jac["jaccard_ppm"] == 1000000).all()


def test_brute_force_topk_vs_duckdb(spark, duck):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    got = simsearch.brute_force_topk(emb, q, k=5)
    _cmp(got, duck.sql(simsearch.duck_brute_force_sql("embeddings", 10, 5)), ["query_id", "rank"])


def test_lsh_topk_recall(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    exact = simsearch.brute_force_topk(emb, q, k=5).toPandas()
    approx = simsearch.lsh_topk(emb, q, n_dims=64, k=5, n_planes=6).toPandas()
    exact_set = set(map(tuple, exact[["query_id", "neighbor_id"]].values.tolist()))
    approx_set = set(map(tuple, approx[["query_id", "neighbor_id"]].values.tolist()))
    recall = len(exact_set & approx_set) / len(exact_set)
    # multi-table (8 tables, radius-1 probes) measures 0.91 on this fixture;
    # pinned with margin — a broken probe order would land far below this
    assert recall > 0.85
    # probe-order determinism: the full pipeline is RNG-free
    again = simsearch.lsh_topk(emb, q, n_dims=64, k=5, n_planes=6).toPandas()
    assert sorted(map(tuple, approx.values.tolist())) == sorted(
        map(tuple, again.values.tolist())
    )


def test_multimodal_sniff_and_features(spark, sf_small):
    from web_crawler_spark import synth
    from web_crawler_spark.functions import codecs, multimodal

    media = spark.read.parquet(synth.synth_path("0.001", "media"))
    sniff = multimodal.sniff_kinds(media).join(media.select("media_id", "kind"), "media_id")
    rows = sniff.collect()
    assert all(r["kind_sniffed"] == r["kind"] for r in rows)

    feats = multimodal.extract_features(media)
    pdf = feats.toPandas()
    assert len(pdf) == media.count()
    assert all(len(f) == multimodal.FEATURE_DIM for f in pdf["feature"])
    # decode is REAL as of round 4: image features carry the true decoded
    # dimensions (synth stores them in width/height), audio features carry
    # the true sample rate
    dims = {r["media_id"]: (r["width"], r["height"], r["kind"]) for r in media.collect()}
    for _, r in pdf.iterrows():
        w, h, kind = dims[r["media_id"]]
        if kind == "image":
            assert r["feature"][0] == float(w) and r["feature"][1] == float(h)
        elif kind == "audio":
            assert r["feature"][0] == 8000.0
    # malformed payloads raise ValueError from the decoder (operators
    # convert that to null/skip rows, never a task failure)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\nxxxx")
    # ... and the feature extractor's fallback kicks in for them
    bad = spark.createDataFrame(
        [(99, "image", bytearray(b"\x89PNG\r\n\x1a\nnot-a-real-png"))],
        "media_id long, kind string, payload binary",
    )
    fb = multimodal.extract_features(bad).collect()[0]
    assert len(fb["feature"]) == multimodal.FEATURE_DIM


def test_ivf_topk_recall(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    exact = simsearch.brute_force_topk(emb, q, k=5).toPandas()
    approx = simsearch.ivf_topk(emb, q, k=5, n_lists=16, nprobe=10).toPandas()
    exact_set = set(map(tuple, exact[["query_id", "neighbor_id"]].values.tolist()))
    approx_set = set(map(tuple, approx[["query_id", "neighbor_id"]].values.tolist()))
    recall = len(exact_set & approx_set) / len(exact_set)
    # spherical-k-means centroids + nprobe 10/16 measures 0.89 here; pinned
    # with margin (the pre-k-means sampled centroids measured 0.40-0.76)
    assert recall > 0.8
    # determinism: same run twice -> identical output
    again = simsearch.ivf_topk(emb, q, k=5, n_lists=16, nprobe=10).toPandas()
    assert sorted(map(tuple, approx.values.tolist())) == sorted(map(tuple, again.values.tolist()))


def test_cosine_dup_exact_vs_duckdb(spark, duck):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = simsearch.cosine_dup_pairs_exact(emb, threshold_ppm=400_000)
    _cmp(got, duck.sql(simsearch.duck_cosine_dups_sql("embeddings", 400_000)), ["a", "b"])


def test_cosine_dup_lsh_finds_planted_pairs(spark):
    """Plant perturbed copies (cosine ~0.999) and require the LSH scale path
    to recover most planted pairs without an n^2 join."""
    import numpy as np

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(100).collect()
    rows = [(r["vec_id"], list(r["embedding"])) for r in emb]
    rng = np.random.default_rng(7)
    planted = [
        (vid + 100000, list(np.asarray(v) + rng.normal(0, 0.01, len(v))))
        for vid, v in rows[:30]
    ]
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows + planted],
        "vec_id bigint, embedding array<float>",
    )
    found = simsearch.cosine_dup_pairs_lsh(
        corpus, n_dims=64, threshold_ppm=990_000, n_planes=8
    ).collect()
    pairs = {(r["a"], r["b"]) for r in found}
    hits = sum((vid, vid + 100000) in pairs for vid, _ in rows[:30])
    assert hits == 30  # multi-table multiprobe recovers every planted pair


def test_multimodal_resize_and_frames(spark, sf_small):
    from web_crawler_spark import synth
    from web_crawler_spark.functions import codecs, multimodal

    media = spark.read.parquet(synth.synth_path("0.001", "media"))
    thumbs = multimodal.resize_images(media, out_w=32, out_h=24).toPandas()
    imgs = thumbs[thumbs["thumb"].notna()]
    n_images = media.filter("kind = 'image'").count()
    assert len(imgs) == n_images and len(thumbs) == media.count()
    assert (imgs["out_w"] == 32).all() and (imgs["out_h"] == 24).all()
    # thumbs are REAL PNGs at the requested size
    for t in imgs["thumb"][:10]:
        w, h, ch, img = codecs.decode_png(bytes(t))
        assert (w, h, ch) == (32, 24, 3)
    # deterministic
    again = multimodal.resize_images(media, out_w=32, out_h=24).toPandas()
    assert list(imgs["thumb"]) == list(again[again["thumb"].notna()]["thumb"])

    frames = multimodal.sample_frames(media, max_frames=3).toPandas()
    vids = media.filter("kind = 'video' AND duration_s > 0").toPandas()
    per_vid = frames.groupby("media_id").size()
    for _, v in vids.iterrows():
        # synth invariant: m = min(8, max(1, floor(dur))) container frames
        expect = min(3, min(8, max(1, int(v["duration_s"]))))
        assert per_vid[v["media_id"]] == expect
    # every emitted frame is a REAL decodable PNG
    for fbytes in frames["frame"][:10]:
        w, h, ch, _img = codecs.decode_png(bytes(fbytes))
        assert (w, h, ch) == (16, 12, 3)
    # timestamps strictly increasing per video and inside the duration
    for mid, grp in frames.groupby("media_id"):
        ts = list(grp.sort_values("frame_idx")["ts_ms"])
        assert ts == sorted(ts) and len(set(ts)) == len(ts)
        dur_ms = float(vids.set_index("media_id").loc[mid, "duration_s"]) * 1000
        assert all(0 <= t <= dur_ms for t in ts)


def test_clean_corpus_vs_duckdb(spark, duck, docs):
    """The composed cleaning pipeline (exact dedup -> LSH near-dup prune ->
    quality gate -> langid) matches its single-query DuckDB oracle — wiring
    verified, not just the stages."""
    from web_crawler_spark.plans import corpus

    got = corpus.clean_corpus(docs)
    _cmp(got, duck.sql(corpus.duck_clean_corpus_sql("documents")), ["doc_id"])
    n_in, n_out = docs.count(), got.count()
    assert 0 < n_out <= n_in


def test_link_class_counts_edges(spark):
    from web_crawler_spark.functions import linkstats

    rows = [
        (
            "http://a.example/p/1",
            [
                "http://a.example/p/2",        # internal
                "HTTP://A.EXAMPLE/p/3",        # internal despite case
                "http://a.example:80/p/4",     # internal despite port
                "https://b.example/x",         # external
                "/relative/path",              # relative
                "not a url at all",            # relative bucket (no scheme)
            ],
        ),
        ("http://c.example/", None),  # null links
    ]
    got = {
        r["url"]: (r["n_links"], r["n_internal"], r["n_external"], r["n_relative"])
        for r in linkstats.link_class_counts(
            spark.createDataFrame(rows, "url string, links array<string>")
        ).collect()
    }
    assert got["http://a.example/p/1"] == (6, 3, 1, 2)
    assert got["http://c.example/"] == (0, 0, 0, 0)


def test_host_graph_edges(spark, tmp_path):
    import duckdb

    from web_crawler_spark.functions import linkstats

    rows = [
        ("http://a.example/p/1", "a.example",
         ["http://b.example/x", "HTTPS://B.EXAMPLE/y",  # case-folds, merges
          "http://a.example/self", "/relative", "not a url",
          "http://c.example:8080/port"]),
        ("http://a.example/p/2", "a.example", ["http://b.example/z"]),
        ("http://b.example/", "b.example", None),
    ]
    df = spark.createDataFrame(rows, "url string, host string, links array<string>")
    out = {
        (r["src_host"], r["dst_host"]): (r["n_links"], r["n_src_pages"])
        for r in linkstats.host_graph(df).collect()
    }
    # relative + garbage links drop; case/scheme variants fold; port strips
    assert out[("a.example", "b.example")] == (3, 2)
    assert out[("a.example", "a.example")] == (1, 1)
    assert out[("a.example", "c.example")] == (1, 1)
    assert len(out) == 3
    # oracle parity on the same frame
    p = str(tmp_path / "hg.parquet")
    df.toPandas().to_parquet(p)
    con = duckdb.connect()
    want = con.sql(
        linkstats.duck_host_graph_sql(f"read_parquet('{p}')")
    ).df()
    assert len(want) == 3
    for _, r in want.iterrows():
        assert out[(r["src_host"], r["dst_host"])] == (r["n_links"], r["n_src_pages"])


def _naive_pagerank(edges, iters, scale):
    """Independent integer-exact power iteration (dict arithmetic)."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    out: dict = {}
    for s, _, w in edges:
        out[s] = out.get(s, 0) + w
    rank = {h: scale // n for h in nodes}
    base = (15 * scale) // (100 * n)
    for _ in range(iters):
        inflow = {h: 0 for h in nodes}
        for s, d, w in edges:
            inflow[d] += (rank[s] * w) // out[s]
        share = sum(rank[h] for h in nodes if h not in out) // n
        rank = {h: base + (85 * (inflow[h] + share)) // 100 for h in nodes}
    return rank


def test_host_pagerank_integer_exact(spark, tmp_path):
    import duckdb

    from web_crawler_spark.functions import linkstats

    # a -> b (x2 pages), a -> c, b -> a; c is dangling (linked-to, no links)
    rows = [
        ("http://a.example/1", "a.example",
         ["http://b.example/x", "http://c.example/y"]),
        ("http://a.example/2", "a.example", ["http://b.example/z"]),
        ("http://b.example/", "b.example",
         ["http://a.example/1", "http://a.example/1"]),  # weight-2 edge
        ("http://c.example/", "c.example", None),
    ]
    df = spark.createDataFrame(rows, "url string, host string, links array<string>")
    got = {
        r["host"]: r["rank_ppb"]
        for r in linkstats.host_pagerank(df).collect()
    }
    edges = [
        ("a.example", "b.example", 2),
        ("a.example", "c.example", 1),
        ("b.example", "a.example", 2),
    ]
    want = _naive_pagerank(edges, linkstats.PR_ITERS, linkstats.PR_SCALE)
    assert got == want
    # mass stays ~1.0 (floor losses only) and the 2-weight target outranks c
    assert 0.95 * linkstats.PR_SCALE < sum(got.values()) <= linkstats.PR_SCALE
    assert got["b.example"] > got["c.example"]
    # partition-count invariance: integer arithmetic is reduction-order-free
    got8 = {
        r["host"]: r["rank_ppb"]
        for r in linkstats.host_pagerank(df.repartition(8)).collect()
    }
    assert got8 == got
    # DuckDB oracle parity on the same frame
    p = str(tmp_path / "pr.parquet")
    df.toPandas().to_parquet(p)
    oracle = {
        r["host"]: int(r["rank_ppb"])
        for _, r in duckdb.sql(
            linkstats.duck_pagerank_sql(f"read_parquet('{p}')")
        ).df().iterrows()
    }
    assert oracle == got


def test_anchor_texts_crafted(spark, tmp_path):
    """Anchor aggregation: relative hrefs resolve against the page host,
    empty hrefs drop, repeated (target, anchor) pairs count up; DuckDB
    oracle reproduces the table exactly."""
    import duckdb

    from web_crawler_spark.functions import linkstats

    html_a = (
        '<p><a href="/x">go</a> and <a href="http://b.example/y">go</a>'
        ' and <a href="/x">go</a> and <a href="">skip</a></p>'
    ).encode()
    html_b = '<a href="http://a.example/x">go</a><a href="/z">other</a>'.encode()
    df = spark.createDataFrame(
        [("http://a.example/p", html_a), ("http://b.example/q", html_b)],
        "url string, html binary",
    )
    got = {
        (r["dst_url"], r["anchor"]): r["n_refs"]
        for r in linkstats.anchor_texts(df).collect()
    }
    assert got == {
        ("http://a.example/x", "go"): 3,  # 2 relative on a + 1 absolute from b
        ("http://b.example/y", "go"): 1,
        ("http://b.example/z", "other"): 1,
    }
    p = str(tmp_path / "anchors.parquet")
    df.toPandas().to_parquet(p)
    want = {
        (r["dst_url"], r["anchor"]): int(r["n_refs"])
        for _, r in duckdb.sql(
            linkstats.duck_anchor_texts_sql(f"read_parquet('{p}')")
        ).df().iterrows()
    }
    assert want == got


def test_rank_frontier_semantics_and_plan(spark, tmp_path):
    """PageRank-prioritized frontier batch: budget cap, rank inheritance,
    unranked-host zero default, and the broadcast + WindowGroupLimit plan."""
    import duckdb

    from web_crawler_spark.functions import linkstats

    rows = [
        ("http://hub.example/p/1", "hub.example",
         ["http://leaf.example/a", "http://leaf.example/b"]),
        ("http://leaf.example/a", "leaf.example", ["http://hub.example/p/1"]),
    ]
    pm = spark.createDataFrame(rows, "url string, host string, links array<string>")
    ranks = linkstats.host_pagerank(pm)
    # frontier: 3 leaf urls (budget 2 drops the lexicographically last),
    # 1 hub url, 1 unranked-host url, 1 relative (dropped: no host)
    frontier = spark.createDataFrame(
        [("http://leaf.example/a",), ("http://leaf.example/b",),
         ("http://leaf.example/c",), ("http://hub.example/p/1",),
         ("http://island.example/z",), ("/relative/only",)],
        "url string",
    )
    out = linkstats.rank_frontier(frontier, ranks, budget=2)
    got = {r.url: (r.host, r.rank_ppb, r.host_seq) for r in out.collect()}
    assert set(got) == {
        "http://leaf.example/a", "http://leaf.example/b",
        "http://hub.example/p/1", "http://island.example/z",
    }
    rank_of = {r.host: r.rank_ppb for r in ranks.collect()}
    assert got["http://leaf.example/a"] == ("leaf.example", rank_of["leaf.example"], 1)
    assert got["http://leaf.example/b"][2] == 2
    assert got["http://island.example/z"][1] == 0  # unranked host -> 0
    # plan: per-host cap prunes map-side; the rank join broadcasts
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan
    # oracle parity on the same frames
    p = str(tmp_path / "rfpm.parquet")
    pm.toPandas().to_parquet(p)
    fp = str(tmp_path / "rffr.parquet")
    frontier.toPandas().to_parquet(fp)
    con = duckdb.connect()
    want = con.sql(linkstats.duck_rank_frontier_sql(
        f"read_parquet('{fp}')", f"read_parquet('{p}')", budget=2)).df()
    assert {
        (r["url"], r["host"], r["rank_ppb"], r["host_seq"])
        for _, r in want.iterrows()
    } == {(u, h, r, s) for u, (h, r, s) in got.items()}


def test_unigram_score_crafted(spark, tmp_path):
    """Integer-exact unigram LM score: common-term doc scores higher than a
    rare-term doc; empty doc -> (0, 0); oracle parity on the same frame."""
    import duckdb

    from web_crawler_spark.functions import textstats

    rows = [
        (0, "the the the cat"),   # 'the' dominates the corpus
        (1, "the cat sat"),
        (2, "zyxwv qqqqz"),       # rare terms only -> low score
        (3, ""),                  # empty -> n_terms 0, score 0
        (4, "THE The the"),       # case folds into the common term
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textstats.unigram_score(df)
    got = {r.doc_id: (r.n_terms, r.score_ppm) for r in out.collect()}
    assert got[3] == (0, 0)
    assert got[0][1] > got[2][1]          # common beats rare
    assert got[4][1] > got[1][1]          # all-'the' beats mixed
    # 12 corpus tokens: the=7, cat=2, sat=1, zyxwv=1, qqqqz=1
    the_ppm = 7 * 1_000_000 // 12
    assert got[4] == (3, the_ppm)
    # oracle parity
    p = str(tmp_path / "uni.parquet")
    df.toPandas().to_parquet(p)
    con = duckdb.connect()
    want = {
        int(r["doc_id"]): (int(r["n_terms"]), int(r["score_ppm"]))
        for _, r in con.sql(
            textstats.duck_unigram_sql(f"read_parquet('{p}')")
        ).df().iterrows()
    }
    assert want == got


def test_inverted_postings_crafted(spark, tmp_path):
    """Cap semantics: df counts ALL docs, postings keep the first `cap`
    ascending; dedup within doc; WindowGroupLimit in the plan."""
    import duckdb

    from web_crawler_spark.functions import textstats

    rows = [(i, "common") for i in range(5)] + [
        (0, "common rare"),        # 'common' twice in doc 0 -> counted once
        (9, "only here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").groupBy(
        "doc_id"
    ).agg(F.concat_ws(" ", F.collect_list("text")).alias("text"))
    out = textstats.inverted_postings(df, cap=3)
    got = {r.term: (r.df, list(r.postings)) for r in out.collect()}
    assert got["common"] == (5, [0, 1, 2])       # df=5, postings capped at 3
    assert got["rare"] == (1, [0])
    assert got["only"] == (1, [9])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    # oracle parity
    p = str(tmp_path / "post.parquet")
    df.toPandas().to_parquet(p)
    con = duckdb.connect()
    want = {
        r["term"]: (int(r["df"]), list(r["postings"]))
        for _, r in con.sql(
            textstats.duck_postings_sql(f"read_parquet('{p}')", cap=3)
        ).df().iterrows()
    }
    assert want == got


def test_host_link_spam_crafted(spark, tmp_path):
    """A farm (high fan-out, nobody links back) is flagged; an organic hub
    (reciprocated) is not; below-min-out hosts are never flagged."""
    import duckdb

    from web_crawler_spark.functions import linkstats

    def page(host, i, links):
        return (f"http://{host}/p/{i}", host, links)

    rows = (
        # farm.example links to 6 victims, none link back
        [page("farm.example", i, [f"http://v{i}.example/x"]) for i in range(6)]
        # hub.example <-> 5 partners (full reciprocity)
        + [page("hub.example", i, [f"http://p{i}.example/x"]) for i in range(5)]
        + [page(f"p{i}.example", 0, ["http://hub.example/x"]) for i in range(5)]
        # tiny.example: fan-out 1, zero reciprocity -> below min_out, not spam
        + [page("tiny.example", 0, ["http://v0.example/x"])]
        # self-loops are excluded from every signal
        + [page("selfy.example", 0, ["http://selfy.example/y"])]
    )
    df = spark.createDataFrame(rows, "url string, host string, links array<string>")
    out = linkstats.host_link_spam(df, min_out=5)
    got = {r.host: r for r in out.collect()}
    assert got["farm.example"].spam and got["farm.example"].recip_ppm == 0
    assert got["farm.example"].out_hosts == 6
    assert not got["hub.example"].spam
    assert got["hub.example"].recip_ppm == 1_000_000
    assert not got["tiny.example"].spam  # below min_out
    assert "selfy.example" not in got    # only self-loop -> no out-edges
    # oracle parity
    p = str(tmp_path / "spam.parquet")
    df.toPandas().to_parquet(p)
    con = duckdb.connect()
    want = {
        r["host"]: (int(r["out_hosts"]), int(r["in_hosts"]),
                    int(r["recip_hosts"]), int(r["recip_ppm"]), bool(r["spam"]))
        for _, r in con.sql(
            linkstats.duck_link_spam_sql(f"read_parquet('{p}')", min_out=5)
        ).df().iterrows()
    }
    assert want == {
        h: (r.out_hosts, r.in_hosts, r.recip_hosts, r.recip_ppm, r.spam)
        for h, r in got.items()
    }


def test_trustrank_crafted(spark, tmp_path):
    """Trust decays from the seeds: a host linked by a seed earns trust, a
    spam island unreachable from seeds gets 0; oracle agrees bit-for-bit."""
    import duckdb

    from web_crawler_spark.functions import linkstats

    rows = [
        ("http://good.example/p/0", "good.example", ["http://mid.example/x"]),
        ("http://mid.example/p/0", "mid.example", ["http://good.example/x"]),
        # spam island: links among themselves, unreachable from seeds
        ("http://spam1.example/p/0", "spam1.example", ["http://spam2.example/x"]),
        ("http://spam2.example/p/0", "spam2.example", ["http://spam1.example/x"]),
    ]
    df = spark.createDataFrame(rows, "url string, host string, links array<string>")
    seeds = spark.createDataFrame([("good.example",)], "host string")
    out = linkstats.host_trustrank(df, seeds)
    got = {r.host: r.trust_ppb for r in out.collect()}
    assert got["good.example"] > got["mid.example"] > 0
    assert got["spam1.example"] == 0 and got["spam2.example"] == 0
    # oracle parity (bit-exact integers)
    p = str(tmp_path / "tr.parquet")
    df.toPandas().to_parquet(p)
    con = duckdb.connect()
    want = {
        r["host"]: int(r["trust_ppb"])
        for _, r in con.sql(
            linkstats.duck_trustrank_sql(
                f"read_parquet('{p}')", "SELECT 'good.example' AS host"
            )
        ).df().iterrows()
    }
    assert want == got
    # empty seed set -> all zeros, no crash
    zero = linkstats.host_trustrank(
        df, spark.createDataFrame([], "host string")
    )
    assert {r.trust_ppb for r in zero.collect()} == {0}


def test_simhash_pairs_semantics(spark, tmp_path):
    """Identical docs pair at hamming 0; near-identical docs land within the
    radius; unrelated docs don't pair; pigeonhole recall is exact at <=3 —
    verified against an all-pairs brute force on the same signatures."""
    import duckdb

    from web_crawler_spark.functions import dedupsim

    base = "the quick brown fox jumps over the lazy dog " * 6
    rows = [
        (0, base),
        (1, base),                              # identical -> hamming 0
        (2, base + "extra tail token"),         # near-dup
        (3, "completely different content about spark shuffles " * 6),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedupsim.simhash_pairs(df)
    got = {(r.a, r.b): r.hamming for r in out.collect()}
    assert got[(0, 1)] == 0
    # brute-force ground truth at the same radius from the signatures
    sig = {r.doc_id: r.simhash for r in dedupsim.simhash(df).collect()}
    want = {
        (a, b): bin(sig[a] ^ sig[b]).count("1")
        for a in sig for b in sig if a < b
        and bin(sig[a] ^ sig[b]).count("1") <= dedupsim.SIMHASH_PAIR_MAX_HAMMING
    }
    assert got == want  # exact recall (pigeonhole) AND no false extras
    # oracle parity
    p = str(tmp_path / "shp.parquet")
    df.toPandas().to_parquet(p)
    con = duckdb.connect()
    oracle = {
        (int(r["a"]), int(r["b"])): int(r["hamming"])
        for _, r in con.sql(
            dedupsim.duck_simhash_pairs_sql(f"read_parquet('{p}')")
        ).df().iterrows()
    }
    assert oracle == got


def _naive_hits(edges, iters, scale):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    hub = {h: scale // n for h in nodes}
    auth = {h: 0 for h in nodes}
    for _ in range(iters):
        araw = {h: 0 for h in nodes}
        for s, d, w in edges:
            araw[d] += hub[s] * w
        qa = max(sum(araw.values()) // scale, 1)
        auth = {h: araw[h] // qa for h in nodes}
        hraw = {h: 0 for h in nodes}
        for s, d, w in edges:
            hraw[s] += auth[d] * w
        qh = max(sum(hraw.values()) // scale, 1)
        hub = {h: hraw[h] // qh for h in nodes}
    return {h: (auth[h], hub[h]) for h in nodes}


def test_host_hits_integer_exact(spark, tmp_path):
    import duckdb

    from web_crawler_spark.functions import linkstats

    # a links to b (x2 pages + a weight-2 edge) and c; b links back to a;
    # c is a pure authority (linked-to, links nowhere)
    rows = [
        ("http://a.example/1", "a.example",
         ["http://b.example/x", "http://c.example/y"]),
        ("http://a.example/2", "a.example",
         ["http://b.example/z", "http://b.example/z"]),
        ("http://b.example/", "b.example", ["http://a.example/1"]),
        ("http://c.example/", "c.example", None),
    ]
    df = spark.createDataFrame(rows, "url string, host string, links array<string>")
    got = {
        r["host"]: (r["auth_ppb"], r["hub_ppb"])
        for r in linkstats.host_hits(df).collect()
    }
    edges = [
        ("a.example", "b.example", 3),
        ("a.example", "c.example", 1),
        ("b.example", "a.example", 1),
    ]
    want = _naive_hits(edges, linkstats.HITS_ITERS, linkstats.HITS_SCALE)
    assert got == want
    # a is the dominant hub; b is the dominant authority
    assert got["a.example"][1] > got["b.example"][1]
    assert got["b.example"][0] > got["c.example"][0]
    # partition-count invariance: integer arithmetic is reduction-order-free
    got8 = {
        r["host"]: (r["auth_ppb"], r["hub_ppb"])
        for r in linkstats.host_hits(df.repartition(8)).collect()
    }
    assert got8 == got
    # DuckDB oracle parity on the same frame
    p = str(tmp_path / "hits.parquet")
    df.toPandas().to_parquet(p)
    oracle = {
        r["host"]: (int(r["auth_ppb"]), int(r["hub_ppb"]))
        for _, r in duckdb.sql(
            linkstats.duck_hits_sql(f"read_parquet('{p}')")
        ).df().iterrows()
    }
    assert oracle == got


def _naive_bm25(docs, query, k):
    import re

    toks = {
        i: [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
        for i, txt in docs
    }
    n = len(docs)
    total = sum(len(v) for v in toks.values())
    avgdl_ppm = total * 1_000_000 // n
    scores = {}
    for t in dict.fromkeys(query):
        dfq = sum(1 for v in toks.values() if t in v)
        if dfq == 0:
            continue
        idf = (2 * (n - dfq) + 1) * 1_000_000 // (2 * dfq + 1)
        for i, v in toks.items():
            tf = v.count(t)
            if not tf:
                continue
            dl_ratio = len(v) * 1_000_000_000_000 // avgdl_ppm
            denom = tf * 1_000_000 + (1200 * (250000 + (750 * dl_ratio) // 1000)) // 1000
            tfc = (tf * 2_200_000_000_000) // denom
            scores[i] = scores.get(i, 0) + (idf * tfc) // 1_000_000
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(i, s, r + 1) for r, (i, s) in enumerate(ranked)]


def test_bm25_integer_exact(spark, tmp_path):
    import duckdb

    from web_crawler_spark.functions import textstats

    docs = [
        (1, "spark joins windows and spark shuffles"),   # both terms, short
        (2, "the window function ranks rows over a window frame"),  # no match (plural)
        (3, "join join join join spark window"),         # term-stuffed
        (4, "a very long document about nothing relevant " * 20),
        (5, "spark"),                                    # minimal doc, rare-ish term
        (6, ""),                                         # empty doc
    ]
    query = ("spark", "join", "window")
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        (r["doc_id"], r["score_ppm"], r["rnk"])
        for r in textstats.bm25_topk(df, query_terms=query, k=4)
        .orderBy("rnk")
        .collect()
    ]
    want = _naive_bm25(docs, query, 4)
    assert got == want
    # the stuffed doc wins; every score is positive
    assert got[0][0] == 3 and all(s > 0 for _, s, _ in got)
    # partition-count invariance
    got8 = [
        (r["doc_id"], r["score_ppm"], r["rnk"])
        for r in textstats.bm25_topk(df.repartition(8), query_terms=query, k=4)
        .orderBy("rnk")
        .collect()
    ]
    assert got8 == got
    # DuckDB oracle parity on the same frame
    p = str(tmp_path / "bm25.parquet")
    df.toPandas().to_parquet(p)
    oracle = [
        (int(r["doc_id"]), int(r["score_ppm"]), int(r["rnk"]))
        for _, r in duckdb.sql(
            textstats.duck_bm25_sql(f"read_parquet('{p}')", query_terms=query, k=4)
        ).df().sort_values("rnk").iterrows()
    ]
    assert oracle == got


def test_cms_counters_and_estimates(spark, tmp_path):
    import duckdb

    from web_crawler_spark.operators import bloom as bloom_ops

    # skewed key stream: 'hot' x 400, 'warm' x 50, singletons
    rows = [("hot",)] * 400 + [("warm",)] * 50 + [(f"rare{i}",) for i in range(30)]
    df = spark.createDataFrame(rows, "term string")
    counters = bloom_ops.cms_counters(df, "term").localCheckpoint(eager=True)
    # DuckDB parity on the same stream
    p = str(tmp_path / "cms.parquet")
    df.toPandas().to_parquet(p)
    got = {
        (int(r["row"]), int(r["bucket"])): int(r["cnt"])
        for _, r in counters.toPandas().iterrows()
    }
    want = {
        (int(r["row"]), int(r["bucket"])): int(r["cnt"])
        for _, r in duckdb.sql(
            bloom_ops.duck_cms_counters_sql(f"read_parquet('{p}')", "term")
        ).df().iterrows()
    }
    assert got == want
    # point estimates: upward-biased, and tight for the hot keys here
    probes = spark.createDataFrame(
        [("hot",), ("warm",), ("rare0",), ("absent",)], "term string"
    )
    est = {
        r["term"]: r["est"]
        for r in bloom_ops.cms_estimate(counters, probes, "term").collect()
    }
    exact = {"hot": 400, "warm": 50, "rare0": 1, "absent": 0}
    for term, ex in exact.items():
        assert est[term] >= ex  # CMS never underestimates
    assert est["hot"] < 400 + 80 and est["warm"] < 50 + 80  # w >> keys here
    # mergeability: counters over two halves add to the full counters
    h1 = bloom_ops.cms_counters(df.limit(240), "term")
    h2 = bloom_ops.cms_counters(
        spark.createDataFrame(rows[240:], "term string"), "term"
    )
    from pyspark.sql import functions as F

    merged = (
        h1.unionByName(h2)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    assert {
        (r["row"], r["bucket"]): r["cnt"] for r in merged.collect()
    } == got


def test_merge_postings_equals_full_build(spark):
    from pyspark.sql import functions as F

    from web_crawler_spark.functions import textstats

    # 'common' appears in MORE than cap docs on each side of the split, so
    # the merged champion list must still be the overall-smallest doc ids
    docs = [(i, "common " + ("even" if i % 2 == 0 else "odd")) for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cap = 7
    full = {
        r["term"]: (r["df"], tuple(r["postings"]))
        for r in textstats.inverted_postings(df, cap=cap).collect()
    }
    a = textstats.inverted_postings(df.filter(F.col("doc_id") % 2 == 0), cap=cap)
    b = textstats.inverted_postings(df.filter(F.col("doc_id") % 2 == 1), cap=cap)
    merged = {
        r["term"]: (r["df"], tuple(r["postings"]))
        for r in textstats.merge_postings(a, b, cap=cap).collect()
    }
    assert merged == full
    assert merged["common"][0] == 60 and merged["common"][1] == tuple(range(cap))


def test_host_components_crafted(spark, tmp_path):
    import duckdb

    from web_crawler_spark.functions import linkstats

    # two clusters: {a,b,c} chained a->b->c, {x,y} mutual; q links nowhere real
    rows = [
        ("http://a.example/", "a.example", ["http://b.example/"]),
        ("http://b.example/", "b.example", ["http://c.example/"]),
        ("http://c.example/", "c.example", None),
        ("http://x.example/", "x.example", ["http://y.example/"]),
        ("http://y.example/", "y.example", ["http://x.example/"]),
    ]
    df = spark.createDataFrame(rows, "url string, host string, links array<string>")
    got = {
        r["host"]: r["component"]
        for r in linkstats.host_components(df).collect()
    }
    assert got == {
        "a.example": "a.example",
        "b.example": "a.example",
        "c.example": "a.example",
        "x.example": "x.example",
        "y.example": "x.example",
    }
    # DuckDB recursive-closure parity
    p = str(tmp_path / "cc.parquet")
    df.toPandas().to_parquet(p)
    oracle = {
        r["host"]: r["component"]
        for _, r in duckdb.sql(
            linkstats.duck_host_components_sql(f"read_parquet('{p}')")
        ).df().iterrows()
    }
    assert oracle == got


def test_length_quantiles_semantics(spark):
    from web_crawler_spark.functions import textstats

    # en: 10 docs of 1 token, 1 doc of 1000 tokens -> p50 = bucket(1)=1,
    # p99 needs 10.89 docs covered -> the big doc's bucket (1000 -> 10)
    docs = [(i, "w", "en") for i in range(10)] + [(10, "w " * 1000, "en")]
    docs += [(11, "", "de")]  # empty doc -> bucket 0 at every q
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = {
        (r["lang"], r["q_pct"]): r["len_bucket"]
        for r in textstats.length_quantiles(df).collect()
    }
    assert got == {
        ("en", 50): 1,
        ("en", 90): 1,   # 10/11 docs = 90.9% covered by bucket 1
        ("en", 99): 10,  # 1000 tokens -> binary length 10
        ("de", 50): 0,
        ("de", 90): 0,
        ("de", 99): 0,
    }


def test_host_bfs_depth_crafted(spark, tmp_path):
    import duckdb

    from web_crawler_spark.functions import linkstats

    # seed s; s->a->b->c chain; m<->n mutual but unreachable from s;
    # a also links back to s (cycle must not inflate depths)
    rows = [
        ("http://s.example/", "s.example", ["http://a.example/"]),
        ("http://a.example/", "a.example", ["http://b.example/", "http://s.example/"]),
        ("http://b.example/", "b.example", ["http://c.example/"]),
        ("http://c.example/", "c.example", None),
        ("http://m.example/", "m.example", ["http://n.example/"]),
        ("http://n.example/", "n.example", ["http://m.example/"]),
    ]
    df = spark.createDataFrame(rows, "url string, host string, links array<string>")
    seeds = spark.createDataFrame([("http://s.example/start",)], "url string")
    got = {
        r["host"]: r["depth"]
        for r in linkstats.host_bfs_depth(df, seeds).collect()
    }
    assert got == {"s.example": 0, "a.example": 1, "b.example": 2, "c.example": 3}
    # m/n unreachable -> absent
    # DuckDB recursive-closure parity
    pm, ps = str(tmp_path / "pm.parquet"), str(tmp_path / "ps.parquet")
    df.toPandas().to_parquet(pm)
    seeds.toPandas().to_parquet(ps)
    oracle = {
        r["host"]: int(r["depth"])
        for _, r in duckdb.sql(
            linkstats.duck_bfs_depth_sql(
                f"read_parquet('{pm}')", f"read_parquet('{ps}')"
            )
        ).df().iterrows()
    }
    assert oracle == got


def test_content_mirrors_crafted(spark, tmp_path):
    import duckdb

    from web_crawler_spark.plans import recrawl

    rows = [
        ("a.example", "shared body"),
        ("b.example", "shared body"),
        ("a.example", "shared body"),      # same host twice: 1 host, 3 pages
        ("c.example", "unique body"),      # single-host text -> excluded
        ("d.example", "other shared"),
        ("e.example", "other shared"),
    ]
    df = spark.createDataFrame(rows, "host string, text string")
    got = {
        r["text_md5"]: (r["n_hosts"], r["n_pages"], tuple(r["hosts"]))
        for r in recrawl.content_mirrors(df).collect()
    }
    import hashlib

    k1 = hashlib.md5(b"shared body").hexdigest()
    k2 = hashlib.md5(b"other shared").hexdigest()
    assert got == {
        k1: (2, 3, ("a.example", "b.example")),
        k2: (2, 2, ("d.example", "e.example")),
    }
    p = str(tmp_path / "m.parquet")
    df.toPandas().to_parquet(p)
    oracle = {
        r["text_md5"]: (int(r["n_hosts"]), int(r["n_pages"]), tuple(r["hosts"]))
        for _, r in duckdb.sql(
            recrawl.duck_content_mirrors_sql(f"read_parquet('{p}')")
        ).df().iterrows()
    }
    assert oracle == got


def test_phrase_search_crafted(spark):
    """Overlapping occurrences, repeated phrase terms, punctuation-split
    tokens, and near-miss docs."""
    rows = [
        (1, "a b a b a"),            # "a b a" overlaps: anchors 0 and 2
        (2, "x a, B! a y"),          # punctuation/case: one hit
        (3, "a b c b a"),            # no consecutive "a b a"
        (4, "b a b"),                # phrase terms present, wrong order
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r["n_hits"]
        for r in textstats.phrase_search(df, phrase=("a", "b", "a")).collect()
    }
    assert got == {1: 2, 2: 1}
    plan = (
        textstats.phrase_search(df, phrase=("a", "b", "a"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "Python" not in plan


def test_phrase_search_vs_duckdb(spark, duck, docs):
    _cmp(
        textstats.phrase_search(docs),
        duck.sql(textstats.duck_phrase_sql("documents")),
        ["doc_id"],
    )


def test_collocations_crafted(spark):
    """Dice arithmetic, support filter, and single-token docs."""
    rows = [
        (1, "new york new york new york"),
        (2, "new york city"),
        (3, "lone"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["t1"], r["t2"]): (r["n_pair"], r["n_t1"], r["n_t2"], r["dice_ppm"])
        for r in textstats.collocations(df, min_support=2).collect()
    }
    # "new york": pair 4x, new 4x, york 4x -> dice = 2e6*4 // 8 = 1e6
    # "york new": pair 2x (within doc 1) -> 2e6*2 // 8 = 500000
    assert got == {
        ("new", "york"): (4, 4, 4, 1000000),
        ("york", "new"): (2, 4, 4, 500000),
    }
    plan = (
        textstats.collocations(df, min_support=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan


def test_collocations_vs_duckdb(spark, duck, docs):
    _cmp(
        textstats.collocations(docs),
        duck.sql(textstats.duck_collocations_sql("documents")),
        ["t1", "t2"],
    )


def test_resolve_redirects_crafted(spark, tmp_path):
    """Chains, 2-cycle, self-loop, over-cap chain, and duplicate-Location
    first-wins; DuckDB recursive-CTE twin agrees."""
    import duckdb as _duck
    from web_crawler_spark.functions import linkstats as _ls

    edges = [
        ("a", "b"), ("b", "c"),              # a -> 2 hops -> c (terminal)
        ("x", "y"), ("y", "x"),              # 2-cycle
        ("s", "s"),                          # self-loop
        ("m", "t1"), ("m", "t0"),            # duplicate Location: min wins
    ]
    # over-cap chain: c0 -> c1 -> ... -> c20 with cap 16
    edges += [(f"c{i}", f"c{i+1}") for i in range(20)]
    df = spark.createDataFrame(edges, "src_url string, dst_url string")
    got = {
        r["src_url"]: (r["final_url"], r["n_hops"], r["is_loop"])
        for r in _ls.resolve_redirects(df).collect()
    }
    assert got["a"] == ("c", 2, False)
    assert got["b"] == ("c", 1, False)
    assert got["x"] == (None, None, True)
    assert got["y"] == (None, None, True)
    assert got["s"] == (None, None, True)
    assert got["m"] == ("t0", 1, False)
    assert got["c10"] == ("c20", 10, False)
    assert got["c0"] == (None, None, True)   # 20 hops > cap 16
    assert got["c4"] == ("c20", 16, False)   # exactly at the cap
    p = str(tmp_path / "re.parquet")
    df.toPandas().to_parquet(p)
    want = {
        r["src_url"]: (
            None if r["final_url"] != r["final_url"] else r["final_url"],
            None if r["n_hops"] != r["n_hops"] else int(r["n_hops"]),
            bool(r["is_loop"]),
        )
        for _, r in _duck.sql(
            _ls.duck_resolve_redirects_sql(f"read_parquet('{p}')")
        ).df().iterrows()
    }
    assert want == got


def test_resolve_redirects_fixture(spark):
    """Every fixture chain ends at a real page url in <=4 hops; the three
    planted cycles are flagged."""
    from web_crawler_spark import synth as _synth
    from web_crawler_spark.functions import linkstats as _ls

    _synth.ensure_synth("0.001")
    red = spark.read.parquet(_synth.synth_path("0.001", "redirects"))
    res = _ls.resolve_redirects(red)
    loops = res.where("is_loop").count()
    assert loops == 6  # 3 cycles x 2 sources each
    ok = res.where("NOT is_loop")
    assert ok.where("n_hops > 4").count() == 0
    pages = spark.read.parquet(_synth.synth_path("0.001", "pages"))
    # every resolved final url is a crawled page
    assert (
        ok.join(pages.select(F.col("url").alias("final_url")), "final_url", "left_anti").count()
        == 0
    )


def test_containment_crafted(spark):
    """A short doc fully quoted inside a long doc scores 1e6 containment
    even though its Jaccard vs the long doc is small; disjoint docs and
    boilerplate-only overlap (df > cap) produce no pair."""
    quoted = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"word{i} pad{i} fill{i}" for i in range(40))
    boiler = "copyright footer nav"  # shared by MANY docs -> pruned
    rows = [
        ("short", quoted),
        ("long", filler + " " + quoted),
        ("other", " ".join(f"unrelated{i} token{i}" for i in range(30))),
    ] + [(f"b{i}", boiler + f" unique{i} x{i} y{i} z{i} w{i}") for i in range(70)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["containment_ppm"]
        for r in dedupsim.containment_pairs(df).collect()
    }
    assert got[("long", "short")] == 1_000_000
    assert all("other" not in k for k in got)
    # the 70 boilerplate docs share only a df>cap shingle run: no pairs
    assert all(not (a.startswith("b") and b.startswith("b")) for a, b in got)


def test_containment_vs_duckdb(spark, duck, docs):
    _cmp(
        dedupsim.containment_pairs(docs),
        duck.sql(dedupsim.duck_containment_sql("documents")),
        ["doc_a", "doc_b"],
    )


def test_bpe_pairs_crafted(spark):
    """Word frequency weights pairs: 'aba' x3 + 'ab' x1 -> (a,b)=4, (b,a)=3;
    single-char and sub-support pairs drop."""
    rows = [
        ("d1", "aba aba"),
        ("d2", "aba ab"),
        ("d3", "q q q q q zz"),  # 1-char words contribute nothing; zz once < support
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        (r["s1"], r["s2"]): r["n_pair"]
        for r in textstats.bpe_pair_counts(df, min_support=2).collect()
    }
    assert got == {("a", "b"): 4, ("b", "a"): 3}


def test_bpe_pairs_vs_duckdb(spark, duck, docs):
    _cmp(
        textstats.bpe_pair_counts(docs),
        duck.sql(textstats.duck_bpe_pairs_sql("documents")),
        ["s1", "s2"],
    )


def test_bigram_lm_crafted(spark):
    """Fluent repetition of one bigram scores 1e6; a gibberish permutation
    of common words scores below it; <2-token docs score 0."""
    rows = [
        ("fluent", "go home go home go home"),
        ("mixed", "home go home home"),
        ("tiny", "go"),
        ("empty", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["score_ppm"])
        for r in textstats.bigram_lm_scores(df).collect()
    }
    # corpus unigrams: n(go)=5 (3 fluent + 1 mixed + 1 tiny), n(home)=6;
    # pairs: (go,home)=4, (home,go)=3, (home,home)=1
    # cond(go,home)=4e6//5=800000; cond(home,go)=3e6//6=500000;
    # cond(home,home)=1e6//6=166666
    assert got["tiny"] == (0, 0) and got["empty"] == (0, 0)
    assert got["fluent"] == (5, (3 * 800_000 + 2 * 500_000) // 5)
    assert got["mixed"] == (3, (500_000 + 800_000 + 166_666) // 3)


def test_bigram_lm_vs_duckdb(spark, duck, docs):
    _cmp(
        textstats.bigram_lm_scores(docs),
        duck.sql(textstats.duck_bigram_lm_sql("documents")),
        ["doc_id"],
    )


# -- per-source quality priors -------------------------------------------------

GOOD = "the quick fox and the lazy dog are with a friend of the family"
BAD = "zxqv kpl wrt 9931 fjord-xx yy zz qq 0x33 ##"


def test_source_prior_semantics(spark, tmp_path):
    rows = (
        [(f"g{i}", "goodsrc", GOOD) for i in range(4)]
        + [("g_bad", "goodsrc", BAD)]          # bad doc in good source: drop
        + [(f"b{i}", "badsrc", BAD) for i in range(9)]
        + [("b_good", "badsrc", GOOD)]         # good doc in bad source: drop
    )
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    p = str(tmp_path / "prior.parquet")
    pdf.to_parquet(p)
    df = spark.read.parquet(p)
    out = {r["doc_id"]: r for r in textstats.source_quality_prior(df).collect()}
    assert all(out[f"g{i}"]["keep"] for i in range(4))
    assert not out["g_bad"]["keep"]            # doc-level gate
    assert not out["b_good"]["keep"]           # source-prior gate
    assert not any(out[f"b{i}"]["keep"] for i in range(9))
    # prior is shared within a source
    assert out["g_bad"]["prior_ppm"] == out["g0"]["prior_ppm"]
    con = duckdb.connect()
    _cmp(
        textstats.source_quality_prior(df),
        con.sql(textstats.duck_source_prior_sql(f"read_parquet('{p}')")),
        ["doc_id"],
    )


def test_source_prior_parity_and_broadcast_plan(spark, duck, docs):
    out = textstats.source_quality_prior(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the doc side must not shuffle
    _cmp(out, duck.sql(textstats.duck_source_prior_sql("documents")), ["doc_id"])


def test_corpus_from_html_semantics_and_parity(spark, tmp_path):
    """Same-content pages collapse to the min-url canonical; empty /
    low-quality extractions are gated; Spark matches the DuckDB twin."""
    import duckdb as _duck

    from web_crawler_spark.plans import corpus

    prose = (
        "the quick fox and the lazy dog are with a friend of the family "
        "and they all share the fine evening near the old stone bridge."
    )
    pages = [
        ("http://a.example/1", f"<p>{prose}</p>".encode()),
        ("http://a.example/2", f"<p>{prose}</p>".encode()),   # dup -> dropped
        ("http://a.example/0nav", b'<p>see <a href="/x">here</a> now</p>'),
        ("http://b.example/junk", ("<p>" + "zxq " * 40 + "end.</p>").encode()),
        ("http://c.example/dead", None),
    ]
    pdf = pd.DataFrame(pages, columns=["url", "html"])
    df = spark.createDataFrame(pdf)
    out = {r["url"]: r for r in corpus.corpus_from_html(df).collect()}
    assert set(out) == {"http://a.example/1"}  # canonical only, gates held
    assert out["http://a.example/1"]["lang_pred"] == "en"
    con = _duck.connect()
    con.register("chp", pdf)
    got = corpus.corpus_from_html(df).toPandas().sort_values("url").reset_index(drop=True)
    want = con.sql(corpus.duck_corpus_from_html_sql("chp")).df().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False)


def test_corpus_from_html_sheds_html_before_exchange(spark):
    """The wide html column must die in the first projection: no Exchange
    in the plan may carry an html attribute."""
    from web_crawler_spark import synth as _synth_mod
    from web_crawler_spark.plans import corpus

    pages = spark.read.parquet(_synth_mod.synth_path("0.001", "pages"))
    plan = (
        corpus.corpus_from_html(pages.select("url", "html"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "html" not in line, line


def test_ppjoin_exact_vs_bruteforce(spark, duck, docs):
    """The prefix-filtered join must return EXACTLY the brute-force pair
    set — completeness of the filter, not just plausibility."""
    got = dedupsim.ppjoin_exact_pairs(docs)
    _cmp(got, duck.sql(dedupsim.duck_ppjoin_sql("documents")), ["a", "b"])


def test_ppjoin_semantics_and_threshold_edge(spark, tmp_path):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base),
        (2, base),                                 # identical: J = 1
        (3, base + " iota kappa"),                 # high overlap
        (4, "totally different words entirely here now today friend"),
        (5, ""),                                   # empty: no shingles
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    p = str(tmp_path / "pp.parquet")
    pdf.to_parquet(p)
    df = spark.read.parquet(p)
    out = {(r["a"], r["b"]): r["jaccard_ppm"]
           for r in dedupsim.ppjoin_exact_pairs(df).collect()}
    assert out[(1, 2)] == 1_000_000
    assert (1, 3) in out and out[(1, 3)] >= 500_000
    assert all(4 not in k and 5 not in k for k in out)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW pp AS SELECT * FROM read_parquet('{p}')")
    _cmp(
        dedupsim.ppjoin_exact_pairs(df),
        con.sql(dedupsim.duck_ppjoin_sql("pp")),
        ["a", "b"],
    )


def test_ppjoin_prefix_filter_prunes(spark, docs):
    """The candidate set after the prefix join must be far below n^2/2 —
    the filter has to EARN the exactness, not degenerate to all-pairs."""
    from web_crawler_spark.operators.ordering import with_global_seq
    from pyspark.sql import functions as FF

    sh = dedupsim.shingles(docs)
    vocab = sh.groupBy("shingle").agg(FF.count("*").alias("df_sh"))
    ranked = with_global_seq(vocab, ["df_sh", "shingle"], out_col="rnk")
    g = sh.join(ranked.select("shingle", "rnk"), "shingle")
    sets = g.groupBy("doc_id").agg(FF.array_sort(FF.collect_list("rnk")).alias("rnks"))
    plen = FF.expr("size(rnks) - ((size(rnks) * 500000 + 999999) div 1000000) + 1")
    pre = sets.select("doc_id", FF.explode(FF.slice("rnks", FF.lit(1), plen)).alias("rnk"))
    n_cand = (
        pre.alias("l").join(pre.alias("r"), "rnk")
        .where(FF.col("l.doc_id") < FF.col("r.doc_id"))
        .select("l.doc_id", "r.doc_id").distinct().count()
    )
    n = docs.count()
    assert n_cand < n * (n - 1) / 2 * 0.25, (n_cand, n)


def test_classifier_score_features_and_plan(spark):
    from web_crawler_spark.functions import textstats as ts

    docs = spark.createDataFrame(
        [
            (1, "Alpha beta gamma"),   # 3 unigrams + 2 bigrams = 5 features
            (2, "solo"),               # 1 feature, no bigram
            (3, ""),                   # empty: 0 features, keep
            (4, None),                 # failed fetch: same as empty
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ts.classifier_score(docs).collect()}
    assert out[1]["n_features"] == 5
    assert out[2]["n_features"] == 1
    assert out[3]["n_features"] == 0 and out[3]["w_sum"] == 0 and out[3]["keep"]
    assert out[4]["n_features"] == 0 and out[4]["keep"]
    # weight model is integer and bounded
    assert abs(out[1]["w_sum"]) <= 5 * (ts.CLS_W_MOD - ts.CLS_W_SHIFT)
    # case folding: same features regardless of case/punct
    docs2 = spark.createDataFrame([(9, "ALPHA, beta; GAMMA!")], "doc_id long, text string")
    same = ts.classifier_score(docs2).collect()[0]
    assert (same["n_features"], same["w_sum"]) == (out[1]["n_features"], out[1]["w_sum"])
    # inference is one zero-exchange, Python-free projection
    plan = ts.classifier_score(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_focused_frontier_inheritance_and_plan(spark):
    from web_crawler_spark.functions import linkstats, textstats as ts

    pm = spark.createDataFrame(
        [
            ("p1", "alpha beta", ["x", "y"]),
            ("p2", "gamma delta epsilon", ["y"]),
            ("p3", "", None),          # no links -> contributes nothing
        ],
        "url string, text string, links array<string>",
    )
    out = {r["url"]: r for r in linkstats.focused_frontier(pm).collect()}
    s1 = ts.classifier_score(
        spark.createDataFrame([(1, "alpha beta"), (2, "gamma delta epsilon")],
                              "doc_id long, text string")
    ).collect()
    w = {r["doc_id"]: r["w_sum"] for r in s1}
    assert out["x"]["n_parents"] == 1 and out["x"]["best_w_sum"] == w[1]
    assert out["y"]["n_parents"] == 2 and out["y"]["best_w_sum"] == max(w[1], w[2])
    # one exchange (the candidate agg), no join, no Python
    plan = linkstats.focused_frontier(pm)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_adaptive_host_budget_math(spark):
    from web_crawler_spark.operators.politeness import adaptive_host_budget

    log = spark.createDataFrame(
        [("http://a.example/1", True), ("http://a.example/2", True),
         ("http://a.example/3", False), ("http://a.example/4", True),
         ("http://b.example/1", False), ("http://b.example/2", False),
         ("http://c.example/1", True)],
        "url string, ok boolean",
    )
    got = {r["host"]: r for r in adaptive_host_budget(log, base_budget=5).collect()}
    a = got["a.example"]
    assert (a["n_fetched"], a["n_failed"], a["ok_ppm"]) == (4, 1, 750000)
    assert a["next_budget"] == 3            # floor(5 * 0.75)
    assert got["b.example"]["next_budget"] == 1   # all-failed host floors at 1
    assert got["c.example"]["next_budget"] == 5   # clean host keeps the budget


def test_anchor_expanded_docs(spark):
    from web_crawler_spark.functions import linkstats

    pages = spark.createDataFrame(
        [
            ("http://a.example/t", b'<p><a href="http://a.example/x">spark join</a>'
                                   b'<a href="http://a.example/x">spark join</a>'
                                   b'<a href="/y">rel anchor</a></p>', "target body"),
            ("http://a.example/x", b"<p>no links</p>", "x body"),
            ("http://a.example/y", b"", "y body"),
        ],
        "url string, html binary, text string",
    )
    got = {r["doc_id"]: r["text"] for r in linkstats.anchor_expanded_docs(pages).collect()}
    # x referenced twice with the same anchor -> terms counted twice
    assert got["http://a.example/x"].split().count("spark") == 2
    assert got["http://a.example/x"].startswith("x body")
    # root-relative href resolves against the page host
    assert "rel anchor" in got["http://a.example/y"]
    # pages nobody links to keep their body (plus the empty blob join)
    assert got["http://a.example/t"].rstrip() == "target body"


def test_readability_vs_duckdb_and_crafted(spark, duck, docs):
    cols = textstats.readability_columns(F.col("text"))
    got = docs.select("doc_id", *[c.alias(n) for n, c in cols.items()])
    want = duck.sql(textstats.duck_readability_sql("documents"))
    _cmp(got, want, ["doc_id"])

    # crafted boundary rows: empty text, no terminal punctuation, known counts
    crafted = spark.createDataFrame(
        [
            ("empty", ""),
            ("nosent", "plain words no punctuation"),
            # 2 sentences, 4 words, syllable groups: "-o IY  a-e  o-e  ea-i-e-y" -> count below
            ("known", "It is. A sentence!"),
        ],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in crafted.select(
            "doc_id", *[c.alias(n) for n, c in textstats.readability_columns(F.col("text")).items()]
        ).collect()
    }
    assert out["empty"]["n_words"] == 0
    assert out["empty"]["n_sents"] == 0
    assert out["empty"]["fk_grade_milli"] == -15590
    assert out["nosent"]["n_sents"] == 0
    # words/s floored at 1 => 390*4 = 1560 for the no-punct row's wps term
    assert out["nosent"]["n_words"] == 4
    assert out["known"]["n_words"] == 4
    assert out["known"]["n_sents"] == 2
    # "it is. a sentence!" vowel groups: i,i,a,e,e,e -> 6
    assert out["known"]["n_syllables"] == 6
    # fk = floor(390*4/2) + floor(11800*6/4) - 15590 = 780 + 17700 - 15590
    assert out["known"]["fk_grade_milli"] == 780 + 17700 - 15590


def _naive_opic(edges, iters, scale):
    """Independent integer-exact OPIC rounds (dict arithmetic)."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    out: dict = {}
    for s, _, w in edges:
        out[s] = out.get(s, 0) + w
    cash = {h: scale // n for h in nodes}
    hist = {h: 0 for h in nodes}
    for _ in range(iters):
        inflow = {h: 0 for h in nodes}
        for s, d, w in edges:
            inflow[d] += (cash[s] * w) // out[s]
        share = sum(cash[h] for h in nodes if h not in out) // n
        hist = {h: hist[h] + cash[h] for h in nodes}
        cash = {h: inflow[h] + share for h in nodes}
    return hist, cash


def test_host_opic_integer_exact(spark, tmp_path):
    import duckdb

    from web_crawler_spark.functions import linkstats

    # a -> b (x2 pages, 3 edges), a -> c, b -> a; c is dangling
    rows = [
        ("http://a.example/1", "a.example",
         ["http://b.example/x", "http://c.example/y"]),
        ("http://a.example/2", "a.example", ["http://b.example/z"]),
        ("http://b.example/1", "b.example", ["http://a.example/w"]),
        ("http://c.example/1", "c.example", None),
    ]
    df = spark.createDataFrame(rows, "url string, host string, links array<string>")
    got = {
        r["host"]: (r["hist_ppb"], r["cash_ppb"])
        for r in linkstats.host_opic(df).collect()
    }
    edges = [("a.example", "b.example", 2), ("a.example", "c.example", 1),
             ("b.example", "a.example", 1)]
    hist, cash = _naive_opic(edges, linkstats.OPIC_ITERS, linkstats.OPIC_SCALE)
    assert got == {h: (hist[h], cash[h]) for h in hist}
    # more cash has flowed THROUGH b (two in-edges) than c over the rounds
    assert got["b.example"][0] > got["c.example"][0]
    # oracle parity on the same frame
    p = str(tmp_path / "opic.parquet")
    df.toPandas().to_parquet(p)
    con = duckdb.connect()
    want = con.sql(linkstats.duck_opic_sql(f"read_parquet('{p}')")).df()
    assert {
        r["host"]: (r["hist_ppb"], r["cash_ppb"]) for _, r in want.iterrows()
    } == got
    # partition-count invariance
    got8 = {
        r["host"]: (r["hist_ppb"], r["cash_ppb"])
        for r in linkstats.host_opic(df.repartition(8)).collect()
    }
    assert got8 == got


def test_epoch_expand_crafted(spark, duck, docs):
    from web_crawler_spark.functions import sampling

    # crafted: ~0% / ~15% / ~35% stopword ratios -> 1 / 2 / 4 epochs
    crafted = spark.createDataFrame(
        [
            ("zero", "alpha beta gamma delta"),
            ("some", "the alpha beta gamma delta epsilon zeta"),
            ("lots", "the a of and to alpha beta gamma delta epsilon"),
        ],
        "doc_id string, text string",
    )
    out = sampling.epoch_expand(crafted).collect()
    by_doc = {}
    shards = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
        shards.setdefault(r["doc_id"], set()).add(r["shard"])
        assert r["n_epochs"] == max(by_doc[r["doc_id"]] + [r["n_epochs"]])
    assert sorted(by_doc["zero"]) == [1]
    assert sorted(by_doc["some"]) == [1, 2]
    assert sorted(by_doc["lots"]) == [1, 2, 3, 4]
    # copies of one doc land in different shards (no shard sees a doc twice)
    assert len(shards["lots"]) == 4
    # full differential vs the DuckDB twin on the driver fixture
    got = sampling.epoch_expand(docs)
    want = duck.sql(sampling.duck_epoch_expand_sql("documents"))
    _cmp(got, want, ["doc_id", "epoch"])


def test_corpus_keyphrases_crafted(spark, tmp_path):
    import duckdb

    crafted = spark.createDataFrame(
        [
            ("d1", "The quick brown fox, and quick brown fox again."),
            ("d2", "Quick brown fox is a deep neural network."),
            ("d3", "deep neural network; deep NEURAL network"),
        ],
        "doc_id string, text string",
    )
    got = textstats.corpus_keyphrases(crafted).collect()
    by = {r["phrase"]: (r["n_words"], r["n_occur"], r["n_docs"]) for r in got}
    # stopwords ("the","and","is","a") and punctuation delimit candidates;
    # non-stopword runs extend ("again" stays attached)
    assert by["quick brown fox"] == (3, 2, 2)
    assert by["quick brown fox again"] == (4, 1, 1)
    assert by["deep neural network"] == (3, 3, 2)
    # single-word runs never become phrases
    assert all(" " in p for p in by)
    # ranking: count desc then phrase asc
    assert [r["phrase"] for r in got[:2]] == ["deep neural network", "quick brown fox"]
    # oracle parity
    p = str(tmp_path / "kp.parquet")
    crafted.toPandas().to_parquet(p)
    con = duckdb.connect()
    want = con.sql(textstats.duck_keyphrases_sql(f"read_parquet('{p}')")).df()
    assert {
        r["phrase"]: (r["n_words"], r["n_occur"], r["n_docs"])
        for _, r in want.iterrows()
    } == by


def test_media_phash_near_dup_property(spark):
    from web_crawler_spark.functions import codecs, multimodal as mm

    # pixel-domain dedup over REAL PNGs: a re-encode of identical pixels
    # under different scanline filters shares the hash (bytes and md5
    # differ); a small pixel perturbation stays within a small Hamming
    # radius; different pixels diverge
    import random
    rng = random.Random(7)
    w, h = 27, 16
    px = bytes(rng.getrandbits(8) for _ in range(w * h * 3))
    png_a = codecs.encode_png(px, w, h, 3, filters=[0])
    png_b = codecs.encode_png(px, w, h, 3, filters=[4, 3, 2, 1])  # re-encode
    assert png_a != png_b
    # single-byte flips don't move the pixel hash at all — that
    # robustness-to-noise is the point of hashing decoded pixels instead of
    # encoded bytes.  To get a small NONZERO distance, deliberately invert
    # the first gradient comparison (cell (0,0) vs (0,1) of the 8x9 grid =
    # the hash's top bit) by saturating those two blocks in the opposite
    # order; only the 2 bits touching those cells can change.
    top_bit = (
        mm._media_phash_one("image", png_a) >> 63
    ) & 1  # 1 iff grid[0][1] > grid[0][0] originally
    lo, hi = (255, 0) if top_bit else (0, 255)
    perturbed = bytearray(px)
    for y in range(2):  # grid rows 0-1 (h=16 -> 2 px per grid row)
        for x in range(6):  # cols 0-2 -> cell (0,0), cols 3-5 -> cell (0,1)
            for c in range(3):
                perturbed[(y * w + x) * 3 + c] = lo if x < 3 else hi
    png_c = codecs.encode_png(bytes(perturbed), w, h, 3)
    other = bytes(rng.getrandbits(8) for _ in range(w * h * 3))
    png_d = codecs.encode_png(other, w, h, 3)
    df = spark.createDataFrame(
        [(0, "image", png_a), (1, "image", png_b), (2, "image", png_c),
         (3, "image", png_d)],
        "media_id long, kind string, payload binary",
    )
    got = {r["media_id"]: r for r in mm.media_phash(df).collect()}
    assert got[0]["phash"] == got[1]["phash"]  # pixel hash ignores encoding
    assert got[0]["n_copies"] == 2 and got[3]["n_copies"] == 1
    ham = bin((got[0]["phash"] ^ got[2]["phash"]) & ((1 << 64) - 1)).count("1")
    assert ham <= 6
    ham_other = bin((got[0]["phash"] ^ got[3]["phash"]) & ((1 << 64) - 1)).count("1")
    assert ham_other > ham
    # undecodable image payload -> null phash row survives (left join)
    poison = spark.createDataFrame(
        [(9, "image", bytearray(b"\x89PNG\r\n\x1a\nbroken"))],
        "media_id long, kind string, payload binary",
    )
    pr = mm.media_phash(poison).collect()
    assert len(pr) == 1 and pr[0]["phash"] is None and pr[0]["n_copies"] is None
    # vectorized engine path == independent naive golden on every fixture
    # payload, across all three kinds
    from web_crawler_spark import synth as synthmod

    synthmod.ensure_synth("0.001")
    media = spark.read.parquet(
        synthmod.synth_path("0.001", "media")
    ).select("media_id", "kind", "payload").collect()
    for r in media[:100]:
        assert mm._media_phash_one(
            r["kind"], bytes(r["payload"])
        ) == mm.naive_media_phash(r["kind"], bytes(r["payload"]))


def test_bpe_train_and_apply_crafted(spark):
    from web_crawler_spark.functions import bpe

    # corpus: "aaab" x3, "aab" x2 -> pair counts: (a,a)=3*2+2=8? no:
    # 'aaab': pairs (a,a),(a,a),(a,b); 'aab': (a,a),(a,b)
    # (a,a) = 3*2 + 2*1 = 8, (a,b) = 3 + 2 = 5 -> merge 0 = (a,a)
    docs = spark.createDataFrame(
        [(1, "aaab aaab aaab aab aab")], "doc_id long, text string"
    )
    merges = bpe.train_bpe(docs, n_merges=3)
    assert merges[0][1:3] == ("a", "a") and merges[0][3] == 8
    # after merge 0: 'aaab' -> [aa, a, b], 'aab' -> [aa, b]
    # pairs: (aa,a)=3, (a,b)=3, (aa,b)=2 -> tie 3/3 broken lexicographically: (a,b)
    assert merges[1][1:3] == ("a", "b") and merges[1][3] == 3
    # partition invariance
    merges8 = bpe.train_bpe(docs.repartition(8), n_merges=3)
    assert merges8 == merges
    # apply: 'aaab' with ranks {(a,a):0, (a,b):1, ...} -> aa,a,b -> aa,ab -> 2
    out = {r["doc_id"]: r for r in bpe.apply_merges(docs, merges).collect()}
    assert out[1]["n_words"] == 5
    # empty text contributes 0
    empty = spark.createDataFrame([(2, "")], "doc_id long, text string")
    got = bpe.apply_merges(empty, merges).first()
    assert (got["n_words"], got["n_bpe_symbols"]) == (0, 0)
    # golden parity end-to-end on the driver fixture
    import __spark_entry__ as entry
    m_path, a_path = entry._bpe_golden_paths("0.001")
    import pandas as pd
    want_m = pd.read_parquet(m_path)
    got_m = entry.q_corpus_bpe_merges(spark, "/root/testdata/sf0.001").toPandas()
    pd.testing.assert_frame_equal(
        got_m.sort_values("merge_idx").reset_index(drop=True),
        want_m.sort_values("merge_idx").reset_index(drop=True),
        check_dtype=False,
    )
    want_a = pd.read_parquet(a_path).sort_values("doc_id").reset_index(drop=True)
    got_a = (
        entry.q_doc_bpe_apply(spark, "/root/testdata/sf0.001")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_a, want_a, check_dtype=False)


def test_oov_stats_crafted(spark):
    from web_crawler_spark.functions import bpe

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "alpha zzz"), (3, "")],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame([("alpha",), ("beta",)], "word string")
    got = {r["doc_id"]: r for r in bpe.oov_stats(docs, vocab).collect()}
    assert (got[1]["n_tokens"], got[1]["n_oov"], got[1]["oov_ppm"]) == (3, 0, 0)
    assert (got[2]["n_tokens"], got[2]["n_oov"], got[2]["oov_ppm"]) == (2, 1, 500000)
    # blank docs survive with 0/0 (the left join restore)
    assert (got[3]["n_tokens"], got[3]["n_oov"], got[3]["oov_ppm"]) == (0, 0, 0)


def test_ivfpq_topk_recall_and_compression(spark):
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in simsearch.brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in simsearch.ivfpq_topk(emb, q, k=5, n_lists=8, nprobe=6).collect()
    }
    per_q: dict = {}
    for qid, nid in exact:
        hit, tot = per_q.get(qid, (0, 0))
        per_q[qid] = (hit + ((qid, nid) in approx), tot + 1)
    recalls = [h / t for h, t in per_q.values()]
    assert min(recalls) >= 0.4
    assert sum(recalls) / len(recalls) > 0.8
    # the index really is compressed: PQ_M small ints + a list id per vector
    from web_crawler_spark.functions.simsearch import PQ_M
    assert PQ_M * 4 <= 32  # 4-bit codes -> <= 4 bytes of payload per vector


def test_dsir_training_and_scoring(spark):
    from web_crawler_spark.functions import textstats as ts

    # target talks about astronomy, pool about cooking; a new doc made of
    # target-distinctive ngrams must outscore one of pool-distinctive ones
    target = spark.createDataFrame(
        [(i, "stellar parallax measures distant supernova light") for i in range(4)],
        "doc_id long, text string",
    )
    pool = spark.createDataFrame(
        [
            (0, "simmer the garlic butter sauce gently"),
            (1, "simmer the onion butter sauce gently"),
            (2, "stellar parallax measures distant supernova light"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    w = ts.train_dsir_weights(pool, target)
    assert len(w) == ts.DSIR_BUCKETS and all(isinstance(x, int) for x in w)
    out = {r["doc_id"]: r for r in ts.dsir_scores(pool, w).collect()}
    # the target-like doc scores strictly above every cooking doc
    assert out[2]["dsir_score"] > out[0]["dsir_score"]
    assert out[2]["dsir_score"] > out[1]["dsir_score"]
    # empty doc: zero features, zero score, still present
    assert out[3]["n_features"] == 0 and out[3]["dsir_score"] == 0
    # scoring is a pure map: no exchange, no Python anywhere in the plan
    plan = (
        ts.dsir_scores(pool, w)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_host_communities_crafted(spark, tmp_path):
    import duckdb

    from web_crawler_spark.functions import linkstats

    # one connected component, two dense triangles bridged by a single weak
    # edge — components cannot separate them, LPA must
    tri1 = ["a.example", "b.example", "c.example"]
    tri2 = ["x.example", "y.example", "z.example"]
    rows = []
    for tri in (tri1, tri2):
        for s in tri:
            for d in tri:
                if s != d:
                    # double links inside a triangle: heavy intra weight
                    rows.append((f"http://{s}/{d}", s, [f"http://{d}/", f"http://{d}/2"]))
    rows.append(("http://c.example/bridge", "c.example", ["http://x.example/"]))
    df = spark.createDataFrame(rows, "url string, host string, links array<string>")

    comp = {r["host"]: r["component"] for r in linkstats.host_components(df).collect()}
    assert len(set(comp.values())) == 1  # single component — no separation

    got = {r["host"]: r["community"] for r in linkstats.host_communities(df).collect()}
    assert {got[h] for h in tri1} == {"a.example"}
    assert {got[h] for h in tri2} == {"x.example"}

    # DuckDB unrolled-CTE parity on the same crafted graph
    p = str(tmp_path / "lpa.parquet")
    df.toPandas().to_parquet(p)
    oracle = {
        r["host"]: r["community"]
        for _, r in duckdb.sql(
            linkstats.duck_communities_sql(f"read_parquet('{p}')")
        ).df().iterrows()
    }
    assert oracle == got


def test_audio_segments_crafted_and_golden(spark):
    import random as _random

    from web_crawler_spark.functions import codecs, multimodal as mm

    f = mm.AUDIO_FRAME
    silent = [128] * f
    loud = [255] * f
    # silence | 2 loud frames | silence | 1 loud frame => two segments
    # (REAL 8-bit PCM WAV; magnitudes are |sample-128|)
    payload = codecs.encode_wav(silent + loud + loud + silent + loud, 8000, 8)
    segs = mm._vector_audio_segments(payload)
    assert segs == [(0, 1, 2, 2 * 127), (1, 4, 1, 127)]
    assert mm.naive_audio_segments(payload) == segs
    # all-silent and sub-frame clips produce nothing
    assert mm._vector_audio_segments(codecs.encode_wav(silent * 3, 8000, 8)) == []
    assert mm._vector_audio_segments(codecs.encode_wav([255] * (f - 1), 8000, 8)) == []
    # non-WAV bytes segment to nothing instead of failing the task
    assert mm._vector_audio_segments(b"\xff" * 200) == []
    assert mm.naive_audio_segments(b"\xff" * 200) == []
    # 16-bit PCM decodes on the |s|//256 magnitude scale: full-scale square
    # wave -> energy 127 per frame, same segmentation
    loud16 = [32767 if i % 2 == 0 else -32768 for i in range(f)]
    p16 = codecs.encode_wav([0] * f + loud16, 8000, 16)
    assert mm._vector_audio_segments(p16) == [(0, 1, 1, 127)]
    assert mm.naive_audio_segments(p16) == [(0, 1, 1, 127)]
    # differential: vectorized path == row-at-a-time golden on random PCM
    rng = _random.Random(7)
    for _ in range(25):
        n = rng.randint(0, 6 * f + 13)
        p = codecs.encode_wav([rng.randint(0, 255) for _ in range(n)], 8000, 8)
        assert mm._vector_audio_segments(p) == mm.naive_audio_segments(p)
    # Spark op: scan-predicate filter + one Arrow map, no exchange
    df = spark.createDataFrame(
        [(1, "audio", bytearray(payload)), (2, "image", bytearray(b"png" * 40))],
        "media_id long, kind string, payload binary",
    )
    out = mm.media_audio_segments(df)
    rows = sorted(
        (r["media_id"], r["seg_idx"], r["start_frame"], r["n_frames"], r["energy_sum"])
        for r in out.collect()
    )
    assert rows == [(1, 0, 1, 2, 254), (1, 1, 4, 1, 127)]  # image row filtered
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_leakage_safe_split_coherence(spark):
    from web_crawler_spark.functions import dedupsim as ds

    # crafted components: dups share a component, singleton keeps own id
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 4), (5, 4)],
        "doc_id long, component long",
    )
    out = {r["doc_id"]: r["split"] for r in ds.leakage_safe_split(comp).collect()}
    assert out[1] == out[2]  # same component -> same side, always
    assert out[4] == out[5]
    assert set(out.values()) <= {"train", "valid"}
    # zero-exchange map
    plan = (
        ds.leakage_safe_split(comp)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    # end-to-end on the real corpus: every component is split-pure and the
    # valid share is in a sane band for a 5% hash split
    import __spark_entry__ as e

    full = e.q_corpus_split(spark, SF_DIR).toPandas()
    purity = full.groupby("component")["split"].nunique()
    assert (purity == 1).all()
    frac = (full["split"] == "valid").mean()
    assert 0.0 < frac < 0.25


def test_host_reciprocity_crafted(spark):
    from web_crawler_spark.functions import linkstats

    # farm: f1<->f2 cross-link; organic: a->b->c one-way chain
    rows = [
        (
            "http://f1.example/",
            "f1.example",
            ["http://f2.example/", "http://c.example/"],  # one of two reciprocated
        ),
        ("http://f2.example/", "f2.example", ["http://f1.example/"]),
        ("http://a.example/", "a.example", ["http://b.example/", "http://f1.example/"]),
        ("http://b.example/", "b.example", ["http://c.example/"]),
    ]
    df = spark.createDataFrame(rows, "url string, host string, links array<string>")
    got = {r["host"]: r for r in linkstats.host_reciprocity(df).collect()}
    assert got["f1.example"]["recip_ppm"] == 500_000  # 1 of 2 edges reciprocated
    assert got["f2.example"]["recip_ppm"] == 1_000_000
    assert got["a.example"]["recip_ppm"] == 0
    assert got["b.example"]["recip_ppm"] == 0
    assert "c.example" not in got  # no outgoing edges -> no row


def test_media_scenes_crafted(spark):
    from web_crawler_spark.functions import codecs, multimodal as mm

    # REAL container: 6 PNG frames, gentle luma drift frames 0-3, hard
    # content change at frame 4 -> exactly one cut there
    w, h = 16, 12
    base = bytes((i * 5) % 256 for i in range(w * h * 3))
    frames = []
    for k in range(6):
        if k < 4:
            fpx = bytes((b + 2 * k) % 256 for b in base)
        else:
            fpx = bytes(255 - ((b + 2 * k) % 256) for b in base)
        frames.append(codecs.encode_png(fpx, w, h, 3, filters=[k % 5]))
    payload = codecs.encode_bmff(frames)
    # vector path == naive golden, including NULL first-frame hamming
    golden = mm.naive_scene_rows(payload, 6.0)
    assert len(golden) == 6
    assert golden[0][3] is None and golden[0][4] is False
    assert all(g[3] is not None for g in golden[1:])
    cuts = [g[0] for g in golden if g[4]]
    assert cuts == [4]  # the hard change, and only it, fires
    df = spark.createDataFrame(
        [
            (1, "video", bytearray(payload), 6.0),
            (2, "image", bytearray(payload), None),  # filtered by kind
            (3, "video", bytearray(payload), 0.0),   # zero duration -> no rows
            (4, "video", bytearray(b"\x00\x00\x00\x18ftypjunk"), 9.0),  # poison
        ],
        "media_id long, kind string, payload binary, duration_s double",
    )
    out = mm.media_scenes(df)
    got = sorted(
        (r["media_id"], r["frame_idx"], r["ts_ms"], r["phash"], r["hamming_prev"])
        for r in out.collect()
    )
    assert got == [(1, g[0], g[1], g[2], g[3]) for g in golden]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_lsh_eval_report_counts_and_ratios(spark):
    """On a corpus with one exact-dup pair and one unrelated doc, truth and
    candidates both contain exactly the dup pair -> recall = precision = 1e6;
    report invariants hold (n_hit <= min(n_true, n_cand))."""
    from web_crawler_spark.functions import dedupsim

    body = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    docs = [
        ("d1", body),
        ("d2", body),
        ("d3", "completely different words nothing shared here at all " * 4),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    r = dedupsim.lsh_eval_report(df).collect()[0]
    assert r["n_true"] == 1 and r["n_hit"] == 1
    assert r["n_cand"] >= 1
    assert r["recall_ppm"] == 10**6
    assert r["precision_ppm"] == 10**6 * r["n_hit"] // r["n_cand"]

    # empty-truth denominator -> NULL ppm, not a crash
    solo = spark.createDataFrame(
        [("a", "one two three four five six seven eight nine ten " * 3)],
        "doc_id string, text string",
    )
    r2 = dedupsim.lsh_eval_report(solo).collect()[0]
    assert r2["n_true"] == 0 and r2["recall_ppm"] is None


def test_semantic_dedup_crafted(spark):
    """Two tight semantic groups + one outlier: first-wins keep inside each
    group, outlier survives; cluster assignment puts each group together;
    the final plan carries no Python stage (assignment is materialized
    behind the localCheckpoint)."""
    from web_crawler_spark.functions.simsearch import semantic_dedup

    rows = [
        # group A around e0
        (1, [1.0, 0.01, 0.0, 0.0]),
        (2, [1.0, 0.02, 0.0, 0.0]),
        (3, [1.0, 0.0, 0.01, 0.0]),
        # group B around e2
        (10, [0.0, 0.01, 1.0, 0.0]),
        (11, [0.01, 0.0, 1.0, 0.0]),
        # outlier: e3-dominant, below threshold vs everything
        (20, [0.0, 0.3, 0.3, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    res = semantic_dedup(emb, n_lists=2, threshold_ppm=900_000)
    got = {r["vec_id"]: (r["cluster"], r["kept"]) for r in res.collect()}
    assert set(got) == {1, 2, 3, 10, 11, 20}
    # groups land in one cluster each
    assert got[1][0] == got[2][0] == got[3][0]
    assert got[10][0] == got[11][0]
    # first-wins keep: smallest id per dup group survives
    assert got[1][1] is True and got[2][1] is False and got[3][1] is False
    assert got[10][1] is True and got[11][1] is False
    assert got[20][1] is True
    # scale shape: the cluster-assignment UDF is materialized once — the
    # consuming plan is pure JVM (no ArrowEvalPython / BatchEvalPython)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_filtered_ann_prefilters_corpus(spark):
    """Filtered vector search: every returned neighbor passes the
    predicate, excluded near-duplicates are absent even when they would
    dominate the unfiltered top-k, and ranks stay dense after the
    pre-filter (never a post-filtered ranking with holes)."""
    from pyspark.sql import functions as F

    from web_crawler_spark.functions import simsearch

    # v0 query; v1 nearly identical but EXCLUDED; v2 allowed, close;
    # v3 allowed, orthogonal-ish
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    allowed = spark.createDataFrame([(0,), (2,), (3,)], "vec_id bigint")
    corpus = emb.join(allowed, on="vec_id", how="left_semi")
    q = emb.filter(F.col("vec_id") == 0)
    got = [
        (r["neighbor_id"], r["rank"])
        for r in simsearch.brute_force_topk(corpus, q, k=2)
        .orderBy("rank")
        .collect()
    ]
    # v1 (the best unfiltered neighbor) must not appear; ranks dense from 1
    assert got == [(2, 1), (3, 2)]


def test_hybrid_rrf_arbitrates_between_arms(spark):
    """RRF on a corpus where the arms disagree: a lexical twin (shared
    words, orthogonal vector), a semantic twin (no shared words,
    near-identical vector), and a middling doc — hand-computed integer
    RRF ranks the both-arms doc above the single-arm ones exactly."""
    from web_crawler_spark.functions import simsearch

    docs = [
        (0, "alpha beta gamma"),
        (1, "alpha beta gamma"),          # lexical twin
        (2, "delta epsilon zeta"),        # semantic twin (below)
        (3, "alpha unrelated words"),     # middling: 1 shared term
    ]
    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),                  # orthogonal
        (2, [0.999, 0.01]),               # near-identical
        (3, [0.7, 0.7]),                  # middling
    ]
    d = spark.createDataFrame(docs, "doc_id bigint, text string")
    e = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    got = [
        (r["neighbor_id"], r["rrf_micro"], r["fused_rank"])
        for r in simsearch.hybrid_topk(d, e, n_queries=1, k=3)
        .orderBy("fused_rank")
        .collect()
    ]
    # lex: d1 r1 (3 shared), d3 r2 (1 shared); d2 absent
    # sem: d2 r1, d3 r2, d1 r3
    rrf = lambda *rs: sum(10**6 // (60 + r) for r in rs)  # noqa: E731
    assert got == [
        (1, rrf(1, 3), 1),
        (3, rrf(2, 2), 2),
        (2, rrf(1), 3),
    ]


def test_mmr_rerank_picks_diverse_over_near_dup(spark):
    """Hand-computed greedy: the first pick is the relevance tie broken
    to the smallest id; the second pick is the DIVERSE candidate (the
    near-duplicate of pick 1 scores higher on pure relevance but its
    redundancy penalty sinks it); exact milli-integer arithmetic."""
    from pyspark.sql import functions as F

    from web_crawler_spark.functions import simsearch

    vecs = [
        (0, [1.0, 0.0]),       # query
        (1, [0.9, 0.4]),       # rel 900000 (tie with id3 -> picked first)
        (2, [0.89, 0.41]),     # near-dup of id1: rel 890000, div vs 1 = 965000
        (3, [0.9, -0.4]),      # rel 900000, div vs 1 = 650000 -> 2nd pick
    ]
    emb = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    got = [
        (r["neighbor_id"], r["mmr_rank"])
        for r in simsearch.mmr_rerank(emb, n_queries=1, k=3, pool=3)
        .orderBy("mmr_rank")
        .collect()
    ]
    assert got == [(1, 1), (3, 2), (2, 3)]


def test_watermark_detection_crafted(spark):
    """Greedily synthesized green-list text must flag; its red-only twin
    must not; a two-token doc and the gamma-rate null case pin the z-test
    arithmetic.  The green predicate here reimplements the engine's md5
    rule independently in pure Python."""
    import hashlib

    def green(prev, tok):
        h = int(hashlib.md5(f"{prev} {tok}".encode()).hexdigest()[:8], 16)
        return h % textstats.WM_GAMMA_DEN < textstats.WM_GAMMA_NUM

    vocab = [f"w{i}" for i in range(40)]

    def synth(n_tokens, want_green):
        toks = ["the"]
        while len(toks) < n_tokens:
            nxt = next(t for t in vocab if green(toks[-1], t) == want_green)
            toks.append(nxt)
        return " ".join(toks)

    wm, plain = synth(120, True), synth(120, False)
    df = spark.createDataFrame(
        # docs 4-6: degenerate inputs (empty / punctuation-only / one token)
        # must be FILTERED, not crash the slice (negative-length guard)
        [(1, wm), (2, plain), (3, "alpha beta"),
         (4, ""), (5, "!!! ..."), (6, "one")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textstats.watermark_scores(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_scored"] == 119 and out[1]["n_green"] == 119
    assert out[1]["green_ppm"] == 1_000_000 and out[1]["is_watermarked"]
    assert out[2]["n_green"] == 0 and not out[2]["is_watermarked"]
    # 2 tokens -> 1 scored pair; even a green pair cannot clear z=4
    assert out[3]["n_scored"] == 1 and not out[3]["is_watermarked"]

    # DuckDB twin on the same frame (green predicate + z-test parity)
    con = duckdb.connect()
    pdf = df.toPandas()
    con.register("wmdocs", pdf)
    want = con.sql(textstats.duck_watermark_sql("wmdocs")).df()
    got = textstats.watermark_scores(df).toPandas()
    got = got.sort_values("doc_id").reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values("doc_id").reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rm3_expansion_recovers_vocab_mismatch(spark):
    """A doc sharing NO query term must enter the RM3 ranking through
    expansion terms mined from the feedback docs, while plain BM25 cannot
    score it; expansion must exclude the original query terms.  Oracle
    parity on the same frame."""
    rows = [
        (1, "spark catalyst engine"),
        (2, "spark catalyst engine"),
        (3, "spark catalyst engine"),
        (4, "catalyst catalyst catalyst optimizer"),   # no 'spark'
        (5, "unrelated words entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    q = ("spark",)

    bm = {r["doc_id"] for r in textstats.bm25_topk(df, q, k=5).collect()}
    assert 4 not in bm  # vocabulary mismatch: BM25 cannot see doc 4

    rm = {
        r["doc_id"]: r
        for r in textstats.rm3_topk(df, q, fb_k=3, n_exp=2, k=5).collect()
    }
    assert 4 in rm and rm[4]["score_ppm"] > 0
    assert 5 not in rm  # still no shared vocabulary

    con = duckdb.connect()
    con.register("rm3docs", df.toPandas())
    want = con.sql(
        textstats.duck_rm3_sql("rm3docs", q, fb_k=3, n_exp=2, k=5)
    ).df()
    got = (
        textstats.rm3_topk(df, q, fb_k=3, n_exp=2, k=5)
        .toPandas()
        .sort_values("rnk")
        .reset_index(drop=True)
    )
    want = want.sort_values("rnk").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_gazetteer_tagging_crafted(spark):
    """Nested/overlapping matches all count ('sort merge join' holds both
    OPERATOR bigrams), matching is case-insensitive, single-token entities
    count every occurrence, and punctuation between words does NOT break
    adjacency (the [^a-z0-9]+ tokenizer treats it as one separator — the
    documented phrase semantics shared with phrase_search).  Oracle parity
    on the same frame."""
    gaz = (
        ("hash join", "OPERATOR"),
        ("sort merge", "OPERATOR"),
        ("merge join", "OPERATOR"),
        ("spark", "ENGINE"),
    )
    rows = [
        (1, "the sort merge join beats the hash join"),
        (2, "spark, Spark and SPARK run a hash. join"),
        (3, "nothing relevant"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["entity"]): (r["etype"], r["n_mentions"])
        for r in textstats.gazetteer_tag(df, gaz).collect()
    }
    assert got[(1, "sort merge")] == ("OPERATOR", 1)
    assert got[(1, "merge join")] == ("OPERATOR", 1)   # nested overlap counts
    assert got[(1, "hash join")] == ("OPERATOR", 1)
    assert got[(2, "spark")] == ("ENGINE", 3)          # case-insensitive
    assert (2, "hash join") in got  # tokenizer strips punctuation: 'hash. join'
    assert all(d != 3 for d, _ in got)

    con = duckdb.connect()
    con.register("gazdocs", df.toPandas())
    want = con.sql(textstats.duck_gazetteer_sql("gazdocs", gaz)).df()
    got_df = (
        textstats.gazetteer_tag(df, gaz)
        .toPandas()
        .sort_values(["doc_id", "entity"])
        .reset_index(drop=True)
    )
    want = want.sort_values(["doc_id", "entity"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_df[sorted(got_df.columns)], want[sorted(want.columns)],
        check_dtype=False,
    )


def test_maxscore_bounds_are_admissible(spark, docs):
    """The WAND safety property on real fixture data: for the graded query,
    sum of the query terms' max_score_ppm must dominate the best full BM25
    score (an inadmissible bound would let WAND skip true winners).  Also:
    every bound is positive and attained (tight for some single doc) on a
    crafted corpus."""
    bounds = {
        r["term"]: r["max_score_ppm"]
        for r in textstats.maxscore_bounds(docs).collect()
    }
    top = textstats.bm25_topk(docs, k=1).collect()
    if top:
        budget = sum(bounds.get(t, 0) for t in textstats.BM25_QUERY)
        assert top[0]["score_ppm"] <= budget

    # tightness: single-term docs make the bound exactly the top-1 score
    df = spark.createDataFrame(
        [(1, "apple apple apple"), (2, "apple"), (3, "pear")],
        "doc_id long, text string",
    )
    b = {
        r["term"]: r for r in textstats.maxscore_bounds(df).collect()
    }
    s = textstats.bm25_topk(df, ("apple",), k=1).collect()[0]["score_ppm"]
    assert b["apple"]["max_score_ppm"] == s
    assert b["apple"]["df_t"] == 2 and b["pear"]["df_t"] == 1
    assert all(r["max_score_ppm"] > 0 for r in b.values())


def test_semantic_pack_clusters_are_contiguous(spark):
    """Two well-separated embedding clusters must receive equal
    within-cluster sort keys, so each cluster's documents occupy one
    contiguous token range; ties inside a cluster break on md5(doc_id)."""
    import hashlib

    from pyspark.sql import functions as F

    from web_crawler_spark.functions import packing

    a = [0.9] * 32 + [-0.7] * 32
    b = [-0.9] * 32 + [0.7] * 32
    rows = [
        (i, "tok " * (i + 1), (a if i % 2 == 0 else b))
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, embedding array<float>"
    )
    out = packing.pack_sequences(
        df, ctx=8, key_col=packing.semantic_sort_key(F.col("embedding"), 64)
    ).collect()
    offs = {r["doc_id"]: (r["tok_offset"], r["n_tokens"]) for r in out}
    clusters = [[0, 2, 4], [1, 3, 5]]
    spans = []
    for cl in clusters:
        lo = min(offs[d][0] for d in cl)
        hi = max(offs[d][0] + offs[d][1] for d in cl)
        assert hi - lo == sum(offs[d][1] for d in cl)  # contiguous block
        spans.append((lo, hi))
    spans.sort()
    assert spans[0][1] == spans[1][0]  # blocks abut, no interleave
    # within a cluster the md5 tiebreak orders doc ids deterministically
    first = clusters[0] if offs[clusters[0][0]][0] < offs[clusters[1][0]][0] else clusters[1]
    order = sorted(first, key=lambda d: offs[d][0])
    assert order == sorted(first, key=lambda d: hashlib.md5(str(d).encode()).hexdigest())


def test_bm25f_title_hits_outrank_body_hits(spark):
    """A title match must outrank an identical-tf body match (field weight
    2x, lighter title normalization), and the combined tf must saturate
    through ONE k1 stage: a doc hitting both fields scores less than the
    sum of the two single-field scores."""
    from web_crawler_spark.functions.textstats import bm25f_topk

    rows = [
        ("u_title", "spark tuning guide", "pad words only here none match"),
        ("u_body", "unrelated heading", "spark pad words only here none"),
        ("u_both", "spark tuning guide", "spark pad words only here none"),
        ("u_none", "nothing", "nothing at all"),
    ]
    df = spark.createDataFrame(rows, "url string, title string, text string")
    got = {r["doc"]: r for r in bm25f_topk(df, query_terms=("spark",)).collect()}
    assert "u_none" not in got
    assert got["u_title"]["score_ppm"] > got["u_body"]["score_ppm"]
    assert got["u_both"]["rnk"] == 1
    assert (
        got["u_both"]["score_ppm"]
        < got["u_title"]["score_ppm"] + got["u_body"]["score_ppm"]
    )


def test_host_graph_churn_crafted(spark, tmp_path):
    """Edge churn between crafted snapshots: one edge of each class per
    source host (added / removed / stable-same / stable-reweighted), exact
    ppm, relative hrefs resolving to a self-edge; DuckDB twin agrees."""
    import duckdb

    from web_crawler_spark.functions import linkstats

    # host a: prev links to b (x2) and c; curr links to b (x1), c, and d
    #   -> c stable-same, b stable-reweighted, d added; self-edge /rel both
    # host e: prev links to f only; curr has no e page -> that edge removed
    prev = spark.createDataFrame(
        [
            (
                "http://a.x/p",
                (
                    '<a href="http://b.x/1">.</a><a href="http://b.x/2">.</a>'
                    '<a href="http://c.x/1">.</a><a href="/rel">.</a>'
                ).encode(),
            ),
            ("http://e.x/p", '<a href="http://f.x/1">.</a>'.encode()),
        ],
        "url string, html binary",
    )
    curr = spark.createDataFrame(
        [
            (
                "http://a.x/p",
                (
                    '<a href="http://b.x/1">.</a><a href="http://c.x/9">.</a>'
                    '<a href="http://d.x/1">.</a><a href="/rel">.</a>'
                ).encode(),
            ),
        ],
        "url string, html binary",
    )
    got = {r["src_host"]: r for r in linkstats.host_graph_churn(prev, curr).collect()}
    a = got["a.x"]
    assert (a["n_added"], a["n_removed"], a["n_stable"]) == (1, 0, 3)
    assert a["n_reweighted"] == 1            # b.x weight 2 -> 1
    assert a["churn_ppm"] == 250000          # 1 changed / 4 union edges
    e = got["e.x"]
    assert (e["n_added"], e["n_removed"], e["n_stable"]) == (0, 1, 0)
    assert e["churn_ppm"] == 1000000

    d = str(tmp_path)
    prev.toPandas().to_parquet(f"{d}/prev.parquet")
    curr.toPandas().to_parquet(f"{d}/curr.parquet")
    want = duckdb.sql(
        linkstats.duck_host_graph_churn_sql(
            f"read_parquet('{d}/prev.parquet')", f"read_parquet('{d}/curr.parquet')"
        )
    ).df()
    for _, w in want.iterrows():
        g = got[w["src_host"]]
        for col in ("n_added", "n_removed", "n_stable", "n_reweighted", "churn_ppm"):
            assert int(w[col]) == g[col], (w["src_host"], col)


def test_dedup_method_agreement_crafted(spark):
    """Two families agree on a planted near-dup pair: MinHash-Jaccard and
    SimHash both fire, set identities hold, and the planted distinct doc
    joins neither side."""
    from web_crawler_spark.functions import dedupsim

    base = " ".join(f"tok{i}" for i in range(120))
    near = base + " extra"
    other = " ".join(f"zzz{i}" for i in range(120))
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, other)], "doc_id long, text string"
    )
    r = dedupsim.method_agreement(df).collect()[0]
    assert r["n_both"] >= 1                       # the planted pair
    assert r["n_both"] <= min(r["n_minhash"], r["n_simhash"])
    assert r["n_union"] == r["n_minhash"] + r["n_simhash"] - r["n_both"]
    assert 0 < r["agreement_ppm"] <= 1000000


def test_image_text_pairs_gate_boundaries(spark):
    """Pair-quality gate at its exact boundaries; captions mined from real
    tEXt chunks; non-caption keys and caption-less images excluded."""
    from web_crawler_spark.functions import codecs, multimodal as mm

    def png(w, h, texts):
        px = bytes((i * 3) % 256 for i in range(w * h * 3))
        return codecs.encode_png(px, w, h, 3, texts=texts)

    rows = [
        (0, "image", png(16, 16, {"caption": "two words"}), 16, 16),      # ok
        (1, "image", png(16, 16, {"caption": "oneword"}), 16, 16),        # < 2 words
        (2, "image", png(16, 16, {"caption": " ".join(["w"] * 33)}), 16, 16),  # > 32
        (3, "image", png(15, 16, {"caption": "small image here"}), 15, 16),    # w < 16
        (4, "image", png(16, 16, {"caption": "x" * 201 + " y"}), 16, 16),  # chars > 200
        (5, "image", png(16, 16, {"author": "nobody"}), 16, 16),          # no caption
        (6, "image", png(16, 16, None), 16, 16),                          # no tEXt
        (7, "image", png(16, 16, {"caption": " ".join(["w"] * 32)}), 16, 16),  # == 32 ok
    ]
    df = spark.createDataFrame(
        [(i, k, bytearray(p), w, h) for i, k, p, w, h in rows],
        "media_id long, kind string, payload binary, width int, height int",
    )
    got = {r["media_id"]: r for r in mm.image_text_pairs(df).collect()}
    assert set(got) == {0, 1, 2, 3, 4, 7}  # 5/6 have no caption row at all
    assert got[0]["ok"] is True and got[7]["ok"] is True
    assert got[1]["ok"] is False and got[2]["ok"] is False
    assert got[3]["ok"] is False and got[4]["ok"] is False
    assert got[0]["n_words"] == 2 and got[7]["n_words"] == 32


def test_media_phash_pairs_banding_complete(spark):
    """Banded Hamming pairs == brute force on a crafted corpus with an
    exact re-encode pair (hamming 0), a near pair, and distant images."""
    from web_crawler_spark.functions import codecs, multimodal as mm

    import random as _r
    rng = _r.Random(13)
    w, h = 27, 16
    px = bytes(rng.getrandbits(8) for _ in range(w * h * 3))
    pngs = {
        0: codecs.encode_png(px, w, h, 3, filters=[0]),
        1: codecs.encode_png(px, w, h, 3, filters=[2, 4]),  # re-encode
    }
    for i in range(2, 8):
        other = bytes(rng.getrandbits(8) for _ in range(w * h * 3))
        pngs[i] = codecs.encode_png(other, w, h, 3)
    df = spark.createDataFrame(
        [(i, "image", bytearray(p)) for i, p in pngs.items()],
        "media_id long, kind string, payload binary",
    )
    got = {(r["a"], r["b"]): r["hamming"] for r in mm.media_phash_pairs(df).collect()}
    # brute force over the engine hashes
    hs = {r["media_id"]: r["phash"] for r in mm.media_phash(df).collect()}
    want = {}
    for a in hs:
        for b in hs:
            if a < b:
                ham = bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1")
                if ham <= mm.PHASH_PAIR_MAX_HAMMING:
                    want[(a, b)] = ham
    assert got == want and got[(0, 1)] == 0


def test_media_formats_header_inventory(spark, sf_small):
    """R5: media_formats parses container + dims from the HEADER alone for
    both PNG and JPEG rows, matches the synth-declared metadata (the
    graded oracle shape), and null-skips poison image payloads."""
    from web_crawler_spark import synth
    from web_crawler_spark.functions import codecs, multimodal

    media = spark.read.parquet(synth.synth_path("0.001", "media"))
    got = {r["media_id"]: r for r in multimodal.media_formats(media).collect()}
    declared = {
        r["media_id"]: r
        for r in media.filter("kind = 'image'").collect()
    }
    assert set(got) == set(declared)
    n_fmt = {"jpeg": 0, "gif": 0, "png": 0}
    for mid, r in got.items():
        d = declared[mid]
        head = bytes(d["payload"])[:4]
        want = (
            "jpeg" if head[:3] == codecs.JPEG_SIG
            else "gif" if head == b"GIF8"
            else "png"
        )
        n_fmt[want] += 1
        assert r["container"] == want
        assert (r["width"], r["height"]) == (d["width"], d["height"]), mid
    # v30/v31 fixtures must exercise every container branch
    assert min(n_fmt.values()) > 0, n_fmt
    # poison image rows -> container sniffed, dims null, no task failure
    bad = spark.createDataFrame(
        [
            (900, "image", bytearray(b"\xff\xd8\xff\xe0garbage")),
            (901, "image", bytearray(b"\x89PNG\r\n\x1a\nshort")),
            (902, "image", bytearray(b"GIF89a??")),
            (903, "image", bytearray(b"RIFF????WEBP")),
        ],
        "media_id long, kind string, payload binary",
    )
    rows = {r["media_id"]: r for r in multimodal.media_formats(bad).collect()}
    assert rows[900]["container"] == "jpeg" and rows[900]["width"] is None
    assert rows[901]["container"] == "png" and rows[901]["width"] is None
    # truncated GIF: sniffed by magic, dims null (header shorter than the
    # 10-byte logical-screen prefix)
    assert rows[902]["container"] == "gif" and rows[902]["width"] is None
    assert rows[903]["container"] == "unknown" and rows[903]["width"] is None


def test_media_cross_format_pairs(spark, sf_small):
    """R5: the cross-format dedup property as an operator — identical
    pixels stored as PNG and JPEG pair at Hamming<=3 across containers
    (byte-level dedup scores zero on them).  Built as a crafted frame so
    the pair is known exactly."""
    import random

    from web_crawler_spark.functions import codecs, multimodal

    rng = random.Random(41)
    px1 = bytes(rng.getrandbits(8) for _ in range(20 * 14 * 3))
    px2 = bytes(rng.getrandbits(8) for _ in range(20 * 14 * 3))
    rows = [
        (1, "image", bytearray(codecs.encode_png(px1, 20, 14, 3)), 20, 14, None),
        (2, "image", bytearray(codecs.encode_jpeg(px1, 20, 14, 3, quality=92)), 20, 14, None),
        (3, "image", bytearray(codecs.encode_png(px2, 20, 14, 3)), 20, 14, None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, width int, height int, duration_s double",
    )
    from __spark_entry__ import q_media_cross_format  # noqa: F401  (shape only)

    pairs = multimodal.media_phash_pairs(media)
    fmts = multimodal.media_formats(media).select("media_id", "container")
    from pyspark.sql import functions as F

    cross = (
        pairs.join(fmts.select(F.col("media_id").alias("a"), F.col("container").alias("container_a")), on="a")
        .join(fmts.select(F.col("media_id").alias("b"), F.col("container").alias("container_b")), on="b")
        .filter(F.col("container_a") != F.col("container_b"))
        .collect()
    )
    assert len(cross) == 1
    r = cross[0]
    assert {r["container_a"], r["container_b"]} == {"png", "jpeg"}
    assert {r["a"], r["b"]} == {1, 2} and r["hamming"] <= 3
