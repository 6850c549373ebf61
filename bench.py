"""Headline benchmark: crawl-engine + pipeline operators at sf0.1.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "urls_sched_per_sec": ...}

The north-star number is ``urls_sched_per_sec`` — candidate URLs
canonicalized + deduped + politeness-scheduled per second (frontier_sched
query) — matching BASELINE.json's metric definition.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from web_crawler_spark import synth  # noqa: E402
from web_crawler_spark.functions import dedupsim, html_parse, simsearch, urlnorm, webtext  # noqa: E402
from web_crawler_spark.plans.crawl import ChainCrawl, CrawlConfig  # noqa: E402
from web_crawler_spark.plans.schedule import schedule_frontier  # noqa: E402
from web_crawler_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _noop(df) -> int:
    """Force full computation without driver-side collection."""
    df.write.mode("overwrite").format("noop").save()
    return -1


def bench_parse_extract(spark, sf):
    """100k HTML payloads through the Arrow parse UDF."""
    pages = spark.read.parquet(synth.synth_path(sf, "pages"))
    df = html_parse.with_parsed(pages.select("url", "html")).select(
        "url", "parsed.title", "parsed.links_count"
    )
    return _noop(df)


def bench_frontier_sched(spark, sf):
    """The north-star op: explode candidate links -> canonicalize (JVM fast
    mask; Python only for the messy residue) -> seen anti-join BEFORE the
    dedup exchange (rediscoveries die map-side under the broadcast) ->
    first-wins dedup -> politeness budget (plans/schedule.py)."""
    meta = spark.read.parquet(synth.synth_path(sf, "pages_meta"))
    seen = spark.read.parquet(synth.synth_path(sf, "pages_meta")).select("url").limit(20000)
    links = (
        meta.select(
            F.xxhash64("url").alias("p0"), F.posexplode("links").alias("p1", "url")
        )
        .select("url", "p0", F.col("p1").cast("long").alias("p1"))
        # candidates arrive materialized from the persisted parse stage in
        # the engine; the canonical-mask split then reads memory, not the
        # parquet scan twice (cold-start: 7.4s -> 2.3s at local[32])
        .localCheckpoint(eager=True)
    )
    cand = urlnorm.with_canonical_split(links).filter(F.col("url").isNotNull())
    batch = schedule_frontier(cand, seen, ["p0", "p1"], budget=100)
    return batch.count()


def bench_crawl_scale(spark, sf):
    """3 scheduling rounds of the full scale-mode engine (bloom seen-set,
    budgets, canonicalization, checkpoint-free)."""
    pages = spark.read.parquet(synth.synth_path(sf, "pages"))
    seeds = spark.read.parquet(synth.synth_path(sf, "seeds"))
    eng = ChainCrawl(
        spark, pages, CrawlConfig(rounds=3, mode="scale", host_budget=200, use_bloom=True)
    )
    try:
        state = eng.run(seeds)
        return sum(m["urls_processed"] for m in state.metrics)
    finally:
        eng.close()


def bench_dedup_minhash(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    sh = dedupsim.shingles(docs)
    pairs = dedupsim.lsh_candidate_pairs(
        dedupsim.lsh_bands(dedupsim.minhash_signatures(sh))
    )
    return pairs.count()


def bench_corpus_webclean(spark, sf):
    """Composed web-corpus pipeline (C4 line filter -> repetition gate ->
    corpus-wide line dedup -> PII scrub) over the webdocs fixture."""
    wd = spark.read.parquet(synth.synth_path(sf, "webdocs"))
    return webtext.clean_web_corpus(wd).count()


def bench_snapshot_diff(spark, sf):
    """Crawl-delta between two snapshots: map-side digest projection, then a
    full-outer join that moves hashes, never page bodies."""
    from web_crawler_spark.plans import recrawl

    prev = spark.read.parquet(synth.synth_path(sf, "pages_prev"))
    curr = spark.read.parquet(synth.synth_path(sf, "pages"))
    return _noop(recrawl.snapshot_diff(prev, curr))


def bench_search_bm25(spark, sf_dir):
    """Integer-exact BM25 top-k over the documents corpus: one tokenize
    pass with fused dl + per-term tf partials, broadcast idf, partial
    top-k (TakeOrderedAndProject)."""
    from web_crawler_spark.functions import textstats

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return textstats.bm25_topk(docs).count()


def bench_corpus_html(spark, sf):
    """Web-native composition: raw html -> density main-content extraction
    (zero-Python JVM regex) -> quality/langid gates -> fingerprint dedup
    with canonical selection; html dies in the first projection."""
    from web_crawler_spark.plans import corpus

    pages = spark.read.parquet(synth.synth_path(sf, "pages"))
    return corpus.corpus_from_html(pages.select("url", "html")).count()


def bench_ann_brute(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.filter(F.col("vec_id") < 20)
    return simsearch.brute_force_topk(emb, q, k=10).count()


def main() -> None:
    sf = synth.sf_name_of(SF_DIR)
    if sf not in synth._SF_PAGES:
        sf = "0.1"
    synth.ensure_synth(sf)
    spark = get_spark(app_name="wcs-bench", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 32))

    # one warm-up action so JVM/codegen startup isn't billed to the first query
    spark.read.parquet(synth.synth_path(sf, "pages_meta")).count()

    # best-of-RUNS per query (BENCH.md methodology): this host shows ±30-90%
    # run-to-run noise, so a single pass is not signal
    RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))

    def best_of(fn, *args) -> tuple[float, object]:
        best, ret = None, None
        for _ in range(RUNS):
            t0 = time.time()
            r = fn(*args)
            dt = time.time() - t0
            if best is None or dt < best:
                best, ret = dt, r
        return round(best, 3), ret

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    timings["parse_extract"], _ = best_of(bench_parse_extract, spark, sf)

    # candidates entering the scheduler = exploded links (north-star denominator)
    n_cand = (
        spark.read.parquet(synth.synth_path(sf, "pages_meta"))
        .select(F.explode("links"))
        .count()
    )
    timings["frontier_sched"], _ = best_of(bench_frontier_sched, spark, sf)
    extras["urls_sched_per_sec"] = round(n_cand / timings["frontier_sched"], 1)

    timings["crawl_scale_3r"], n_crawled = best_of(bench_crawl_scale, spark, sf)
    extras["crawl_urls_per_sec"] = round(n_crawled / timings["crawl_scale_3r"], 1)

    timings["dedup_minhash_lsh"], _ = best_of(bench_dedup_minhash, spark, SF_DIR)

    timings["corpus_webclean"], _ = best_of(bench_corpus_webclean, spark, sf)

    timings["snapshot_diff"], _ = best_of(bench_snapshot_diff, spark, sf)

    timings["corpus_html"], _ = best_of(bench_corpus_html, spark, sf)

    timings["ann_brute"], _ = best_of(bench_ann_brute, spark, SF_DIR)

    timings["search_bm25"], _ = best_of(bench_search_bm25, spark, SF_DIR)

    out = {
        "metric": "headline suite wall-clock (crawl sched/parse/dedup/corpus/ann) at sf",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": CPUS,
        "runs_per_query": RUNS,
        **extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
