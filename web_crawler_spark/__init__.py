"""web_crawler_spark — a PySpark-native URL-frontier + crawl-analytics engine.

A brand-new engine (not a port) with the query/data-processing capabilities of
the sp1007/web_crawler reference (see SURVEY.md): a distributed URL frontier +
fetch scheduler expressed as DataFrame operations over snapshot-checkpointed
parquet tables of Common-Crawl-style pages (url, warc_ts, html, text, lang).

Layout:
    refsim       — per-row reference-semantics oracle (parser + 1-worker crawl)
    synth        — deterministic synthetic pages/seeds/candidates fixtures
    session      — SparkSession factory (Arrow, AQE, tuned shuffle partitions)
    functions/   — vectorized pandas/Arrow UDFs (html parse, urlnorm, text, sim)
    operators/   — dedup, politeness window, bloom seen-set, top-k
    plans/       — crawl round loop, checkpoint/resume, lineage
    sources/     — seed/url-file sources, pages reader, sinks
    streaming/   — Structured Streaming variant of the parse stage
"""

__version__ = "0.1.0"
