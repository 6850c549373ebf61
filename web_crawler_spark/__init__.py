"""web_crawler_spark — a PySpark-native URL-frontier + crawl-analytics engine.

A brand-new engine (not a port) with the query/data-processing capabilities of
the sp1007/web_crawler reference (see SURVEY.md): a distributed URL frontier +
fetch scheduler expressed as DataFrame operations over snapshot-checkpointed
parquet tables of Common-Crawl-style pages (url, warc_ts, html, text, lang).

Layout:
    refsim       — per-row reference-semantics oracle (parser + ChainStep crawl)
    synth        — deterministic synthetic pages/seeds/candidates/media fixtures
    session      — SparkSession factory (Arrow, AQE, tuned shuffle partitions)
    functions/   — vectorized pandas/Arrow UDFs + JVM column kernels (html parse,
                   urlnorm split-canonicalization, text/link stats, dedup/sim
                   search, winnowing, multimodal)
    operators/   — first-wins dedup + bucketed seen anti-join, politeness
                   windows, sized/sharded bloom sidecar, global sequencing
    plans/       — crawl round loop (per-step configs, cooldowns, resume),
                   frontier scheduling plan, corpus-cleaning pipeline
    sources/     — seed/url-file sources, pages reader, robots.txt rules,
                   proxy-pool dataflow, sinks (incl. StorageBackend adapter)
    streaming/   — incremental parse, stateful seen-dedup, per-host throttle,
                   watermarked windows
"""

__version__ = "0.2.0"
