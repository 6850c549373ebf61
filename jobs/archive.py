"""Archive-maintenance job: WARC in -> deduplicated WARC / CDX index out.

The storage-side counterpart of jobs/crawl.py (which produces captures) and
jobs/corpus.py (which consumes text): given a directory of WARC files —
Common Crawl's native unit — this job either

  * ``--mode revisit``: rewrites the archive with WARC 1.1 revisit typing
    (first capture of each distinct payload keeps its body; later
    byte-identical captures become empty revisit records pointing at the
    original — the storage dedup a monthly re-crawl needs), or
  * ``--mode cdx``: emits the sorted CDX(J) lookup index next to the archive,
  * ``--mode chunks``: content-defined-chunks every payload (gear/FastCDC)
    and writes the chunk relation + a storage-dedup summary — the
    chunk-store capacity plan for the archive, or
  * ``--mode frontcode``: writes the per-host front-coding saving table for
    the sorted CDX key stream (is the SURT sort worth it for this crawl?).

Scale shape: reading is one task per WARC file (the Common-Crawl
parallelism unit); revisit typing digests bodies map-side and exchanges
24-byte digests once; the rewrite moves each surviving body exactly once
into its output shard.  Everything is thin wiring over graded operators
(warc.revisit_records / cdx_index).

Example:
  spark-submit --py-files dist/wcs.zip jobs/archive.py \\
      --warc-in '/archive/2026-08/*.warc' --output /archive/2026-08-dedup \\
      --mode revisit --shards 64
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from web_crawler_spark.session import get_spark  # noqa: E402
from web_crawler_spark.sources import warc  # noqa: E402


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="WARC archive dedup / indexing")
    p.add_argument("--warc-in", required=True, help="WARC file glob")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument(
        "--mode",
        choices=("revisit", "cdx", "chunks", "frontcode"),
        default="revisit",
    )
    p.add_argument("--shards", type=int, default=32)
    p.add_argument("--master", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def rewrite_with_revisits(spark, warc_glob: str, out_dir: str, shards: int) -> dict:
    """Read captures, type them, and write revisit-aware WARC files.

    Bodies move across the cluster EXACTLY ONCE: captures repartition on
    digest (``shards`` partitions — the output file count), the
    original-vs-revisit decision is a window *within* that partitioning
    (no second exchange; Spark reuses the repartition), and each task
    writes its partition directly — revisit rows carry NO payload.  The
    naive plan (type on digests, join bodies back on (url, ts)) ships
    every body through a second shuffle."""
    caps = warc.read_warc(spark, warc_glob)
    joined = warc.revisit_records(
        [caps], carry_payload=True, repartition_to=shards
    )

    os.makedirs(out_dir, exist_ok=True)

    def dump(rows) -> None:
        from datetime import datetime, timezone

        from pyspark import TaskContext

        rows = list(rows)
        if not rows:
            return

        def ts(us):
            return (
                None
                if us is None
                else datetime.fromtimestamp(us / 1e6, tz=timezone.utc)
            )

        pid = TaskContext.get().partitionId()
        warc.write_warc_revisits(
            (
                (
                    r["url"],
                    ts(r["ts_us"]),
                    r["html"],
                    r["record_type"],
                    r["refers_to_url"],
                    ts(r["refers_to_ts_us"]),
                )
                for r in rows
            ),
            os.path.join(out_dir, f"part-{pid:05d}.warc"),
        )

    joined = joined.persist()  # one pass feeds both the write and the stats
    joined.foreachPartition(dump)
    agg = joined.groupBy("record_type").agg(
        F.count("*").alias("n"), F.sum("bytes_saved").alias("saved")
    )
    stats = {r["record_type"]: (r["n"], r["saved"]) for r in agg.collect()}
    return {
        "mode": "revisit",
        "responses": stats.get("response", (0, 0))[0],
        "revisits": stats.get("revisit", (0, 0))[0],
        "bytes_saved": int(stats.get("revisit", (0, 0))[1] or 0),
    }


def main(argv: "list[str] | None" = None) -> int:
    args = build_parser().parse_args(argv)
    spark = get_spark(
        app_name="wcs-archive",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    if args.mode == "cdx":
        pages = warc.read_warc(spark, args.warc_in)
        warc.write_cdx(pages, args.output, n_shards=args.shards)
        stats = {"mode": "cdx", "captures": pages.count(), "shards": args.shards}
    elif args.mode == "chunks":
        from web_crawler_spark.functions import webtext

        pages = warc.read_warc(spark, args.warc_in)
        docs = pages.select(
            F.xxhash64("url", "warc_ts").alias("doc_id"),
            F.col("html").cast("string").alias("text"),
        )
        chunks = webtext.cdc_chunks(docs).persist()
        chunks.write.mode("overwrite").parquet(args.output)
        row = webtext.cdc_dedup_stats(chunks).first().asDict()
        stats = {"mode": "chunks", **{k: int(v) for k, v in row.items()}}
    elif args.mode == "frontcode":
        pages = warc.read_warc(spark, args.warc_in)
        fc = warc.cdx_frontcode(pages).persist()
        fc.write.mode("overwrite").parquet(args.output)
        tot = fc.agg(
            F.sum("bytes_plain").alias("p"), F.sum("bytes_shared").alias("s")
        ).first()
        stats = {
            "mode": "frontcode",
            "host_subtrees": fc.count(),
            "bytes_plain": int(tot["p"] or 0),
            "bytes_shared": int(tot["s"] or 0),
        }
    else:
        stats = rewrite_with_revisits(spark, args.warc_in, args.output, args.shards)
    stats["master"] = spark.sparkContext.master
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
