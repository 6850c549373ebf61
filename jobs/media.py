"""Multimodal pipeline job: sniff -> decode-validate -> dedup -> caption
pairs -> thumbnails, as one spark-submit entry point.

Completes the jobs surface (crawl / corpus / archive / graph / media):
thin wiring over the graded media operators (functions/multimodal.py on
the real codecs of functions/codecs.py), so the CLI runs the exact plans
the correctness board verifies — nothing here re-implements logic.

Example (cluster):
  spark-submit --py-files dist/web_crawler_spark.zip jobs/media.py \
      --media s3://crawl/media.parquet --output s3://corpus/media \
      --pairs --thumbs 64x64 --dedup

Offline smoke (sandbox): python jobs/media.py \
      --media .synthdata/sf0.001/media.parquet --output /tmp/m --dedup
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

from web_crawler_spark.functions import multimodal  # noqa: E402
from web_crawler_spark.session import get_spark  # noqa: E402


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Multimodal training-data export (sniff/dedup/pairs/thumbs)"
    )
    p.add_argument(
        "--media", required=True,
        help="media parquet (media_id, kind, payload, width, height, duration_s)",
    )
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument(
        "--dedup", action="store_true",
        help="write <output>/phash (decoded-domain hash + copy counts) and "
        "<output>/near_pairs (banded Hamming<=3 pairs)",
    )
    p.add_argument(
        "--pairs", action="store_true",
        help="write <output>/image_text (caption pairs passing the quality gate)",
    )
    p.add_argument(
        "--thumbs", default=None, metavar="WxH",
        help="write <output>/thumbs (real PNG thumbnails at WxH)",
    )
    p.add_argument(
        "--audio-segments", action="store_true",
        help="write <output>/audio_segments (frame-energy VAD runs)",
    )
    p.add_argument(
        "--scenes", action="store_true",
        help="write <output>/scenes (per-frame hashes + cut flags)",
    )
    p.add_argument("--master", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def main(argv: "list[str] | None" = None) -> int:
    args = build_parser().parse_args(argv)
    spark = get_spark(
        app_name="wcs-media",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    media = spark.read.parquet(args.media)
    stats: dict = {"n_media": media.count()}

    # container sniff vs declared kind: the mismatch count is the
    # poisoned/mislabeled-payload observability signal
    sniffed = multimodal.sniff_kinds(media).join(
        media.select("media_id", "kind"), on="media_id"
    )
    stats["n_kind_mismatch"] = sniffed.filter(
        F.col("kind_sniffed") != F.col("kind")
    ).count()

    if args.dedup:
        ph = multimodal.media_phash(media)
        ph.write.mode("overwrite").parquet(os.path.join(args.output, "phash"))
        ph2 = spark.read.parquet(os.path.join(args.output, "phash"))
        stats["n_hashed"] = ph2.filter(F.col("phash").isNotNull()).count()
        # poison payloads (truncated IDAT, bad CRC, not-actually-media) are
        # SKIPPED as null hashes, surfaced here — never task failures
        stats["n_decode_failed"] = ph2.filter(F.col("phash").isNull()).count()
        stats["n_exact_dup_rows"] = ph2.filter(F.col("n_copies") > 1).count()
        pairs = multimodal.media_phash_pairs(media)
        pairs.write.mode("overwrite").parquet(
            os.path.join(args.output, "near_pairs")
        )
        stats["n_near_pairs"] = spark.read.parquet(
            os.path.join(args.output, "near_pairs")
        ).count()

    if args.pairs:
        it = multimodal.image_text_pairs(media)
        it.write.mode("overwrite").parquet(os.path.join(args.output, "image_text"))
        it2 = spark.read.parquet(os.path.join(args.output, "image_text"))
        stats["n_captions"] = it2.count()
        stats["n_pairs_ok"] = it2.filter("ok").count()

    if args.thumbs:
        try:
            w, h = (int(x) for x in args.thumbs.lower().split("x"))
        except ValueError:
            raise SystemExit(f"Invalid --thumbs '{args.thumbs}' (want WxH)")
        th = multimodal.resize_images(media, out_w=w, out_h=h)
        th.write.mode("overwrite").parquet(os.path.join(args.output, "thumbs"))
        stats["n_thumbs"] = (
            spark.read.parquet(os.path.join(args.output, "thumbs"))
            .filter(F.col("thumb").isNotNull())
            .count()
        )

    if args.audio_segments:
        seg = multimodal.media_audio_segments(media)
        seg.write.mode("overwrite").parquet(
            os.path.join(args.output, "audio_segments")
        )
        stats["n_audio_segments"] = spark.read.parquet(
            os.path.join(args.output, "audio_segments")
        ).count()

    if args.scenes:
        sc = multimodal.media_scenes(media)
        sc.write.mode("overwrite").parquet(os.path.join(args.output, "scenes"))
        sc2 = spark.read.parquet(os.path.join(args.output, "scenes"))
        stats["n_scene_frames"] = sc2.count()
        stats["n_cuts"] = sc2.filter("is_cut").count()

    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
