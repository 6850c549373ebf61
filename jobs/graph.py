"""Web-graph analytics job: every host-graph operator as one spark-submit
entry point over a pages_meta-shaped table (url, host, links).

The crawl and corpus halves ship as ``jobs/crawl.py`` / ``jobs/corpus.py``;
this is the link-analysis half — importance (PageRank/HITS/SALSA/OPIC),
structure (components/communities/coreness/triangles/bow-tie), degree
statistics (rich-club/assortativity), distance estimates (harmonic
centrality/hop plot) and storage planning (gamma gap-encoding), all thin
wiring over the graded operators, so the CLI runs the exact plans the
correctness board verifies.

Example (cluster):
  spark-submit --py-files dist/web_crawler_spark.zip jobs/graph.py \
      --pages-meta s3://crawl/pages_meta --output s3://crawl/graphstats \
      --ops pagerank,components,bowtie

Offline smoke (sandbox): python jobs/graph.py --pages-meta <pages_meta.parquet> \
      --output /tmp/graph --ops components,richclub
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from web_crawler_spark.functions import linkstats  # noqa: E402
from web_crawler_spark.session import get_spark  # noqa: E402

OPS = {
    "graph": linkstats.host_graph,
    "pagerank": linkstats.host_pagerank,
    "hits": linkstats.host_hits,
    "salsa": linkstats.host_salsa,
    "opic": linkstats.host_opic,
    "components": linkstats.host_components,
    "communities": linkstats.host_communities,
    "coreness": linkstats.host_coreness,
    "reciprocity": linkstats.host_reciprocity,
    "triangles": linkstats.host_triangles,
    "cocitation": linkstats.host_cocitation,
    "bowtie": linkstats.host_bowtie,
    "richclub": linkstats.host_rich_club,
    "assort": linkstats.host_degree_correlation,
    "centrality": linkstats.host_harmonic_centrality,
    "hopplot": linkstats.host_hop_plot,
    "gapcode": linkstats.host_gap_encoding,
    "anf": linkstats.host_anf,
    "walks": linkstats.host_random_walks,
    "walkpairs": linkstats.walk_cooccurrence,
    "linkpred": linkstats.host_link_prediction,
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Host-graph analytics over a pages_meta table"
    )
    p.add_argument(
        "--pages-meta", required=True, help="parquet with (url, host, links)"
    )
    p.add_argument("--output", required=True, help="output dir (one subdir per op)")
    p.add_argument(
        "--ops",
        default=",".join(OPS),
        help=f"comma list from: {','.join(OPS)} (default: all)",
    )
    p.add_argument("--master", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    ops = [o.strip() for o in args.ops.split(",") if o.strip()]
    unknown = sorted(set(ops) - set(OPS))
    if unknown:
        raise SystemExit(f"Unknown --ops {unknown}; choose from {sorted(OPS)}")
    spark = get_spark(
        app_name="wcs-graph",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    meta = spark.read.parquet(args.pages_meta)
    summary: dict[str, int] = {}
    for op in ops:
        out_dir = os.path.join(args.output, op)
        df = OPS[op](meta)
        df.write.mode("overwrite").parquet(out_dir)
        summary[op] = spark.read.parquet(out_dir).count()
    print(json.dumps({"rows": summary, "output": args.output}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
