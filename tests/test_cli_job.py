"""spark-submit job surface: flag parsing + end-to-end subprocess run."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_requires_seeds():
    from jobs.crawl import build_parser

    p = build_parser()
    args = p.parse_args(["--pages", "/x"])
    assert args.pages == "/x" and args.rounds == 3 and args.mode == "scale"


def test_cli_reference_flag_surface():
    """Every reference cli.py:50-76 flag parses (SURVEY §7 M7: same flag
    surface; fetch-shaped ones are accepted offline no-ops)."""
    from jobs.crawl import _parse_headers, build_parser

    p = build_parser()
    args = p.parse_args(
        [
            "http://a.example/",
            "--pages", "/x",
            "--workers", "8",
            "--timeout", "30",
            "--retries", "3",
            "--retry-delay", "2.0",
            "--no-proxy",
            "--validate-proxies",
            "--proxy-file", "/tmp/proxies.txt",
            "--header", "X-One: 1",
            "--header", "Accept: text/html",
            "--user-agent", "RefBot/1.0",
            "--insecure",
            "--no-progress",
            "--storage", "mongodb",
            "--mongodb-uri", "mongodb://localhost:27017",
            "--mongodb-db", "wc",
            "--mongodb-collection", "results",
        ]
    )
    assert args.workers == 8 and args.insecure and args.no_progress
    assert _parse_headers(args.header) == {"X-One": "1", "Accept": "text/html"}
    assert args.mongodb_db == "wc" and args.storage == "mongodb"
    with pytest.raises(SystemExit):
        _parse_headers(["no-colon-here"])


def test_cli_mongodb_requires_uri(capsys):
    from jobs.crawl import main

    rc = main(["http://a.example/", "--pages", "/x", "--storage", "mongodb"])
    assert rc == 2


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    from web_crawler_spark import synth

    synth.ensure_synth("0.001")
    import pyarrow.parquet as pq

    # pick real page urls with live links so round 1 has a frontier
    meta = pq.read_table(synth.synth_path("0.001", "pages_meta")).to_pandas()
    linked = meta[meta["links_count"] > 3]["url"].head(3).tolist()
    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text(
        "# seed list\n\n" + linked[0] + "\n" + linked[0] + "\n" + "\n".join(linked[1:]) + "\n"
    )
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "crawl.py"),
            "--urls-file",
            str(seeds_file),
            "--pages",
            synth.synth_path("0.001", "pages"),
            "--rounds",
            "2",
            "--mode",
            "scale",
            "--host-budget",
            "5",
            "--output",
            str(tmp_path / "results"),
            "--storage",
            "jsonl",
            "--master",
            "local[2]",
            "--shuffle-partitions",
            "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["rounds"] == 2
    assert stats["total_urls"] >= 2
    assert (tmp_path / "results").exists()


@pytest.mark.slow
def test_cli_multi_executor(tmp_path):
    """The same job on a multi-executor master (2 separate executor JVMs) —
    the sandbox stand-in for spark-submit on a cluster."""
    from web_crawler_spark import synth
    import pyarrow.parquet as pq

    synth.ensure_synth("0.001")
    meta = pq.read_table(synth.synth_path("0.001", "pages_meta")).to_pandas()
    linked = meta[meta["links_count"] > 3]["url"].head(3).tolist()
    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text("\n".join(linked) + "\n")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "crawl.py"),
            "--urls-file", str(seeds_file),
            "--pages", synth.synth_path("0.001", "pages"),
            "--rounds", "2",
            "--mode", "scale",
            "--host-budget", "5",
            "--master", "local-cluster[2,2,2048]",
            "--shuffle-partitions", "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_DRIVER_MEM": "2g"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["rounds"] == 2 and stats["successful"] >= 3


@pytest.mark.slow
def test_cli_robots_rules(tmp_path):
    """--robots-parquet threads parsed robots rules into the crawl: the
    disallowed prefix never appears in the results."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_crawler_spark import synth

    synth.ensure_synth("0.001")
    meta = pq.read_table(synth.synth_path("0.001", "pages_meta")).to_pandas()
    linked = meta[meta["links_count"] > 3]["url"].head(3).tolist()
    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text("\n".join(linked) + "\n")
    robots = pa.table(
        {
            "host": pa.array(["host0.example"]),
            "content": pa.array(["User-agent: *\nDisallow: /p/1\n"]),
        }
    )
    rp = tmp_path / "robots.parquet"
    pq.write_table(robots, str(rp))
    out_dir = tmp_path / "results"
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "crawl.py"),
            "--urls-file", str(seeds_file),
            "--pages", synth.synth_path("0.001", "pages"),
            "--rounds", "2",
            "--mode", "scale",
            "--host-budget", "5",
            "--robots-parquet", str(rp),
            "--output", str(out_dir),
            "--storage", "jsonl",
            "--master", "local[2]",
            "--shuffle-partitions", "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["total_urls"] >= 2
    import glob

    recs = []
    for p in glob.glob(str(out_dir / "*.json")):
        with open(p) as f:
            recs += [json.loads(line) for line in f if line.strip()]
    assert recs
    assert not any(r["url"].startswith("http://host0.example/p/1") for r in recs)


@pytest.mark.slow
def test_cli_spark_submit_pyfiles(tmp_path):
    """The literal north-rule invocation: ``spark-submit --py-files wcs.zip
    jobs/crawl.py`` on a multi-executor master, with the repo STRIPPED from
    PYTHONPATH and a neutral cwd — the shipped zip is the only route by
    which the driver and every executor's Python workers can import
    web_crawler_spark."""
    import shutil

    from web_crawler_spark import synth
    import pyarrow.parquet as pq

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = os.path.join(
            os.path.dirname(pyspark.__file__), "bin", "spark-submit"
        )
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_pyfiles import build

    zip_path = build(str(tmp_path / "wcs.zip"))
    synth.ensure_synth("0.001")
    meta = pq.read_table(synth.synth_path("0.001", "pages_meta")).to_pandas()
    linked = meta[meta["links_count"] > 3]["url"].head(3).tolist()
    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text("\n".join(linked) + "\n")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local-cluster[2,2,2048]",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "crawl.py"),
            "--urls-file", str(seeds_file),
            "--pages", synth.synth_path("0.001", "pages"),
            "--rounds", "2",
            "--mode", "scale",
            "--host-budget", "5",
            "--shuffle-partitions", "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),
        env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["rounds"] == 2
    assert stats["total_urls"] >= 2
    # the submit-level master must have been honored, not demoted to local
    assert stats["master"].startswith("local-cluster"), stats["master"]


def test_corpus_cli_parser_defaults():
    from jobs.corpus import _parse_rates, build_parser

    p = build_parser()
    args = p.parse_args(["--docs", "/d", "--output", "/o"])
    assert args.shards == 32 and not args.gopher and args.bench is None
    assert _parse_rates("en=500,de=200") == {"en": 500, "de": 200}
    assert _parse_rates(None) is None


@pytest.mark.slow
def test_corpus_cli_end_to_end(tmp_path):
    """The corpus-export job writes shard-partitioned parquet and honest
    stats; decontamination path exercised via the evaldocs fixture."""
    from web_crawler_spark import synth

    synth.ensure_synth("0.001")
    out_dir = str(tmp_path / "shards")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "corpus.py"),
            "--docs", synth.synth_path("0.001", "webdocs"),
            "--bench", synth.synth_path("0.001", "evaldocs"),
            "--output", out_dir,
            "--shards", "8",
            "--source-cap", "50",
            "--batch-plan",
            "--batch-size", "8",
            "--master", "local[2]",
            "--shuffle-partitions", "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["docs_in"] > 0 and 0 < stats["docs_out"] <= stats["docs_in"]
    assert stats["decontaminated"] and stats["shards"] == 8
    shards = [d for d in os.listdir(out_dir) if d.startswith("shard=")]
    assert 0 < len(shards) <= 8
    import pyarrow.parquet as pq

    t = pq.read_table(out_dir)
    assert {"doc_id", "n_pii", "text_out"} <= set(t.column_names)

    # --batch-plan: the padded-batch capacity plan covers every exported doc
    plan = pq.read_table(out_dir + "_batches").to_pandas()
    assert int(plan["n_docs"].sum()) == stats["docs_out"]
    assert (plan["n_docs"] <= 8).all()
    assert (
        plan["pad_tokens"]
        == plan["n_docs"] * plan["max_tokens"] - plan["sum_tokens"]
    ).all()
    assert stats["batch_pad_tokens"] == int(plan["pad_tokens"].sum())


def test_corpus_cli_dsir_selection(tmp_path):
    """--dsir-target-source trains weights on the declared slice and keeps
    only pool docs above the score bar; target docs always keep."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # crafted corpus: target talks astronomy; half the pool is astronomy-
    # like (kept), half cooking (dropped at min-score 1).  Lines are C4-
    # clean (>=5 words, terminal punctuation) so the cleaner keeps them.
    # unique final word per doc so the corpus LINE dedup doesn't collapse
    # the fixture to one surviving doc
    astro = "Stellar parallax measures the distant supernova light tonight num{}."
    cook = "Simmer the garlic butter sauce gently before plating dinner num{}."
    rows = []
    for i in range(8):
        rows.append((i, astro.format(i), "target"))
    for i in range(8, 16):
        rows.append((i, astro.format(i), "web"))
    for i in range(16, 24):
        rows.append((i, cook.format(i), "web"))
    docs = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "source": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        docs,
    )
    out_dir = str(tmp_path / "shards")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "corpus.py"),
            "--docs", docs,
            "--output", out_dir,
            "--shards", "2",
            "--dsir-target-source", "target",
            "--dsir-min-score", "1",
            "--master", "local[2]",
            "--shuffle-partitions", "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["dsir_target_source"] == "target"
    assert stats["dsir_target_docs"] == 8
    # 8 target + 8 astronomy pool kept; 8 cooking pool dropped
    assert stats["docs_in"] == 24 and stats["docs_out"] == 16
    kept = pq.read_table(out_dir).column("doc_id").to_pylist()
    assert sorted(kept) == list(range(16))


def test_archive_cli_revisit_round_trip(tmp_path):
    """jobs/archive.py rewrites an archive with revisit typing: duplicate
    bodies stored once, total capture count preserved, and the rewritten
    archive reads back with correct refers-to pointers."""
    from datetime import datetime, timezone

    from web_crawler_spark.sources import warc as warc_src

    ts1 = datetime(2024, 3, 1, tzinfo=timezone.utc)
    ts2 = datetime(2024, 4, 1, tzinfo=timezone.utc)
    src = str(tmp_path / "in")
    os.makedirs(src)
    warc_src.write_warc(
        [
            ("http://a.example/1", ts1, b"<html>same</html>"),
            ("http://a.example/2", ts1, b"<html>two</html>"),
        ],
        os.path.join(src, "part-00000.warc"),
    )
    warc_src.write_warc(
        [
            ("http://a.example/1", ts2, b"<html>same</html>"),  # unchanged
            ("http://a.example/2", ts2, b"<html>new</html>"),
        ],
        os.path.join(src, "part-00001.warc"),
    )
    out_dir = str(tmp_path / "dedup")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "archive.py"),
            "--warc-in", os.path.join(src, "part-*.warc"),
            "--output", out_dir,
            "--mode", "revisit",
            "--shards", "2",
            "--master", "local[2]",
            "--shuffle-partitions", "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["responses"] == 3 and stats["revisits"] == 1
    assert stats["bytes_saved"] == len(b"<html>same</html>")
    # read the rewritten archive back with the typed reader
    recs = []
    for fname in sorted(os.listdir(out_dir)):
        with open(os.path.join(out_dir, fname), "rb") as f:
            recs.extend(warc_src.parse_warc_typed(f.read()))
    assert len(recs) == 4
    by_key = {(u, t): (rt, bytes(p), ru) for u, t, p, rt, ru, _ in recs}
    assert by_key[("http://a.example/1", ts1)][0] == "response"
    rt, payload, ref = by_key[("http://a.example/1", ts2)]
    assert rt == "revisit" and payload == b"" and ref == "http://a.example/1"
    assert by_key[("http://a.example/2", ts2)] == (
        "response", b"<html>new</html>", None
    )


def test_crawl_cli_dns_ip_budget(tmp_path):
    """--dns-parquet collapses vhosts to one shared per-round budget."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (f"http://v{h}.example/p/{i}",
         f"<html><body>v{h} {i}</body></html>".encode())
        for h in "ab" for i in range(3)
    ]
    pages = str(tmp_path / "pages.parquet")
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows]),
                "html": pa.array([r[1] for r in rows], pa.binary()),
            }
        ),
        pages,
    )
    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text("\n".join(r[0] for r in rows) + "\n")
    dns = str(tmp_path / "dns.parquet")
    pq.write_table(
        pa.table(
            {
                "host": pa.array(["va.example", "vb.example"]),
                "ip": pa.array(["203.0.113.4", "203.0.113.4"]),
            }
        ),
        dns,
    )
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "crawl.py"),
            "--urls-file", str(seeds_file),
            "--pages", pages,
            "--rounds", "1",
            "--mode", "scale",
            "--host-budget", "2",
            "--dns-parquet", dns,
            "--master", "local[2]",
            "--shuffle-partitions", "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    # one shared budget of 2 across both vhosts (4 without --dns-parquet)
    assert stats["total_urls"] == 2


def test_corpus_cli_split_column(tmp_path):
    """--split-valid-pct adds a fingerprint-grain split: exact-duplicate
    texts always land on the same side."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        f"The crawl frontier budget shapes politeness decisions num{i}."
        for i in range(20)
    ]
    # two exact duplicates of text 0 (whitespace-normalized same content)
    rows = [(i, t) for i, t in enumerate(texts)]
    rows.append((100, texts[0]))
    rows.append((101, "  " + texts[0] + "  "))
    docs = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        docs,
    )
    out_dir = str(tmp_path / "shards")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "corpus.py"),
            "--docs", docs,
            "--output", out_dir,
            "--shards", "2",
            "--split-valid-pct", "30",
            "--master", "local[2]",
            "--shuffle-partitions", "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    t = pq.read_table(out_dir).to_pandas()
    assert set(t["split"]) <= {"train", "valid"}
    # note: corpus line-dedup may drop duplicate docs entirely; any
    # surviving copies of the same content must share a side
    purity = t.groupby(t["text_out"])["split"].nunique()
    assert (purity == 1).all()
    assert (t["split"] == "valid").any() or len(t) < 5  # 30% bucket plausible


def test_archive_cli_cdx_mode(tmp_path):
    """jobs/archive.py --mode cdx writes the sorted lookup index."""
    from datetime import datetime, timezone

    from web_crawler_spark.sources import warc as warc_src

    ts = datetime(2024, 3, 1, tzinfo=timezone.utc)
    src = str(tmp_path / "in")
    os.makedirs(src)
    warc_src.write_warc(
        [
            ("http://b.example/p/2", ts, b"two"),
            ("http://a.example/p/1", ts, b"one"),
        ],
        os.path.join(src, "part-00000.warc"),
    )
    out_dir = str(tmp_path / "cdx")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "archive.py"),
            "--warc-in", os.path.join(src, "part-*.warc"),
            "--output", out_dir,
            "--mode", "cdx",
            "--shards", "2",
            "--master", "local[2]",
            "--shuffle-partitions", "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["mode"] == "cdx" and stats["captures"] == 2
    import glob

    lines = []
    for p in sorted(glob.glob(os.path.join(out_dir, "part-*"))):
        lines += open(p).read().splitlines()
    keys = [ln.split(" ", 1)[0] for ln in lines if ln]
    assert keys == sorted(keys) == ["example,a)/p/1", "example,b)/p/2"]


def test_read_pages_formats(spark, tmp_path):
    """parquet path unchanged; `table` reads a catalog table; `iceberg`
    without the runtime jar raises the documented error instead of silently
    degrading to a snapshot-less read; unknown format rejected."""
    import pytest

    from web_crawler_spark.sources import pages as pages_src

    df = spark.createDataFrame(
        [("http://a.example/", None, None, "t", "en")],
        pages_src.PAGES_SCHEMA,
    )
    p = str(tmp_path / "pg.parquet")
    df.write.parquet(p)
    assert pages_src.read_pages(spark, p).count() == 1
    df.createOrReplaceTempView("pages_tbl_fmt")
    got = pages_src.read_pages(spark, "pages_tbl_fmt", fmt="table")
    assert got.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert got.count() == 1
    with pytest.raises(RuntimeError, match="iceberg"):
        pages_src.read_pages(spark, "cat.db.pages", fmt="iceberg")
    with pytest.raises(ValueError, match="unknown pages format"):
        pages_src.read_pages(spark, p, fmt="orc2")


def test_graph_cli_end_to_end(tmp_path):
    """The graph-analytics job writes one parquet per requested op over a
    pages_meta table and reports honest row counts; unknown ops fail
    loudly at parse time."""
    from web_crawler_spark import synth

    synth.ensure_synth("0.001")
    out_dir = str(tmp_path / "graph")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "graph.py"),
            "--pages-meta", synth.synth_path("0.001", "pages_meta"),
            "--output", out_dir,
            "--ops", "components,bowtie,richclub,salsa",
            "--master", "local[2]",
            "--shuffle-partitions", "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert set(stats["rows"]) == {"components", "bowtie", "richclub", "salsa"}
    assert all(n > 0 for n in stats["rows"].values())
    # bow-tie and components cover the same host set
    assert stats["rows"]["bowtie"] == stats["rows"]["components"]
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(out_dir, "bowtie"))
    assert {"host", "region"} == set(t.column_names)

    from jobs.graph import build_parser, main

    p = build_parser()
    assert "components" in p.parse_args(
        ["--pages-meta", "/x", "--output", "/y"]
    ).ops
    try:
        main(["--pages-meta", "/x", "--output", "/y", "--ops", "nope"])
        raise AssertionError("unknown op must SystemExit")
    except SystemExit as ex:
        assert "nope" in str(ex)


def test_archive_cli_chunks_and_frontcode_modes(tmp_path):
    """jobs/archive.py --mode chunks writes the CDC chunk relation + a
    dedup summary whose saved bytes reflect the duplicated payload;
    --mode frontcode writes the per-host prefix-saving table."""
    from datetime import datetime, timezone

    import pyarrow.parquet as pq

    from web_crawler_spark.sources import warc as warc_src

    ts = datetime(2024, 3, 1, tzinfo=timezone.utc)
    src = str(tmp_path / "in")
    os.makedirs(src)
    body = b"<html>" + b"shared content block " * 40 + b"</html>"
    warc_src.write_warc(
        [
            ("http://a.example/p/1", ts, body),
            ("http://a.example/p/2", ts, body),  # byte-identical dup
            ("http://a.example/q", ts, b"<html>unique</html>"),
        ],
        os.path.join(src, "part-00000.warc"),
    )

    out_dir = str(tmp_path / "chunks")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "archive.py"),
            "--warc-in", os.path.join(src, "part-*.warc"),
            "--output", out_dir,
            "--mode", "chunks",
            "--master", "local[2]",
            "--shuffle-partitions", "4",
        ],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["mode"] == "chunks" and stats["n_docs"] == 3
    # the duplicated body dedups to ~half its stored bytes
    assert stats["unique_bytes"] < stats["total_bytes"]
    assert stats["saved_ppm"] >= 400_000
    t = pq.read_table(out_dir)
    assert t.num_rows == stats["n_chunks"]

    out_dir2 = str(tmp_path / "fc")
    out2 = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "archive.py"),
            "--warc-in", os.path.join(src, "part-*.warc"),
            "--output", out_dir2,
            "--mode", "frontcode",
            "--master", "local[2]",
            "--shuffle-partitions", "4",
        ],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    stats2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert stats2["mode"] == "frontcode" and stats2["host_subtrees"] == 1
    # example,a)/p/1 and )/p/2 and )/q share prefixes
    assert stats2["bytes_shared"] > 0


def test_graph_cli_embedding_data_ops(tmp_path):
    """The graph job also serves the embedding-data ops: anf (registers),
    walks (corpus), walkpairs (co-occurrence) — walks and pairs are
    consistent (every pair's hosts appear in the corpus)."""
    import pyarrow.parquet as pq

    from web_crawler_spark import synth

    synth.ensure_synth("0.001")
    out_dir = str(tmp_path / "g2")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "graph.py"),
            "--pages-meta", synth.synth_path("0.001", "pages_meta"),
            "--output", out_dir,
            "--ops", "anf,walks,walkpairs",
            "--master", "local[2]",
            "--shuffle-partitions", "4",
        ],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["rows"]["anf"] == 5  # depths 0..4
    assert stats["rows"]["walks"] > 0 and stats["rows"]["walkpairs"] > 0
    hosts_in_walks = set(
        pq.read_table(os.path.join(out_dir, "walks")).column("host").to_pylist()
    )
    pair_hosts = set(
        pq.read_table(os.path.join(out_dir, "walkpairs")).column("host").to_pylist()
    )
    assert pair_hosts <= hosts_in_walks


def test_media_cli_parser_defaults():
    from jobs.media import build_parser

    p = build_parser()
    a = p.parse_args(["--media", "m.parquet", "--output", "/tmp/o"])
    assert a.thumbs is None and not a.dedup and not a.pairs


def test_media_cli_end_to_end(tmp_path):
    """The media job writes phash/near_pairs/image_text/thumbs/audio/
    scenes from the real-codec operators and prints honest stats."""
    from web_crawler_spark import synth

    synth.ensure_synth("0.001")
    out_dir = str(tmp_path / "media_out")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "media.py"),
            "--media", synth.synth_path("0.001", "media"),
            "--output", out_dir,
            "--dedup", "--pairs", "--thumbs", "24x18",
            "--audio-segments", "--scenes",
            "--master", "local[2]",
            "--shuffle-partitions", "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["n_media"] == 200 and stats["n_kind_mismatch"] == 0
    assert stats["n_hashed"] == 200  # every real payload decodes
    assert stats["n_exact_dup_rows"] >= 2  # the filter-variant re-encodes
    assert stats["n_pairs_ok"] > 0 and stats["n_captions"] >= stats["n_pairs_ok"]
    assert stats["n_thumbs"] > 0 and stats["n_audio_segments"] > 0
    assert stats["n_scene_frames"] > 0 and stats["n_cuts"] > 0
    import pyarrow.parquet as pq

    th = pq.read_table(os.path.join(out_dir, "thumbs")).to_pandas()
    from web_crawler_spark.functions import codecs

    got = th[th["thumb"].notna()].iloc[0]["thumb"]
    w, h, ch, _img = codecs.decode_png(bytes(got))
    assert (w, h) == (24, 18)  # thumbnails are real PNGs at the asked size


@pytest.mark.slow
def test_media_cli_mixed_validity_payloads(tmp_path):
    """VERDICT r4 item 5: the media job on a table salted with poison
    payloads — truncated IDAT, CRC-recomputed zlib garbage, zero-length
    mdat, a WAV with a lying fmt length, random bytes — must finish rc=0
    (no task failures) and surface the skips in the stats JSON line."""
    import random
    import struct
    import zlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_crawler_spark.functions import codecs

    rng = random.Random(11)
    rows = []
    # 6 valid PNGs
    for i in range(6):
        px = bytes(rng.getrandbits(8) for _ in range(16 * 12 * 3))
        rows.append((i, "image", codecs.encode_png(px, 16, 12, 3), 16, 12, None))
    # 2 valid WAVs + 1 valid video
    for i in range(6, 8):
        # loud/quiet 64-sample blocks so the VAD finds active runs
        samples = [
            rng.randrange(25000, 32000) * (-1) ** j if (j // 64) % 2 == 0 else rng.randrange(-40, 40)
            for j in range(800)
        ]
        rows.append((i, "audio", codecs.encode_wav(samples, sample_rate=8000, bits=16), None, None, 0.1))
    frames = [codecs.encode_png(bytes(rng.getrandbits(8) for _ in range(8 * 8 * 3)), 8, 8, 3) for _ in range(3)]
    rows.append((8, "video", codecs.encode_bmff(frames), 8, 8, 0.2))
    good_images, good_total = 6, 9  # 6 png + 2 wav + 1 bmff all decode
    # poison payloads, declared as media kinds
    px = bytes(rng.getrandbits(8) for _ in range(16 * 12 * 3))
    full = codecs.encode_png(px, 16, 12, 3)
    rows.append((100, "image", full[: len(full) // 2], 16, 12, None))  # truncated IDAT
    ihdr = struct.pack(">IIBBBBB", 16, 12, 8, 2, 0, 0, 0)
    crc_valid_garbage = (
        codecs.PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", b"\x00definitely-not-zlib\xff\xfe")
        + codecs._chunk(b"IEND", b"")
    )
    rows.append((101, "image", crc_valid_garbage, 16, 12, None))
    badcrc = bytearray(full)
    badcrc[len(full) // 2] ^= 0xFF
    rows.append((102, "image", bytes(badcrc), 16, 12, None))
    rows.append((103, "image", b"\xff\xd8random not an image", 16, 12, None))
    # zero-length mdat video + truncated box walk
    ftyp = struct.pack(">I", 24) + b"ftyp" + b"isom" + struct.pack(">I", 0) + b"isom" + b"mjpg"
    rows.append((104, "video", ftyp + struct.pack(">I", 8) + b"mdat", None, None, 0.0))
    rows.append((105, "video", ftyp + struct.pack(">I", 999) + b"mdat" + b"xx", None, None, 0.0))
    # WAV whose fmt chunk length lies past EOF
    rows.append((106, "audio", b"RIFF" + struct.pack("<I", 24) + b"WAVE" + b"fmt " + struct.pack("<I", 16) + b"\x01\x00", None, None, 0.1))
    n_total = len(rows)

    tbl = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "kind": pa.array([r[1] for r in rows], pa.string()),
        "payload": pa.array([r[2] for r in rows], pa.binary()),
        "width": pa.array([r[3] for r in rows], pa.int32()),
        "height": pa.array([r[4] for r in rows], pa.int32()),
        "duration_s": pa.array([r[5] for r in rows], pa.float64()),
    })
    media_pq = str(tmp_path / "media.parquet")
    pq.write_table(tbl, media_pq)
    out_dir = str(tmp_path / "out")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "media.py"),
            "--media", media_pq,
            "--output", out_dir,
            "--dedup", "--thumbs", "8x6", "--audio-segments", "--scenes",
            "--master", "local[2]",
            "--shuffle-partitions", "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "Task failed" not in out.stderr and "SparkException" not in out.stderr
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["n_media"] == n_total
    # every valid payload hashes; every poison one skips (null), counted
    assert stats["n_hashed"] == good_total
    assert stats["n_decode_failed"] == n_total - good_total
    # thumbs exist only for decodable images; audio/scene rows only from
    # the valid fixtures (zero-length mdat yields zero frames, not a crash)
    assert stats["n_thumbs"] == good_images
    assert stats["n_audio_segments"] > 0 and stats["n_scene_frames"] > 0
