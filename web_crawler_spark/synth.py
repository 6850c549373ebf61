"""Deterministic synthetic Common-Crawl-style fixtures (FIXTURES.md).

The driver's ``documents`` table is a generic text table; the crawl engine's
mandated input shape (BASELINE.json ``input_hint``) is
``(url string, warc_ts timestamp, html binary, text string, lang string)``.
This module synthesizes that table — plus seeds, raw-url candidates, a media
table for the multimodal path, and golden ``expected_crawl`` output — as a
pure function of (scale, seed=42).  No wall clock, no network, no external
data; every live link target exists in ``pages`` (closed link graph), one hot
host carries ~50% of rows to exercise skew handling.

Artifacts land under ``<repo>/.synthdata/sf{sf}/`` with a version marker so
regeneration is idempotent and cheap.  DuckDB oracles read the same parquet
files via absolute ``read_parquet`` paths.
"""

from __future__ import annotations

import hashlib
import os
import random
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from . import refsim

SYNTH_VERSION = "v31"  # v31: GIF image rows (i%15==9, interlace/transparency alternating). v30: JPEG image rows (i%15==6, alternating 4:4:4/4:2:0) + every other dup-anchor re-encode stored as JPEG of the SAME pixels (cross-format pixel-dedup property); other tables byte-identical to v29
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SYNTH_ROOT = os.environ.get("SPARK_GRAFT_SYNTH_DIR", os.path.join(REPO_ROOT, ".synthdata"))

# pages per scale factor (lineitem is ~6M rows/sf in TPC-H terms; we key on
# the driver's sf names)
_SF_PAGES = {"0.001": 1_000, "0.01": 10_000, "0.1": 100_000}

_WORDS = (
    "the quick brown fox jumps over lazy dog crawl frontier spark shuffle "
    "partition parquet arrow vector batch scan filter join window budget "
    "politeness robots fetch parse link anchor page host depth seed queue "
    "hash bloom dedup snapshot lineage metric round barrier stage executor "
    "token text corpus language quality score embed neighbor cluster shard"
).split()

_NON_ASCII = ["café", "naïve", "数据", "điểm", "straße", "日本語", "tiếng", "việt"]
_LANGS = ["en", "vi", "de", "zh"]


def sf_name_of(sf_dir: str) -> str:
    """'/root/testdata/sf0.01' -> '0.01'."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return base[2:] if base.startswith("sf") else base


def synth_dir(sf: str) -> str:
    return os.path.join(SYNTH_ROOT, f"sf{sf}")


def synth_path(sf: str, table: str) -> str:
    return os.path.join(synth_dir(sf), f"{table}.parquet")


def _host_for(rng: random.Random, n_hosts: int) -> int:
    # hot-host skew: host 0 gets ~50% of pages (FIXTURES.md §1)
    if rng.random() < 0.5:
        return 0
    return rng.randint(1, n_hosts - 1)


def _canonical_url(host_idx: int, page_idx: int) -> str:
    return f"http://host{host_idx}.example/p/{page_idx}"


def _messy_variant(rng: random.Random, url: str) -> str:
    """An absolute-but-non-canonical form that canonicalizes back to `url`."""
    kind = rng.randint(0, 3)
    scheme, rest = url.split("://", 1)
    host, path = rest.split("/", 1)
    if kind == 0:
        return f"HTTP://{host.upper()}/{path}"
    if kind == 1:
        return f"{scheme}://{host}:80/{path}"
    if kind == 2:
        # percent-encode an unreserved char in the path ('p' -> %70)
        return f"{scheme}://{host}/" + path.replace("p/", "%70/", 1)
    return f"{scheme}://{host}/a/../{path}"


def _make_html(
    rng: random.Random, page_idx: int, hrefs: list[str], lang: str
) -> str:
    parts = ["<html><head>"]
    has_title = rng.random() < 0.9
    title = ""
    if has_title:
        title = f"Page {page_idx} " + " ".join(rng.sample(_WORDS, 3))
        parts.append(f"<title>{title}</title>")
    if rng.random() < 0.6:
        parts.append("<style>body { color: #333; }\n.x { font: 10px; }</style>")
    parts.append("</head><body>")
    if rng.random() < 0.7:
        parts.append("<script>var x = 1;\nconsole.log('never in text');</script>")
    n_paras = rng.randint(2, 6)
    for _ in range(n_paras):
        words = [rng.choice(_WORDS) for _ in range(rng.randint(20, 60))]
        if rng.random() < 0.3:
            words.insert(rng.randrange(len(words)), rng.choice(_NON_ASCII))
        text = " ".join(words)
        # two-space phrase runs exercise the reference's "  " split
        if rng.random() < 0.5:
            cut = rng.randrange(1, len(text))
            text = text[:cut] + "  " + text[cut:]
        if rng.random() < 0.2:
            text += "   trailing  run"
        parts.append(f"<p>{text}</p>")
    for i, href in enumerate(hrefs):
        parts.append(f'<p>see <a href="{href}">link {i}</a> here</p>')
    parts.append("</body></html>")
    return "\n".join(parts)


def _gen_pages(sf: str):
    n = _SF_PAGES[sf]
    n_hosts = max(8, int(n ** 0.5) // 2)
    rng = random.Random(42)
    epoch = datetime(2024, 1, 1, tzinfo=timezone.utc)

    host_idx = [_host_for(rng, n_hosts) for _ in range(n)]
    urls = [_canonical_url(host_idx[i], i) for i in range(n)]

    rows_url, rows_ts, rows_html, rows_text, rows_lang = [], [], [], [], []
    meta_title, meta_links, meta_lcount, meta_host = [], [], [], []
    for i in range(n):
        n_links = rng.randint(0, 25) if rng.random() < 0.9 else 0
        hrefs = []
        for _ in range(n_links):
            r = rng.random()
            target = rng.randrange(n)
            if r < 0.70:
                hrefs.append(urls[target])  # canonical live link
            elif r < 0.82:
                hrefs.append(_messy_variant(rng, urls[target]))  # live after canon
            elif r < 0.92:
                hrefs.append(f"/p/{target}")  # relative -> dead in both modes
            else:
                hrefs.append(f"http://dead{rng.randrange(50)}.example/x/{target}")
        lang = rng.choice(_LANGS)
        html = _make_html(rng, i, hrefs, lang)
        parsed = refsim.parse_html(urls[i], html)
        rows_url.append(urls[i])
        rows_ts.append(epoch + timedelta(seconds=i * 37))
        rows_html.append(html.encode("utf-8"))
        rows_text.append(parsed["text"])
        rows_lang.append(lang)
        meta_title.append(parsed["title"])
        meta_links.append(parsed["links"])
        meta_lcount.append(parsed["links_count"])
        meta_host.append(f"host{host_idx[i]}.example")

    pages = pa.table(
        {
            "url": pa.array(rows_url, pa.string()),
            "warc_ts": pa.array(rows_ts, pa.timestamp("us", tz="UTC")),
            "html": pa.array(rows_html, pa.binary()),
            "text": pa.array(rows_text, pa.string()),
            "lang": pa.array(rows_lang, pa.string()),
        }
    )
    pages_meta = pa.table(
        {
            "url": pa.array(rows_url, pa.string()),
            "host": pa.array(meta_host, pa.string()),
            "title": pa.array(meta_title, pa.string()),
            "text": pa.array(rows_text, pa.string()),
            "links_count": pa.array(meta_lcount, pa.int32()),
            "links": pa.array(meta_links, pa.list_(pa.string())),
        }
    )
    return pages, pages_meta, rows_url, rng


def _gen_seeds(rng: random.Random, urls: list[str], sf: str):
    n = len(urls)
    n_seeds = max(12, n // 100)
    seed_urls: list[str] = []
    for k in range(n_seeds):
        r = rng.random()
        if r < 0.75:
            seed_urls.append(urls[rng.randrange(n)])
        elif r < 0.85 and seed_urls:
            seed_urls.append(rng.choice(seed_urls))  # duplicate (dedup path)
        else:
            seed_urls.append(f"http://dead{rng.randrange(50)}.example/seed/{k}")
    return pa.table(
        {
            "seed_idx": pa.array(range(len(seed_urls)), pa.int64()),
            "url": pa.array(seed_urls, pa.string()),
        }
    )


def _gen_candidates(rng: random.Random, urls: list[str]):
    """Raw candidate urls + expected canonical form (urlnorm oracle)."""
    raws, expected = [], []
    fixed = [
        ("HTTP://Host0.Example:80/p/0", "http://host0.example/p/0"),
        ("https://HOST1.example:443/A/../p/%41", "https://host1.example/p/A"),
        ("http://host2.example", "http://host2.example/"),
        ("http://host2.example/p/./3", "http://host2.example/p/3"),
        ("http://host2.example/p/5#frag", "http://host2.example/p/5"),
        ("http://host2.example/p%2F6?q=%7e+x", "http://host2.example/p%2F6?q=~+x"),
        ("http://user:pw@Host3.example:8080/x", "http://user:pw@host3.example:8080/x"),
        ("/relative/only", None),
        ("not a url", None),
        ("", None),
    ]
    for raw, exp in fixed:
        raws.append(raw)
        expected.append(exp)
    for _ in range(min(2000, len(urls))):
        u = urls[rng.randrange(len(urls))]
        if rng.random() < 0.5:
            raws.append(u)
            expected.append(u)
        else:
            raws.append(_messy_variant(rng, u))
            expected.append(u)
    return pa.table(
        {
            "cand_id": pa.array(range(len(raws)), pa.int64()),
            "raw": pa.array(raws, pa.string()),
            "expected": pa.array(expected, pa.string()),
        }
    )


_MAGIC = {"image": b"\x89PNG\r\n\x1a\n", "audio": b"RIFF", "video": b"\x00\x00\x00\x18ftyp"}


# -- webdocs: multi-line web-text documents for the corpus-filter layer ------
#
# The driver's documents table is single-line word bags; the C4/Gopher-style
# line filters (functions/webtext.py) need documents with real line structure:
# terminal punctuation, boilerplate, syndicated lines shared across docs,
# in-doc repetition, PII.  Generated deterministically like everything else.

_BOILERPLATE = [
    "This website uses cookies to improve your browsing experience today.",
    "Please enable JavaScript to view the full content of this page.",
    "Copyright 2024 Example Corp and affiliates with all rights reserved.",
    "Sign up for our weekly newsletter to receive updates and offers.",
    "Home | About | Contact",
]

_SF_WEBDOCS = {"0.001": 400, "0.01": 4000, "0.1": 40000}


# Gopher-gate stop words (functions/webtext.STOP_WORDS): injected into a
# fraction of sentences so n_stop_hits actually varies across documents.
_STOP_INJECT = ("the", "be", "to", "of", "and", "that", "have", "with")


def _sentence(rng: random.Random, n_words: int, terminal: str = ".") -> str:
    words = [rng.choice(_WORDS) for _ in range(n_words)]
    if rng.random() < 0.08:
        words[rng.randrange(n_words)] = rng.choice(_NON_ASCII)
    for _ in range(rng.randrange(3)):
        words.insert(rng.randrange(len(words) + 1), rng.choice(_STOP_INJECT))
    return (" ".join(words)).capitalize() + terminal


def _gen_webdocs(rng: random.Random, sf: str):
    n = _SF_WEBDOCS[sf]
    syndicated = [_sentence(rng, rng.randint(6, 14)) for _ in range(40)]
    texts: list[str] = []
    # fixed boundary docs first — they pin oracle edge semantics in the
    # graded data itself (empty doc, blank lines, exact word-count / terminal
    # punctuation boundaries, PII at string edges, full-doc duplicate pair)
    fixed = [
        "",
        "\n",
        "One two three four five.",  # exactly MIN_LINE_WORDS, kept
        "One two three four.",  # one short, dropped
        'He said the frontier was "done"?',
        "a\tb\tc\td\te.",  # tabs are \s+ separators
        "user0@example0.com",
        "Call 555-123-4567 now for the crawl budget hotline offer.",
        "Shared line for the dedup boundary case example sentence one.\n"
        "Shared line for the dedup boundary case example sentence one.",
        "SHARED line for the dedup boundary case example sentence one.",
        "Trailing newline line one two three four five six seven.\n",
        # Gopher-gate boundary docs (functions/webtext.gopher_quality)
        "the and " + " ".join(["crawl"] * 48) + ".",  # exactly 50 words, ok
        "the and " + " ".join(["crawl"] * 47) + ".",  # 49 words -> too short
        "- bullet one two three\n- bullet four five six\n* bullet seven",
        "Read more about the crawl frontier budget and politeness today...",
        "### # # markdown heading hash soup # # ###",  # symbol-heavy
    ]
    texts.extend(fixed)
    for i in range(len(fixed), n):
        lines: list[str] = []
        for _ in range(rng.randint(3, 10)):
            r = rng.random()
            if r < 0.12:
                lines.append(rng.choice(_BOILERPLATE))
            elif r < 0.25:
                lines.append(rng.choice(syndicated))
            elif r < 0.33:
                lines.append(" ".join(rng.choice(_WORDS) for _ in range(rng.randint(1, 4))).capitalize())
            elif r < 0.42:
                who = rng.randrange(500)
                phone = f"{200 + rng.randrange(700)}-{100 + rng.randrange(900)}-{1000 + rng.randrange(9000)}"
                lines.append(
                    _sentence(rng, rng.randint(5, 9), terminal="")
                    + f" at user{who}@example{rng.randrange(9)}.com or {phone}."
                )
            elif r < 0.50:
                lines.append(
                    rng.choice(("- ", "* "))
                    + _sentence(rng, rng.randint(2, 6), terminal="")
                )
            elif r < 0.55:
                lines.append(_sentence(rng, rng.randint(4, 9), terminal="") + "...")
            else:
                lines.append(_sentence(rng, rng.randint(5, 18), rng.choice("..!?")))
        if rng.random() < 0.25 and lines:
            dup = rng.choice(lines)
            for _ in range(rng.randint(1, 3)):
                lines.insert(rng.randrange(len(lines) + 1), dup)
        if rng.random() < 0.15:
            lines.append(("buy now " * rng.randint(6, 12)).strip() + ".")
        texts.append("\n".join(lines))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    return tbl, syndicated


def _gen_evaldocs(syndicated: list[str], sf: str):
    """Benchmark/eval texts for the decontamination op (webtext.decontaminate).

    A fraction of the eval items are syndicated sentences that also appear in
    many webdocs — real contamination with known overlap — plus boundary
    items (too short for one n-gram, empty, repeated-token spam) and fresh
    sentences that contaminate nothing.  Drawn from a dedicated RNG so the
    webdocs fixture bytes are identical to v10."""
    rng = random.Random(f"evaldocs-{sf}")
    texts: list[str] = []
    texts.extend(syndicated[:8])  # leaked into the corpus by construction
    # multi-sentence eval item: one leaked sentence inside fresh context
    texts.append(syndicated[10] + " " + _sentence(rng, 12))
    texts.append("short eval question here?")  # < n words -> zero grams
    texts.append("")
    # repeated-token spam: matches webdocs' "buy now" tail lines
    texts.append(("buy now " * 8).strip() + ".")
    # case boundary: uppercase copy of a leaked sentence (lowercased grams
    # must still match)
    texts.append(syndicated[12].upper())
    for _ in range(12):  # fresh items -> no contamination
        texts.append(_sentence(rng, rng.randint(9, 20), rng.choice(".?")))
    return pa.table(
        {
            "eval_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


_SF_WEBURLS = {"0.001": 600, "0.01": 6000, "0.1": 60000}

_URL_BLOCKLIST_SYNTH = ("casino", "gambling", "adultsite")
_URL_MEDIA_EXTS = ("jpg", "jpeg", "png", "gif", "css", "js", "pdf", "mp4", "zip", "ico", "svg", "woff")


def _gen_pages_prev(pages_tbl: pa.Table, sf: str):
    """Previous crawl snapshot (30 days older) for the snapshot-diff op:
    ~15% of current URLs are missing there ('added' since), ~25% of the
    shared URLs carry different content ('changed' — html mutated and text
    re-derived through refsim so html/text stay consistent), and a tail of
    retired '/old/' URLs exists only in the previous snapshot ('gone').
    Dedicated RNG: every v11 fixture's bytes are unchanged."""
    rng = random.Random(f"pagesprev-{sf}")
    urls = pages_tbl.column("url").to_pylist()
    tss = pages_tbl.column("warc_ts").to_pylist()
    htmls = pages_tbl.column("html").to_pylist()
    texts = pages_tbl.column("text").to_pylist()
    langs = pages_tbl.column("lang").to_pylist()
    delta = timedelta(days=30)
    p_url, p_ts, p_html, p_text, p_lang = [], [], [], [], []
    for i in range(len(urls)):
        r = rng.random()
        if r < 0.15:
            continue  # first seen after the previous snapshot -> 'added'
        html, text = htmls[i], texts[i]
        if r < 0.40:  # content has changed since the previous snapshot
            extra = " ".join(rng.choice(_WORDS) for _ in range(12))
            html_s = html.decode("utf-8").replace(
                "</body>", f"<p>updated: {extra}.</p></body>", 1
            )
            parsed = refsim.parse_html(urls[i], html_s)
            html, text = html_s.encode("utf-8"), parsed["text"]
        p_url.append(urls[i])
        p_ts.append(tss[i] - delta)
        p_html.append(html)
        p_text.append(text)
        p_lang.append(langs[i])
    # retired URLs: present only in the previous snapshot -> 'gone'
    epoch_prev = datetime(2024, 1, 1, tzinfo=timezone.utc) - delta
    for j in range(max(3, len(urls) // 20)):
        u = f"http://host{rng.randrange(8)}.example/old/{j}"
        html_s = _make_html(rng, 10**9 + j, [], "en")
        parsed = refsim.parse_html(u, html_s)
        p_url.append(u)
        p_ts.append(epoch_prev + timedelta(seconds=j * 53))
        p_html.append(html_s.encode("utf-8"))
        p_text.append(parsed["text"])
        p_lang.append("en")
    return pa.table(
        {
            "url": pa.array(p_url, pa.string()),
            "warc_ts": pa.array(p_ts, pa.timestamp("us", tz="UTC")),
            "html": pa.array(p_html, pa.binary()),
            "text": pa.array(p_text, pa.string()),
            "lang": pa.array(p_lang, pa.string()),
        }
    )


def _gen_weburls(sf: str):
    """Realistic crawl-discovered URLs for the URL-level quality gate
    (functions/urlfilter.py): clean article URLs, media/asset extensions,
    tracking-parameter spam, over-long URLs, blocklisted hosts/paths, and
    mixed-case variants.  Dedicated RNG (fixture-stable vs v10)."""
    rng = random.Random(f"weburls-{sf}")
    n = _SF_WEBURLS[sf]
    urls: list[str] = [
        # pinned boundary rows
        "http://host0.example/articles/a-perfectly-fine-story.html",
        "http://host1.example/img/banner.JPG",  # extension case-folding
        "http://host2.example/p/1?a=1&b=2&c=3&d=4&e=5",  # param spam
        "http://host3.example/" + "seg/" * 60 + "deep.html",  # over-long
        "http://casino.example/win-big-now",  # blocklisted host
        "http://host4.example/play/GAMBLING/tips",  # blocklisted path, mixed case
        "http://host5.example/style.css?v=3",  # ext before query string
        "http://host6.example/",  # no path, no ext
        "http://host7.example/download.tar.gz",  # unknown compound ext
    ]
    for i in range(len(urls), n):
        h = rng.randrange(200)
        r = rng.random()
        if r < 0.55:
            slug = "-".join(rng.choice(_WORDS) for _ in range(rng.randint(2, 6)))
            urls.append(f"http://host{h}.example/articles/{i}-{slug}.html")
        elif r < 0.70:
            ext = rng.choice(_URL_MEDIA_EXTS)
            urls.append(f"http://host{h}.example/assets/{i}.{ext}")
        elif r < 0.80:
            params = "&".join(
                f"{rng.choice(('utm_source', 'utm_medium', 'ref', 'sessionid', 'fbclid', 'q'))}={rng.randrange(999)}"
                for _ in range(rng.randint(1, 6))
            )
            urls.append(f"http://host{h}.example/p/{i}?{params}")
        elif r < 0.86:
            urls.append(
                f"http://host{h}.example/" + "x" * rng.randint(150, 260) + f"/{i}"
            )
        elif r < 0.92:
            bad = rng.choice(_URL_BLOCKLIST_SYNTH)
            urls.append(f"http://host{h}.example/{bad}/offer-{i}")
        else:
            urls.append(f"HTTP://Host{h}.Example/MiXeD/{i}.HtMl")
    return pa.table(
        {
            "url_id": pa.array(range(len(urls)), pa.int64()),
            "url": pa.array(urls, pa.string()),
        }
    )


def _media_image_pixels(w: int, h: int, body: bytes, i: int) -> bytes:
    """Deterministic RGB pixels: a position gradient plus payload-derived
    noise (``body`` is the preserved shared-rng draw — see _gen_media)."""
    import numpy as np

    noise = np.resize(np.frombuffer(body, dtype=np.uint8), w * h * 3).astype(np.int64)
    idx = np.arange(w * h * 3, dtype=np.int64)
    px = (idx * 7 // 3 + i * 31 + noise) % 256
    return px.astype(np.uint8).tobytes()


def _media_audio_samples(body: bytes, i: int) -> "list[int]":
    """8-bit PCM with frame-aligned loud square-wave bursts (mean magnitude
    64..127 — active for the VAD at threshold 64) separated by near-silent
    stretches (magnitude <= 2), so segmentation finds real runs."""
    from web_crawler_spark.functions.multimodal import AUDIO_FRAME

    n_frames = 12 + (i % 24)
    samples: "list[int]" = []
    for f in range(n_frames):
        b = body[f % len(body)]
        if b >= 128:  # loud frame: alternate 128+-a, a in 64..127
            a = 64 + b % 64
            for s in range(AUDIO_FRAME):
                samples.append(128 + a if s % 2 == 0 else 128 - a)
        else:  # near-silence
            for s in range(AUDIO_FRAME):
                samples.append(128 + (body[(f + s) % len(body)] % 5) - 2)
    return samples


def _gen_pages_micro_nested(pages_meta_tbl: pa.Table, sf: str):
    """(url, html) — NESTED schema.org microdata variants for the round-4
    HTML-walk extractor (html_parse.extract_microdata_nested): Product ->
    offers(Offer) -> priceSpecification chains, Person -> address
    (PostalAddress), multi-name itemprops, meta/img/a/time property tags,
    props-less leaf items, self-closed itemscopes, and pages with no
    microdata at all.  Dedicated RNG; all v27 tables byte-identical."""
    rng = random.Random(f"pages_micro_nested-{sf}")
    urls = pages_meta_tbl.column("url").to_pylist()
    r_url, r_html = [], []
    for j, u in enumerate(urls):
        roll = rng.random()
        if roll < 0.45:
            continue  # no microdata page
        blocks = []
        for _ in range(rng.randint(1, 2)):
            kind = rng.random()
            if kind < 0.45:
                price = f"{rng.randrange(1, 500)}.{rng.randrange(100):02d}"
                spec = (
                    '<div itemprop="priceSpecification" itemscope>'
                    f'<span itemprop="price">{price}</span>'
                    '<meta itemprop="priceCurrency" content="USD"></div>'
                    if rng.random() < 0.6
                    else ""
                )
                offer = (
                    '<div itemprop="offers" itemscope '
                    'itemtype="https://schema.org/Offer">'
                    f'<link itemprop="availability" href="https://schema.org/InStock">{spec}'
                    "</div>"
                )
                blocks.append(
                    '<div itemscope itemtype="https://schema.org/Product">'
                    f'<span itemprop="name">{rng.choice(_WORDS)} {j}</span>'
                    f'<img itemprop="image" src="/img/{j}.png">{offer}'
                    f'<span itemprop="sku mpn">SK{j % 97}</span></div>'
                )
            elif kind < 0.8:
                addr = (
                    '<div itemprop="address" itemscope '
                    'itemtype="https://schema.org/PostalAddress">'
                    f'<span itemprop="addressLocality">{rng.choice(_WORDS)}</span>'
                    f'<meta itemprop="postalCode" content="{rng.randrange(10000, 99999)}">'
                    "</div>"
                )
                time_tag = (
                    f'<time itemprop="birthDate" datetime="19{rng.randrange(50, 99)}'
                    f'-0{rng.randrange(1, 9)}-1{rng.randrange(0, 9)}">a date</time>'
                )
                blocks.append(
                    '<div itemscope itemtype="https://schema.org/Person">'
                    f'<span itemprop="name">{rng.choice(_WORDS)} '
                    f"{rng.choice(_WORDS)}</span>"
                    f'<a itemprop="url" href="https://p{j}.example/">home &amp; page</a>'
                    f"{addr}{time_tag}</div>"
                )
            elif kind < 0.92:
                # props-less leaf item / self-closed itemscope boundary
                blocks.append(
                    '<div itemscope itemtype="https://schema.org/Thing"></div>'
                    if rng.random() < 0.5
                    else '<meta itemscope itemtype="https://schema.org/Thing">'
                )
            else:
                # orphan itemprop outside any scope (must be ignored) next
                # to a flat item with an empty content (NULL value)
                blocks.append(
                    f'<span itemprop="orphan">{rng.choice(_WORDS)}</span>'
                    '<div itemscope itemtype="https://schema.org/Article">'
                    f'<span itemprop="headline">{rng.choice(_WORDS)}'
                    f" {rng.choice(_WORDS)}</span>"
                    '<meta itemprop="keywords" content="">'
                    "</div>"
                )
        body = f"<p>{rng.choice(_WORDS)} &amp; {rng.choice(_WORDS)}</p>" + " ".join(
            blocks
        )
        r_url.append(u)
        r_html.append(
            f"<html><head><title>mn{j}</title></head><body>{body}</body></html>"
        )
    return pa.table(
        {
            "url": pa.array(r_url, pa.string()),
            "html": pa.array(r_html, pa.string()),
        }
    )


def _gen_media(rng: random.Random, sf: str):
    """Media rows with REAL payloads (round 4): images are PNGs (all five
    scanline filters in rotation) or, since v30, baseline JPEGs at
    i%15==6 (alternating 4:4:4/4:2:0 — functions/jpeg.py); audio is 8-bit
    PCM RIFF/WAVE, video is an ISO-BMFF ftyp+mdat container of
    length-prefixed PNG frames — see functions/codecs.py.  Every 2nd
    image at i%30==0 re-encodes the pixels of image i-30 — alternately
    as PNG under DIFFERENT filter types (byte-different payload,
    identical decoded pixels: the exact pixel-dedup property) and, since
    v30, as a JPEG of the same pixels (the cross-format NEAR-dup
    property media_phash_pairs grades at Hamming<=3).
    Invariant relied on by the media_frames SQL oracle: a video's container
    frame count m = min(8, max(1, floor(duration_s))).  Audio duration_s
    stays the crawler-declared metadata (independent of the embedded clip
    length, as scraped metadata is in the wild).

    The shared-rng draw pattern of v26 (randint + L getrandbits per row) is
    preserved verbatim and recycled as the content entropy, so every OTHER
    synth table stays byte-identical across the version bump."""
    from web_crawler_spark.functions import codecs

    n = {"0.001": 200, "0.01": 1000, "0.1": 4000}[sf]
    ids, kinds, payloads, widths, heights, durations = [], [], [], [], [], []
    dup_pixels: "dict[int, tuple[int, int, bytes]]" = {}
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        body = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 512)))
        dur = round(0.5 + (i % 600) / 10.0, 1) if kind != "image" else None
        if kind == "image":
            if i % 30 == 0 and (i // 30) % 2 == 1 and (i - 30) in dup_pixels:
                w, h, px = dup_pixels[i - 30]
                if (i // 30) % 4 == 3:
                    # v30: every other re-encode stores the SAME pixels as
                    # a JPEG — the cross-format near-dup pair media_phash
                    # (Hamming<=3 banding) must still catch
                    payload = codecs.encode_jpeg(
                        px, w, h, 3, quality=92, subsampling="444"
                    )
                else:
                    # re-encode of i-30's pixels under different filters
                    payload = codecs.encode_png(
                        px, w, h, 3,
                        filters=[(i // 30 + r) % 4 + 1 for r in range(3)],
                    )
            elif i % 15 == 6:
                # v30: plain JPEG rows (no tEXt — JFIF has no such chunk),
                # alternating subsampling layouts for decoder coverage
                w = 18 + (i * 7) % 30
                h = 12 + (i * 13) % 24
                px = _media_image_pixels(w, h, body, i)
                payload = codecs.encode_jpeg(
                    px, w, h, 3,
                    quality=85 + (i % 11),
                    subsampling="420" if i % 2 == 0 else "444",
                )
            elif i % 15 == 9:
                # v31: GIF rows — 64-color palette + indices derived from
                # the same entropy draw; interlace and transparency
                # alternate for decoder coverage
                w = 18 + (i * 7) % 30
                h = 12 + (i * 13) % 24
                px = _media_image_pixels(w, h, body, i)
                palette = bytes(
                    (body[j % len(body)] * 7 + j) % 256 for j in range(192)
                )
                indices = [b % 64 for b in px[: w * h]]
                payload = codecs.encode_gif(
                    indices, w, h, palette,
                    interlaced=(i % 2 == 0),
                    transparent=5 if i % 45 == 24 else None,
                )
            else:
                w = 18 + (i * 7) % 30
                h = 12 + (i * 13) % 24
                px = _media_image_pixels(w, h, body, i)
                # ~2/3 of images carry tEXt caption/credit metadata (the
                # alt-text mining surface media_png_text extracts)
                texts = (
                    {
                        "caption": f"{_WORDS[i % len(_WORDS)]} "
                        f"{_WORDS[(i * 7 + 3) % len(_WORDS)]} {i}",
                        "author": f"synth-{i % 7}",
                    }
                    if i % 3 == 0 and i % 9 != 6
                    else None
                )
                payload = codecs.encode_png(
                    px, w, h, 3, filters=[(i + r) % 5 for r in range(3)],
                    texts=texts,
                )
                if i % 30 == 0:
                    dup_pixels[i] = (w, h, px)
            widths.append(w)
            heights.append(h)
        elif kind == "audio":
            s8 = _media_audio_samples(body, i)
            if i % 12 == 1:
                # every 4th audio row as 16-bit PCM: midpoint-centered
                # scale-up, so |s16|//256 == |s8-128| and segmentation is
                # bit-depth invariant (wav_magnitudes contract)
                payload = codecs.encode_wav(
                    [(s - 128) * 256 for s in s8], 8000, 16
                )
            else:
                payload = codecs.encode_wav(s8, 8000, 8)
            widths.append(None)
            heights.append(None)
        else:
            m = min(8, max(1, int(dur)))
            w, h = 16, 12
            base = _media_image_pixels(w, h, body, i)
            frames = []
            for k in range(m):
                if i % 2 == 0 and k >= m // 2 and m > 1:
                    # hard scene change mid-clip on even ids
                    fpx = bytes(255 - ((b + 2 * k) % 256) for b in base)
                else:
                    fpx = bytes((b + 2 * k) % 256 for b in base)
                frames.append(codecs.encode_png(fpx, w, h, 3, filters=[k % 5]))
            payload = codecs.encode_bmff(frames)
            widths.append(w)
            heights.append(h)
        assert payload.startswith(_MAGIC[kind]) or (
            kind == "image"
            and payload[:4] in (b"\xff\xd8\xff\xe0", b"GIF8")
        )
        payloads.append(payload)
        ids.append(i)
        kinds.append(kind)
        durations.append(dur)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "duration_s": pa.array(durations, pa.float64()),
        }
    )


EXPECTED_CRAWL_ROUNDS = 3

# -- ChainStep golden scenario (reference chain_crawler.py:24-43) -----------
#
# A 3-step chain where step 0 follows only links whose trailing page id is
# even (the listing->detail pattern of example_chain_crawling.py), later
# steps follow everything.  The same rule is expressed twice, independently:
# pure-Python for the refsim golden, Column functions for the engine.

CHAIN_ROUNDS = 3


def _trailing_num(url: str):
    import re

    m = re.search(r"(\d+)$", url)
    return int(m.group(1)) if m else None


def chain_extract_even(data: dict) -> list[str]:
    """Step-0 extraction rule (refsim side): links with an even trailing id."""
    out = []
    for link in data["links"]:
        n = _trailing_num(link)
        if n is not None and n % 2 == 0:
            out.append(link)
    return out


def chain_sim_steps() -> list:
    return [
        refsim.SimStep(extract=chain_extract_even, name="listing"),
        refsim.SimStep(name="detail"),
        refsim.SimStep(name="leaf"),
    ]


def chain_spark_steps() -> list:
    """Engine StepConfigs for the same scenario (JVM-side Column filter)."""
    from pyspark.sql import functions as F

    from .plans.crawl import StepConfig

    def even_links(parsed):
        def is_even(x):
            num = F.regexp_extract(x, r"(\d+)$", 1)
            return (num != F.lit("")) & (num.cast("long") % 2 == F.lit(0))

        return F.filter(parsed["links"], is_even)

    return [
        StepConfig(links_extractor=even_links, name="listing"),
        StepConfig(name="detail"),
        StepConfig(name="leaf"),
    ]


def _gen_expected_crawl(pages_tbl: pa.Table, seeds_tbl: pa.Table, steps=None):
    pages = {
        u.as_py(): h.as_py()
        for u, h in zip(pages_tbl.column("url"), pages_tbl.column("html"))
    }
    seeds = [u.as_py() for u in seeds_tbl.column("url")]
    sim = refsim.simulate_chain_crawl(
        pages, seeds, rounds=EXPECTED_CRAWL_ROUNDS, steps=steps
    )
    recs = sim.records
    return pa.table(
        {
            "fetch_seq": pa.array([r.fetch_seq for r in recs], pa.int64()),
            "round": pa.array([r.round for r in recs], pa.int32()),
            "url": pa.array([r.url for r in recs], pa.string()),
            "ok": pa.array([r.ok for r in recs], pa.bool_()),
            "title": pa.array([r.title for r in recs], pa.string()),
            "text": pa.array([r.text for r in recs], pa.string()),
            "links_count": pa.array(
                [r.links_count for r in recs], pa.int32()
            ),
            "links": pa.array([r.links for r in recs], pa.list_(pa.string())),
        }
    )


INJECT_AFTER_ROUND = 0  # crawl_inject: urls injected after round 0's commit


def _gen_expected_inject(pages_tbl: pa.Table, seeds_tbl: pa.Table):
    """Golden for the mid-crawl add_urls hook (reference crawler.py:373-376):
    after round 0, inject two never-otherwise-crawled pages (new downstream
    link discoveries), one url the crawl also finds naturally (fetched twice
    — the reference's raw list-append semantics), and one dead url (fetch
    failure).  Returns (expected_inject fetch-log table, inject_urls table)."""
    pages = {
        u.as_py(): h.as_py()
        for u, h in zip(pages_tbl.column("url"), pages_tbl.column("html"))
    }
    seeds = [u.as_py() for u in seeds_tbl.column("url")]
    base = refsim.simulate_chain_crawl(pages, seeds, rounds=EXPECTED_CRAWL_ROUNDS)
    crawled = {r.url for r in base.records}
    fresh = [u for u in pages if u not in crawled][:2]
    dup = next(r.url for r in base.records if r.round == 1 and r.ok)
    inj = fresh + [dup, "http://nowhere.example/missing"]
    sim = refsim.simulate_chain_crawl(
        pages, seeds, rounds=EXPECTED_CRAWL_ROUNDS, inject={INJECT_AFTER_ROUND: inj}
    )
    recs = sim.records
    expected = pa.table(
        {
            "fetch_seq": pa.array([r.fetch_seq for r in recs], pa.int64()),
            "round": pa.array([r.round for r in recs], pa.int32()),
            "url": pa.array([r.url for r in recs], pa.string()),
            "ok": pa.array([r.ok for r in recs], pa.bool_()),
            "title": pa.array([r.title for r in recs], pa.string()),
            "links_count": pa.array([r.links_count for r in recs], pa.int32()),
        }
    )
    inject_urls = pa.table(
        {
            "pos": pa.array(range(len(inj)), pa.int64()),
            "url": pa.array(inj, pa.string()),
        }
    )
    return expected, inject_urls


def _gen_pages_mirror(pages_meta_tbl: pa.Table, sf: str):
    """(host, text) serving table for the content-mirror op: ~15% of the
    sampled texts are also served by 1-3 cdn/mirror hosts, the rest by one
    host only.  Dedicated RNG: every v12 fixture's bytes are unchanged."""
    rng = random.Random(f"pagesmirror-{sf}")
    texts = pages_meta_tbl.column("text").to_pylist()
    n = max(50, len(texts) // 10)
    m_host, m_text = [], []
    for i in range(n):
        t = texts[i]
        m_host.append(f"host{rng.randrange(50)}.example")
        m_text.append(t)
        if rng.random() < 0.15:
            for _ in range(rng.randrange(1, 4)):
                m_host.append(f"mirror{rng.randrange(20)}.cdn.example")
                m_text.append(t)
    return pa.table(
        {"host": pa.array(m_host, pa.string()), "text": pa.array(m_text, pa.string())}
    )


def _gen_sitemaps(pages_meta_tbl: pa.Table, sf: str):
    """(sitemap_url, xml) per host: sitemaps-protocol documents built from
    that host's real page URLs — mostly <urlset> files (3-20 <url> entries,
    ~70% carrying <lastmod>), every 7th host a <sitemapindex> referencing
    2-4 child sitemaps.  Dedicated RNG: every v13 fixture's bytes are
    unchanged."""
    rng = random.Random(f"sitemaps-{sf}")
    by_host: dict[str, list[str]] = {}
    for u, h in zip(
        pages_meta_tbl.column("url").to_pylist(),
        pages_meta_tbl.column("host").to_pylist(),
    ):
        by_host.setdefault(h, []).append(u)
    s_url, s_xml = [], []
    for i, host in enumerate(sorted(by_host)):
        sm = f"http://{host}/sitemap.xml"
        if i % 7 == 6:
            kids = "".join(
                f"<sitemap><loc>http://{host}/sitemap-{k}.xml</loc>"
                f"<lastmod>2024-0{rng.randrange(1, 10)}-1{k}</lastmod></sitemap>"
                for k in range(rng.randrange(2, 5))
            )
            xml = (
                '<?xml version="1.0" encoding="UTF-8"?>\n'
                f"<sitemapindex>{kids}</sitemapindex>"
            )
        else:
            urls = sorted(by_host[host])[: rng.randrange(3, 21)]
            ent = []
            for u in urls:
                lastmod = (
                    f"<lastmod>2024-0{rng.randrange(1, 10)}-"
                    f"{rng.randrange(10, 29)}</lastmod>"
                    if rng.random() < 0.7
                    else ""
                )
                ent.append(f"<url><loc>{u}</loc>{lastmod}</url>")
            xml = (
                '<?xml version="1.0" encoding="UTF-8"?>\n'
                f"<urlset>{''.join(ent)}</urlset>"
            )
        s_url.append(sm)
        s_xml.append(xml)
    return pa.table(
        {
            "sitemap_url": pa.array(s_url, pa.string()),
            "xml": pa.array(s_xml, pa.string()),
        }
    )


def _gen_redirects(urls: list[str], sf: str):
    """(src_url, dst_url) redirect edges: ~8% of pages get a redirect chain
    of 1-4 hops ending at the page's canonical url (hop urls are synthetic
    ``/redir/{i}/{j}`` paths on the same host, mirroring how trackers and
    shorteners front real content), plus 3 pure 2-cycles (``/loop/{j}/…``)
    — the crawler-killing case a resolver must detect, not follow.  Each
    src has exactly ONE outgoing edge (HTTP semantics: one Location per
    response).  Dedicated RNG: every v14 fixture's bytes are unchanged."""
    rng = random.Random(f"redirects-{sf}")
    src_col, dst_col = [], []
    for i in range(0, len(urls), 13):  # ~7.7% of pages
        final = urls[i]
        host = final.split("/")[2]
        hops = rng.randrange(1, 5)
        chain = [f"http://{host}/redir/{i}/{j}" for j in range(hops)] + [final]
        for a, b in zip(chain, chain[1:]):
            src_col.append(a)
            dst_col.append(b)
    for j in range(3):
        a = f"http://loop{j}.example/loop/{j}/0"
        b = f"http://loop{j}.example/loop/{j}/1"
        src_col += [a, b]
        dst_col += [b, a]
    return pa.table(
        {
            "src_url": pa.array(src_col, pa.string()),
            "dst_url": pa.array(dst_col, pa.string()),
        }
    )


def _gen_tracked(urls: list[str], sf: str):
    """(url, digest) fixture for URL-parameter policy mining: every 9th page
    spawns query-string variants — ``utm_source``/``sid`` values that do NOT
    change the content digest (tracking params a crawler should strip) and
    ``page=N`` values that DO (a content param it must keep).  Some variants
    stack both kinds so stripping one param must group by the remaining
    ones.  Digests are md5 of the logical content identity (url or
    url+page).  Dedicated RNG: every v15 fixture's bytes are unchanged."""
    rng = random.Random(f"tracked-{sf}")
    u_col, d_col = [], []

    def emit(u: str, ident: str):
        u_col.append(u)
        d_col.append(hashlib.md5(ident.encode()).hexdigest())

    for i in range(0, len(urls), 9):
        base = urls[i]
        emit(base, base)
        for src in rng.sample(["news", "mail", "feed", "social"], rng.randrange(1, 3)):
            emit(f"{base}?utm_source={src}", base)
        if rng.random() < 0.5:
            emit(f"{base}?sid=s{rng.randrange(10**6)}", base)
        if rng.random() < 0.4:
            for p in range(2, 2 + rng.randrange(1, 3)):
                emit(f"{base}?page={p}", f"{base}#p{p}")
                if rng.random() < 0.5:
                    emit(f"{base}?page={p}&utm_source=mail", f"{base}#p{p}")
    return pa.table(
        {
            "url": pa.array(u_col, pa.string()),
            "digest": pa.array(d_col, pa.string()),
        }
    )


def _gen_bitext(urls: list[str], sf: str):
    """(url, lang, text) fixture for bitext candidate mining + alignment
    scoring: multilingual sites publish the same article under
    language-marked URLs — path-segment style ``/{lang}/a{n}`` and
    query-param style ``?id={n}&lang={lang}``.  Articles carry 1-4
    language versions (singletons are decoys that must yield no pair); a
    few ``/plain/`` pages have no lang marker in the URL at all (no
    alignment key — dropped by the miner).  Texts are translation-shaped:
    same sentence count (+/-1) and correlated lengths per language, except
    every 11th article's non-first versions are deliberately MISALIGNED
    (wildly different sentence counts) so the aligner has negatives.
    Dedicated RNG: every v16 fixture's bytes are unchanged."""
    rng = random.Random(f"bitext-{sf}")
    langs = ["en", "de", "fr", "es", "zh"]
    len_mult = {"en": 8, "de": 10, "fr": 9, "es": 9, "zh": 4}

    def article_text(n: int, lang: str, n_sents: int) -> str:
        words = len_mult[lang]
        return " ".join(
            f"Article {n} {lang} sentence {s} "
            + " ".join(rng.choices(_WORDS, k=words))
            + "."
            for s in range(n_sents)
        )

    u_col, l_col, t_col = [], [], []
    n_articles = max(24, len(urls) // 6)
    for n in range(n_articles):
        site = n % 7
        chosen = rng.sample(langs, rng.randrange(1, 5))
        base_sents = rng.randrange(2, 7)
        for j, lang in enumerate(chosen):
            if site % 2 == 0:
                u_col.append(f"http://bt{site}.example/{lang}/a{n}")
            else:
                u_col.append(f"http://bq{site}.example/art?id={n}&lang={lang}")
            l_col.append(lang)
            if n % 11 == 0 and j > 0:  # misaligned translation decoy
                n_sents = base_sents + 6 + rng.randrange(4)
            else:
                n_sents = max(1, base_sents + rng.randrange(-1, 2))
            t_col.append(article_text(n, lang, n_sents))
    for n in range(0, n_articles, 10):
        u_col.append(f"http://bt9.example/plain/{n}")
        l_col.append("en")
        t_col.append(article_text(n, "en", 3))
    return pa.table(
        {
            "url": pa.array(u_col, pa.string()),
            "lang": pa.array(l_col, pa.string()),
            "text": pa.array(t_col, pa.string()),
        }
    )


def _gen_hostdocs(urls: list[str], sf: str):
    """(host, doc_id, text) fixture for per-host template mining: each host
    stamps its own 2-4 nav/footer lines onto (almost) every page, one
    syndicated line appears across hosts, and each page carries 2-6 unique
    content lines.  Host ``tiny.example`` has too few pages to clear the
    miner's min-page floor (nothing may be stripped there).  Dedicated RNG:
    every v17 fixture's bytes are unchanged."""
    rng = random.Random(f"hostdocs-{sf}")
    syndicated = "Share this story on your favorite network today."
    h_col, d_col, t_col = [], [], []
    n_hosts = 8
    pages_per_host = max(6, len(urls) // (n_hosts * 12))
    for h in range(n_hosts):
        host = f"tpl{h}.example"
        templates = [
            f"Welcome to {host} - all rights reserved {2020 + h}."
        ] + [
            f"Menu item {j} for {host}" for j in range(rng.randrange(1, 4))
        ]
        for p in range(pages_per_host):
            lines = []
            for t in templates:
                if rng.random() < 0.9:  # templates hit ~90% of pages
                    lines.append(t)
            if rng.random() < 0.5:
                lines.append(syndicated)
            for c in range(rng.randrange(2, 7)):
                lines.append(
                    f"Unique paragraph {c} of page {p} on {host}: "
                    + " ".join(rng.choices(_WORDS, k=8))
                )
            rng.shuffle(lines)
            h_col.append(host)
            d_col.append(f"{host}/p{p}")
            t_col.append("\n".join(lines))
    for p in range(2):  # below MIN_PAGES: identical lines must survive
        h_col.append("tiny.example")
        d_col.append(f"tiny.example/p{p}")
        t_col.append("Tiny shared header.\nBody of tiny page %d." % p)
    return pa.table(
        {
            "host": pa.array(h_col, pa.string()),
            "doc_id": pa.array(d_col, pa.string()),
            "text": pa.array(t_col, pa.string()),
        }
    )


def _gen_annot(urls: list[str], sf: str):
    """(url, html) fixture with HEAD metadata the main pages table lacks:
    <title>, <meta name=description>, <link rel=canonical>, og:title —
    with randomized attribute ORDER (name-first vs content-first) so
    extraction must handle both spellings.  ~30% of pages declare a
    rel=canonical, 2/3 of those point at ANOTHER url (the duplicate-page
    declaration channel real sites use); og:title present ~40%.
    Dedicated RNG: every v19 fixture's bytes are unchanged."""
    rng = random.Random(f"annot-{sf}")
    u_col, h_col = [], []
    for i, url in enumerate(urls):
        parts = ["<html><head>"]
        if rng.random() < 0.8:
            parts.append('<meta charset="utf-8">')
        if rng.random() < 0.9:
            parts.append(f"<title>Annot {i} {' '.join(rng.sample(_WORDS, 2))}</title>")
        if rng.random() < 0.6:
            desc = f"Summary {i}: " + " ".join(rng.choices(_WORDS, k=6))
            if rng.random() < 0.3:
                parts.append(f'<meta content="{desc}" name="description">')
            else:
                parts.append(f'<meta name="description" content="{desc}">')
        if rng.random() < 0.3:
            target = url if rng.random() < 1 / 3 else urls[rng.randrange(len(urls))]
            if rng.random() < 0.3:
                parts.append(f'<link href="{target}" rel="canonical">')
            else:
                parts.append(f'<link rel="canonical" href="{target}">')
        if rng.random() < 0.4:
            og = f"OG {i} " + rng.choice(_WORDS)
            if rng.random() < 0.3:
                parts.append(f'<meta content="{og}" property="og:title">')
            else:
                parts.append(f'<meta property="og:title" content="{og}">')
        parts.append("</head><body>")
        for _ in range(rng.randint(1, 2)):
            parts.append("<p>" + " ".join(rng.choices(_WORDS, k=12)) + "</p>")
        parts.append("</body></html>")
        u_col.append(url)
        h_col.append("\n".join(parts).encode("utf-8"))
    return pa.table(
        {
            "url": pa.array(u_col, pa.string()),
            "html": pa.array(h_col, pa.binary()),
        }
    )


def _gen_tables(urls: list[str], sf: str):
    """(url, html) fixture for web-table extraction (the WDC shape): every
    ~3rd page carries 1-3 <table>s with header rows, ragged rows, empty
    cells, inner markup (<b>/<a>) inside cells, and attribute noise on
    table/tr/td tags; non-table pages exercise the empty case.  Dedicated
    RNG: every v20 fixture's bytes are unchanged."""
    rng = random.Random(f"tables-{sf}")
    u_col, h_col = [], []
    for i, url in enumerate(urls):
        parts = ["<html><body>", f"<p>intro {i} " + " ".join(rng.choices(_WORDS, k=6)) + "</p>"]
        if i % 3 == 0:
            for t in range(rng.randint(1, 3)):
                n_cols = rng.randint(2, 4)
                attr = ' class="data"' if rng.random() < 0.5 else ""
                parts.append(f"<table{attr}>")
                parts.append(
                    "<tr>" + "".join(f"<th>col{c}</th>" for c in range(n_cols)) + "</tr>"
                )
                for r in range(rng.randint(1, 5)):
                    cells = []
                    width = n_cols if rng.random() < 0.8 else rng.randint(1, n_cols)
                    for c in range(width):
                        if rng.random() < 0.1:
                            cells.append("<td></td>")
                        elif rng.random() < 0.2:
                            cells.append(f"<td><b>{rng.choice(_WORDS)}</b> {r * 10 + c}</td>")
                        elif rng.random() < 0.1:
                            cells.append(f'<td><a href="{url}">{rng.choice(_WORDS)}</a></td>')
                        else:
                            cells.append(f"<td>{rng.choice(_WORDS)} {r}.{c}</td>")
                    tr_attr = ' align="left"' if rng.random() < 0.3 else ""
                    parts.append(f"<tr{tr_attr}>" + "".join(cells) + "</tr>")
                parts.append("</table>")
        parts.append("</body></html>")
        u_col.append(url)
        h_col.append("\n".join(parts).encode("utf-8"))
    return pa.table(
        {
            "url": pa.array(u_col, pa.string()),
            "html": pa.array(h_col, pa.binary()),
        }
    )


def _gen_feeds(pages_meta_tbl: pa.Table, sf: str):
    """(feed_url, xml) per host: RSS 2.0 documents over that host's real
    page URLs (title/link/pubDate items, some items missing pubDate or
    title), every 3rd host an Atom feed (<entry> with href-attribute
    links, <updated>); a few CDATA titles exercise unescaping-free
    extraction.  Dedicated RNG: every v21 fixture's bytes are unchanged."""
    rng = random.Random(f"feeds-{sf}")
    by_host: dict[str, list[str]] = {}
    for u, h in zip(
        pages_meta_tbl.column("url").to_pylist(),
        pages_meta_tbl.column("host").to_pylist(),
    ):
        by_host.setdefault(h, []).append(u)
    f_url, f_xml = [], []
    for i, host in enumerate(sorted(by_host)):
        urls = sorted(by_host[host])[: rng.randrange(2, 12)]
        if i % 3 == 2:
            entries = []
            for u in urls:
                upd = (
                    f"<updated>2024-0{rng.randrange(1, 10)}-0{rng.randrange(1, 10)}"
                    "T00:00:00Z</updated>"
                    if rng.random() < 0.8
                    else ""
                )
                entries.append(
                    f'<entry><title>entry {rng.choice(_WORDS)}</title>'
                    f'<link href="{u}"/>{upd}</entry>'
                )
            xml = (
                '<?xml version="1.0"?>\n<feed xmlns="http://www.w3.org/2005/Atom">'
                f"<title>{host} feed</title>{''.join(entries)}</feed>"
            )
            f_url.append(f"http://{host}/atom.xml")
        else:
            items = []
            for u in urls:
                title = (
                    f"<title><![CDATA[story {rng.choice(_WORDS)}]]></title>"
                    if rng.random() < 0.2
                    else f"<title>story {rng.choice(_WORDS)}</title>"
                    if rng.random() < 0.9
                    else ""
                )
                pub = (
                    f"<pubDate>Mon, 0{rng.randrange(1, 10)} Jan 2024 00:00:00 GMT</pubDate>"
                    if rng.random() < 0.7
                    else ""
                )
                items.append(f"<item>{title}<link>{u}</link>{pub}</item>")
            xml = (
                '<?xml version="1.0"?>\n<rss version="2.0"><channel>'
                f"<title>{host}</title>{''.join(items)}</channel></rss>"
            )
            f_url.append(f"http://{host}/rss.xml")
        f_xml.append(xml)
    return pa.table(
        {
            "feed_url": pa.array(f_url, pa.string()),
            "xml": pa.array(f_xml, pa.string()),
        }
    )



def _gen_pages_ext(pages_meta_tbl: pa.Table, sf: str):
    """(url, host, html) — head-markup-rich page variants over the real crawl
    URL space: rel=next/prev pagination chains, hreflang alternate clusters
    (some deliberately unconfirmed one-way), JSON-LD Article/Product blocks,
    meta-refresh redirects, and soft-404 bodies served as normal pages.
    Dedicated RNG: every v22 table's bytes are unchanged."""
    rng = random.Random(f"pages_ext-{sf}")
    by_host: dict[str, list[str]] = {}
    for u, h in zip(
        pages_meta_tbl.column("url").to_pylist(),
        pages_meta_tbl.column("host").to_pylist(),
    ):
        by_host.setdefault(h, []).append(u)
    r_url, r_host, r_html = [], [], []

    def emit(url: str, host: str, title: str, head: list[str], body: str):
        r_url.append(url)
        r_host.append(host)
        r_html.append(
            f"<html><head><title>{title}</title>{''.join(head)}</head>"
            f"<body><p>{body}</p></body></html>"
        )

    def prose(lo: int, hi: int) -> str:
        n = rng.randrange(lo, hi)
        words = [rng.choice(_WORDS) for _ in range(n)]
        return " ".join(words) + "."

    for host in sorted(by_host):
        urls = sorted(by_host[host])
        nxt: dict[str, str] = {}
        prv: dict[str, str] = {}
        i = 0
        while i < len(urls):
            chain = urls[i : i + rng.randrange(1, 7)]
            for a, b in zip(chain, chain[1:]):
                nxt[a], prv[b] = b, a
            i += len(chain)
        for j, u in enumerate(urls):
            head: list[str] = []
            if u in nxt:
                head.append(f'<link rel="next" href="{nxt[u]}">')
            if u in prv:
                head.append(f'<link rel="prev" href="{prv[u]}">')
            if j % 5 == 1:
                langs = rng.sample(["de", "fr", "es", "vi"], rng.randrange(1, 3))
                alts = [(lg, f"{u}-{lg}") for lg in langs]
                for lg, au in alts:
                    head.append(f'<link rel="alternate" hreflang="{lg}" href="{au}">')
                for lg, au in alts:
                    ahead = []
                    if rng.random() >= 0.2:  # 20%: broken one-way declaration
                        ahead.append(f'<link rel="alternate" hreflang="en" href="{u}">')
                    for lg2, au2 in alts:
                        if au2 != au:
                            ahead.append(
                                f'<link rel="alternate" hreflang="{lg2}" href="{au2}">'
                            )
                    emit(au, host, f"alt {lg} {j}", ahead, prose(20, 60))
            if rng.random() < 0.4:
                d = f"2024-{rng.randrange(1, 13):02d}-{rng.randrange(1, 29):02d}"
                head.append(
                    '<script type="application/ld+json">'
                    f'{{"@type": "Article", "headline": "story {rng.choice(_WORDS)} {j}",'
                    f' "datePublished": "{d}"}}</script>'
                )
                if rng.random() < 0.25:
                    head.append(
                        '<script type="application/ld+json">'
                        f'{{"@type": "Product", "name": "item {rng.choice(_WORDS)}"}}'
                        "</script>"
                    )
            roll = rng.random()
            if roll < 0.05 and len(urls) > 1:
                target = rng.choice([x for x in urls if x != u])
                head.append(
                    f'<meta http-equiv="refresh" content="{rng.randrange(0, 6)};url={target}">'
                )
                emit(u, host, f"moved {j}", head, prose(3, 8))
            elif roll < 0.13:
                emit(
                    u, host, "404 Not Found", head,
                    "404 Page Not Found. The page you requested does not exist.",
                )
            else:
                emit(u, host, f"page {j}", head, prose(20, 80))
    return pa.table(
        {
            "url": pa.array(r_url, pa.string()),
            "host": pa.array(r_host, pa.string()),
            "html": pa.array(r_html, pa.string()),
        }
    )



def _gen_urls_sus(sf: str):
    """(url_id, url) — URL-hygiene fixture: mostly benign host URLs plus the
    suspicious-authority shapes a phishing/spam URL gate flags (IP-literal
    hosts, userinfo@, punycode labels, deep subdomain stacks, non-standard
    ports).  Dedicated RNG; all v23 tables byte-identical."""
    rng = random.Random(f"urls_sus-{sf}")
    n = _SF_WEBURLS[sf]
    urls = [
        # pinned boundary rows
        "http://host0.example/fine.html",
        "http://10.0.42.7/p/1",                     # IP literal
        "http://admin@host1.example/login",          # userinfo
        "http://xn--mnchen-3ya.example/strasse",     # punycode label
        "http://a.b.c.d.host2.example/deep",         # 6 labels
        "http://host3.example:8443/alt-port",        # non-standard port
        "https://host4.example:443/standard-port",   # standard port: benign
        "http://host5.example:80/standard-port",     # standard port: benign
    ]
    for i in range(len(urls), n):
        h = rng.randrange(200)
        r = rng.random()
        if r < 0.70:
            urls.append(f"http://host{h}.example/p/{i}")
        elif r < 0.76:
            urls.append(
                f"http://{rng.randrange(1, 250)}.{rng.randrange(256)}"
                f".{rng.randrange(256)}.{rng.randrange(1, 250)}/p/{i}"
            )
        elif r < 0.82:
            urls.append(f"http://user{i}@host{h}.example/p/{i}")
        elif r < 0.88:
            urls.append(f"http://xn--{rng.choice(_WORDS)}-{i}a.example/p/{i}")
        elif r < 0.94:
            labels = ".".join(rng.choice(_WORDS)[:3] for _ in range(rng.randint(3, 6)))
            urls.append(f"http://{labels}.host{h}.example/p/{i}")
        else:
            urls.append(f"http://host{h}.example:{rng.choice([81, 8080, 8443, 444])}/p/{i}")
    return pa.table(
        {
            "url_id": pa.array(range(len(urls)), pa.int64()),
            "url": pa.array(urls, pa.string()),
        }
    )


def _gen_pages_micro(pages_meta_tbl: pa.Table, sf: str):
    """(url, html) — schema.org MICRODATA page variants (the attribute-based
    sibling of the JSON-LD channel): ~half the pages carry 1-2 flat
    itemscope blocks (Product/Article/Person/Offer) whose properties mix
    inline-text spans and content= metas; boundary rows include an empty
    content= (NULL value) and a props-less item.  Dedicated RNG; all v25
    tables byte-identical."""
    rng = random.Random(f"pages_micro-{sf}")
    urls = pages_meta_tbl.column("url").to_pylist()
    types = ["Product", "Article", "Person", "Offer"]
    r_url, r_html = [], []
    for j, u in enumerate(urls):
        if rng.random() < 0.5:
            continue  # no microdata on this page
        blocks = []
        for _ in range(rng.randint(1, 2)):
            t = rng.choice(types)
            props = []
            if rng.random() < 0.08:
                pass  # props-less item (boundary)
            else:
                props.append(
                    f'<span itemprop="name">{rng.choice(_WORDS)} {j}</span>'
                )
                if rng.random() < 0.6:
                    price = f"{rng.randrange(1, 500)}.{rng.randrange(100):02d}"
                    props.append(f'<meta itemprop="price" content="{price}">')
                if rng.random() < 0.3:
                    props.append('<meta itemprop="sku" content="">')  # NULL value
                if rng.random() < 0.4:
                    props.append(
                        f'<span itemprop="description">{rng.choice(_WORDS)}'
                        f" {rng.choice(_WORDS)}</span>"
                    )
            blocks.append(
                f'<div itemscope itemtype="https://schema.org/{t}">'
                + " ".join(props)
                + "</div>"
            )
        body = f"<p>{rng.choice(_WORDS)}</p> " + " ".join(blocks)
        r_url.append(u)
        r_html.append(f"<html><head><title>m{j}</title></head><body>{body}</body></html>")
    return pa.table(
        {
            "url": pa.array(r_url, pa.string()),
            "html": pa.array(r_html, pa.string()),
        }
    )


def _gen_dns(pages_meta_tbl: pa.Table, sf: str):
    """(host, ip) — resolver fixture over the crawl's real host space for
    IP-grain politeness: ~20% of hosts sit on a small pool of shared-hosting
    IPs (many vhosts, one box — the case host-grain budgets overload), ~10%
    are multihomed (2-3 A records; politeness must pick ONE deterministic
    key), ~5% don't resolve at all (fallback to host-grain), the rest get a
    unique address.  Dedicated RNG; all v24 tables byte-identical."""
    rng = random.Random(f"dns-{sf}")
    hosts = sorted(set(pages_meta_tbl.column("host").to_pylist()))
    shared_pool = [f"203.0.113.{i}" for i in range(1, max(2, len(hosts) // 8))]
    r_host, r_ip = [], []
    for i, h in enumerate(hosts):
        roll = rng.random()
        if roll < 0.05:
            continue  # NXDOMAIN: absent from the table
        if roll < 0.25:
            r_host.append(h)
            r_ip.append(rng.choice(shared_pool))
        elif roll < 0.35:
            for j in range(rng.randint(2, 3)):  # multihomed
                r_host.append(h)
                r_ip.append(f"198.51.100.{(3 * i + j) % 254 + 1}")
        else:
            r_host.append(h)
            r_ip.append(f"10.{(i >> 8) & 255}.{i & 255}.{rng.randrange(1, 254)}")
    return pa.table(
        {
            "host": pa.array(r_host, pa.string()),
            "ip": pa.array(r_ip, pa.string()),
        }
    )


def ensure_synth(sf_dir_or_name: str) -> str:
    """Generate (once) all synthetic tables for a scale; returns the dir."""
    sf = sf_name_of(sf_dir_or_name)
    if sf not in _SF_PAGES:
        sf = "0.01"
    out = synth_dir(sf)
    marker = os.path.join(out, f"_GENERATED_{SYNTH_VERSION}")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    pages, pages_meta, urls, rng = _gen_pages(sf)
    seeds = _gen_seeds(rng, urls, sf)
    cands = _gen_candidates(rng, urls)
    media = _gen_media(rng, sf)
    webdocs, syndicated = _gen_webdocs(rng, sf)
    evaldocs = _gen_evaldocs(syndicated, sf)
    weburls = _gen_weburls(sf)
    pages_prev = _gen_pages_prev(pages, sf)
    pages_mirror = _gen_pages_mirror(pages_meta, sf)
    sitemaps = _gen_sitemaps(pages_meta, sf)
    redirects = _gen_redirects(urls, sf)
    tracked = _gen_tracked(urls, sf)
    bitext = _gen_bitext(urls, sf)
    hostdocs = _gen_hostdocs(urls, sf)
    annot = _gen_annot(urls, sf)
    tables = _gen_tables(urls, sf)
    feeds = _gen_feeds(pages_meta, sf)
    pages_ext = _gen_pages_ext(pages_meta, sf)
    urls_sus = _gen_urls_sus(sf)
    dns = _gen_dns(pages_meta, sf)
    pages_micro = _gen_pages_micro(pages_meta, sf)
    pages_micro_nested = _gen_pages_micro_nested(pages_meta, sf)
    expected = _gen_expected_crawl(pages, seeds)
    expected_chain = _gen_expected_crawl(pages, seeds, steps=chain_sim_steps())
    expected_inject, inject_urls = _gen_expected_inject(pages, seeds)
    # small row groups so Spark's byte-range splits hold real rows — a single
    # giant row group serializes every scan into one task (Common-Crawl data
    # comes as thousands of files; this models that split-ability)
    pq.write_table(pages, synth_path(sf, "pages"), row_group_size=2048)
    pq.write_table(pages_meta, synth_path(sf, "pages_meta"), row_group_size=4096)
    pq.write_table(seeds, synth_path(sf, "seeds"))
    pq.write_table(cands, synth_path(sf, "url_candidates"))
    pq.write_table(media, synth_path(sf, "media"), row_group_size=512)
    pq.write_table(webdocs, synth_path(sf, "webdocs"), row_group_size=1024)
    pq.write_table(evaldocs, synth_path(sf, "evaldocs"))
    pq.write_table(weburls, synth_path(sf, "weburls"), row_group_size=2048)
    pq.write_table(pages_prev, synth_path(sf, "pages_prev"), row_group_size=2048)
    pq.write_table(pages_mirror, synth_path(sf, "pages_mirror"), row_group_size=2048)
    pq.write_table(sitemaps, synth_path(sf, "sitemaps"), row_group_size=2048)
    pq.write_table(redirects, synth_path(sf, "redirects"), row_group_size=2048)
    pq.write_table(tracked, synth_path(sf, "tracked"), row_group_size=2048)
    pq.write_table(bitext, synth_path(sf, "bitext"), row_group_size=2048)
    pq.write_table(hostdocs, synth_path(sf, "hostdocs"), row_group_size=2048)
    pq.write_table(annot, synth_path(sf, "pages_annot"), row_group_size=2048)
    pq.write_table(tables, synth_path(sf, "pages_tables"), row_group_size=2048)
    pq.write_table(feeds, synth_path(sf, "feeds"), row_group_size=2048)
    pq.write_table(pages_ext, synth_path(sf, "pages_ext"), row_group_size=2048)
    pq.write_table(urls_sus, synth_path(sf, "urls_sus"), row_group_size=2048)
    pq.write_table(dns, synth_path(sf, "dns"))
    pq.write_table(pages_micro, synth_path(sf, "pages_micro"), row_group_size=2048)
    pq.write_table(
        pages_micro_nested, synth_path(sf, "pages_micro_nested"), row_group_size=2048
    )
    pq.write_table(expected, synth_path(sf, "expected_crawl"), row_group_size=4096)
    pq.write_table(
        expected_chain, synth_path(sf, "expected_chain"), row_group_size=4096
    )
    pq.write_table(
        expected_inject, synth_path(sf, "expected_inject"), row_group_size=4096
    )
    pq.write_table(inject_urls, synth_path(sf, "inject_urls"))
    with open(marker, "w") as f:
        f.write(SYNTH_VERSION)
    return out
