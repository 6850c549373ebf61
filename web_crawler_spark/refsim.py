"""Per-row reference-semantics oracle (pure Python, no Spark).

Reimplements WHAT the reference computes, row at a time, as the golden oracle
for the distributed engine:

* ``parse_html`` — the reference's default HTML parser pipeline
  (``/root/reference/web_crawler/crawler.py:126-146``): title, script/style
  stripping, get_text -> line/two-space-phrase normalization, ``text[:500]``,
  href link extraction, ``links[:10]``.  The reference uses
  BeautifulSoup("html.parser"); this implementation reproduces the same
  semantics with the stdlib ``html.parser`` (bs4 is not available in this
  environment), and the engine's vectorized UDF
  (``functions/html_parse.py``) is differentially tested against it.

* ``simulate_chain_crawl`` — the reference's deterministic (max_workers=1)
  ChainCrawler semantics (``/root/reference/web_crawler/chain_crawler.py``):
  FIFO frontier per step (:293-297), per-step head truncation (:285-287),
  fetch = exact-url lookup accepting only "status 200" (= present in the
  pages mapping), parse, link extraction, order-preserving first-wins dedup
  of next-step URLs via dict.fromkeys (:377-379), stop on empty frontier or
  final step (:408-415).  Crawl ordering and the final URL-seen set from the
  Spark engine must match this simulator exactly (BASELINE.json north rule).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Any, Iterable, Mapping, Optional

# ---------------------------------------------------------------------------
# Default-parser oracle (reference crawler.py:126-146 semantics)
# ---------------------------------------------------------------------------

_SKIP_TEXT_TAGS = {"script", "style"}
# html.parser treats these as CDATA containers; bs4's html.parser builder does
# the same, so text inside them arrives as raw data events.


class _RefHTMLParser(HTMLParser):
    """Collects exactly what the reference's BeautifulSoup pipeline reads.

    - document-order text (excluding <script>/<style> content, which the
      reference decomposes before get_text; crawler.py:131-134)
    - the first <title> element's children (for bs4's ``soup.title.string``:
      a string only when the element has exactly one text child, else None)
    - hrefs of <a> tags that carry an href attribute, in document order
      (crawler.py:144 ``soup.find_all("a", href=True)``)
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.texts: list[str] = []
        self.links: list[str] = []
        self._skip_depth = 0
        self._title_parts: Optional[list[str]] = None
        self._in_first_title = False
        self._title_child_count = 0
        self._title_seen = False

    def handle_starttag(self, tag: str, attrs: list[tuple[str, Optional[str]]]) -> None:
        if tag in _SKIP_TEXT_TAGS:
            self._skip_depth += 1
        if tag == "title" and not self._title_seen:
            self._title_seen = True
            self._in_first_title = True
            self._title_parts = []
            self._title_child_count = 0
        if tag == "a":
            for name, value in attrs:
                if name == "href" and value is not None:
                    self.links.append(value)
                    break

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TEXT_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag == "title" and self._in_first_title:
            self._in_first_title = False

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            self.texts.append(data)
        if self._in_first_title:
            self._title_parts.append(data)
            self._title_child_count += 1

    @property
    def title_string(self) -> Optional[str]:
        """bs4 ``soup.title.string`` semantics: None when no <title>, or when
        the element has zero or multiple child nodes."""
        if self._title_parts is None:
            return None
        if self._title_child_count != 1:
            return None
        return self._title_parts[0]

    def has_title(self) -> bool:
        return self._title_seen


def normalize_text(raw_text: str) -> str:
    """The reference's whitespace pipeline (crawler.py:134-137), verbatim
    semantics: splitlines -> strip -> split on two spaces -> strip -> join
    non-empty chunks with a single space."""
    lines = (line.strip() for line in raw_text.splitlines())
    chunks = (phrase.strip() for line in lines for phrase in line.split("  "))
    return " ".join(chunk for chunk in chunks if chunk)


def parse_html(url: str, html_content: str) -> dict[str, Any]:
    """Reference default parser (crawler.py:126-146): returns
    {title, text (<=500 chars), links_count, links (<=10)}."""
    p = _RefHTMLParser()
    p.feed(html_content)
    p.close()
    title = p.title_string if p.has_title() else ""
    text = normalize_text("".join(p.texts))
    links = p.links
    return {
        "title": title,
        "text": text[:500],
        "links_count": len(links),
        "links": links[:10],
    }


def decode_html(payload: bytes) -> str:
    """Reference decodes response bytes with errors='ignore'
    (crawler.py:202,218); pages store UTF-8 bytes."""
    return payload.decode("utf-8", errors="ignore")


# ---------------------------------------------------------------------------
# Deterministic ChainCrawler simulator (chain_crawler.py, max_workers=1)
# ---------------------------------------------------------------------------


@dataclass
class CrawlRecord:
    fetch_seq: int
    round: int
    url: str
    ok: bool
    title: Optional[str]
    text: Optional[str]
    links_count: Optional[int]
    links: Optional[list[str]]
    data: Optional[dict] = None  # custom-parser output (per-step chains)


def _default_extract(data: dict) -> list[str]:
    """Default chain extraction: the parsed links list
    (chain_crawler.py:335-338 with the default parser)."""
    return data["links"]


@dataclass
class SimStep:
    """Reference ``ChainStep`` semantics (chain_crawler.py:24-43): a per-step
    parser and next-URL extraction rule.  ``extract=None`` marks a final step
    (no URLs extracted; the chain drains)."""

    parser: "Optional[callable]" = None  # (url, html) -> dict; None => default
    extract: "Optional[callable]" = _default_extract  # data -> [url]; None => final
    name: Optional[str] = None


@dataclass
class SimResult:
    records: list[CrawlRecord] = field(default_factory=list)
    step_stats: list[dict[str, int]] = field(default_factory=list)

    @property
    def seen_urls(self) -> list[str]:
        """Final URL-seen set = distinct fetched-ok urls, first-seen order."""
        return list(dict.fromkeys(r.url for r in self.records if r.ok))

    @property
    def fetch_sequence(self) -> list[str]:
        return [r.url for r in self.records]


def simulate_chain_crawl(
    pages: Mapping[str, bytes],
    seeds: Iterable[str],
    rounds: Optional[int] = None,
    max_urls_per_step: Optional[int] = None,
    steps: Optional[list[SimStep]] = None,
    inject: Optional[Mapping[int, list[str]]] = None,
) -> SimResult:
    """Run the reference's deterministic 1-worker chain-crawl semantics.

    ``pages`` maps exact url string -> html bytes ("the web"); a lookup miss is
    a fetch failure (reference gets non-200/timeout).  Every non-final round
    extracts next urls from parsed links (chain_crawler.py:335-338) verbatim —
    no canonicalization, matching the reference, so messy/relative hrefs are
    enqueued as-is and simply fail to fetch.  Dedup is within-step first-wins
    only (chain_crawler.py:377-379); there is NO cross-step seen set (a url
    fetched in round r and rediscovered in round r+1 is fetched again).

    ``steps`` (ChainStep parity, chain_crawler.py:24-43): one SimStep per
    round, each with its own parser and extraction rule; when given, the
    step count defines the round count.

    ``inject`` maps a finished round index r to urls appended to the queue
    before round r+1 — the reference's mid-crawl ``add_urls``
    (crawler.py:373-376 raw-appends to the live queue).  Mirroring the
    engine's ``ChainCrawl.add_urls``: within-injection ordered dedup, then
    appended at the TAIL of the wave (after the round's natural
    discoveries); no dedup against the queue (an injected url also
    discovered naturally is fetched twice, exactly like the reference's
    list append).
    """
    if steps is None:
        steps = [SimStep() for _ in range(rounds)]
    rounds = len(steps)
    result = SimResult()
    # cli.py:46 ordered-dedups the seed list before crawling.
    current: list[str] = list(dict.fromkeys(seeds))
    for round_idx in range(rounds):
        if not current:
            break
        if max_urls_per_step is not None and len(current) > max_urls_per_step:
            current = current[:max_urls_per_step]  # chain_crawler.py:285-287
        stats = {
            "urls_processed": 0,
            "urls_succeeded": 0,
            "urls_failed": 0,
            "next_urls_found": 0,
        }
        next_urls: list[str] = []
        is_final = round_idx == rounds - 1
        step = steps[round_idx]
        parse = step.parser or parse_html
        default_parse = step.parser is None
        for url in current:  # FIFO queue order, single worker
            stats["urls_processed"] += 1
            fetch_seq = len(result.records)
            payload = pages.get(url)
            if payload is None:
                stats["urls_failed"] += 1
                result.records.append(
                    CrawlRecord(fetch_seq, round_idx, url, False, None, None, None, None)
                )
            else:
                stats["urls_succeeded"] += 1
                parsed = parse(url, decode_html(payload))
                result.records.append(
                    CrawlRecord(
                        fetch_seq,
                        round_idx,
                        url,
                        True,
                        parsed["title"] if default_parse else None,
                        parsed["text"] if default_parse else None,
                        parsed["links_count"] if default_parse else None,
                        parsed["links"] if default_parse else None,
                        data=parsed,
                    )
                )
                if step.extract is not None:
                    # chain_crawler.py:330-338 — is_final_step() is
                    # `extract_next_urls is None`, NOT positional: a last
                    # step with an extractor still extracts and counts
                    # next_urls_found (the found urls then go nowhere
                    # because the step loop ends).
                    found = step.extract(parsed)
                    stats["next_urls_found"] += len(found)
                    if not is_final:
                        next_urls.extend(found)
        if next_urls:
            next_urls = list(dict.fromkeys(next_urls))  # chain_crawler.py:377-379
        result.step_stats.append(stats)
        current = next_urls
        if inject and round_idx in inject:
            current = current + list(dict.fromkeys(inject[round_idx]))
    return result
