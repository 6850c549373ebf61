"""Vectorized HTML extraction — the engine's per-page compute kernel.

Reproduces the reference default parser's output (title, whitespace-normalized
text truncated to 500 chars, link hrefs in document order, links_count;
``/root/reference/web_crawler/crawler.py:126-146``) as an Arrow-batched pandas
UDF over the pages table's ``html BINARY`` column.  This is a *separate*
implementation from the per-row oracle in ``refsim.py`` (an event-driven
single-pass collector vs the oracle's bs4-shaped accumulator) and is
differentially tested byte-identical against it (tests/test_parser.py).

Plan shape: the UDF appears as ArrowEvalPython (never BatchEvalPython); html
bytes stream JVM->Python via Arrow, one batch per ~maxRecordsPerBatch rows.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

PARSED_SCHEMA = StructType(
    [
        StructField("title", StringType(), True),
        StructField("text", StringType(), True),
        StructField("links_count", IntegerType(), True),
        StructField("links", ArrayType(StringType()), True),
    ]
)

TEXT_LIMIT = 500  # crawler.py:143
LINKS_LIMIT = 10  # crawler.py:145


class _Extractor(HTMLParser):
    """Single-pass event collector: text chunks (skipping script/style
    subtrees), first-title children, hrefs."""

    __slots__ = ("chunks", "hrefs", "_skip", "_title_state", "_title_chunks")

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.hrefs: list[str] = []
        self._skip = 0
        # 0 = before first title, 1 = inside it, 2 = done
        self._title_state = 0
        self._title_chunks: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.hrefs.append(v)
                    break
        elif tag in ("script", "style"):
            self._skip += 1
        elif tag == "title" and self._title_state == 0:
            self._title_state = 1

    def handle_endtag(self, tag):
        if tag in ("script", "style"):
            if self._skip:
                self._skip -= 1
        elif tag == "title" and self._title_state == 1:
            self._title_state = 2

    def handle_data(self, data):
        if not self._skip:
            self.chunks.append(data)
        if self._title_state == 1:
            self._title_chunks.append(data)

    def title(self) -> Optional[str]:
        # bs4 soup.title.string semantics: string only for exactly one child
        if self._title_state == 0:
            return ""  # no <title> at all -> reference stores ""
        if len(self._title_chunks) == 1:
            return self._title_chunks[0]
        return None  # empty or multi-child title -> .string is None


def extract_one(html_text: str) -> tuple[Optional[str], str, int, list[str]]:
    ex = _Extractor()
    try:
        ex.feed(html_text)
        ex.close()
    except Exception:
        pass  # lenient like bs4's html.parser fallback
    raw = "".join(ex.chunks)
    # crawler.py:134-137 whitespace pipeline
    out: list[str] = []
    for line in raw.splitlines():
        for phrase in line.strip().split("  "):
            phrase = phrase.strip()
            if phrase:
                out.append(phrase)
    text = " ".join(out)[:TEXT_LIMIT]
    return ex.title(), text, len(ex.hrefs), ex.hrefs[:LINKS_LIMIT]


def _parse_batch(html: pd.Series) -> pd.DataFrame:
    titles, texts, counts, links = [], [], [], []
    for payload in html:
        if payload is None:
            titles.append(None)
            texts.append(None)
            counts.append(None)
            links.append(None)
            continue
        if isinstance(payload, (bytes, bytearray)):
            payload = bytes(payload).decode("utf-8", errors="ignore")
        t, x, c, l = extract_one(payload)
        titles.append(t)
        texts.append(x)
        counts.append(c)
        links.append(l)
    return pd.DataFrame(
        {"title": titles, "text": texts, "links_count": counts, "links": links}
    )


@pandas_udf(PARSED_SCHEMA)
def parse_html_udf(html: pd.Series) -> pd.DataFrame:
    return _parse_batch(html)


def with_parsed(df, html_col: str = "html", out_col: str = "parsed"):
    """Attach the parsed struct; keep the html column out of downstream
    projections (column pruning keeps the BINARY scan local to this stage)."""
    return df.withColumn(out_col, parse_html_udf(F.col(html_col)))
