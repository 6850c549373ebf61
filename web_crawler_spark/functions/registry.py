"""Pluggable parser registry — the engine's analog of the reference's
extension points (SURVEY.md §2.10):

* ``parser(url, html) -> dict``          (reference crawler.py:37,66)   [X1]
* ``extract_next_urls(data) -> [url]``   (reference chain_crawler.py:36) [X2]

A parser here is a *batch* function ``(pd.Series[url], pd.Series[str html])
-> pd.DataFrame`` with a declared Spark schema — the sync/async/thread
distinction of the reference disappears (executors are the parallelism, and
Arrow batches amortize the Python crossing).  Registered parsers become
scalar pandas UDFs; the crawl engine looks them up by name.

Chaining contract: a parser that wants to feed the next round must emit a
``links array<string>`` field (the default chain behavior,
chain_crawler.py:335-338); ``links_extractor`` can override how next-URLs
are derived from the parsed struct, mirroring ``ChainStep.extract_next_urls``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DataType

from . import html_parse


@dataclass
class RegisteredParser:
    name: str
    udf: Callable  # scalar pandas UDF: (url_series, html_series) -> DataFrame
    schema: DataType
    links_extractor: Optional[Callable[[Column], Column]]  # parsed -> array<string>


_REGISTRY: dict[str, RegisteredParser] = {}


def register_parser(
    name: str,
    batch_fn: Callable[[pd.Series, pd.Series], pd.DataFrame],
    schema: DataType,
    links_extractor: Optional[Callable[[Column], Column]] = None,
) -> RegisteredParser:
    """Register a vectorized parser.  ``batch_fn(urls, htmls)`` receives
    decoded-or-binary html payloads, returns one row per input with columns
    matching ``schema`` (a StructType)."""
    udf = pandas_udf(schema)(batch_fn)
    reg = RegisteredParser(name, udf, schema, links_extractor)
    _REGISTRY[name] = reg
    return reg


def get_parser(name: str) -> RegisteredParser:
    if name not in _REGISTRY:
        raise KeyError(f"no parser {name!r}; registered: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_parsers() -> list[str]:
    return sorted(_REGISTRY)


def _default_batch(urls: pd.Series, htmls: pd.Series) -> pd.DataFrame:
    return html_parse._parse_batch(htmls)


def default_links(parsed: Column) -> Column:
    return parsed["links"]


register_parser(
    "default",
    _default_batch,
    html_parse.PARSED_SCHEMA,
    links_extractor=default_links,
)


def with_parsed_by(df, parser_name: str, url_col: str = "url", html_col: str = "html"):
    reg = get_parser(parser_name)
    return df.withColumn("parsed", reg.udf(F.col(url_col), F.col(html_col)))
