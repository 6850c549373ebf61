"""Order-stable dedup + seen-set membership.

First-wins dedup reproduces the reference's ``list(dict.fromkeys(urls))``
(reference chain_crawler.py:377-379, cli.py:46): for each key keep the row
with the smallest priority tuple.  Implemented as a hash aggregation
(``min(struct(priority..., payload...))``) — one shuffle on the key, map-side
partial aggregation for free, no windows.  ``dropDuplicates`` must NOT be used
where order parity matters (it keeps an arbitrary partition-order row).

Seen-set membership is an exact ``left_anti`` join (the only semantics-bearing
filter); ``bloom.py`` provides the shuffle-volume prefilter in front of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def first_wins(
    df: DataFrame, key: str | list[str], order_cols: list[str]
) -> DataFrame:
    """Keep, per ``key``, the row minimal in ``order_cols`` (lexicographic).
    All other columns ride along inside the min-struct, so the result carries
    the winning row's full payload.  Requires order_cols to be orderable and
    non-null on rows that matter.

    ``key`` may be a composite (e.g. ``["host", "url"]`` where host is a
    function of url — identical groups to plain ``url``): grouping on the
    superset lets Catalyst satisfy the agg's clustering requirement from an
    existing ``hashpartitioning(host)`` exchange, so the dedup rides a
    partitioning already paid for instead of adding its own (see
    plans/schedule.py)."""
    keys = [key] if isinstance(key, str) else list(key)
    payload = [c for c in df.columns if c not in keys]
    packed = F.min(F.struct(*[F.col(c) for c in order_cols],
                            *[F.col(c) for c in payload if c not in order_cols]))
    agg = df.groupBy(*keys).agg(packed.alias("__w"))
    keep = [F.col("__w")[c].alias(c) for c in order_cols]
    keep += [F.col("__w")[c].alias(c) for c in payload if c not in order_cols]
    return agg.select(*[F.col(k) for k in keys], *keep)


def anti_join_seen(candidates: DataFrame, seen: DataFrame, key: str = "url") -> DataFrame:
    """Exact not-in-seen filter (SURVEY.md §2.3 F2). Never replace with a
    Bloom-only check — false positives would drop real URLs."""
    return candidates.join(seen.select(key), on=key, how="left_anti")


SEEN_BUCKETS = 64


def write_bucketed_seen(seen: DataFrame, table_name: str, buckets: int = SEEN_BUCKETS) -> None:
    """Persist the url_seen set hash-bucketed (+sorted) by url.

    At 10^10 seen urls the per-round exact anti-join cannot broadcast the
    seen side, and a plain sort-merge would RE-SHUFFLE the entire seen set
    every round.  Bucketing gives the join the seen side's distribution for
    free: only the (bloom-thinned) candidate side exchanges into the bucket
    layout — the same only-the-small-side-moves property the bucketed pages
    table gives the fetch join (sources/pages.py)."""
    (
        seen.write.mode("overwrite")
        .bucketBy(buckets, "url")
        .sortBy("url")
        .format("parquet")
        .saveAsTable(table_name)
    )


def read_bucketed_seen(spark, table_name: str) -> DataFrame:
    return spark.table(table_name)
