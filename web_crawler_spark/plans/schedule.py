"""The frontier-scheduling plan — candidates -> budgeted fetch batch — with
its shuffles arranged so already-seen candidates never cross the fabric.

Per-row journey (the fabric-minimal shape for exact semantics):

    cand ──bloom prefilter (map-side, broadcast bitmaps)──┐
      definitely-new ────────────────────────────────┐    │
      maybe-seen ──exact anti-join vs url_seen───────┤    │ rediscoveries
                   (broadcast when seen fits; AQE    │    │ drop BEFORE any
                    picks SMJ otherwise — and then   │    │ exchange when the
                    the join's hash(url) output      │    │ seen side
                    partitioning is REUSED by the    │    │ broadcasts
                    dedup below: still one exchange) │    │
      kept = union ──Arrow map-side prune (local first-wins +
                     per-host top-budget, bounded rows)──────┘
      pruned ──THE exchange: repartition on host─────────── copart
      copart ──first-wins agg on (host, url)  [no exchange: host ⊆ keys]
             ──host budget rank               [no exchange: same host]── batch

Ordering safety: the bloom verdict is a pure function of the url, so every
copy of a url takes the same branch and the post-union first-wins sees the
whole url group — result identical to dedup-before-anti-join (equivalence
is pytest-asserted).  Anti-join-before-dedup is the fabric win: in a
steady-state crawl most candidates are rediscoveries of seen urls; with the
bloom split they die map-side (broadcast bitmap probe + broadcast/bucketed
exact check) instead of paying the dedup shuffle first.

The tail is co-partitioned (local-prune path): host = f(url), so a single
``repartition(host)`` co-locates every copy of a url AND every row of a
host; Catalyst's subset rule then satisfies both the ``(host, url)``
first-wins agg and the ``host`` budget window from that one exchange, where
the naive plan pays an url exchange for dedup plus a host exchange for the
window.  Host skew is bounded BECAUSE of the prune: each host ships at most
``budget x map-partitions`` rows regardless of corpus size (plan-asserted in
tests/test_schedule.py).

At 10^10 scale: the one exchange carries only never-seen, locally-pruned
urls (+ ~1% bloom fps).  Every other step is map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators import bloom as bloomlib
from ..operators import cuckoo as cuckoolib
from ..operators.dedup import anti_join_seen, first_wins
from ..operators.politeness import (
    local_host_prune,
    select_host_budget_batch,
    with_host,
)


def sketch_prefilter(
    cand: DataFrame,
    sketch: "bloomlib.ShardedBloom | cuckoolib.ShardedCuckoo | None",
    key_col: str = "url",
) -> tuple[DataFrame, DataFrame]:
    """(definitely_unseen, maybe_seen) split by whichever seen sketch is
    supplied — Bloom (OR-mergeable, smallest) or cuckoo (deletable, lower
    fp).  Both are pure volume optimizations; the exact anti-join that
    follows the maybe branch owns semantics."""
    if isinstance(sketch, cuckoolib.ShardedCuckoo):
        return cuckoolib.cuckoo_prefilter(cand, sketch, key_col=key_col)
    return bloomlib.bloom_prefilter(cand, sketch, key_col=key_col)


def dedup_unseen(
    cand: DataFrame,
    seen: DataFrame | None,
    order_cols: list[str],
    bloom: "bloomlib.ShardedBloom | cuckoolib.ShardedCuckoo | None" = None,
    url_col: str = "url",
) -> DataFrame:
    """candidates -> first-wins-deduped, never-seen urls (exact).  The sketch
    split (bloom or cuckoo) and the exact anti-join run BEFORE the dedup
    exchange so seen rediscoveries don't shuffle; correctness stays with the
    anti-join."""
    if seen is None:
        return first_wins(cand, url_col, order_cols)
    if bloom is None:
        # no sidecar: single-branch anti-join (broadcast when seen fits —
        # AQE's choice; a degenerate limit(0)-union here measurably degrades
        # the join plan, so the split only exists when a sketch does)
        kept = anti_join_seen(cand, seen, url_col)
    else:
        definitely_new, maybe = sketch_prefilter(cand, bloom, key_col=url_col)
        kept = definitely_new.unionByName(anti_join_seen(maybe, seen, url_col))
    return first_wins(kept, url_col, order_cols)


def schedule_frontier(
    cand: DataFrame,
    seen: DataFrame | None,
    order_cols: list[str],
    budget: int | None,
    bloom: "bloomlib.ShardedBloom | cuckoolib.ShardedCuckoo | None" = None,
    host_rules: DataFrame | None = None,
    salt_buckets: int | None = None,
    url_col: str = "url",
    local_prune: bool | None = None,
) -> DataFrame:
    """Full scheduling op: canonicalized candidates -> deduped unseen ->
    per-host politeness-budgeted batch (with host_rank).

    ``local_prune`` (default: on whenever it is exact — constant budget, no
    robots rules, no salting): after the anti-join, an Arrow map-side
    per-partition prune (local first-wins + per-host top-``budget``,
    operators/politeness.local_host_prune) bounds BOTH downstream exchanges
    at ``budget x hosts x partitions`` rows instead of every candidate — the
    fabric-volume fix for the N->4N scaling rule.  Semantics are identical
    (superset-of-winners proof on the prune; pytest equivalence in
    tests/test_schedule.py); robots rules disable it because a disallowed
    url must not occupy a prune slot."""
    if local_prune is None:
        local_prune = (
            budget is not None and host_rules is None and salt_buckets is None
        )
    if local_prune:
        if seen is None:
            kept = cand
        elif bloom is None:
            kept = anti_join_seen(cand, seen, url_col)
        else:
            definitely_new, maybe = sketch_prefilter(cand, bloom, key_col=url_col)
            kept = definitely_new.unionByName(anti_join_seen(maybe, seen, url_col))
        hosted = with_host(kept, url_col=url_col)
        pruned = local_host_prune(hosted, order_cols, budget, url_col=url_col)
        # ONE exchange serves both remaining keyed steps: host = f(url), so
        # hashpartitioning(host) co-locates every copy of a url AND every row
        # of a host — the first-wins agg grouped on (host, url) and the budget
        # window partitioned on host both have their clustering satisfied by
        # this single repartition (Catalyst's subset rule), where the naive
        # plan pays an url exchange for dedup plus a host exchange for the
        # window.  Skew-safe BECAUSE of the prune: each host ships at most
        # budget x map-partitions rows, so the hottest host's task is bounded
        # regardless of corpus size.
        copart = pruned.repartition(F.col("host"))
        winners = first_wins(copart, ["host", url_col], order_cols)
        return select_host_budget_batch(
            winners,
            order_cols=order_cols,
            budget=budget,
            host_rules=host_rules,
            salt_buckets=salt_buckets,
        )
    winners = dedup_unseen(cand, seen, order_cols, bloom, url_col)
    frontier = with_host(winners, url_col=url_col)
    return select_host_budget_batch(
        frontier,
        order_cols=order_cols,
        budget=budget,
        host_rules=host_rules,
        salt_buckets=salt_buckets,
    )
