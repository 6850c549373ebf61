"""The chain-crawl round loop — a BSP redesign of the reference's
``ChainCrawler`` (reference chain_crawler.py:397-415), structured per
SURVEY.md §3.2:

    round r:  batch    = frontier |> (politeness rank) |> (step cap)
              fetched  = batch ⋈ pages on url (left)          [J1]
              parsed   = fetched |> Arrow pandas-UDF parser    [P1]
              results += parsed (fetch log)                    [K3]
              links    = parsed |> posexplode(links)           [P3]
              next     = links |> canonicalize [P5] |> first-wins [F1]
                               |> bloom-prefiltered anti-join seen [F2]
              frontier'= (frontier − batch) ∪ retries ∪ next
              metrics += per-round aggregates [A2]; lineage += per-partition
              checkpoint snapshot(r)

Two modes:

* ``parity``  — exact reference semantics for golden comparison: no URL
  canonicalization (raw hrefs enqueued verbatim, chain_crawler.py:335-338),
  dedup only within a step (dict.fromkeys, :377-379), NO cross-step seen set,
  FIFO order = (parent position, link position), per-step head truncation
  (:285-287), no politeness.  The fetch log matches the 1-worker reference
  simulator row-for-row including global ``fetch_seq``.

* ``scale``   — the north-rule configuration: canonicalized URLs, persistent
  Bloom-prefiltered URL-seen set (enqueue-time dedup), per-host politeness
  budgets + optional robots rules, retry routing with demoted priority,
  unfetched remainder carried across rounds.

All driver-side state is scalar (round counter, fetch-seq offset); every
per-URL computation is a DataFrame op.  Rounds are checkpointed (parquet
snapshot + commit marker) which doubles as iterative-lineage truncation.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..functions import registry as parser_registry
from ..functions.urlnorm import canonicalize_udf, with_canonical_split
from ..operators.dedup import first_wins, anti_join_seen  # noqa: F401 (anti_join_seen re-exported for plans)
from .schedule import dedup_unseen
from ..operators.ordering import with_global_seq
from ..operators.politeness import select_host_budget_batch, with_host
from ..operators import bloom as bloomlib
from ..operators.seen_store import BucketedSeenStore
from .checkpoint import Checkpointer

RESULT_COLS = ["fetch_seq", "round", "url", "ok", "title", "text", "links_count", "links"]

RETRYABLE_PENALTY = 1 << 40  # demotes retried rows below all fresh work
INJECT_P0_BASE = 1 << 39  # injected urls sort after natural discoveries of
# their wave (parent positions are far smaller) but above retries


_PARSER_DEFAULT = object()  # sentinel: "use the step parser's own extractor"


@dataclass
class StepConfig:
    """Per-step pipeline configuration — the engine's ``ChainStep``
    (reference chain_crawler.py:24-43): each round of a chain may carry its
    own parser and its own next-URL extraction rule (the reference's
    listing-page -> detail-page pattern, example_chain_crawling.py).

    ``parser_name`` references the registry (functions/registry.py).
    ``links_extractor``: a Column function ``parsed -> array<string>``
    overriding the parser's registered extractor; ``None`` mirrors the
    reference's ``extract_next_urls=None`` => final step (no URLs extracted,
    the chain ends after this round); leave at the default sentinel to use
    the registered extractor."""

    parser_name: str = "default"
    links_extractor: "Callable[[Column], Column] | None | object" = _PARSER_DEFAULT
    name: Optional[str] = None


@dataclass
class CrawlConfig:
    rounds: int = 3
    # per-step configuration (ChainStep parity); when set, the number of
    # steps defines the number of rounds and `rounds` is ignored
    steps: Optional[list[StepConfig]] = None
    mode: str = "parity"  # 'parity' | 'scale'
    max_urls_per_step: Optional[int] = None
    host_budget: Optional[int] = None  # scale mode; None = unbudgeted
    max_retries: int = 0
    use_bloom: bool = True
    # bloom prefiltering pays once the seen-set dwarfs the candidate batch;
    # below this many attempted urls the exact anti-join alone is cheaper
    # than rebuilding the filter every round
    bloom_min_seen: int = 500_000
    # initial filter capacity = headroom x current seen count, so the
    # incremental per-round ORs have room to grow before a rebuild; when the
    # fill ratio crosses the rebuild threshold (saturation => fp climbs and
    # the prefilter stops paying) the filter is rebuilt from url_seen at the
    # next size tier
    bloom_growth_headroom: int = 8
    bloom_rebuild_fill: float = 0.55
    # None => rely on WindowGroupLimit partial top-k (Spark >= 3.5); int =>
    # explicit two-pass salted ranking (see operators/politeness.py)
    salt_buckets: int | None = None
    # record per-round executed-plan strings in engine.debug_plans (plan-shape
    # tests / debugging; costs a planning pass per captured frame)
    capture_plans: bool = False
    # scale-mode url_seen maintenance.  True (default): bucketed warehouse
    # table with per-round DELTA appends — O(|delta|) maintenance, and the
    # exact anti-join reads the bucket layout so only candidates exchange
    # (the 100×-safe shape; operators/seen_store.py).  False: in-memory
    # union + localCheckpoint — O(|seen|) rewrite per round; kept for
    # equivalence tests and tiny runs.
    use_seen_store: bool = True
    seen_table: Optional[str] = None  # default: auto-generated unique name
    seen_buckets: int = 64
    # rewrite the seen table to one file per bucket every N rounds (delta
    # appends add one file per bucket per round; long crawls compact so scan
    # file counts stay bounded).  None = never compact in-loop.
    seen_compact_every: Optional[int] = None
    # drop superseded heavy state snapshots (url_seen/frontier/host_state of
    # rounds older than the last committed) right after each commit — a
    # 1000-round crawl otherwise stores O(rounds x |seen|)
    # (checkpoint.Checkpointer.gc_state)
    checkpoint_gc: bool = False
    checkpoint_dir: Optional[str] = None
    resume: bool = False
    cache_pages: bool = True
    # registered parser (functions/registry.py) — the reference's pluggable
    # parser/extract_next_urls extension points (crawler.py:37, chain:36)
    parser_name: str = "default"
    # host cooldown — the Retry-After/rate-adaptation analog (SURVEY §4:
    # reference crawler.py:169-178): a host whose round failure ratio crosses
    # the threshold is skipped for the next `host_cooldown_rounds` rounds
    # (0 = off; its urls stay in the frontier and resurface after cooldown)
    host_cooldown_rounds: int = 0
    host_cooldown_fail_ratio: float = 0.5
    host_cooldown_min_fetches: int = 3
    # fetch-join strategy: batches up to this many rows broadcast to the pages
    # scan (html bytes never shuffle); larger batches fall back to AQE SMJ
    broadcast_batch_limit: int = 2_000_000


@dataclass
class CrawlState:
    round_idx: int
    frontier: DataFrame
    seen: Optional[DataFrame]
    host_state: Optional[DataFrame] = None  # (host, until_round) cooldowns
    results: list[DataFrame] = field(default_factory=list)
    metrics: list[dict] = field(default_factory=list)
    lineage: list[dict] = field(default_factory=list)
    fetch_offset: int = 0
    halted: bool = False  # frontier drained: the chain stops (no step stats)


class ChainCrawl:
    """Distributed chain crawl over a pages table.

    ``pages`` must expose (url, html); ``seeds`` must expose (seed_idx, url).
    """

    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        config: CrawlConfig,
        host_rules: DataFrame | None = None,
        acl_rules: DataFrame | None = None,
        dns: DataFrame | None = None,
    ):
        self.spark = spark
        self.pages = pages.select("url", "html")
        self.cfg = config
        if config.cache_pages:
            # rounds re-scan the pages table; keep it hot (deserialized columns
            # spill to disk when it outgrows executor memory)
            self.pages = self.pages.persist()
        self.host_rules = host_rules
        # compiled RFC 9309 ACL (sources/robots.acl_rules_from_robots):
        # scale mode gates every round's frontier map-side via the broadcast
        # rules table; disallowed urls leave the frontier permanently
        self.acl_rules = acl_rules
        # (host, ip) resolver table for IP-grain politeness (virtual-host
        # collapsing — see _select_batch); None keeps host-grain budgets
        self.dns = dns
        # steps define the round count (reference: `for step in steps`,
        # chain_crawler.py:408); the flat config is a single-parser chain
        self.n_rounds = len(config.steps) if config.steps else config.rounds
        step_parsers = (
            {s.parser_name for s in config.steps}
            if config.steps
            else {config.parser_name}
        )
        # fetch-log shape: 'rich' = default-parser columns; 'struct' = one
        # custom schema rides as a struct; 'json' = heterogeneous parsers
        # across steps, serialized so per-round results union cleanly
        if step_parsers == {"default"}:
            self._result_mode = "rich"
        elif len(step_parsers) == 1:
            self._result_mode = "struct"
        else:
            self._result_mode = "json"
        self.ckpt = Checkpointer(config.checkpoint_dir) if config.checkpoint_dir else None
        # incremental bloom sidecar: built once from the seen set, then OR'd
        # with each round's newly-enqueued delta — never rebuilt from scratch
        # (at 10^10 seen urls a full rebuild per round would dominate rounds)
        self._bloom: "object | None" = None
        # bucketed-delta url_seen store (scale mode; created by run())
        self._seen_store: BucketedSeenStore | None = None
        # round -> {frame_name: executed-plan string} when cfg.capture_plans
        self.debug_plans: dict[int, dict[str, str]] = {}
        # per-round parsed frames kept persisted when no checkpointer owns
        # the results' durability (see run_round / close)
        self._parsed_frames: list[DataFrame] = []

    def _make_seen_store(self) -> BucketedSeenStore:
        table = self.cfg.seen_table or f"wcs_seen_{uuid.uuid4().hex[:10]}"
        return BucketedSeenStore(self.spark, table, self.cfg.seen_buckets)

    # -- frontier construction ------------------------------------------------

    def initial_frontier(self, seeds: DataFrame) -> DataFrame:
        """Seed frontier: ordered first-wins dedup (cli.py:46), priority =
        (seed position, 0); scale mode canonicalizes seeds first."""
        s = seeds.select("seed_idx", "url")
        if self.cfg.mode == "scale":
            s = s.withColumn("url", canonicalize_udf(F.col("url"))).filter(
                F.col("url").isNotNull()
            )
        s = first_wins(s, "url", ["seed_idx"])
        f = s.select(
            "url",
            F.lit(0).alias("depth"),
            F.col("seed_idx").alias("p0"),
            F.lit(0).cast("long").alias("p1"),
            F.lit(0).alias("attempt"),
        )
        return with_host(f) if self.cfg.mode == "scale" else f

    # -- one round ------------------------------------------------------------

    def _select_batch(
        self, frontier: DataFrame, host_state: DataFrame | None = None, round_idx: int = 0
    ) -> tuple[DataFrame, DataFrame]:
        """Returns (batch with dense 'pos', remainder-left-in-frontier)."""
        cfg = self.cfg
        order = ["attempt", "depth", "p0", "p1"]
        if cfg.mode == "scale" and self.acl_rules is not None:
            # RFC 9309 gate BEFORE the remainder baseline: a disallowed url
            # is dropped for good (real crawlers never queue it), not
            # carried round-over-round like a cooled-down host
            from ..sources.robots import robots_allowed

            frontier = (
                robots_allowed(frontier, self.acl_rules)
                .where(F.col("allowed"))
                .drop("allowed", "win_len")
            )
        original = frontier
        if host_state is not None:
            # hosts on cooldown sit out the round; their urls stay in the
            # frontier (the remainder is computed from the ORIGINAL frontier)
            cooled = host_state.filter(F.col("until_round") > round_idx).select("host")
            frontier = frontier.join(cooled, on="host", how="left_anti")
        if cfg.mode == "scale" and (cfg.host_budget is not None or self.host_rules is not None):
            rank_input, rank_key = frontier, "host"
            if self.dns is not None and self.host_rules is None:
                # IP-grain politeness: vhosts sharing a server share ONE
                # budget (politeness.resolve_politeness_key — O(#hosts) agg
                # + broadcast attach, the frontier never shuffles here).
                # Per-host robots budget tables stay host-grain, so the two
                # compose only via the ACL pre-filter above.
                from ..operators.politeness import resolve_politeness_key

                rank_input = resolve_politeness_key(frontier, self.dns)
                rank_key = "ip_key"
            ranked = select_host_budget_batch(
                rank_input,
                order_cols=order,
                budget=cfg.host_budget,
                host_rules=self.host_rules,
                salt_buckets=cfg.salt_buckets,
                host_col=rank_key,
            )
            batch = ranked.drop("host_rank")
            if rank_key == "ip_key":
                batch = batch.drop("ip_key")
        else:
            batch = frontier
        batch = with_global_seq(batch, order, out_col="pos")
        if cfg.max_urls_per_step is not None:
            batch = batch.filter(F.col("pos") < cfg.max_urls_per_step)
        if cfg.mode == "scale":
            remainder = original.join(batch.select("url"), "url", "left_anti")
        else:
            remainder = frontier.limit(0)  # parity: undone rows are dropped (:285-287)
        return batch, remainder

    def _step(self, r: int) -> StepConfig:
        if self.cfg.steps:
            return self.cfg.steps[r]
        return StepConfig(parser_name=self.cfg.parser_name)

    def run_round(self, state: CrawlState) -> CrawlState:
        import time as _time

        _round_t0 = _time.monotonic()
        cfg = self.cfg
        r = state.round_idx
        is_final = r == self.n_rounds - 1

        seen_delta: Optional[DataFrame] = None  # this round's newly-enqueued urls

        batch, remainder = self._select_batch(
            state.frontier, host_state=state.host_state, round_idx=r
        )
        # batch derives from with_global_seq's eager localCheckpoint — reuse
        # recomputes at most a cheap filter, no extra persist needed
        batch_n = batch.count()
        if batch_n == 0:
            # distinguish "frontier drained" (chain stops BEFORE processing
            # the step — reference chain_crawler.py:409-411, no step stats)
            # from "every eligible host is on cooldown" (the round runs
            # empty and the cooldowns tick down).  Folding the stop into the
            # batch count saves the per-round emptiness probe job in the
            # common non-empty case
            cooling = (
                state.host_state is not None
                and state.frontier.limit(1).count() > 0
            )
            if not cooling:
                state.halted = True
                return state

        # fetch (J1).  The naive frontier-left-join-pages shuffles the whole
        # pages table — including html payloads — every round.  When the
        # round's batch is small enough to broadcast (the normal case: the
        # budgeted batch is orders of magnitude smaller than the web), split
        # into a broadcast inner join (html streams through the scan, zero
        # shuffle) plus a driver-cheap anti-join for the fetch failures.
        if batch_n <= cfg.broadcast_batch_limit:
            # Materialize `matched` eagerly: the miss anti-join and the parse
            # branch would otherwise EACH embed the pages-scan join (the union
            # executes it twice per round).  The frame is batch-sized by
            # construction (budgeted urls + their html), so the checkpoint is
            # cheap; the join itself runs exactly once.
            matched = self.pages.join(
                F.broadcast(batch), on="url", how="inner"
            ).localCheckpoint(eager=True)
            missed = batch.join(
                matched.select("url"), on="url", how="left_anti"
            ).withColumn("html", F.lit(None).cast("binary"))
            fetched = matched.select(*missed.columns).unionByName(missed)
        else:
            fetched = batch.join(self.pages, on="url", how="left")
        if cfg.capture_plans:
            self.debug_plans.setdefault(r, {})["fetched"] = (
                fetched._jdf.queryExecution().executedPlan().toString()
            )
        step = self._step(r)
        reg = parser_registry.get_parser(step.parser_name)
        with_data = parser_registry.with_parsed_by(fetched, step.parser_name)
        if step.links_extractor is None:
            # reference ChainStep(extract_next_urls=None) => final step: no
            # URLs extracted, the chain drains after this round
            links_col = F.lit(None).cast("array<string>")
            extracts = False
        elif step.links_extractor is _PARSER_DEFAULT:
            extracts = reg.links_extractor is not None
            links_col = (
                reg.links_extractor(F.col("parsed"))
                if extracts
                else F.lit(None).cast("array<string>")
            )
        else:
            links_col = step.links_extractor(F.col("parsed"))
            extracts = True
        core = [
            (F.col("pos") + F.lit(state.fetch_offset)).alias("fetch_seq"),
            F.lit(r).cast("int").alias("round"),
            "url",
            F.col("html").isNotNull().alias("ok"),
        ]
        if self._result_mode == "rich":
            shaped = [
                F.col("parsed.title").alias("title"),
                F.col("parsed.text").alias("text"),
                F.col("parsed.links_count").alias("links_count"),
                F.col("parsed.links").alias("links"),
            ]
        elif self._result_mode == "struct":
            # one custom schema rides along as a struct
            shaped = [F.col("parsed").alias("data")]
        else:  # heterogeneous per-step parsers: serialize for a clean union
            shaped = [F.to_json(F.col("parsed")).alias("data")]
        # chaining follows the STEP's extractor (reference extract_next_urls),
        # which may differ from the links column logged with the results
        extra_cols = [links_col.alias("__next"), "pos", "depth", "attempt"]
        if cfg.mode == "scale":
            extra_cols.append("host")  # cooldown accounting
        parsed = with_data.select(*core, *shaped, *extra_cols).persist()

        # per-partition lineage (round, partition, rows in/ok) — tiny agg,
        # collected to the driver so it never holds plan references
        lineage_rows = [
            {
                "round": r,
                "partition_id": row["partition_id"],
                "input_rows": row["input_rows"],
                "ok_rows": row["ok_rows"],
            }
            for row in parsed.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.count("*").alias("input_rows"),
                F.sum(F.col("ok").cast("long")).alias("ok_rows"),
            )
            .collect()
        ]

        results = parsed.select(
            *(
                RESULT_COLS
                if self._result_mode == "rich"
                else ["fetch_seq", "round", "url", "ok", "data"]
            )
        )
        # Without a checkpointer, results stays a cheap projection of the
        # persisted `parsed` (already materialized by the lineage job) — no
        # extra per-round job; the frames are released in close().  With a
        # checkpointer the parquet commit below is the durable copy.
        # success count falls out of the lineage partials — no extra job
        n_ok = sum(row["ok_rows"] or 0 for row in lineage_rows)
        metrics = {
            "round": r,
            "urls_processed": batch_n,
            "urls_succeeded": n_ok,
            "urls_failed": batch_n - n_ok,
        }

        # ---- next frontier ----
        if is_final:
            next_front = state.frontier.limit(0) if cfg.mode == "parity" else remainder
            new_seen = state.seen
            if cfg.mode == "parity" and extracts:
                # reference is_final_step() is `extract_next_urls is None`,
                # not positional (chain_crawler.py:42-43,330-338): a last
                # step WITH an extractor still extracts and counts
                # next_urls_found, even though the chain then ends
                metrics["next_urls_found"] = (
                    parsed.filter(F.col("ok"))
                    .select(F.explode(F.col("__next")))
                    .count()
                )
            else:
                metrics["next_urls_found"] = 0 if cfg.mode == "parity" else None
        else:
            links = (
                parsed.filter(F.col("ok"))
                .select(
                    F.col("pos").alias("p0"),
                    F.col("depth").alias("parent_depth"),
                    F.posexplode(F.col("__next")).alias("p1", "url"),
                )
            )
            if cfg.mode == "scale":
                # JVM fast-mask split: only messy hrefs pay the Arrow/Python
                # crossing; branch recompute reads the persisted `parsed`
                links = with_canonical_split(links).filter(
                    F.col("url").isNotNull()
                )
            cand = links.select(
                "url",
                (F.col("parent_depth") + 1).alias("depth"),
                "p0",
                F.col("p1").cast("long").alias("p1"),
                F.lit(0).alias("attempt"),
            )
            # pre-dedup discovery count is a parity-mode stat (A2); in scale
            # mode skip the extra pass over the links
            metrics["next_urls_found"] = (
                cand.count() if cfg.mode == "parity" else None
            )

            if cfg.mode == "scale":
                # enqueue-time global dedup: drop anything ever enqueued.
                # The bloom split + exact anti-join run BEFORE the dedup
                # exchange (plans/schedule.py): rediscovered urls — the bulk
                # of a steady-state crawl's candidates — die map-side instead
                # of paying the dedup shuffle
                assert state.seen is not None
                bloom = None
                if cfg.use_bloom and state.fetch_offset + batch_n >= cfg.bloom_min_seen:
                    if self._bloom is None:  # first crossing / after resume
                        self._bloom = bloomlib.build_bloom(
                            state.seen,
                            "url",
                            bloomlib.params_for(
                                cfg.bloom_growth_headroom * state.seen.count()
                            ),
                        )
                    bloom = self._bloom
                survivors = dedup_unseen(
                    cand, state.seen, ["depth", "p0", "p1"], bloom
                )
                if cfg.capture_plans:
                    self.debug_plans.setdefault(r, {})["dedup"] = (
                        survivors._jdf.queryExecution().executedPlan().toString()
                    )
                # materialize once; frontier', seen' and the bloom delta all
                # read it without recomputing the dedup/anti-join chain
                survivors = with_host(survivors).localCheckpoint(eager=True)
                if self._bloom is not None:
                    self._bloom.or_with(
                        bloomlib.build_bloom(survivors, "url", self._bloom.params)
                    )
                # retry routing: failed fetches with attempts left re-enqueue
                retries = (
                    parsed.filter(~F.col("ok") & (F.col("attempt") < cfg.max_retries))
                    .select(
                        "url",
                        "depth",
                        (F.col("pos") + F.lit(RETRYABLE_PENALTY)).alias("p0"),
                        F.lit(0).cast("long").alias("p1"),
                        (F.col("attempt") + 1).alias("attempt"),
                    )
                )
                retries = with_host(retries)
                next_front = remainder.unionByName(survivors).unionByName(retries)
                # survivors are distinct and anti-joined vs seen, so the union
                # stays distinct by construction — no extra shuffle needed
                seen_delta = survivors.select("url")
                if self._seen_store is not None:
                    # O(|delta|) maintenance: append only this round's new
                    # urls into the bucketed table; the full seen set is
                    # never rewritten or re-shuffled (survivors is already
                    # materialized, so the append re-reads the checkpoint)
                    self._seen_store.append(seen_delta)
                    if (
                        cfg.seen_compact_every
                        and (r + 1) % cfg.seen_compact_every == 0
                    ):
                        self._seen_store.compact()
                    new_seen = self._seen_store.df()
                else:
                    new_seen = state.seen.unionByName(seen_delta)
                if (
                    self._bloom is not None
                    and self._bloom.fill_ratio() > cfg.bloom_rebuild_fill
                ):
                    # saturating: rebuild from the authoritative (post-round)
                    # seen set at the next size tier — fp would otherwise
                    # climb until the prefilter passes everything through
                    self._bloom = bloomlib.build_bloom(
                        new_seen,
                        "url",
                        bloomlib.params_for(
                            2 * self._bloom.params.total_bits // bloomlib.BITS_PER_KEY
                        ),
                    )
            else:
                # parity: within-step first-wins only (dict.fromkeys,
                # chain_crawler.py:377-379), no cross-step seen set
                next_front = first_wins(cand, "url", ["depth", "p0", "p1"])
                new_seen = None

        # host cooldown update (Retry-After analog): hosts failing hard this
        # round sit out the next cooldown_rounds rounds
        new_host_state = state.host_state
        if cfg.mode == "scale" and cfg.host_cooldown_rounds > 0:
            fail = (
                parsed.groupBy("host")
                .agg(
                    F.count("*").alias("n"),
                    F.sum((~F.col("ok")).cast("long")).alias("fails"),
                )
                .filter(
                    (F.col("n") >= cfg.host_cooldown_min_fetches)
                    & (
                        F.col("fails").cast("double") / F.col("n")
                        >= cfg.host_cooldown_fail_ratio
                    )
                )
                .select(
                    "host",
                    F.lit(r + 1 + cfg.host_cooldown_rounds).alias("until_round"),
                )
            )
            if state.host_state is not None:
                still = state.host_state.filter(F.col("until_round") > r + 1)
                new_host_state = still.unionByName(fail)
            else:
                new_host_state = fail
            new_host_state = new_host_state.localCheckpoint(eager=True)

        batch_n = metrics["urls_processed"]
        state_next = CrawlState(
            round_idx=r + 1,
            frontier=next_front,
            seen=new_seen,
            host_state=new_host_state,
            results=state.results + [results],
            metrics=state.metrics + [metrics],
            lineage=state.lineage + lineage_rows,
            fetch_offset=state.fetch_offset + batch_n,
        )

        # Lineage truncation is mandatory each round: without it round r's plan
        # embeds rounds 0..r-1 and the final collect recomputes the whole crawl
        # recursively (SURVEY.md §4 item 4).  With a checkpointer, the parquet
        # snapshot IS the truncation (and buys resumability); without one,
        # eager localCheckpoint materializes to executor-local storage.
        if self.ckpt is not None:
            tables = {"frontier": next_front, "results": results}
            if new_seen is not None:
                if self._seen_store is not None:
                    # store mode checkpoints only the DELTA (O(|delta|) IO);
                    # resume rebuilds the table from base + committed deltas
                    if seen_delta is not None:
                        tables["url_seen_delta"] = seen_delta
                else:
                    tables["url_seen"] = new_seen
            if new_host_state is not None:
                # without this, resume forgets active cooldowns and refetches
                # failing hosts immediately (diverging from an uninterrupted
                # run whenever host_cooldown_rounds > 0)
                tables["host_state"] = new_host_state
            # R4 progress observability: per-round wall time must be stamped
            # BEFORE commit_round json-dumps the info dict, or checkpointed
            # round info never carries it and a resumed run rebuilds metrics
            # with a different shape than the live run.  The stamp therefore
            # excludes the checkpoint-commit tail itself (accepted trade:
            # identical live/resumed metrics beat including the IO tail).
            metrics["round_wall_s"] = round(_time.monotonic() - _round_t0, 3)
            self.ckpt.commit_round(
                r,
                tables,
                info={
                    "metrics": metrics,
                    "fetch_offset": state_next.fetch_offset,
                    "lineage": lineage_rows,
                },
            )
            if cfg.checkpoint_gc:
                self.ckpt.gc_state(keep_last=1, last=r)
            state_next.frontier = self.ckpt.read(self.spark, r, "frontier")
            state_next.results[-1] = self.ckpt.read(self.spark, r, "results")
            if new_seen is not None and self._seen_store is None:
                state_next.seen = self.ckpt.read(self.spark, r, "url_seen")
        else:
            state_next.frontier = next_front.localCheckpoint(eager=True)
            # results already localCheckpointed above
            if new_seen is not None and self._seen_store is None:
                state_next.seen = new_seen.localCheckpoint(eager=True)
            # store mode: new_seen is already a plain table read — no lineage
            # to truncate and nothing to re-materialize
        if self.ckpt is None:
            # results projects from this persisted frame across the crawl's
            # lifetime; released in close()
            self._parsed_frames.append(parsed)
        else:
            parsed.unpersist()
        # Per-round wall time for the non-checkpointed path (driver clock,
        # includes the localCheckpoint truncation tail).  The checkpointed
        # path stamped this before commit_round above so resumed runs see
        # the same metrics shape; don't overwrite that value here.
        metrics.setdefault(
            "round_wall_s", round(_time.monotonic() - _round_t0, 3)
        )
        return state_next

    def close(self) -> None:
        """Release the pages cache and drop the auto-created seen table
        (benchmarks/back-to-back runs would otherwise stack persisted copies
        and litter the warehouse).  A checkpointed crawl stays resumable —
        resume rebuilds the seen table from the committed deltas."""
        if self.cfg.cache_pages:
            self.pages.unpersist()
        if self._seen_store is not None:
            self._seen_store.drop()
            self._seen_store = None
        for df in self._parsed_frames:
            df.unpersist()
        self._parsed_frames = []

    def _resume_seen(self, last: int) -> DataFrame:
        """Seen set as of committed round ``last``.  Store mode rebuilds the
        bucketed table once from base + committed deltas (O(|seen|) at resume
        time only — never on the round loop); legacy mode reads the full
        url_seen snapshot."""
        if not self.cfg.use_seen_store:
            return self.ckpt.read(self.spark, last, "url_seen")
        self._seen_store = self._make_seen_store()
        acc = self.spark.read.parquet(os.path.join(self.ckpt.root, "url_seen_base"))
        for rr in range(last + 1):
            p = self.ckpt.table_path(rr, "url_seen_delta")
            if os.path.exists(p):
                acc = acc.unionByName(self.ckpt.read(self.spark, rr, "url_seen_delta"))
        self._seen_store.create(acc)
        return self._seen_store.df()

    # -- mid-crawl URL injection ----------------------------------------------

    def add_urls(self, state: CrawlState, urls: DataFrame) -> CrawlState:
        """Mid-crawl URL injection — the reference's ``add_urls``
        (reference crawler.py:373-376: append to the live work queue).

        ``urls`` needs a ``url`` column; an optional ``pos`` long column fixes
        the input order (defaults to url sort order — injection sources
        should pass ``pos`` when arrival order matters).  Injected urls are
        canonicalized (scale mode), first-wins deduped, anti-joined against
        the seen set (a seen url is never refetched), enqueued at the tail of
        the current wave (``depth = next round``, ``p0 = INJECT_P0_BASE`` so
        natural discoveries of the wave keep priority, ``p1`` = input order),
        and appended to the seen set/bloom so later natural rediscoveries die
        at enqueue time.  Like the reference's in-memory queue append, an
        injection is not itself checkpointed — it becomes durable with the
        NEXT round's commit."""
        cfg = self.cfg
        s = urls
        if "pos" not in s.columns:
            s = s.withColumn("pos", F.lit(0).cast("long"))
        s = s.select("url", F.col("pos").cast("long").alias("pos"))
        if cfg.mode == "scale":
            s = s.withColumn("url", canonicalize_udf(F.col("url"))).filter(
                F.col("url").isNotNull()
            )
        s = first_wins(s, "url", ["pos"])
        s = with_global_seq(s, ["pos", "url"], out_col="p1")
        inj = s.select(
            "url",
            F.lit(state.round_idx).cast("int").alias("depth"),
            F.lit(INJECT_P0_BASE).cast("long").alias("p0"),
            F.col("p1").cast("long").alias("p1"),
            F.lit(0).alias("attempt"),
        )
        new_seen = state.seen
        if cfg.mode == "scale":
            if state.seen is not None:
                inj = anti_join_seen(inj, state.seen)
            inj = with_host(inj).localCheckpoint(eager=True)
            if state.seen is not None:
                if self._seen_store is not None:
                    self._seen_store.append(inj.select("url"))
                    new_seen = self._seen_store.df()
                else:
                    new_seen = state.seen.unionByName(
                        inj.select("url")
                    ).localCheckpoint(eager=True)
            if self._bloom is not None:
                self._bloom.or_with(
                    bloomlib.build_bloom(inj, "url", self._bloom.params)
                )
        else:
            # parity: within-injection dedup only (the reference's add_urls
            # appends verbatim to a queue the base loop dedups per step)
            inj = inj.localCheckpoint(eager=True)
        return CrawlState(
            round_idx=state.round_idx,
            frontier=state.frontier.unionByName(inj),
            seen=new_seen,
            host_state=state.host_state,
            results=state.results,
            metrics=state.metrics,
            lineage=state.lineage,
            fetch_offset=state.fetch_offset,
        )

    # -- full run -------------------------------------------------------------

    def run(
        self,
        seeds: DataFrame,
        stop_after_round: int | None = None,
        extra_urls_provider: "Callable[[int, CrawlState], DataFrame | None] | None" = None,
    ) -> CrawlState:
        """Run the round loop; ``stop_after_round=r`` simulates an
        interruption after round r commits (crash-recovery testing).

        ``extra_urls_provider(finished_round, state)`` is called between
        rounds (the discovery-feed hook): returning a DataFrame of urls
        injects them via :meth:`add_urls` before the next round; ``None``
        injects nothing."""
        cfg = self.cfg
        start_round = 0
        state = None
        if cfg.resume and self.ckpt is not None:
            last = self.ckpt.last_committed()
            if last is not None:
                info = self.ckpt.read_info(last)
                state = CrawlState(
                    round_idx=last + 1,
                    frontier=self.ckpt.read(self.spark, last, "frontier"),
                    seen=(
                        self._resume_seen(last) if cfg.mode == "scale" else None
                    ),
                    host_state=(
                        self.ckpt.read(self.spark, last, "host_state")
                        if os.path.exists(self.ckpt.table_path(last, "host_state"))
                        else None
                    ),
                    results=[
                        self.ckpt.read(self.spark, rr, "results")
                        for rr in range(last + 1)
                    ],
                    metrics=[
                        self.ckpt.read_info(rr)["metrics"] for rr in range(last + 1)
                    ],
                    lineage=[
                        row
                        for rr in range(last + 1)
                        for row in self.ckpt.read_info(rr).get("lineage", [])
                    ],
                    fetch_offset=info["fetch_offset"],
                )
                start_round = last + 1
        if state is None:
            frontier = self.initial_frontier(seeds)
            seen = None
            if cfg.mode == "scale":
                if cfg.use_seen_store:
                    self._seen_store = self._make_seen_store()
                    self._seen_store.create(frontier.select("url"))
                    if self.ckpt is not None:
                        # the resume base: deltas alone don't include the
                        # seeds (round deltas start at round 0's discoveries)
                        self._seen_store.df().write.mode("overwrite").parquet(
                            os.path.join(self.ckpt.root, "url_seen_base")
                        )
                    seen = self._seen_store.df()
                else:
                    seen = frontier.select("url")
            state = CrawlState(round_idx=0, frontier=frontier, seen=seen)

        for r in range(start_round, self.n_rounds):
            state = self.run_round(state)
            if state.halted:
                break
            if extra_urls_provider is not None and r + 1 < self.n_rounds:
                extra = extra_urls_provider(r, state)
                if extra is not None:
                    state = self.add_urls(state, extra)
            if stop_after_round is not None and r >= stop_after_round:
                break
        return state

    # -- result access --------------------------------------------------------

    @staticmethod
    def fetch_log(state: CrawlState) -> DataFrame:
        out = None
        for df in state.results:
            out = df if out is None else out.unionByName(df)
        return out
