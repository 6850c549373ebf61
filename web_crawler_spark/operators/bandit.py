"""UCB1-style host-yield bandit for frontier scheduling.

A revisit-ordering policy the reference's FIFO frontier cannot express but a
production crawler wants: treat each host as a bandit arm, reward a fetch
that yields new outlinks, and rank hosts by an upper-confidence score so the
scheduler balances exploiting high-yield hosts against exploring rarely
fetched ones (Auer et al. 2002 UCB1; applied to focused crawling e.g. in
"Bandit-based crawl ordering" literature).

Determinism across engines is the design constraint: classic UCB1 needs
``sqrt(2 ln N / n_h)`` — transcendentals whose last-ulp behavior differs
between the JVM and DuckDB, so the score here is the *integer-exact log2
variant*: the exploration bonus uses ``floor(log2(N))`` computed as
``length(bin(N)) - 1`` (pure integer both engines) and all terms are
fixed-point ppm with integer division:

    ucb_ppm(h) = (reward_sum * 1e6) DIV pulls
               + (C * 1e6 * floor(log2(N))) DIV pulls

Same argmax structure as UCB1 (mean yield + bonus shrinking with pulls,
growing with total experience), bit-identical in Spark and any ANSI engine.

Scale shape: per-host tallies are ONE partial-agg'd exchange on host; the
total-pull count joins back as a broadcast scalar; the global rank uses the
two-job range-partition dense sequence (operators/ordering.py), never a
single-partition window — at 10^8 hosts every step stays O(n/p) per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from web_crawler_spark.operators.ordering import with_global_seq

PPM = 1_000_000


def host_ucb(fetch_log: DataFrame, c: int = 2) -> DataFrame:
    """Per-host UCB1-log2 scheduling scores from a crawl fetch log.

    ``fetch_log`` needs columns ``host`` (arm), ``ok`` (fetch succeeded) and
    ``links_count`` (outlinks discovered; <=0 or null = no yield).  A pull is
    any fetch; the reward is 1 when the fetch succeeded AND discovered at
    least one outlink (the "new frontier mass per fetch" yield signal).

    Returns (host, pulls, reward_sum, ucb_ppm, rank) — rank 1 = fetch next,
    ties broken by host string for a total order.
    """
    reward = F.when(
        F.col("ok") & (F.coalesce(F.col("links_count"), F.lit(0)) > 0), 1
    ).otherwise(0)
    per_host = fetch_log.groupBy("host").agg(
        F.count("*").cast("long").alias("pulls"),
        F.sum(reward).cast("long").alias("reward_sum"),
    )
    totals = per_host.agg(F.sum("pulls").cast("long").alias("n_total"))
    scored = per_host.crossJoin(F.broadcast(totals)).withColumn(
        "ucb_ppm",
        F.expr(
            f"(reward_sum * {PPM}) DIV pulls"
            f" + ({c} * {PPM} * (length(bin(n_total)) - 1)) DIV pulls"
        ).cast("long"),
    )
    ranked = with_global_seq(
        scored.withColumn("__neg", -F.col("ucb_ppm")),
        ["__neg", "host"],
        out_col="rank",
        start=1,
    )
    return ranked.select("host", "pulls", "reward_sum", "ucb_ppm", "rank")
