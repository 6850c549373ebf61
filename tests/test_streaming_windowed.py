"""Watermarked tumbling-window streaming agg: closed windows emit exactly
once; rows later than the watermark are dropped."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from web_crawler_spark.streaming.windowed import run_windowed_available_now


def _rows(spark, rows):
    return spark.createDataFrame(
        [(datetime(2024, 1, 1, h, m), t, float(v)) for h, m, t, v in rows],
        "ts timestamp, event_type string, value double",
    )


def test_watermark_closes_windows_and_drops_late(spark, tmp_path):
    in_dir, out_dir, ck = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")

    # batch 1: hours 0..3, max ts 3:30 => watermark 2:30 closes windows
    # ending <= 2:30, i.e. hour-0 and hour-1 only
    batch1 = [(0, 10, "fetch", 1), (0, 20, "fetch", 2), (1, 5, "parse", 3),
              (2, 15, "fetch", 4), (3, 30, "parse", 5)]
    _rows(spark, batch1).coalesce(1).write.parquet(in_dir)
    run_windowed_available_now(spark, in_dir, out_dir, ck, window="1 hour", watermark="1 hour")
    got1 = {
        (r["window_start"].hour, r["event_type"]): r["n_events"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got1 == {(0, "fetch"): 2, (1, "parse"): 1}

    # batch 2: one very-late row (hour 0 — behind the watermark: dropped) and
    # fresh rows; max ts 5:30 => watermark 4:30 closes hour-2 and hour-3
    batch2 = [(0, 40, "fetch", 9), (4, 10, "fetch", 6), (5, 30, "parse", 7)]
    _rows(spark, batch2).coalesce(1).write.mode("append").parquet(in_dir)
    run_windowed_available_now(spark, in_dir, out_dir, ck, window="1 hour", watermark="1 hour")
    got2 = {
        (r["window_start"].hour, r["event_type"]): r["n_events"]
        for r in spark.read.parquet(out_dir).collect()
    }
    # hour-0 stays at 2 (late row dropped — its window was already finalized)
    assert got2[(0, "fetch")] == 2
    assert got2[(2, "fetch")] == 1 and got2[(3, "parse")] == 1
    assert (4, "fetch") not in got2  # not closed yet
    # emitted exactly once per (window, type)
    all_rows = spark.read.parquet(out_dir).groupBy("window_start", "event_type").count().collect()
    assert all(r["count"] == 1 for r in all_rows)


def test_stream_sessions_boundary_and_cross_batch_merge(spark, tmp_path):
    """Emission boundary: a session whose end EQUALS the watermark emits;
    one past it does not.  Events exactly gap apart merge (inclusive
    boundary), and merging works across micro-batches (two input files)."""
    import datetime as dt
    import os

    from web_crawler_spark.streaming.windowed import run_sessions_available_now

    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def mk(rows, sub):
        import glob
        import shutil

        df = spark.createDataFrame(
            rows, "ts timestamp, user_id bigint, event_type string"
        )
        stage = str(tmp_path / "stage" / sub)
        df.coalesce(1).write.parquet(stage)
        os.makedirs(str(tmp_path / "in"), exist_ok=True)
        shutil.copy(
            glob.glob(os.path.join(stage, "part-*.parquet"))[0],
            str(tmp_path / "in" / sub),
        )

    # file 1: uA event at 0:00; uB at 0:15; uC at 0:00
    mk(
        [
            (base, 1, "view"),
            (base + dt.timedelta(minutes=15), 2, "view"),
            (base, 3, "view"),
        ],
        "f1.parquet",
    )
    # file 2: uC again at exactly +30min (inclusive gap -> merges into one
    # session, across the file boundary); max-ts driver at 3:00
    mk(
        [
            (base + dt.timedelta(minutes=30), 3, "view"),
            (base + dt.timedelta(hours=3), 9, "view"),
        ],
        "f2.parquet",
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    run_sessions_available_now(
        spark, str(tmp_path / "in"), out, ck, gap="30 minutes", watermark="2 hours"
    )
    got = {
        r["user_id"]: (r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    # watermark = 3:00 - 2h = 1:00
    # uA: end 0:30 <= 1:00 -> emitted
    assert got[1] == (base, base + dt.timedelta(minutes=30), 1)
    # uB: end 0:45 <= 1:00 -> emitted
    assert got[2][2] == 1
    # uC: merged single session 0:00 + 0:30 events, end 1:00 == watermark
    # -> emitted (equality emits), n_events = 2 across the file boundary
    assert got[3] == (base, base + dt.timedelta(hours=1), 2)
    # u9 (max-ts driver): end 3:30 > 1:00 -> held in state, NOT emitted
    assert 9 not in got


def test_stream_interval_join_cross_batch(spark, tmp_path):
    """A view in batch 1 joins a click arriving in batch 2 (state kept
    until the watermark passes view_ts + within); pairs outside the
    30-min window never emit; self-pairs of the same type never emit."""
    import datetime as dt
    import glob
    import os
    import shutil

    from web_crawler_spark.streaming.windowed import (
        run_interval_join_available_now,
    )

    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def mk(rows, sub):
        df = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
        )
        stage = str(tmp_path / "stage" / sub)
        df.coalesce(1).write.parquet(stage)
        os.makedirs(str(tmp_path / "in"), exist_ok=True)
        shutil.copy(
            glob.glob(os.path.join(stage, "part-*.parquet"))[0],
            str(tmp_path / "in" / sub),
        )

    # batch 1: u1 view at 0:00; u2 view at 0:00; u1 click at 0:10 (in-batch pair)
    mk(
        [
            (1, base, 1, "view"),
            (2, base, 2, "view"),
            (3, base + dt.timedelta(minutes=10), 1, "click"),
        ],
        "f1.parquet",
    )
    # batch 2: u2 click at 0:20 (cross-batch pair, within 30m);
    # u1 click at 1:00 (outside 30m of the view) — no pair
    mk(
        [
            (4, base + dt.timedelta(minutes=20), 2, "click"),
            (5, base + dt.timedelta(hours=1), 1, "click"),
        ],
        "f2.parquet",
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    run_interval_join_available_now(spark, str(tmp_path / "in"), out, ck)
    got = {
        (r["view_id"], r["click_id"]): r["gap_us"]
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, 3): 600 * 10**6, (2, 4): 1200 * 10**6}


def test_stream_dedup_within_watermark_boundary(spark, tmp_path):
    """Probe-verified semantics (the contract the operator docstring
    pins): a cross-batch dup within the delay is suppressed exactly; a
    merely-LATE row — older than the watermark but with ts + delay still
    ahead of it — passes through and is emitted (the watermark bounds
    STATE, not input); and an input row is dropped iff it is EXPIRED on
    arrival (ts + delay <= current watermark), so a re-arrival of an
    evicted key is dropped rather than double-emitted."""
    import datetime as dt
    import glob
    import os
    import shutil

    from web_crawler_spark.streaming.windowed import (
        run_dedup_within_watermark_available_now,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    mtime = [1_700_000_000]

    def mk(rows, sub):
        df = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
        )
        stage = str(tmp_path / "stage" / sub)
        df.coalesce(1).write.parquet(stage)
        os.makedirs(str(tmp_path / "in"), exist_ok=True)
        dst = str(tmp_path / "in" / sub)
        shutil.copy(glob.glob(os.path.join(stage, "part-*.parquet"))[0], dst)
        # FileStreamSource with maxFilesPerTrigger orders by mtime; pin
        # strictly increasing mtimes so batch order is deterministic.
        mtime[0] += 60
        os.utime(dst, (mtime[0], mtime[0]))

    # batch 1: ids 1, 2; max ts = base+1h -> watermark after batch = base-1h
    mk([(1, base, 7, "view"), (2, base + dt.timedelta(hours=1), 7, "click")], "f1.parquet")
    # batch 2: dup of 1 (state alive) -> suppressed; id 3 at base-2h is
    # late vs the base-1h watermark but unexpired (base-2h + 2h = base >
    # base-1h) -> emitted; id 4 fresh
    mk(
        [
            (1, base, 7, "view"),
            (3, base - dt.timedelta(hours=2), 8, "view"),
            (4, base + dt.timedelta(hours=2), 9, "purchase"),
        ],
        "f2.parquet",
    )
    # batch 3: id 5 at base+10h drives the watermark to base+8h, past
    # id 1's eviction point (base + 2h delay)
    mk([(5, base + dt.timedelta(hours=10), 9, "view")], "f3.parquet")
    # batch 4: id 1 re-arrives after eviction, but it is expired on
    # arrival (base + 2h <= base+8h watermark) -> dropped, NOT re-emitted
    mk([(1, base, 7, "view")], "f4.parquet")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    run_dedup_within_watermark_available_now(
        spark, str(tmp_path / "in"), out, ck, delay="2 hours",
        max_files_per_trigger=1,
    )
    got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 4, 5]


def test_stream_state_upsert_accumulates_across_batches(spark, tmp_path):
    """Complete-mode foreachBatch upsert: counts accumulate across
    micro-batches, the serving table always reflects the LATEST snapshot
    (overwrite, not append), and the last-event pick follows the total
    (ts, event_id) order even when the later batch carries an older
    event."""
    import datetime as dt
    import glob
    import os
    import shutil

    from web_crawler_spark.streaming.windowed import (
        run_state_upsert_available_now,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    mtime = [1_700_000_000]

    def mk(rows, sub):
        df = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
        )
        stage = str(tmp_path / "stage" / sub)
        df.coalesce(1).write.parquet(stage)
        os.makedirs(str(tmp_path / "in"), exist_ok=True)
        dst = str(tmp_path / "in" / sub)
        shutil.copy(glob.glob(os.path.join(stage, "part-*.parquet"))[0], dst)
        mtime[0] += 60
        os.utime(dst, (mtime[0], mtime[0]))

    mk(
        [
            (1, base, 7, "view"),
            (2, base + dt.timedelta(hours=2), 7, "click"),
            (3, base, 9, "view"),
        ],
        "f1.parquet",
    )
    # batch 2: user 7 gets an OLDER event (must not displace the click);
    # user 9 gets a newer purchase
    mk(
        [
            (4, base - dt.timedelta(hours=1), 7, "signup"),
            (5, base + dt.timedelta(hours=1), 9, "purchase"),
        ],
        "f2.parquet",
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    run_state_upsert_available_now(
        spark, str(tmp_path / "in"), out, ck, max_files_per_trigger=1
    )
    got = {
        r["user_id"]: (r["n_events"], r["last_event_id"], r["last_event_type"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {7: (3, 2, "click"), 9: (2, 5, "purchase")}


def test_stream_static_enrich_left_join(spark, tmp_path):
    """Stream-static enrichment: matched users carry the dimension value,
    unmatched users flow through with NULL (left join, stateless), and
    enrichment spans micro-batches."""
    import datetime as dt
    import glob
    import os
    import shutil

    from web_crawler_spark.streaming.windowed import (
        run_static_enrich_available_now,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    mtime = [1_700_000_000]

    def mk(rows, sub):
        df = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
        )
        stage = str(tmp_path / "stage" / sub)
        df.coalesce(1).write.parquet(stage)
        os.makedirs(str(tmp_path / "in"), exist_ok=True)
        dst = str(tmp_path / "in" / sub)
        shutil.copy(glob.glob(os.path.join(stage, "part-*.parquet"))[0], dst)
        mtime[0] += 60
        os.utime(dst, (mtime[0], mtime[0]))

    mk([(1, base, 7, "view"), (2, base, 99, "click")], "f1.parquet")
    mk([(3, base, 8, "view")], "f2.parquet")
    static = spark.createDataFrame(
        [(7, "BUILDING"), (8, "AUTO")], "user_id bigint, segment string"
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    run_static_enrich_available_now(
        spark, str(tmp_path / "in"), static, out, ck, max_files_per_trigger=1
    )
    got = {
        r["event_id"]: r["segment"] for r in spark.read.parquet(out).collect()
    }
    assert got == {1: "BUILDING", 2: None, 3: "AUTO"}


def test_stream_outer_join_null_emission_boundary(spark, tmp_path):
    """LEFT OUTER interval join eviction contract, probe-pinned: an
    unmatched view NULL-emits iff view_ts + within < global watermark,
    where the global watermark is min(max view ts, max click ts) - delay
    (default min multi-watermark policy); a window closing exactly AT the
    watermark is held; matched pairs emit regardless."""
    import datetime as dt
    import glob
    import os
    import shutil

    from web_crawler_spark.streaming.windowed import (
        run_outer_interval_join_available_now,
    )

    def ts(h, m):
        return dt.datetime(2024, 1, 1, h, m, 0)

    def drive(rows, name):
        df = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
        )
        stage = str(tmp_path / name / "stage")
        df.coalesce(1).write.parquet(stage)
        ind = str(tmp_path / name / "in")
        os.makedirs(ind)
        shutil.copy(
            glob.glob(os.path.join(stage, "part-*.parquet"))[0],
            os.path.join(ind, "b1.parquet"),
        )
        run_outer_interval_join_available_now(
            spark,
            ind,
            str(tmp_path / name / "out"),
            str(tmp_path / name / "ck"),
            within="30 minutes",
            watermark="1 hour",
        )
        return {
            r["view_id"]: r["click_id"]
            for r in spark.read.parquet(str(tmp_path / name / "out")).collect()
        }

    rows = [
        (1, ts(10, 0), 1, "view"),     # vA: unmatched, closes 10:30
        (2, ts(10, 0), 2, "view"),     # vB
        (3, ts(10, 20), 2, "click"),   # cB matches vB
        (4, ts(12, 45), 3, "view"),    # vC: closes 13:15 -> held
        (5, ts(12, 30), 4, "view"),    # vD: closes 13:00 -> held (strict)
        (9, ts(14, 0), 9, "click"),    # late click advances the click max
    ]
    # global wm = min(max view 12:45, max click 14:00) - 1h = 11:45:
    # vA (10:30 < 11:45) emits NULL; vD (13:00) and vC (13:15) held.
    got = drive(rows, "late_click")
    assert got == {1: None, 2: 3}

    # same data but the late event is a VIEW: click max stays 10:20, so
    # wm = 9:20 and even vA is held — the min policy is what governs.
    rows2 = [r if r[0] != 9 else (9, ts(14, 0), 9, "view") for r in rows]
    got2 = drive(rows2, "late_view")
    assert got2 == {2: 3}
