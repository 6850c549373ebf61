"""Event-analytics queries: gap sessionization (incl. the exact-boundary
semantics) and rollup, differentially against DuckDB."""

from __future__ import annotations

import duckdb
import pandas as pd

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    return con


def _cmp(spark_df, duck_rel, keys):
    got = spark_df.toPandas().sort_values(keys).reset_index(drop=True)
    want = duck_rel.df().sort_values(keys).reset_index(drop=True)
    got, want = got[sorted(got.columns)], want[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sessions_vs_duckdb(spark):
    con = _duck()
    _cmp(
        entry.q_events_sessions(spark, SF_DIR),
        con.sql(entry._oracle_sql_for("0.001")["events_sessions"]),
        ["user_id", "session_start"],
    )


def test_rollup_vs_duckdb(spark):
    con = _duck()
    _cmp(
        entry.q_events_rollup(spark, SF_DIR),
        con.sql(entry._oracle_sql_for("0.001")["events_rollup"]),
        ["is_total", "event_type"],
    )


def test_session_gap_boundary_semantics(spark):
    """Spark's session_window MERGES events exactly gap apart (inclusive
    boundary); only a strictly larger gap opens a new session.  The oracle
    encodes the same rule (>) — locked here with crafted boundary data in
    BOTH engines."""
    from pyspark.sql import functions as F

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        (1, base),                                  # session 1
        (1, base + pd.Timedelta(minutes=29)),       # same session (< gap)
        (1, base + pd.Timedelta(minutes=59)),       # exactly 30m after prev: merges
        (2, base),
        (2, base + pd.Timedelta(minutes=30)),       # exactly gap: merges
        (2, base + pd.Timedelta(minutes=61)),       # 31m after prev: NEW session
    ]
    ev = spark.createDataFrame(
        [(u, t.to_pydatetime()) for u, t in rows], "user_id bigint, ts timestamp"
    )
    got = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("w.start").alias("s"), "n")
        .toPandas()
        .sort_values(["user_id", "s"])
        .reset_index(drop=True)
    )
    sessions = [(r.user_id, r.n) for r in got.itertuples()]
    assert sessions == [(1, 3), (2, 2), (2, 1)]

    ev_pd = ev.toPandas()
    con = duckdb.connect()
    con.register("events", ev_pd)
    oracle = entry._oracle_sql_for("0.001")["events_sessions"]
    want = con.sql(oracle).df().sort_values(["user_id", "session_start"])
    assert [(r.user_id, r.n_events) for r in want.itertuples()] == sessions


def test_events_funnel_ordering_semantics(spark, tmp_path):
    """A click BEFORE the first view must not count as stage 2; equal
    timestamps count (>=); users with no view are stage 0."""
    import datetime as dt
    import os

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1: full funnel in order
        (1, t(0), 1, "view", 0.0, ""), (2, t(1), 1, "click", 0.0, ""),
        (3, t(2), 1, "purchase", 0.0, ""),
        # u2: click precedes the first view -> never reaches stage 2
        (4, t(0), 2, "click", 0.0, ""), (5, t(1), 2, "view", 0.0, ""),
        # u3: view and click at the SAME instant -> >= counts it
        (6, t(0), 3, "view", 0.0, ""), (7, t(0), 3, "click", 0.0, ""),
        # u4: purchase only -> stage 0
        (8, t(0), 4, "purchase", 0.0, ""),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # Spark rejects NANOS parquet
    d = tmp_path / "ev"
    os.makedirs(d)
    pdf.to_parquet(str(d / "events.parquet"))
    out = entry.q_events_funnel(spark, str(d))
    got = {r.user_id: (r.stage, r.t2_us is not None, r.t3_us is not None)
           for r in out.collect()}
    assert got[1] == (3, True, True)
    assert got[2] == (1, False, False)
    assert got[3] == (2, True, False)
    assert got[4] == (0, False, False)
    # oracle parity on the same frame
    con = duckdb.connect()
    con.register("events", pdf)
    want = con.sql(entry._oracle_sql_for("0.001")["events_funnel"]).df()
    assert {
        int(r["user_id"]): (int(r["stage"]), pd.notna(r["t2_us"]), pd.notna(r["t3_us"]))
        for _, r in want.iterrows()
    } == got


def test_events_retention_vs_duckdb(spark):
    con = _duck()
    got = entry.q_events_retention(spark, SF_DIR)
    want = con.sql(entry._oracle_sql_for("0.001")["events_retention"])
    _cmp(got, want, ["cohort_week", "week_offset"])
    # offset 0 always exists (every cohort is active in its own first week)
    pdf = got.toPandas()
    assert (pdf.groupby("cohort_week")["week_offset"].min() == 0).all()


def test_events_anomaly_crafted(spark, tmp_path):
    import datetime as dt

    # flat 10/hour baseline with one 100-event spike and one 0-dev hour;
    # the spike must flag, the baseline hours must not
    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(24):
        n = 100 if h == 12 else 10
        for i in range(n):
            rows.append((h * 1000 + i, base + dt.timedelta(hours=h, seconds=i), 7, "view", 0.0, ""))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    p = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(p)
    got = entry.q_events_anomaly(spark, str(tmp_path)).toPandas()
    flagged = set(got[got["is_anomaly"]]["hour"] - got["hour"].min())
    assert flagged == {12}
    # oracle parity on the same frame
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}/*.parquet')")
    want = con.sql(entry._oracle_sql_for("0.001")["events_anomaly"])
    _cmp(entry.q_events_anomaly(spark, str(tmp_path)), want, ["event_type", "hour"])


def test_events_asof_semantics(spark, tmp_path):
    import datetime as dt
    import os

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1: view@0, view@5, purchase@7 -> last view 5; purchase@3 -> view 0
        (1, t(0), 1, "view", 0.0, ""), (2, t(5), 1, "view", 0.0, ""),
        (3, t(7), 1, "purchase", 0.0, ""), (4, t(3), 1, "purchase", 0.0, ""),
        # u2: purchase with NO prior view -> NULL; a later view must not count
        (5, t(1), 2, "purchase", 0.0, ""), (6, t(2), 2, "view", 0.0, ""),
        # u3: view and purchase at the SAME instant -> the view counts
        (7, t(4), 3, "view", 0.0, ""), (8, t(4), 3, "purchase", 0.0, ""),
        # other event types are ignored entirely
        (9, t(0), 1, "click", 0.0, ""),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    d = tmp_path / "ev"
    os.makedirs(d)
    pdf.to_parquet(str(d / "events.parquet"))
    out = entry.q_events_asof(spark, str(d)).toPandas()
    got = {
        int(r["event_id"]): (None if pd.isna(r["last_view_ts_us"])
                             else int(r["last_view_ts_us"]))
        for _, r in out.iterrows()
    }
    us = lambda m: int(dt.datetime(2024, 1, 1, 0, m).timestamp() * 1e6)  # noqa: E731
    assert got == {3: us(5), 4: us(0), 5: None, 8: us(4)}
    # oracle parity on the same frame
    con = duckdb.connect()
    con.register("events", pdf)
    want = con.sql(entry._oracle_sql_for("0.001")["events_asof"]).df()
    assert {
        int(r["event_id"]): (None if pd.isna(r["last_view_ts_us"])
                             else int(r["last_view_ts_us"]))
        for _, r in want.iterrows()
    } == got


def test_events_bands_boundary_semantics(spark, tmp_path):
    import os

    # values pinned at band edges: lo is inclusive, hi is exclusive; 16.0
    # sits exactly on a bucket boundary inside 'small' (decomposition must
    # still find it); 320.0 belongs to 'jumbo', not 'large'
    vals = [0.0, 7.49, 7.5, 16.0, 41.99, 42.0, 133.69, 133.7, 319.9, 320.0]
    pdf = pd.DataFrame(
        {
            "event_id": range(len(vals)),
            "ts": pd.Timestamp("2024-01-01").to_datetime64(),
            "user_id": [1] * len(vals),
            "event_type": ["view"] * len(vals),
            "value": vals,
            "props": [""] * len(vals),
        }
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    d = tmp_path / "ev"
    os.makedirs(d)
    pdf.to_parquet(str(d / "events.parquet"))
    got = {
        r["band"]: r["n_events"]
        for r in entry.q_events_bands(spark, str(d)).collect()
    }
    assert got == {"micro": 2, "small": 3, "mid": 2, "large": 2, "jumbo": 1}
    con = duckdb.connect()
    con.register("events", pdf)
    want = {
        r["band"]: int(r["n_events"])
        for _, r in con.sql(
            entry._oracle_sql_for("0.001")["events_bands"]
        ).df().iterrows()
    }
    assert want == got


def test_events_transitions_order_and_ties(spark):
    """lead() follows (ts, event_id) order; last event per user emits no pair."""
    import datetime as dt

    import __spark_entry__ as entry

    rows = [
        # user 1: view -> click -> purchase (with a ts tie broken by event_id)
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 10, "view"),
        (2, dt.datetime(2024, 1, 1, 0, 0, 1), 10, "click"),
        (3, dt.datetime(2024, 1, 1, 0, 0, 1), 10, "purchase"),  # tie: id 2 < 3
        # user 2: single event -> contributes nothing
        (4, dt.datetime(2024, 1, 1, 0, 0, 0), 20, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    import os, tempfile
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {
        (r["event_type"], r["next_type"]): r["n_transitions"]
        for r in entry.q_events_transitions(spark, d).collect()
    }
    assert out == {("view", "click"): 1, ("click", "purchase"): 1}


def test_events_overlaps_decomposition_exact(spark, tmp_path):
    """The bucket decomposition matches the true inequality join, including
    a session spanning several buckets and one touching a window edge."""
    import datetime as dt
    import os

    import duckdb

    import __spark_entry__ as entry

    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(minutes):
        return base + dt.timedelta(minutes=minutes)

    rows = []
    eid = 0
    # hours 0,2,3,4,5 dense -> the top-5 peak windows; hour 1 sparse
    for hr in (0, 2, 3, 4, 5):
        for m in range(hr * 60, hr * 60 + 50, 5):
            eid += 1; rows.append((eid, at(m), 1, "view"))
    # user 3: one event in sparse hour 1 only -> its daily interval still
    # overlaps nothing unless a peak window covers it
    eid += 1; rows.append((eid, at(70), 3, "view"))
    # user 4: spans hours 0..2 -> overlaps both peak windows
    eid += 1; rows.append((eid, at(1), 4, "view"))
    eid += 1; rows.append((eid, at(140), 4, "view"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        (r["user_id"], r["day"]): (r["n_peak_windows"], r["overlap_us"])
        for r in entry.q_events_overlaps(spark, d).collect()
    }
    # true join oracle on the same parquet
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM read_parquet('"
        + os.path.join(d, "events.parquet", "*.parquet") + "')"
    )
    want = {
        (r["user_id"], r["day"]): (r["n_peak_windows"], r["overlap_us"])
        for _, r in con.sql(entry.oracle_sql()["events_overlaps"]).df().iterrows()
    }
    assert got == want
    assert got[(4, 19723)][0] == 2  # spans both peak hours
    assert (3, 19723) not in got or got[(3, 19723)][0] <= 1


def test_events_sliding_window_membership(spark, tmp_path):
    from datetime import datetime, timezone

    from pyspark.sql import functions as F

    # one event on an exact 15-min boundary, one mid-window: each must land
    # in exactly 4 epoch-aligned (1h, 15min) windows, earliest start 45 min
    # back (boundary) / aligned-floor minus 45 min (mid)
    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 5, 1, 10, 45, 0), 7, "click", 1.0, None),
            (2, datetime(2024, 5, 1, 10, 52, 30), 8, "view", 1.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    p = str(tmp_path / "events.parquet")
    ev.toPandas().to_parquet(p)
    out = (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type")
        .count()
        .select(
            F.unix_timestamp("win.start").cast("long").alias("ws"), "event_type"
        )
        .collect()
    )
    by_type = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r["ws"])
    t1 = int(datetime(2024, 5, 1, 10, 45, tzinfo=timezone.utc).timestamp())
    t2 = int(datetime(2024, 5, 1, 10, 52, 30, tzinfo=timezone.utc).timestamp())
    assert sorted(by_type["click"]) == [t1 - 2700, t1 - 1800, t1 - 900, t1]
    floor2 = t2 // 900 * 900
    assert sorted(by_type["view"]) == [
        floor2 - 2700, floor2 - 1800, floor2 - 900, floor2
    ]
    # oracle parity on the same crafted rows
    import duckdb as _duckdb

    got = sorted(
        (r["win_start_s"], r["event_type"])
        for _, r in _duckdb.sql(
            f"""SELECT (floor(epoch(ts))::BIGINT // 900 - k.k) * 900 AS win_start_s,
                      event_type
               FROM read_parquet('{p}'), (SELECT unnest(range(4)) AS k) k"""
        ).df().iterrows()
    )
    assert got == sorted((r["ws"], r["event_type"]) for r in out)


def test_events_pivot_single_exchange(spark):
    import __spark_entry__ as e

    out = e.q_events_pivot(spark, SF_DIR)
    # explicit value list => single-pass conditional agg: exactly one
    # exchange (user_id), no second job for a distinct scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert plan.count("Exchange") == plan.count("Exchange hashpartitioning(user_id")
    row = out.filter(out.user_id == 1).collect()
    if row:  # column totals reconcile with the raw counts for that user
        r = row[0]
        import duckdb as d

        want = d.sql(
            f"SELECT count(*) FROM read_parquet('{SF_DIR}/events.parquet')"
            " WHERE user_id = 1"
        ).fetchone()[0]
        assert (
            r["n_click"] + r["n_error"] + r["n_purchase"] + r["n_signup"] + r["n_view"]
            == want
        )


def test_events_dau_rolling_window_semantics(spark, tmp_path):
    """WAU(d) counts distinct users active in [d-6, d]; a user active
    twice in the window counts once; stickiness is integer ppm."""
    import datetime as dt
    import os

    import __spark_entry__ as entry

    base = dt.datetime(2024, 1, 10, 12, 0, 0)  # epoch-day 19732

    def ts(day_off):
        return base + dt.timedelta(days=day_off)

    rows = [
        # u1 active day 0 and day 3 (one WAU head at day 3+)
        ("e1", ts(0), "u1", "view", 1.0, ""),
        ("e2", ts(3), "u1", "view", 1.0, ""),
        # u2 active day 3 only
        ("e3", ts(3), "u2", "view", 1.0, ""),
        # u3 active day 8 — outside day-3's window, inside day-8's
        ("e4", ts(8), "u3", "view", 1.0, ""),
    ]
    df = spark.createDataFrame(
        rows, "event_id string, ts timestamp, user_id string, "
        "event_type string, value double, props string"
    )
    d = str(tmp_path / "ev")
    df.write.parquet(os.path.join(d, "events.parquet"))
    out = {r["day"]: r for r in entry.q_events_dau(spark, d).collect()}
    day0 = int(base.timestamp() * 1_000_000) // 86_400_000_000
    assert out[day0]["dau"] == 1 and out[day0]["wau"] == 1
    # day 3: u1 + u2 same-day; window [d-6,d] adds nothing new; u1 once
    assert out[day0 + 3]["dau"] == 2 and out[day0 + 3]["wau"] == 2
    # day 8: u3 same-day; u1/u2 (day 3) inside the trailing window
    assert out[day0 + 8]["dau"] == 1 and out[day0 + 8]["wau"] == 3
    assert out[day0 + 8]["stickiness_ppm"] == 1 * 10**6 // 3
    # only days with same-day activity appear
    assert set(out) == {day0, day0 + 3, day0 + 8}


def test_events_cascade_matches_direct(spark):
    """The continuous-aggregate cascade (minute -> hour -> day, coarser
    grains aggregating finer partials) must equal direct aggregation from
    raw at every grain — the cascade-safety property that restricts the
    hierarchy to counts/sums; boundary events at exact hour/day edges
    land in the right bucket."""
    import datetime as dt

    from __spark_entry__ import q_events_cascade

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 1, "view"),
        (2, dt.datetime(2024, 1, 1, 0, 0, 59), 1, "purchase"),
        (3, dt.datetime(2024, 1, 1, 0, 59, 59), 2, "purchase"),
        (4, dt.datetime(2024, 1, 1, 1, 0, 0), 2, "view"),   # hour edge
        (5, dt.datetime(2024, 1, 2, 0, 0, 0), 3, "view"),   # day edge
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = {
            (r["grain"], r["bucket_start_s"]): (r["n_events"], r["n_purchases"])
            for r in q_events_cascade(spark, d).collect()
        }
    epoch = lambda *a: int(dt.datetime(*a, tzinfo=dt.timezone.utc).timestamp())  # noqa: E731
    base = epoch(2024, 1, 1)
    # direct per-grain truth
    assert got[("minute", base)] == (2, 1)
    assert got[("minute", base + 59 * 60)] == (1, 1)
    assert got[("minute", base + 3600)] == (1, 0)
    assert got[("minute", base + 86400)] == (1, 0)
    assert got[("hour", base)] == (3, 2)
    assert got[("hour", base + 3600)] == (1, 0)
    assert got[("hour", base + 86400)] == (1, 0)
    assert got[("day", base)] == (4, 2)
    assert got[("day", base + 86400)] == (1, 0)
    assert len(got) == 4 + 3 + 2


def test_events_attribution_credit_exact(spark, tmp_path):
    """Crafted attribution: user 1 purchase preceded by 3 touches inside
    the 24h lookback (view, click, view) -> linear credit 333333 per touch
    + remainder 1 to the LAST touch; first = the view, last = the second
    view.  A touch outside the lookback and a touch AFTER the purchase
    must get nothing.  Oracle parity on the same frame."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)

    def s(mins):
        return t0 + dt.timedelta(minutes=mins)

    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, s(-60 * 25), 1, "view", 0.0, ""),   # outside 24h lookback
        (2, s(-120), 1, "view", 0.0, ""),       # first touch
        (3, s(-60), 1, "click", 0.0, ""),       # middle touch
        (4, s(-10), 1, "view", 0.0, ""),        # last touch (gets remainder)
        (5, s(0), 1, "purchase", 1.0, ""),
        (6, s(5), 1, "click", 0.0, ""),         # after conversion: no credit
        # user 2: single-touch conversion -> full 10^6 to signup
        (7, s(-30), 2, "signup", 0.0, ""),
        (8, s(0), 2, "purchase", 1.0, ""),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    p = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(p)
    got = {
        r["channel"]: r
        for r in entry.q_events_attribution(spark, str(tmp_path)).collect()
    }
    assert got["view"]["n_touch_rows"] == 2
    assert got["view"]["n_first"] == 1 and got["view"]["n_last"] == 1
    # 333333 (first view) + 333333 + 1 remainder (last view)
    assert got["view"]["linear_ppm"] == 666_667
    assert got["click"]["n_touch_rows"] == 1
    assert got["click"]["n_first"] == 0 and got["click"]["n_last"] == 0
    assert got["click"]["linear_ppm"] == 333_333
    assert got["signup"]["linear_ppm"] == 1_000_000
    # every conversion's credit sums to exactly 10^6
    assert sum(r["linear_ppm"] for r in got.values()) == 2_000_000

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}/*.parquet')")
    want = con.sql(entry._oracle_sql_for("0.001")["events_attribution"])
    _cmp(entry.q_events_attribution(spark, str(tmp_path)), want, ["channel"])
