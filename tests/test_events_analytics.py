"""Semantic and plan pins for the event product-analytics operators
(operators/events_analytics.py)."""

import datetime as dt

import pyspark.sql.functions as F

import __spark_entry__ as entry_mod
from p2_mapreduce_spark.operators.events_analytics import (
    cohort_retention,
    funnel_counts,
    funnel_users,
)
from p2_mapreduce_spark.plans import plan_report
from p2_mapreduce_spark.session import load_table


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [(i, _ts(ts), uid, et, 0.0) for i, (ts, uid, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )


def test_funnel_strictly_after_chain(spark):
    ev = _mk_events(
        spark,
        [
            # u1 completes the funnel in order
            ("2024-01-01T00:00:01", 1, "view"),
            ("2024-01-01T00:00:02", 1, "click"),
            ("2024-01-01T00:00:03", 1, "purchase"),
            # u2: purchase BEFORE click -> chain stops at click
            ("2024-01-01T00:00:01", 2, "view"),
            ("2024-01-01T00:00:03", 2, "click"),
            ("2024-01-01T00:00:02", 2, "purchase"),
            # u3: click exactly AT the first view -> strict > excludes it
            ("2024-01-01T00:00:01", 3, "view"),
            ("2024-01-01T00:00:01", 3, "click"),
            # u4: never views -> depth 0 even with later steps
            ("2024-01-01T00:00:01", 4, "click"),
            ("2024-01-01T00:00:02", 4, "purchase"),
        ],
    )
    got = {r["user_id"]: (r["t1"], r["t2"], r["t3"])
           for r in funnel_users(ev).collect()}
    assert got[1] == (_ts("2024-01-01T00:00:01"), _ts("2024-01-01T00:00:02"),
                      _ts("2024-01-01T00:00:03"))
    assert got[2][:2] == (_ts("2024-01-01T00:00:01"),
                          _ts("2024-01-01T00:00:03")) and got[2][2] is None
    assert got[3] == (_ts("2024-01-01T00:00:01"), None, None)
    assert got[4] == (None, None, None)
    counts = funnel_counts(ev).collect()[0]
    assert (counts["users_view"], counts["users_click"],
            counts["users_purchase"]) == (3, 2, 1)


def test_funnel_counts_monotone_on_fixture(spark, sf_dir):
    row = funnel_counts(load_table(spark, sf_dir, "events")).collect()[0]
    v, c, p = row["users_view"], row["users_click"], row["users_purchase"]
    assert v >= c >= p >= 0
    assert v > 0  # the fixture has viewers


def test_funnel_plan_is_one_jvm_shuffle(spark, sf_dir):
    r = plan_report(entry_mod.queries()["funnel_steps"](spark, sf_dir))
    assert not r["has_python_worker"]
    assert r["has_partial_agg"]
    # groupBy(user) + the 1-row final reduction; no window, no join
    assert "Window" not in r["plan"]
    assert "Join" not in r["plan"]


def test_cohort_retention_offsets(spark, sf_dir):
    out = cohort_retention(load_table(spark, sf_dir, "events"))
    rows = out.collect()
    assert all(r["week_offset"] >= 0 for r in rows)
    # every cohort is active at offset 0 (its members' first day)
    cohorts = {r["cohort_date"] for r in rows}
    zero = {r["cohort_date"] for r in rows if r["week_offset"] == 0}
    assert cohorts == zero
    # offset-0 activity is the cohort's max over later offsets
    by_c = {}
    for r in rows:
        by_c.setdefault(r["cohort_date"], {})[r["week_offset"]] = (
            r["active_users"]
        )
    for c, offs in by_c.items():
        assert offs[0] == max(offs.values())


def test_cohort_retention_no_python(spark, sf_dir):
    r = plan_report(entry_mod.queries()["cohort_retention"](spark, sf_dir))
    assert not r["has_python_worker"]


def test_last_touch_attribution_semantics(spark):
    from p2_mapreduce_spark.operators.events_analytics import (
        last_touch_attribution,
    )

    ev = _mk_events(
        spark,
        [
            # u1: view -> purchase (credit view), then another purchase
            # right after (credit view again — purchases don't credit)
            ("2024-01-01T00:00:01", 1, "view"),
            ("2024-01-01T00:00:02", 1, "purchase"),
            ("2024-01-01T00:00:03", 1, "purchase"),
            # u2: purchase with no prior event -> direct
            ("2024-01-01T00:00:01", 2, "purchase"),
            # u3: click then view then purchase -> credit view (nearest)
            ("2024-01-01T00:00:01", 3, "click"),
            ("2024-01-01T00:00:02", 3, "view"),
            ("2024-01-01T00:00:03", 3, "purchase"),
        ],
    )
    got = {
        r["source_type"]: r["n_purchases"]
        for r in last_touch_attribution(ev).collect()
    }
    assert got == {"view": 3, "direct": 1}


def test_attribution_plan_no_python_one_window(spark, sf_dir):
    r = plan_report(entry_mod.queries()["attribution"](spark, sf_dir))
    assert not r["has_python_worker"]
    assert r["plan"].count("(") and "Window" in r["plan"]


def test_event_transitions_counts(spark):
    from p2_mapreduce_spark.operators.events_analytics import event_transitions

    ev = _mk_events(
        spark,
        [
            ("2024-01-01T00:00:01", 1, "view"),
            ("2024-01-01T00:00:02", 1, "click"),
            ("2024-01-01T00:00:03", 1, "view"),
            ("2024-01-01T00:00:01", 2, "view"),
            ("2024-01-01T00:00:02", 2, "click"),
        ],
    )
    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in event_transitions(ev).collect()
    }
    assert got == {("view", "click"): 2, ("click", "view"): 1}


def test_event_transitions_conservation(spark, sf_dir):
    from p2_mapreduce_spark.operators.events_analytics import event_transitions

    ev = load_table(spark, sf_dir, "events")
    total = ev.count()
    n_users = ev.select("user_id").distinct().count()
    trans = event_transitions(ev)
    # every event except each user's first is somebody's successor
    assert sum(r["n"] for r in trans.collect()) == total - n_users


def test_position_attribution_known_journeys(spark):
    """Hand-built journeys: k=1 (full credit), k=2 (half/half), k=4
    (U-shape with truncating middle split), and a direct purchase."""
    from datetime import datetime

    from p2_mapreduce_spark.operators.events_analytics import position_attribution

    def ev(i, user, typ):
        return (i, datetime(2026, 1, 1, 0, i), user, typ, 1.0, "{}")

    rows = [
        # user 1: view -> purchase             (k=1: view 1.0)
        ev(1, 1, "view"), ev(2, 1, "purchase"),
        # user 2: view, click -> purchase      (k=2: 0.5 each)
        ev(3, 2, "view"), ev(4, 2, "click"),  ev(5, 2, "purchase"),
        # user 3: view, click, error, view -> purchase
        #   (k=4: 0.4 / 0.1 / 0.1 / 0.4 — 200000 div 2 = 100000)
        ev(6, 3, "view"), ev(7, 3, "click"), ev(8, 3, "error"),
        ev(9, 3, "view"), ev(10, 3, "purchase"),
        # user 4: bare purchase                (direct 1.0)
        ev(11, 4, "purchase"),
        # user 3 again: second purchase right after -> direct
        ev(12, 3, "purchase"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )
    got = {r["source_type"]: (r["n_touches"], r["credit"])
           for r in position_attribution(events).collect()}
    assert got["direct"] == (2, 2.0)
    # view: 1.0 (u1) + 0.5 (u2) + 0.4 + 0.4 (u3 first+last) = 2.3
    assert got["view"] == (4, 2.3)
    # click: 0.5 (u2) + 0.1 (u3 middle) = 0.6
    assert got["click"] == (2, 0.6)
    assert got["error"] == (1, 0.1)
    # conservation: total credit == purchases with journeys (3) + direct(2)
    assert abs(sum(c for _, c in got.values()) - 5.0) < 1e-9


class TestYoyBounce:
    def test_yoy_aligns_calendar_not_rows(self, spark):
        import datetime as dt

        # 1996-02 missing entirely: 1997-02 must align to NULL (a
        # lag-12 over rows would wrongly pick an adjacent month)
        rows = []
        oid = 0
        for ym in ["1996-01", "1996-03", "1997-01", "1997-02", "1997-03"]:
            y, m = map(int, ym.split("-"))
            oid += 1
            rows.append((oid, 1, "O", 100.0, dt.datetime(y, m, 15), "1-URGENT"))
        df = spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        )
        from p2_mapreduce_spark.operators.timeseries import yoy_revenue

        out = {r["month"]: r["prev_year_rev"] for r in yoy_revenue(df).collect()}
        assert out["1997-01"] == 100.0
        assert out["1997-02"] is None  # no 1996-02
        assert out["1997-03"] == 100.0
        assert out["1996-01"] is None

    def test_bounce_buckets_partition_sessions(self, spark, sf_dir):
        from p2_mapreduce_spark.session import load_table
        from p2_mapreduce_spark.streaming.events import bounce_rate, sessionize

        events = load_table(spark, sf_dir, "events")
        out = bounce_rate(events).collect()
        assert sum(r["n_sessions"] for r in out) == sessionize(events).count()
        total_ppm = sum(r["share_ppm"] for r in out)
        assert 1_000_000 - len(out) <= total_ppm <= 1_000_000


def test_activity_islands_runs_are_maximal_and_disjoint(spark):
    from p2_mapreduce_spark.operators.events_analytics import activity_islands

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 05:00:00"), (2, "2024-01-01 09:00:00"),
            (3, "2024-01-02 05:00:00"), (4, "2024-01-04 05:00:00"),
            (5, "2024-01-05 05:00:00"), (6, "2024-01-06 05:00:00"),
        ],
        "event_id long, ts_s string",
    ).selectExpr("event_id", "CAST(1 AS BIGINT) AS user_id", "CAST(ts_s AS TIMESTAMP) AS ts")
    got = sorted(
        (r.start_day, r.end_day, r.n_days)
        for r in activity_islands(events).collect()
    )
    assert got == [
        ("2024-01-01", "2024-01-02", 2),
        ("2024-01-04", "2024-01-06", 3),
    ]


def test_new_returning_conserves_and_accumulates(spark, sf_dir):
    from p2_mapreduce_spark.operators.events_analytics import daily_new_returning
    from p2_mapreduce_spark.session import load_table

    events = load_table(spark, sf_dir, "events")
    rows = sorted(daily_new_returning(events).collect(), key=lambda r: r.day)
    total_users = events.select("user_id").distinct().count()
    assert sum(r.n_new for r in rows) == total_users
    assert rows[-1].cum_users == total_users
    assert rows[0].n_returning == 0  # first day: everyone is new
    cum = 0
    for r in rows:
        assert r.n_active == r.n_new + r.n_returning
        cum += r.n_new
        assert r.cum_users == cum


def test_gap_interpolate_ramps_linearly_between_anchors(spark):
    from p2_mapreduce_spark.operators.timeseries import gap_interpolate

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:30:00", "a", 10.0),
            (2, "2024-01-01 04:10:00", "a", 30.0),
            (3, "2024-01-01 06:45:00", "a", 12.0),
        ],
        "event_id long, ts_s string, event_type string, value double",
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "CAST(1 AS BIGINT) user_id",
        "event_type", "value",
    )
    got = {
        r.hour.hour: (r.observed, r.interpolated)
        for r in gap_interpolate(events).collect()
    }
    assert got[0] == (10.0, 10.0)
    # gap hours 1..3 ramp 10 -> 30 in 4 steps of 5
    assert got[1][1] == 15.0 and got[2][1] == 20.0 and got[3][1] == 25.0
    assert got[4] == (30.0, 30.0)
    assert got[5][1] == 21.0  # 30 -> 12 over 2 steps
    assert got[6] == (12.0, 12.0)


def test_rolling_median_is_exact_per_trailing_window(spark, sf_dir):
    import statistics

    from pyspark.sql import functions as F

    from p2_mapreduce_spark.operators.timeseries import rolling_median
    from p2_mapreduce_spark.session import load_table

    events = load_table(spark, sf_dir, "events")
    got = {r.day: (r.median_value, r.n_events)
           for r in rolling_median(events, days=7).collect()}
    rows = events.select(F.to_date("ts").alias("d"), "value").collect()
    by_day = {}
    for r in rows:
        by_day.setdefault(r.d, []).append(r.value)
    import datetime

    days = sorted(by_day)
    for d in days:
        window = []
        for k in range(7):
            window += by_day.get(d - datetime.timedelta(days=k), [])
        key = d.strftime("%Y-%m-%d")
        if key in got:
            assert got[key][1] == len(window)
            assert got[key][0] == statistics.median(window)


def test_daily_envelope_matches_local_percentiles(spark, sf_dir):
    import statistics

    from pyspark.sql import functions as F

    from p2_mapreduce_spark.operators.timeseries import daily_envelope
    from p2_mapreduce_spark.session import load_table

    events = load_table(spark, sf_dir, "events")
    got = {(r.event_type, r.day): r for r in daily_envelope(events).collect()}
    rows = events.select(
        "event_type", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        "value",
    ).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault((r.event_type, r.day), []).append(r.value)

    def pq(vals, q):
        vals = sorted(vals)
        pos = (len(vals) - 1) * q
        i = int(pos)
        if i + 1 >= len(vals):
            return vals[i]
        return vals[i] + (vals[i + 1] - vals[i]) * (pos - i)

    for key, vals in by_key.items():
        r = got[key]
        assert r.n_events == len(vals)
        assert abs(r.p50 - statistics.median(vals)) < 1e-9
        assert r.p10 == pq(vals, 0.1) and r.p90 == pq(vals, 0.9)
        assert r.p10 <= r.p50 <= r.p90


def test_activity_histogram_counts_distinct_days(spark):
    """Multiple events on one day count once; the histogram partitions
    the user base exactly (shares sum to ~1e6 ppm)."""
    import datetime

    from p2_mapreduce_spark.operators.events_analytics import activity_histogram

    t = datetime.datetime(2024, 1, 1, 10)
    day = datetime.timedelta(days=1)
    rows = [
        (1, 1, t), (2, 1, t + datetime.timedelta(hours=2)),  # u1: 1 day
        (3, 2, t), (4, 2, t + day), (5, 2, t + 2 * day),      # u2: 3 days
        (6, 3, t + day),                                      # u3: 1 day
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    out = {r["n_active_days"]: r for r in activity_histogram(df).collect()}
    assert out[1]["n_users"] == 2 and out[3]["n_users"] == 1
    assert out[1]["share_ppm"] == 666666
    assert sum(r["n_users"] for r in out.values()) == 3


def test_cuped_perfect_covariate_and_degenerate(spark):
    """If post = 2*pre exactly, rho2 = 1 and the adjusted means move
    toward equality; if the pre-period is constant, theta is NULL and
    adjustment is a no-op."""
    import datetime

    from pyspark.sql import functions as F

    from p2_mapreduce_spark.operators.events_analytics import cuped_adjust

    pre_t = datetime.datetime(2024, 1, 10)
    post_t = datetime.datetime(2024, 1, 20)
    rows = []
    eid = 0
    for u in range(1, 41):
        pre_v = float(u)          # distinct baselines
        for t, v in ((pre_t, pre_v), (post_t, 2.0 * pre_v)):
            eid += 1
            rows.append((eid, u, "purchase", v, t))
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "value", "ts"]
    )
    out = {r["arm"]: r for r in cuped_adjust(df).collect()}
    assert set(out) == {0, 1}
    a, b = out[0], out[1]
    assert abs(a["rho2"] - 1.0) < 1e-12
    assert abs(a["theta"] - 2.0) < 1e-12
    # perfect covariate -> adjusted means equal across arms (both equal
    # the grand post mean)
    assert abs(a["mean_adjusted"] - b["mean_adjusted"]) < 1e-6
    # degenerate pre: same baseline for everyone
    rows2 = []
    eid = 0
    for u in range(1, 21):
        for t, v in ((pre_t, 5.0), (post_t, float(u))):
            eid += 1
            rows2.append((eid, u, "purchase", v, t))
    df2 = spark.createDataFrame(
        rows2, ["event_id", "user_id", "event_type", "value", "ts"]
    )
    out2 = cuped_adjust(df2).collect()
    for r in out2:
        assert r["theta"] is None
        assert r["mean_adjusted"] == r["mean_post"]


def test_did_effect_isolates_treatment_lift(spark):
    """Both arms drift +10 over time; arm B gets an extra +5 lift in
    the post period — DiD must recover exactly +5 (in cents, 500) while
    the naive post-period diff is contaminated by arm base levels."""
    import datetime

    from pyspark.sql import functions as F

    from p2_mapreduce_spark.operators.events_analytics import did_effect

    # find concrete users for each arm
    arms = {}
    probe = spark.range(1, 30).select(
        F.col("id").alias("u"),
        (
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 18, 15),
                   16, 10).cast("long") % 2
        ).alias("arm"),
    )
    for r in probe.collect():
        arms.setdefault(r["arm"], []).append(r["u"])
    pre_t = datetime.datetime(2024, 1, 10)
    post_t = datetime.datetime(2024, 1, 20)
    rows, eid = [], 0
    for u in arms[0][:5]:
        for t, v in ((pre_t, 50.0), (post_t, 60.0)):       # A: +10 drift
            eid += 1
            rows.append((eid, u, "purchase", v, t))
    for u in arms[1][:5]:
        for t, v in ((pre_t, 80.0), (post_t, 95.0)):       # B: +10 +5 lift
            eid += 1
            rows.append((eid, u, "purchase", v, t))
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "value", "ts"]
    )
    out = did_effect(df).collect()[0]
    assert out["mean_a_pre"] == 5000.0 and out["mean_b_post"] == 9500.0
    assert out["did_cents"] == 500.0


def test_funnel_lag_exact_medians(spark):
    """Three completed chains with gaps 1h/2h/4h (view->click): the
    exact median is 2h; the doubled surface makes even counts exact."""
    import datetime

    from p2_mapreduce_spark.operators.events_analytics import funnel_lag

    t = datetime.datetime(2024, 1, 1)
    h = datetime.timedelta(hours=1)
    rows, eid = [], 0
    for u, gap1, gap2 in ((1, 1, 1), (2, 2, 1), (3, 4, 1)):
        for typ, ts in (
            ("view", t), ("click", t + gap1 * h),
            ("purchase", t + (gap1 + gap2) * h),
        ):
            eid += 1
            rows.append((eid, u, typ, ts))
    df = spark.createDataFrame(rows, ["event_id", "user_id", "event_type", "ts"])
    out = {r["step_pair"]: r for r in funnel_lag(df).collect()}
    vc = out["view->click"]
    assert vc["n_users"] == 3
    assert vc["median_x2_us"] == 2 * 2 * 3600 * 1_000_000  # 2h doubled
    cp = out["click->purchase"]
    assert cp["median_x2_us"] == 2 * 1 * 3600 * 1_000_000


class TestMarkovAttribution:
    def test_essential_gate_channel_gets_full_removal_effect(self, spark):
        """Journeys where every conversion passes through 'click': its
        removal zeroes conversions (removal 1e6 ppm exactly), while the
        skippable first touch scores lower — the ordering a rule-based
        model cannot produce."""
        import datetime

        from p2_mapreduce_spark.operators.events_analytics import (
            markov_attribution,
        )

        def ev(eid, uid, t, typ):
            return (eid, uid, typ, datetime.datetime(2024, 1, 1, 0, 0, t))

        rows = []
        eid = 0
        for uid in range(1, 5):  # view -> click -> purchase
            for t, typ in enumerate(("view", "click", "purchase")):
                rows.append(ev(eid := eid + 1, uid, t, typ))
        rows.append(ev(eid + 1, 9, 0, "click"))  # click-only, no convert
        events = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp"
        )
        got = {
            r["channel"]: r for r in markov_attribution(events).collect()
        }
        assert got["click"]["removal_ppm"] == 1_000_000
        assert got["click"]["p_removed_q"] == 0
        assert got["view"]["removal_ppm"] < got["click"]["removal_ppm"]
        assert got["view"]["removal_ppm"] > 0
        # attribution shares normalize over the observed channels
        present = [c for c in got if got[c]["removal_ppm"] > 0]
        total_share = sum(got[c]["attribution_ppm"] for c in present)
        assert 999_990 <= total_share <= 1_000_000  # integer-div rounding


class TestLogrank:
    def test_matches_python_reference(self, spark, sf_dir):
        """Exact parity with an independent per-day hypergeometric
        reference over the same cohort/censoring definitions."""
        import math

        from p2_mapreduce_spark.operators.events_analytics import logrank_test

        events = load_table(spark, sf_dir, "events")
        [r] = logrank_test(events).collect()
        raw = events.select(
            "user_id", "event_id", "ts", "event_type"
        ).collect()
        users = {}
        for row in sorted(raw, key=lambda x: (x["user_id"], x["ts"], x["event_id"])):
            u = users.setdefault(
                row["user_id"],
                {"first": row["event_type"], "t0": row["ts"],
                 "last": row["ts"], "conv": None},
            )
            u["last"] = max(u["last"], row["ts"])
            if row["event_type"] == "purchase" and u["conv"] is None:
                u["conv"] = row["ts"]
        pu = []
        for u in users.values():
            cohort = 1 if u["first"] == "view" else 2
            end = u["conv"] if u["conv"] is not None else u["last"]
            day = (end.date() - u["t0"].date()).days
            pu.append((cohort, day, u["conv"] is not None))
        days = sorted({d for _c, d, _k in pu})
        o1, terms = 0, []
        for t in days:
            n1 = sum(1 for c, d, _k in pu if c == 1 and d >= t)
            n2 = sum(1 for c, d, _k in pu if c == 2 and d >= t)
            d1 = sum(1 for c, d, k in pu if c == 1 and d == t and k)
            d2 = sum(1 for c, d, k in pu if c == 2 and d == t and k)
            if d1 + d2 == 0 or n1 + n2 <= 1:
                continue
            o1 += d1
            e = float(d1 + d2) * float(n1) / float(n1 + n2)
            v = (
                float(d1 + d2) * float(n1) * float(n2)
                * float(n1 + n2 - d1 - d2)
                / (float(n1 + n2) * float(n1 + n2) * float(n1 + n2 - 1))
            )
            terms.append((t, e, v))
        e1 = 0.0
        v = 0.0
        for _t, e_t, v_t in terms:  # day-ordered fold, same as the op
            e1 += e_t
        for _t, e_t, v_t in terms:
            v += v_t
        assert r["n_days"] == len(terms)
        assert r["o1"] == o1
        assert r["e1"] == e1
        assert r["v"] == v
        assert r["z"] == ((o1 - e1) / math.sqrt(v) if v > 0 else 0.0)
