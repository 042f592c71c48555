"""Tests for windowed event dedup (debounce) and grouped OLS trend."""

import datetime as dt

from pyspark.sql import functions as F

from p2_mapreduce_spark.operators.events_analytics import event_dedup
from p2_mapreduce_spark.operators.timeseries import grouped_trend

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, user, typ, sec, value=1.0):
    return (eid, T0 + dt.timedelta(seconds=sec), user, typ, value, "{}")


SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_event_dedup_collapses_steady_burst(spark):
    """A steady burst (every 30 s, window 60 s) spans 150 s total but
    collapses to ONE survivor — the island semantics a plain lag-filter
    would get wrong (it would re-admit nothing here, but WOULD re-admit
    alternating events at 61 s spacing... tested below)."""
    rows = [_ev(i, 1, "click", i * 30) for i in range(6)]  # 0..150 s
    out = event_dedup(spark.createDataFrame(rows, SCHEMA), 60).collect()
    assert len(out) == 1
    assert out[0]["event_id"] == 0 and out[0]["n_suppressed"] == 5


def test_event_dedup_gap_starts_new_island(spark):
    rows = [
        _ev(0, 1, "click", 0),
        _ev(1, 1, "click", 30),     # suppressed
        _ev(2, 1, "click", 120),    # gap 90 s > 60 s: survives
        _ev(3, 1, "view", 5),       # different type: own island
        _ev(4, 2, "click", 1),      # different user: own island
    ]
    out = {
        r["event_id"]: r["n_suppressed"]
        for r in event_dedup(spark.createDataFrame(rows, SCHEMA), 60).collect()
    }
    assert out == {0: 1, 2: 0, 3: 0, 4: 0}


def test_event_dedup_tie_break_is_event_id(spark):
    rows = [_ev(7, 1, "click", 0), _ev(3, 1, "click", 0)]
    out = event_dedup(spark.createDataFrame(rows, SCHEMA), 60).collect()
    assert len(out) == 1 and out[0]["event_id"] == 3


def test_grouped_trend_recovers_exact_line(spark):
    """y = 2·t_days + 5 exactly: slope_per_day == 2, intercept == 5,
    r2 == 1 — the sufficient-statistics forms are exact on exact data."""
    rows = []
    for i in range(10):
        sec = i * 86400  # one sample per day
        rows.append(_ev(i, 1, "a", sec, 2.0 * i + 5.0))
    out = grouped_trend(spark.createDataFrame(rows, SCHEMA)).collect()
    r = out[0]
    assert r["n"] == 10
    assert abs(r["slope_per_day"] - 2.0) < 1e-9
    assert abs(r["intercept"] - 5.0) < 1e-9
    assert abs(r["r2"] - 1.0) < 1e-12


def test_grouped_trend_degenerate_groups_are_null(spark):
    # all samples at the same instant: den == 0 -> NULL slope/r2
    rows = [_ev(i, 1, "flat", 0, float(i)) for i in range(5)]
    r = grouped_trend(spark.createDataFrame(rows, SCHEMA)).collect()[0]
    assert r["slope_per_day"] is None and r["r2"] is None


def test_grouped_trend_partitioning_invariant(spark):
    rows = [
        _ev(i, 1, "a", i * 3600 + (i % 7), float((i * 13) % 101) + 0.25)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted(map(tuple, grouped_trend(df).collect()))
    b = sorted(map(tuple, grouped_trend(df.repartition(17)).collect()))
    assert a == b  # exact sums: bit-identical, not approximately equal


# --- CUSUM change point ----------------------------------------------------


def test_cusum_finds_step_change(spark):
    """A level shift on day 10 of 20 must put the CUSUM peak at the last
    day of the old level (day 9): the cumulative deviation from the
    global mean is extremal exactly at the change boundary."""
    from p2_mapreduce_spark.operators.timeseries import cusum_changepoint

    rows = []
    for d in range(20):
        level = 10.0 if d < 10 else 50.0
        rows.append(_ev(d, 1, "metric", d * 86400 + 60, level))
    out = cusum_changepoint(spark.createDataFrame(rows, SCHEMA)).collect()
    r = out[0]
    assert r["n_days"] == 20
    assert r["change_day"] == T0 + dt.timedelta(days=9)
    # deviation peaks at 10 days x (10 - 30) = -200 value units / day
    # scaled: |C'| / n = 10*20*... ; sign negative (ran below the mean)
    assert r["peak_dev"] < 0


def test_cusum_flat_series_peaks_at_zero(spark):
    from p2_mapreduce_spark.operators.timeseries import cusum_changepoint

    rows = [_ev(d, 1, "flat", d * 86400, 7.0) for d in range(5)]
    r = cusum_changepoint(spark.createDataFrame(rows, SCHEMA)).collect()[0]
    assert r["peak_dev"] == 0.0
    # all days tie at zero: earliest day wins deterministically
    assert r["change_day"] == T0


# --- winsorize -------------------------------------------------------------


def test_winsorize_clamps_tails_only(spark):
    from p2_mapreduce_spark.operators.profile import winsorize

    rows = [(i, "g", float(v)) for i, v in enumerate([1] * 5 + [50] * 90 + [999] * 5)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = winsorize(
        df, "v", ["g"], lo_c=0, hi_c=100_000, n_buckets=1000, q_lo_ppm=100_000,
        q_hi_ppm=900_000,
    ).collect()
    by_v = {}
    for r in out:
        by_v.setdefault(r["v"], set()).add(r["clipped"])
    # the middle mass is untouched (its own bucket's lower boundary is
    # the low clip); both tails are pulled to the bounds
    assert by_v[50.0] == {50.0}
    assert by_v[1.0] == {50.0}
    assert by_v[999.0] == {51.0}
    assert len(out) == 100


# --- A/B conversion --------------------------------------------------------


def test_ab_conversion_cells_and_chi2(spark):
    import hashlib

    from p2_mapreduce_spark.operators.events_analytics import ab_conversion

    rows = []
    for u in range(40):
        rows.append(_ev(u * 10, u, "view", u))
        if u % 3 == 0:
            rows.append(_ev(u * 10 + 1, u, "purchase", u + 100))
    df = spark.createDataFrame(rows, SCHEMA)
    r = ab_conversion(df).collect()[0]

    def arm(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[17:32], 16) % 2

    exp_a = [u for u in range(40) if arm(u) == 0]
    exp_b = [u for u in range(40) if arm(u) == 1]
    assert r["n_a"] == len(exp_a) and r["n_b"] == len(exp_b)
    assert r["conv_a"] == sum(1 for u in exp_a if u % 3 == 0)
    assert r["conv_b"] == sum(1 for u in exp_b if u % 3 == 0)
    # recompute chi2 from the cells the operator itself reports
    a, b = r["conv_a"], r["n_a"] - r["conv_a"]
    c, d = r["conv_b"], r["n_b"] - r["conv_b"]
    n = r["n_a"] + r["n_b"]
    chi2 = n * float(a * d - b * c) ** 2 / (
        float(r["n_a"] * r["n_b"]) * float((a + c) * (b + d))
    )
    assert abs(r["chi2"] - chi2) < 1e-9
    assert abs(r["rate_a"] - a / r["n_a"]) < 1e-12


def test_ab_conversion_degenerate_is_null(spark):
    from p2_mapreduce_spark.operators.events_analytics import ab_conversion

    rows = [_ev(u, u, "view", u) for u in range(10)]  # nobody converts
    r = ab_conversion(spark.createDataFrame(rows, SCHEMA)).collect()[0]
    assert r["conv_a"] == 0 and r["conv_b"] == 0 and r["chi2"] is None
