"""Tests for weekday_seasonality, json_quarantine, conversion_lag."""

import datetime as dt

from pyspark.sql import functions as F

from p2_mapreduce_spark.operators.events_analytics import conversion_lag
from p2_mapreduce_spark.operators.json_ops import json_quarantine
from p2_mapreduce_spark.operators.timeseries import weekday_seasonality

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ev(eid, day_offset, typ="click", value=1.0, user=1, props='{"k": 1}',
        seconds=0):
    return (
        eid,
        dt.datetime(2024, 1, 1) + dt.timedelta(days=day_offset, seconds=seconds),
        user,
        typ,
        value,
        props,
    )


class TestWeekdaySeasonality:
    def test_baseline_is_weekday_mean_and_ratio(self, spark):
        # 2024-01-01 and 2024-01-08 are both Mondays: values 10 and 30
        rows = [
            _ev(1, 0, value=10.0),
            _ev(2, 7, value=30.0),
            _ev(3, 1, value=5.0),  # a Tuesday
        ]
        out = {
            (r["day"]): r
            for r in weekday_seasonality(
                spark.createDataFrame(rows, EV_SCHEMA)
            ).collect()
        }
        m1, m2 = out["2024-01-01"], out["2024-01-08"]
        assert m1["weekday"] == m2["weekday"] == 2  # Spark: Monday = 2
        assert m1["baseline"] == m2["baseline"] == 20.0
        assert m1["ratio"] == 0.5 and m2["ratio"] == 1.5
        assert out["2024-01-02"]["ratio"] == 1.0  # only Tuesday


class TestJsonQuarantine:
    def test_truncated_payloads_quarantined(self, spark):
        rows = [
            _ev(1, 0, props='{"k": 5}'),
            _ev(2, 0, props='{"k": 7'),     # truncated -> bad
            _ev(3, 0, props='{"k": 11}'),
            _ev(4, 0, props="garbage"),     # bad
        ]
        r = json_quarantine(spark.createDataFrame(rows, EV_SCHEMA)).collect()[0]
        assert r["n_rows"] == 4 and r["n_bad"] == 2
        assert r["bad_ppm"] == 500_000
        assert r["sum_k_good"] == 16  # only the two valid payloads

    def test_clean_table_zero_bad(self, spark, sf_dir):
        from p2_mapreduce_spark.session import load_table

        out = json_quarantine(load_table(spark, sf_dir, "events")).collect()
        assert all(r["n_bad"] == 0 and r["bad_ppm"] == 0 for r in out)


class TestConversionLag:
    def test_lag_percentiles_hand_computed(self, spark):
        rows = [
            # user 1: view at t0, purchase 100s later
            _ev(1, 0, typ="view", user=1),
            _ev(2, 0, typ="purchase", user=1, seconds=100),
            # user 2: view at t0, purchase 200s later (an earlier
            # purchase BEFORE the view must not count)
            _ev(3, 0, typ="purchase", user=2, seconds=-50),
            _ev(4, 0, typ="view", user=2),
            _ev(5, 0, typ="purchase", user=2, seconds=200),
            # user 3: view only -> not converted
            _ev(6, 0, typ="view", user=3),
        ]
        r = conversion_lag(spark.createDataFrame(rows, EV_SCHEMA)).collect()[0]
        assert r["n_users"] == 3 and r["n_converted"] == 2
        assert r["p50_lag_s"] == 150.0  # median of {100, 200}
        assert abs(r["p90_lag_s"] - 190.0) < 1e-9
