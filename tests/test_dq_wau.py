"""Tests for dq_check (declarative data-quality rules) and wau_hll
(sketch-windowed rolling distinct)."""

import datetime as dt

from pyspark.sql import functions as F

from p2_mapreduce_spark.operators.profile import dq_check, wau_hll
from p2_mapreduce_spark.session import load_table

T0 = dt.datetime(2024, 1, 1)


class TestDqCheck:
    def _df(self, spark):
        rows = [
            (1, 10.0, "O", 100),
            (2, -5.0, "O", 101),    # range violation
            (3, 20.0, "X", 102),    # domain violation
            (None, 30.0, "F", 103),  # null key
            (3, 40.0, "P", None),   # duplicate key + null fk (fk skips nulls)
            (5, 50.0, "F", 999),    # orphan fk
        ]
        return spark.createDataFrame(
            rows, "k long, price double, status string, fk long"
        )

    def _dim(self, spark):
        return spark.createDataFrame(
            [(100,), (101,), (102,), (103,)], "dk long"
        )

    def test_all_rule_kinds(self, spark):
        rules = [
            {"name": "k_not_null", "kind": "not_null", "col": "k"},
            {"name": "price_range", "kind": "range", "col": "price",
             "lo": 0.0, "hi": 1000.0},
            {"name": "status_domain", "kind": "in_set", "col": "status",
             "values": ["O", "F", "P"]},
            {"name": "k_unique", "kind": "unique", "col": "k"},
            {"name": "fk_dim", "kind": "fk", "col": "fk", "dim": "d",
             "dim_col": "dk"},
        ]
        out = {
            r["rule"]: (r["n_violations"], r["passed"])
            for r in dq_check(
                self._df(spark), rules, {"d": self._dim(spark)}
            ).collect()
        }
        assert out["k_not_null"] == (1, False)
        assert out["price_range"] == (1, False)
        assert out["status_domain"] == (1, False)
        # k values: 1,2,3,3,5 (null excluded by count(col)) -> 5 - 4 = 1
        assert out["k_unique"] == (1, False)
        assert out["fk_dim"] == (1, False)  # only 999; NULL fk skipped

    def test_clean_table_passes(self, spark):
        df = spark.createDataFrame(
            [(1, 10.0, "O", 100)], "k long, price double, status string, fk long"
        )
        rules = [
            {"name": "k_not_null", "kind": "not_null", "col": "k"},
            {"name": "k_unique", "kind": "unique", "col": "k"},
        ]
        out = dq_check(df, rules).collect()
        assert all(r["passed"] and r["n_violations"] == 0 for r in out)

    def test_single_scan_for_agg_rules(self, spark, sf_dir):
        orders = load_table(spark, sf_dir, "orders")
        rules = [
            {"name": "a", "kind": "not_null", "col": "o_orderkey"},
            {"name": "b", "kind": "range", "col": "o_totalprice",
             "lo": 0.0, "hi": 1e9},
            {"name": "c", "kind": "in_set", "col": "o_orderstatus",
             "values": ["O", "F", "P"]},
        ]
        plan = dq_check(orders, rules)._jdf.queryExecution().executedPlan().toString()
        # all conditional counts fold into one scan of the parquet file
        assert plan.count("FileScan parquet") == 1


class TestWauHll:
    def test_estimate_tracks_exact(self, spark, sf_dir):
        events = load_table(spark, sf_dir, "events")
        rows = wau_hll(events).collect()
        assert len(rows) > 0
        for r in rows:
            if r["exact_users"] >= 160:  # raw-estimator regime (~2.5·m)
                assert abs(r["est_users"] - r["exact_users"]) <= (
                    0.6 * r["exact_users"]
                ), r

    def test_window_is_monotone_in_days(self, spark, sf_dir):
        events = load_table(spark, sf_dir, "events")
        w7 = {r["d"]: r["exact_users"] for r in wau_hll(events, days=7).collect()}
        w1 = {r["d"]: r["exact_users"] for r in wau_hll(events, days=1).collect()}
        for d, n in w1.items():
            assert w7[d] >= n
