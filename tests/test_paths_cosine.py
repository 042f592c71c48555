"""Tests for item_cosine (normalized co-purchase) and top_paths
(journey mining)."""

import datetime as dt
import math

from p2_mapreduce_spark.operators.analytics import item_cosine, top_paths

T0 = dt.datetime(2024, 1, 1)

LI_SCHEMA = "l_orderkey long, l_partkey long"
EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _li(spark, baskets):
    rows = [(o, p) for o, parts in baskets.items() for p in parts]
    return spark.createDataFrame(rows, LI_SCHEMA)


class TestItemCosine:
    def test_cosine_formula(self, spark):
        # parts 1,2 co-occur twice; part 1 in 3 orders, part 2 in 2
        df = _li(spark, {10: [1, 2], 11: [1, 2], 12: [1, 3]})
        out = {(r["part_a"], r["part_b"]): r for r in item_cosine(df).collect()}
        r = out[(1, 2)]
        assert r["n_orders"] == 2
        assert math.isclose(r["cosine"], 2 / math.sqrt(3 * 2), rel_tol=1e-12)

    def test_perfect_pair(self, spark):
        df = _li(spark, {1: [7, 8], 2: [7, 8]})
        r = item_cosine(df).collect()[0]
        assert r["cosine"] == 1.0

    def test_duplicate_lines_count_once(self, spark):
        # same part twice in one order: distinct() collapses it
        df = spark.createDataFrame([(1, 5), (1, 5), (1, 6)], LI_SCHEMA)
        r = item_cosine(df).collect()[0]
        assert r["n_orders"] == 1 and r["cosine"] == 1.0


class TestTopPaths:
    def _ev(self, eid, user, typ, sec):
        return (eid, T0 + dt.timedelta(seconds=sec), user, typ, 1.0, "{}")

    def test_prefix_order_and_counts(self, spark):
        rows = [
            # user 1 and 2: view > click > purchase
            self._ev(1, 1, "view", 0), self._ev(2, 1, "click", 10),
            self._ev(3, 1, "purchase", 20),
            self._ev(4, 2, "view", 5), self._ev(5, 2, "click", 6),
            self._ev(6, 2, "purchase", 7),
            # user 3: lone view
            self._ev(7, 3, "view", 1),
        ]
        out = {r["path"]: r["n_users"] for r in
               top_paths(spark.createDataFrame(rows, EV_SCHEMA)).collect()}
        assert out == {"view>click>purchase": 2, "view": 1}

    def test_prefix_len_caps_path(self, spark):
        rows = [self._ev(i, 1, f"t{i}", i) for i in range(8)]
        out = top_paths(
            spark.createDataFrame(rows, EV_SCHEMA), prefix_len=3
        ).collect()
        assert out[0]["path"] == "t0>t1>t2"

    def test_same_ts_ties_break_by_event_id(self, spark):
        rows = [self._ev(2, 1, "b", 0), self._ev(1, 1, "a", 0)]
        out = top_paths(spark.createDataFrame(rows, EV_SCHEMA)).collect()
        assert out[0]["path"] == "a>b"
