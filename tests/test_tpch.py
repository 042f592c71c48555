"""Plan-hygiene and semantics pins for the TPC-H-analog queries
(operators/tpch.py): the scale-critical choices each query exists to
exercise must survive optimizer changes."""

import __spark_entry__ as entry_mod
from p2_mapreduce_spark.plans import plan_report


def _report(spark, sf_dir, qid):
    return plan_report(entry_mod.queries()[qid](spark, sf_dir))


def test_volume_shipping_broadcasts_nation_dims(spark, sf_dir):
    r = _report(spark, sf_dir, "volume_shipping")
    # both nation lookups (supplier-side + customer-side) broadcast
    assert r["n_broadcast_joins"] >= 2
    assert not r["has_python_worker"]
    assert r["has_partial_agg"]


def test_returned_items_topk_is_not_global_sort(spark, sf_dir):
    r = _report(spark, sf_dir, "returned_items")
    assert "TakeOrderedAndProject" in r["plan"], (
        "top-k must plan as TakeOrderedAndProject, not a full sort"
    )
    # returnflag + orderdate predicates reach the parquet scans
    pushed = " ".join(r["pushed_filters"])
    assert "l_returnflag" in pushed
    assert "o_orderdate" in pushed


def test_disjunctive_pricing_pushes_quantity_hull(spark, sf_dir):
    r = _report(spark, sf_dir, "disjunctive_pricing")
    pushed = " ".join(r["pushed_filters"])
    # the explicit BETWEEN hull of the OR branches must reach the scan
    assert "l_quantity" in pushed
    assert r["n_broadcast_joins"] >= 1  # part dim broadcast


def test_promo_revenue_single_pass(spark, sf_dir):
    r = _report(spark, sf_dir, "promo_revenue")
    pushed = " ".join(r["pushed_filters"])
    assert "l_shipdate" in pushed
    # numerator + denominator in ONE aggregate: lineitem + part scanned
    # once each (formatted plans print every node twice: tree + detail)
    assert r["plan"].count("Scan parquet") <= 4


def test_idle_rich_customers_semantics(spark, sf_dir):
    import pyspark.sql.functions as F

    from p2_mapreduce_spark.operators.tpch import idle_rich_customers
    from p2_mapreduce_spark.session import load_table

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rows = idle_rich_customers(customer, orders, since="1999-01-01").collect()
    # no reported customer may have a recent order: re-derive the recent
    # set and check it is disjoint from the per-segment counts' basis
    recent = (
        orders.filter(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_cust"] for r in rows) <= customer.count() - recent
    r = _report(spark, sf_dir, "idle_rich_customers")
    assert "LeftAnti" in r["plan"] or "left_anti" in r["plan"]


def test_market_share_single_aggregate_pass(spark, sf_dir):
    r = _report(spark, sf_dir, "market_share")
    # share = conditional-sum / sum in one groupBy: 8 table scans (nation
    # twice), NOT 16 — a self-join denominator would double the fact scan
    # (×2: formatted plans print every node twice)
    assert r["plan"].count("Scan parquet") <= 16
    assert not r["has_python_worker"]
