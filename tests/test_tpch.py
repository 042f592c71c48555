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


def test_order_priority_check_semi_join_on_keys(spark, sf_dir):
    r = _report(spark, sf_dir, "order_priority_check")
    # EXISTS must plan as a semi join, never a full join + distinct
    assert "LeftSemi" in r["plan"]
    pushed = " ".join(r["pushed_filters"])
    assert "o_orderdate" in pushed
    assert "l_returnflag" in pushed
    assert not r["has_python_worker"]


def test_top_supplier_reuses_revenue_exchange(spark, sf_dir):
    r = _report(spark, sf_dir, "top_supplier")
    pushed = " ".join(r["pushed_filters"])
    assert "l_shipdate" in pushed
    # the per-supplier revenue table is persisted and feeds both the MAX
    # and the equality filter from ONE lineitem scan: the plan reads the
    # cache twice and parquet only inside the single cached branch
    assert r["plan"].count("InMemoryTableScan") >= 2
    assert r["plan"].count("Scan parquet lineitem") <= 2  # tree+detail
    assert r["n_broadcast_joins"] >= 2  # max scalar + supplier dim


def test_small_qty_revenue_brand_broadcast(spark, sf_dir):
    r = _report(spark, sf_dir, "small_qty_revenue")
    assert r["n_broadcast_joins"] >= 2  # part keys + per-part averages
    assert not r["has_python_worker"]
    # sanity: threshold actually excludes rows (strictly below the mean
    # keeps roughly half the brand's lines, never all of them)
    from p2_mapreduce_spark.operators.tpch import small_qty_revenue
    from p2_mapreduce_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    kept = small_qty_revenue(li, part, frac=2.0).collect()[0][0]
    below = small_qty_revenue(li, part, frac=0.5).collect()[0][0]
    assert below is not None and kept is not None and below < kept


def test_sole_returner_plans_semi_and_anti(spark, sf_dir):
    r = _report(spark, sf_dir, "sole_returner")
    assert "LeftSemi" in r["plan"]
    assert "LeftAnti" in r["plan"]
    assert "TakeOrderedAndProject" in r["plan"]
    assert "l_returnflag" in " ".join(r["pushed_filters"])


def test_sole_returner_is_sole(spark, sf_dir):
    # every reported supplier must be the ONLY returner on ≥1 'F' order
    # with other suppliers present: re-derive per-order returner counts
    import pyspark.sql.functions as F

    from p2_mapreduce_spark.operators.tpch import sole_returner
    from p2_mapreduce_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    out = sole_returner(li, orders, supplier, k=1000)
    got = {r["s_name"]: r["numwait"] for r in out.collect()}

    ret = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    ).distinct()
    per_order = ret.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_ret"),
    )
    n_supp = li.select("l_orderkey", "l_suppkey").distinct().groupBy(
        "l_orderkey"
    ).agg(F.count(F.lit(1)).alias("n_supp"))
    fkeys = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    expect = (
        ret.join(per_order, "l_orderkey")
        .join(n_supp, "l_orderkey")
        .join(fkeys, ret.l_orderkey == fkeys.o_orderkey, "left_semi")
        .filter((F.col("n_ret") == 1) & (F.col("n_supp") > 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
    )
    want = {r["s_name"]: r["numwait"] for r in expect.collect()}
    assert got == want
