"""Tests for the plan doctor: known-bad plans must be flagged, the
engine's own headline plans must come back clean of errors."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from p2_mapreduce_spark.plans.doctor import audit_plan
from p2_mapreduce_spark.session import load_table


def _rules(findings):
    return {f["rule"] for f in findings}


class TestDoctorFlagsBadPlans:
    def test_cartesian_product(self, spark, sf_dir):
        a = load_table(spark, sf_dir, "orders")
        b = load_table(spark, sf_dir, "lineitem")
        # non-equi condition over two large-ish tables, no broadcast hint
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            bad = a.crossJoin(b).filter(a.o_totalprice > b.l_extendedprice)
            rules = _rules(audit_plan(bad))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        assert "cartesian-product" in rules

    def test_global_window_funnel(self, spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem")
        w = Window.orderBy("l_extendedprice")  # no partition: one task
        bad = li.withColumn("rn", F.row_number().over(w))
        assert "single-partition-funnel" in _rules(audit_plan(bad))

    def test_row_python_udf(self, spark, sf_dir):
        from pyspark.sql.functions import udf

        li = load_table(spark, sf_dir, "lineitem")
        slow = udf(lambda x: x + 1.0, "double")
        bad = li.select(slow("l_extendedprice").alias("y"))
        assert "row-python-udf" in _rules(audit_plan(bad))

    def test_defeated_pushdown(self, spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem")
        # wrapping the column in a Python-opaque cast chain defeats
        # parquet pushdown: filter evaluates post-scan
        bad = li.filter(
            F.md5(F.col("l_returnflag").cast("string")) == F.lit("x")
        )
        assert "filter-not-pushed" in _rules(audit_plan(bad))


class TestDoctorPassesGoodPlans:
    def test_headline_queries_have_no_errors(self, spark, sf_dir):
        import __spark_entry__ as entry_mod

        qs = entry_mod.queries()
        # a representative slice of the JVM-side headline set
        for name in [
            "agg_pricing",
            "filter_project",
            "join_orders_customer",
            "shipping_priority",
            "quality_classifier",
            "grouped_ols2",
            "table_digest",
        ]:
            findings = audit_plan(qs[name](spark, sf_dir))
            errors = [f for f in findings if f["severity"] == "error"]
            assert not errors, (name, errors)
