"""Plan inspection / scale-hygiene auditing."""

from p2_mapreduce_spark.plans.explain import plan_report, physical_plan

__all__ = ["plan_report", "physical_plan"]
