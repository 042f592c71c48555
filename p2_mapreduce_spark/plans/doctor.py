"""Plan doctor: mechanical review of an arbitrary DataFrame's physical
plan for the scale smells this engine's own operators are audited
against (tests/test_plans.py) — so USER queries get the same hygiene
check the built-ins do.

Each finding is ``{"rule", "severity", "detail"}``.  Rules are
deliberately syntactic (regex over the formatted plan): the point is a
fast pre-flight warning on a 100 TB submission, not a second optimizer.
``severity`` is "error" for things that are almost always a scale
incident (cartesian product over non-tiny inputs, data-grain
single-partition sort/window) and "warn" for likely-but-not-certain
problems (row-at-a-time Python in the plan, no pushed filters on a
filtered scan, missing partial aggregation).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from p2_mapreduce_spark.plans.explain import physical_plan


def audit_plan(df: DataFrame) -> list[dict]:
    """Scan ``df``'s physical plan for scale smells; [] == clean."""
    plan = physical_plan(df)
    nodes = re.findall(r"^\(\d+\) (\w+)", plan, flags=re.MULTILINE)
    findings: list[dict] = []

    def add(rule: str, severity: str, detail: str) -> None:
        findings.append({"rule": rule, "severity": severity, "detail": detail})

    if "CartesianProduct" in nodes:
        add(
            "cartesian-product",
            "error",
            "CartesianProduct joins every row to every row; at scale this "
            "never finishes. Add an equi/range condition or broadcast the "
            "small side explicitly.",
        )
    # a SinglePartition exchange feeding a Sort or Window funnels the
    # whole dataset through one task — fine for grain-bounded inputs,
    # fatal at data grain; flag every occurrence for human review
    # the formatted plan renders the exchange mode in the detail section
    # ("Arguments: SinglePartition, ..."), not inline after "Exchange"
    n_single = plan.count("SinglePartition")
    if n_single:
        add(
            "single-partition-funnel",
            "error",
            f"{n_single} Exchange SinglePartition node(s): a global "
            "sort/window/limit collapses to ONE task. Acceptable only over "
            "grain-bounded intermediates (config- or calendar-sized); for "
            "data-grain running totals use range partitioning + two-phase "
            "prefix aggregation (see curation.pack_sequences).",
        )
    if "BroadcastNestedLoopJoin" in nodes:
        # a non-equi join condition compiles to BNLJ: every streamed row
        # is tested against the whole broadcast side. Deliberate uses
        # (a config-small literal probe table) are fine — an ACCIDENTAL
        # one (typo'd join key, cast mismatch) is linear-in-broadcast
        # per row and explodes when the "small" side isn't.
        add(
            "broadcast-nested-loop-join",
            "warn",
            "BroadcastNestedLoopJoin tests EVERY streamed row against "
            "the ENTIRE broadcast side (no hash lookup): cost is "
            "rows x broadcast_size. Intended only for config-small "
            "probe tables; if the condition was meant to be an equi "
            "join, fix the key (a cast or expression around it defeats "
            "hash join selection), or bucketize a range predicate into "
            "an equi join (see relational.range_join_quantity_bands).",
        )
    if "BatchEvalPython" in plan:
        add(
            "row-python-udf",
            "warn",
            "BatchEvalPython = row-at-a-time Python UDF: ~10-100x slower "
            "than built-ins or Arrow-batched pandas UDFs. Rewrite with "
            "pyspark.sql.functions, or at least @pandas_udf.",
        )
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    only_trivial = lambda p: all(  # noqa: E731
        t.strip().startswith("IsNotNull") for t in p.split(",") if t.strip()
    )
    if "Filter" in nodes and pushed and all(only_trivial(p) for p in pushed):
        add(
            "filter-not-pushed",
            "warn",
            "The plan filters rows but no VALUE predicate reaches any "
            "scan (only IsNotNull) — the real predicate evaluates after "
            "a full read (a cast/hash/UDF around the column defeats "
            "pushdown).",
        )
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if m and len(m.group(1).split(",")) > 24:
        add(
            "wide-scan",
            "warn",
            f"A scan reads {len(m.group(1).split(','))} columns; if the "
            "query needs fewer, select them before heavy operators so "
            "column pruning reaches the reader.",
        )
    if "SortMergeJoin" in nodes and "rows, Statistics" not in plan:
        # advisory only: SMJ is often right — surface it so the author
        # checks whether one side is broadcastable
        add(
            "sortmerge-join",
            "info",
            "SortMergeJoin shuffles BOTH sides on the join key. If one "
            "side is dimension-sized, hint broadcast() — or bucket both "
            "tables on the key to make the join exchange-free.",
        )
    if "HashAggregate" in nodes and "partial" not in plan:
        add(
            "no-partial-agg",
            "warn",
            "An aggregate runs without a map-side partial phase "
            "(typically caused by distinct-style aggregates over "
            "high-cardinality input): the full input shuffles to the "
            "final aggregation.",
        )
    return findings
