"""Skew-mitigation operators.

At 100 TB a handful of hot keys (one bot user, one viral document) can
put an entire shuffle partition on one executor.  Two standing answers:

- AQE skew-join splitting (on in session.py) handles skewed JOINS
  transparently.
- For skewed AGGREGATIONS, the classic fix is salting: add a uniform
  salt to the key, aggregate (key, salt) — spreading a hot key over
  ``n_salts`` tasks — then re-aggregate by key.  Spark's partial
  aggregation already de-skews simple aggs (partials combine map-side),
  so salting matters for aggregates whose partial state is large —
  collect_list/collect_set, exact distinct counts — where every value of
  the hot key otherwise lands in one reduce task.

Exactness note: the two-phase sum keeps DECIMAL precision between the
phases (the partial is NOT rounded to double first), so the salted result
is bit-identical to the unsalted one under any salt count or partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_user_stats(events: DataFrame, n_salts: int = 8) -> DataFrame:
    """Per-user event stats via salted two-phase aggregation.

    Phase 1 groups by (user_id, salt) — a hot user spreads over
    ``n_salts`` tasks; phase 2 merges the ≤ n_salts partial rows per
    user.  The salt is derived from event_id (deterministic, uniform),
    not from the ordering — results are reproducible by construction.
    ``collect_set`` is the aggregate that actually needs this: its
    partial state is the value set itself, which partial aggregation
    cannot shrink for a hot key."""
    salted = events.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(n_salts))
    )
    partial = salted.groupBy("user_id", "salt").agg(
        F.count(F.lit(1)).alias("p_n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("p_sum"),
        F.collect_set("event_type").alias("p_types"),
    )
    return partial.groupBy("user_id").agg(
        F.sum("p_n").alias("n_events"),
        F.sum("p_sum").cast("double").alias("sum_value"),
        F.size(F.array_distinct(F.flatten(F.collect_list("p_types")))).cast(
            "bigint"
        ).alias("n_event_types"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """Skew-safe equi join: salt the fact side, REPLICATE the dim side.

    When the build side is too big to broadcast and a handful of fact
    keys are hot, a plain shuffle join puts every row of a hot key in one
    task.  The standing fix (pre-AQE, and still the answer when AQE's
    split heuristics miss — e.g. the skew is in a later stage's input,
    not shuffle files): append ``salt = hash(row) % n_salts`` to the fact
    key, cross the dim side with ``explode(sequence(0, n_salts-1))`` so
    every (dim_key, salt) pair exists, and join on (key, salt) — the hot
    key now spreads over ``n_salts`` tasks at the cost of writing the dim
    side ``n_salts``× into the shuffle (dim is the SMALL side; the fact
    side is written once, unchanged).

    The salt derives from a deterministic uniform hash of
    ``salt_source`` (default: the fact key itself plus a row-unique
    column is better — pass e.g. the fact table's line number), so the
    result set is identical for ANY ``n_salts`` — pinned by the
    partition/salt invariance test.  Join semantics are inner; the salt
    columns never escape.
    """
    src = salt_source or fact_key
    f = fact.withColumn("__salt", F.pmod(F.xxhash64(F.col(src)), F.lit(n_salts)))
    d = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")),
    )
    out = f.join(
        d,
        (F.col(fact_key) == F.col(dim_key)) & (f["__salt"] == d["__salt"]),
        "inner",
    )
    return out.drop(f["__salt"]).drop(d["__salt"])


def hybrid_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    heavy_threshold: int = 1000,
) -> DataFrame:
    """Differentiated (hot/cold) join — the classic MANUAL skew device
    that predates AQE and still matters when the skewed side's hot
    partition exceeds what AQE's split granularity can fix: keys whose
    fact-side count exceeds ``heavy_threshold`` take the BROADCAST
    path (their dim rows replicate to every executor, so the hot key's
    rows never co-locate), everything else takes the ordinary hash
    join.  The union of the two disjoint paths is exactly the plain
    join — pinned by the oracle and pytest.

    Cost model: the heavy-key list is a map-side-combined count filter
    (#heavy keys rows — tiny by definition of "heavy"); the broadcast
    side is dim ⋉ heavy (bounded by #heavy × rows-per-key); the cold
    path's per-key fan-in is ≤ threshold by construction, so no
    reduce task can be hot.  Compare :func:`salted_user_stats` (the
    aggregation face) and AQE's runtime split (tests/test_plans.py) —
    three devices, one problem.
    """
    heavy = (
        fact.groupBy(fact_key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > heavy_threshold)
        .select(fact_key)
    )
    fact_heavy = fact.join(
        F.broadcast(heavy), fact_key, "left_semi"
    )
    fact_cold = fact.join(F.broadcast(heavy), fact_key, "left_anti")
    dim_heavy = dim.join(
        F.broadcast(heavy.withColumnRenamed(fact_key, dim_key)),
        dim_key,
        "left_semi",
    )
    hot = fact_heavy.join(
        F.broadcast(dim_heavy), fact_heavy[fact_key] == dim_heavy[dim_key]
    )
    cold = fact_cold.join(dim, fact_cold[fact_key] == dim[dim_key])
    return hot.unionByName(cold)
