"""Audit of the r10 plan-level query memo (__spark_entry__._PLAN_MEMO).

The memo reuses a query's DataFrame OBJECT — an immutable logical plan —
across calls within one (application, sf_dir) scope.  That is only safe
when the builder is a pure plan construction:

* ZERO Spark jobs during construction — a builder that collects or
  localCheckpoints would otherwise smuggle computed data across uses
  (result caching, which the bench contract forbids);
* ZERO ``persist()`` calls during construction — the bench unpersists a
  query's tracked intermediates after each timed run, so a memoized plan
  that relied on its own persist would silently recompute that
  intermediate un-cached in every later execution (a performance lie in
  the other direction).

This test re-derives both properties for EVERY allowlisted id, so a
builder that grows an action or a persist fails CI instead of silently
riding the memo (the same self-auditing-allowlist discipline as the
Arrow-kernel plan audit in test_plans.py).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as contract


def _job_count(spark) -> int:
    # DAGScheduler.nextJobId is the count of jobs ever submitted
    return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()


def test_allowlist_ids_exist():
    base = contract._queries_base()
    missing = sorted(contract._PLAN_PURE_IDS - set(base))
    assert not missing, f"allowlisted ids without builders: {missing}"


def test_memo_reuses_underlying_plan(spark, sf_dir):
    """Two calls reuse ONE stored plan object (construction happens
    once), but each caller gets a fresh alias wrapper — sharing the
    DataFrame object itself would freeze its JVM QueryExecution's
    physical plan at first explain (see _plan_memoized)."""
    qs = contract.queries()
    name = next(iter(sorted(contract._PLAN_PURE_IDS)))
    key_of = lambda: {
        k: v for k, v in contract._PLAN_MEMO.items() if k[2] == "q:" + name
    }
    a = qs[name](spark, sf_dir)
    stored = key_of()
    b = qs[name](spark, sf_dir)
    assert key_of() == stored and len(stored) == 1  # one build, reused
    assert a is not b  # fresh wrapper per call (fresh QueryExecution)
    inner = next(iter(stored.values()))
    assert a.schema == inner.schema == b.schema


def test_non_allowlisted_not_wrapped():
    qs = contract.queries()
    for name in set(qs) - contract._PLAN_PURE_IDS:
        assert not getattr(qs[name], "__name__", "").startswith("_memo_"), name


def test_allowlisted_builders_are_pure(spark, sf_dir):
    """Every allowlisted builder runs 0 jobs and 0 persists on a warm
    rebuild (first build may materialize the judge-reviewed shared DATA
    stages — those are memoized separately and are not under audit)."""
    from pyspark.sql.classic.dataframe import DataFrame as _DF

    base = contract._queries_base()
    persists: list = []
    orig = _DF.persist

    def tracking(self, *a, **k):
        persists.append(1)
        return orig(self, *a, **k)

    impure: dict[str, tuple[int, int]] = {}
    try:
        _DF.persist = tracking
        for name in sorted(contract._PLAN_PURE_IDS):
            build = base[name]
            build(spark, sf_dir)  # warm: shared data memos materialize
            persists.clear()
            j0 = _job_count(spark)
            build(spark, sf_dir)
            jobs = _job_count(spark) - j0
            if jobs or persists:
                impure[name] = (jobs, len(persists))
    finally:
        _DF.persist = orig
    assert not impure, f"allowlisted builders with actions/persists: {impure}"


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
