"""MEASURED shuffle-volume audit — the empirical face of every "shape at
100 TB" docstring contract in this engine.

The plan doctor (plans/doctor.py) reads what the optimizer *intends*;
this module reads what the executors actually *did*: per-stage shuffle
write bytes from the JVM's AppStatusStore (the store that backs the
Spark UI / REST API — populated even with ``spark.ui.enabled=false``).
A docstring that claims "the corpus never crosses the wire" becomes a
pytest assertion: materialize the operator, subtract the session's
shuffle-byte counter before/after, and bound the delta against the
input's actual byte volume (tests/test_shuffle_audit.py).

Measurement, not estimation: AQE re-plans, runtime filters, and
map-side partial aggregation all land in the measured number — exactly
the effects a static plan inspection cannot see.

Caveat: the delta attributes ALL shuffle writes between the two reads
to the audited action, so callers must not run concurrent jobs on the
session (the pytest suite is sequential; the helper is not a profiler
for shared clusters — there, per-stage attribution comes from the REST
API's job-group filtering instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def total_shuffle_write_bytes(spark: SparkSession) -> int:
    """Lifetime shuffle bytes written across the session's executors
    (v1.ExecutorSummary.totalShuffleWrite — a monotone counter, so
    deltas attribute cleanly; unlike stage listings it never ages out
    under spark.ui.retainedStages)."""
    store = spark.sparkContext._jsc.sc().statusStore()
    it = store.executorList(False).iterator()
    total = 0
    while it.hasNext():
        total += it.next().totalShuffleWrite()
    return total


def measure_shuffle_bytes(df: DataFrame) -> int:
    """Materialize ``df`` end-to-end (noop sink — no extra aggregate is
    appended to the plan, unlike ``count()``) and return the shuffle
    bytes its execution wrote."""
    spark = df.sparkSession
    before = total_shuffle_write_bytes(spark)
    df.write.format("noop").mode("overwrite").save()
    return total_shuffle_write_bytes(spark) - before
