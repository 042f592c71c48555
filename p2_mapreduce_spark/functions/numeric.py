"""Cross-engine-deterministic numeric aggregation.

Problem: ``SUM(double)`` is order-dependent (FP addition isn't
associative), and Spark's shuffle order differs run-to-run and from the
DuckDB oracle — so a double sum can't be value-hash-compared, and at
1000-executor scale it isn't even reproducible against itself.

Protocol (used by every money/quantity aggregate in this engine):
1. cast each term to an exact DECIMAL before aggregating — the testdata's
   doubles are 2-decimal quantities, so ``DECIMAL(p,2)`` (or ``(p,4)``
   for a product of two 2-decimal terms) recovers the exact value; a
   decimal never hits a round-half tie because no double is exactly
   ``x.xx5`` (0.005 is not dyadic);
2. SUM the decimals — exact, associative, order-independent;
3. surface as DOUBLE (one deterministic rounding) so the result schema is
   engine-neutral;
4. averages = exact-decimal sum as double ÷ count — a single IEEE
   division, bit-identical everywhere.

This is also the right 100 TB answer, not just an oracle trick: exact
decimal aggregation makes results reproducible across partitionings,
retries, and AQE re-plans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent sum of a fixed-scale double column, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 2, precision: int = 18) -> str:
    """DuckDB oracle twin of :func:`dsum` (same cast chain, ANSI SQL)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def davg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Deterministic mean: exact-sum-as-double / count (single division)."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale, precision) / F.count(c)


def davg_sql(expr: str, scale: int = 2, precision: int = 18) -> str:
    return f"{dsum_sql(expr, scale, precision)} / COUNT({expr})"
