"""Table profiling — the one-pass column-statistics sweep every
ingest pipeline runs before trusting a new dataset.

One aggregate computes every column's profile simultaneously (Catalyst
evaluates all the aggregate expressions in a single partial→final pass —
the table is scanned ONCE no matter how many columns), then the 1-row
wide result unpivots to one row per column.  Values are surfaced as
strings so a single schema covers heterogeneous column types — the same
trick ``df.summary()`` uses, but deterministic (no approximate
quantiles) and therefore oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column profile: row count, null count, distinct count (exact),
    and min/max rendered as strings.

    Returns ``(column, n_rows, n_null, n_distinct, min_s, max_s)`` — one
    row per profiled column.  Distinct counts are exact (one expand per
    column inside the same aggregate); for quick-look profiling at
    extreme widths swap in ``approx_count_distinct`` — kept exact here
    so the driver can hash-check values.
    """
    names = list(cols) if cols is not None else list(df.columns)
    aggs = []
    for c in names:
        aggs.extend(
            [
                F.count(F.lit(1)).alias(f"{c}__rows"),
                F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__null"),
                F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
                F.min(F.col(c)).cast("string").alias(f"{c}__min"),
                F.max(F.col(c)).cast("string").alias(f"{c}__max"),
            ]
        )
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__rows").alias("n_rows"),
            F.col(f"{c}__null").alias("n_null"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_s"),
            F.col(f"{c}__max").alias("max_s"),
        )
        for c in names
    ]
    return wide.select(
        F.explode(F.array(*per_col)).alias("p")
    ).select("p.*")


def hll_distinct_rollup(
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    m: int = 64,
    rmax: int = 40,
) -> DataFrame:
    """Per-region distinct-customer estimate from a from-scratch
    HyperLogLog whose nation-grain registers roll up to regions by MAX —
    the mergeable-sketch pattern that lets a 100 TB pipeline store tiny
    per-partition states and answer distinct counts at any coarser grain
    without rescanning facts (Flajolet et al. 2007, raw estimator).

    Every step is deterministic and cross-engine exact, so the ESTIMATE
    itself is value-hash oracle-checkable (unlike opaque datasketches
    blobs):

    - bucket ``j = h % m`` and rank ``r`` (leading zeros of the
      remaining 60−log2(m) hash bits, +1) come from the md5-60 hash —
      ``bin()`` gives the bit length in both engines;
    - ``r`` is clamped at ``rmax``=40 so every ``2^-r`` term and every
      partial sum of ≤``m`` of them stays exactly representable in a
      double (≤ log2(m)+40 significant bits < 53) — the harmonic sum is
      order-independent, surviving any partitioning/merge order;
    - the estimate is one pinned tree of correctly-rounded double ops.

    ``m``=64 keeps every fixture grain inside the raw estimator's valid
    regime (n ≳ 2.5·m): the small-range branch production HLL adds below
    that is linear counting, whose ``ln()`` is not IEEE-pinned and hence
    not oracle-able — documented trade, σ ≈ 1.04/√64 ≈ 13%.

    Registers are max-aggregated: duplicates collapse for free (max is
    idempotent), and nation→region merge == computing registers directly
    at region grain (max associativity) — asserted in pytest.  Exact
    distinct counts ride along for the error column.
    """
    alphas = {16: 0.673, 32: 0.697, 64: 0.709}
    alpha_v = alphas.get(m, 0.7213 / (1.0 + 1.079 / m))
    wbits = 60 - m.bit_length() + 1  # bits left after the bucket index
    h = F.conv(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 18, 15), 16, 10
    ).cast("long")
    base = (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("r_name", "n_nationkey", "c_custkey", h.alias("h"))
    )
    jr = base.select(
        "r_name",
        "n_nationkey",
        (F.col("h") % m).alias("j"),
        F.expr(
            f"least({rmax}, CASE WHEN h div {m} = 0 THEN {wbits + 1} "
            f"ELSE {wbits} - length(bin(h div {m})) + 1 END)"
        ).alias("r"),
    )
    nation_regs = jr.groupBy("r_name", "n_nationkey", "j").agg(
        F.max("r").alias("r")
    )
    region_regs = nation_regs.groupBy("r_name", "j").agg(F.max("r").alias("r"))
    sums = region_regs.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("nz"),
        F.sum(F.expr("1.0 / shiftleft(cast(1 as bigint), r)")).alias("snz"),
    )
    exact = base.groupBy("r_name").agg(
        F.countDistinct("c_custkey").alias("exact_distinct")
    )
    est = (F.lit(alpha_v) * F.lit(float(m * m))) / (
        F.col("snz") + (F.lit(float(m)) - F.col("nz"))
    )
    return exact.join(sums, "r_name").select(
        "r_name",
        "exact_distinct",
        est.alias("est_distinct"),
        ((est - F.col("exact_distinct")) / F.col("exact_distinct")).alias(
            "rel_err"
        ),
    )
