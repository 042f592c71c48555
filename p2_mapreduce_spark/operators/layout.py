"""Multi-dimensional clustered layout (z-order) for data skipping.

At 100 TB the fastest scan is the one that never reads the file: parquet
keeps min/max statistics per row group and per file, and Spark prunes
both when a predicate falls outside the stored range.  Sorting by ONE
column makes only that column's ranges narrow; interleaving the bits of
several columns (the z-order / Morton curve) makes EVERY interleaved
column's range narrow in every file, so multi-dimensional range
predicates (``p_partkey BETWEEN ... AND s_suppkey BETWEEN ...``) prune
files on all dimensions at once.

The curve is computed as a pure bit-arithmetic column expression —
shift/AND/OR folded by whole-stage codegen, no UDF — and the layout is a
``repartitionByRange(zval)`` + within-partition sort: one range shuffle,
then each output file covers a contiguous z-range, i.e. a small
hyper-rectangle of the key space.

The same construction is what Delta/Iceberg ``OPTIMIZE ZORDER BY``
performs; here it is expressed with nothing but public DataFrame ops.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: default interleave width: 16 bits/dimension (2 dims → 32-bit zval)
DEFAULT_BITS = 16


def zvalue(cols: Sequence[str], bits: int = DEFAULT_BITS) -> Column:
    """Morton interleave of non-negative integer columns: bit ``b`` of
    column ``i`` lands at position ``b * len(cols) + i``.

    The expansion is ``bits × len(cols)`` shift-mask-or terms — a flat
    JVM expression tree that codegen collapses into straight-line long
    arithmetic (no Python, no allocation).  Columns must fit in ``bits``
    bits; values are masked, so out-of-range bits are dropped rather
    than corrupting neighbours.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError("interleave exceeds a signed 64-bit zval")
    terms = [
        F.shiftleft(
            F.shiftright(F.col(c).cast("long"), b).bitwiseAND(F.lit(1)),
            b * n + i,
        )
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return reduce(Column.bitwiseOR, terms)


def zvalue_sql(cols: Sequence[str], bits: int = DEFAULT_BITS) -> str:
    """ANSI-SQL twin of :func:`zvalue` (DuckDB bit operators) — the
    oracle builds the identical interleave expression."""
    n = len(cols)
    terms = [
        f"((({c} >> {b}) & 1) << {b * n + i})"
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return " | ".join(terms)


def zorder_cluster(
    lineitem: DataFrame,
    cols: Sequence[str] = ("l_partkey", "l_suppkey"),
    bits: int = DEFAULT_BITS,
    drop_bits: int = 10,
) -> DataFrame:
    """Per-z-bucket locality profile of the curve over ``lineitem``:
    bucket = zval with the low ``drop_bits`` bits dropped, and for each
    bucket the row count plus min/max of every interleaved key.

    This is the *audit* of the layout contract: dropping ``2k`` low bits
    of a 2-D curve confines each bucket to a ``2^(k) × 2^(k)`` square,
    so ``max-min ≤ 2^k − 1`` per dimension per bucket — exactly the
    min/max tightness parquet footers get when files align to z-ranges.
    One narrow aggregate (the zval fold happens in the scan's project),
    output is O(#buckets) rows.
    """
    z = zvalue(cols, bits).alias("zb")
    aggs = [F.count(F.lit(1)).alias("n_lines")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        lineitem.select(*cols, F.shiftright(z, drop_bits).alias("bucket"))
        .groupBy("bucket")
        .agg(*aggs)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = DEFAULT_BITS,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered along the z-curve of ``cols``:
    one range shuffle on the zval (range partitioning keeps files
    balanced even when the key distribution is skewed — the partitioner
    samples real quantiles), a within-partition sort so row groups
    inside each file are also z-contiguous, and a plain parquet write.

    Readers need no special support: parquet min/max footers over the
    original columns are narrow in every file, so any engine's stats
    pruning (Spark, DuckDB, Trino) skips non-matching files for range
    predicates on ANY subset of ``cols``.
    """
    zcol = zvalue(cols, bits).alias("__zval")
    (
        df.select("*", zcol)
        .repartitionByRange(n_files, F.col("__zval"))
        .sortWithinPartitions("__zval")
        .drop("__zval")
        .write.mode("overwrite")
        .parquet(path)
    )


def compaction_plan(
    lineitem: DataFrame,
    target_rows: int = 100_000,
    date_col: str = "l_shipdate",
) -> DataFrame:
    """Small-file compaction planner — the maintenance pass every
    partitioned 100 TB table needs: month partitions written by daily
    ingest end up as many under-sized files, and scans pay one task +
    one footer read per file.  The planner bins ADJACENT month
    partitions (contiguity keeps partition-pruning effective after the
    rewrite) into compaction groups of ~``target_rows`` via a running
    total: ``bin = floor(rows_before_me / target)``.

    Two-level plan, driver never sees data: (1) one narrow aggregate
    computes per-partition row counts and byte estimates — O(#partitions)
    rows; (2) one window over that TINY stats table assigns bins.  The
    single-partition window is safe for the same reason the calendar
    rollups' are: its input is the pre-aggregated partition list, never
    rows.  The rewrite itself is :func:`write_zordered` /
    ``repartitionByRange`` per bin — this operator emits the plan the
    rewriter consumes (and the audit a human reviews).

    Output: one row per month partition — (part_month, n_rows,
    est_bytes, bin, bin_rows, bin_parts), where bin_rows/bin_parts
    aggregate the assigned group.
    """
    stats = (
        lineitem.groupBy(
            F.date_format(F.col(date_col), "yyyy-MM").alias("part_month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.lit(80)
                + F.length("l_returnflag")
                + F.length("l_linestatus")
            ).alias("est_bytes"),
        )
    )
    w_cum = (
        Window.orderBy("part_month")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = stats.withColumn(
        "bin",
        F.floor(
            F.coalesce(F.sum("n_rows").over(w_cum), F.lit(0))
            / F.lit(target_rows)
        ).cast("bigint"),
    )
    w_bin = Window.partitionBy("bin")
    return (
        binned.withColumn("bin_rows", F.sum("n_rows").over(w_bin))
        .withColumn("bin_parts", F.count(F.lit(1)).over(w_bin))
        .select(
            "part_month", "n_rows", "est_bytes", "bin", "bin_rows", "bin_parts"
        )
    )


def bitmap_count(
    orders: DataFrame,
    col_a: str = "o_orderstatus",
    val_a: str = "F",
    col_b: str = "o_orderpriority",
    val_b: str = "1-URGENT",
    rid_col: str = "o_orderkey",
) -> DataFrame:
    """Bitmap-index conjunction counting — the third index family next to
    the postings (text) and trigram (substring) indexes: one bitmap per
    (column, value), rows addressed by a deterministic record id packed
    into 64-bit words (``bit_or`` fold per word), and ANY boolean
    combination of predicates answered by word-wise AND/OR + popcount —
    no re-scan of the fact table.

    The record id is the table's unique natural key (``o_orderkey`` —
    sparse ids cost words, never correctness; a non-unique rid would
    silently merge rows, so uniqueness is the one hard precondition).
    Each bitmap build is ONE narrow aggregate to (word → bits); the
    conjunction is an equi-join of two word tables + a popcount sum —
    at 100 TB these are the index-maintenance and index-probe costs of
    a real bitmap index, with the fact scan amortized across every
    future predicate combination.

    Output (one row): n_a, n_b, n_both — popcount totals of bitmap A,
    bitmap B, and A AND B; bit-exact equal to the direct conditional
    counts (the oracle).
    """
    base = orders.select(
        # integral quotient, not double '/': float division loses exactness
        # for record ids above 2^53, which the 100 TB framing requires
        F.expr(f"CAST({rid_col} AS BIGINT) div 64").alias("word"),
        # shiftleft's bit count must be a column here; the SQL form takes one
        F.expr(f"shiftleft(1L, CAST(pmod({rid_col}, 64) AS INT))").alias("bit"),
        F.col(col_a), F.col(col_b),
    )

    def bitmap(pred):
        return (
            base.where(pred)
            .groupBy("word")
            .agg(F.bit_or("bit").alias("bits"))
        )

    ba = bitmap(F.col(col_a) == val_a)
    bb = bitmap(F.col(col_b) == val_b)
    pop_a = ba.agg(
        F.coalesce(F.sum(F.bit_count("bits")), F.lit(0))
        .cast("bigint").alias("n_a")
    )
    pop_b = bb.agg(
        F.coalesce(F.sum(F.bit_count("bits")), F.lit(0))
        .cast("bigint").alias("n_b")
    )
    both = (
        ba.alias("x")
        .join(bb.alias("y"), "word")
        .agg(
            F.coalesce(
                F.sum(F.bit_count(F.col("x.bits").bitwiseAND(F.col("y.bits")))),
                F.lit(0),
            ).cast("bigint").alias("n_both")
        )
    )
    return pop_a.crossJoin(pop_b).crossJoin(both)


def skipping_audit(
    lineitem: DataFrame,
    cols: Sequence[str] = ("l_partkey", "l_suppkey"),
    bits: int = DEFAULT_BITS,
    drop_bits: int = 10,
    box: Sequence[tuple[int, int]] = ((1, 64), (1, 4)),
) -> DataFrame:
    """Data-skipping effectiveness audit: for the SAME table laid out
    two ways — linear (range-bucketed on the first key only, the
    default "sorted by one column" layout) vs z-order (interleaved
    bits, :func:`zorder_cluster`'s curve) — how many buckets would a
    2-D box predicate have to READ, judging each bucket by its min/max
    footer stats exactly the way parquet row-group pruning does?

    This quantifies the layout decision BEFORE rewriting 100 TB: the
    linear layout prunes only on its sort column (every bucket spans
    the full domain of the second key), while the z-curve bounds BOTH
    dimensions per bucket, so the touched-bucket count drops by orders
    of magnitude for selective boxes.  All bucket ids and min/max stats
    are exact integer arithmetic (the bit-interleave is the oracle-
    shared :func:`zvalue_sql` expression); ``touch_ppm`` is the floor-
    quantized fraction of buckets read.

    Linear buckets are VALUE-range buckets (key div bucket_width over
    the observed max — deterministic, engine-exact) with the same
    target bucket count as the z-layout (2^(bits·k − drop_bits)), so
    the comparison is bucket-count-fair.

    Returns one row per layout: ``(layout, n_buckets, buckets_touched,
    touch_ppm)``.

    Reference parity: none (layout extension, SURVEY.md §2.3); the
    audit is a grouped min/max aggregate — M7 reduce at bucket grain.
    """
    (c1, c2) = cols
    (lo1, hi1), (lo2, hi2) = box
    n_buckets_target = 1 << max(1, bits * len(cols) - drop_bits)
    zexpr = zvalue_sql(cols, bits)
    maxes = lineitem.agg(
        F.max(c1).alias("m1"),
    )
    # integral div end-to-end — no float in bucket identity
    bucket_expr = (
        f"{c1} div ((m1 + {n_buckets_target}) div {n_buckets_target})"
    )
    linear = (
        lineitem.join(F.broadcast(maxes))
        .select(
            F.lit("linear").alias("layout"),
            F.expr(bucket_expr).cast("bigint").alias("bucket"),
            F.col(c1).alias("k1"),
            F.col(c2).alias("k2"),
        )
    )
    zorder = lineitem.select(
        F.lit("zorder").alias("layout"),
        F.expr(f"({zexpr}) >> {drop_bits}").alias("bucket"),
        F.col(c1).alias("k1"),
        F.col(c2).alias("k2"),
    )
    stats = (
        linear.unionByName(zorder)
        .groupBy("layout", "bucket")
        .agg(
            F.min("k1").alias("min1"),
            F.max("k1").alias("max1"),
            F.min("k2").alias("min2"),
            F.max("k2").alias("max2"),
        )
    )
    touched = (
        (F.col("min1") <= F.lit(hi1))
        & (F.col("max1") >= F.lit(lo1))
        & (F.col("min2") <= F.lit(hi2))
        & (F.col("max2") >= F.lit(lo2))
    )
    return (
        stats.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.sum(F.when(touched, 1).otherwise(0))
            .cast("bigint")
            .alias("buckets_touched"),
        )
        .select(
            "layout",
            "n_buckets",
            "buckets_touched",
            F.expr("(buckets_touched * 1000000) div n_buckets").alias(
                "touch_ppm"
            ),
        )
    )


def partition_advisor(
    df: DataFrame, candidates: Sequence[str], target_rows: int = 100_000
) -> DataFrame:
    """Partition-column advisor: for each candidate column, the layout
    stats that decide ``partitionBy`` choices BEFORE rewriting a table
    — cardinality (too many partitions = small-file storm), skew
    (max/avg ratio — one giant partition defeats pruning-parallelism),
    and the share of partitions under 1% of ``target_rows`` (the
    small-file fraction the compactor would immediately owe).

    One map-side-combined count per candidate at that column's value
    grain, then a per-candidate rollup — #candidates passes over one
    column each (column-pruned scans; Spark shares the cached scan).
    All ratios are floor-ppm exact integers except the skew ratio
    (one pinned division).

    Returns one row per candidate: ``(column, n_partitions, n_rows,
    avg_rows, max_rows, skew_ratio, tiny_ppm)``.
    """
    if not candidates:
        raise ValueError("partition_advisor needs candidate columns")
    tiny = max(1, target_rows // 100)
    reports = []
    for c in candidates:
        per = df.groupBy(F.col(c)).agg(F.count(F.lit(1)).alias("cnt"))
        reports.append(
            per.agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
                F.sum("cnt").cast("bigint").alias("n_rows"),
                F.max("cnt").cast("bigint").alias("max_rows"),
                F.sum(F.when(F.col("cnt") < tiny, 1).otherwise(0))
                .cast("bigint")
                .alias("n_tiny"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "column",
        "n_partitions",
        "n_rows",
        F.expr("n_rows div n_partitions").alias("avg_rows"),
        "max_rows",
        F.expr(
            "cast(max_rows as double)"
            " / (cast(n_rows as double) / cast(n_partitions as double))"
        ).alias("skew_ratio"),
        F.expr("(n_tiny * 1000000) div n_partitions").alias("tiny_ppm"),
    )


def hilbert_level_exprs(bits: int) -> list[dict[str, str]]:
    """Per-level SQL expression fragments of the iterative Hilbert
    ``(x, y) → d`` transform (the classical quadrant-rotation walk),
    written in PORTABLE arithmetic — only ``%``, ``*``, ``+``, ``−``
    and CASE, no engine-specific integer division or bit operators —
    so the SAME text runs as a Spark ``selectExpr`` chain and as the
    DuckDB oracle's nested SELECTs.  ``(3·rx) XOR ry`` is replaced by
    its arithmetic identity ``rx·(3−ry) + (1−rx)·ry`` (rx, ry ∈
    {0,1}); bit tests become ``x % 2s >= s``.

    Returns one dict per level with keys ``d``, ``x``, ``y`` — each an
    expression over the previous level's ``x``, ``y``, ``d`` columns.
    """
    n = 1 << bits
    out = []
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        rx = f"(CASE WHEN x % {2 * s} >= {s} THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN y % {2 * s} >= {s} THEN 1 ELSE 0 END)"
        xf = (
            f"(CASE WHEN {ry} = 0 AND {rx} = 1 THEN {n - 1} - x"
            " ELSE x END)"
        )
        yf = (
            f"(CASE WHEN {ry} = 0 AND {rx} = 1 THEN {n - 1} - y"
            " ELSE y END)"
        )
        out.append(
            {
                "d": (
                    f"d + {s * s} * ({rx} * (3 - {ry})"
                    f" + (1 - {rx}) * {ry})"
                ),
                "x": f"CASE WHEN {ry} = 0 THEN {yf} ELSE {xf} END",
                "y": f"CASE WHEN {ry} = 0 THEN {xf} ELSE {yf} END",
            }
        )
    return out


def with_hilbert(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    out_col: str = "hval",
) -> DataFrame:
    """``df`` plus the Hilbert index of ``(cols[0] % 2^bits,
    cols[1] % 2^bits)`` — a chain of ``bits`` narrow projections (the
    CASE state columns are referenced more than once per level, so
    Catalyst keeps the layers instead of inlining an exponential
    tree); everything stays in whole-stage codegen, no UDF."""
    assert len(cols) == 2, "the 2-D curve"
    n = 1 << bits
    cur = df.selectExpr(
        "*",
        f"CAST({cols[0]} % {n} AS BIGINT) AS x",
        f"CAST({cols[1]} % {n} AS BIGINT) AS y",
        "CAST(0 AS BIGINT) AS d",
    )
    for lvl in hilbert_level_exprs(bits):
        keep = [c for c in cur.columns if c not in ("x", "y", "d")]
        cur = cur.selectExpr(
            *keep,
            f"{lvl['x']} AS x",
            f"{lvl['y']} AS y",
            f"CAST({lvl['d']} AS BIGINT) AS d",
        )
    keep = [c for c in cur.columns if c not in ("x", "y", "d")]
    return cur.selectExpr(*keep, f"d AS {out_col}")


def hilbert_cluster(
    lineitem: DataFrame,
    cols: Sequence[str] = ("l_partkey", "l_suppkey"),
    bits: int = 8,
    drop_bits: int = 8,
) -> DataFrame:
    """Per-Hilbert-bucket locality profile — :func:`zorder_cluster`'s
    audit run on the OTHER space-filling curve production table
    formats offer (Delta/Iceberg ``OPTIMIZE ... ZORDER/HILBERT``):
    bucket = hval with the low ``drop_bits`` bits dropped, and per
    bucket the row count plus min/max of every masked coordinate.

    Hilbert shares Z's quadrant property — dropping ``2k`` bits
    confines a bucket to one aligned ``2^k × 2^k`` square (so
    ``max−min ≤ 2^k − 1`` per dimension, the parquet-footer tightness
    contract) — and improves on it: consecutive buckets are spatially
    ADJACENT (no Z-curve "jumps"), so a range predicate touching
    several buckets reads files that are neighbors in key space.
    Both properties are pinned in tests/test_round9_ops.py (full-grid
    curve validity: each step moves exactly one cell).

    One narrow aggregate over the chained-projection curve fold;
    output is O(#buckets) rows.
    """
    n = 1 << bits
    masked = [f"m_{c}" for c in cols]
    base = lineitem.selectExpr(
        *[f"CAST({c} % {n} AS BIGINT) AS m_{c}" for c in cols]
    )
    hb = with_hilbert(
        base.selectExpr(
            *masked,
            f"m_{cols[0]} AS k0",
            f"m_{cols[1]} AS k1",
        ),
        ("k0", "k1"),
        bits,
    )
    aggs = [F.count(F.lit(1)).alias("n_lines")]
    for c in cols:
        aggs.append(F.min(f"m_{c}").alias(f"min_{c}"))
        aggs.append(F.max(f"m_{c}").alias(f"max_{c}"))
    return (
        hb.select(*masked, F.shiftright(F.col("hval"), drop_bits).alias("bucket"))
        .groupBy("bucket")
        .agg(*aggs)
    )
