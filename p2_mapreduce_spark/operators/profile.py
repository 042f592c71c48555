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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from p2_mapreduce_spark.session import spread


def profile_table(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column profile: row count, null count, distinct count (exact),
    and min/max rendered as strings.

    Returns ``(column, n_rows, n_null, n_distinct, min_s, max_s)`` — one
    row per profiled column.

    Two passes, on purpose: count/null/min/max fuse into ONE expand-free
    aggregate, and the exact distinct counts run over a melted
    ``(column, value)`` projection as a single-distinct aggregate.
    Planning all N count-distincts into the min/max agg instead makes
    Catalyst Expand every row ×(N+1) with the full agg state dragged
    along (6.9 s vs 2.1 s on 9-column orders at sf0.1); the second
    columnar scan is the cheaper price at any scale — the melt's
    map-side partial dedup shrinks it to the distinct (column, value)
    pairs before the only shuffle.

    Distinct counts are over each value's STRING rendering — injective
    for every atomic type (numerics round-trip shortest-form, timestamps
    render fully), so the counts are exact; don't point it at raw binary
    columns (non-UTF8 bytes can collide under the cast — media profiling
    goes through ``binary_meta``'s typed metadata instead).
    """
    names = list(cols) if cols is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in names:
        aggs.extend(
            [
                F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__null"),
                F.min(F.col(c)).cast("string").alias(f"{c}__min"),
                F.max(F.col(c)).cast("string").alias(f"{c}__max"),
            ]
        )
    wide = df.agg(*aggs)
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in names
                ]
            )
        ).alias("m")
    ).select("m.*")
    dist = melted.groupBy("column").agg(
        F.countDistinct("v").alias("n_distinct")
    )
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__rows").alias("n_rows"),
            F.col(f"{c}__null").alias("n_null"),
            F.col(f"{c}__min").alias("min_s"),
            F.col(f"{c}__max").alias("max_s"),
        )
        for c in names
    ]
    base = wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")
    return base.join(dist, "column").select(
        "column", "n_rows", "n_null", "n_distinct", "min_s", "max_s"
    )


def hist_state(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    lo_c: int,
    hi_c: int,
    n_buckets: int,
) -> DataFrame:
    """Mergeable fixed-histogram quantile-sketch STATE: per-group bucket
    counts over ``[lo_c, hi_c)`` cents (integer hundredths of the value).

    The quantile companion to :func:`hll_distinct_rollup` — a 100 TB
    pipeline stores one ``(group, bucket, cnt)`` table per partition/day
    (≤ ``n_buckets`` rows per group, regardless of data volume) and
    answers percentile queries at any grain by merging states
    (:func:`merge_hist_states`) instead of rescanning facts.  Buckets are
    equi-width, so the state is a *sketch*: quantile estimates carry
    ± one bucket width of error, surfaced honestly by returning the
    bucket's upper boundary (KLL/t-digest trade tighter error for
    float-ordering internals that are not oracle-checkable; this one is
    bit-exact cross-engine).

    Every step is integer arithmetic on exact values:

    - ``cents = floor(v·100)`` — the IEEE product and floor are identical
      in any engine, and the cast of an integral double to BIGINT is
      exact;
    - ``bucket = least(n-1, greatest(0, (cents - lo_c)·n div (hi_c -
      lo_c)))`` — pure BIGINT ops, both tails clamped into the edge
      buckets.

    ``(hi_c - lo_c)`` must be divisible by ``n_buckets`` so bucket
    boundaries are whole cents (asserted); counts merge by SUM
    (associative ⇒ state(a ∪ b) == state(a) ⊕ state(b), pinned in
    pytest)."""
    if (hi_c - lo_c) % n_buckets:
        raise ValueError("(hi_c - lo_c) must be divisible by n_buckets")
    # div (integer), not /: Spark's / on bigints is a double divide
    bucket = F.least(
        F.lit(int(n_buckets - 1)).cast("bigint"),
        F.greatest(
            F.lit(0).cast("bigint"),
            F.expr(
                f"(cast(floor({value_col} * 100) as bigint) - {lo_c}) "
                f"* {n_buckets} div {hi_c - lo_c}"
            ),
        ),
    )
    return (
        df.groupBy(*group_cols, bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_hist_states(*states: DataFrame) -> DataFrame:
    """Fold any number of histogram states into one: union + re-sum.
    Exact by BIGINT associativity — merging daily states equals building
    the state over the concatenated data (pytest-pinned)."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    group_cols = [c for c in out.columns if c not in ("cnt",)]
    return out.groupBy(*group_cols).agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    state: DataFrame,
    group_cols: Sequence[str],
    lo_c: int,
    hi_c: int,
    n_buckets: int,
    qs_ppm: Sequence[int] = (500_000, 900_000, 990_000),
) -> DataFrame:
    """Quantile estimates from a histogram state: for each q (in parts
    per million), the upper boundary of the first bucket whose cumulative
    count reaches ``q·total`` — the classic histogram-CDF inversion,
    conservative by ≤ one bucket width.

    The threshold test is ``cum·1e6 ≥ q_ppm·total`` in BIGINT (no
    ratio, no float compare), and boundaries are whole cents divided by
    100.0 once at the surface — one IEEE division per output value, so
    the doubles are bit-identical cross-engine.  All window work runs at
    state grain (≤ groups × n_buckets rows), never data grain."""
    from pyspark.sql import Window

    width_c = (hi_c - lo_c) // n_buckets
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(*group_cols)
    cum = state.select(
        *group_cols,
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wt).alias("total"),
    )
    aggs = [
        (
            F.min(
                F.when(
                    F.col("cum") * 1_000_000 >= F.lit(q) * F.col("total"),
                    (F.col("bucket") + 1) * width_c + lo_c,
                )
            )
            / 100.0
        ).alias(f"p{q // 10_000}")
        for q in qs_ppm
    ]
    return cum.groupBy(*group_cols).agg(F.max("total").alias("n_rows"), *aggs)


def key_skew_profile(df: DataFrame, key_col: str, top_n: int = 20) -> DataFrame:
    """Join/agg-key skew diagnosis: the ``top_n`` heaviest keys with
    exact counts and parts-per-million share of the table — the number
    you read before deciding whether a 100 TB shuffle needs salting
    (operators/skew.py) or an AQE skew-join will do.

    One partial→final count aggregate at key grain; the total rides in
    via a broadcast one-row cross join (never a second scan); the top-N
    cut is ``TakeOrderedAndProject`` (per-partition heaps, no global
    sort).  ``share_ppm`` is exact BIGINT arithmetic — no ratio column
    to drift cross-engine.  Ties broken by key ascending so the cut is
    deterministic."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = df.agg(F.count(F.lit(1)).alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key",
            "cnt",
            F.expr("cnt * 1000000 div total").alias("share_ppm"),
            "total",
        )
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(top_n)
    )


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


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    lo_c: int,
    hi_c: int,
    n_buckets: int,
    q_lo_ppm: int = 10_000,
    q_hi_ppm: int = 990_000,
) -> DataFrame:
    """Per-group outlier clipping at sketched percentiles: clamp
    ``value_col`` into [p_lo, p_hi] computed from the histogram sketch —
    the standard robustification pass before feeding a metric to
    training or aggregation, composed entirely from
    :func:`hist_state` → :func:`hist_quantiles`.

    Two scans of the facts (one to sketch, one to clip), both
    zero-shuffle on the fact side: the sketch aggregate map-side-
    combines to state grain, and the boundaries come back as a BROADCAST
    join (#groups rows).  Clipping is ``least(greatest(v, lo), hi)`` on
    doubles — the boundaries are whole cents / 100.0, so the clamp is
    deterministic cross-engine.  Like any equi-width-sketch percentile,
    boundaries are conservative by ≤ one bucket width."""
    state = hist_state(df, value_col, group_cols, lo_c, hi_c, n_buckets)
    qs = hist_quantiles(
        state, group_cols, lo_c, hi_c, n_buckets, qs_ppm=(q_lo_ppm, q_hi_ppm)
    )
    lo_name = f"p{q_lo_ppm // 10_000}"
    hi_name = f"p{q_hi_ppm // 10_000}"
    # hist_quantiles returns bucket UPPER boundaries; the low clip uses
    # the selected bucket's LOWER boundary instead, so both bounds are
    # conservative OUTWARD and no value inside the central mass's own
    # buckets is ever modified
    width_units = ((hi_c - lo_c) // n_buckets) / 100.0
    bounds = qs.select(
        *group_cols,
        (F.col(lo_name) - width_units).alias("clip_lo"),
        F.col(hi_name).alias("clip_hi"),
    )
    clipped = F.least(
        F.greatest(F.col(value_col), F.col("clip_lo")), F.col("clip_hi")
    )
    return df.join(F.broadcast(bounds), list(group_cols)).select(
        *df.columns, "clip_lo", "clip_hi", clipped.alias("clipped")
    )


def feature_bin(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    lo_c: int,
    hi_c: int,
    n_buckets: int,
    qs_ppm: Sequence[int] = (250_000, 500_000, 750_000),
) -> DataFrame:
    """Quantile discretization (the ML feature-binning step): assign
    each row the index of its per-group quantile interval — ``df +
    (bin)`` with bin ∈ [0, len(qs_ppm)] — using boundaries from the
    mergeable histogram sketch, not an exact sort.

    Composes :func:`hist_state` → :func:`hist_quantiles` (boundaries at
    group grain, ≤ groups × n_buckets state rows) and returns the
    boundaries as a BROADCAST join back onto the rows; the assignment
    is a chain of integer-cent comparisons — the fact table never
    shuffles, and the whole operator costs one scan for the sketch plus
    one scan for the assignment.  Same-boundary ties bin LEFT (value ≤
    boundary), matching hist_quantiles' conservative upper-boundary
    convention, so bins are bit-deterministic cross-engine.

    Reference seed: none (extension; the row-level face of
    `equidepth_histogram`'s boundary computation).
    """
    state = hist_state(df, value_col, group_cols, lo_c, hi_c, n_buckets)
    qcols = [f"p{q // 10_000}" for q in qs_ppm]
    bounds = hist_quantiles(
        state, group_cols, lo_c, hi_c, n_buckets, qs_ppm
    ).select(*group_cols, *qcols)
    out = df.join(F.broadcast(bounds), list(group_cols))
    binned = F.lit(0)
    for qc in qcols:
        binned = binned + F.when(
            F.col(value_col) > F.col(qc), 1
        ).otherwise(0)
    return out.select(
        *df.columns, binned.cast("bigint").alias("bin")
    )


def hll_overlap(
    docs: DataFrame,
    m: int = 64,
    rmax: int = 40,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise vocabulary overlap between sources by HLL sketch ALGEBRA:
    for every source pair, distinct-token estimates for each side, their
    union (element-wise register MAX — the merge HLL is closed under),
    and the inclusion-exclusion overlap ``|A|+|B|−|A∪B|`` — ``(source_a,
    source_b, est_a, est_b, est_union, est_overlap, exact_overlap)``.

    This is the sketch pattern a 100 TB pipeline uses to answer "how
    much does corpus A overlap corpus B" WITHOUT the (token → sources)
    distinct self-join: per-source register tables are ``m`` rows each,
    pair merges are register-table joins bounded by #sources² × m
    (config, not data), and the only corpus-wide work is one register
    aggregate.  Same md5-60 / clamped-rank construction as
    :func:`hll_distinct_rollup`, so every estimate is a pinned IEEE tree
    and the whole result — estimates included — is value-hash
    oracle-checkable.  The exact overlap rides along from a distinct
    (source, token) self-join as the honesty column (feasible at
    fixture scale; at 100 TB you'd drop it — that join is what the
    sketch replaces).
    """
    from pyspark.sql import functions as F

    from p2_mapreduce_spark.functions.text import tokens_array
    from p2_mapreduce_spark.session import spread

    alphas = {16: 0.673, 32: 0.697, 64: 0.709}
    alpha_v = alphas.get(m, 0.7213 / (1.0 + 1.079 / m))
    wbits = 60 - m.bit_length() + 1
    st = (
        spread(docs)
        .select(
            F.col(source_col).alias("src"),
            F.explode(tokens_array(F.col(text_col))).alias("tok"),
        )
        .distinct()
        .persist()
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 18, 15), 16, 10).cast("long")
    jr = st.select(
        "src",
        (h % m).alias("j"),
        F.expr(
            f"least({rmax}, CASE WHEN "
            f"conv(substring(md5(tok), 18, 15), 16, 10) div {m} = 0 "
            f"THEN {wbits + 1} ELSE {wbits} - length(bin("
            f"conv(substring(md5(tok), 18, 15), 16, 10) div {m})) + 1 END)"
        ).alias("r"),
    )
    regs = jr.groupBy("src", "j").agg(F.max("r").alias("r")).persist()
    est = lambda nz, snz: (F.lit(alpha_v) * F.lit(float(m * m))) / (  # noqa: E731
        snz + (F.lit(float(m)) - nz)
    )
    per_src = regs.groupBy("src").agg(
        F.count(F.lit(1)).alias("nz"),
        F.sum(F.expr("1.0 / shiftleft(cast(1 as bigint), r)")).alias("snz"),
    )
    srcs = regs.select("src").distinct()
    spairs = (
        srcs.select(F.col("src").alias("source_a"))
        .crossJoin(srcs.select(F.col("src").alias("source_b")))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    # union registers: MAX over the pair's two register tables — the
    # theta join is (#pairs × m) rows, config-bounded
    pair_regs = (
        spairs.join(
            regs,
            (F.col("src") == F.col("source_a"))
            | (F.col("src") == F.col("source_b")),
        )
        .groupBy("source_a", "source_b", "j")
        .agg(F.max("r").alias("r"))
    )
    union_stats = pair_regs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("u_nz"),
        F.sum(F.expr("1.0 / shiftleft(cast(1 as bigint), r)")).alias("u_snz"),
    )
    exact = (
        st.alias("a")
        .join(
            st.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.src") < F.col("b.src")),
        )
        .groupBy(
            F.col("a.src").alias("source_a"), F.col("b.src").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    ea = per_src.select(
        F.col("src").alias("source_a"),
        est(F.col("nz"), F.col("snz")).alias("est_a"),
    )
    eb = per_src.select(
        F.col("src").alias("source_b"),
        est(F.col("nz"), F.col("snz")).alias("est_b"),
    )
    return (
        union_stats.join(ea, "source_a")
        .join(eb, "source_b")
        .join(exact, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "est_a",
            "est_b",
            est(F.col("u_nz"), F.col("u_snz")).alias("est_union"),
            (
                F.col("est_a")
                + F.col("est_b")
                - est(F.col("u_nz"), F.col("u_snz"))
            ).alias("est_overlap"),
            F.coalesce(F.col("exact_overlap"), F.lit(0))
            .cast("bigint")
            .alias("exact_overlap"),
        )
    )


def dq_check(
    df: DataFrame,
    rules: Sequence[dict],
    fk_dims: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Declarative data-quality rule engine: evaluate a rule list in as
    few passes as the rule kinds allow and emit one row per rule —
    ``(rule, n_violations, passed)`` — the contract-testing stage of a
    pipeline (dbt tests / Deequ, reduced to its plan shape).

    Rule kinds and their cost model:

    - ``not_null`` / ``range`` / ``in_set`` / ``regex``: conditional
      counts — ALL of them fold into ONE shared aggregate scan, zero
      shuffles beyond the single global agg;
    - ``unique``: ``count − countDistinct`` over the key, same shared
      pass (Spark plans the distinct as an expand, still one scan);
    - ``fk``: orphan count via LEFT ANTI join against the dim's key
      column (broadcast when small) — one extra plan per FK rule.

    The result is a config-bounded table (one row per rule), so a 100 TB
    audit costs one fact scan plus one anti join per foreign key.

    Rule schema: ``{"name", "kind", "col", ...}`` with ``lo``/``hi`` for
    range, ``values`` for in_set, ``pattern`` for regex, ``dim`` (a key
    into ``fk_dims``) + ``dim_col`` for fk.

    Reference seed: the reference validates only text-ness at ingest
    (manager.go:748-752); rule evaluation is extension surface.
    """
    agg_exprs = []
    fk_rules = []
    names = []
    for r in rules:
        kind, col = r["kind"], r.get("col")
        name = r["name"]
        if kind == "not_null":
            e = F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
        elif kind == "range":
            e = F.sum(
                F.when(
                    F.col(col).isNull()
                    | (F.col(col) < r["lo"])
                    | (F.col(col) > r["hi"]),
                    1,
                ).otherwise(0)
            )
        elif kind == "in_set":
            e = F.sum(
                F.when(~F.col(col).isin(list(r["values"])), 1).otherwise(0)
            )
        elif kind == "regex":
            e = F.sum(
                F.when(~F.col(col).rlike(r["pattern"]), 1).otherwise(0)
            )
        elif kind == "unique":
            e = F.count(F.col(col)) - F.countDistinct(F.col(col))
        elif kind == "fk":
            fk_rules.append(r)
            continue
        else:
            raise ValueError(f"unknown rule kind {kind!r}")
        agg_exprs.append(e.cast("bigint").alias(name))
        names.append(name)
    spark = df.sparkSession
    parts = []
    if agg_exprs:
        wide = df.agg(*agg_exprs)
        # unpivot the single wide row to (rule, n_violations) — the
        # stack is over #rules columns, config-bounded
        stack = ", ".join(f"'{n}', {n}" for n in names)
        parts.append(
            wide.selectExpr(
                f"stack({len(names)}, {stack}) as (rule, n_violations)"
            )
        )
    for r in fk_rules:
        dim = (fk_dims or {})[r["dim"]]
        orphans = (
            df.select(F.col(r["col"]))
            .filter(F.col(r["col"]).isNotNull())
            .join(
                F.broadcast(dim.select(F.col(r["dim_col"]).alias(r["col"]))),
                r["col"],
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
            .select(F.lit(r["name"]).alias("rule"), "n_violations")
        )
        parts.append(orphans)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule", "n_violations", (F.col("n_violations") == 0).alias("passed")
    )


def wau_hll(
    events: DataFrame, days: int = 7, m: int = 64, rmax: int = 40
) -> DataFrame:
    """Trailing-``days`` distinct-user ESTIMATE per calendar day from
    mergeable daily HLL states — ``(d, est_users, exact_users)``.

    The sketch answer to timeseries.rolling_active_users: the exact
    construction range-joins the (user, day) activity grid into every
    window it touches (|grid|×N work); the sketch version stores ONE
    m-register state per day and merges ≤N states per output day —
    window work collapses to (#days × N × m) register rows, INDEPENDENT
    of user count.  This is why a 100 TB metrics pipeline keeps daily
    HLL states: any trailing window, cohort union, or backfill is a
    register MAX over config-sized tables.  Same md5-60 register
    family as hll_distinct_rollup ⇒ the estimate itself is
    value-hash oracle-checkable; the exact count rides along at fixture
    scale as the honesty column.
    """
    wbits = 60 - m.bit_length() + 1
    alphas = {16: 0.673, 32: 0.697, 64: 0.709}
    alpha_v = alphas.get(m, 0.7213 / (1.0 + 1.079 / m))
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 18, 15), 16, 10
    ).cast("long")
    daily = (
        events.select(F.to_date("ts").alias("ad"), h.alias("h"))
        .select(
            "ad",
            (F.col("h") % m).alias("j"),
            F.expr(
                f"least({rmax}, CASE WHEN h div {m} = 0 THEN {wbits + 1} "
                f"ELSE {wbits} - length(bin(h div {m})) + 1 END)"
            ).alias("r"),
        )
        .groupBy("ad", "j")
        .agg(F.max("r").alias("r"))
    )
    cal = (
        events.agg(
            F.min(F.to_date("ts")).alias("lo"),
            F.max(F.to_date("ts")).alias("hi"),
        )
        .select(
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias(
                "d"
            )
        )
    )
    win = daily.join(
        F.broadcast(cal),
        (F.col("ad") <= F.col("d"))
        & (F.col("ad") > F.date_sub(F.col("d"), days)),
    )
    merged = win.groupBy("d", "j").agg(F.max("r").alias("r"))
    sums = merged.groupBy("d").agg(
        F.count(F.lit(1)).alias("nz"),
        F.sum(F.expr("1.0 / shiftleft(cast(1 as bigint), r)")).alias("snz"),
    )
    est = (F.lit(alpha_v) * F.lit(float(m * m))) / (
        F.col("snz") + (F.lit(float(m)) - F.col("nz"))
    )
    grid = events.select("user_id", F.to_date("ts").alias("ad")).distinct()
    exact = (
        grid.join(
            F.broadcast(cal),
            (F.col("ad") <= F.col("d"))
            & (F.col("ad") > F.date_sub(F.col("d"), days)),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    return (
        sums.join(exact, "d")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            est.alias("est_users"),
            F.col("exact_users").cast("bigint").alias("exact_users"),
        )
    )


def table_digest(
    df: DataFrame, key_cols: Sequence[str], n_buckets: int = 64
) -> DataFrame:
    """Anti-entropy bucket digests (the Merkle-tree leaf level of
    replica reconciliation): hash every row's full content, fold the
    hashes per key-bucket with an ORDER-INDEPENDENT sum, and emit
    ``(bucket, n_rows, digest)`` — two replicas compare ``n_buckets``
    rows instead of the whole table, then sync only mismatched buckets.

    Row hash = md5-60 of the concatenated row (engine-neutral); fold =
    SUM of the 60-bit values into DECIMAL(38,0) — exact and associative,
    so the digest is identical under ANY partitioning, insertion order,
    or merge plan (a XOR fold would also work but loses multiplicity:
    duplicate-row pairs cancel).  Bucket = md5-60 of the KEY mod
    ``n_buckets``, so a row's bucket depends only on its key and the
    same row always lands in the same bucket on both replicas.  One
    map-side-combined aggregate; output is config-bounded.

    Reference seed: per-chunk MD5 verification + scrubbing
    (storage-node/main.go:161-209, 502-509) — the same integrity idea,
    lifted from chunks to relational buckets.
    """
    key_str = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    row_str = F.concat_ws("|", *[F.col(c).cast("string") for c in df.columns])
    kh = F.conv(F.substring(F.md5(key_str), 18, 15), 16, 10).cast("long")
    rh = F.conv(F.substring(F.md5(row_str), 18, 15), 16, 10).cast("long")
    return (
        df.select((kh % n_buckets).alias("bucket"), rh.alias("rh"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("rh").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("digest"),
        )
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: tuple[str, ...] = ("c_nationkey", "c_mktsegment"),
    k: int = 8,
) -> DataFrame:
    """K-anonymity audit over a quasi-identifier combination — the
    governance gate before a table is released: every equivalence class
    (distinct quasi-identifier tuple) with fewer than ``k`` members is a
    re-identification risk.  One hash aggregate on the quasi columns;
    output is one row per class with its size and a pass flag, so the
    release decision (suppress / generalize / pass) is a filter on this
    result.  O(#classes) output, single shuffle, all-integer."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).cast("bigint").alias("class_size"))
        .withColumn("k_anonymous", F.col("class_size") >= k)
    )


def join_fanout(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Exact join-cardinality and skew audit WITHOUT executing the join —
    the statistic a planner (or an engineer sizing a 100 TB job) needs
    before committing to a shuffle: |A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k),
    its worst single-key term (the skew hazard AQE's skew-join split
    exists for), and the unmatched row mass on each side.

    Cost: one aggregate per side (each output ≤ #distinct keys — the
    corpus contracts BEFORE any join), one narrow key-to-key join, one
    global fold to a single row.  The quadratic join itself never runs;
    this is exactly how you decide whether it may.

    Output (one row): n_matching_keys, join_rows, max_key_fanout,
    left_unmatched_rows, right_unmatched_rows.
    """
    la = left.groupBy(F.col(left_key).alias("key")).agg(
        F.count(F.lit(1)).alias("n_l")
    )
    rb = right.groupBy(F.col(right_key).alias("key")).agg(
        F.count(F.lit(1)).alias("n_r")
    )
    matched = la.join(rb, "key")
    summary = matched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matching_keys"),
        F.sum(F.col("n_l") * F.col("n_r")).cast("bigint").alias("join_rows"),
        F.max(F.col("n_l") * F.col("n_r")).cast("bigint").alias("max_key_fanout"),
    )
    l_only = la.join(rb, "key", "left_anti").agg(
        F.coalesce(F.sum("n_l"), F.lit(0)).cast("bigint").alias("left_unmatched_rows")
    )
    r_only = rb.join(la, "key", "left_anti").agg(
        F.coalesce(F.sum("n_r"), F.lit(0)).cast("bigint").alias("right_unmatched_rows")
    )
    return summary.crossJoin(l_only).crossJoin(r_only)


def ks_drift(
    docs: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov drift statistic per group —
    "has this source's length distribution drifted from the rest of the
    corpus?", the standard data-drift gate before a retrain.

    The KS statistic is max |F_a(x) − F_b(x)| over observed values.
    Distributed-exact construction: counts at (group, value) grain (one
    map-side-combined aggregate), per-group running CDF numerators via a
    value-ordered window INSIDE each group pair, and — the determinism
    trick — the max is taken over the INTEGER cross-product
    ``|cum_a·n_b − cum_b·n_a|`` (argmax of the rational difference
    without ever forming a float), converted to a double by ONE final
    division.  No sorting of raw data; work is O(distinct values) after
    the first aggregate.

    Output: (group, n_group, n_rest, ks_stat) — ks_stat ∈ [0, 1].
    """
    vals = docs.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
    per = vals.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))
    groups = per.select("g").distinct()
    # for each group: its own (v, c) series and the rest-of-corpus series
    totals = per.groupBy("g").agg(F.sum("c").alias("n_g"))
    grand = per.agg(F.sum("c").alias("n_all"))
    # value-grain counts for the whole corpus
    allv = per.groupBy("v").agg(F.sum("c").alias("c_all"))
    own = per.select("g", "v", F.col("c").alias("c_g"))
    # rest = all - own at each value the corpus has
    joined = (
        # broadcast the group-dictionary side explicitly: when the input
        # frame is itself a join output (e.g. classifier_auc feeding this
        # machinery), size stats are unknown and Spark falls back to
        # CartesianProduct for the group-by-value grid — the hint pins
        # BroadcastNestedLoopJoin (groups is dictionary grain)
        allv.crossJoin(F.broadcast(groups))
        .join(own, ["g", "v"], "left")
        .select(
            "g",
            "v",
            F.coalesce("c_g", F.lit(0)).alias("c_g"),
            (F.col("c_all") - F.coalesce("c_g", F.lit(0))).alias("c_r"),
        )
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = joined.select(
        "g",
        F.sum("c_g").over(w).alias("cum_g"),
        F.sum("c_r").over(w).alias("cum_r"),
    )
    stats = (
        cum.join(totals, "g")
        .crossJoin(F.broadcast(grand))
        .withColumn("n_r", F.col("n_all") - F.col("n_g"))
        .withColumn(
            "diff_num",
            # cum·n products are n²-scale: BIGINT wraps silently past
            # ~3e9 rows in non-ANSI mode, so the cross products run in
            # DECIMAL(38,0) (the emd_drift device; DuckDB's SUM already
            # yields HUGEINT, so the oracle is exact without help)
            F.abs(
                F.col("cum_g").cast("decimal(38,0)") * F.col("n_r")
                - F.col("cum_r").cast("decimal(38,0)") * F.col("n_g")
            ),
        )
        .groupBy("g", "n_g", "n_r")
        .agg(F.max("diff_num").alias("max_num"))
        .select(
            F.col("g").alias(group_col),
            F.col("n_g").cast("bigint").alias("n_group"),
            F.col("n_r").cast("bigint").alias("n_rest"),
            (
                F.col("max_num").cast("double")
                / (F.col("n_g").cast("double") * F.col("n_r"))
            ).alias("ks_stat"),
        )
    )
    return stats


def mwu_drift(
    docs: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
) -> DataFrame:
    """EXACT Mann-Whitney U drift per group vs rest-of-corpus — the
    rank-based companion to :func:`ks_drift` (KS reacts to any shape
    difference; U specifically measures stochastic dominance, "does
    this source run longer/shorter than the rest?").

    All-integer construction at (group, value) grain: for each of the
    group's values, U accumulates ``c_g(v) · (#rest strictly below v)``
    plus half the ties — so the surfaced statistic is ``u2 = 2·U``
    (doubling clears the half-tie fraction; an exact BIGINT).  The
    rest-below counts come from ONE value-ordered cumsum per group —
    same shuffle budget as ks_drift.  ``auc = U / (n_g · n_r)`` (the
    common-language effect size, one final division) rides along;
    auc ≈ 0.5 means no drift.
    """
    vals = docs.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
    per = vals.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))
    groups = per.select("g").distinct()
    totals = per.groupBy("g").agg(F.sum("c").alias("n_g"))
    grand = per.agg(F.sum("c").alias("n_all"))
    allv = per.groupBy("v").agg(F.sum("c").alias("c_all"))
    own = per.select("g", "v", F.col("c").alias("c_g"))
    joined = (
        # broadcast the group-dictionary side explicitly: when the input
        # frame is itself a join output (e.g. classifier_auc feeding this
        # machinery), size stats are unknown and Spark falls back to
        # CartesianProduct for the group-by-value grid — the hint pins
        # BroadcastNestedLoopJoin (groups is dictionary grain)
        allv.crossJoin(F.broadcast(groups))
        .join(own, ["g", "v"], "left")
        .select(
            "g",
            "v",
            F.coalesce("c_g", F.lit(0)).alias("c_g"),
            (F.col("c_all") - F.coalesce("c_g", F.lit(0))).alias("c_r"),
        )
    )
    w_below = (
        Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    u2_terms = joined.select(
        "g",
        # the c_g·(2·cum_below + c_r) product is n²-scale: run it (and
        # its sum) in DECIMAL(38,0) so BIGINT can't wrap silently past
        # ~3e9 rows (non-ANSI mode); DuckDB's SUM is HUGEINT already.
        # The inner 2·cum+c term is ≤ 2n and stays BIGINT-safe.
        (
            F.col("c_g").cast("decimal(38,0)")
            * (
                F.lit(2) * F.coalesce(F.sum("c_r").over(w_below), F.lit(0))
                + F.col("c_r")
            )
        ).alias("t"),
    )
    return (
        u2_terms.groupBy("g")
        .agg(F.sum("t").alias("u2d"))
        .join(totals, "g")
        .crossJoin(F.broadcast(grand))
        .select(
            F.col("g").alias(group_col),
            F.col("n_g").cast("bigint").alias("n_group"),
            (F.col("n_all") - F.col("n_g")).cast("bigint").alias("n_rest"),
            # surfaced u2 stays BIGINT per the output contract; past the
            # BIGINT range the cast yields NULL — a visible failure, not
            # a silent wraparound (the decimal-grade auc stays correct)
            F.col("u2d").cast("bigint").alias("u2"),
            (
                F.col("u2d").cast("double")
                / (F.lit(2.0) * F.col("n_g") * (F.col("n_all") - F.col("n_g")))
            ).alias("auc"),
        )
    )


def fold_ci(
    orders: DataFrame,
    n_folds: int = 16,
    value_col: str = "o_totalprice",
    id_col: str = "o_orderkey",
) -> DataFrame:
    """Uncertainty for a distributed mean WITHOUT resampling passes: the
    batch-means / hash-fold estimator.  Rows split into ``n_folds``
    deterministic md5 folds (a pure function of the key — reproducible
    anywhere); each fold's mean is an independent estimate, and the
    spread of fold means prices the sampling error of the global mean —
    one aggregate pass where a bootstrap would run B passes.

    Exactness protocol: per-fold sums in DECIMAL cents (order-
    independent), fold means as single divisions; the variance OF THE
    FOLD MEANS runs over n_folds values — computed from exact decimal
    cent sums with one pinned IEEE tree (same device as value_outliers).
    Output (one row): global_mean, fold_std, se_mean, ci_lo, ci_hi
    (95%, normal approx — the fold count is a config choice, so the
    z-value is part of the operator's contract, not a runtime input).
    """
    cents = F.floor(F.col(value_col) * 100).cast("decimal(38,0)")
    fold = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("fold"), F.col(id_col).cast("string"))),
                18,
                15,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(n_folds),
    )
    per_fold = (
        orders.select(fold.alias("f"), cents.alias("c"))
        .groupBy("f")
        .agg(F.sum("c").alias("s"), F.count(F.lit(1)).alias("n"))
        # fold mean quantized to exact integer micro-units: the variance
        # below then runs on EXACT sums (an unordered double sum over
        # fold means would drift by ulps across engines/partitionings)
        .withColumn(
            "m_micro",
            F.floor(
                F.col("s").cast("double") / 100.0 / F.col("n") * 1_000_000.0
            ).cast("long"),
        )
    )
    k = F.count(F.lit(1)).cast("double")
    dec = F.col("m_micro").cast("decimal(38,0)")
    agg = per_fold.agg(
        (F.sum(F.col("s")).cast("double") / 100.0 / F.sum("n")).alias(
            "global_mean"
        ),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_folds"),
        F.sum("m_micro").cast("decimal(38,0)").alias("sum_m"),
        F.sum(dec * dec).alias("sum_m2"),
    )
    kd = F.col("n_folds").cast("double")
    var_micro2 = (
        kd * F.col("sum_m2").cast("double")
        - F.col("sum_m").cast("double") * F.col("sum_m").cast("double")
    ) / (kd * (kd - 1.0))
    fold_std = F.sqrt(var_micro2) / 1_000_000.0
    se = fold_std / F.sqrt(kd)
    return agg.select(
        "global_mean",
        "n_rows",
        fold_std.alias("fold_std"),
        se.alias("se_mean"),
        (F.col("global_mean") - F.lit(1.96) * se).alias("ci_lo"),
        (F.col("global_mean") + F.lit(1.96) * se).alias("ci_hi"),
    )


def chi2_drift(
    docs: DataFrame,
    group_col: str = "source",
    cat_col: str = "lang",
) -> DataFrame:
    """Categorical drift per group vs rest-of-corpus: Pearson χ² over the
    (category) contingency cells — completing the drift suite (ks_drift:
    numeric shape, mwu_drift: ordinal dominance, χ²: categorical mix).

    Cells are exact BIGINTs from one (group, category) aggregate; the χ²
    fold per group runs over #categories values with every expected
    count a single rational ``n_g·c_all/n_all`` — each term one pinned
    IEEE tree, summed at category grain per group via an EXACT
    quantization (micro-units floor, BIGINT sum) so the statistic is
    aggregation-order-independent.  Degrees of freedom ride along; the
    p-value CDF is deliberately out of scope (no cross-engine-pinned
    incomplete gamma) — thresholds on χ²/df are the production practice
    anyway.

    Output: (group, n_group, n_rest, n_categories, chi2_micro, chi2).
    """
    cells = docs.groupBy(
        F.col(group_col).alias("g"), F.col(cat_col).alias("cat")
    ).agg(F.count(F.lit(1)).alias("o_g"))
    groups = cells.select("g").distinct()
    cat_tot = cells.groupBy("cat").agg(F.sum("o_g").alias("c_all"))
    g_tot = cells.groupBy("g").agg(F.sum("o_g").alias("n_g"))
    grand = cells.agg(F.sum("o_g").alias("n_all"))
    full = (
        groups.crossJoin(cat_tot)
        .join(cells, ["g", "cat"], "left")
        .select(
            "g", "cat", "c_all", F.coalesce("o_g", F.lit(0)).alias("o_g")
        )
        .join(g_tot, "g")
        .crossJoin(F.broadcast(grand))
        .withColumn("o_r", F.col("c_all") - F.col("o_g"))
        .withColumn("n_r", F.col("n_all") - F.col("n_g"))
    )
    # expected cell counts under independence; both (group, rest) columns
    e_g = F.col("n_g") * F.col("c_all") / F.col("n_all")
    e_r = F.col("n_r") * F.col("c_all") / F.col("n_all")
    term = (
        (F.col("o_g") - e_g) * (F.col("o_g") - e_g) / e_g
        + (F.col("o_r") - e_r) * (F.col("o_r") - e_r) / e_r
    )
    term_micro = F.floor(term * F.lit(1_000_000.0)).cast("bigint")
    return (
        full.groupBy("g", "n_g", "n_r")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_categories"),
            F.sum(term_micro).cast("bigint").alias("chi2_micro"),
        )
        .select(
            F.col("g").alias(group_col),
            F.col("n_g").cast("bigint").alias("n_group"),
            F.col("n_r").cast("bigint").alias("n_rest"),
            "n_categories",
            "chi2_micro",
            (F.col("chi2_micro") / 1_000_000.0).alias("chi2"),
        )
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: tuple[str, ...] = ("c_nationkey",),
    sensitive_col: str = "c_mktsegment",
    l: int = 3,
) -> DataFrame:
    """L-diversity audit — :func:`k_anonymity_audit`'s necessary
    companion: a class can be large (k-anonymous) yet expose everyone in
    it if they all share one sensitive value; the release gate also
    needs ≥ l DISTINCT sensitive values per quasi-identifier class.

    One aggregate at quasi grain (exact count distinct of the sensitive
    column folds map-side); output one row per class with its size,
    distinct-sensitive count, and the pass flag — suppression decisions
    filter this O(#classes) table.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("class_size"),
            F.countDistinct(sensitive_col).cast("bigint").alias("n_sensitive"),
        )
        .withColumn("l_diverse", F.col("n_sensitive") >= l)
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: tuple[str, ...] = ("c_nationkey",),
    sensitive_col: str = "c_mktsegment",
    t: float = 0.35,
) -> DataFrame:
    """T-closeness audit — third member of the privacy gate trio
    (k-anonymity: class size, l-diversity: distinct sensitive values,
    t-closeness: the class's sensitive DISTRIBUTION must stay within
    distance ``t`` of the global one, else the class itself leaks —
    "everyone in this class is 90% segment X").

    Distance is the exact Earth-Mover's (Wasserstein-1) over the
    sensitive categories in a fixed (sorted) order: EMD = Σ over the
    CDF walk of |cum_class/n_class − cum_global/n_global| / (#cats−1),
    computed on the INTEGER cross products ``|cum_c·n_g − cum_g·n_c|``
    (the ks_drift device) so the statistic is exact until one final
    division.  One (class, category) aggregate + a category-ordered
    window per class — O(#classes × #categories) work after the first
    aggregate.

    Output: (quasi..., class_size, emd, t_close).
    """
    q = [F.col(c) for c in quasi_cols]
    cells = df.groupBy(*q, F.col(sensitive_col).alias("cat")).agg(
        F.count(F.lit(1)).alias("c")
    )
    classes = cells.select(*quasi_cols).distinct()
    glob = cells.groupBy("cat").agg(F.sum("c").alias("c_all"))
    n_class = cells.groupBy(*quasi_cols).agg(F.sum("c").alias("n_c"))
    # n_cats rides along as a broadcast one-row aggregate, NOT a driver
    # .count(): an eager count fires a Spark job every time the query is
    # merely PLANNED (e.g. the plan-audit sweep), and bakes a stale
    # constant into the plan besides
    grand = cells.agg(F.sum("c").alias("n_all"))
    cats_ct = glob.agg(F.count(F.lit(1)).alias("n_cats"))
    full = (
        classes.crossJoin(glob)
        .join(cells, [*quasi_cols, "cat"], "left")
        .select(
            *quasi_cols,
            "cat",
            "c_all",
            F.coalesce("c", F.lit(0)).alias("c_c"),
        )
    )
    w = (
        Window.partitionBy(*quasi_cols)
        .orderBy("cat")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    walked = full.select(
        *quasi_cols,
        F.sum("c_c").over(w).alias("cum_c"),
        F.sum("c_all").over(w).alias("cum_g"),
    )
    emd_num = (
        walked.join(n_class, list(quasi_cols))
        .crossJoin(F.broadcast(grand))
        .crossJoin(F.broadcast(cats_ct))
        .groupBy(*quasi_cols, "n_c", "n_all", "n_cats")
        .agg(
            F.sum(
                # cum·n cross products are n²-scale — DECIMAL(38,0) so
                # BIGINT can't wrap silently past ~3e9 rows (the
                # emd_drift device; DuckDB sums in HUGEINT already)
                F.abs(
                    F.col("cum_c").cast("decimal(38,0)") * F.col("n_all")
                    - F.col("cum_g").cast("decimal(38,0)") * F.col("n_c")
                )
            ).alias("num")
        )
    )
    # a single-category sensitive domain means every class trivially
    # matches the global distribution: EMD is 0 by definition, and the
    # (n_cats-1) normalizer would otherwise divide by zero
    emd = F.when(F.col("n_cats") == 1, F.lit(0.0)).otherwise(
        F.col("num").cast("double")
        / (F.col("n_c").cast("double") * F.col("n_all") * (F.col("n_cats") - 1))
    )
    return emd_num.select(
        *quasi_cols,
        F.col("n_c").cast("bigint").alias("class_size"),
        emd.alias("emd"),
        (emd <= t).alias("t_close"),
    )


def emd_drift(
    docs: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
) -> DataFrame:
    """EXACT Wasserstein-1 (earth-mover's) drift per group vs rest —
    the magnitude-aware member of the drift quartet: KS tells you the
    worst CDF gap, U the dominance direction, χ² the categorical mix;
    EMD answers "HOW FAR did the distribution move, in the value's own
    units" (∫|F_a − F_b| dv — the area between the CDFs).

    Same scaffold as :func:`ks_drift`, with the max replaced by a
    gap-weighted sum: between consecutive observed values v_i < v_{i+1}
    both CDFs are flat, so the integral is
    Σ |cum_g·n_r − cum_r·n_g| · (v_{i+1} − v_i) — every factor an exact
    BIGINT (sums in DECIMAL(38,0): the cross product alone can reach
    n², and the value gaps multiply on top), ONE final division by
    n_g·n_r.  O(distinct values) after the first aggregate.

    Output: (group, n_group, n_rest, emd) — emd in value units.
    """
    vals = docs.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
    per = vals.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))
    groups = per.select("g").distinct()
    totals = per.groupBy("g").agg(F.sum("c").alias("n_g"))
    grand = per.agg(F.sum("c").alias("n_all"))
    allv = per.groupBy("v").agg(F.sum("c").alias("c_all"))
    own = per.select("g", "v", F.col("c").alias("c_g"))
    joined = (
        # broadcast the group-dictionary side explicitly: when the input
        # frame is itself a join output (e.g. classifier_auc feeding this
        # machinery), size stats are unknown and Spark falls back to
        # CartesianProduct for the group-by-value grid — the hint pins
        # BroadcastNestedLoopJoin (groups is dictionary grain)
        allv.crossJoin(F.broadcast(groups))
        .join(own, ["g", "v"], "left")
        .select(
            "g",
            "v",
            F.coalesce("c_g", F.lit(0)).alias("c_g"),
            (F.col("c_all") - F.coalesce("c_g", F.lit(0))).alias("c_r"),
        )
    )
    w_ord = Window.partitionBy("g").orderBy("v")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    walked = joined.select(
        "g",
        "v",
        F.sum("c_g").over(w_cum).alias("cum_g"),
        F.sum("c_r").over(w_cum).alias("cum_r"),
        F.lead("v").over(w_ord).alias("v_next"),
    ).where(F.col("v_next").isNotNull())
    term = (
        F.abs(
            F.col("cum_g").cast("decimal(38,0)") * F.col("n_r")
            - F.col("cum_r").cast("decimal(38,0)") * F.col("n_g")
        )
        * (F.col("v_next") - F.col("v")).cast("decimal(38,0)")
    )
    return (
        walked.join(totals, "g")
        .crossJoin(F.broadcast(grand))
        .withColumn("n_r", F.col("n_all") - F.col("n_g"))
        .groupBy("g", "n_g", "n_r")
        .agg(F.sum(term).alias("num"))
        .select(
            F.col("g").alias(group_col),
            F.col("n_g").cast("bigint").alias("n_group"),
            F.col("n_r").cast("bigint").alias("n_rest"),
            (
                F.col("num").cast("double")
                / (F.col("n_g").cast("double") * F.col("n_r"))
            ).alias("emd"),
        )
    )


#: Benford expected leading-digit shares in exact ppm — algorithm
#: constants (log10(1 + 1/d), precomputed so no engine evaluates a
#: transcendental at query time), summing to 1,000,000 - 1 by flooring.
BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910,
    5: 79181, 6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


def benford_audit(
    orders: DataFrame, value_col: str = "o_totalprice"
) -> DataFrame:
    """Benford's-law leading-digit audit — the classic fabricated-data
    detector for naturally spanning magnitudes (prices, populations,
    ledger amounts): first digits should follow log10(1 + 1/d), and
    uniform or hand-typed data fails loudly.

    Engine-portable digit extraction: values go to exact integer cents
    FIRST (a double's string form is engine-formatting territory; an
    integer's is canonical everywhere), then leading digit = the
    integer's first decimal digit via one string index.  Expected
    shares are precomputed ppm constants (no transcendental evaluated
    at query time).  One digit-grain aggregate; deviation in exact ppm
    arithmetic (observed ppm by integral div).

    Output per digit: (digit, n_obs, obs_ppm, expected_ppm, dev_ppm).
    """
    cents = F.floor(F.col(value_col) * 100).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    counts = (
        orders.where(F.col(value_col) > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    )
    total = counts.agg(F.sum("n_obs").alias("n_total"))
    expected = F.create_map(
        *[F.lit(x) for kv in BENFORD_PPM.items() for x in kv]
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            "obs_ppm",
            F.expr("CAST((n_obs * 1000000) div n_total AS BIGINT)"),
        )
        .withColumn("expected_ppm", expected[F.col("digit")].cast("bigint"))
        .withColumn("dev_ppm", F.col("obs_ppm") - F.col("expected_ppm"))
        .select("digit", "n_obs", "obs_ppm", "expected_ppm", "dev_ppm")
    )


def gini_concentration(
    orders: DataFrame,
    group_col: str = "o_orderpriority",
    value_col: str = "o_totalprice",
    key_col: str = "o_orderkey",
) -> DataFrame:
    """Gini coefficient of value concentration per group — "is revenue
    spread across orders or carried by whales?", the inequality readout
    behind skew-aware capacity planning and abuse detection.

    Exact rank formula: G = (2·Σ i·x(i) − (n+1)·Σx) / (n·Σx) over the
    group's values sorted ascending.  Ranks come from ONE window per
    group (parallel across groups; within-group sort is the definition's
    honest cost — same stance as quality_calibration), values are exact
    integer cents, and both Σ run in DECIMAL(38,0) (i·x reaches n·max —
    past BIGINT at 100 TB).  One final division; ties broken by key so
    ranks are total (any total order gives the same G when values tie —
    the tie-break only pins determinism, not the statistic).

    Output: (group, n, total_cents, gini).
    """
    cents = F.floor(F.col(value_col) * 100).cast("long")
    w = Window.partitionBy(group_col).orderBy("c", key_col)
    ranked = (
        orders.select(F.col(group_col), F.col(key_col), cents.alias("c"))
        .withColumn("i", F.row_number().over(w))
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec(F.col("c"))).alias("sx"),
        F.sum(dec(F.col("i")) * dec(F.col("c"))).alias("six"),
    )
    gini = (
        (
            F.lit(2.0) * F.col("six").cast("double")
            - (F.col("n") + 1).cast("double") * F.col("sx").cast("double")
        )
        / (F.col("n").cast("double") * F.col("sx").cast("double"))
    )
    return agg.select(
        group_col,
        "n",
        F.col("sx").cast("bigint").alias("total_cents"),
        gini.alias("gini"),
    )


def weighted_median(
    df: DataFrame,
    group_col: str = "l_returnflag",
    value_col: str = "l_extendedprice",
    weight_col: str = "l_quantity",
) -> DataFrame:
    """Per-group WEIGHTED median — the weighted-quantile operator Spark
    has no built-in for: the smallest value v whose cumulative weight
    reaches half the group's total (inverted weighted CDF, the
    unambiguous no-interpolation convention — every boundary test is
    exact BIGINT, nothing to drift cross-engine).

    The cumulative walk is NOT a per-group window at value grain (the
    biggest group is the table — the quality_calibration lesson); it is
    the TWO-PHASE distributed rank device: range-repartition by
    (group, value), per-(pid, group) partial weight sums, a
    config-grain (pid × group) offset table broadcast back, then ONE
    aggregate picks min(v | off + local_cum reaches half) per group.

    Weights quantize to exact integer units (floor, min 1 so no row
    vanishes) before any sum.  Output: (group, total_w, median_v).
    """
    w_int = F.greatest(F.floor(F.col(weight_col)).cast("bigint"), F.lit(1))
    t = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(value_col).alias("v"),
            w_int.alias("wt"),
        )
        .repartitionByRange(F.col("g"), F.col("v"))
        .withColumn("pid", F.spark_partition_id())
    )
    w_in = (
        Window.partitionBy("pid", "g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = t.withColumn("local_cum", F.sum("wt").over(w_in))
    per = t.groupBy("pid", "g").agg(F.sum("wt").alias("wsum"))
    w_off = (
        Window.partitionBy("g")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per.withColumn(
        "off", F.coalesce(F.sum("wsum").over(w_off), F.lit(0))
    ).select("pid", "g", "off")
    totals = per.groupBy("g").agg(F.sum("wsum").alias("total_w"))
    return (
        t.join(F.broadcast(offsets), ["pid", "g"])
        .join(F.broadcast(totals), "g")
        .where((F.col("off") + F.col("local_cum")) * 2 >= F.col("total_w"))
        .groupBy("g", "total_w")
        .agg(F.min("v").alias("median_v"))
        .select(
            F.col("g").alias(group_col),
            F.col("total_w").cast("bigint").alias("total_w"),
            "median_v",
        )
    )


#: KMV hash domain: md5-60 (60 bits from the hex digest) — the same
#: deterministic coin family every sketch in this repo uses, so the
#: estimate itself is value-hash oracle-checkable.
KMV_SPACE = 1 << 60


def kmv_distinct(
    df: DataFrame,
    group_col: str = "o_orderpriority",
    key_col: str = "o_custkey",
    k: int = 64,
) -> DataFrame:
    """Mergeable K-MINIMUM-VALUES distinct sketch per group — the
    order-statistics member of the sketch family next to HLL
    (hll_distinct): keep the k smallest hash values of the keys; the
    k-th smallest h_k estimates D ≈ (k-1)·2^60/h_k.  Unlike HLL the
    state is exact ORDER STATISTICS of a deterministic hash, so the
    estimate is bit-reproducible and two sketches union by re-taking
    the k smallest — and set EXPRESSIONS (union/intersection via the
    inclusion rule on the merged k-set) fall out for free.

    Scale shape: the k smallest per group come from a TWO-PHASE top-k
    (per-(group, partition) local k-sets via sort_array+slice — a
    map-side combine — then one config-grain (#partitions × k rows per
    group) final pass), never a per-group sort at data grain.  Groups
    with fewer than k distinct keys return the exact count (the KMV
    contract: a non-saturated sketch IS the distinct set).

    ``exact_distinct`` rides along as the honesty column (the wau_hll
    pattern).  Output: (group, n_in_sketch, kth_hash, est_distinct,
    exact_distinct).
    """
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 18, 15), 16, 10
    ).cast("long")
    hashed = df.select(F.col(group_col).alias("g"), h.alias("h")).distinct()
    local = (
        hashed.withColumn("pid", F.spark_partition_id())
        .groupBy("g", "pid")
        .agg(F.slice(F.sort_array(F.collect_set("h")), 1, k).alias("hs"))
        .select("g", F.explode("hs").alias("h"))
    )
    # final pass over ≤ k × #partitions rows per group (config grain)
    w = Window.partitionBy("g").orderBy("h")
    topk = (
        local.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )
    est = F.when(
        F.col("n_in_sketch") < k,
        F.col("n_in_sketch").cast("double"),
    ).otherwise(
        (F.lit(float(k - 1)) * F.lit(float(KMV_SPACE)))
        / F.col("kth_hash").cast("double")
    )
    exact = df.groupBy(F.col(group_col).alias("g")).agg(
        F.countDistinct(key_col).alias("exact_distinct")
    )
    return (
        topk.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_in_sketch"),
            F.max("h").alias("kth_hash"),
        )
        .join(exact, "g")
        .select(
            F.col("g").alias(group_col),
            "n_in_sketch",
            "kth_hash",
            est.alias("est_distinct"),
            F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
        )
    )


def cramers_v(
    df: DataFrame,
    col_a: str = "o_orderpriority",
    col_b: str = "o_orderstatus",
) -> DataFrame:
    """Association strength between two categorical columns: the full
    r×c contingency χ² and Cramér's V = sqrt(χ² / (n·min(r-1, c-1))) —
    the profiling question "are these two columns redundant?" answered
    in one pass.

    Exactness protocol is chi2_drift's: cells are exact BIGINTs (zero
    cells included via the row-keys × col-keys cross join — both
    config-grain category lists), each cell's (o−e)²/e term is one
    pinned IEEE tree micro-quantized (floor) to a BIGINT, and the sum
    is order-independent.  V applies one shared double tree + sqrt
    (correctly rounded in both engines).  A single-category axis has
    no measurable association: V = 0 by convention.

    Output (one row): n_rows, n_a, n_b, chi2_micro, chi2, v.
    """
    cells = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).alias("o"))
    ra = cells.groupBy("a").agg(F.sum("o").alias("ra"))
    cb = cells.groupBy("b").agg(F.sum("o").alias("cb"))
    grand = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("a").alias("n_a"),
        F.countDistinct("b").alias("n_b"),
    )
    full = (
        ra.crossJoin(cb)
        .join(cells, ["a", "b"], "left")
        .select(
            "a", "b", "ra", "cb", F.coalesce("o", F.lit(0)).alias("o")
        )
        .crossJoin(F.broadcast(grand))
    )
    # expected counts in an all-double tree (double(ra)·double(cb)/double(n),
    # never a BIGINT product — the n²-overflow lesson), mirrored verbatim
    # in the oracle SQL
    e = (
        F.col("ra").cast("double")
        * F.col("cb").cast("double")
        / F.col("n").cast("double")
    )
    term = (F.col("o") - e) * (F.col("o") - e) / e
    micro = F.floor(term * F.lit(1_000_000.0)).cast("bigint")
    agg = full.groupBy("n", "n_a", "n_b").agg(
        F.sum(micro).cast("bigint").alias("chi2_micro")
    )
    kmin = F.least(F.col("n_a") - 1, F.col("n_b") - 1)
    v = F.when(kmin == 0, F.lit(0.0)).otherwise(
        F.sqrt(
            (F.col("chi2_micro") / F.lit(1_000_000.0))
            / (F.col("n") * kmin).cast("double")
        )
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        "chi2_micro",
        (F.col("chi2_micro") / 1_000_000.0).alias("chi2"),
        v.alias("v"),
    )


def kmv_overlap(
    df: DataFrame,
    split_col: str = "o_orderstatus",
    val_a: str = "O",
    val_b: str = "F",
    key_col: str = "o_custkey",
    k: int = 64,
) -> DataFrame:
    """KMV SET ALGEBRA — the capability that makes :func:`kmv_distinct`
    more than an HLL clone: because the state is exact order statistics
    of one shared hash, two sketches compose by re-taking the k
    smallest of their union, and the inclusion rule on that merged
    k-set estimates union, intersection, and Jaccard in one shot
    (Beyer et al., SIGMOD'07) — the sketch twin of hll_overlap with a
    bit-reproducible estimate.

    est_union = (k−1)·2^60/h_k over the merged k-set; K∩ = members of
    the merged k-set present in BOTH sides; est_jaccard = K∩/k;
    est_intersection = est_jaccard · est_union.  Every input to those
    divisions is an exact integer ⇒ one pinned IEEE tree.  The merge
    runs on 2k rows (config grain).  Exact intersection rides along as
    the honesty column.

    Output (one row): n_a_sketch, n_b_sketch, union_kth, est_union,
    k_inter, est_intersection, est_jaccard, exact_intersection.
    """
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 18, 15), 16, 10
    ).cast("long")
    sides = df.where(
        F.col(split_col).isin(val_a, val_b)
    ).select(
        F.when(F.col(split_col) == val_a, F.lit("a")).otherwise(F.lit("b")).alias("g"),
        h.alias("h"),
    ).distinct()
    local = (
        sides.withColumn("pid", F.spark_partition_id())
        .groupBy("g", "pid")
        .agg(F.slice(F.sort_array(F.collect_set("h")), 1, k).alias("hs"))
        .select("g", F.explode("hs").alias("h"))
    )
    w = Window.partitionBy("g").orderBy("h")
    topk = (
        local.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    )
    # merged k-set: k smallest of the union of the two k-sets (≤ 2k rows)
    w_u = Window.orderBy("h")
    merged = (
        topk.groupBy("h")
        .agg(
            F.max(F.when(F.col("g") == "a", 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("g") == "b", 1).otherwise(0)).alias("in_b"),
        )
        .withColumn("rn", F.row_number().over(w_u))
        .where(F.col("rn") <= k)
    )
    sketch_sizes = topk.groupBy().pivot("g", ["a", "b"]).count()
    exact = (
        df.where(F.col(split_col) == val_a)
        .select(F.col(key_col).alias("key"))
        .intersect(
            df.where(F.col(split_col) == val_b).select(F.col(key_col).alias("key"))
        )
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    agg = merged.agg(
        F.count(F.lit(1)).alias("n_merged"),
        F.max("h").alias("union_kth"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("k_inter"),
    )
    est_union = F.when(
        F.col("n_merged") < k, F.col("n_merged").cast("double")
    ).otherwise(
        (F.lit(float(k - 1)) * F.lit(float(KMV_SPACE)))
        / F.col("union_kth").cast("double")
    )
    jac = F.col("k_inter").cast("double") / F.col("n_merged").cast("double")
    return (
        agg.crossJoin(F.broadcast(sketch_sizes))
        .crossJoin(F.broadcast(exact))
        .select(
            F.col("a").cast("bigint").alias("n_a_sketch"),
            F.col("b").cast("bigint").alias("n_b_sketch"),
            "union_kth",
            est_union.alias("est_union"),
            F.col("k_inter").cast("bigint").alias("k_inter"),
            (jac * est_union).alias("est_intersection"),
            jac.alias("est_jaccard"),
            F.col("exact_intersection").cast("bigint").alias("exact_intersection"),
        )
    )


def merkle_ranges(
    df: DataFrame,
    key_col: str = "o_orderkey",
    leaf_width: int = 4096,
    fanout: int = 16,
    levels: int = 3,
) -> DataFrame:
    """Merkle RANGE TREE over a keyed table — the hierarchical upgrade
    of :func:`table_digest`: leaves digest contiguous key ranges
    (``key div leaf_width``), and every parent level digests its
    ≤``fanout`` children's (id, digest) list in id order, so two
    replicas localize a divergence by walking DOWN from the root in
    O(log) digest comparisons instead of diffing every leaf bucket —
    the anti-entropy structure Dynamo-style stores actually exchange
    (reference seed: the flat per-chunk MD5 scrubbing of
    storage-node/main.go:161-209, lifted to a range hierarchy).

    Leaf digests use the order-independent DECIMAL(38,0) sum fold
    (identical under any partitioning/merge plan); parent digests are
    md5 over the ordered child list — real Merkle mixing — where the
    only collected state is the ≤fanout-element child array
    (config-bounded).  Each level is one aggregate at the previous
    level's grain: the whole tree costs one scan plus ``levels``
    aggregates over geometrically shrinking range tables.

    Output: (level, range_id, n_rows, digest) for level 0 (leaves)
    through ``levels``.
    """
    row_str = F.concat_ws(
        "|", *[F.col(c).cast("string") for c in df.columns]
    )
    rh = F.conv(F.substring(F.md5(row_str), 18, 15), 16, 10).cast("long")
    leaf = (
        df.select(
            F.expr(f"CAST({key_col} AS BIGINT) div {int(leaf_width)}").alias(
                "range_id"
            ),
            rh.alias("rh"),
        )
        .groupBy("range_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("rh").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("digest"),
        )
    )
    out = leaf.select(
        F.lit(0).alias("level"), "range_id", "n_rows", "digest"
    )
    cur = leaf
    for lvl in range(1, int(levels) + 1):
        cur = (
            cur.groupBy(
                F.expr(f"range_id div {int(fanout)}").alias("range_id")
            )
            .agg(
                F.sum("n_rows").cast("bigint").alias("n_rows"),
                F.md5(
                    F.concat_ws(
                        "|",
                        F.transform(
                            F.sort_array(
                                F.collect_list(
                                    F.struct(
                                        F.col("range_id").alias("i"),
                                        F.col("digest").alias("d"),
                                    )
                                )
                            ),
                            lambda x: F.concat_ws(
                                ":", x["i"].cast("string"), x["d"]
                            ),
                        ),
                    )
                ).alias("digest"),
            )
        )
        out = out.unionByName(
            cur.select(
                F.lit(lvl).alias("level"), "range_id", "n_rows", "digest"
            )
        )
    return out


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Exact equi-join output-cardinality profile WITHOUT running the
    join: |A ⋈ B| = Σ_k d_A(k)·d_B(k) over per-side key degrees — the
    number the optimizer guesses from sketches, computed exactly here
    as a planning/skew-triage tool (should this join be broadcast?
    salted?  is one key about to produce half the output?).

    Shape at 100 TB: two map-side-combined degree aggregates (one per
    side, each at key grain) and one KEY-GRAIN join between them — the
    fact tables are never joined, so the cost is two scans plus
    key-cardinality-sized work.  Degree products are accumulated in
    DECIMAL(38,0) (a 10⁹×10⁹-degree key would wrap BIGINT silently in
    non-ANSI mode); the single heaviest key is tie-broken by MIN(key)
    so the row is deterministic.  ``skew_ratio`` = max-key contribution
    over the mean per-key contribution (max·n_keys/est) — the salting
    alarm: ≫1 means one key dominates the join output.

    Output (one row): est_rows, n_keys, max_key_rows, heaviest_key,
    skew_ratio.
    """
    da = left.groupBy(F.col(left_key).alias("k")).agg(
        F.count(F.lit(1)).alias("cnt_a")
    )
    db = right.groupBy(F.col(right_key).alias("k")).agg(
        F.count(F.lit(1)).alias("cnt_b")
    )
    contrib = da.join(db, "k").select(
        "k",
        (F.col("cnt_a").cast("decimal(38,0)") * F.col("cnt_b")).alias("prod"),
    )
    totals = contrib.agg(
        F.sum("prod").cast("bigint").alias("est_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("prod").cast("bigint").alias("max_key_rows"),
    )
    heavy = (
        contrib.join(
            F.broadcast(totals.select("max_key_rows")),
            contrib["prod"] == F.col("max_key_rows"),
        )
        .agg(F.min("k").cast("bigint").alias("heaviest_key"))
    )
    return totals.crossJoin(F.broadcast(heavy)).select(
        "est_rows",
        "n_keys",
        "max_key_rows",
        "heaviest_key",
        (
            F.col("max_key_rows").cast("double")
            * F.col("n_keys").cast("double")
            / F.col("est_rows").cast("double")
        ).alias("skew_ratio"),
    )


def trimmed_mean(
    events: DataFrame, group_col: str = "event_type", trim_pct: int = 10
) -> DataFrame:
    """Per-group trimmed mean: the mean after dropping the lowest and
    highest ``trim_pct`` percent of rows by rank — the robust center
    between the mean (breakdown 0) and the median (information-
    discarding), standard for latency/revenue reporting under outliers.

    The per-group rank is the TWO-PHASE distributed rank (the
    quality_calibration device — range-repartition by (group, value,
    id), within-partition row_number, #partitions×#groups offset table
    prefix-summed and broadcast back), so no single task ever sorts a
    whole group.  ``k = n·trim_pct div 100`` rows are dropped from each
    end BY RANK with an id tie-break (a total order, so boundary ties
    are deterministic and the SQL row_number oracle reproduces the
    exact same kept set).  The kept rows aggregate as exact cents; the
    mean is the single pinned division tree.
    """
    t = (
        events.select(
            F.col(group_col).alias("g"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
            F.col("event_id").alias("id"),
        )
        .repartitionByRange(F.col("g"), F.col("cents"), F.col("id"))
        .withColumn("pid", F.spark_partition_id())
    )
    w_in = Window.partitionBy("pid", "g").orderBy("cents", "id")
    t = t.withColumn("rn", F.row_number().over(w_in))
    per = t.groupBy("pid", "g").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.partitionBy("g")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("pid", "g", "off")
    totals = per.groupBy("g").agg(F.sum("cnt").cast("bigint").alias("n"))
    ranked = (
        t.join(F.broadcast(offsets), ["pid", "g"])
        .join(F.broadcast(totals), "g")
        .select(
            "g",
            "cents",
            "n",
            (F.col("off") + F.col("rn")).alias("rank"),
            F.expr(f"(n * {int(trim_pct)}) div 100").alias("k"),
        )
    )
    kept = ranked.filter(
        (F.col("rank") > F.col("k")) & (F.col("rank") <= F.col("n") - F.col("k"))
    )
    return (
        kept.groupBy("g", "n", "k")
        .agg(F.sum("cents").alias("kept_cents"), F.count(F.lit(1)).alias("n_kept"))
        .select(
            F.col("g").alias(group_col),
            "n",
            (F.col("k") * 2).cast("bigint").alias("n_trimmed"),
            F.col("n_kept").cast("bigint").alias("n_kept"),
            (
                F.col("kept_cents").cast("double")
                / (F.col("n_kept").cast("double") * F.lit(100.0))
            ).alias("trimmed_mean"),
        )
    )


def ooo_rate(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Out-of-order ARRIVAL audit per group: walking the stream in
    arrival order (``event_id`` — the ingest sequence), how often does
    EVENT TIME step backwards, and by how much?  This is the number
    that sizes streaming watermarks: ``max_regression_us`` is the
    minimum allowed-lateness that loses nothing, ``ooo_ppm`` the rate
    of late arrivals.

    The consecutive pairing is the twap DISTRIBUTED LAG (two-phase
    global ordinal over (group, arrival id) + equi-join on (group,
    r+1)) — no single-task per-group sort.  Counts are exact BIGINTs;
    regressions measure in integer µs via ``timestampdiff`` (NTZ-safe);
    ppm is floor-quantized to an exact integer (``(n_ooo·10⁶) div
    n_pairs``) so the surface is engine-invariant with no float sum.

    Output: (group, n_events, n_pairs, n_ooo, ooo_ppm,
    max_regression_us).
    """
    t = (
        events.select(
            F.col(group_col).alias("g"),
            F.col("ts").alias("tstamp"),
            F.col("event_id").alias("id"),
        )
        .repartitionByRange(F.col("g"), F.col("id"))
        .withColumn("pid", F.spark_partition_id())
    )
    w_in = Window.partitionBy("pid", "g").orderBy("id")
    t = t.withColumn("rn", F.row_number().over(w_in))
    per = t.groupBy("pid", "g").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.partitionBy("g")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("pid", "g", "off")
    totals = per.groupBy("g").agg(F.sum("cnt").cast("bigint").alias("n_g"))
    r = t.join(F.broadcast(offsets), ["pid", "g"]).select(
        "g", "tstamp", (F.col("off") + F.col("rn")).alias("r")
    )
    a, b = r.alias("a"), r.alias("b")
    pairs = a.join(
        b,
        (F.col("a.g") == F.col("b.g")) & (F.col("b.r") == F.col("a.r") + 1),
    ).select(
        F.col("a.g").alias("g"),
        F.expr("timestampdiff(MICROSECOND, a.tstamp, b.tstamp)").alias("step"),
    )
    agg = pairs.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("step") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_ooo"),
        F.max(F.when(F.col("step") < 0, -F.col("step")).otherwise(0))
        .cast("bigint")
        .alias("max_regression_us"),
    )
    return agg.join(F.broadcast(totals), "g").select(
        F.col("g").alias(group_col),
        F.col("n_g").alias("n_events"),
        "n_pairs",
        "n_ooo",
        F.expr("(n_ooo * 1000000) div n_pairs").alias("ooo_ppm"),
        "max_regression_us",
    )


def fd_violations(
    df: DataFrame, pairs: Sequence[tuple[str, str]]
) -> DataFrame:
    """Functional-dependency audit: for each candidate dependency
    ``det -> dep``, how many determinant keys map to MORE than one
    distinct dependent value — the schema-inference / normalization /
    data-quality primitive behind "is this column really keyed by
    that one?" (complements :func:`dq_check`, which checks row-level
    predicates, not cross-row key consistency).

    One hash aggregation per dependency at determinant-key grain
    (exact ``count(distinct dep)`` per key — partial aggregates
    collapse map-side), then a one-row rollup per dependency; the
    per-dependency results union into a #pairs-row report.  Shuffle
    width is key grain throughout — the 100 TB plan is #pairs
    scans (or one shared scan under Spark's cache) of the same
    column-pruned table.

    ``violation_ppm`` is parts-per-million of keys violating, floor-
    quantized integer (engine-exact); ``max_distinct`` is the worst
    key's dependent cardinality.

    Returns ``(det_col, dep_col, n_keys, n_violating, violation_ppm,
    max_distinct)`` one row per audited dependency.

    Reference parity: none (profiling extension, SURVEY.md §2.3); the
    per-key distinct count is the reference's M5 group-by-key with a
    distinct-counting reduce fn.
    """
    if not pairs:
        raise ValueError("fd_violations needs at least one (det, dep) pair")
    reports = []
    for det, dep in pairs:
        per_key = (
            df.select(F.col(det).alias("k"), F.col(dep).alias("v"))
            .groupBy("k")
            .agg(F.countDistinct("v").alias("nv"))
        )
        reports.append(
            per_key.agg(
                F.lit(det).alias("det_col"),
                F.lit(dep).alias("dep_col"),
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                F.sum(F.when(F.col("nv") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating"),
                F.max("nv").cast("bigint").alias("max_distinct"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "det_col",
        "dep_col",
        "n_keys",
        "n_violating",
        F.expr(
            "cast(case when n_keys > 0"
            " then (n_violating * 1000000) div n_keys"
            " else 0 end as bigint)"
        ).alias("violation_ppm"),
        "max_distinct",
    )


def exact_quantiles(
    events: DataFrame,
    group_col: str = "event_type",
    qs_ppm: Sequence[int] = (500_000, 950_000, 990_000),
) -> DataFrame:
    """EXACT per-group quantiles (p50/p95/p99 by default) — the exact
    face of ``approx_quantiles``' sketch (the same honesty pairing as
    lsh/ann/mrl recall): order statistics at rank ``ceil(q·n)`` (the
    lower/type-1 convention — a value that OCCURS, engine-invariant,
    no interpolation tree at all).

    The rank comes from the two-phase distributed rank over (group,
    cents, id) — no single task sorts a group; the ≤ #qs picked rows
    per group pivot with a conditional aggregate.  Everything is
    BIGINT cents until the /100.0 surface division per output.

    Returns ``(group, n, q50, q95, q99)`` in value units.
    """
    t = (
        events.select(
            F.col(group_col).alias("g"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
            F.col("event_id").alias("id"),
        )
        .repartitionByRange(F.col("g"), F.col("cents"), F.col("id"))
        .withColumn("pid", F.spark_partition_id())
    )
    w_in = Window.partitionBy("pid", "g").orderBy("cents", "id")
    t = t.withColumn("rn", F.row_number().over(w_in))
    per = t.groupBy("pid", "g").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.partitionBy("g")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("pid", "g", "off")
    totals = per.groupBy("g").agg(F.sum("cnt").cast("bigint").alias("n"))
    ranked = (
        t.join(F.broadcast(offsets), ["pid", "g"])
        .join(F.broadcast(totals), "g")
        .select("g", "cents", "n", (F.col("off") + F.col("rn")).alias("r"))
    )
    conds = []
    for q in qs_ppm:
        # ceil(q*n / 1e6) in exact ints
        conds.append(
            (F.col("r") == F.expr(f"(n * {int(q)} + 999999) div 1000000"))
        )
    picked = ranked.filter(conds[0] | conds[1] | conds[2])
    aggs = []
    for q in qs_ppm:
        k = F.expr(f"(n * {int(q)} + 999999) div 1000000")
        aggs.append(
            (
                F.max(F.when(F.col("r") == k, F.col("cents"))).cast("double")
                / F.lit(100.0)
            ).alias(f"q{q // 10000}")
        )
    return (
        picked.groupBy("g", "n")
        .agg(*aggs)
        .select(F.col("g").alias(group_col), "n", "q50", "q95", "q99")
    )


def qq_drift(
    lineitem: DataFrame,
    split_date: str = "1998-06-01",
    n_quantiles: int = 9,
    value_col: str = "l_extendedprice",
    date_col: str = "l_shipdate",
) -> DataFrame:
    """Quantile-quantile drift readout: the decile grid of a numeric
    column in the BEFORE vs AFTER period, paired — the data behind a
    Q-Q plot, and the distribution-shift diagnostic that says WHERE the
    distribution moved, not just THAT it moved (ks_drift/emd_drift give
    one scalar; this gives the curve).

    Quantiles are EXACT type-1 order statistics at rank ``ceil(q·n)``
    over integer cents — a value that OCCURS, no interpolation tree, so
    the oracle (quantile_disc) matches bit-for-bit (the device
    exact_quantiles established).  Ranks come from the two-phase
    distributed rank over (period, cents, id): range-repartition, a
    within-partition row_number, then partition-offset merge — no
    single task ever sorts a whole period (the partition-grain offset
    window is partition-dictionary-sized).

    Returns ``(q_ppm, q_before, q_after, shift)`` — one row per decile.
    """
    t = (
        lineitem.select(
            F.when(F.col(date_col) < F.lit(split_date), F.lit("before"))
            .otherwise(F.lit("after"))
            .alias("g"),
            F.floor(F.col(value_col) * 100).cast("bigint").alias("cents"),
            (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("id"),
        )
        .repartitionByRange(F.col("g"), F.col("cents"), F.col("id"))
        .withColumn("pid", F.spark_partition_id())
    )
    w_in = Window.partitionBy("pid", "g").orderBy("cents", "id")
    t = t.withColumn("rn", F.row_number().over(w_in))
    per = t.groupBy("pid", "g").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.partitionBy("g").orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("pid", "g", "off")
    totals = per.groupBy("g").agg(F.sum("cnt").cast("bigint").alias("n"))
    ranked = (
        t.join(F.broadcast(offsets), ["pid", "g"])
        .join(F.broadcast(totals), "g")
        .select("g", "cents", "n", (F.col("off") + F.col("rn")).alias("r"))
    )
    qs_ppm = [int((i + 1) * 1_000_000 / (n_quantiles + 1)) for i in range(n_quantiles)]
    cond = None
    for q in qs_ppm:
        c = F.col("r") == F.expr(f"(n * {q} + 999999) div 1000000")
        cond = c if cond is None else (cond | c)
    picked = ranked.filter(cond)
    # a picked row can satisfy several deciles when n is small — explode
    # the (bounded, config-sized) decile grid and keep the matches
    grid = F.array(*[F.lit(q) for q in qs_ppm])
    hits = (
        picked.select("g", "cents", "n", "r", F.explode(grid).alias("q_ppm"))
        .filter(F.col("r") == F.expr("(n * q_ppm + 999999) div 1000000"))
    )
    piv = hits.groupBy("q_ppm").agg(
        (
            F.max(F.when(F.col("g") == "before", F.col("cents"))).cast("double")
            / F.lit(100.0)
        ).alias("q_before"),
        (
            F.max(F.when(F.col("g") == "after", F.col("cents"))).cast("double")
            / F.lit(100.0)
        ).alias("q_after"),
    )
    return piv.select(
        F.col("q_ppm").cast("bigint").alias("q_ppm"),
        "q_before",
        "q_after",
        (F.col("q_after") - F.col("q_before")).alias("shift"),
    )


#: Anchored lexical classes for type inference — shared verbatim by the
#: Spark rlike calls and the DuckDB oracle's regexp_matches.
TYPE_INFER_PATTERNS = {
    "int": r"^[+-]?[0-9]+$",
    "float": r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$",
    "date": r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$",
    "bool": r"^(true|false|t|f|0|1)$",
}


def infer_types(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Schema/type inference audit over STRING-typed (or stringified)
    columns — the first step of onboarding a CSV/JSON drop whose
    declared schema is all-varchar: per column, how many values parse
    as int / float / date / bool, and the narrowest type that admits
    every non-null value — ``(column, n_rows, n_null, n_int, n_float,
    n_date, n_bool, suggested)``.

    Precedence (narrowest first, nulls always admitted): all-null →
    'null'; every value int → 'bigint'; every value numeric →
    'double'; every value ISO date → 'date'; every value in the
    boolean lexicon (case-insensitive true/false/t/f/0/1) →
    'boolean'; else 'string'.  The lexical classes are anchored
    regexes shared verbatim with the oracle, so the audit is
    bit-deterministic — no locale-dependent casts.

    Scale shape: one conditional aggregate per column over a single
    scan (column count × map-side combine; no shuffle beyond the
    one-row-per-column result)."""
    pieces = []
    for c in cols:
        v = F.col(c).cast("string")
        low = F.lower(v)
        n_null = F.sum(F.when(v.isNull(), 1).otherwise(0)).cast("bigint")
        counts = {
            t: F.sum(
                F.when(v.isNotNull() & low.rlike(p), 1).otherwise(0)
            ).cast("bigint")
            for t, p in TYPE_INFER_PATTERNS.items()
        }
        pieces.append(
            df.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                n_null.alias("n_null"),
                counts["int"].alias("n_int"),
                counts["float"].alias("n_float"),
                counts["date"].alias("n_date"),
                counts["bool"].alias("n_bool"),
            ).select(F.lit(c).alias("column"), "*")
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    non_null = F.col("n_rows") - F.col("n_null")
    suggested = (
        F.when(non_null == 0, F.lit("null"))
        .when(F.col("n_int") == non_null, F.lit("bigint"))
        .when(F.col("n_float") == non_null, F.lit("double"))
        .when(F.col("n_date") == non_null, F.lit("date"))
        .when(F.col("n_bool") == non_null, F.lit("boolean"))
        .otherwise(F.lit("string"))
    )
    return out.select(
        "column", "n_rows", "n_null", "n_int", "n_float", "n_date",
        "n_bool", suggested.alias("suggested"),
    )


def tvd_drift(
    docs: DataFrame,
    group_col: str = "source",
    cat_col: str = "lang",
) -> DataFrame:
    """Total-variation distance per group vs rest-of-corpus — the
    bounded [0, 1] categorical drift score production monitors usually
    alert on (PSI's log-ratio blows up on empty cells and its ``ln``
    isn't cross-engine pinned; TVD = ``max_A |P(A) − Q(A)| = ½ Σ_cat
    |p_c − q_c|`` is exact, symmetric, and cell-count-robust), rounding
    out the drift suite next to :func:`chi2_drift` (which weights by
    expected counts, so rare-category noise dominates small groups).

    Exactness protocol: cell counts are BIGINTs from one (group,
    category) aggregate; ``|o_g/n_g − o_r/n_r|`` is put over the common
    denominator ``n_g·n_r`` so each term is ``|o_g·n_r − o_r·n_g|`` —
    a pure BIGINT — summed exactly per group and divided ONCE at the
    end (``/ (2·n_g·n_r)``), making the statistic aggregation-order
    independent with a single float op total.

    Scale shape: identical to chi2_drift — one map-side-combined
    contingency aggregate at (group × category) grain, then a
    groups×categories grid (both bounded vocabularies, never row
    grain).  Output: (group, n_group, n_rest, n_categories, tvd).
    """
    cells = docs.groupBy(
        F.col(group_col).alias("g"), F.col(cat_col).alias("cat")
    ).agg(F.count(F.lit(1)).alias("o_g"))
    groups = cells.select("g").distinct()
    cat_tot = cells.groupBy("cat").agg(F.sum("o_g").alias("c_all"))
    g_tot = cells.groupBy("g").agg(F.sum("o_g").alias("n_g"))
    grand = cells.agg(F.sum("o_g").alias("n_all"))
    full = (
        groups.crossJoin(cat_tot)
        .join(cells, ["g", "cat"], "left")
        .select("g", "cat", "c_all", F.coalesce("o_g", F.lit(0)).alias("o_g"))
        .join(g_tot, "g")
        .crossJoin(F.broadcast(grand))
        .withColumn("o_r", F.col("c_all") - F.col("o_g"))
        .withColumn("n_r", F.col("n_all") - F.col("n_g"))
    )
    # |o_g·n_r − o_r·n_g| < n_all², so the BIGINT product is safe while
    # the audited table holds < ~3·10⁹ rows (n_all < 2^31.5); beyond
    # that, widen the FACTORS to DECIMAL before multiplying.  The
    # cross-category SUM is already DECIMAL for the order-independent
    # exact-sum protocol.
    num = F.abs(
        F.col("o_g") * F.col("n_r") - F.col("o_r") * F.col("n_g")
    ).cast("decimal(38,0)")
    return (
        full.groupBy("g", "n_g", "n_r")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_categories"),
            F.sum(num).alias("num_sum"),
        )
        .select(
            F.col("g").alias(group_col),
            F.col("n_g").cast("bigint").alias("n_group"),
            F.col("n_r").cast("bigint").alias("n_rest"),
            "n_categories",
            # n_r == 0 means the group IS the whole corpus: both
            # distributions are identical, so TVD is 0 by definition —
            # guard the division (mirrors runs_test / spearman_daily)
            # instead of letting the degenerate case surface as
            # null/NaN with unpinned cross-engine behavior.
            F.when(
                F.col("n_r") > 0,
                F.col("num_sum").cast("double")
                / (
                    2.0
                    * F.col("n_g").cast("double")
                    * F.col("n_r").cast("double")
                ),
            ).otherwise(F.lit(0.0)).alias("tvd"),
        )
    )


def gk_lambda(
    docs: DataFrame,
    x_col: str = "source",
    y_col: str = "lang",
) -> DataFrame:
    """Goodman–Kruskal λ — proportional-reduction-in-error association
    between two categoricals: how much knowing ``x`` improves a
    modal-category guess of ``y``.  The exact-arithmetic companion to
    :func:`cramers_v` (χ²-based) and the mutual-information scores
    whose ``ln`` is not cross-engine pinned: λ = (Σ_x max_y n_xy −
    max_y n_y) / (n − max_y n_y) is built ENTIRELY from integer cell
    counts, so the one final division is the only float op.

    Output: one row (n_rows, sum_modal, global_modal, lambda_yx).
    λ = 0 when x never changes the best guess; 1 when x determines y.

    Scale shape: one (x, y) contingency aggregate (map-side combined at
    vocabulary grain), a per-x max, and two scalar reductions — no
    row-grain shuffle anywhere.
    """
    cells = docs.groupBy(
        F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).agg(F.count(F.lit(1)).alias("n_xy"))
    per_x = cells.groupBy("x").agg(F.max("n_xy").alias("mx"))
    y_tot = cells.groupBy("y").agg(F.sum("n_xy").alias("n_y"))
    agg = per_x.agg(
        F.sum("mx").cast("bigint").alias("sum_modal")
    ).crossJoin(
        y_tot.agg(
            F.max("n_y").cast("bigint").alias("global_modal"),
            F.sum("n_y").cast("bigint").alias("n_rows"),
        )
    )
    lam = F.when(
        F.col("n_rows") == F.col("global_modal"), F.lit(0.0)
    ).otherwise(
        (F.col("sum_modal") - F.col("global_modal")).cast("double")
        / (F.col("n_rows") - F.col("global_modal")).cast("double")
    )
    return agg.select(
        "n_rows", "sum_modal", "global_modal", lam.alias("lambda_yx")
    )


def conformal_band(
    events: DataFrame,
    group_col: str = "event_type",
    q_num: int = 9,
) -> DataFrame:
    """Split-conformal prediction band per group: the q = 0.9 order
    statistic of absolute residuals around the group mean gives a
    distribution-free interval with finite-sample coverage ≥ q·(n+1)/n
    — the calibration device model-serving pipelines wrap point
    predictions with (here the "model" is the group mean; any scorer
    slots in upstream).

    Exactness protocol: residuals scale by n to stay integer —
    ``R_i = |v_i·n − S|`` in cents·n — BIGINT-safe while
    ``max_cents · n_group < 2^62`` (fixture cents < 2^17 admit ~10¹³
    rows per group; re-center on a coarser pre-mean beyond that) — the
    radius is the
    ``min(n, ceil((n+1)·q/10))``-th smallest R (an exact rank pick,
    value-deterministic under ties like pinball_eval's quantile), and
    mean/radius surface with single pinned divisions.

    Output: (group, n, mean, radius, lo, hi).  Scale shape: one
    map-side-combined stats pass, one per-group rank window at event
    grain, one aggregate.
    """
    cents = F.floor(F.col("value") * 100).cast("bigint")
    base = events.select(F.col(group_col).alias("g"), cents.alias("v"))
    stats = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
    )
    resid = base.join(stats, "g").withColumn(
        "r", F.abs(F.col("v") * F.col("n") - F.col("s"))
    )
    wv = Window.partitionBy("g").orderBy("r")
    k = F.least(
        F.col("n"),
        F.ceil((F.col("n") + 1) * q_num / 10.0).cast("bigint"),
    )
    picked = resid.withColumn("rn", F.row_number().over(wv)).filter(
        F.col("rn") == k
    )
    mean = (F.col("s").cast("double") / F.col("n")) / 100.0
    radius = (
        F.col("r").cast("double") / F.col("n").cast("double")
    ) / 100.0
    return picked.select(
        F.col("g").alias(group_col),
        "n",
        mean.alias("mean"),
        radius.alias("radius"),
        (mean - radius).alias("lo"),
        (mean + radius).alias("hi"),
    )


def chi2_residuals(docs: DataFrame) -> DataFrame:
    """Standardized-residual drill-down of the (source × lang)
    contingency — the cell-level answer to the question the scalar χ²
    drift gate raises: WHICH cells drive the signal.  Pearson residual
    r = (obs − exp)/√exp per grid cell, with the full source × lang
    grid materialized (absent cells matter: a language a source never
    produces is a −√exp residual, not a missing row).

    Exactness: obs, row totals, column totals and N are exact BIGINTs;
    exp = rt·ct/N is one pinned division of an exact BIGINT product
    (rt·ct < 2^62 for any corpus under 2^31 rows), and the residual is
    one pinned tree with the correctly-rounded sqrt.  The grid is a
    broadcast cross join of the two distinct key lists — #sources ×
    #langs rows, config grain.

    Output: (source, lang, n_obs, expected, residual).
    """
    base = spread(docs).select("source", "lang")
    obs = base.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    )
    rt = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("rt")
    )
    ct = base.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("ct")
    )
    n_row = base.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .join(obs, ["source", "lang"], "left")
        .crossJoin(F.broadcast(n_row))
        .select(
            "source",
            "lang",
            F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_obs"),
            "rt",
            "ct",
            "n",
        )
    )
    exp = (F.col("rt") * F.col("ct")).cast("double") / F.col("n").cast(
        "double"
    )
    return grid.select(
        "source",
        "lang",
        "n_obs",
        exp.alias("expected"),
        F.when(
            exp > 0.0,
            (F.col("n_obs").cast("double") - exp) / F.sqrt(exp),
        )
        .otherwise(F.lit(0.0))
        .alias("residual"),
    )


def hbos_outliers(orders: DataFrame, top_n: int = 20) -> DataFrame:
    """Histogram-based outlier score (HBOS) over three order features
    — the ln-free, training-free anomaly ranking that scales where
    isolation forests don't: score each row by the product of its
    per-feature bin frequencies (rarer bins ⇒ smaller product ⇒ more
    anomalous), the independence-assumption density estimate of
    Goldstein & Dengel's HBOS reduced to exact integers.

    Features: price bin (10 equi-width bins over the observed cents
    range — boundaries from a one-row broadcast min/max, assignment by
    exact integer division), order month (calendar), order priority
    (categorical).  The rarity denominator c_price·c_month·c_prio is
    an exact BIGINT (< n³); the surfaced score is one pinned division.
    Ranking is (product asc, orderkey) — a TakeOrdered heap, no global
    sort.

    Output: top ``top_n`` most anomalous orders:
    (o_orderkey, price_bin, month, priority, c_price, c_month,
    c_prio, rarity).
    """
    mm = orders.agg(
        F.min(F.floor(F.col("o_totalprice") * 100)).alias("mn"),
        F.max(F.floor(F.col("o_totalprice") * 100)).alias("mx"),
    )
    feats = (
        spread(orders)
        .crossJoin(F.broadcast(mm))
        .select(
            "o_orderkey",
            F.expr(
                "CAST(((CAST(floor(o_totalprice * 100) AS BIGINT) - mn)"
                " * 10) div (mx - mn + 1) AS INT)"
            ).alias("price_bin"),
            F.month("o_orderdate").cast("int").alias("month"),
            F.col("o_orderpriority").alias("priority"),
        )
    )
    c1 = feats.groupBy("price_bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_price")
    )
    c2 = feats.groupBy("month").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_month")
    )
    c3 = feats.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_prio")
    )
    scored = (
        feats.join(F.broadcast(c1), "price_bin")
        .join(F.broadcast(c2), "month")
        .join(F.broadcast(c3), "priority")
        .withColumn(
            # three counts each ≤ n multiply to n³ — BIGINT would wrap
            # past ~2M rows per bin, so the product is exact
            # DECIMAL(38,0) (HUGEINT in the oracle)
            "prod",
            (
                F.col("c_price").cast("decimal(19,0)")
                * F.col("c_month").cast("decimal(19,0)")
            ).cast("decimal(38,0)")
            * F.col("c_prio").cast("decimal(19,0)"),
        )
    )
    return (
        scored.orderBy(F.col("prod"), F.col("o_orderkey"))
        .limit(top_n)
        .select(
            "o_orderkey",
            "price_bin",
            "month",
            "priority",
            "c_price",
            "c_month",
            "c_prio",
            (F.lit(1.0) / F.col("prod").cast("double")).alias("rarity"),
        )
    )


def cliffs_delta(
    docs: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
) -> DataFrame:
    """Cliff's delta per group vs rest-of-corpus — the standardized
    ordinal EFFECT SIZE the Mann–Whitney test statistic lacks:
    ``δ = (#(x>y) − #(x<y)) / (n₁·n₂)`` ∈ [−1, 1], i.e. how much more
    often a group's values dominate the rest than the reverse
    (δ = 2·AUC − 1).  :func:`mwu_drift` answers "is there drift?";
    Cliff's δ answers "how big is it?" on a scale that survives any
    monotone value transform.

    Implementation IS the shared :func:`mwu_drift` machinery (one
    value-ordered cumsum per group, exact BIGINT/DECIMAL u2) plus the
    single pinned tree δ = 2·AUC − 1 — no second scan, no new shuffle
    shape.  Output: (group, n_group, n_rest, u2, delta).
    """
    u = mwu_drift(docs, group_col, value_col)
    return u.select(
        group_col,
        "n_group",
        "n_rest",
        "u2",
        (F.lit(2.0) * F.col("auc") - F.lit(1.0)).alias("delta"),
    )


def null_cooccurrence(lineitem: DataFrame) -> DataFrame:
    """Sentinel-missingness co-occurrence audit — the MCAR screen for
    columns where a placeholder value encodes "not recorded": for
    every pair of soft-missing flags, compare the JOINT missing rate
    against the independence expectation (lift = n_both·N /
    (n_a·n_b)); lift ≫ 1 means the columns go missing TOGETHER
    (an upstream-join or ingestion-path failure, not random noise).

    Flags (sentinel conventions on the trade fact): discount = 0
    ("no discount recorded"), tax = 0, returnflag = 'N' ("no return
    disposition").  Exactness: all four counts per pair are exact
    conditional BIGINTs from ONE scan (a 3-pair broadcast list ×
    conditional aggregates — no self-join), and lift is one pinned
    IEEE division tree.

    Output: (col_a, col_b, n_rows, n_a, n_b, n_both, lift), one row
    per unordered pair, ordered by (col_a, col_b).
    """
    flagged = lineitem.select(
        (F.col("l_discount") == 0).cast("int").alias("m_discount"),
        (F.col("l_tax") == 0).cast("int").alias("m_tax"),
        (F.col("l_returnflag") == "N").cast("int").alias("m_returnflag"),
    )
    agg = flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("m_discount").cast("bigint").alias("a_discount"),
        F.sum("m_tax").cast("bigint").alias("a_tax"),
        F.sum("m_returnflag").cast("bigint").alias("a_returnflag"),
        F.sum(F.col("m_discount") * F.col("m_tax"))
        .cast("bigint")
        .alias("b_discount_tax"),
        F.sum(F.col("m_discount") * F.col("m_returnflag"))
        .cast("bigint")
        .alias("b_discount_returnflag"),
        F.sum(F.col("m_tax") * F.col("m_returnflag"))
        .cast("bigint")
        .alias("b_tax_returnflag"),
    )
    pairs = agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("discount").alias("col_a"),
                    F.lit("returnflag").alias("col_b"),
                    F.col("n_rows"),
                    F.col("a_discount").alias("n_a"),
                    F.col("a_returnflag").alias("n_b"),
                    F.col("b_discount_returnflag").alias("n_both"),
                ),
                F.struct(
                    F.lit("discount").alias("col_a"),
                    F.lit("tax").alias("col_b"),
                    F.col("n_rows"),
                    F.col("a_discount").alias("n_a"),
                    F.col("a_tax").alias("n_b"),
                    F.col("b_discount_tax").alias("n_both"),
                ),
                F.struct(
                    F.lit("tax").alias("col_a"),
                    F.lit("returnflag").alias("col_b"),
                    F.col("n_rows"),
                    F.col("a_tax").alias("n_a"),
                    F.col("a_returnflag").alias("n_b"),
                    F.col("b_tax_returnflag").alias("n_both"),
                ),
            )
        ).alias("p")
    ).select("p.*")
    lift = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.col("n_both").cast("double")
        * F.col("n_rows").cast("double")
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
    ).otherwise(F.lit(0.0))
    return pairs.select(
        "col_a", "col_b", "n_rows", "n_a", "n_b", "n_both",
        lift.alias("lift"),
    ).orderBy("col_a", "col_b")


def partial_corr(lineitem: DataFrame) -> DataFrame:
    """Partial correlation r(quantity, price | discount): does quantity
    still track price once the discount's influence on both is held
    fixed?  ``r_xy.z = (r_xy − r_xz·r_yz) / sqrt((1−r_xz²)(1−r_yz²))``
    — the confounder-controlled sibling of plain Pearson, the standard
    first tool when a shared driver fakes (or masks) an association.

    Exactness: the three variables enter as exact integers (whole
    quantity units, price cents, discount basis points); all nine
    sufficient statistics (Σx, Σy, Σz, Σx², Σy², Σz², Σxy, Σxz, Σyz,
    plus n) accumulate exactly — squares/products as DECIMAL(38,0),
    the jarque_bera hi/lo 2⁶⁰ split converts anything above 2⁵³ to
    double engine-portably — and each pairwise r plus the partial
    composition is one pinned IEEE tree.

    Scale shape: ONE map-side-combined global aggregate; one row out:
    (n, r_xy, r_xz, r_yz, partial_r_xy_z); zero rows when empty or any
    marginal variance degenerates.
    """
    rows = lineitem.select(
        F.floor(F.col("l_quantity")).cast("bigint").alias("x"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
        F.floor(F.col("l_discount") * 10000).cast("bigint").alias("z"),
    )
    d = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    agg = rows.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("z").cast("bigint").alias("sz"),
        F.sum(d("x") * d("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(d("y") * d("y")).cast("decimal(38,0)").alias("syy"),
        F.sum(d("z") * d("z")).cast("decimal(38,0)").alias("szz"),
        F.sum(d("x") * d("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(d("x") * d("z")).cast("decimal(38,0)").alias("sxz"),
        F.sum(d("y") * d("z")).cast("decimal(38,0)").alias("syz"),
    )
    two60 = 1152921504606846976  # 2^60

    def big_dbl(col: str):
        hi = F.expr(f"{col} div {two60}").cast("double")
        lo = F.expr(f"CAST({col} % {two60} AS BIGINT)").cast("double")
        return hi * F.lit(float(two60)) + lo

    n = F.col("n").cast("double")

    def r_of(spq, sp, sq, spp, sqq):
        cov = big_dbl(spq) - F.col(sp).cast("double") * F.col(sq).cast(
            "double"
        ) / n
        vp = big_dbl(spp) - F.col(sp).cast("double") * F.col(sp).cast(
            "double"
        ) / n
        vq = big_dbl(sqq) - F.col(sq).cast("double") * F.col(sq).cast(
            "double"
        ) / n
        return cov / F.sqrt(vp * vq)

    r_xy = r_of("sxy", "sx", "sy", "sxx", "syy")
    r_xz = r_of("sxz", "sx", "sz", "sxx", "szz")
    r_yz = r_of("syz", "sy", "sz", "syy", "szz")
    pr = (r_xy - r_xz * r_yz) / F.sqrt(
        (F.lit(1.0) - r_xz * r_xz) * (F.lit(1.0) - r_yz * r_yz)
    )
    vx = big_dbl("sxx") - F.col("sx").cast("double") * F.col("sx").cast(
        "double"
    ) / n
    vy = big_dbl("syy") - F.col("sy").cast("double") * F.col("sy").cast(
        "double"
    ) / n
    vz = big_dbl("szz") - F.col("sz").cast("double") * F.col("sz").cast(
        "double"
    ) / n
    return agg.select(
        "n",
        r_xy.alias("r_xy"),
        r_xz.alias("r_xz"),
        r_yz.alias("r_yz"),
        pr.alias("partial_r_xy_z"),
    ).filter(
        (F.col("n") > 1) & (vx > 0.0) & (vy > 0.0) & (vz > 0.0)
    )


def ordinal_association(lineitem: DataFrame) -> DataFrame:
    """Goodman-Kruskal γ and Somers' d_yx between two ORDINAL business
    dimensions — quantity decile bucket (x) vs discount level (y):
    cramers_v answers nominal association; these answer "do higher
    quantities come with higher discounts?" with a SIGNED, ordered
    measure built from concordant/discordant pair counts.

    ``γ = (C−D)/(C+D)``;  ``d_yx = (C−D)/(C+D+T_y)`` where T_y counts
    pairs tied on y only (the asymmetric version that treats y as the
    response).  C, D, T_y enumerate over the CONTINGENCY CELLS, never
    the rows: with a and b the cell coordinates and n_ab the exact
    counts, concordance is a join of the k² cells against themselves
    (k ≤ ~70 here — config-grain, broadcast) — the standard way these
    statistics stay computable when n is 10¹¹ but the grid is tiny.

    Exactness: all pair counts are exact BIGINTs (cell products summed
    once per ordered cell pair class); each measure is one IEEE
    division.  Output one row: (n_rows, c_pairs, d_pairs, ties_y,
    gamma, somers_dyx); zero rows when empty, 0.0 measures when C+D=0.
    """
    cells = (
        lineitem.select(
            # integer div, not /10-then-cast: double->int casts truncate
            # in Spark but round in DuckDB — div agrees everywhere
            F.expr("CAST(floor(l_quantity) AS BIGINT) div 10").alias("a"),
            F.floor(F.col("l_discount") * 100).cast("bigint").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    left = cells.select(
        F.col("a").alias("a1"), F.col("b").alias("b1"),
        F.col("cnt").alias("n1"),
    )
    right = cells.select(
        F.col("a").alias("a2"), F.col("b").alias("b2"),
        F.col("cnt").alias("n2"),
    )
    pairs = left.join(
        F.broadcast(right), F.col("a2") > F.col("a1"), "inner"
    ).select(
        (F.col("n1") * F.col("n2")).alias("p"),
        F.when(F.col("b2") > F.col("b1"), F.lit("c"))
        .when(F.col("b2") < F.col("b1"), F.lit("d"))
        .otherwise(F.lit("t"))
        .alias("kind"),
    )
    counts = pairs.groupBy("kind").agg(F.sum("p").cast("bigint").alias("v"))
    folded = counts.agg(
        F.sum(F.when(F.col("kind") == "c", F.col("v")).otherwise(0))
        .cast("bigint")
        .alias("c_pairs"),
        F.sum(F.when(F.col("kind") == "d", F.col("v")).otherwise(0))
        .cast("bigint")
        .alias("d_pairs"),
        F.sum(F.when(F.col("kind") == "t", F.col("v")).otherwise(0))
        .cast("bigint")
        .alias("ties_y"),
    )
    tot = cells.agg(F.sum("cnt").cast("bigint").alias("n_rows"))
    out = folded.crossJoin(tot)
    c = F.col("c_pairs").cast("double")
    dd = F.col("d_pairs").cast("double")
    ty = F.col("ties_y").cast("double")
    return out.select(
        "n_rows",
        "c_pairs",
        "d_pairs",
        "ties_y",
        F.when(F.col("c_pairs") + F.col("d_pairs") > 0, (c - dd) / (c + dd))
        .otherwise(F.lit(0.0))
        .alias("gamma"),
        F.when(
            F.col("c_pairs") + F.col("d_pairs") + F.col("ties_y") > 0,
            (c - dd) / (c + dd + ty),
        )
        .otherwise(F.lit(0.0))
        .alias("somers_dyx"),
    ).filter(F.col("n_rows") > 0)


def hellinger_drift(docs: DataFrame) -> DataFrame:
    """Per-source Hellinger distance between the source's language
    distribution and the REST of the corpus — the bounded, symmetric,
    ln-free drift metric (``H² = ½·Σ(√p−√q)²``, H ∈ [0,1]) that sits
    between tvd_drift (no curvature near 0) and the KL family (needs
    ln, which has no cross-engine bit contract; sqrt is IEEE-exact).

    Exactness: cell counts are exact BIGINTs on the (source × lang)
    grid COMPLETED with zero cells (a language absent from one side
    still contributes to H); each probability is one IEEE division
    and the Σ folds over the LANG-SORTED array (the logrank cross-
    group device), so both engines add identical doubles in identical
    order; H = sqrt(H²·½) as the final pinned step.

    Output: (source, n_docs, n_langs, hellinger), one row per source.
    """
    cells = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    langs = cells.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("lang_tot")
    )
    srcs = cells.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_docs")
    )
    grand = cells.agg(F.sum("c").cast("bigint").alias("n_all"))
    # complete grid: every (source, lang), zero-filled
    grid = (
        srcs.crossJoin(langs)
        .join(cells, ["source", "lang"], "left")
        .crossJoin(F.broadcast(grand))
        .select(
            "source",
            "lang",
            "n_docs",
            "n_all",
            F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("c"),
            "lang_tot",
        )
    )
    folded = (
        # a single-source corpus has no "rest" side: drop it (zero rows)
        grid.filter(F.col("n_all") > F.col("n_docs"))
        .groupBy("source", "n_docs")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_langs"),
            F.array_sort(
                F.collect_list(
                    F.struct("lang", "c", "lang_tot", "n_docs", "n_all")
                )
            ).alias("gs"),
        )
        .withColumn(
            "h2",
            F.aggregate(
                F.col("gs").alias("gs"),
                F.lit(0.0),
                lambda acc, x: acc
                + (
                    F.sqrt(
                        x["c"].cast("double") / x["n_docs"].cast("double")
                    )
                    - F.sqrt(
                        (x["lang_tot"] - x["c"]).cast("double")
                        / (x["n_all"] - x["n_docs"]).cast("double")
                    )
                )
                * (
                    F.sqrt(
                        x["c"].cast("double") / x["n_docs"].cast("double")
                    )
                    - F.sqrt(
                        (x["lang_tot"] - x["c"]).cast("double")
                        / (x["n_all"] - x["n_docs"]).cast("double")
                    )
                ),
            ),
        )
    )
    return folded.select(
        "source",
        "n_docs",
        "n_langs",
        F.sqrt(F.col("h2") * F.lit(0.5)).alias("hellinger"),
    ).orderBy("source")


def staleness_audit(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Data-freshness / volume-drop audit per stream: when did each
    group last produce an event, how stale is it against the corpus
    frontier, and did its trailing-week volume fall off a cliff vs the
    week before — the first dashboard an ingestion on-call opens, and
    the batch face of the out-of-order audit (ooo_rate asks "is the
    stream late?"; this asks "did it STOP?").

    Exactness: day-grain integer arithmetic against the one-row global
    frontier (broadcast); counts exact BIGINTs; the week-over-week
    ratio is one IEEE division (−1.0 sentinel when the prior week is
    empty).  Output: (group, n_events, last_day, days_stale,
    last7_cnt, prior7_cnt, wow_ratio).
    """
    rows = events.select(
        F.col(group_col).alias("g"), F.to_date("ts").alias("d")
    )
    frontier = rows.agg(F.max("d").alias("fmax"))
    tagged = rows.crossJoin(F.broadcast(frontier))
    per_g = tagged.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("d").alias("last_day"),
        F.max("fmax").alias("fmax"),
        F.sum(
            (F.datediff(F.col("fmax"), F.col("d")) < 7).cast("bigint")
        )
        .cast("bigint")
        .alias("last7_cnt"),
        F.sum(
            (
                (F.datediff(F.col("fmax"), F.col("d")) >= 7)
                & (F.datediff(F.col("fmax"), F.col("d")) < 14)
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("prior7_cnt"),
    )
    return per_g.select(
        F.col("g").alias(group_col),
        "n_events",
        F.date_format("last_day", "yyyy-MM-dd").alias("last_day"),
        F.datediff(F.col("fmax"), F.col("last_day"))
        .cast("bigint")
        .alias("days_stale"),
        "last7_cnt",
        "prior7_cnt",
        F.when(
            F.col("prior7_cnt") > 0,
            F.col("last7_cnt").cast("double")
            / F.col("prior7_cnt").cast("double"),
        )
        .otherwise(F.lit(-1.0))
        .alias("wow_ratio"),
    ).orderBy(group_col)
