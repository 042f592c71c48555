"""Batch MERGE / upsert — applying a change batch to a keyed table.

The reference's storage plane is immutable puts (SURVEY.md §2.1 S2:
store + finish-store); the warehouse counterpart every pipeline needs is
MERGE: apply a batch of upserts (CDC rows, corrections, late records) to
a keyed target.  Spark has no MERGE outside Delta/Iceberg, but the
whole-row-replace case folds into plain relational algebra:

    merged = updates ∪ (target ⟕anti updates)

which is ONE anti join (shuffle on the key, update side is usually small
→ broadcast) plus a zero-shuffle union — strictly narrower than the
textbook full-outer-join formulation, which shuffles BOTH full tables
and rebuilds every row through a coalesce projection.  The full-outer
path is still the right tool when updates carry partial columns; it is
provided as ``merge_patch``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Whole-row upsert: rows from ``updates`` win on key match, other
    ``target`` rows pass through, unmatched update rows insert.

    Plan: LEFT ANTI join on the keys (the only shuffle — and Catalyst
    broadcasts the update side when it is small) + union.  The target
    never passes through a wide outer join, so at 100 TB the cost is one
    key-shuffle of the target (or none, if the anti side broadcasts),
    not a rebuild of every row.
    """
    survivors = target.join(updates, on=list(keys), how="left_anti")
    return updates.unionByName(survivors)


def merge_patch(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Partial-column merge: ``updates`` may carry NULLs meaning "keep
    the target's value" — the classic COALESCE-over-full-outer MERGE.
    Use only when updates are genuinely partial; for whole-row batches
    :func:`merge_upsert`'s anti-join plan is strictly cheaper.
    """
    t, u = target.alias("t"), updates.alias("u")
    cond = [t[k].eqNullSafe(u[k]) for k in keys]
    cols = [F.coalesce(u[c], t[c]).alias(c) for c in target.columns]
    return t.join(u, cond, "full_outer").select(*cols)


def table_diff(
    a: DataFrame, b: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Keyed reconciliation of two snapshots: one row per key with
    ``status ∈ {added, removed, changed, same}`` (b relative to a).

    The anti-entropy sweep every CDC/merge pipeline needs to audit
    itself: one full-outer join on the keys (the only shuffle), presence
    flags instead of null-probing the key columns (a legitimate NULL key
    would otherwise masquerade as absence), and a null-safe
    all-columns-equal conjunction that Catalyst folds into codegen — no
    row serialization, no Python.  At 100 TB both sides shuffle once on
    the key; comparing hashes instead of columns would halve the width
    but ties the result to an engine-specific hash — columns keep the
    operator oracle-checkable.
    """
    vals = [c for c in a.columns if c not in keys]
    aa = a.select(
        *[F.col(k).alias(f"ka_{k}") for k in keys],
        *[F.col(c).alias(f"va_{c}") for c in vals],
        F.lit(1).alias("_pa"),
    )
    bb = b.select(
        *[F.col(k).alias(f"kb_{k}") for k in keys],
        *[F.col(c).alias(f"vb_{c}") for c in vals],
        F.lit(1).alias("_pb"),
    )
    cond = None
    for k in keys:
        c = aa[f"ka_{k}"].eqNullSafe(bb[f"kb_{k}"])
        cond = c if cond is None else cond & c
    same = F.lit(True)
    for c in vals:
        same = same & aa[f"va_{c}"].eqNullSafe(bb[f"vb_{c}"])
    status = (
        F.when(F.col("_pa").isNull(), F.lit("added"))
        .when(F.col("_pb").isNull(), F.lit("removed"))
        .when(same, F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    return aa.join(bb, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"ka_{k}"), F.col(f"kb_{k}")).alias(k)
            for k in keys
        ],
        status.alias("status"),
    )


def agg_state(df: DataFrame, keys: Sequence[str], value_col: str) -> DataFrame:
    """Per-key mergeable aggregate state: ``(n_rows, sum_state, min_v,
    max_v)`` with the sum kept as an EXACT decimal — the materialized
    partial an incremental pipeline stores per partition/day and folds
    with :func:`merge_agg_states` instead of rescanning history.

    The state carries the decimal, not the surfaced double: decimal sums
    are associative, so merging states is exactly the aggregate over the
    union — the algebraic property that makes incremental maintenance
    correct at all (a double-typed state would drift per merge order).
    """
    dec = F.col(value_col).cast("decimal(18,2)")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dec).alias("sum_state"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_agg_states(a: DataFrame, b: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Fold two aggregate states: count/sum add, min/max combine — one
    shuffle on the key grain (state rows, not fact rows).  At 100 TB the
    base state is millions of rows where the fact table is billions;
    applying a delta costs the DELTA's aggregation plus this state-grain
    merge, never a rescan of the base."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("sum_state").alias("sum_state"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def finalize_agg_state(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Surface a state as the engine-neutral result schema: exact sum as
    double, mean as one IEEE division (the dsum/davg protocol)."""
    return state.select(
        *keys,
        "n_rows",
        F.col("sum_state").cast("double").alias("sum_v"),
        (F.col("sum_state").cast("double") / F.col("n_rows")).alias("avg_v"),
        "min_v",
        "max_v",
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    effective: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 apply: fold a batch of new
    attribute values into a versioned history table, closing the current
    version of every key whose TRACKED attributes actually changed and
    appending the new version — the warehouse-side CDC pattern that
    :func:`merge_upsert` (type-1, overwrite-in-place) deliberately
    discards.

    ``history`` carries ``keys + attrs + valid_from + valid_to``
    (``valid_to IS NULL`` == current); ``updates`` carries
    ``keys + attrs``.  No-op updates (tracked attributes null-safe-equal
    to the current version) are DROPPED, not re-versioned — re-appending
    unchanged rows is the classic SCD2 bug that bloats history linearly
    in batch count.

    Plan shape: ONE equi join of updates against the current slice to
    elect real changes (Catalyst broadcasts the batch side when small —
    the common CDC case), then one more join of history against the
    elected key set to stamp ``valid_to``, then a union with the new
    versions.  The history table itself is never windowed or outer-
    rebuilt; at 100 TB the cost is two key-hash passes, each prunable to
    the ``valid_to IS NULL`` slice by partition layout.

    Reference seed: none (the reference's files are immutable puts,
    S2/manager.go:385-429; versioning is an extension).
    """
    ks = list(keys)
    cur = history.filter(F.col("valid_to").isNull())
    differs = None
    for c in tracked:
        d = ~F.col(f"u.{c}").eqNullSafe(F.col(f"c.{c}"))
        differs = d if differs is None else (differs | d)
    changed = (
        updates.alias("u")
        .join(cur.alias("c"), ks, "inner")
        .filter(differs)
        .select("u.*")
    )
    changed_keys = changed.select(*ks).distinct()
    closer = changed_keys.withColumn("__close", F.lit(True))
    stamped = (
        history.join(F.broadcast(closer), ks, "left")
        .withColumn(
            "valid_to",
            F.when(
                F.col("__close").isNotNull() & F.col("valid_to").isNull(),
                F.lit(effective),
            ).otherwise(F.col("valid_to")),
        )
        .drop("__close")
    )
    new_rows = changed.withColumn("valid_from", F.lit(effective)).withColumn(
        "valid_to", F.lit(None).cast("string")
    )
    return stamped.unionByName(new_rows.select(*stamped.columns))


def compact_changelog(
    log: DataFrame,
    keys: Sequence[str],
    version_col: str = "version",
    op_col: str = "op",
) -> DataFrame:
    """CDC log compaction: collapse an upsert/delete changelog to the
    latest surviving row per key — what a table format's compaction job
    (or a Kafka compacted topic) computes.  Rows carry ``keys + payload
    + version + op`` with ``op ∈ {'upsert', 'delete'}``; the output is
    the highest-version row per key, dropped entirely if that row is a
    delete (tombstone).  Ties on version resolve delete-wins, making the
    result a pure function of the SET of log records — replays and
    duplicated deliveries cannot change it.

    ONE key-shuffle (the row_number window); the payload never joins
    against anything.  At 100 TB this is the standard
    shuffle-by-key-and-keep-first compaction pass — partition pruning on
    a version/time prefix bounds how much log each run rereads.

    Reference seed: the reference's files are immutable whole-key puts
    with delete (manager.go:328-350) — version folding is extension
    surface.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(),
        # delete-wins on version ties: 'upsert' > 'delete' lexically, so
        # ascending op puts delete first
        F.col(op_col).asc(),
    )
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != "delete"))
        .drop("__rn")
    )


def scd2_as_of(history: DataFrame, as_of: str) -> DataFrame:
    """Time-travel read over an SCD2 history: the version of every key
    in force at ``as_of`` — ``valid_from <= as_of < valid_to`` with an
    open (NULL) ``valid_to`` meaning "still current".  A pure filter:
    zero shuffles, and with the history partitioned by ``valid_to``
    month the scan prunes to segments overlapping the target date.
    Composes with :func:`scd2_apply` (pytest: as-of BEFORE an applied
    batch's effective date reads the pre-batch attributes verbatim).
    """
    return history.filter(
        (F.col("valid_from") <= F.lit(as_of))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(as_of)))
    )


def join_view_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    a_key: str,
    b_key: str,
) -> DataFrame:
    """Incremental view maintenance for a JOIN view (insert-only
    deltas): for ``V = A ⋈ B``, the new rows are exactly

        ΔV = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    — the classic delta-join algebra (Blakeley et al., SIGMOD'86;
    every streaming/materialized-view engine's join operator).  The
    companion of :func:`agg_state`/:func:`merge_agg_states`, which
    maintain aggregation views; this maintains the join itself.

    Scale design: the expensive ``A_old ⋈ B_old`` term is NEVER
    recomputed — that is the whole point.  Each delta term is a hash
    join whose probe side is delta-sized (broadcast-eligible when the
    batch is small); at 100 TB with a 1 GB delta, maintenance cost is
    three delta-grain joins instead of one full re-join.  The three
    terms are disjoint by construction (old/delta provenance), so the
    union needs no dedup.

    Returns ΔV with A's columns then B's (unionByName across terms).

    Reference parity: none (warehouse extension, SURVEY.md §2.3);
    composes the reference's M3 hash-partition joins at delta grain.
    """
    cond_old_b = a_delta[a_key] == b_old[b_key]
    cond_old_a = a_old[a_key] == b_delta[b_key]
    cond_dd = a_delta[a_key] == b_delta[b_key]
    d1 = a_delta.join(b_old, cond_old_b)
    d2 = a_old.join(b_delta, cond_old_a)
    d3 = a_delta.join(b_delta, cond_dd)
    return d1.unionByName(d2).unionByName(d3)


def column_churn(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
    cols: Sequence[str],
) -> DataFrame:
    """Per-COLUMN churn profile between two snapshots: over keys present
    in both, how many rows changed each column — the question after
    :func:`table_diff`'s row-level added/removed/changed triage
    ("WHICH columns drive the churn?") that decides CDC payload
    slimming, column-level TTLs, and incremental-view maintenance
    scope.

    One inner join on the key (hash, key-grain) with both sides
    column-pruned to ``keys + cols``; each column's change flag is a
    null-safe inequality (``NOT a <=> b`` — a NULL→value transition
    counts, NULL→NULL does not), and all flags collapse in ONE
    map-side-combined aggregate — #cols counters, never #cols passes.
    ``churn_ppm`` is floor-quantized exact integer.

    Returns one row per audited column: ``(column, n_matched,
    n_changed, churn_ppm)``.

    Reference parity: none (CDC extension, SURVEY.md §2.3); the join
    is the reference's M3 hash-partition at key grain.
    """
    sel = list(keys) + list(cols)
    left = a.select(*sel)
    right = b.select(
        *[F.col(k).alias(f"_bk_{k}") for k in keys],
        *[F.col(c).alias(f"_b_{c}") for c in cols],
    )
    cond = None
    for k in keys:
        eq = left[k] == right[f"_bk_{k}"]
        cond = eq if cond is None else (cond & eq)
    joined = left.join(right, cond)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_matched")]
    for c in cols:
        aggs.append(
            F.sum(
                F.when(~F.col(c).eqNullSafe(F.col(f"_b_{c}")), 1).otherwise(0)
            )
            .cast("bigint")
            .alias(f"chg_{c}")
        )
    one = joined.agg(*aggs)
    stack_args = ", ".join(f"'{c}', chg_{c}" for c in cols)
    return one.select(
        F.expr(f"stack({len(cols)}, {stack_args}) AS (column, n_changed)"),
        "n_matched",
    ).select(
        "column",
        "n_matched",
        "n_changed",
        F.expr(
            "cast(case when n_matched > 0"
            " then (n_changed * 1000000) div n_matched"
            " else 0 end as bigint)"
        ).alias("churn_ppm"),
    )
