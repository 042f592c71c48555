"""Streaming sinks.

``writeStream.foreachBatch`` is the escape hatch for sinks Spark has no
native connector for (JDBC upserts, vector stores, feature stores).  The
pattern that keeps it exactly-once: make each micro-batch write IDEMPOTENT
on (sink, batch_id) — a replayed batch (possible after any failure between
sink commit and checkpoint commit) then overwrites its own previous
output instead of duplicating it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def windowed_upsert_sink(
    agg_stream: DataFrame, path: str, checkpoint: str, partition_col: str
):
    """Materialized windowed aggregate with UPSERT semantics and no
    external table format: each micro-batch rewrites ONLY the hive
    partitions (e.g. window buckets) it touched, via dynamic partition
    overwrite.  Late data that updates an old bucket overwrites that
    bucket's partition with the new totals — readers always see complete
    buckets, replays are idempotent (same bucket → same content), and
    untouched history is never rewritten.  This is the foreachBatch
    answer to "streaming MERGE INTO" when Delta/Iceberg isn't available;
    the update-mode output stream supplies exactly the changed buckets.

    Requires a deterministic ``partition_col`` that is the FULL group key
    of the aggregate: update mode emits only changed rows, so if a
    partition held multiple groups a rewrite would drop the unchanged
    siblings.  One bucket == one group == one partition.  Returns the
    started query."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                df.write.mode("overwrite")
                .partitionBy(partition_col)
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)

    return (
        agg_stream.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def parquet_batch_sink(stream_df: DataFrame, path: str, checkpoint: str):
    """File sink via foreachBatch where every micro-batch owns the
    ``batch_id=N`` directory: replays overwrite, never duplicate.  (The
    native parquet sink has its own log-based exactly-once; this is the
    TEMPLATE for sinks that don't — swap the body for the JDBC/vector
    upsert keyed on batch_id.)  Returns the started query."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def _list_state_versions(spark, path: str) -> list[int]:
    """Committed state versions under ``path`` (``v=<batch_id>`` dirs),
    via the Hadoop FileSystem API so the same code works on local disk,
    HDFS, or an object store."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("v="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def fold_state_batch(
    df: DataFrame, batch_id: int, path: str, keys, value_col: str
) -> None:
    """One micro-batch of incremental aggregate maintenance: aggregate
    the batch to state grain (``operators/merge.agg_state``), fold it
    into the latest state version BELOW this batch_id, and write the
    result as ``v=<batch_id>``.

    Replay-idempotent by construction: a replayed batch re-reads the
    same predecessor version and OVERWRITES its own ``v=`` directory —
    folding twice is impossible because the predecessor lookup is
    ``max(v) where v < batch_id``, never "the latest".  Older versions
    (< predecessor) are pruned after the commit.  Cost per batch is the
    DELTA's aggregation plus a state-grain merge — the streaming face of
    the incremental_agg contract, never a rescan of history."""
    from p2_mapreduce_spark.operators.merge import agg_state, merge_agg_states

    spark = df.sparkSession
    delta = agg_state(df, keys, value_col)
    versions = _list_state_versions(spark, path)
    prev = [v for v in versions if v < batch_id]
    if prev:
        base = spark.read.parquet(f"{path}/v={max(prev)}")
        new = merge_agg_states(base, delta, keys)
    else:
        new = delta
    new.write.mode("overwrite").parquet(f"{path}/v={batch_id}")
    # retain the predecessor (replay safety for THIS batch) and prune
    # everything older
    if prev:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        for v in prev[:-1]:
            p = jvm.org.apache.hadoop.fs.Path(f"{path}/v={v}")
            p.getFileSystem(conf).delete(p, True)


def incremental_state_sink(
    stream_df: DataFrame, path: str, checkpoint: str, keys, value_col: str
):
    """Streaming incremental view maintenance: every micro-batch folds
    into a persisted mergeable aggregate state (exact-decimal sums, so
    state-after-stream == direct aggregate over all data, bit-for-bit —
    pinned in pytest).  Readers pick up the latest ``v=`` version with
    :func:`load_latest_state` and surface it via
    ``operators/merge.finalize_agg_state``."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        fold_state_batch(df, batch_id, path, keys, value_col)

    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def load_latest_state(spark, path: str) -> DataFrame:
    """Read the newest committed state version."""
    versions = _list_state_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no state versions under {path}")
    return spark.read.parquet(f"{path}/v={versions[-1]}")


def fold_changelog_batch(
    df: DataFrame, batch_id: int, path: str, keys, version_col="version",
    op_col="op",
) -> None:
    """One micro-batch of streaming CDC apply: compact the batch's
    changelog records against the latest persisted state version and
    write ``v=<batch_id>`` — the streaming face of
    ``operators/merge.compact_changelog``.

    The state retains TOMBSTONES (a delete must keep beating
    late-arriving lower-version upserts in future batches), so the fold
    is "keep latest record per key, delete-wins on ties" over
    state ∪ batch; :func:`load_compacted` applies the tombstone filter
    at read time.  Same ``max(v) < batch_id`` predecessor rule as
    :func:`fold_state_batch` — replays overwrite their own version,
    never double-fold."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = df.sparkSession
    versions = _list_state_versions(spark, path)
    prev = [v for v in versions if v < batch_id]
    merged = df
    if prev:
        merged = spark.read.parquet(f"{path}/v={max(prev)}").unionByName(df)
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col(op_col).asc()
    )
    new = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    new.write.mode("overwrite").parquet(f"{path}/v={batch_id}")
    if prev:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        for v in prev[:-1]:
            p = jvm.org.apache.hadoop.fs.Path(f"{path}/v={v}")
            p.getFileSystem(conf).delete(p, True)


def changelog_stream_sink(
    stream_df: DataFrame, path: str, checkpoint: str, keys,
    version_col="version", op_col="op",
):
    """Streaming CDC apply: a changelog stream (upserts + deletes with
    versions) continuously folds into a compacted table state.  After
    any prefix of micro-batches, ``load_compacted`` equals batch
    ``compact_changelog`` over the same records — pinned in pytest —
    because the fold is associative: latest-record-per-key over
    (state ∪ batch) == latest over all records seen."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        fold_changelog_batch(df, batch_id, path, keys, version_col, op_col)

    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def load_compacted(spark, path: str, op_col: str = "op") -> DataFrame:
    """Read face of the streaming CDC state: newest version, tombstones
    dropped."""
    from pyspark.sql import functions as F

    return load_latest_state(spark, path).filter(F.col(op_col) != "delete")


def dedup_ingest_sink(
    docs_stream: DataFrame,
    table_path: str,
    index_root: str,
    checkpoint: str,
    threshold: float = 0.5,
):
    """Online near-dup-free ingest: each micro-batch of documents is
    checked against the PERSISTED LSH index
    (operators/dedup.save_lsh_index) and only novel documents — no
    near-dup in the accepted corpus at ``jaccard >= threshold``, nor
    among earlier docs of the same batch — are appended; the index
    grows by exactly the accepted docs' artifacts.

    This composes the engine's existing contracts rather than inventing
    a new one: candidate generation is minhash_lsh_incremental's
    cross-side band join against the loaded index (corpus artifacts are
    read, never recomputed — the write-once property save_lsh_index
    exists for), within-batch dups fall to minhash_lsh_pairs on the
    batch alone (batch-sized, cheap), and the append is idempotent on
    batch_id (``b=<id>`` subdirs + overwrite) so replays cannot
    double-ingest.  At 100 TB the per-batch cost is the batch's own
    artifacts + pruned band probes — independent of corpus size.
    """
    from pyspark.sql import functions as F

    from p2_mapreduce_spark.operators.dedup import (
        build_lsh_artifacts,
        load_lsh_index,
        minhash_lsh_incremental,
        minhash_lsh_pairs,
    )

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.persist()
        try:
            if not batch.head(1):
                return
            raw = load_lsh_index(spark, index_root)
            # per-batch ``b=<id>`` appends surface as a partition column;
            # project back to the canonical artifact schemas so the
            # incremental path's unions line up
            index = (
                raw[0].select("doc", "h"),
                raw[1].select("doc", "n_shingles"),
                raw[2].select("doc", "band", "band_hash"),
            )
            cross = minhash_lsh_incremental(
                batch, threshold=threshold, corpus_index=index
            )
            batch_ids = batch.select("doc_id")
            dup_vs_corpus = (
                cross.select(F.col("doc_a").alias("doc_id"))
                .union(cross.select(F.col("doc_b").alias("doc_id")))
                .join(batch_ids, "doc_id", "left_semi")
            )
            within = minhash_lsh_pairs(batch, threshold=threshold)
            # keep the smaller id of an intra-batch pair, drop the larger
            dup_within = within.select(F.col("doc_b").alias("doc_id"))
            accepted = (
                batch.join(dup_vs_corpus.distinct(), "doc_id", "left_anti")
                .join(dup_within.distinct(), "doc_id", "left_anti")
                .persist()
            )
            (
                accepted.write.mode("overwrite")
                .parquet(f"{table_path}/b={batch_id}")
            )
            hs, sizes, bands = build_lsh_artifacts(accepted)
            # index growth is idempotent the same way the data append is:
            # each batch OWNS its b=<id> subdir, replays overwrite it
            hs.write.mode("overwrite").parquet(
                f"{index_root}/shingles/b={batch_id}"
            )
            sizes.write.mode("overwrite").parquet(
                f"{index_root}/sizes/b={batch_id}"
            )
            bands.write.mode("overwrite").partitionBy("band").parquet(
                f"{index_root}/bands/b={batch_id}"
            )
        finally:
            batch.unpersist()

    return (
        docs_stream.writeStream.option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )


def seed_dedup_index(docs: DataFrame, index_root: str) -> None:
    """Initialize a :func:`dedup_ingest_sink` index from an existing
    (already-deduped) corpus, using the sink's own ``b=<id>`` layout
    (b=-1 = the seed) so partition discovery stays uniform as batches
    append their subdirs."""
    from p2_mapreduce_spark.operators.dedup import build_lsh_artifacts

    hs, sizes, bands = build_lsh_artifacts(docs)
    hs.write.mode("overwrite").parquet(f"{index_root}/shingles/b=-1")
    sizes.write.mode("overwrite").parquet(f"{index_root}/sizes/b=-1")
    bands.write.mode("overwrite").partitionBy("band").parquet(
        f"{index_root}/bands/b=-1"
    )


def _fold_versioned(spark, delta: DataFrame, batch_id: int, path: str, merge_fn):
    """Shared skeleton of the versioned replay-idempotent fold (the
    fold_state_batch protocol): merge ``delta`` into the newest state
    version BELOW ``batch_id``, overwrite ``v=<batch_id>``, prune all
    but the predecessor."""
    versions = _list_state_versions(spark, path)
    prev = [v for v in versions if v < batch_id]
    if prev:
        base = spark.read.parquet(f"{path}/v={max(prev)}")
        new = merge_fn(base, delta)
    else:
        new = delta
    new.write.mode("overwrite").parquet(f"{path}/v={batch_id}")
    if prev:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        for v in prev[:-1]:
            p = jvm.org.apache.hadoop.fs.Path(f"{path}/v={v}")
            p.getFileSystem(conf).delete(p, True)


def hist_state_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    value_col: str = "value",
    group_cols=("event_type",),
    lo_c: int = 0,
    hi_c: int = 50_000,
    n_buckets: int = 500,
):
    """Streaming QUANTILE-SKETCH maintenance: each micro-batch's
    :func:`~p2_mapreduce_spark.operators.profile.hist_state` folds into
    the persisted state by the associative SUM merge
    (``merge_hist_states``), so the live state always equals the batch
    sketch over all data seen — bit-for-bit, pinned in pytest — and any
    percentile question is answered from the ≤ groups × n_buckets state
    via ``hist_quantiles`` without rescanning history.  This is the
    live tail of ``rolling_median_sketch``'s 100 TB design: daily batch
    states + this stream state merge into one CDF.

    Same versioned replay-idempotent fold protocol as
    :func:`incremental_state_sink` (predecessor = max version < this
    batch_id, overwrite-own-version, prune older)."""
    from p2_mapreduce_spark.operators.profile import hist_state, merge_hist_states

    cols = list(group_cols)

    def write_batch(df: DataFrame, batch_id: int) -> None:
        delta = hist_state(df, value_col, cols, lo_c, hi_c, n_buckets)
        _fold_versioned(df.sparkSession, delta, batch_id, path, merge_hist_states)

    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def cms_state_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
):
    """Streaming HEAVY-HITTER sketch maintenance: each micro-batch's
    Count-Min state (``text_analysis.cms_state``) folds into the
    persisted state by the associative bucket SUM — CMS is a linear
    sketch, so the live state always equals the batch sketch over all
    data seen, bit-for-bit (pinned in pytest), and any token-frequency
    point query answers from the ≤ depth×width state via ``cms_query``
    without rescanning history.  The streaming twin of the
    ``heavy_hitters`` batch operator, same versioned replay-idempotent
    fold protocol as :func:`hist_state_sink`."""
    from p2_mapreduce_spark.operators.text_analysis import (
        cms_state,
        merge_cms_states,
    )

    def write_batch(df: DataFrame, batch_id: int) -> None:
        delta = cms_state(df, depth, width, text_col)
        _fold_versioned(df.sparkSession, delta, batch_id, path, merge_cms_states)

    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def drift_state_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    group_col: str = "source",
    cat_col: str = "lang",
):
    """Streaming DRIFT-MONITOR maintenance: each micro-batch's
    (group × category) contingency counts fold into the persisted state
    by the associative SUM — counts are a linear state, so the live
    contingency always equals the batch contingency over all data seen
    (bit-for-bit, pinned in pytest), and
    :func:`~p2_mapreduce_spark.operators.profile.tvd_drift`'s
    group-vs-rest TVD (or chi2_drift's χ²) is answerable from the
    vocabulary-grain state at any moment without rescanning history —
    the live face of the drift family, which is exactly how production
    data-quality monitors run (batch profiles seed the state, the
    stream keeps it current, alerts read the state).

    Same versioned replay-idempotent fold protocol as
    :func:`hist_state_sink` / :func:`cms_state_sink`."""
    from pyspark.sql import functions as F

    def merge_counts(a: DataFrame, b: DataFrame) -> DataFrame:
        return (
            a.unionByName(b)
            .groupBy(group_col, cat_col)
            .agg(F.sum("n").alias("n"))
        )

    def write_batch(df: DataFrame, batch_id: int) -> None:
        delta = df.groupBy(group_col, cat_col).agg(
            F.count(F.lit(1)).alias("n")
        )
        _fold_versioned(df.sparkSession, delta, batch_id, path, merge_counts)

    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def tvd_from_state(
    state: DataFrame, group_col: str = "source", cat_col: str = "lang"
) -> DataFrame:
    """Group-vs-rest total-variation drift from a persisted contingency
    state (the :func:`drift_state_sink` output) — the same exact-BIGINT
    common-denominator protocol as ``profile.tvd_drift``, reading the
    vocabulary-grain state instead of the corpus.  The category column
    is named explicitly (defaulting to ``lang`` like
    :func:`drift_state_sink`) — binding it positionally would silently
    compute TVD over the wrong column if a caller reordered the
    persisted state's projection."""
    from pyspark.sql import functions as F

    cells = state.select(
        F.col(group_col).alias("g"),
        F.col(cat_col).alias("cat"),
        F.col("n").alias("o_g"),
    )
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
    num = F.abs(
        F.col("o_g") * F.col("n_r") - F.col("o_r") * F.col("n_g")
    ).cast("decimal(38,0)")
    return (
        full.groupBy("g", "n_g", "n_r")
        .agg(F.sum(num).alias("num_sum"))
        .select(
            F.col("g").alias(group_col),
            F.col("n_g").cast("bigint").alias("n_group"),
            # n_r == 0 → the group IS the whole corpus → TVD 0 by
            # definition (same guard as profile.tvd_drift).
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


def daily_cents_state_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    group_col: str = "event_type",
):
    """Streaming FORECAST-STATE maintenance: each micro-batch's
    (group, day) revenue cents fold into the persisted DAY-GRAIN
    CONTRACTION by the associative SUM — daily cents are a linear
    state, so the live day table always equals the batch
    ``_daily_cents`` over all data seen (bit-for-bit), and every
    smoothing forecaster built on that contraction (EWMA, Holt,
    Holt–Winters, Croston) answers FROM THE STATE at any moment
    without rescanning the event history.  The forecaster's
    day-ordered fold then runs over ≤ groups × calendar-days rows —
    the state is calendar-bounded, never event-bounded, which is what
    makes a 100 TB stream's live forecast cheap.

    Same versioned replay-idempotent fold protocol as
    :func:`hist_state_sink` / :func:`drift_state_sink`.
    """
    from pyspark.sql import functions as F

    def merge(a: DataFrame, b: DataFrame) -> DataFrame:
        return (
            a.unionByName(b)
            .groupBy(group_col, "d")
            .agg(F.sum("y").alias("y"))
        )

    def write_batch(df: DataFrame, batch_id: int) -> None:
        delta = (
            df.select(
                F.col(group_col),
                F.to_date("ts").alias("d"),
                F.floor(F.col("value") * 100)
                .cast("bigint")
                .alias("cents"),
            )
            .groupBy(group_col, "d")
            .agg(F.sum("cents").alias("y"))
        )
        _fold_versioned(df.sparkSession, delta, batch_id, path, merge)

    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def croston_from_state(
    state: DataFrame, group_col: str = "event_type"
) -> DataFrame:
    """Croston intermittent-demand forecast answered FROM the
    persisted day-grain state of :func:`daily_cents_state_sink` — the
    live face of the round-6 forecasting family.  Delegates to the
    same day-ordered fold as the batch operator
    (:func:`~p2_mapreduce_spark.operators.timeseries.croston_from_daily`),
    so live == batch bit-for-bit by construction (pinned in pytest).
    """
    from pyspark.sql import functions as F

    from p2_mapreduce_spark.operators.timeseries import croston_from_daily

    return croston_from_daily(
        state.select(F.col(group_col).alias("g"), "d", "y"), group_col
    )


def tsb_from_state(
    state: DataFrame, group_col: str = "event_type"
) -> DataFrame:
    """TSB intermittent-demand forecast answered FROM the persisted
    day-grain state of :func:`daily_cents_state_sink` — the modern
    successor living next to :func:`croston_from_state` on the same
    maintained contraction; live == batch bit-for-bit by construction
    (pinned in pytest)."""
    from pyspark.sql import functions as F

    from p2_mapreduce_spark.operators.timeseries import tsb_from_daily

    return tsb_from_daily(
        state.select(F.col(group_col).alias("g"), "d", "y"), group_col
    )


def page_hinkley_from_state(
    state: DataFrame, group_col: str = "event_type"
) -> DataFrame:
    """Page–Hinkley sequential drift alarm answered FROM the persisted
    day-grain state — the live mean-shift monitor the PH statistic was
    designed to be: every micro-batch folds into the calendar-bounded
    state and the alarm re-evaluates without rescanning event history;
    live == batch bit-for-bit by construction (pinned in pytest)."""
    from pyspark.sql import functions as F

    from p2_mapreduce_spark.operators.timeseries import (
        page_hinkley_from_daily,
    )

    return page_hinkley_from_daily(
        state.select(F.col(group_col).alias("g"), "d", "y"), group_col
    )
