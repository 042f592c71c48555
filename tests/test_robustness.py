"""Robustness pins: results must survive re-planning and degenerate
inputs.

- AQE toggle: every result the engine produces is a pure function of the
  data — turning adaptive execution off (different join strategies,
  different partition coalescing) must not change a single value.  This
  is the determinism claim the oracle protocol rests on, pinned directly.
- Empty inputs: operators must return empty results (correct schema),
  not throw, when a table has zero rows — the first day of a new
  deployment looks exactly like this.
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from p2_mapreduce_spark.session import load_table

AQE_PINNED = [
    "agg_pricing",
    "topk_window",
    "dedup_allpairs",
    "salted_agg",
    "weighted_sample",
    "join_fanout",
    # round-3 two-phase rank/lag users: AQE re-plans change partition
    # counts, which these devices must be invariant to BY CONSTRUCTION
    "trimmed_mean",
    "vocab_growth",
    "ooo_rate",
    "zipf_buckets",
    "ewma_daily",
    # this session's two-phase rank/lag users + exact-stat ops
    "rfm_segments",
    "ab_quantile_diff",
    "interarrival",
    "acf_lags",
    # late round-3 additions: two-phase-rank (qq), pinned-tree stats
    # (welch, eb, otsu), rank fusion, pattern match, integer allocation
    "qq_drift",
    "welch_ttest",
    "eb_rates",
    "otsu_threshold",
    "hybrid_rrf",
    "seq_pattern",
    "temperature_mix",
    "coverage_curve",
    # clustering family + media near-dup: driver-held centroid literals
    # and banded self-joins must not depend on AQE re-planning
    "kmeans_embeddings",
    "kmeans_silhouette",
    "phash_near_dup",
]


def test_results_identical_with_aqe_disabled(spark, sf_dir):
    qs = entry_mod.queries()
    baseline = {
        n: sorted(tuple(r) for r in qs[n](spark, sf_dir).collect())
        for n in AQE_PINNED
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for n in AQE_PINNED:
            again = sorted(tuple(r) for r in qs[n](spark, sf_dir).collect())
            assert again == baseline[n], n
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_operators_tolerate_empty_inputs(spark):
    empty_docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    empty_events = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from p2_mapreduce_spark.operators.curation import weighted_sample
    from p2_mapreduce_spark.operators.dedup import (
        allpairs_jaccard,
        containment_pairs,
        exact_dedup,
        minhash_lsh_pairs,
    )
    from p2_mapreduce_spark.operators.events_analytics import (
        activity_islands,
        daily_new_returning,
    )
    from p2_mapreduce_spark.operators.search import phrase_search, substring_search
    from p2_mapreduce_spark.operators.text_analysis import rarity_score

    for df in (
        exact_dedup(empty_docs),
        allpairs_jaccard(empty_docs),
        containment_pairs(empty_docs),
        minhash_lsh_pairs(empty_docs),
        weighted_sample(empty_docs, k=5),
        phrase_search(empty_docs, ("data", "join")),
        substring_search(empty_docs, "data join"),
        rarity_score(empty_docs),
        activity_islands(empty_events),
        daily_new_returning(empty_events),
    ):
        assert df.count() == 0


def test_drift_suite_partition_invariant(spark, sf_dir):
    """The four drift statistics are pure functions of the data: any
    repartitioning returns bit-identical results."""
    from p2_mapreduce_spark.operators.profile import (
        chi2_drift,
        emd_drift,
        ks_drift,
        mwu_drift,
    )
    from p2_mapreduce_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    shuffled = docs.repartition(13)
    for op in (ks_drift, mwu_drift, chi2_drift, emd_drift):
        a = sorted(tuple(r) for r in op(docs).collect())
        b = sorted(tuple(r) for r in op(shuffled).collect())
        assert a == b, op.__name__


def test_round3_batch2_ops_tolerate_empty_inputs(spark):
    """The session's new operators must return empty (or all-dropped)
    results with the right schema on zero-row inputs, not throw."""
    empty_events = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    empty_li = spark.createDataFrame(
        [], "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_quantity double, l_extendedprice double, l_shipdate timestamp"
    )
    empty_part = spark.createDataFrame(
        [], "p_partkey long, p_brand string"
    )
    empty_edges = spark.createDataFrame([], "u long, v long")
    empty_docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, "
            "n_chars long"
    )
    empty_orders = spark.createDataFrame(
        [], "o_orderkey long, o_custkey long, o_totalprice double, "
            "o_orderdate timestamp"
    )
    from p2_mapreduce_spark.operators.analytics import (
        price_volume_decomp,
        rfm_segments,
    )
    from p2_mapreduce_spark.operators.events_analytics import (
        ab_quantile_diff,
        funnel_windowed,
    )
    from p2_mapreduce_spark.operators.graph import degree_assortativity
    from p2_mapreduce_spark.operators.profile import fd_violations
    from p2_mapreduce_spark.operators.text_analysis import readability_by_source
    from p2_mapreduce_spark.operators.timeseries import (
        acf_lags,
        interarrival_stats,
    )

    assert acf_lags(empty_events).count() == 0
    assert interarrival_stats(empty_events).count() == 0
    assert price_volume_decomp(empty_li, empty_part).count() == 0
    assert rfm_segments(empty_orders).count() == 0
    assert readability_by_source(empty_docs).count() == 0
    # per-pair report rows survive with zeroed counts
    fd = fd_violations(empty_li, [("l_partkey", "l_suppkey")]).collect()
    assert len(fd) == 1 and fd[0]["n_keys"] == 0
    # one-row reports: NULL-armed, never a crash
    da = degree_assortativity(empty_edges).collect()
    assert len(da) == 1 and da[0]["assortativity"] is None
    fw = funnel_windowed(empty_events).collect()
    assert [r["n_users"] for r in fw] == [0, 0, 0]
    aq = ab_quantile_diff(empty_events).collect()
    assert len(aq) == 1 and aq[0]["median_diff"] is None
