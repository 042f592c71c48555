"""Plan-hygiene pins for the round-2 operator batches (search, ML-prep,
sketch algebra, CDC, skyline) — same contract as test_plans.py: fail
when Catalyst stops making the scale-critical choice the operator is
designed around."""

import pytest

import __spark_entry__ as entry_mod
from p2_mapreduce_spark.plans import plan_report


@pytest.fixture(autouse=True)
def _clear_cache(spark):
    spark.catalog.clearCache()
    yield


def _report(spark, sf_dir, qid):
    return plan_report(entry_mod.queries()[qid](spark, sf_dir))


def test_dict_encode_fact_table_never_shuffles(spark, sf_dir):
    r = _report(spark, sf_dir, "dict_encode")
    # the row-encoding join must broadcast the vocabulary; the only
    # sort-merge-free path for the fact side
    assert r["n_broadcast_joins"] >= 1
    assert r["n_sortmerge_joins"] == 0


def test_feature_bin_boundaries_broadcast_back(spark, sf_dir):
    r = _report(spark, sf_dir, "feature_bin")
    assert r["n_broadcast_joins"] == 1
    assert r["n_sortmerge_joins"] == 0


def test_share_of_parent_dims_all_broadcast(spark, sf_dir):
    r = _report(spark, sf_dir, "share_of_parent")
    assert r["n_broadcast_joins"] == 3
    assert r["n_sortmerge_joins"] == 0
    # one fact shuffle (the nation-grain aggregate); the window runs on
    # the grain table partitioned by region — no extra fact exchange
    assert r["n_exchanges"] <= 3


def test_grouped_ols2_is_one_aggregate(spark, sf_dir):
    r = _report(spark, sf_dir, "grouped_ols2")
    assert not r["has_python_worker"]
    assert r["has_partial_agg"], "sufficient stats must map-side combine"
    assert r["n_exchanges"] <= 1, "a regression fit is ONE aggregate pass"


def test_table_digest_is_one_aggregate(spark, sf_dir):
    r = _report(spark, sf_dir, "table_digest")
    assert not r["has_python_worker"]
    assert r["n_exchanges"] <= 1


def test_quality_classifier_zero_exchanges(spark, sf_dir):
    r = _report(spark, sf_dir, "quality_classifier")
    assert not r["has_python_worker"]
    # spread()'s RoundRobin is allowed; no key shuffle may appear
    assert "hashpartitioning" not in r["plan"]


def test_stratified_split_zero_exchanges(spark, sf_dir):
    r = _report(spark, sf_dir, "stratified_split")
    assert r["n_exchanges"] == 0
    assert not r["has_python_worker"]


def test_skyline_no_global_single_partition_window(spark, sf_dir):
    r = _report(spark, sf_dir, "skyline_parts")
    # the strict-prefix max must run partitioned by pid — an unpartitioned
    # data-grain window ("Window [...] ORDER BY ... windowspecdefinition"
    # with SinglePartition exchange right above the price-grain table)
    # would be the scale-killer.  The only SinglePartition exchange
    # allowed is the config-bounded per-partition offset table.
    assert r["plan"].count("SinglePartition") <= 1


def test_bm25_stats_broadcast(spark, sf_dir):
    r = _report(spark, sf_dir, "bm25_search")
    # corpus stats (1 row) and the df table (≤ |terms| rows) come back
    # as broadcast cross joins (BroadcastNestedLoop with a 1-row build
    # side); the doc-length join broadcast-hashes; nothing sort-merges
    assert r["plan"].count("BroadcastNestedLoopJoin") >= 2
    assert r["n_broadcast_joins"] >= 1
    assert r["n_sortmerge_joins"] == 0
    assert not r["has_python_worker"]


def test_sample_exact_k_plans_takeordered(spark, sf_dir):
    r = _report(spark, sf_dir, "sample_exact_k")
    assert "TakeOrderedAndProject" in r["plan"], (
        "exact-k sample must be a heap cut, never a global sort"
    )


def test_scd2_no_fact_outer_rebuild(spark, sf_dir):
    r = _report(spark, sf_dir, "scd2_orders")
    # the close-stamp join must broadcast the changed-key set
    assert r["n_broadcast_joins"] >= 1
    plan = r["plan"]
    assert "FullOuter" not in plan and "full_outer" not in plan


# --- round-2 session batches (allpairs, sampling, planning, indexes) -------


def test_weighted_sample_is_heap_topk_no_python(spark, sf_dir):
    r = _report(spark, sf_dir, "weighted_sample")
    assert not r["has_python_worker"]
    assert "TakeOrderedAndProject" in r["plan"]
    assert r["n_exchanges"] == 0, "the weighted draw must not shuffle"


def test_allpairs_prefix_index_no_python_and_pruned_scan(spark, sf_dir):
    r = _report(spark, sf_dir, "dedup_allpairs")
    assert not r["has_python_worker"]
    # both scans prune to the two columns the pipeline touches
    for cols in r["read_schema_cols"]:
        assert set(cols) <= {"doc_id", "text"}


def test_substring_search_prefilter_shuffles_ids_not_text(spark, sf_dir):
    r = _report(spark, sf_dir, "substring_search")
    assert not r["has_python_worker"]
    # candidate verification is a semi-join probe of the doc table
    plan = r["plan"]
    assert "LeftSemi" in plan


def test_bitmap_count_no_python_partial_agg(spark, sf_dir):
    r = _report(spark, sf_dir, "bitmap_count")
    assert not r["has_python_worker"]
    assert r["has_partial_agg"], "bitmap words must map-side combine"


def test_join_fanout_never_joins_fact_tables(spark, sf_dir):
    r = _report(spark, sf_dir, "join_fanout")
    assert not r["has_python_worker"]
    # the only joins are over key-grain aggregates (broadcastable);
    # a SortMergeJoin of the raw fact tables would defeat the point
    assert r["n_sortmerge_joins"] == 0


def test_knn_multiprobe_broadcasts_probe_set(spark, sf_dir):
    r = _report(spark, sf_dir, "knn_multiprobe")
    assert not r["has_python_worker"]
    assert r["n_broadcast_joins"] >= 1
    assert r["n_sortmerge_joins"] == 0, "corpus must never shuffle for probes"


def test_quality_calibration_two_phase_rank(spark, sf_dir):
    r = _report(spark, sf_dir, "quality_calibration")
    assert not r["has_python_worker"]
    # the per-source rank must be the two-phase device: the fact-grain
    # window runs per (pid, source) — NO window in the plan may sort a
    # whole source in one task (sources are wildly skewed; the biggest
    # source IS the corpus).  Every fact-grain windowspec must lead
    # with pid; the source-only offset window runs on the config-grain
    # (pid × source) count table, whose input is an aggregate.
    rank_specs = [
        s
        for s in r["plan"].split("row_number() windowspecdefinition(")[1:]
    ]
    assert rank_specs and all(s.startswith("pid#") for s in rank_specs), (
        "fact-grain rank window must be pid-led", r["plan"]
    )
    # the only source-partitioned window is the offset prefix-sum over
    # the (pid × source) COUNT table — its spec orders by pid, never by
    # the data-grain (quality, doc_id) key
    src_specs = [
        s
        for s in r["plan"].split("windowspecdefinition(source#")[1:]
    ]
    assert all("pid#" in s[: s.index("specifiedwindowframe")] for s in src_specs), (
        "source-led window must be the config-grain pid offset table", r["plan"]
    )
    # offsets + totals come back broadcast — the fact table never
    # sort-merge-joins
    assert r["n_sortmerge_joins"] == 0
    assert r["n_broadcast_joins"] >= 2
