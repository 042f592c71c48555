"""Tests for the plan doctor: known-bad plans must be flagged, the
engine's own headline plans must come back clean of errors."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from p2_mapreduce_spark.plans.doctor import audit_plan
from p2_mapreduce_spark.session import load_table


def _rules(findings):
    return {f["rule"] for f in findings}


class TestDoctorFlagsBadPlans:
    def test_cartesian_product(self, spark, sf_dir):
        a = load_table(spark, sf_dir, "orders")
        b = load_table(spark, sf_dir, "lineitem")
        # non-equi condition over two large-ish tables, no broadcast hint
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            bad = a.crossJoin(b).filter(a.o_totalprice > b.l_extendedprice)
            rules = _rules(audit_plan(bad))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        assert "cartesian-product" in rules

    def test_global_window_funnel(self, spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem")
        w = Window.orderBy("l_extendedprice")  # no partition: one task
        bad = li.withColumn("rn", F.row_number().over(w))
        assert "single-partition-funnel" in _rules(audit_plan(bad))

    def test_row_python_udf(self, spark, sf_dir):
        from pyspark.sql.functions import udf

        li = load_table(spark, sf_dir, "lineitem")
        slow = udf(lambda x: x + 1.0, "double")
        bad = li.select(slow("l_extendedprice").alias("y"))
        assert "row-python-udf" in _rules(audit_plan(bad))

    def test_accidental_non_equi_join_bnlj(self, spark, sf_dir):
        # an "equi" join whose key got wrapped in a non-deterministic-ish
        # expression compiles to BroadcastNestedLoopJoin when one side is
        # small: every orders row tests against the whole broadcast side
        orders = load_table(spark, sf_dir, "orders")
        nation = load_table(spark, sf_dir, "nation")
        bad = orders.join(
            F.broadcast(nation),
            orders.o_custkey % 25 >= nation.n_nationkey,  # typo'd: >= not ==
        )
        assert "broadcast-nested-loop-join" in _rules(audit_plan(bad))

    def test_defeated_pushdown(self, spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem")
        # wrapping the column in a Python-opaque cast chain defeats
        # parquet pushdown: filter evaluates post-scan
        bad = li.filter(
            F.md5(F.col("l_returnflag").cast("string")) == F.lit("x")
        )
        assert "filter-not-pushed" in _rules(audit_plan(bad))


class TestDoctorPassesGoodPlans:
    def test_headline_queries_have_no_errors(self, spark, sf_dir):
        import __spark_entry__ as entry_mod

        qs = entry_mod.queries()
        # a representative slice of the JVM-side headline set
        for name in [
            "agg_pricing",
            "filter_project",
            "join_orders_customer",
            "shipping_priority",
            "quality_classifier",
            "grouped_ols2",
            "table_digest",
        ]:
            findings = audit_plan(qs[name](spark, sf_dir))
            errors = [f for f in findings if f["severity"] == "error"]
            assert not errors, (name, errors)


# --- full-surface audit -----------------------------------------------------

#: Every query whose plan legitimately contains a SinglePartition
#: exchange, with the shared justification: the funneled input is
#: GRAIN-BOUNDED — a one-row scalar/broadcast aggregate, a calendar or
#: vocabulary-grain pre-aggregate, or a #partitions-sized offset table
#: (the two-phase prefix-sum pattern) — never the fact table.  The
#: doctor flags every SinglePartition for human review; this list IS
#: that review, and any query newly entering or leaving it must be
#: re-reviewed (the assert below fails either way).
FUNNEL_REVIEWED = {
    # round-8 stats/timeseries ops: every SinglePartition input is a
    # one-row global sufficient-statistic aggregate, a k-row median /
    # crossings broadcast, or (sprt_daily) the calendar-grain
    # cumulative window — all grain-bounded
    "levene_bf", "mood_median", "cochran_armitage", "partial_corr",
    "granger_lag1", "sprt_daily", "ordinal_assoc",
    # round-8 batch C: hits_trade / dup_roi / staleness_audit carry a
    # one-row max/corpus/frontier aggregate; stuart_maxwell the one-row
    # midpoint + one-row 3x3 table; hellinger_drift the one-row grand
    # total; squared_rank_scale the pooled rank window at DAY grain
    # (calendar-bounded, the kruskal_wallis pattern)
    "hits_trade", "hellinger_drift", "stuart_maxwell",
    "squared_rank_scale", "dup_roi", "staleness_audit",
    # ansari/wilcoxon pool ranks at DAY grain (calendar-bounded, the
    # kruskal pattern); page_trend's one-row L fold
    "ansari_bradley", "wilcoxon_signed", "page_trend",
    # stump_gini: one-row global (n, p) label-total aggregate broadcast
    "stump_gini",
    # reliability batch: one-row global sufficient-statistic aggregates
    "cronbach_alpha", "lins_ccc", "bland_altman",
    # risk_ratio: the odds_ratio one-row 2x2 aggregate
    "risk_ratio",
    # round-9 additions, each grain-bounded:
    # jonckheere: the strictly-below cumulative window runs at the
    # distinct-daily-value grid (calendar days x k groups, value-
    # dictionary grain) and the final fold is a one-row aggregate
    "jonckheere",
    # nelson_aalen: both windows at observed-lifetime grain (bounded by
    # the observation window in days) — the life_table justification
    "nelson_aalen",
    # icc_reliability: one-row sufficient-statistic aggregates (cells /
    # rows / cols sums) joined broadcast — the cronbach_alpha pattern
    "icc_reliability",
    # reciprocity: fact joins contract to the <= nations^2 dictionary-
    # grain edge list FIRST; the one-row edge counts ride on that
    "reciprocity",
    # krippendorff: one-row pair aggregate + one-row k-grain margin
    # total broadcast — the stuart_maxwell justification verbatim
    "krippendorff",
    "ab_conversion", "benford", "bitmap_count", "bm25_search", "bounce_rate",
    "chi2_drift", "compaction_plan", "conversion_lag", "cramers_v",
    "cumulative_revenue",
    "dict_encode", "disjunctive_pricing", "distinctive_tokens",
    "doclen_histogram", "dq_orders",
    "emd_drift", "equidepth_histogram", "fk_integrity", "fold_ci",
    "funnel_steps",
    "important_parts", "join_fanout", "key_skew", "kmv_overlap", "ks_drift",
    # the three round-3 two-phase-rank ops: their only SinglePartition
    # inputs are the #partitions-grain offset tables / ≤2k-row merged
    # sketch / one-row grand totals — the pack_sequences justification
    "quantile_normalize", "systematic_sample",
    "length_batches", "mixture_plan", "mom_revenue", "negative_pairs",
    "mwu_drift", "new_returning",
    "pack_sequences", "pmi_bigrams", "profile_orders", "promo_revenue",
    # lm_bigram_score: one-row vocabulary-size broadcast aggregate (the
    # rarity_score device); all count joins are bigram/w1-grain
    "lm_bigram_score",
    # life_table: all windows run at observed-lifetime grain (bounded by
    # the observation window in days); user/event work is hash-partitioned
    "life_table",
    "quality_budget", "rarity_score", "revenue_forecast", "revenue_share",
    "rolling_active_users", "rolling_median", "rolling_median_sketch",
    "skyline_parts", "t_closeness",
    "small_qty_revenue", "tfidf_top_terms", "top_supplier",
    # triangle_census / triangle_doulion left this list when the bitset
    # census kernel landed: their remaining one-row census aggregates
    # plan as two-stage partial aggs with no SinglePartition exchange
    "trailing_revenue", "wau_hll",
    # vocab_growth: SinglePartition inputs are the #partitions-grain
    # offset table (two-phase rank) and the n_checkpoints-row curve
    "vocab_growth",
    # decayed_engagement: one-row anchor-date broadcast aggregate;
    # join_size_estimate: one-row totals + one-row heaviest-key argmax —
    # all work feeding them is key-grain
    "decayed_engagement", "join_size_estimate",
    # neyman_alloc: the largest-remainder window and weight total run at
    # #strata grain (config-bounded), fed by a map-side-combined agg
    "neyman_alloc",
    # round-4 additions, each the one-row-broadcast pattern:
    # calibration_bins: one-row (min, max, n_total) margin aggregate
    # broadcast onto the zero-shuffle margin map; bins n_bins-grain.
    # dedup_simhash_idf: one-row corpus-count broadcast for the idf
    # weights; votes/pairs run at doc/bucket grain.
    # hash_ring: the ring is config-grain and the share denominator a
    # one-row broadcast total; keys never single-partition.
    # infer_types: per-column ONE-ROW conditional aggregates (the
    # audit's entire output is #columns rows) unioned at config grain.
    "calibration_bins", "dedup_simhash_idf", "hash_ring", "infer_types",
    # classifier_auc: the mwu machinery's one-row grand-total broadcast
    # (the group×value grid is BroadcastNestedLoop after the hint)
    "classifier_auc",
    # markov_attribution: everything past the one journey shuffle runs
    # at (variants × states²) CONFIG grain — the tiny fixed-point tables
    # and the one-row p_full/sum_re broadcasts legitimately coalesce
    "markov_attribution",
    # logrank: the final statistic is a one-row aggregate by definition
    # (everything feeding it — day×cohort grid join, suffix-sum windows,
    # ordered folds — runs at observed-day grain since the r05 rewrite
    # removed the user-grain cohort-key fan-out)
    "logrank",
    # detector_kappa: one-row total/agreement/marginal-dot aggregates
    # over label-grain inputs — the whole output is one row
    "detector_kappa",
    # assoc_rules: one-row basket-count broadcast; zipf_buckets: one-row
    # mass total + the #partitions-grain offset table of the two-phase
    # vocabulary rank
    "assoc_rules", "zipf_buckets",
    # degree_assort: one-row sufficient-statistic aggregates (stats /
    # edge-count / node-count) broadcast-crossed — all work feeding them
    # is edge- or node-grain hash joins
    "degree_assort",
    # funnel_windowed: the funnel table is a 1-row counts aggregate
    # exploded to #steps rows (same shape as funnel_steps); all work
    # feeding it is the single user_id-grain shuffle
    "funnel_windowed",
    # fd_violations: one 1-row rollup per audited dependency (#pairs,
    # config-bounded) over key-grain map-side-combined aggregates
    "fd_violations",
    # ab_quantile_diff: two-phase-rank offset table (#partitions x 2
    # arms) + the 2-row arm-median pivot to one report row
    "ab_quantile_diff",
    # price_volume: one-row max-ship-year anchor broadcast (the
    # decayed_engagement device); everything else is brand-grain
    "price_volume",
    # rfm_segments: one-row max-date anchor + the #partitions x 3-dim
    # offset table of the melted two-phase rank
    "rfm_segments",
    # skipping_audit: one-row max-key aggregate broadcast into the
    # linear bucket width; all stats work is bucket-grain
    "skipping_audit",
    # lsh_recall: three one-row pair-count aggregates broadcast-crossed;
    # the pair generation feeding them is bucketed/prefix-filtered
    "lsh_recall",
    # column_churn: one 1-row all-flags aggregate exploded to #cols
    # rows; the join feeding it is key-grain
    "column_churn",
    # revenue_concentration: one-row totals broadcast + the
    # #partitions-grain offset table of the descending two-phase rank
    "revenue_concentration",
    # activity_histogram: one-row user-total broadcast; histogram work
    # is day-count grain
    "activity_histogram",
    # cuped: one-row pooled sufficient-stats broadcast + 2-row arm agg;
    # all work feeding them is user-grain map-side combined
    "cuped",
    # did: one 1-row conditional 2x2-cell aggregate over scan-grain rows
    "did",
    # partition_advisor: one 1-row rollup per candidate column
    # (#candidates, config-bounded) over value-grain counts
    "partition_advisor",
    # label_separation: one-row global cross-label stats broadcast;
    # everything feeding them is (label, dim)-grain map-side combined
    "label_separation",
    # stickiness: one-row date-range aggregate broadcast into the
    # calendar explode (the rolling_active_users justification)
    "stickiness",
    # hybrid_rrf: every funneled input is a ≤2·n_candidates-row fused
    # top-N list (both retriever outputs are LIMITed — config grain, the
    # vocab_topk k-row-window justification); the corpus-scale work is
    # inside the retrievers, whose own plans are the bm25/knn shapes
    "hybrid_rrf",
    # welch_ttest: one 1-row pivoted sufficient-statistics aggregate
    # (2 arm rows → 1 report row); all metric work is map-side combined
    "welch_ttest",
    # eb_rates: one 1-row Beta-Binomial prior aggregate over PART-grain
    # rows (the fold_ci justification), broadcast back; the fact table
    # contracts map-side and never reshuffles
    "eb_rates",
    # otsu_threshold: cumulative window + argmax over the ≤ levels+1-row
    # quantized histogram (config grain, the doclen_histogram
    # justification) + one-row totals/argmax aggregates
    "otsu_threshold",
    # temperature_mix: one-row weight-total/shortfall aggregates + the
    # #domains-grain largest-remainder window (the neyman_alloc
    # justification)
    "temperature_mix",
    # coverage_curve: #partitions-grain offset table (two-phase rank) +
    # the one-row checkpoint-grid aggregate exploded to #checkpoints
    "coverage_curve",
    # round-5 additions:
    # tvd_drift / gk_lambda: the chi2_drift justification — one-row
    # grand-total (TVD) / modal-total (λ) aggregates over contingency
    # cells at (group × category) vocabulary grain
    "tvd_drift", "gk_lambda",
    # pinball_eval: one-row calendar-anchor (min-date) broadcast; all
    # later work runs at day grain per group
    "pinball_eval",
    # decile_lift: the two-phase-rank pattern (quality_budget
    # justification) — #partitions-grain offset table + one-row
    # (n_tot, pos_tot) broadcast + the 10-row cumulative window
    "decile_lift",
    # blocking_quality: the lsh_recall justification — four one-row
    # pair/doc-count aggregates broadcast-crossed; candidate and truth
    # generation stay banded / prefix-capped
    "blocking_quality",
    # seq_accuracy: the |types|-row modal-baseline window + the one-row
    # grand-total broadcast — everything feeding them is the |types|²
    # transition matrix (config grain)
    "seq_accuracy",
    # brier_score: the calibration_bins justification — one-row min/max
    # broadcast + the one-row final aggregate; per-doc work zero-shuffle
    "brier_score",
    # abc_parts: the revenue_concentration justification — the
    # #partitions-grain offset table of the two-phase rank + the
    # one-row grand-total broadcast; part work is key-grain
    "abc_parts",
    # average_precision: the quality_budget two-phase-rank pattern —
    # #partitions-grain offset table + one-row totals/term-sum
    # aggregates broadcast-crossed
    "average_precision",
    # isotonic_calibration: the whole PAV fit runs on ONE packed row of
    # ≤ n_bins structs (config grain — the neyman_alloc justification)
    # plus calibration_bins' reviewed one-row min/max broadcast
    "isotonic_calibration",
    # round-6 additions:
    # kruskal_wallis: ONE global rank window over the day-grain series
    # (≤ groups × calendar days rows) + a k-row group-sorted fold;
    # anova_f: one-row global sufficient-statistic aggregate + k-row fold;
    # mcc_eval / ht_estimate: one-row global conditional-count aggregates
    # (the fold_ci device) — all upstream work is map-side;
    # label_noise: one-row pivoted (count, sum) threshold broadcast;
    # period_balance: the MoM lag window runs at MONTH grain
    # (calendar-bounded) after the (customer, month) hash-partitioned pick;
    # receivables_aging: one-row snapshot-anchor broadcast + a 4-row
    # bucket report
    "kruskal_wallis", "anova_f", "mcc_eval", "ht_estimate",
    "label_noise", "period_balance", "receivables_aging",
    # chi2_residuals: one-row N broadcast + the #sources × #langs grid
    # cross join (config grain); counts are key-grain aggregates;
    # graph_modularity: one-row m / one-row Q-numerator broadcasts over
    # a #nations-grain report;
    # hbos_outliers: one-row price min/max broadcast + three
    # bin-grain count broadcasts; ranking is TakeOrdered;
    # rbo_ranks: both leaderboard row_number windows and the 20-row
    # depth fold run at SUPPLIER grain (dimension-bounded), fed by a
    # map-side-combined per-supplier aggregate
    "chi2_residuals", "graph_modularity", "hbos_outliers", "rbo_ranks",
    # round-7 additions:
    # durbin_watson: ONE global lag window over the day-grain series
    # (calendar-bounded) + a one-row moment aggregate;
    # pettitt: global rank + cumsum windows at day grain + the 1-row
    # argmax TakeOrdered;
    # friedman: per-weekday-block rank windows (7 blocks × k groups,
    # config grain) + the kruskal_wallis k-row fold;
    # kendall_w: three global rank windows at SUPPLIER grain
    # (dimension-bounded, the rbo_ranks justification) + one-row
    # moment/tie aggregates broadcast-crossed;
    # mcnemar: one-row calendar-midpoint broadcast + the one-row
    # discordant-cell aggregate (user work hash-partitioned);
    # odds_ratio: one-row 2x2-cell aggregate over user-grain
    # map-side-combined flags (the did justification);
    # null_cooccur: ONE 1-row all-flags conditional aggregate exploded
    # to 3 pair rows (the column_churn justification);
    # cliffs_delta: the reviewed mwu_drift machinery verbatim (one-row
    # grand-total broadcast) + a derived column;
    # bday_lag: one-row n_all total broadcast into the lag-grain
    # histogram (the decayed_engagement device)
    "durbin_watson", "pettitt", "friedman", "kendall_w", "mcnemar",
    "odds_ratio", "null_cooccur", "cliffs_delta", "bday_lag",
    # cochran_q: two one-row moment aggregates (user-grain and
    # type-grain inputs both map-side combined) crossed to the 1-row
    # report — the anova_f/welch_ttest justification;
    # price_index: one-row base-month MIN broadcast into the
    # (part, month)-grain cell table (the decayed_engagement anchor
    # device); basket sums are month-grain
    "cochran_q", "price_index",
    # fleiss_kappa: one-row moment aggregate + a 3-row category
    # aggregate crossed to the 1-row report; the per-doc rating map
    # is zero-shuffle (the cochran_q justification)
    "fleiss_kappa",
}


def test_every_query_plan_audited_against_reviewed_funnels(spark, sf_dir):
    """Full-surface doctor audit: the ONLY error-severity finding any of
    the 200+ query plans may carry is a single-partition funnel that has
    been human-reviewed as grain-bounded (FUNNEL_REVIEWED); anything
    else — a cartesian product, an unreviewed funnel, a stale entry —
    fails."""
    import __spark_entry__ as entry_mod

    # audit the STATIC plans: with AQE allowed to re-partition cached
    # plans (session.py), a persisted intermediate that some earlier
    # test happened to materialize reports its AQE-final (coalesced)
    # partitioning instead of the static SinglePartition — the audit
    # must not depend on which tests ran before it
    qs = entry_mod.queries()
    got = {}
    for name, fn in sorted(qs.items()):
        # cold cache PER QUERY: a handful of queries materialize shared
        # persisted intermediates at construction time (kernel-choice
        # counts); auditing against whatever an earlier iteration left
        # cached made the SinglePartition census flap run-to-run
        spark.catalog.clearCache()
        findings = audit_plan(fn(spark, sf_dir))
        bad = sorted({f["rule"] for f in findings if f["severity"] == "error"})
        if bad:
            got[name] = bad
    unexpected = {
        n: r for n, r in got.items()
        if n not in FUNNEL_REVIEWED or r != ["single-partition-funnel"]
    }
    stale = FUNNEL_REVIEWED - set(got)
    assert not unexpected, f"unreviewed error findings: {unexpected}"
    assert not stale, f"stale FUNNEL_REVIEWED entries: {stale}"
