"""Tests for the histogram-quantile sketch, key-skew profiler, and
span-level dedup."""

import pytest
from pyspark.sql import functions as F

from p2_mapreduce_spark.operators.dedup import span_dedup
from p2_mapreduce_spark.operators.profile import (
    hist_quantiles,
    hist_state,
    key_skew_profile,
    merge_hist_states,
)


# --- histogram quantile sketch --------------------------------------------


@pytest.fixture(scope="module")
def values(spark):
    # 1..100 with a heavy tail of 100s: exact percentiles are known
    rows = [(i % 2, float(v)) for i, v in enumerate(range(1, 101))] + [
        (0, 100.0)
    ] * 50
    return spark.createDataFrame(rows, "g int, v double")


def test_hist_state_is_bounded_and_exact(spark, values):
    st = hist_state(values, "v", ["g"], lo_c=0, hi_c=10_000, n_buckets=100)
    rows = st.collect()
    # state grain: at most groups x buckets, counts sum to input size
    assert len(rows) <= 2 * 100
    assert sum(r["cnt"] for r in rows) == values.count()
    # v=100.0 (cents 10000) clamps into the top bucket
    top = [r for r in rows if r["bucket"] == 99]
    assert sum(r["cnt"] for r in top) >= 50


def test_hist_merge_equals_direct(spark, values):
    """State associativity: splitting the data, sketching each split, and
    merging must equal sketching the whole — the property that lets daily
    states roll up without rescans."""
    a = values.filter(F.col("v") <= 40)
    b = values.filter((F.col("v") > 40) & (F.col("v") <= 80))
    c = values.filter(F.col("v") > 80)
    kw = dict(lo_c=0, hi_c=10_000, n_buckets=100)
    direct = {
        (r["g"], r["bucket"]): r["cnt"]
        for r in hist_state(values, "v", ["g"], **kw).collect()
    }
    merged = {
        (r["g"], r["bucket"]): r["cnt"]
        for r in merge_hist_states(
            hist_state(a, "v", ["g"], **kw),
            hist_state(b, "v", ["g"], **kw),
            hist_state(c, "v", ["g"], **kw),
        ).collect()
    }
    assert direct == merged


def test_hist_quantiles_within_one_bucket(spark):
    """With unit-width buckets over integer data, the estimate is the exact
    percentile's upper boundary."""
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 101)], "g string, v double"
    )
    st = hist_state(df, "v", ["g"], lo_c=0, hi_c=10_000, n_buckets=100)
    out = hist_quantiles(st, ["g"], lo_c=0, hi_c=10_000, n_buckets=100).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_rows"] == 100
    # v=50 sits at the lower edge of bucket 50 ([50,51)): the estimate is
    # that bucket's UPPER boundary — conservative by < one bucket width
    assert r["p50"] == 51.0
    assert r["p90"] == 91.0
    assert r["p99"] == 100.0


def test_hist_state_rejects_ragged_buckets(spark, values):
    with pytest.raises(ValueError):
        hist_state(values, "v", ["g"], lo_c=0, hi_c=1_000, n_buckets=7)


# --- key skew profiler -----------------------------------------------------


def test_key_skew_profile_counts_and_share(spark):
    rows = [("hot",)] * 70 + [("warm",)] * 20 + [("k%d" % i,) for i in range(10)]
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_profile(df, "k", top_n=3).collect()
    assert [r["key"] for r in out] == ["hot", "warm", "k0"]
    assert out[0]["cnt"] == 70 and out[0]["total"] == 100
    assert out[0]["share_ppm"] == 700_000
    assert out[1]["share_ppm"] == 200_000
    # singleton ties broken by key ascending
    assert out[2]["cnt"] == 1 and out[2]["share_ppm"] == 10_000


# --- span dedup ------------------------------------------------------------


def test_span_dedup_removes_repeated_spans(spark):
    """A span repeated across documents survives only at its first
    (doc_id, span_idx) occurrence; unique spans always survive."""
    boiler = " ".join(f"b{i}" for i in range(10))  # one exact 10-token span
    u1 = " ".join(f"x{i}" for i in range(10))
    u2 = " ".join(f"y{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, boiler + " " + u1),
            (2, boiler + " " + u2),
            (3, u1),  # whole doc duplicates doc 1's second span
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in span_dedup(docs, span_tokens=10).collect()}
    assert out[1]["n_spans"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["clean_text"] == boiler + " " + u1
    # doc 2 loses the boilerplate span but keeps its unique one
    assert out[2]["n_spans"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["clean_text"] == u2
    # doc 3's only span already appeared in doc 1
    assert out[3]["n_spans"] == 1 and out[3]["n_kept"] == 0
    assert out[3]["clean_text"] == ""


def test_span_dedup_tail_span_and_order(spark):
    """Partial tail spans are real spans; reassembly preserves span
    order."""
    text = " ".join(f"t{i}" for i in range(25))  # spans of 10/10/5 tokens
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    out = span_dedup(docs, span_tokens=10).collect()[0]
    assert out["n_spans"] == 3 and out["n_kept"] == 3
    assert out["clean_text"] == text


def test_span_dedup_is_partitioning_invariant(spark):
    """The keeper election must not depend on physical layout."""
    docs = spark.createDataFrame(
        [(i, "same span of ten tokens exactly here now ok fin") for i in range(20)],
        "doc_id long, text string",
    )
    a = {
        (r["doc_id"], r["n_kept"]) for r in span_dedup(docs).collect()
    }
    b = {
        (r["doc_id"], r["n_kept"])
        for r in span_dedup(docs.repartition(13)).collect()
    }
    assert a == b
    # exactly one keeper: the smallest doc_id
    assert (0, 1) in a and sum(k for _, k in a) == 1


def test_k_anonymity_audit_flags_small_classes(spark, sf_dir):
    from p2_mapreduce_spark.operators.profile import k_anonymity_audit
    from p2_mapreduce_spark.session import load_table

    cust = load_table(spark, sf_dir, "customer")
    rows = k_anonymity_audit(cust, k=8).collect()
    assert sum(r.class_size for r in rows) == cust.count()
    for r in rows:
        assert r.k_anonymous == (r.class_size >= 8)


def test_join_fanout_predicts_actual_join_size(spark, sf_dir):
    from p2_mapreduce_spark.operators.profile import join_fanout
    from p2_mapreduce_spark.session import load_table

    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    row = join_fanout(part, li, "p_partkey", "l_partkey").collect()[0]
    actual = part.join(li, part.p_partkey == li.l_partkey).count()
    assert row.join_rows == actual
    assert row.left_unmatched_rows == part.join(
        li, part.p_partkey == li.l_partkey, "left_anti"
    ).count()
    assert row.right_unmatched_rows == li.join(
        part, li.l_partkey == part.p_partkey, "left_anti"
    ).count()
    assert row.max_key_fanout >= row.join_rows / max(row.n_matching_keys, 1)


def test_ks_drift_matches_scipy_free_reference(spark):
    """Exact KS vs a local two-sample computation on a hand fixture,
    including a group whose distribution is shifted."""
    rows = []
    for i in range(100):
        rows.append((i, "a", 10 + (i % 5)))        # values 10..14
    for i in range(100, 160):
        rows.append((i, "b", 13 + (i % 5)))        # values 13..17 (shifted)
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    from p2_mapreduce_spark.operators.profile import ks_drift

    got = {r.source: r for r in ks_drift(docs).collect()}

    def local_ks(a, b):
        vals = sorted(set(a) | set(b))
        best = 0.0
        ca = cb = 0
        for v in vals:
            ca += sum(1 for x in a if x == v)
            cb += sum(1 for x in b if x == v)
            best = max(best, abs(ca / len(a) - cb / len(b)))
        return best

    a_vals = [10 + (i % 5) for i in range(100)]
    b_vals = [13 + (i % 5) for i in range(100, 160)]
    assert got["a"].n_group == 100 and got["a"].n_rest == 60
    assert abs(got["a"].ks_stat - local_ks(a_vals, b_vals)) < 1e-12
    assert abs(got["b"].ks_stat - local_ks(b_vals, a_vals)) < 1e-12
    assert got["a"].ks_stat > 0.5  # the shift is detected


def test_mwu_drift_exact_u_and_auc(spark):
    """2U against the textbook O(n·m) definition on a fixture with ties
    and a clear dominance direction."""
    rows = []
    a_vals = [10, 10, 12, 14, 14, 15]
    b_vals = [11, 14, 16, 16]
    for i, v in enumerate(a_vals):
        rows.append((i, "a", v))
    for i, v in enumerate(b_vals):
        rows.append((100 + i, "b", v))
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    from p2_mapreduce_spark.operators.profile import mwu_drift

    got = {r.source: r for r in mwu_drift(docs).collect()}

    def u2_ref(xs, ys):
        return sum(
            2 if x > y else (1 if x == y else 0) for x in xs for y in ys
        )

    assert got["a"].u2 == u2_ref(a_vals, b_vals)
    assert got["b"].u2 == u2_ref(b_vals, a_vals)
    # complements: U_a + U_b == n·m  =>  u2_a + u2_b == 2·n·m
    assert got["a"].u2 + got["b"].u2 == 2 * len(a_vals) * len(b_vals)
    assert got["a"].auc == got["a"].u2 / (2 * len(a_vals) * len(b_vals))
    assert got["b"].auc > 0.5 > got["a"].auc  # b stochastically dominates


def test_fold_ci_brackets_the_true_mean_and_is_partition_invariant(spark, sf_dir):
    from p2_mapreduce_spark.operators.profile import fold_ci
    from p2_mapreduce_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    row = fold_ci(orders).collect()[0]
    true_mean = orders.agg({"o_totalprice": "avg"}).collect()[0][0]
    # fold split is uniform: the CI must bracket the global mean, and the
    # global mean from exact cents is within a cent of the double avg
    assert row.ci_lo < true_mean < row.ci_hi
    assert abs(row.global_mean - true_mean) < 0.01
    assert row.se_mean > 0 and row.fold_std > 0
    again = fold_ci(orders.repartition(9)).collect()[0]
    assert tuple(again) == tuple(row)


def test_chi2_drift_detects_planted_category_shift(spark):
    rows = []
    for i in range(300):
        rows.append((i, "a", "en" if i % 3 else "de"))      # a: 2/3 en, 1/3 de
    for i in range(300, 500):
        rows.append((i, "b", "de" if i % 4 else "en"))      # b: mostly de
    docs = spark.createDataFrame(rows, "doc_id long, source string, lang string")
    from p2_mapreduce_spark.operators.profile import chi2_drift

    got = {r.source: r for r in chi2_drift(docs).collect()}
    assert got["a"].n_group == 300 and got["a"].n_rest == 200
    # the 2x2 design is symmetric: both directions see the same chi2
    assert got["a"].chi2_micro == got["b"].chi2_micro
    assert got["a"].chi2 > 50  # the shift is enormous by chi2/df
    # local reference on exact cells
    def chi2_ref(obs):
        (o11, o12), (o21, o22) = obs
        n = o11 + o12 + o21 + o22
        c1, c2 = o11 + o21, o12 + o22
        r1, r2 = o11 + o12, o21 + o22
        import math
        t = 0.0
        for o, r, c in [(o11, r1, c1), (o12, r1, c2), (o21, r2, c1), (o22, r2, c2)]:
            e = r * c / n
            t += (o - e) ** 2 / e
        return t
    a_en = sum(1 for i in range(300) if i % 3)
    a_de = 300 - a_en
    b_de = sum(1 for i in range(300, 500) if i % 4)
    b_en = 200 - b_de
    ref = chi2_ref(((a_en, a_de), (b_en, b_de)))
    assert abs(got["a"].chi2 - ref) < 1e-4  # micro-floor granularity


def test_l_diversity_flags_homogeneous_classes(spark):
    from p2_mapreduce_spark.operators.profile import l_diversity_audit

    df = spark.createDataFrame(
        [(1, 10, "A"), (2, 10, "A"), (3, 10, "A"),   # big but homogeneous
         (4, 20, "A"), (5, 20, "B"), (6, 20, "C")],  # diverse
        "c_custkey long, c_nationkey int, c_mktsegment string",
    )
    got = {r.c_nationkey: r for r in l_diversity_audit(df, l=3).collect()}
    assert got[10].class_size == 3 and got[10].n_sensitive == 1
    assert not got[10].l_diverse
    assert got[20].l_diverse and got[20].n_sensitive == 3


def test_t_closeness_detects_skewed_class(spark):
    from p2_mapreduce_spark.operators.profile import t_closeness_audit

    rows = []
    # class 10 mirrors the global mix; class 20 is all-A (leaky)
    for i in range(30):
        rows.append((i, 10, ["A", "B", "C"][i % 3]))
    for i in range(30, 60):
        rows.append((i, 20, "A"))
    df = spark.createDataFrame(
        rows, "c_custkey long, c_nationkey int, c_mktsegment string"
    )
    got = {r.c_nationkey: r for r in t_closeness_audit(df, t=0.2).collect()}
    # global: A=40, B=10, C=10 over 60. class 10: 10/10/10.
    # CDF walk (cats A,B,C): class10 = 1/3, 2/3, 1; global = 2/3, 5/6, 1
    emd10 = (abs(1/3 - 2/3) + abs(2/3 - 5/6) + 0.0) / 2
    emd20 = (abs(1 - 2/3) + abs(1 - 5/6) + 0.0) / 2
    assert abs(got[10].emd - emd10) < 1e-12
    assert abs(got[20].emd - emd20) < 1e-12
    assert not got[20].t_close and got[10].t_close is (emd10 <= 0.2)


def test_emd_drift_matches_local_wasserstein(spark):
    rows = []
    a_vals = [10, 10, 12, 20]
    b_vals = [14, 14, 18]
    for i, v in enumerate(a_vals):
        rows.append((i, "a", v))
    for i, v in enumerate(b_vals):
        rows.append((100 + i, "b", v))
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    from p2_mapreduce_spark.operators.profile import emd_drift

    got = {r.source: r for r in emd_drift(docs).collect()}

    def emd_ref(xs, ys):
        vals = sorted(set(xs) | set(ys))
        tot = 0.0
        ca = cb = 0
        for v, vn in zip(vals, vals[1:]):
            ca += sum(1 for x in xs if x == v)
            cb += sum(1 for y in ys if y == v)
            tot += abs(ca / len(xs) - cb / len(ys)) * (vn - v)
        return tot

    assert abs(got["a"].emd - emd_ref(a_vals, b_vals)) < 1e-12
    # symmetric by definition
    assert abs(got["a"].emd - got["b"].emd) < 1e-12


def test_benford_audit_on_planted_geometric_data(spark):
    """A geometric series (perfectly Benford) lands near the expected
    ppm; the ppm table itself matches log10(1+1/d)."""
    import math

    from p2_mapreduce_spark.operators.profile import BENFORD_PPM, benford_audit

    for d, ppm in BENFORD_PPM.items():
        assert ppm == int(math.log10(1 + 1 / d) * 1_000_000)
    # 10^(k/1000) for k=0..2999 spans 3 decades uniformly in log space
    rows = [(i, 10 ** (i / 1000.0)) for i in range(3000)]
    df = spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")
    got = {r.digit: r for r in benford_audit(df).collect()}
    assert set(got) == set(range(1, 10))
    for d, r in got.items():
        assert abs(r.dev_ppm) < 5000  # within 0.5% absolute of Benford
        assert r.obs_ppm == (r.n_obs * 1_000_000) // 3000


def test_gini_known_distributions(spark):
    from p2_mapreduce_spark.operators.profile import gini_concentration

    rows = []
    # group "eq": perfectly equal -> G = 0
    for i in range(10):
        rows.append((i, "eq", 100.0))
    # group "skew": one whale among zeros-ish -> G near (n-1)/n
    for i in range(10, 19):
        rows.append((i, "skew", 0.01))
    rows.append((19, "skew", 10000.0))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    got = {r.o_orderpriority: r for r in gini_concentration(df).collect()}
    assert abs(got["eq"].gini) < 1e-12
    assert got["skew"].gini > 0.85
    # hand formula check on the skew group
    cs = sorted([1] * 9 + [1000000])
    n = 10
    six = sum((i + 1) * c for i, c in enumerate(cs))
    sx = sum(cs)
    expect = (2.0 * six - (n + 1) * sx) / (n * sx)
    assert abs(got["skew"].gini - expect) < 1e-12
