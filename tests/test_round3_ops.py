"""Round-3 regression tests: contract guards, de-funneled ranks, sketch
rolling median, overflow-safe drift stats, and the real pixel codec."""

import pytest
from pyspark.sql import functions as F


def test_edit_distance_guard_trips(spark):
    """The quadratic self-join must fail fast above the row ceiling so it
    cannot be pointed at a fact table (VERDICT r02 item 5)."""
    from p2_mapreduce_spark.operators.relational import edit_distance_pairs

    big = spark.range(0, 50).select(F.concat(F.lit("n"), F.col("id")).alias("n_name"))
    with pytest.raises(ValueError, match="blocked_linkage"):
        edit_distance_pairs(big, max_rows=10)
    # under the ceiling the operator still works
    out = edit_distance_pairs(big, max_dist=2, max_rows=100)
    assert out.count() > 0


def test_grep_counts_multiple_matching_lines(spark):
    """make_grep_map emits one record per matching LINE; a doc with two
    matching lines must score n_lines=2 (ADVICE r02: the oracle used to
    hardcode 1, silently relying on single-line fixture text)."""
    from p2_mapreduce_spark.mapreduce import run_mapreduce
    from p2_mapreduce_spark.registry import count_reduce, make_grep_map

    docs = spark.createDataFrame(
        [
            ("d1", "data join here\nno match\nanother data join line"),
            ("d2", "data join once"),
            ("d3", "nothing to see"),
        ],
        ["doc_id", "text"],
    )
    out = run_mapreduce(
        docs, make_grep_map(r"\bdata join\b"), count_reduce,
        key_col="doc_id", value_col="text",
    )
    got = {r["key"]: int(r["value"]) for r in out.collect()}
    assert got == {"d1": 2, "d2": 1}


def test_t_closeness_lazy_and_single_category(spark):
    """t_closeness_audit must not fire a Spark job at plan time (ADVICE
    r02: eager glob.count()), and a single-category sensitive domain
    yields emd=0, not a div-by-zero NULL."""
    from p2_mapreduce_spark.operators.profile import t_closeness_audit

    df = spark.createDataFrame(
        [(1, "A"), (1, "A"), (2, "A"), (2, "A"), (2, "A")],
        ["c_nationkey", "c_mktsegment"],
    )
    before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    out = t_closeness_audit(df)  # plan only — no job may fire here
    after = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    assert len(after) == len(before), "t_closeness_audit ran an eager job at plan time"
    rows = {r["c_nationkey"]: r for r in out.collect()}
    assert rows[1]["emd"] == 0.0 and rows[1]["t_close"] is True
    assert rows[2]["emd"] == 0.0


def _with_shuffle_partitions(spark, n):
    import contextlib

    @contextlib.contextmanager
    def cm():
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    return cm()


def test_dict_encode_two_phase_matches_driver_rank(spark):
    """The two-phase distributed rank must reproduce the old global-window
    codes (frequency desc, value asc) under ANY shuffle-partition count
    (VERDICT r02 item 1)."""
    from p2_mapreduce_spark.operators.curation import dict_encode

    vals = ["a"] * 7 + ["b"] * 7 + ["c"] * 3 + ["d"] * 5 + ["e"] * 1
    df = spark.createDataFrame(list(enumerate(vals)), "id long, v string")
    expected = {"a": 0, "b": 1, "d": 2, "c": 3, "e": 4}
    for nparts in (1, 3, 13):
        with _with_shuffle_partitions(spark, nparts):
            codes = {r["v"]: r["code"] for r in dict_encode(df, "v", "id").collect()}
        assert codes == expected, nparts


def test_quality_calibration_partition_invariant(spark, sf_dir):
    """Two-phase per-source rank must be invariant to the range-partition
    count and equal the percent_rank definition (VERDICT r02 item 2)."""
    from p2_mapreduce_spark.operators.curation import quality_calibration
    from p2_mapreduce_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    with _with_shuffle_partitions(spark, 3):
        a = sorted(map(tuple, quality_calibration(docs).collect()))
    with _with_shuffle_partitions(spark, 17):
        b = sorted(map(tuple, quality_calibration(docs).collect()))
    assert a == b
    # spot-check the percent_rank definition per source
    by_src = {}
    for doc_id, source, quality, pct in a:
        by_src.setdefault(source, []).append((quality, doc_id, pct))
    for source, rows in by_src.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        n = len(rows)
        for i, (_, _, pct) in enumerate(rows):
            want = 0.0 if n == 1 else i / (n - 1)
            assert pct == want, (source, i)


def test_rolling_median_sketch_within_one_bucket(spark, sf_dir):
    """The hist_state-backed rolling median inverts the CDF: its anchor
    statistic is the smallest value v with 2·#(≤v) ≥ n (the inverted-CDF
    median), and the estimate — a bucket UPPER boundary — must land
    within one bucket width ($1 at the defaults) above it for every
    output day (VERDICT r02 item 3).  The interpolated median_exact
    column can sit up to half an inter-value gap away on even n, which
    is data- not sketch-error, so the pin anchors on the order
    statistic."""
    import datetime

    from p2_mapreduce_spark.operators.timeseries import rolling_median_sketch
    from p2_mapreduce_spark.session import load_table

    events = load_table(spark, sf_dir, "events")
    raw = [
        (r["ad"], r["value"])
        for r in events.selectExpr("to_date(ts) AS ad", "value").collect()
    ]
    rows = rolling_median_sketch(events).collect()
    assert rows
    for r in rows:
        d = datetime.date.fromisoformat(r["day"])
        vals = sorted(
            v for ad, v in raw if ad <= d and ad > d - datetime.timedelta(days=7)
        )
        n = len(vals)
        assert n == r["n_events"]
        inv_cdf_median = vals[(n + 1) // 2 - 1]
        assert inv_cdf_median <= r["median_est"] <= inv_cdf_median + 1.0, (
            r, inv_cdf_median,
        )


class TestBmpPixelCodec:
    """The real pixel codec (VERDICT r02 item 4): encode → decode is the
    identity, the JVM-built payload parses to the formula pixels, box
    resize matches a straight-line reference, corrupt bytes quarantine."""

    def test_encode_decode_roundtrip(self):
        from p2_mapreduce_spark.operators.multimodal import _encode_bmp, _parse_bmp

        grid = [
            [(1, 2, 3), (4, 5, 6), (7, 8, 9)],
            [(10, 11, 12), (13, 14, 15), (16, 17, 18)],
        ]
        w, h, back = _parse_bmp(_encode_bmp(grid))
        assert (w, h) == (3, 2)
        assert back == grid

    def test_jvm_payload_matches_formula(self, spark):
        from p2_mapreduce_spark.operators.multimodal import attach_bmp, _parse_bmp

        docs = spark.createDataFrame([(i, "x") for i in range(40)], ["doc_id", "text"])
        for r in attach_bmp(docs).collect():
            mid = r["media_id"]
            w, h, grid = _parse_bmp(bytes(r["payload"]))
            assert (w, h) == (4 + mid % 9, 4 + (mid * 3) % 9)
            base = (mid % 16) * 3
            for y in range(h):
                for x in range(w):
                    expect = base + 5 * x + 4 * y
                    assert grid[y][x] == (expect, expect + 7, expect + 14), (mid, x, y)

    def test_box_resize_reference(self):
        from p2_mapreduce_spark.operators.multimodal import _box_resize

        # 4x2 -> cap 2 gives 2x1; each output pixel averages a 2x2 block
        grid = [
            [(0, 0, 0), (10, 10, 10), (20, 20, 20), (30, 30, 30)],
            [(2, 2, 2), (12, 12, 12), (22, 22, 22), (32, 32, 32)],
        ]
        out, nw, nh = _box_resize(grid, 4, 2, 2)
        assert (nw, nh) == (2, 1)
        assert out == [[(6, 6, 6), (26, 26, 26)]]
        # under the cap: pass-through
        same, nw2, nh2 = _box_resize(grid, 4, 2, 8)
        assert (nw2, nh2) == (4, 2) and same == grid

    def test_corrupt_payload_quarantines(self, spark):
        from p2_mapreduce_spark.operators.multimodal import pixel_sums, resize_media

        bad = spark.createDataFrame(
            [(1, "image", bytearray(b"not a bmp")), (2, "image", None)],
            "media_id long, modality string, payload binary",
        )
        rows = {r["media_id"]: r for r in pixel_sums(bad).collect()}
        assert rows[1]["width"] == 0 and rows[1]["sum_r"] == 0
        assert rows[2]["width"] == 0
        resized = {r["media_id"]: r for r in resize_media(bad, decoder="pixels").collect()}
        assert resized[1]["width"] == 0  # passed through, stage alive


def test_iterative_ops_reliable_checkpoint(spark, tmp_path):
    """With checkpoint_dir set, the iterative ops must use RELIABLE
    checkpoints (files land in the dir — what survives executor loss on
    a real cluster) and produce identical results to the local path
    (VERDICT r02 item 8)."""
    import os

    from p2_mapreduce_spark.operators.graph import (
        bfs_hops,
        connected_components,
        connected_components_star,
        k_core,
        pagerank,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (7, 7), (8, 9), (9, 10), (10, 8)],
        ["doc_a", "doc_b"],
    )
    edges_uv = pairs.selectExpr("doc_a AS u", "doc_b AS v")
    edges_sd = pairs.selectExpr("doc_a AS src", "doc_b AS dst")
    cases = [
        lambda d: connected_components(pairs, checkpoint_dir=d),
        lambda d: connected_components_star(pairs, checkpoint_dir=d),
        lambda d: pagerank(edges_sd, iterations=2, checkpoint_dir=d),
        lambda d: bfs_hops(edges_uv, source=1, checkpoint_dir=d),
        lambda d: k_core(edges_uv, k=2, checkpoint_dir=d),
    ]
    for i, run in enumerate(cases):
        ckdir = str(tmp_path / f"ck{i}")
        local = sorted(map(tuple, run(None).collect()))
        reliable = sorted(map(tuple, run(ckdir).collect()))
        assert local == reliable, i
        # reliable checkpoints must actually have been written
        n_files = sum(len(fs) for _, _, fs in os.walk(ckdir))
        assert n_files > 0, f"case {i}: no checkpoint files in {ckdir}"


class TestRound3NewOps:
    def test_weighted_median_matches_brute_force(self, spark):
        from p2_mapreduce_spark.operators.profile import weighted_median

        rows = [("a", 10.0, 1.0), ("a", 20.0, 3.0), ("a", 30.0, 1.0),
                ("b", 5.0, 9.0), ("b", 100.0, 1.0)]
        df = spark.createDataFrame(rows, ["g", "v", "w"])
        got = {
            r["g"]: (r["total_w"], r["median_v"])
            for r in weighted_median(df, "g", "v", "w").collect()
        }
        # a: weights 1,3,1 over 10,20,30 -> cum 1,4,5; half=2.5 -> 20
        # b: weights 9,1 over 5,100 -> cum 9,10; half=5 -> 5
        assert got == {"a": (5, 20.0), "b": (10, 5.0)}

    def test_weighted_median_partition_invariant(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.profile import weighted_median
        from p2_mapreduce_spark.session import load_table
        li = load_table(spark, sf_dir, "lineitem")
        outs = []
        for n in (3, 17):
            old = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", str(n))
            try:
                outs.append(sorted(map(tuple, weighted_median(li).collect())))
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", old)
        assert outs[0] == outs[1]

    def test_kmv_sketch_contract(self, spark):
        """Non-saturated groups return the exact count; saturated groups'
        estimate lands within the KMV error envelope; the k-th hash is
        the true k-th order statistic."""
        import hashlib

        from p2_mapreduce_spark.operators.profile import kmv_distinct

        rows = [("small", i % 10) for i in range(100)]
        rows += [("big", i) for i in range(5000)]
        df = spark.createDataFrame(rows, ["g", "key"])
        got = {r["g"]: r for r in kmv_distinct(df, "g", "key", k=64).collect()}
        assert got["small"]["n_in_sketch"] == 10
        assert got["small"]["est_distinct"] == 10.0
        assert got["small"]["exact_distinct"] == 10
        big = got["big"]
        assert big["n_in_sketch"] == 64 and big["exact_distinct"] == 5000
        # KMV standard error ~ D/sqrt(k-2): allow 4 sigma
        assert abs(big["est_distinct"] - 5000) < 4 * 5000 / (62 ** 0.5)
        # k-th order statistic of the md5-60 hashes, recomputed directly
        hs = sorted(
            int(hashlib.md5(str(i).encode()).hexdigest()[17:32], 16)
            for i in range(5000)
        )
        assert big["kth_hash"] == hs[63]

    def test_mad_basic_and_degenerate(self, spark):
        from p2_mapreduce_spark.operators.timeseries import mad_outliers

        rows = (
            # g1: values 1..7 plus a wild 100 -> med 4.5c? (cents: 100..700,
            # 10000); inverted-CDF median of 8 values = 4th = 400 cents
            [("g1", float(v)) for v in (1, 2, 3, 4, 5, 6, 7, 100)]
            # g2: >half the mass at one value -> MAD 0, every other value
            # flagged (the documented degenerate convention)
            + [("g2", 5.0)] * 6
            + [("g2", 7.0), ("g2", 9.0)]
        )
        df = spark.createDataFrame(rows, ["event_type", "value"])
        got = {r["event_type"]: r for r in mad_outliers(df).collect()}
        g1 = got["g1"]
        assert g1["median_v"] == 4.0 and g1["n_events"] == 8
        # MAD: devs |c-400|: 300,200,100,0,100,200,300,9600 -> sorted
        # 0,100,100,200,200,300,300,9600; 8 values -> 4th = 200 cents
        assert g1["mad_v"] == 2.0
        # outlier iff |c-400|*10000 > 200*44478 = 8895600 -> dev > 889.56
        # cents: only the 100.0 (dev 9600)
        assert g1["n_outliers"] == 1
        g2 = got["g2"]
        assert g2["mad_v"] == 0.0 and g2["n_outliers"] == 2

    def test_token_diversity_closed_form(self, spark):
        from p2_mapreduce_spark.operators.text_analysis import token_diversity

        df = spark.createDataFrame(
            [(1, "s1", "a a b"), (2, "s1", "c"), (3, "s2", "x x x x")],
            ["doc_id", "source", "text"],
        )
        got = {r["source"]: r for r in token_diversity(df).collect()}
        # s1: counts a=2,b=1,c=1 over n=4 -> 1 - (4+1+1)/16 = 10/16
        assert got["s1"]["n_tokens"] == 4 and got["s1"]["n_types"] == 3
        assert got["s1"]["simpson"] == 10.0 / 16.0
        assert got["s1"]["ttr"] == 3.0 / 4.0
        # s2: single type -> simpson 0
        assert got["s2"]["simpson"] == 0.0

    def test_vocab_growth_closed_form(self, spark):
        from p2_mapreduce_spark.operators.text_analysis import vocab_growth

        # 4 docs, 2 checkpoints: prefix-1 = docs {1,2}, prefix-2 = all.
        # first occurrences: a,b @doc1; c @doc2; d @doc4
        df = spark.createDataFrame(
            [(1, "a b a"), (2, "b c"), (3, "a c"), (4, "d a")],
            ["doc_id", "text"],
        )
        got = {
            r["checkpoint"]: r
            for r in vocab_growth(df, n_checkpoints=2).collect()
        }
        assert got[1]["docs_prefix"] == 2 and got[1]["new_types"] == 3
        assert got[2]["docs_prefix"] == 4 and got[2]["new_types"] == 1
        assert got[1]["vocab_size"] == 3 and got[2]["vocab_size"] == 4

    def test_vocab_growth_partition_invariant(self, spark):
        from p2_mapreduce_spark.operators.text_analysis import vocab_growth

        rows = [(i, f"w{i % 7} w{i % 13} common") for i in range(1, 41)]
        df1 = spark.createDataFrame(rows, ["doc_id", "text"])
        df8 = df1.repartition(8)
        a = sorted(map(tuple, vocab_growth(df1, 5).collect()))
        b = sorted(map(tuple, vocab_growth(df8, 5).collect()))
        assert a == b
        # final point is the total distinct-type count
        assert a[-1][3] == 14  # {w0..w12} ∪ {common}


def test_prorate_pool_sums_exactly_and_orders_remainders(spark):
    """Largest-remainder invariants: per-order allocations sum EXACTLY
    to the pool, and the extra cents go to the largest remainders."""
    from p2_mapreduce_spark.operators.analytics import prorate_pool

    rows = [
        (1, 1, 33.33), (1, 2, 33.33), (1, 3, 33.34),
        (2, 1, 1.0), (2, 2, 2.0),
    ]
    df = spark.createDataFrame(rows, ["l_orderkey", "l_linenumber", "l_extendedprice"])
    out = prorate_pool(df, pool_cents=100).collect()
    by_order = {}
    for r in out:
        by_order.setdefault(r["l_orderkey"], {})[r["l_linenumber"]] = r["alloc_c"]
    assert sum(by_order[1].values()) == 100
    assert sum(by_order[2].values()) == 100
    # order 2: w=100,200 of 300; shares 33,66; leftover 1 goes to the
    # larger remainder (line 1: 100*100%300=100 vs line 2: 200*100%300=200
    # -> line 2 gets it)
    assert by_order[2] == {1: 33, 2: 67}


def test_ancestry_closure_chain(spark):
    """Recursive-CTE closure: every proper ancestor at its decimal-digit
    distance."""
    from p2_mapreduce_spark.operators.graph import ancestry_closure

    df = spark.createDataFrame([(1234,), (7,), (56,)], ["p_partkey"])
    got = {(r["p_partkey"], r["ancestor"], r["depth"])
           for r in ancestry_closure(df).collect()}
    assert got == {
        (1234, 123, 1), (1234, 12, 2), (1234, 1, 3),
        (56, 5, 1),
    }


def test_quantile_normalize_equalizes_marginals(spark):
    """After normalization every group carries the SAME value multiset
    (drawn from the global distribution at midpoint positions) — the
    defining property of quantile normalization."""
    from p2_mapreduce_spark.operators.curation import quantile_normalize

    rows = [(1, "g1", 1.0), (2, "g1", 2.0), (3, "g1", 3.0),
            (4, "g2", 10.0), (5, "g2", 20.0), (6, "g2", 30.0)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    out = quantile_normalize(df).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["event_type"], []).append(r["norm_value"])
    assert sorted(by_g["g1"]) == sorted(by_g["g2"]) == [1.0, 3.0, 20.0]


def test_systematic_sample_even_spread(spark):
    from p2_mapreduce_spark.operators.curation import systematic_sample

    df = spark.createDataFrame(
        [(i, i * 7 % 100) for i in range(100)], ["doc_id", "n_chars"]
    )
    out = systematic_sample(df, every=10).collect()
    assert len(out) == 10
    assert sorted(r["ordinal"] for r in out) == [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]


def test_kmv_overlap_identical_and_disjoint(spark):
    from p2_mapreduce_spark.operators.profile import kmv_overlap

    # identical key sets on both sides -> jaccard exactly 1.0
    rows = [("O", i % 50) for i in range(100)] + [("F", i % 50) for i in range(100)]
    df = spark.createDataFrame(rows, ["o_orderstatus", "o_custkey"])
    r = kmv_overlap(df, k=16).collect()[0]
    assert r["est_jaccard"] == 1.0 and r["k_inter"] == r["n_a_sketch"]
    assert r["exact_intersection"] == 50
    # disjoint sides -> zero intersection
    rows = [("O", i) for i in range(100)] + [("F", i + 1000) for i in range(100)]
    df = spark.createDataFrame(rows, ["o_orderstatus", "o_custkey"])
    r = kmv_overlap(df, k=16).collect()[0]
    assert r["k_inter"] == 0 and r["est_jaccard"] == 0.0
    assert r["exact_intersection"] == 0


def test_merkle_ranges_localizes_single_row_divergence(spark):
    """Changing ONE row must flip exactly one digest per level (the
    root-to-leaf path) — the property that makes the tree an O(log)
    divergence localizer."""
    from p2_mapreduce_spark.operators.profile import merkle_ranges

    rows = [(i, f"v{i}") for i in range(1, 2001)]
    a = spark.createDataFrame(rows, ["o_orderkey", "val"])
    rows_b = [(i, ("CHANGED" if i == 777 else f"v{i}")) for i in range(1, 2001)]
    b = spark.createDataFrame(rows_b, ["o_orderkey", "val"])
    kw = dict(leaf_width=64, fanout=4, levels=3)
    da = {(r["level"], r["range_id"]): r["digest"]
          for r in merkle_ranges(a, "o_orderkey", **kw).collect()}
    db = {(r["level"], r["range_id"]): r["digest"]
          for r in merkle_ranges(b, "o_orderkey", **kw).collect()}
    assert set(da) == set(db)
    diff = [k for k in da if da[k] != db[k]]
    # exactly one differing digest per level, on the path over key 777
    assert sorted(diff) == [
        (0, 777 // 64), (1, 777 // 64 // 4),
        (2, 777 // 64 // 16), (3, 777 // 64 // 64),
    ]


def test_twap_hand_computed(spark):
    """Step-interpolated time weighting: value 10 held 10 s then 20 held
    30 s -> (10·10 + 20·30)/40 = 17.5; singleton groups drop."""
    import datetime

    from p2_mapreduce_spark.operators.timeseries import twap

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, "a", t0, 10.0),
        (2, "a", t0 + datetime.timedelta(seconds=10), 20.0),
        (3, "a", t0 + datetime.timedelta(seconds=40), 30.0),
        (4, "solo", t0, 99.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "ts", "value"])
    got = {r["event_type"]: r for r in twap(df).collect()}
    assert set(got) == {"a"}
    assert got["a"]["n_events"] == 3
    assert got["a"]["span_us"] == 40_000_000
    assert got["a"]["twap"] == 17.5


def test_bitmap_count_zero_match_predicate(spark):
    """Predicates matching zero rows must report 0, not NULL (ADVICE r02)."""
    from p2_mapreduce_spark.operators.layout import bitmap_count

    df = spark.createDataFrame(
        [(1, "F", "1-URGENT"), (2, "O", "5-LOW")],
        ["o_orderkey", "o_orderstatus", "o_orderpriority"],
    )
    row = bitmap_count(df, val_a="NOPE").collect()[0]
    assert row["n_a"] == 0 and row["n_b"] == 1 and row["n_both"] == 0


def test_hist_state_stream_equals_batch(spark, sf_dir, tmp_path):
    """Streaming quantile-sketch maintenance: after all micro-batches
    drain, the persisted hist_state equals the batch sketch over all
    data bit-for-bit, and hist_quantiles answers from it identically."""
    from p2_mapreduce_spark.operators.profile import hist_state, hist_quantiles
    from p2_mapreduce_spark.session import load_table
    from p2_mapreduce_spark.streaming.sinks import hist_state_sink, load_latest_state

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "ev_src_hist")
    events.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    state_path = str(tmp_path / "hist_state")
    q = hist_state_sink(
        stream, state_path, str(tmp_path / "ck"),
        value_col="value", group_cols=("event_type",),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(map(tuple, load_latest_state(spark, state_path).collect()))
    want = sorted(map(tuple,
        hist_state(events, "value", ["event_type"], 0, 50_000, 500).collect()))
    assert got == want
    # and the state answers percentile queries identically to batch
    qs_stream = sorted(map(tuple, hist_quantiles(
        load_latest_state(spark, state_path), ["event_type"], 0, 50_000, 500
    ).collect()))
    qs_batch = sorted(map(tuple, hist_quantiles(
        hist_state(events, "value", ["event_type"], 0, 50_000, 500),
        ["event_type"], 0, 50_000, 500,
    ).collect()))
    assert qs_stream == qs_batch


class TestRound3PlanningOps:
    def test_wilson_ci_closed_form(self, spark):
        import math

        from p2_mapreduce_spark.operators.events_analytics import wilson_ci

        # one type, 3 of 4 successes
        rows = [(i, "2024-01-01 00:00:00", 1, "click", v, "{}")
                for i, v in enumerate([20.0, 30.0, 40.0, 5.0])]
        df = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        r = wilson_ci(df, success_min=10.0).collect()[0]
        assert r["n_obs"] == 4 and r["n_success"] == 3
        z2 = 1.96 * 1.96
        p, n = 0.75, 4.0
        center = (p + z2 / (2.0 * n)) / (1.0 + z2 / n)
        half = (1.96 * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))) / (
            1.0 + z2 / n
        )
        assert abs(r["wilson_lo"] - (center - half)) < 1e-12
        assert abs(r["wilson_hi"] - (center + half)) < 1e-12
        assert 0.0 <= r["wilson_lo"] <= r["phat"] <= r["wilson_hi"] <= 1.0

    def test_decayed_engagement_closed_form(self, spark):
        from p2_mapreduce_spark.operators.events_analytics import (
            decayed_engagement,
        )

        # anchor = 2024-01-03; ages 0, 1, 2 -> weights 1, 1/2, 1/4
        rows = [
            (0, "2024-01-03 10:00:00", 1, "click", 8.0, "{}"),
            (1, "2024-01-02 09:00:00", 1, "click", 8.0, "{}"),
            (2, "2024-01-01 08:00:00", 1, "click", 8.0, "{}"),
            (3, "2024-01-03 07:00:00", 2, "view", 1.11, "{}"),
        ]
        df = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        got = {r["user_id"]: r for r in decayed_engagement(df).collect()}
        # user 1: 800c*(1 + 1/2 + 1/4) = 8_000_000 + 4_000_000 + 2_000_000
        assert got[1]["decayed_micro"] == 14_000_000
        assert got[1]["decayed_value"] == 14.0
        # user 2: floor(1.11*100)=111 cents age 0 -> 1_110_000
        assert got[2]["decayed_micro"] == 1_110_000

    def test_decayed_engagement_partition_invariant(self, spark):
        from p2_mapreduce_spark.operators.events_analytics import (
            decayed_engagement,
        )

        rows = [
            (i, f"2024-01-{1 + i % 28:02d} 00:00:01", i % 5, "t", i * 0.07, "{}")
            for i in range(200)
        ]
        df = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        a = sorted(map(tuple, decayed_engagement(df).collect()))
        b = sorted(map(tuple, decayed_engagement(df.repartition(7)).collect()))
        assert a == b

    def test_join_size_estimate_closed_form(self, spark):
        from p2_mapreduce_spark.operators.profile import join_size_estimate

        left = spark.createDataFrame(
            [(1,), (1,), (2,), (3,)], ["k"]
        )
        right = spark.createDataFrame(
            [(1,), (1,), (1,), (2,), (9,)], ["k"]
        )
        r = join_size_estimate(left, right, "k", "k").collect()[0]
        # matched keys: 1 (2*3=6), 2 (1*1=1) -> est 7
        assert r["est_rows"] == 7 and r["n_keys"] == 2
        assert r["max_key_rows"] == 6 and r["heaviest_key"] == 1
        assert r["skew_ratio"] == 6.0 * 2.0 / 7.0
        # cross-check against the real join size
        assert left.join(right, "k").count() == 7

    def test_join_size_estimate_tie_breaks_min_key(self, spark):
        from p2_mapreduce_spark.operators.profile import join_size_estimate

        left = spark.createDataFrame([(5,), (3,), (8,)], ["k"])
        r = join_size_estimate(left, left, "k", "k").collect()[0]
        # all products tie at 1 -> heaviest = MIN key
        assert r["heaviest_key"] == 3 and r["est_rows"] == 3


class TestFeaturizerOps:
    def test_doc_novelty_closed_form(self, spark):
        from p2_mapreduce_spark.operators.dedup import doc_novelty

        # doc 1 introduces "a b c","b c d"; doc 2 repeats "a b c" and
        # introduces "c d e"; doc 3 is all repeats; doc 4 too short
        df = spark.createDataFrame(
            [
                (1, "a b c d"),
                (2, "a b c d e"),
                (3, "a b c"),
                (4, "x y"),
            ],
            ["doc_id", "text"],
        )
        got = {r["doc_id"]: r for r in doc_novelty(df).collect()}
        assert got[1]["n_shingles"] == 2 and got[1]["n_novel"] == 2
        assert got[2]["n_shingles"] == 3 and got[2]["n_novel"] == 1
        assert got[3]["n_shingles"] == 1 and got[3]["n_novel"] == 0
        assert got[3]["novelty"] == 0.0
        assert 4 not in got  # no shingles, no row

    def test_feature_hash_deterministic_and_bounded(self, spark):
        from p2_mapreduce_spark.operators.curation import feature_hash

        df = spark.createDataFrame(
            [(1, "alpha beta alpha"), (2, "alpha beta alpha")],
            ["doc_id", "text"],
        )
        rows = feature_hash(df, n_buckets=8).collect()
        by_doc = {}
        for r in rows:
            assert 0 <= r["bucket"] < 8
            by_doc.setdefault(r["doc_id"], {})[r["bucket"]] = r["feat"]
        # identical text -> identical feature vector
        assert by_doc[1] == by_doc[2]
        # |sum of magnitudes| conserved: 3 token occurrences
        assert sum(abs(v) for v in by_doc[1].values()) <= 3
        assert sum(abs(v) for v in by_doc[1].values()) % 2 == 3 % 2

    def test_target_encode_loo_and_singleton(self, spark):
        from p2_mapreduce_spark.operators.curation import target_encode

        df = spark.createDataFrame(
            [
                (1, "HIGH", 10.0),
                (2, "HIGH", 20.0),
                (3, "HIGH", 30.0),
                (4, "LOW", 99.0),
            ],
            ["o_orderkey", "o_orderpriority", "o_totalprice"],
        )
        got = {r["o_orderkey"]: r for r in target_encode(df).collect()}
        assert got[1]["loo_mean"] == 25.0  # (20+30)/2
        assert got[2]["loo_mean"] == 20.0
        assert got[3]["loo_mean"] == 15.0
        assert got[4]["loo_mean"] is None and got[4]["cat_n"] == 1


class TestAffinityTrendOps:
    def test_label_affinity_closed_form(self, spark):
        from p2_mapreduce_spark.operators.similarity import label_affinity

        # label 0: along e1; label 1: along e2; label 2: along (e1+e2)
        rows = [
            (0, [2.0, 0.0], 0),
            (1, [3.0, 0.0], 0),
            (2, [0.0, 5.0], 1),
            (3, [1.0, 1.0], 2),
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        got = {
            (r["label_a"], r["label_b"]): r
            for r in label_affinity(df).collect()
        }
        assert got[(0, 1)]["cosine"] == 0.0
        assert got[(0, 1)]["n_a"] == 2 and got[(0, 1)]["n_b"] == 1
        import math

        assert abs(got[(0, 2)]["cosine"] - 1 / math.sqrt(2)) < 1e-12
        assert abs(got[(1, 2)]["cosine"] - 1 / math.sqrt(2)) < 1e-12

    def test_theil_sen_robust_to_one_outlier(self, spark):
        from p2_mapreduce_spark.operators.timeseries import theil_sen_trend

        # daily totals 1,2,3,4 then a wild 100 on day 5: OLS would chase
        # it; the pairwise-slope median stays at the clean trend (+1/day)
        rows = []
        eid = 0
        for day, total in [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0), (5, 100.0)]:
            rows.append(
                (eid, f"2024-01-{day:02d} 12:00:00", 1, "t", total, "{}")
            )
            eid += 1
        df = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        r = theil_sen_trend(df).collect()[0]
        assert r["n_days"] == 5 and r["n_pairs"] == 10
        # slopes (cents/day): six clean pairs at 100, plus 2400, 3200,
        # 4800, 9600 from the outlier day -> sorted middle two are both
        # 100 -> median 100 (the +$1/day trend)
        assert r["slope_cents_per_day"] == 100.0

    def test_theil_sen_even_middle_average(self, spark):
        from p2_mapreduce_spark.operators.timeseries import theil_sen_trend

        # 3 days -> 3 pairs (odd): median is the single middle slope;
        # 4 days -> 6 pairs (even): median averages the two middles
        rows = [
            (0, "2024-01-01 00:00:01", 1, "t", 0.0, "{}"),
            (1, "2024-01-02 00:00:01", 1, "t", 1.0, "{}"),
            (2, "2024-01-03 00:00:01", 1, "t", 3.0, "{}"),
            (3, "2024-01-04 00:00:01", 1, "t", 6.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        r = theil_sen_trend(df).collect()[0]
        # slopes: 1-day: 100,200,300; 2-day: 150,250; 3-day: 200
        # sorted: 100,150,200,200,250,300 -> median (200+200)/2 = 200
        assert r["n_pairs"] == 6
        assert r["slope_cents_per_day"] == 200.0


class TestSmoothingOverlapOps:
    def test_ewma_daily_closed_form(self, spark):
        from p2_mapreduce_spark.operators.timeseries import ewma_daily

        # days 1..3 totals $1, $2, $4: ewma(d3) = 400 + 200/2 + 100/4
        rows = [
            (0, "2024-01-01 01:00:00", 1, "t", 1.0, "{}"),
            (1, "2024-01-02 01:00:00", 1, "t", 2.0, "{}"),
            (2, "2024-01-03 01:00:00", 1, "t", 4.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        got = {r["day"]: r for r in ewma_daily(df).collect()}
        assert got["2024-01-01"]["ewma_micro"] == 1_000_000
        assert got["2024-01-02"]["ewma_micro"] == 2_000_000 + 500_000
        assert got["2024-01-03"]["ewma_micro"] == 4_000_000 + 1_000_000 + 250_000
        assert got["2024-01-03"]["ewma_value"] == 5.25
        assert got["2024-01-03"]["day_value"] == 4.0

    def test_ewma_daily_gap_decays_through_missing_days(self, spark):
        from p2_mapreduce_spark.operators.timeseries import ewma_daily

        # a 2-day gap: day 4 sees day 1 at weight 1/8 (age counts
        # calendar days, not observation ranks)
        rows = [
            (0, "2024-01-01 01:00:00", 1, "t", 8.0, "{}"),
            (1, "2024-01-04 01:00:00", 1, "t", 1.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        got = {r["day"]: r for r in ewma_daily(df).collect()}
        assert got["2024-01-04"]["ewma_micro"] == 1_000_000 + 1_000_000
        # no synthetic rows for the silent days
        assert set(got) == {"2024-01-01", "2024-01-04"}

    def test_audience_overlap_closed_form(self, spark):
        from p2_mapreduce_spark.operators.events_analytics import (
            audience_overlap,
        )

        # users 1,2 do A; users 2,3,4 do B; user 4 also C
        rows = []
        for i, (u, t) in enumerate(
            [(1, "A"), (2, "A"), (2, "B"), (3, "B"), (4, "B"), (4, "C"),
             (2, "B")]  # duplicate event must not double-count
        ):
            rows.append((i, "2024-01-01 00:00:01", u, t, 1.0, "{}"))
        df = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        got = {
            (r["type_a"], r["type_b"]): r for r in audience_overlap(df).collect()
        }
        ab = got[("A", "B")]
        assert (ab["n_both"], ab["n_a"], ab["n_b"]) == (1, 2, 3)
        assert ab["jaccard"] == 1.0 / 4.0
        bc = got[("B", "C")]
        assert (bc["n_both"], bc["n_b"]) == (1, 1)
        assert ("A", "C") not in got  # disjoint audiences produce no row


def test_cms_stream_equals_batch_and_query_bounds(spark, sf_dir, tmp_path):
    """Streaming CMS maintenance: after all micro-batches drain the
    persisted state equals the batch sketch bit-for-bit (linear-sketch
    merge), point queries are one-sided (est >= true), and the split
    merge is associative."""
    from p2_mapreduce_spark.operators.text_analysis import (
        cms_query,
        cms_state,
        merge_cms_states,
    )
    from p2_mapreduce_spark.session import load_table
    from p2_mapreduce_spark.streaming.sinks import (
        cms_state_sink,
        load_latest_state,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    # associativity: split ⊕ split == direct
    lo = docs.filter(F.col("doc_id") % 2 == 0)
    hi = docs.filter(F.col("doc_id") % 2 == 1)
    merged = sorted(
        map(tuple, merge_cms_states(cms_state(lo), cms_state(hi)).collect())
    )
    direct = sorted(map(tuple, cms_state(docs).collect()))
    assert merged == direct
    # streaming fold == batch
    src = str(tmp_path / "docs_src")
    docs.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = cms_state_sink(stream, str(tmp_path / "cms"), str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        map(
            tuple,
            load_latest_state(spark, str(tmp_path / "cms"))
            .select("seed", "b", "bucket_cnt")
            .collect(),
        )
    )
    assert got == direct
    # one-sided point estimates vs exact counts
    exact = (
        docs.select(F.explode(F.split(F.lower("text"), r"\W+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .limit(20)
    )
    est = cms_query(
        load_latest_state(spark, str(tmp_path / "cms")), exact.select("word")
    )
    joined = {r["word"]: r for r in est.join(exact, "word").collect()}
    assert joined
    for w, r in joined.items():
        assert r["cms_est"] >= r["cnt"], w


def test_golden_record_survivorship_rule(spark):
    """Longest doc wins; tie breaks to the SMALLEST doc_id; provenance
    is the sorted distinct source list; singletons don't appear."""
    from p2_mapreduce_spark.operators.dedup import golden_record

    # docs 1,2,3 near-identical (cluster); 2 and 3 tie on length ->
    # canonical must be 2; doc 9 unrelated singleton
    base = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [
            (1, base, "en", "srcB", len(base)),
            (2, base + " iota", "en", "srcA", len(base) + 5),
            (3, base + " kappa", "en", "srcC", len(base) + 5),
            (9, "totally different words here nothing shared at all x y z",
             "en", "srcZ", 56),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    rows = golden_record(df, threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["cluster_size"] == 3 and r["n_dropped"] == 2
    assert r["canonical_id"] == 2 and r["canonical_chars"] == len(base) + 5
    assert r["sources"] == "srcA,srcB,srcC"


def test_trimmed_mean_closed_form_and_invariance(spark):
    from p2_mapreduce_spark.operators.profile import trimmed_mean

    # 10 rows 1..10 dollars, trim 10% -> k=1: drop 1.0 and 10.0,
    # mean of 2..9 = 5.5
    rows = [
        (i, "2024-01-01 00:00:01", 1, "t", float(i + 1), "{}") for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    r = trimmed_mean(df).collect()[0]
    assert (r["n"], r["n_trimmed"], r["n_kept"]) == (10, 2, 8)
    assert r["trimmed_mean"] == 5.5
    a = sorted(map(tuple, trimmed_mean(df).collect()))
    b = sorted(map(tuple, trimmed_mean(df.repartition(7)).collect()))
    assert a == b


def test_neyman_alloc_sums_exactly_and_weights_by_spread(spark):
    from p2_mapreduce_spark.operators.curation import neyman_alloc

    # stratum A: wide spread; B: same size, tiny spread; C: singleton
    rows = []
    eid = 0
    for v in [0.0, 100.0, 0.0, 100.0]:
        rows.append((eid, "2024-01-01 00:00:01", 1, "A", v, "{}")); eid += 1
    for v in [50.0, 50.01, 50.0, 50.01]:
        rows.append((eid, "2024-01-01 00:00:01", 1, "B", v, "{}")); eid += 1
    rows.append((eid, "2024-01-01 00:00:01", 1, "C", 7.0, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = {r["event_type"]: r for r in neyman_alloc(df, n_total=100).collect()}
    assert sum(r["alloc"] for r in got.values()) == 100
    # variance-dominant stratum takes nearly everything
    assert got["A"]["alloc"] > 99 * got["B"]["alloc"] / 100
    assert got["A"]["alloc"] >= 99
    # singleton stratum: sigma 0, alloc 0
    assert got["C"]["sigma"] == 0.0 and got["C"]["alloc"] == 0


def test_ooo_rate_detects_regressions(spark):
    """A stream with two late arrivals: counts, ppm floor-quantization,
    and the max regression magnitude in exact µs."""
    from p2_mapreduce_spark.operators.profile import ooo_rate

    rows = [
        (0, "2024-01-01 00:00:10", 1, "t", 1.0, "{}"),
        (1, "2024-01-01 00:00:20", 1, "t", 1.0, "{}"),
        (2, "2024-01-01 00:00:05", 1, "t", 1.0, "{}"),   # 15 s late
        (3, "2024-01-01 00:00:30", 1, "t", 1.0, "{}"),
        (4, "2024-01-01 00:00:29.5", 1, "t", 1.0, "{}"),  # 0.5 s late
        (5, "2024-01-01 00:00:40", 1, "t", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    r = ooo_rate(df).collect()[0]
    assert (r["n_events"], r["n_pairs"], r["n_ooo"]) == (6, 5, 2)
    assert r["ooo_ppm"] == 2 * 1000000 // 5
    assert r["max_regression_us"] == 15_000_000
    # partition invariance of the distributed lag
    a = sorted(map(tuple, ooo_rate(df).collect()))
    b = sorted(map(tuple, ooo_rate(df.repartition(5)).collect()))
    assert a == b


class TestBasketZipfOps:
    def test_assoc_rules_closed_form(self, spark):
        from p2_mapreduce_spark.operators.analytics import assoc_rules

        # baskets: {1,2} x3, {1,3} x1  (l_orderkey, l_partkey)
        rows = [
            (10, 1), (10, 2),
            (11, 1), (11, 2),
            (12, 1), (12, 2),
            (13, 1), (13, 3),
        ]
        df = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
        got = {
            (r["antecedent"], r["consequent"]): r
            for r in assoc_rules(df, min_pair_orders=3).collect()
        }
        # only the {1,2} pair survives the floor, both directions
        assert set(got) == {(1, 2), (2, 1)}
        r12, r21 = got[(1, 2)], got[(2, 1)]
        assert r12["n_both"] == 3 and r12["n_ante"] == 4 and r12["n_cons"] == 3
        assert r12["confidence"] == 3.0 / 4.0
        assert r21["confidence"] == 1.0
        # lift = n_ab * n_total / (n_a * n_b) = 3*4/(4*3) = 1.0 both ways
        assert r12["lift"] == 1.0 and r21["lift"] == 1.0

    def test_zipf_buckets_boundaries_and_shares(self, spark):
        from p2_mapreduce_spark.operators.text_analysis import zipf_buckets

        # 1500 distinct singleton words + one word with 500 occurrences:
        # rank 1 = the heavy word; singletons fill ranks 2..1501 ->
        # all four buckets populated, boundaries exact
        docs = [(0, " ".join(["heavy"] * 500))]
        docs += [(i + 1, f"w{i:04d}") for i in range(1500)]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {r["bucket"]: r for r in zipf_buckets(df).collect()}
        assert set(got) == {"1_head10", "2_top100", "3_top1000", "4_tail"}
        h = got["1_head10"]
        assert h["n_types"] == 10 and h["max_rank"] == 10
        assert h["token_mass"] == 500 + 9  # heavy + 9 singletons
        assert got["2_top100"]["n_types"] == 90
        assert got["3_top1000"]["n_types"] == 900
        assert got["4_tail"]["n_types"] == 501 and got["4_tail"]["max_rank"] == 1501
        total = sum(r["token_mass"] for r in got.values())
        assert total == 2000
        assert abs(sum(r["mass_share"] for r in got.values()) - 1.0) < 1e-12


def test_acf_lags_constant_and_alternating(spark):
    """Hand-checkable ACF: a constant series has zero variance (NULL
    acf); a perfectly alternating daily series has acf(1) = -1 at even
    n (mean exactly centered) and acf(2) near +1."""
    import datetime

    from p2_mapreduce_spark.operators.timeseries import acf_lags

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for d in range(8):
        # alternating 10.00 / 20.00; constant 5.00
        rows.append((base + datetime.timedelta(days=d), "alt",
                     10.0 if d % 2 == 0 else 20.0))
        rows.append((base + datetime.timedelta(days=d), "flat", 5.0))
    df = spark.createDataFrame(rows, ["ts", "event_type", "value"])
    out = {(r["event_type"], r["lag"]): r for r in acf_lags(df).collect()}
    assert out[("flat", 1)]["acf"] is None
    a1 = out[("alt", 1)]
    assert a1["n_days"] == 8 and a1["n_pairs"] == 7
    # sum of dev_t*dev_{t+1} = -7*(n*500)^2 ; den = 8*(n*500)^2 -> -7/8
    assert abs(a1["acf"] - (-7.0 / 8.0)) < 1e-12
    assert abs(out[("alt", 2)]["acf"] - (6.0 / 8.0)) < 1e-12


def test_degree_assortativity_star_vs_cycle(spark):
    """A star graph is maximally disassortative (r = -1); a cycle is
    perfectly regular (zero degree variance -> NULL)."""
    from p2_mapreduce_spark.operators.graph import degree_assortativity

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], ["u", "v"]
    )
    r = degree_assortativity(star).collect()[0]
    assert r["n_nodes"] == 6 and r["n_edges"] == 5 and r["max_degree"] == 5
    assert abs(r["assortativity"] - (-1.0)) < 1e-12
    cycle = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], ["u", "v"]
    )
    c = degree_assortativity(cycle).collect()[0]
    assert c["n_edges"] == 6 and c["assortativity"] is None
    # duplicates + both orientations + self-loops collapse
    messy = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 1), (2, 2), (1, 2)], ["u", "v"]
    )
    m = degree_assortativity(messy).collect()[0]
    assert m["n_edges"] == 2 and m["n_nodes"] == 3


def test_funnel_windowed_drops_late_steps(spark):
    """A click 25 h after the first view must break the chain at step 2
    even though a purchase follows inside its own gap; an in-window
    user converts fully."""
    import datetime

    from p2_mapreduce_spark.operators.events_analytics import funnel_windowed

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    h = datetime.timedelta(hours=1)
    rows = [
        # u1: view -> click(+2h) -> purchase(+3h): fully in window
        (1, "view", t0), (1, "click", t0 + 2 * h), (1, "purchase", t0 + 3 * h),
        # u2: click lands 25h after first view -> drops at step 2
        (2, "view", t0), (2, "click", t0 + 25 * h), (2, "purchase", t0 + 26 * h),
        # u3: click in window, purchase out -> drops at step 3
        (3, "view", t0), (3, "click", t0 + 1 * h), (3, "purchase", t0 + 30 * h),
        # u4: purchase BEFORE click never counts (order is strict)
        (4, "view", t0), (4, "purchase", t0 + 1 * h), (4, "click", t0 + 2 * h),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = {r["step"]: r for r in funnel_windowed(df).collect()}
    assert out[1]["n_users"] == 4
    assert out[2]["n_users"] == 3          # u1, u3, u4
    assert out[3]["n_users"] == 1          # only u1
    assert abs(out[3]["pct_of_first"] - 0.25) < 1e-15


def test_fd_violations_holds_and_violated(spark):
    """A held dependency reports zero violations; a broken one counts
    exactly the violating keys and the worst key's cardinality."""
    from p2_mapreduce_spark.operators.profile import fd_violations

    df = spark.createDataFrame(
        [(1, "a", 10), (1, "a", 10), (2, "b", 20), (2, "c", 20), (3, "b", 30)],
        ["k", "dep1", "dep2"],
    )
    out = {(r["det_col"], r["dep_col"]): r
           for r in fd_violations(df, [("k", "dep1"), ("k", "dep2")]).collect()}
    held = out[("k", "dep2")]
    assert held["n_violating"] == 0 and held["violation_ppm"] == 0
    broken = out[("k", "dep1")]
    assert broken["n_keys"] == 3 and broken["n_violating"] == 1
    assert broken["max_distinct"] == 2
    assert broken["violation_ppm"] == 333333  # floor(1e6/3)


def test_join_view_delta_equals_direct_join(spark):
    """V_old ∪ ΔV must equal the direct join of the unioned tables —
    the delta-join algebra, checked row-for-row on a fixture with
    matches in every quadrant (old-old, new-old, old-new, new-new)."""
    from p2_mapreduce_spark.operators.merge import join_view_delta

    a_old = spark.createDataFrame([(1, "ao1"), (2, "ao2")], ["ak", "av"])
    a_new = spark.createDataFrame([(1, "an1"), (3, "an3")], ["ak", "av"])
    b_old = spark.createDataFrame([(1, "bo1"), (3, "bo3")], ["bk", "bv"])
    b_new = spark.createDataFrame([(2, "bn2"), (1, "bn1")], ["bk", "bv"])
    delta = join_view_delta(a_old, a_new, b_old, b_new, "ak", "bk")
    v_old = a_old.join(b_old, a_old.ak == b_old.bk)
    got = sorted(
        (r["ak"], r["av"], r["bv"]) for r in v_old.unionByName(delta).collect()
    )
    a_all, b_all = a_old.unionByName(a_new), b_old.unionByName(b_new)
    want = sorted(
        (r["ak"], r["av"], r["bv"])
        for r in a_all.join(b_all, a_all.ak == b_all.bk).collect()
    )
    assert got == want and len(got) == 6


def test_ab_quantile_diff_exact_medians_and_invariance(spark):
    """Hand-built arms: medians are exact order statistics with the
    (lo+hi)/200 pinned tree; result invariant to input partitioning."""
    from p2_mapreduce_spark.operators.events_analytics import ab_quantile_diff

    # md5-coin arms for user ids 1..8 (must match the operator's coin)
    from pyspark.sql import functions as F

    users = spark.range(1, 9).select(F.col("id").alias("user_id"))
    arms = {
        r["user_id"]: r["arm"]
        for r in users.select(
            "user_id",
            (
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 18, 15),
                    16,
                    10,
                ).cast("long")
                % 2
            ).alias("arm"),
        ).collect()
    }
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    vals = {0: [], 1: []}
    for i, (u, arm) in enumerate(sorted(arms.items())):
        v = 10.0 + i  # distinct values
        vals[arm].append(int(v * 100))
        rows.append((i, u, "purchase", v, t0))
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "value", "ts"]
    )

    def exact_median(cents):
        s = sorted(cents)
        n = len(s)
        lo, hi = s[(n + 1) // 2 - 1], s[(n + 2) // 2 - 1]
        return (lo + hi) / 200.0

    out = ab_quantile_diff(df).collect()[0]
    assert out["n_a"] == len(vals[0]) and out["n_b"] == len(vals[1])
    assert out["median_a"] == exact_median(vals[0])
    assert out["median_b"] == exact_median(vals[1])
    out2 = ab_quantile_diff(df.repartition(7)).collect()[0]
    assert out2 == out


def test_price_volume_decomp_identity_and_anchor(spark):
    """Effects must reconstruct the exact delta (evaluated on the same
    float trees) and the anchor year is data-driven: constructed fixture
    with known price x volume moves."""
    import datetime

    from p2_mapreduce_spark.operators.analytics import price_volume_decomp

    d23 = datetime.datetime(2023, 6, 1)
    d24 = datetime.datetime(2024, 6, 1)
    li = spark.createDataFrame(
        [
            # brand A: volume doubles at constant unit price 2.00
            (1, 10.0, 20.0, d23), (1, 20.0, 40.0, d24),
            # brand B: price doubles at constant volume
            (2, 10.0, 10.0, d23), (2, 10.0, 20.0, d24),
            # brand C: trades only in 2024 -> dropped
            (3, 5.0, 5.0, d24),
        ],
        ["l_partkey", "l_quantity", "l_extendedprice", "l_shipdate"],
    )
    part = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C")], ["p_partkey", "p_brand"]
    )
    out = {r["p_brand"]: r for r in price_volume_decomp(li, part).collect()}
    assert set(out) == {"A", "B"}
    a = out["A"]
    assert a["delta_cents"] == 2000
    assert a["volume_effect_cents"] == 2000.0  # all volume
    assert a["price_effect_cents"] == 0.0
    b = out["B"]
    assert b["delta_cents"] == 1000
    assert b["volume_effect_cents"] == 0.0
    assert b["price_effect_cents"] == 1000.0


def test_rfm_segments_exact_quintiles_and_invariance(spark):
    """20 customers with metric = id: quintile boundaries are the exact
    integer formula, every cell holds 4 customers on each axis, and the
    grid is invariant to input partitioning."""
    import datetime

    from pyspark.sql import functions as F

    from p2_mapreduce_spark.operators.analytics import rfm_segments

    base = datetime.datetime(2024, 1, 1)
    rows = []
    oid = 0
    for cust in range(1, 21):
        # cust k: k orders of 100.00 each, most recent day k -> all three
        # metrics are strictly increasing in k (recency negated ranks
        # day-20 highest)
        for j in range(cust):
            oid += 1
            rows.append(
                (oid, cust, 100.0, base + datetime.timedelta(days=cust))
            )
    df = spark.createDataFrame(
        rows, ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    out = rfm_segments(df).collect()
    # perfectly correlated metrics -> only diagonal cells (r==f==m),
    # 4 customers per quintile
    cells = {(r["r_score"], r["f_score"], r["m_score"]): r["n_customers"]
             for r in out}
    assert cells == {(q, q, q): 4 for q in range(1, 6)}
    out2 = rfm_segments(df.repartition(13)).collect()
    assert sorted(map(tuple, out2)) == sorted(map(tuple, out))


def test_interarrival_regular_vs_bursty(spark):
    """A perfectly regular series has CV²=0; a maximally bursty pair
    pattern (gaps alternating 0-ish/large) pushes CV² toward 1; values
    verified against the closed form on hand gaps."""
    import datetime

    from p2_mapreduce_spark.operators.timeseries import interarrival_stats

    t0 = datetime.datetime(2024, 1, 1)
    s = datetime.timedelta(seconds=1)
    rows = []
    # regular: events at 0,10,20,30,40 s
    for i in range(5):
        rows.append((i, "reg", t0 + 10 * i * s))
    # bursty: gaps 1,19,1,19 s
    ts = [0, 1, 20, 21, 40]
    for i, x in enumerate(ts):
        rows.append((100 + i, "bur", t0 + x * s))
    df = spark.createDataFrame(rows, ["event_id", "event_type", "ts"])
    out = {r["event_type"]: r for r in interarrival_stats(df).collect()}
    reg = out["reg"]
    assert reg["n_pairs"] == 4 and reg["cv2"] == 0.0
    assert reg["mean_gap_us"] == 10_000_000.0
    bur = out["bur"]
    gaps = [1, 19, 1, 19]
    sd, sdd, n = sum(gaps), sum(g * g for g in gaps), len(gaps)
    want = (n * sdd * 1e12 - (sd * 1e6) ** 2) / (sd * 1e6) ** 2
    assert abs(bur["cv2"] - want) < 1e-12
    # partition invariance
    out2 = {r["event_type"]: r for r in
            interarrival_stats(df.repartition(9)).collect()}
    assert out2["bur"]["cv2"] == bur["cv2"]


def test_readability_hand_counts(spark):
    """Hand-counted Flesch on a two-sentence doc; fragment with no
    terminator floors at one sentence; empty text yields NULL."""
    from p2_mapreduce_spark.operators.text_analysis import readability_by_source

    df = spark.createDataFrame(
        [
            # "the cat sat. it ran!" -> words 6? no: the,cat,sat,it,ran=5
            # syllable groups: e,a,a,i,a = 5; sentences 2
            ("s1", "The cat sat. It ran!"),
            ("s2", "no terminator here"),
            ("s3", "..."),
        ],
        ["source", "text"],
    )
    out = {r["source"]: r for r in readability_by_source(df).collect()}
    s1 = out["s1"]
    assert s1["n_words"] == 5 and s1["n_sentences"] == 2
    assert s1["n_syllables"] == 5
    want = 206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5)
    assert abs(s1["flesch"] - want) < 1e-12
    assert out["s2"]["n_sentences"] == 1  # floored
    assert out["s3"]["n_words"] == 0 and out["s3"]["flesch"] is None


def test_skipping_audit_zorder_prunes_better(spark):
    """Exact pruning math on a full 256x256 key grid (bits=8,
    drop_bits=8 -> 256 z-squares of 16x16 vs 256 width-1 linear
    buckets): the 2-D box (1..64)x(1..4) touches 64/256 linear buckets
    but only the 5 z-squares whose column AND row ranges intersect."""
    from pyspark.sql import functions as F

    from p2_mapreduce_spark.operators.layout import skipping_audit

    grid = (
        spark.range(0, 256 * 256)
        .select(
            (F.col("id") % 256).alias("l_partkey"),
            (F.col("id") / 256).cast("bigint").alias("l_suppkey"),
        )
    )
    out = {
        r["layout"]: r
        for r in skipping_audit(grid, bits=8, drop_bits=8).collect()
    }
    lin, zo = out["linear"], out["zorder"]
    assert lin["n_buckets"] == 256 and zo["n_buckets"] == 256
    assert lin["buckets_touched"] == 64          # prunes on k1 only
    assert zo["buckets_touched"] == 5            # 5 squares x row 0
    assert zo["touch_ppm"] < lin["touch_ppm"]


def test_topn_others_conserves_revenue(spark, sf_dir):
    """The top-3 + OTHERS block must conserve each nation's total cents
    exactly, and a nation with <= 3 customers carries no OTHERS row."""
    from pyspark.sql import functions as F

    from p2_mapreduce_spark.operators.analytics import topn_with_others
    from p2_mapreduce_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    out = topn_with_others(orders, cust, nat)
    got = {
        r["n_name"]: r["total"]
        for r in out.groupBy("n_name")
        .agg(F.sum("revenue_cents").alias("total"))
        .collect()
    }
    want = {
        r["n_name"]: r["total"]
        for r in orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nat, cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "total"
            )
        )
        .collect()
    }
    assert got == want
    per_block = {
        (r["n_name"],): r for r in out.collect() if r["label"] == "OTHERS"
    }
    sizes = {
        r["n_name"]: r["cnt"]
        for r in out.groupBy("n_name").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for nname, cnt in sizes.items():
        assert cnt <= 4


def test_column_churn_null_semantics_and_counts(spark):
    """NULL->value counts as a change, NULL->NULL does not; per-column
    counts are independent; unmatched keys never enter the audit."""
    from p2_mapreduce_spark.operators.merge import column_churn

    a = spark.createDataFrame(
        [(1, 10.0, None), (2, 20.0, "x"), (3, 30.0, "y"), (9, 90.0, "z")],
        ["k", "price", "tag"],
    )
    b = spark.createDataFrame(
        [(1, 10.0, "now"), (2, 21.0, "x"), (3, 30.0, None), (8, 80.0, "w")],
        ["k", "price", "tag"],
    )
    out = {r["column"]: r
           for r in column_churn(a, b, ("k",), ("price", "tag")).collect()}
    assert out["price"]["n_matched"] == 3
    assert out["price"]["n_changed"] == 1          # only k=2
    assert out["tag"]["n_changed"] == 2            # NULL->now, y->NULL
    assert out["tag"]["churn_ppm"] == 666666


def test_revenue_concentration_hand_computed(spark):
    """10 customers with revenue 1..10: top-10% = 1 customer (the 10),
    top-25% -> ceil(2.5)=3 customers (10+9+8=27 of 55); shares exact."""
    import datetime

    from p2_mapreduce_spark.operators.analytics import revenue_concentration

    d = datetime.datetime(2024, 1, 1)
    rows = [(i, i, float(i), d) for i in range(1, 11)]
    df = spark.createDataFrame(
        rows, ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    out = {r["pct_ppm"]: r for r in revenue_concentration(df).collect()}
    top10 = out[100_000]
    assert top10["n_top"] == 1 and top10["top_cents"] == 1000
    assert top10["share"] == 1000 / 5500
    top25 = out[250_000]
    assert top25["n_top"] == 3 and top25["top_cents"] == 2700
    # invariance to partitioning
    again = {r["pct_ppm"]: r["top_cents"]
             for r in revenue_concentration(df.repartition(5)).collect()}
    assert again == {k: v["top_cents"] for k, v in out.items()}


def test_nearest_join_two_sided_and_tolerance(spark):
    """Forward signup closer than backward wins; equal distance picks
    the earlier; outside tolerance nulls out."""
    import datetime

    from p2_mapreduce_spark.operators.relational import nearest_event_join

    t = datetime.datetime(2024, 1, 10, 12)
    h = datetime.timedelta(hours=1)
    rows = [
        # u1: signup 5h before and 2h after -> forward (+2h) wins
        (1, 1, "signup", t - 5 * h), (2, 1, "purchase", t),
        (3, 1, "signup", t + 2 * h),
        # u2: signups exactly 3h both sides -> tie -> earlier (backward)
        (4, 2, "signup", t - 3 * h), (5, 2, "purchase", t),
        (6, 2, "signup", t + 3 * h),
        # u3: only a signup 30h away -> outside 24h tolerance -> null
        (7, 3, "signup", t - 30 * h), (8, 3, "purchase", t),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "event_type", "ts"])
    out = {r["user_id"]: r for r in nearest_event_join(df).collect()}
    assert out[1]["gap_us"] == 2 * 3600 * 1_000_000
    assert out[2]["gap_us"] == -3 * 3600 * 1_000_000
    assert out[3]["nearest_signup_ts"] is None and out[3]["gap_us"] is None


def test_hybrid_skew_join_equals_plain_join_and_splits_paths(spark):
    """The hot/cold union must equal the plain join row-for-row, with
    both paths actually exercised at the chosen threshold."""
    from pyspark.sql import functions as F

    from p2_mapreduce_spark.operators.skew import hybrid_skew_join

    # key 1 is hot (8 rows), keys 2..4 cold (1 row each)
    fact = spark.createDataFrame(
        [(1, i) for i in range(8)] + [(k, 100 + k) for k in (2, 3, 4)],
        ["k", "payload"],
    )
    dim = spark.createDataFrame(
        [(1, "hot"), (2, "c2"), (3, "c3"), (5, "nomatch")], ["dk", "tag"]
    )
    out = hybrid_skew_join(fact, dim, "k", "dk", heavy_threshold=5)
    got = sorted((r["k"], r["payload"], r["tag"]) for r in out.collect())
    plain = fact.join(dim, fact.k == dim.dk)
    want = sorted((r["k"], r["payload"], r["tag"]) for r in plain.collect())
    assert got == want
    assert sum(1 for k, _, _ in got if k == 1) == 8   # hot path rows
    assert sum(1 for k, _, _ in got if k in (2, 3)) == 2  # cold path rows


def test_seasonal_outliers_flags_break_not_weekend(spark):
    """A weekly pattern (weekends 2x) with one broken Wednesday: the
    plain-z trap days (ordinary weekends) stay clean, the broken day
    flags."""
    import datetime

    from p2_mapreduce_spark.operators.timeseries import seasonal_outliers

    rows, eid = [], 0
    base = datetime.date(2024, 1, 1)  # a Monday
    for d in range(28):
        day = base + datetime.timedelta(days=d)
        weekend = day.weekday() >= 5
        v = 200.0 if weekend else 100.0
        if d == 16:          # a Wednesday gone wrong
            v = 1000.0
        eid += 1
        rows.append((eid, "purchase",
                     datetime.datetime.combine(day, datetime.time(12)), v))
    df = spark.createDataFrame(rows, ["event_id", "event_type", "ts", "value"])
    out = {r["day"]: r for r in seasonal_outliers(df).collect()}
    flagged = [d for d, r in out.items() if r["is_outlier"]]
    assert flagged == ["2024-01-17"]
    # weekends are NOT flagged despite being 2x the weekday level
    assert not out["2024-01-06"]["is_outlier"]
    assert not out["2024-01-07"]["is_outlier"]


def test_exact_quantiles_small_group(spark):
    """10 values 1..10: type-1 quantiles are p50=5, p95=10, p99=10
    (rank ceil(q*n)); result invariant to partitioning."""
    import datetime

    from p2_mapreduce_spark.operators.profile import exact_quantiles

    t = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, "a", float(i), t) for i in range(1, 11)],
        ["event_id", "event_type", "value", "ts"],
    )
    r = exact_quantiles(df).collect()[0]
    assert (r["q50"], r["q95"], r["q99"]) == (5.0, 10.0, 10.0)
    r2 = exact_quantiles(df.repartition(7)).collect()[0]
    assert r == r2


def test_stickiness_bounds_and_hand_case(spark):
    """Stickiness is DAU/MAU in (0, 1]; a user active every day keeps a
    single-user series at exactly 1.0."""
    import datetime

    from p2_mapreduce_spark.operators.timeseries import stickiness

    t0 = datetime.datetime(2024, 1, 1, 9)
    rows = [(d, 1, t0 + datetime.timedelta(days=d)) for d in range(5)]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    out = stickiness(df).collect()
    assert len(out) == 5
    assert all(r["stickiness"] == 1.0 and r["mau"] == 1 for r in out)


def test_lm_bigram_score_ranks_fluent_above_shuffled(spark):
    """Corpus of repeated 'x y' prose vs one rare-order doc: the fluent
    doc's mean smoothed bigram probability is far higher; a 1-token doc
    yields no bigram row; result invariant to partitioning."""
    from p2_mapreduce_spark.operators.text_analysis import lm_bigram_score

    rows = [(i, "x y x y x y", "en", "s") for i in range(5)]
    rows += [(100, "x z", "en", "s"), (101, "x", "en", "s")]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    out = {r["doc_id"]: r for r in lm_bigram_score(docs).collect()}
    assert 101 not in out  # no bigrams in a 1-token doc
    assert out[0]["n_bigrams"] == 5
    assert out[100]["n_bigrams"] == 1
    # c(x,y)=15, c(y,x)=10, c(x,z)=1, c(x.)=16, c(y.)=10, V=3
    assert out[100]["lm_ppm"] == (1_000_000 * 2) // (16 + 3)
    assert out[0]["lm_ppm"] > 5 * out[100]["lm_ppm"]
    out2 = {
        r["doc_id"]: r
        for r in lm_bigram_score(docs.repartition(7)).collect()
    }
    assert {k: (v["n_bigrams"], v["lm_ppm"]) for k, v in out.items()} == {
        k: (v["n_bigrams"], v["lm_ppm"]) for k, v in out2.items()
    }


def test_life_table_hand_case(spark):
    """4 users with lifetimes {0, 1, 3, 3}: at-risk counts telescope,
    survival is the exact rational |lifetime > t|/N in ppm, and the
    final observed lifetime has survival 0."""
    import datetime

    from p2_mapreduce_spark.operators.events_analytics import life_table

    t0 = datetime.datetime(2024, 1, 1, 12)
    day = datetime.timedelta(days=1)
    rows = [(1, t0), (2, t0), (2, t0 + 3 * day), (3, t0), (3, t0 + day),
            (3, t0 + 3 * day), (4, t0), (4, t0 + day)]
    df = spark.createDataFrame(
        [(i, u, ts) for i, (u, ts) in enumerate(rows)],
        ["event_id", "user_id", "ts"],
    )
    out = {r["t_days"]: r for r in life_table(df).collect()}
    assert set(out) == {0, 1, 3}
    assert [out[t]["n_at_risk"] for t in (0, 1, 3)] == [4, 3, 2]
    assert [out[t]["n_churn"] for t in (0, 1, 3)] == [1, 1, 2]
    assert out[0]["hazard_ppm"] == 250_000
    assert out[1]["survival_ppm"] == 500_000
    assert out[3]["hazard_ppm"] == 1_000_000
    assert out[3]["survival_ppm"] == 0


def test_rrf_fuse_hand_case(spark):
    """RRF on two tiny rank lists: scores and fused order match the
    hand-computed 1/(60+r) sums; docs on one list only get the
    single-term score."""
    from p2_mapreduce_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], ["doc_id", "rnk"])
    b = spark.createDataFrame([(20, 1), (40, 2)], ["doc_id", "rnk"])
    out = {r["doc_id"]: r for r in rrf_fuse(a, b, k_rrf=60, top_n=10).collect()}
    # doc 20: 1/62 + 1/61 (two-term exact form: (120+2+1)/((60+2)*(60+1)))
    assert abs(out[20]["rrf_score"] - (123.0 / (62 * 61))) < 1e-15
    assert out[20]["fused_rank"] == 1
    # doc 10: sparse only, 1/61
    assert out[10]["rrf_score"] == 1.0 / 61.0
    assert out[10]["rank_b"] is None
    # fused order: 20 (both lists) > 10 > 40 > 30
    order = sorted(out.values(), key=lambda r: r["fused_rank"])
    assert [r["doc_id"] for r in order] == [20, 10, 40, 30]


def test_seq_pattern_counts_nonoverlapping(spark):
    """vc*p matches leftmost-non-overlapping: a vcvcp run yields ONE
    match (the regex consumes to the first p), vpvp yields two."""
    from p2_mapreduce_spark.operators.events_analytics import seq_pattern

    rows = []
    # user 1: v c c p v p  -> matches vccp and vp = 2
    for i, t in enumerate(["view", "click", "click", "purchase", "view", "purchase"]):
        rows.append((i, f"2024-01-01 00:00:{i:02d}", 1, t, 0.0, "{}"))
    # user 2: c p s e -> no v..p start = 0 matches (filtered out)
    for i, t in enumerate(["click", "purchase", "signup", "error"]):
        rows.append((10 + i, f"2024-01-01 00:00:{i:02d}", 2, t, 0.0, "{}"))
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["user_id"]: r for r in seq_pattern(ev, pattern="vc*p").collect()}
    assert set(got) == {1}
    assert got[1]["n_matches"] == 2 and got[1]["seq_len"] == 6


def test_cohort_ltv_hand_case(spark):
    """Two users, one cohort day: cumulative revenue accumulates across
    ages in exact cents; non-purchase events contribute nothing."""
    from p2_mapreduce_spark.operators.events_analytics import cohort_ltv

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 08:00:00", 1, "view", 0.0, "{}"),
            (2, "2024-01-01 09:00:00", 1, "purchase", 10.50, "{}"),
            (3, "2024-01-03 09:00:00", 1, "purchase", 5.25, "{}"),
            (4, "2024-01-01 10:00:00", 2, "signup", 0.0, "{}"),
            (5, "2024-01-02 10:00:00", 2, "purchase", 1.99, "{}"),
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {(r["cohort_day"], r["age_days"]): r for r in cohort_ltv(ev).collect()}
    assert out[("2024-01-01", 0)]["cum_revenue"] == 10.50
    assert out[("2024-01-01", 1)]["cum_revenue"] == 12.49
    assert out[("2024-01-01", 2)]["cum_revenue"] == 17.74
    assert all(r["n_users"] == 2 for r in out.values())


def test_welch_ttest_matches_scipy_formula(spark, sf_dir):
    """The pinned IEEE tree reproduces the textbook Welch statistic
    computed driver-side from the same cent-quantized values."""
    import math

    from p2_mapreduce_spark.operators.events_analytics import welch_ttest
    from p2_mapreduce_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    row = welch_ttest(ev).collect()[0]
    # recompute from raw values
    import pyspark.sql.functions as SF

    arms = (
        ev.filter(SF.col("event_type") == "purchase")
        .select(
            (
                SF.conv(SF.substring(SF.md5(SF.col("user_id").cast("string")), 18, 15), 16, 10)
                .cast("bigint") % 2
            ).alias("arm"),
            SF.floor(SF.col("value") * 100).cast("bigint").alias("cents"),
        )
        .collect()
    )
    a = [r["cents"] / 100.0 for r in arms if r["arm"] == 0]
    b = [r["cents"] / 100.0 for r in arms if r["arm"] == 1]
    def mv(x):
        n = len(x)
        m = sum(x) / n
        v = sum((xi - m) ** 2 for xi in x) / (n - 1)
        return n, m, v
    na, ma, va = mv(a)
    nb, mb, vb = mv(b)
    t = (ma - mb) / math.sqrt(va / na + vb / nb)
    df = (va / na + vb / nb) ** 2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    assert row["n_a"] == na and row["n_b"] == nb
    assert abs(row["t_stat"] - t) < 1e-9 * max(1.0, abs(t))
    assert abs(row["df"] - df) < 1e-6 * df


def test_qq_drift_partition_invariance(spark, sf_dir):
    """Type-1 decile grid is identical under 1-partition vs 32-partition
    input — the two-phase rank contract."""
    from p2_mapreduce_spark.operators.profile import qq_drift
    from p2_mapreduce_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    one = {r["q_ppm"]: (r["q_before"], r["q_after"]) for r in qq_drift(li.coalesce(1)).collect()}
    many = {r["q_ppm"]: (r["q_before"], r["q_after"]) for r in qq_drift(li.repartition(32)).collect()}
    assert one == many and len(one) == 9
    # monotone grid: deciles are nondecreasing in q
    qs = sorted(one)
    assert all(one[qs[i]][0] <= one[qs[i + 1]][0] for i in range(len(qs) - 1))


def test_bpe_encode_fold_matches_reference(spark):
    """The merge-fold chain applied with a fixed pretrained table equals
    the pure-Python greedy leftmost-non-overlapping reference, including
    the 'merged symbol never chains' rule on repeated runs."""
    from p2_mapreduce_spark.operators.bpe import bpe_segment_words

    docs = spark.createDataFrame(
        [(1, "the and thin aaaa than a bath the")], ["doc_id", "text"]
    )
    merges = [("t", "h", 0), ("th", "e", 0), ("a", "n", 0), ("an", "d", 0), ("i", "n", 0)]
    got = {r["word"]: r["segmented"] for r in bpe_segment_words(docs, merges).collect()}

    def fold(syms, l, r):
        acc = []
        for s in syms:
            if acc and acc[-1] == l and s == r:
                acc[-1] += s
            else:
                acc.append(s)
        return acc

    for w in got:
        syms = list(w)
        for l, r, _ in merges:
            syms = fold(syms, l, r)
        assert got[w] == " ".join(syms), w


def test_eb_rates_shrinks_toward_prior(spark):
    """A 1-of-2 part must land BELOW a 90-of-1000 part after shrinkage
    (raw rates say the opposite), and every shrunk rate sits between the
    raw rate and the prior mean."""
    from p2_mapreduce_spark.operators.analytics import eb_shrunk_rates

    rows = []
    # part 1: 1 return in 2 sales (raw 0.50); part 2: 90/1000 (raw 0.09)
    rows += [(1, "R")] * 1 + [(1, "N")] * 1
    rows += [(2, "R")] * 90 + [(2, "N")] * 910
    # background parts around ~10% so the prior concentrates there
    import hashlib
    for p in range(3, 43):
        k = 5 + int(hashlib.md5(str(p).encode()).hexdigest(), 16) % 10
        rows += [(p, "R")] * k + [(p, "N")] * (100 - k)
    li = spark.createDataFrame(rows, ["l_partkey", "l_returnflag"])
    out = {r["l_partkey"]: r for r in eb_shrunk_rates(li).collect()}
    assert out[1]["prior_used"] and out[2]["prior_used"]
    # the empirical part keeps roughly its rate; the tiny part collapses
    assert out[1]["shrunk_rate"] < 0.3, out[1]
    assert abs(out[2]["shrunk_rate"] - 0.09) < 0.01
    # tiny-sample shrinks BETWEEN raw and prior mean
    m = sum(r["raw_ppm"] for r in out.values()) / len(out) / 1e6
    assert m < out[1]["shrunk_rate"] < 0.5


def test_new_ops_empty_and_degenerate_inputs(spark):
    """Round-3 additions behave on empty/degenerate inputs: no throws,
    sane shapes (the robustness contract every operator family carries)."""
    from p2_mapreduce_spark.operators.analytics import eb_shrunk_rates
    from p2_mapreduce_spark.operators.events_analytics import (
        cohort_ltv,
        seq_pattern,
        welch_ttest,
    )
    from p2_mapreduce_spark.operators.search import rrf_fuse

    empty_ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    assert seq_pattern(empty_ev).count() == 0
    assert cohort_ltv(empty_ev).count() == 0
    # welch on empty: one row of NULLs (pivot over no arms), not a throw
    row = welch_ttest(empty_ev).collect()[0]
    assert row["n_a"] is None and row["t_stat"] is None
    # eb with a single group: between-group variance is 0 -> raw fallback
    li = spark.createDataFrame([(1, "R"), (1, "N")], ["l_partkey", "l_returnflag"])
    r = eb_shrunk_rates(li).collect()[0]
    assert r["prior_used"] is False and r["shrunk_rate"] == 0.5
    # rrf with one empty side degrades to the other list's 1/(k+r) order
    a = spark.createDataFrame([(1, 1), (2, 2)], ["doc_id", "rnk"])
    b = spark.createDataFrame([], "doc_id long, rnk long")
    out = rrf_fuse(a, b, top_n=5).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda x: x["fused_rank"])] == [1, 2]


def test_seq_pattern_partition_invariance(spark, sf_dir):
    """The per-user letter string is a total order (ts, event_id) — the
    match counts cannot depend on input partitioning."""
    from p2_mapreduce_spark.operators.events_analytics import seq_pattern
    from p2_mapreduce_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    one = {r["user_id"]: r["n_matches"] for r in seq_pattern(ev.coalesce(1)).collect()}
    many = {r["user_id"]: r["n_matches"] for r in seq_pattern(ev.repartition(32)).collect()}
    assert one == many and len(one) > 0


def test_semantic_contamination_matches_bruteforce(spark, sf_dir):
    """The inlined-literal projection equals a per-row numpy max-cosine
    recompute, and the benchmark rows themselves are excluded."""
    import numpy as np

    from p2_mapreduce_spark.operators.similarity import semantic_contamination
    from p2_mapreduce_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = {r["vec_id"]: r for r in semantic_contamination(emb, n_bench=8).collect()}
    rows = emb.collect()
    bench = sorted(
        [r for r in rows if r["vec_id"] < 8], key=lambda r: r["vec_id"]
    )
    bm = np.array([r["embedding"] for r in bench], dtype=np.float64)
    bn = np.linalg.norm(bm, axis=1)
    assert all(v >= 8 for v in out)
    for r in rows:
        if r["vec_id"] < 8:
            continue
        v = np.array(r["embedding"], dtype=np.float64)
        cos = (bm @ v) / (np.linalg.norm(v) * bn)
        got = out[r["vec_id"]]
        assert abs(got["max_cos"] - cos.max()) < 1e-9
        assert got["bench_id"] == bench[int(cos.argmax())]["vec_id"]
        assert got["contaminated"] == (got["max_cos"] > 0.5)


def test_otsu_threshold_separates_bimodal(spark):
    """On a cleanly bimodal quality corpus the Otsu cut lands between
    the two modes, and each class count matches the construction."""
    # construct docs whose quality ~ alpha_ratio: low-alpha junk vs clean
    # (junk keeps ONE token so quality_score's stop_ratio stays defined)
    junk = [(i, "zz !!! ??? ### $$$ %%% ^^^ &&& *** (((") for i in range(20)]
    clean = [(100 + i, "the quick brown fox jumps over the lazy dog again") for i in range(30)]
    docs = spark.createDataFrame(junk + clean, ["doc_id", "text"])
    from p2_mapreduce_spark.operators.curation import otsu_threshold

    row = otsu_threshold(docs).collect()[0]
    assert row["n_below"] == 20 and row["n_above"] == 30
    assert row["criterion"] > 0


def test_session_pattern_scopes_to_sessions(spark):
    """A view→purchase path split across a session gap must NOT match;
    the same path inside one session must."""
    from p2_mapreduce_spark.operators.events_analytics import session_pattern

    ev = spark.createDataFrame(
        [
            # user 1: view then purchase 2h apart -> different sessions
            (1, "2024-01-01 08:00:00", 1, "view", 0.0, "{}"),
            (2, "2024-01-01 10:00:00", 1, "purchase", 5.0, "{}"),
            # user 2: view then purchase 5 min apart -> one session
            (3, "2024-01-01 08:00:00", 2, "view", 0.0, "{}"),
            (4, "2024-01-01 08:05:00", 2, "purchase", 5.0, "{}"),
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = session_pattern(ev, pattern="vc*p", gap_minutes=30).collect()
    assert len(got) == 1
    assert got[0]["user_id"] == 2 and got[0]["n_matches"] == 1


def test_temperature_mix_flattens_and_sums_to_budget(spark):
    """T=2 weighting lifts small domains relative to raw shares, large
    domains fall, and the largest-remainder allocation sums EXACTLY to
    the budget."""
    from p2_mapreduce_spark.operators.curation import temperature_mix

    rows = [(i, "big") for i in range(900)] + [(900 + i, "small") for i in range(100)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    out = {r["source"]: r for r in temperature_mix(docs, budget=100).collect()}
    assert out["big"]["alloc"] + out["small"]["alloc"] == 100
    # raw share of small = 10%; sqrt share = 10/(30+10) = 25%
    assert out["small"]["alloc"] == 25 and out["big"]["alloc"] == 75


def test_coverage_curve_monotone_and_exact(spark):
    """Coverage is nondecreasing in rank, hits 100% at full vocabulary,
    and the top-1 checkpoint carries exactly the modal word's mass."""
    from p2_mapreduce_spark.operators.text_analysis import coverage_curve

    docs = spark.createDataFrame(
        [(1, "aa aa aa aa bb bb cc dd")], ["doc_id", "text"]
    )
    rows = {r["rank_checkpoint"]: r for r in coverage_curve(docs).collect()}
    assert rows[1]["mass"] == 4 and rows[1]["coverage_ppm"] == 500000
    assert rows[2]["mass"] == 6 and rows[2]["coverage_ppm"] == 750000
    assert rows[5]["coverage_ppm"] == 1000000 and rows[5]["n_vocab"] == 4
    cps = sorted(rows)
    assert all(
        rows[cps[i]]["coverage_ppm"] <= rows[cps[i + 1]]["coverage_ppm"]
        for i in range(len(cps) - 1)
    )


# --- round 4 additions ------------------------------------------------------

from p2_mapreduce_spark.session import load_table  # noqa: E402


class TestRetrievalEval:
    def test_metrics_match_python_reference(self, spark, sf_dir):
        import re

        from p2_mapreduce_spark.operators.search import (
            RETRIEVAL_EVAL_QUERIES,
            retrieval_eval,
        )

        docs = load_table(spark, sf_dir, "documents")
        rows = {r["query_id"]: r for r in retrieval_eval(docs).collect()}
        raw = docs.select("doc_id", "text").collect()
        tf = {}
        for r in raw:
            toks = [t for t in re.split(r"[^\w]+", r["text"].lower()) if t]
            for t in toks:
                tf[(r["doc_id"], t)] = tf.get((r["doc_id"], t), 0) + 1
        for qid, s_term, r_term in RETRIEVAL_EVAL_QUERIES:
            cand = sorted(
                [(d, c) for (d, t), c in tf.items() if t == s_term],
                key=lambda x: (-x[1], x[0]),
            )
            rel = {d for (d, t) in tf if t == r_term}
            topk = [d for d, _ in cand[:10]]
            hits = sum(1 for d in topk if d in rel)
            first = next(
                (i + 1 for i, d in enumerate(topk) if d in rel), None
            )
            got = rows[qid]
            assert got["n_candidates"] == len(cand)
            assert got["n_relevant"] == len(rel)
            assert got["hits_at_k"] == hits
            assert got["rr_at_k"] == (1.0 / first if first else 0.0)
            assert got["p_at_k"] == hits / 10.0
            assert got["recall_at_k"] == (hits / len(rel) if rel else 0.0)


class TestCalibrationBins:
    def test_ece_terms_sum_and_bin_partition(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.curation import calibration_bins

        docs = load_table(spark, sf_dir, "documents")
        rows = calibration_bins(docs).collect()
        assert sum(r["n_docs"] for r in rows) == docs.count()
        for r in rows:
            assert 0 <= r["bin"] <= 9
            assert 0.0 <= r["mean_score"] <= 1.0
            assert 0.0 <= r["pos_rate"] <= 1.0
            assert abs(
                r["abs_gap"] - abs(r["mean_score"] - r["pos_rate"])
            ) == 0.0
        ece = sum(r["ece_term"] for r in rows)
        assert 0.0 <= ece <= 1.0


class TestSssp:
    def test_matches_python_bellman_ford(self, spark):
        import random

        from p2_mapreduce_spark.operators.graph import sssp

        rng = random.Random(7)
        edges = [
            (rng.randrange(12), rng.randrange(12), rng.randrange(1, 9))
            for _ in range(30)
        ]
        edges = [(u, v, w) for u, v, w in edges if u != v]
        df = spark.createDataFrame(edges, "src long, dst long, w long")
        got = {
            r["node"]: r["dist"]
            for r in sssp(df, source=0, rounds=4).collect()
        }
        # reference: 4-round Bellman-Ford over the symmetrized list
        dist = {0: 0}
        sym = edges + [(v, u, w) for u, v, w in edges]
        for _ in range(4):
            new = dict(dist)
            for u, v, w in sym:
                if u in dist and dist[u] + w < new.get(v, 1 << 60):
                    new[v] = dist[u] + w
            dist = new
        assert got == dist

    def test_trade_sssp_source_is_zero(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.graph import trade_sssp

        out = {
            r["node"]: r["dist"]
            for r in trade_sssp(
                load_table(spark, sf_dir, "lineitem"),
                load_table(spark, sf_dir, "orders"),
            ).collect()
        }
        assert out[2] == 0
        assert all(d >= 0 for d in out.values())


class TestWinnowing:
    def test_shared_run_guarantee_and_density(self, spark):
        """Two docs sharing a token run of length >= w + k - 1 (= 6)
        must share at least one fingerprint; selection keeps far fewer
        than all grams."""
        from p2_mapreduce_spark.operators.dedup import winnow_fingerprints

        shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
        docs = spark.createDataFrame(
            [
                (1, f"one two three {shared} four five six seven"),
                (2, f"red blue {shared} green yellow purple orange"),
                (3, "completely different words everywhere here today now"),
            ],
            "doc_id long, text string",
        )
        rows = winnow_fingerprints(docs).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
        assert by_doc[1] & by_doc[2]  # the guarantee
        assert not (by_doc[1] & by_doc.get(3, set()))
        # density: docs have 13/12 tokens -> 11/10 grams; selected << grams
        assert all(len(v) < 11 for v in by_doc.values())

    def test_rightmost_tie_on_repetitive_text(self, spark):
        """All-identical grams: every window's min is the same VALUE, so
        the rightmost-tie rule must pick one deterministic position per
        window, giving windows-count distinct positions of one fp."""
        from p2_mapreduce_spark.operators.dedup import winnow_fingerprints

        docs = spark.createDataFrame(
            [(1, "a a a a a a a a")], "doc_id long, text string"
        )
        rows = winnow_fingerprints(docs).collect()
        # 8 tokens -> 6 grams -> 3 windows (s=0,1,2); min of each window
        # is the shared hash, rightmost member: pos = s + 3
        assert sorted((r["pos"], ) for r in rows) == [(3,), (4,), (5,)]
        assert len({r["fp"] for r in rows}) == 1


class TestMannKendall:
    def test_matches_python_reference(self, spark, sf_dir):
        import math
        from collections import Counter

        from p2_mapreduce_spark.operators.timeseries import mann_kendall

        events = load_table(spark, sf_dir, "events")
        got = {r["event_type"]: r for r in mann_kendall(events).collect()}
        raw = events.select("event_type", "ts", "value").collect()
        daily = {}
        for r in raw:
            key = (r["event_type"], r["ts"].date())
            daily[key] = daily.get(key, 0) + math.floor(r["value"] * 100)
        by_g = {}
        for (g, d), y in daily.items():
            by_g.setdefault(g, []).append((d, y))
        for g, series in by_g.items():
            series.sort()
            ys = [y for _, y in series]
            n = len(ys)
            s = sum(
                (ys[j] > ys[i]) - (ys[j] < ys[i])
                for i in range(n)
                for j in range(i + 1, n)
            )
            ties = Counter(ys)
            tie_term = sum(
                t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1
            )
            var18 = n * (n - 1) * (2 * n + 5) - tie_term
            r = got[g]
            assert (r["n_days"], r["s_stat"], r["var18"]) == (n, s, var18)
            if s != 0 and var18 > 0:
                expect = (s - 1 if s > 0 else s + 1) / math.sqrt(var18 / 18.0)
                assert r["z"] == expect


class TestInferTypes:
    def test_narrowest_type_per_column(self, spark):
        from p2_mapreduce_spark.operators.profile import infer_types

        df = spark.createDataFrame(
            [
                ("1", "1.5", "2024-01-02", "true", None),
                ("-42", "2", "1999-12-31", "F", "x"),
                ("+7", ".5e3", "2024-06-30", "0", "1"),
            ],
            "a string, b string, c string, d string, e string",
        )
        got = {
            r["column"]: r
            for r in infer_types(df, ["a", "b", "c", "d", "e"]).collect()
        }
        assert got["a"]["suggested"] == "bigint"
        assert got["b"]["suggested"] == "double"
        assert got["c"]["suggested"] == "date"
        assert got["d"]["suggested"] == "boolean"
        assert got["e"]["suggested"] == "string"  # mixed, null admitted
        assert got["e"]["n_null"] == 1
        # ints are floats too (precedence, not exclusivity)
        assert got["a"]["n_float"] == 3

    def test_all_null_column(self, spark):
        from p2_mapreduce_spark.operators.profile import infer_types

        df = spark.createDataFrame([(None,), (None,)], "a string")
        [r] = infer_types(df, ["a"]).collect()
        assert r["suggested"] == "null" and r["n_null"] == 2


class TestHashRing:
    def test_total_partition_and_minimal_movement(self, spark):
        """Every key lands on exactly one node, and adding a node moves
        only the keys that now belong to it (the consistent-hashing
        property the operator exists for — nobody else's keys move)."""
        from pyspark.sql import functions as F

        from p2_mapreduce_spark.catalog import consistent_hash_placement

        keys = spark.range(0, 2000).select(F.col("id").alias("key"))

        def owners(nodes):
            from p2_mapreduce_spark.catalog import consistent_hash_placement
            # reuse the internals via the audit + a per-key probe: rerun
            # with each node set and compare per-node counts
            return {
                r["node"]: r["n_keys"]
                for r in consistent_hash_placement(keys, nodes=nodes).collect()
            }

        five = owners(("n1", "n2", "n3", "n4", "n5"))
        six = owners(("n1", "n2", "n3", "n4", "n5", "n6"))
        assert sum(five.values()) == 2000 and sum(six.values()) == 2000
        # existing nodes only LOSE keys to the newcomer — none gain
        assert all(six[n] <= five[n] for n in five)
        assert six["n6"] == sum(five[n] - six[n] for n in five)
        # and the newcomer takes roughly 1/6 (loose band: vnode variance)
        assert 2000 // 20 < six["n6"] < 2000 // 2


class TestCdcChunks:
    def test_shift_invariance_the_point_of_cdc(self, spark):
        """Insert a prefix into a document: fixed-size blocks would
        shift every boundary, but CDC boundaries move WITH the content
        — the two variants must share most chunk fingerprints (all
        chunks strictly after the first boundary following the edit)."""
        import hashlib

        from p2_mapreduce_spark.operators.dedup import (
            CDC_MASK_MOD,
            CDC_WINDOW,
            cdc_chunk_stats,
        )

        base = (
            "the quick brown fox jumps over the lazy dog again and again "
            "while seventeen engineers review forty two parquet files "
            "containing join keys hash buckets and sorted runs of data "
        ) * 4
        docs = spark.createDataFrame(
            [(1, base, "a"), (2, "INSERTED PREFIX >>> " + base, "b")],
            "doc_id long, text string, source string",
        )
        # python reference chunker (independent of the SQL fold)
        def chunks(text):
            k, pows = CDC_WINDOW, [31 ** j for j in range(CDC_WINDOW)]
            cuts = [
                p + k - 1
                for p in range(1, max(len(text) - k + 1, 0) + 1)
                if sum(
                    ord(text[p + j - 1]) * pows[j] for j in range(k)
                ) % CDC_MASK_MOD == 0
            ]
            bounds = [0] + cuts + [len(text)]
            return [
                hashlib.md5(text[s:e].encode()).hexdigest()
                for s, e in zip(bounds, bounds[1:])
                if e > s
            ]
        c1, c2 = chunks(base), chunks("INSERTED PREFIX >>> " + base)
        shared = set(c1) & set(c2)
        assert len(shared) >= len(set(c1)) - 2  # only the head differs
        # and the operator's per-source rollup agrees with the reference
        got = {
            r["source"]: r for r in cdc_chunk_stats(docs).collect()
        }
        assert got["a"]["n_chunks"] == len(c1)
        assert got["b"]["n_chunks"] == len(c2)
        assert got["a"]["n_distinct"] == len(set(c1))
        assert got["a"]["total_chars"] == len(base)


class TestClassifierAuc:
    def test_matches_pairwise_reference(self, spark, sf_dir):
        """Exact AUC equals the O(n²) pairwise definition: mean over
        (pos, neg) pairs of [margin_pos > margin_neg] + half-ties."""
        from p2_mapreduce_spark.operators.curation import (
            classifier_auc,
            quality_classifier,
        )

        docs = load_table(spark, sf_dir, "documents").limit(200)
        [r] = classifier_auc(docs).collect()
        m = {
            row["doc_id"]: row["margin"]
            for row in quality_classifier(docs).collect()
        }
        langs = {
            row["doc_id"]: row["lang"]
            for row in docs.select("doc_id", "lang").collect()
        }
        pos = [m[d] for d in m if langs[d] == "en"]
        neg = [m[d] for d in m if langs[d] != "en"]
        u2 = sum(
            2 * (p > q) + (p == q) for p in pos for q in neg
        )
        assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
        assert r["u2"] == u2
        assert r["auc"] == u2 / (2.0 * len(pos) * len(neg))


class TestRakeKeywords:
    def test_hand_computed_scores(self, spark):
        from p2_mapreduce_spark.operators.text_analysis import rake_keywords

        docs = spark.createDataFrame(
            [
                (1, "alpha beta the gamma delta epsilon"),
                (2, "alpha in alpha"),
            ],
            "doc_id long, text string",
        )
        got = {
            r["word"]: (r["freq"], r["degree"], r["score"])
            for r in rake_keywords(docs, top_n=50).collect()
        }
        # doc1 phrases: [alpha beta] (len 2), [gamma delta epsilon] (3)
        # doc2 phrases: [alpha] (1), [alpha] (1)
        assert got["beta"] == (1, 2, 2.0)
        assert got["gamma"] == (1, 3, 3.0)
        assert got["alpha"] == (3, 4, 4.0 / 3.0)
        # phrase-centrality ranking: gamma (long phrase) beats alpha
        # (frequent but mostly alone)
        assert got["gamma"][2] > got["alpha"][2]

    def test_stopwords_never_surface(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.text_analysis import (
            RAKE_STOPWORDS,
            rake_keywords,
        )

        docs = load_table(spark, sf_dir, "documents")
        words = {r["word"] for r in rake_keywords(docs).collect()}
        assert not (words & set(RAKE_STOPWORDS))


class TestWinnowPairs:
    def test_shared_run_produces_pair(self, spark):
        from p2_mapreduce_spark.operators.dedup import winnow_pairs

        shared = "alpha beta gamma delta epsilon zeta eta theta"
        docs = spark.createDataFrame(
            [
                (1, f"one two three {shared} four five"),
                (2, f"red blue {shared} green yellow"),
                (3, "totally different words all over this document here"),
            ],
            "doc_id long, text string",
        )
        pairs = {
            (r["doc_a"], r["doc_b"]): r["n_shared"]
            for r in winnow_pairs(docs, min_shared=1).collect()
        }
        assert (1, 2) in pairs and pairs[(1, 2)] >= 1
        assert not any(3 in p for p in pairs)


class TestMediaHistogram:
    def test_totals_and_closed_form(self, spark):
        from p2_mapreduce_spark.operators.multimodal import (
            attach_bmp,
            pixel_histogram,
        )

        docs = spark.createDataFrame(
            [(i, "x") for i in (0, 5, 11)], "doc_id long, text string"
        )
        rows = pixel_histogram(attach_bmp(docs)).collect()
        per_img: dict = {}
        for r in rows:
            per_img.setdefault(r["media_id"], 0)
            per_img[r["media_id"]] += r["n_px"]
        for i in (0, 5, 11):
            w, h = 4 + i % 9, 4 + (i * 3) % 9
            assert per_img[i] == 3 * w * h  # every pixel in every channel
        # spot-check one bucket against the formula
        i = 5
        w, h, base = 4 + 5 % 9, 4 + 15 % 9, (5 % 16) * 3
        expect = sum(
            1
            for x in range(w)
            for y in range(h)
            if (base + 5 * x + 4 * y) // 64 == 1
        )
        got = [
            r["n_px"]
            for r in rows
            if r["media_id"] == 5 and r["channel"] == "b" and r["bucket"] == 1
        ]
        assert got == ([expect] if expect else [])


class TestDetectorKappa:
    def test_matches_python_reference(self, spark, sf_dir):
        from collections import Counter

        from p2_mapreduce_spark.operators.text_analysis import (
            detector_kappa,
            lang_id,
        )

        docs = load_table(spark, sf_dir, "documents")
        [r] = detector_kappa(docs).collect()
        pairs = [
            (row["labeled_lang"], row["detected_lang"])
            for row in lang_id(docs).collect()
        ]
        n = len(pairs)
        agree = sum(1 for a, b in pairs if a == b)
        rm = Counter(a for a, _b in pairs)
        cm = Counter(b for _a, b in pairs)
        pe_num = sum(rm[k] * cm.get(k, 0) for k in rm)
        po, pe = agree / n, pe_num / (n * n)
        assert (r["n_docs"], r["n_agree"]) == (n, agree)
        assert r["po"] == po and r["pe"] == pe
        assert r["kappa"] == (po - pe) / (1.0 - pe)
        assert r["kappa"] <= r["po"]  # chance correction only lowers
