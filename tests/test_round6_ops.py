"""Round-6 operator tests: the FLAC lossless-predictive audio codec
(fixed predictors, partitioned Rice, CRC-8/16) and its quarantine
envelope.  The color progressive-JPEG tests live beside the other
JPEG suites in test_round5_ops.py."""


class TestFlac:
    def test_decode_matches_closed_form(self, spark):
        from p2_mapreduce_spark.operators.multimodal import (
            _decode_flac,
            attach_flac,
        )

        docs = spark.createDataFrame(
            [(i, "x") for i in range(40)], ["doc_id", "text"]
        )
        for r in attach_flac(docs).collect():
            mid = r["media_id"]
            parsed = _decode_flac(bytes(r["payload"]))
            assert parsed is not None, f"id {mid} quarantined"
            rate, nch, chans = parsed
            n = 16 + 8 * (mid % 4)
            a, b1, c = 10 + mid % 50, mid % 7 - 3, mid % 5 - 2
            exp = [a + b1 * t + c * t * (t - 1) // 2 for t in range(n)]
            assert rate == 8000 and nch == 1
            assert chans[0] == exp, f"id {mid} samples"

    def test_crc_verification_is_real(self, spark):
        """Flipping any single frame byte must quarantine: the CRC-8
        guards the header, the CRC-16 everything else."""
        from p2_mapreduce_spark.operators.multimodal import (
            _decode_flac,
            attach_flac,
        )

        docs = spark.createDataFrame([(7, "x")], ["doc_id", "text"])
        payload = bytes(attach_flac(docs).collect()[0]["payload"])
        assert _decode_flac(payload) is not None
        frame_start = 4 + 4 + 34  # magic + block header + STREAMINFO
        for off in range(frame_start, len(payload)):
            bad = bytearray(payload)
            bad[off] ^= 0x04
            assert _decode_flac(bytes(bad)) is None, f"byte {off}"

    def test_unsupported_shapes_quarantine(self):
        from p2_mapreduce_spark.operators.multimodal import _decode_flac

        assert _decode_flac(b"") is None
        assert _decode_flac(b"fLaC") is None
        # RIFF/WAV payloads must not decode through the FLAC kernel
        pcm = (
            b"RIFF$\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01\x00\x01\x00"
            b"\x40\x1f\x00\x00\x80>\x00\x00\x02\x00\x10\x00"
            b"data\x00\x00\x00\x00"
        )
        assert _decode_flac(pcm) is None

    def test_frame_channel_and_bitstream_cross_checks(self, spark):
        """LPC subframes and decorrelated-stereo channel codes are
        SUPPORTED since round 7 (audio_flac_lpc) — what must still
        quarantine here: a stereo channel code against a mono
        STREAMINFO (channel-count cross-check), and a subframe-type
        rewrite whose reinterpretation breaks the frame CRC."""
        from p2_mapreduce_spark.operators.multimodal import (
            _crc8_flac,
            _decode_flac,
            attach_flac,
        )

        docs = spark.createDataFrame([(2, "x")], ["doc_id", "text"])
        payload = bytearray(attach_flac(docs).collect()[0]["payload"])
        frame_start = 42
        # channel code 8 (left/side, 2 channels) in frame-header byte 3
        # contradicts the mono STREAMINFO → quarantined even with the
        # CRC-8 recomputed to match
        bad = bytearray(payload)
        bad[frame_start + 3] = (8 << 4) | (bad[frame_start + 3] & 0x0F)
        bad[frame_start + 6] = _crc8_flac(
            bytes(bad[frame_start : frame_start + 6])
        )
        assert _decode_flac(bytes(bad)) is None
        # rewriting the subframe header to LPC order 1 (0x40) makes the
        # remaining bits parse as coefficients/residuals the CRC-16 (or
        # structure walk) rejects — a bit-level integrity check, since
        # LPC itself now decodes
        bad2 = bytearray(payload)
        bad2[frame_start + 7] = 0x40
        assert _decode_flac(bytes(bad2)) is None


import datetime as dt

from pyspark.sql import functions as F


def _events6(spark, rows):
    """rows: (day, user, event_type, value) → events frame."""
    base = dt.datetime(2024, 3, 1)
    return spark.createDataFrame(
        [
            (i, base + dt.timedelta(days=d, hours=i % 4), u, g, float(v), "{}")
            for i, (d, u, g, v) in enumerate(rows)
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )


class TestKgroupTests:
    def _fixture(self, spark):
        rows = []
        vals = {"a": [1, 2, 3, 4], "b": [3, 4, 5, 6], "c": [10, 11, 12, 13]}
        for g, vs in vals.items():
            for d, v in enumerate(vs):
                rows.append((d, 1, g, v))
        return _events6(spark, rows), vals

    def test_kruskal_wallis_hand(self, spark):
        from p2_mapreduce_spark.operators.timeseries import kruskal_wallis

        ev, vals = self._fixture(spark)
        row = kruskal_wallis(ev).collect()[0]
        # pooled midranks over cents values
        pooled = sorted(v for vs in vals.values() for v in vs)
        import collections
        cnt = collections.Counter(pooled)
        mid = {}
        r = 1
        for v in sorted(cnt):
            mid[v] = r + (cnt[v] - 1) / 2
            r += cnt[v]
        n = len(pooled)
        s = sum(
            sum(mid[v] for v in vs) ** 2 / len(vs) for vs in vals.values()
        )
        h = 12.0 * s / (n * (n + 1)) - 3.0 * (n + 1)
        t_sum = sum(c**3 - c for c in cnt.values())
        c_adj = 1 - t_sum / (n**3 - n)
        assert row["n_rows"] == n and row["n_groups"] == 3
        assert abs(row["h"] - h) < 1e-9
        assert abs(row["h_tie_adj"] - h / c_adj) < 1e-9

    def test_anova_f_hand(self, spark):
        from p2_mapreduce_spark.operators.timeseries import anova_f

        ev, vals = self._fixture(spark)
        row = anova_f(ev).collect()[0]
        cents = {g: [v * 100 for v in vs] for g, vs in vals.items()}
        n = sum(len(v) for v in cents.values())
        k = len(cents)
        z = sum(sum(v) for v in cents.values())
        q = sum(x * x for v in cents.values() for x in v)
        t = sum(sum(v) ** 2 / len(v) for v in cents.values())
        ssb, ssw = t - z * z / n, q - t
        f = (ssb / (k - 1)) / (ssw / (n - k))
        assert abs(row["ssb"] - ssb) < 1e-6 * abs(ssb)
        assert abs(row["f_stat"] - f) < 1e-9 * abs(f)

    def test_group_invariance(self, spark):
        """Relabeling groups permutes nothing: H and F are label-free."""
        from p2_mapreduce_spark.operators.timeseries import (
            anova_f,
            kruskal_wallis,
        )

        ev, _ = self._fixture(spark)
        swapped = ev.withColumn(
            "event_type",
            F.when(F.col("event_type") == "a", "zz").otherwise(
                F.col("event_type")
            ),
        )
        assert (
            kruskal_wallis(ev).collect()[0]["h"]
            == kruskal_wallis(swapped).collect()[0]["h"]
        )
        assert (
            anova_f(ev).collect()[0]["f_stat"]
            == anova_f(swapped).collect()[0]["f_stat"]
        )


class TestCcfCroston:
    def test_ccf_perfect_lag(self, spark):
        """y is x shifted by 2 days → r = 1.0 exactly at lag 2."""
        from p2_mapreduce_spark.operators.timeseries import ccf_daily

        xs = [1, 5, 2, 8, 3, 9, 4]
        rows = [(d, 1, "a", v) for d, v in enumerate(xs)]
        rows += [(d + 2, 1, "b", v) for d, v in enumerate(xs)]
        got = {r["lag"]: r for r in ccf_daily(_events6(spark, rows)).collect()}
        assert abs(got[2]["r"] - 1.0) < 1e-12
        assert got[2]["n_overlap"] == 7
        assert abs(got[0]["r"]) < 1.0  # misaligned lags are weaker

    def test_croston_hand(self, spark):
        from p2_mapreduce_spark.operators.timeseries import croston

        # demand on days 0, 3, 5 (values 4, 8, 6), zeros between
        rows = [(0, 1, "a", 4), (3, 1, "a", 8), (5, 1, "a", 6)]
        row = croston(_events6(spark, rows)).collect()[0]
        # fold: d0 start z=400,p=1,q=1; d1,d2 zero q=2,3; d3 z=.5(800+400)
        # =600 p=.5(3+1)=2 q=1; d4 zero q=2; d5 z=.5(600+600)=600
        # p=.5(2+2)=2
        assert row["n_days"] == 6 and row["n_demand_days"] == 3
        assert abs(row["z_hat"] - 6.0) < 1e-12
        assert abs(row["p_hat"] - 2.0) < 1e-12
        assert abs(row["forecast"] - 3.0) < 1e-12


class TestRound6EmptyInputs:
    def test_kgroup_and_rank_ops_empty(self, spark):
        """ADVICE r06: the global-agg reports must emit ZERO rows on
        empty input (their recursive-CTE oracles do), not one
        null/zero row."""
        from p2_mapreduce_spark.operators.analytics import rbo_ranks
        from p2_mapreduce_spark.operators.timeseries import (
            anova_f,
            ccf_daily,
            kruskal_wallis,
        )

        ev = spark.createDataFrame(
            [],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        assert kruskal_wallis(ev).count() == 0
        assert anova_f(ev).count() == 0
        assert ccf_daily(ev).count() == 0
        li = spark.createDataFrame(
            [],
            "l_orderkey long, l_suppkey long, l_partkey long,"
            " l_quantity double, l_extendedprice double",
        )
        assert rbo_ranks(li).count() == 0

    def test_ccf_single_group_emits_zero_rows(self, spark):
        """ADVICE r06: one event type present would set gx == gy and
        report the series' AUTOcorrelation under a cross-correlation
        contract — the guard returns zero rows instead."""
        from p2_mapreduce_spark.operators.timeseries import ccf_daily

        rows = [(d, 1, "only", v) for d, v in enumerate([1, 5, 2, 8, 3])]
        assert ccf_daily(_events6(spark, rows)).count() == 0


class TestSurvivalAndLedger:
    def test_rmst_hand(self, spark):
        from p2_mapreduce_spark.operators.events_analytics import rmst

        # lifetimes: user1 = 0 days, user2 = 10, user3 = 40
        rows = [(0, 1, "a", 1), (0, 2, "a", 1), (10, 2, "a", 1),
                (0, 3, "a", 1), (40, 3, "a", 1)]
        got = {r["tau"]: r for r in rmst(_events6(spark, rows)).collect()}
        assert got[7]["sum_capped_days"] == 0 + 7 + 7
        assert got[14]["sum_capped_days"] == 0 + 10 + 14
        assert got[30]["sum_capped_days"] == 0 + 10 + 30
        assert abs(got[30]["rmst_days"] - 40 / 3) < 1e-12

    def test_period_balance_hand(self, spark):
        from p2_mapreduce_spark.operators.analytics import period_balance

        orders = spark.createDataFrame(
            [
                (1, 10, "O", 100.0, dt.datetime(2024, 1, 5), "x"),
                (2, 10, "O", 250.0, dt.datetime(2024, 1, 20), "x"),
                (3, 11, "O", 40.0, dt.datetime(2024, 1, 10), "x"),
                (4, 10, "O", 70.0, dt.datetime(2024, 2, 2), "x"),
            ],
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderdate", "o_orderpriority"],
        )
        got = {r["month"]: r for r in period_balance(orders).collect()}
        # Jan: cust10 last = 250, cust11 = 40 → 290; Feb: cust10 = 70
        assert got["2024-01"]["n_accounts"] == 2
        assert abs(got["2024-01"]["total_balance"] - 290.0) < 1e-9
        assert abs(got["2024-02"]["mom_delta"] - (70.0 - 290.0)) < 1e-9

    def test_receivables_aging_hand(self, spark):
        from p2_mapreduce_spark.operators.analytics import receivables_aging

        snap = dt.datetime(2024, 6, 1)
        orders = spark.createDataFrame(
            [
                (1, 1, "O", 10.0, snap, "x"),                      # age 0
                (2, 1, "O", 20.0, snap - dt.timedelta(days=45), "x"),
                (3, 1, "F", 99.0, snap - dt.timedelta(days=45), "x"),
                (4, 1, "O", 30.0, snap - dt.timedelta(days=200), "x"),
            ],
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderdate", "o_orderpriority"],
        )
        got = {r["bucket"]: r for r in receivables_aging(orders).collect()}
        assert got["0-30"]["n_orders"] == 1
        assert abs(got["31-60"]["total_open"] - 20.0) < 1e-9
        assert got["61-90"]["n_orders"] == 0
        assert abs(got["91+"]["total_open"] - 30.0) < 1e-9


class TestRichClub:
    def test_clique_plus_pendants(self, spark):
        from p2_mapreduce_spark.operators.graph import rich_club

        # K4 on {1,2,3,4} (deg 3+pendant) + one pendant per clique node
        edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        edges += [(i, i + 10) for i in range(1, 5)]
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r["k"]: r for r in rich_club(df, (1, 2, 4)).collect()}
        # deg>1: the 4 clique nodes (deg 4 each); pendants have deg 1
        assert got[1]["n_nodes"] == 4 and got[1]["n_edges"] == 6
        assert abs(got[1]["phi"] - 1.0) < 1e-12
        assert got[2]["n_nodes"] == 4
        assert got[4]["n_nodes"] == 0 and got[4]["phi"] == 0.0


class TestCurationRound6:
    def test_mcc_perfect_and_inverted(self, spark):
        from p2_mapreduce_spark.operators.curation import mcc_eval

        good = "the cat and the dog walked to a tree in town " * 8
        bad = "zzzz " * 3
        docs = spark.createDataFrame(
            [(i, good, "en", "s", len(good)) for i in range(4)]
            + [(i + 10, bad, "fr", "s", len(bad)) for i in range(4)],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        row = mcc_eval(docs).collect()[0]
        assert row["tp"] == 4 and row["tn"] == 4
        assert abs(row["mcc"] - 1.0) < 1e-12
        # flip the labels → perfect anti-correlation
        flipped = docs.withColumn(
            "lang", F.when(F.col("lang") == "en", "fr").otherwise("en")
        )
        assert abs(mcc_eval(flipped).collect()[0]["mcc"] + 1.0) < 1e-12

    def test_label_noise_flags_the_outlier(self, spark):
        from p2_mapreduce_spark.operators.curation import label_noise

        good = "the cat and the dog walked to a tree in town " * 8
        bad = "zzzz " * 3
        docs = spark.createDataFrame(
            [(i, good, "en", "s", len(good)) for i in range(4)]
            + [(i + 10, bad, "fr", "s", len(bad)) for i in range(4)]
            + [(99, good, "fr", "s", len(good))],  # mislabeled
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        got = {r["label"]: r for r in label_noise(docs).collect()}
        assert got["other"]["n_suspect"] >= 1  # the mislabeled good doc
        assert got["en"]["n_suspect"] == 0

    def test_ht_estimate_invariants(self, spark):
        from p2_mapreduce_spark.operators.curation import ht_estimate

        li = spark.createDataFrame(
            [(i, i % 7, 1, i % 4 + 1, 1.0, float(i % 50) + 0.25, 0.0,
              0.0, "N", "O", dt.datetime(2024, 1, 1))
             for i in range(800)],
            ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
             "l_quantity", "l_extendedprice", "l_discount", "l_tax",
             "l_returnflag", "l_linestatus", "l_shipdate"],
        )
        row = ht_estimate(li).collect()[0]
        assert row["n_total"] == 800
        assert 0 < row["n_sampled"] < 800
        # estimate is exactly 16x the sampled mass; error consistent
        est_err = (row["ht_estimate"] - row["true_total"]) / row["true_total"]
        assert abs(row["rel_err"] - est_err) < 1e-9

    def test_sentence_stats_hand(self, spark):
        from p2_mapreduce_spark.operators.text_analysis import sentence_stats

        docs = spark.createDataFrame(
            [
                (1, "One two three four. Short one! And a fifth token here?",
                 "en", "s1", 10),
                (2, "No enders at all just words", "en", "s1", 10),
                (3, "...", "en", "s2", 3),
            ],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        got = {r["source"]: r for r in sentence_stats(docs).collect()}
        s1 = got["s1"]
        # doc1: sentences 4/2/5 tokens; doc2: one 6-token sentence
        assert s1["n_sentences"] == 4
        assert s1["n_tokens"] == 4 + 2 + 5 + 6
        assert s1["max_tokens"] == 6
        assert s1["short_share_ppm"] == 250000  # 1 of 4 under 4 tokens
        assert got["s2"]["n_sentences"] == 0 and got["s2"]["avg_tokens"] == 0.0


class TestHoltWinters:
    def test_constant_series_converges_to_level(self, spark):
        """A constant series: level → the constant, trend → 0,
        seasonals → 0 (the additive decomposition of a flat line)."""
        from p2_mapreduce_spark.operators.timeseries import holt_winters

        rows = [(d, 1, "a", 10) for d in range(28)]
        row = holt_winters(_events6(spark, rows)).collect()[0]
        assert row["n_days"] == 28
        assert abs(row["level"] - 10.0) < 0.5
        assert abs(row["trend"]) < 0.2
        assert abs(row["forecast1"] - 10.0) < 0.5

    def test_weekly_cycle_learned(self, spark):
        """A pure weekly pattern: after 6 cycles the seasonal register
        carries the cycle and the 1-ahead forecast tracks the next
        day's value far better than the level alone."""
        from p2_mapreduce_spark.operators.timeseries import holt_winters

        cycle = [10, 10, 10, 10, 10, 50, 50]  # weekend spike
        rows = [(d, 1, "a", cycle[d % 7]) for d in range(42)]
        row = holt_winters(_events6(spark, rows)).collect()[0]
        # day 42 is a d%7==0 day → forecast should be near 10, not the
        # series mean (~21.4)
        assert abs(row["forecast1"] - 10.0) < 3.0

    def test_hand_trace_two_days(self, spark):
        from p2_mapreduce_spark.operators.timeseries import holt_winters

        rows = [(0, 1, "a", 4), (1, 1, "a", 8)]
        row = holt_winters(_events6(spark, rows)).collect()[0]
        # fold: d0 l=400 b=0 s0=0; d1 (slot 1, s1=0):
        # l' = .3*(800-0) + .7*(400+0) = 520;
        # b' = .05*(520-400) + .95*0 = 6;
        # s1' = .4*(800-520) + .6*0 = 112
        assert abs(row["level"] - 5.2) < 1e-12
        assert abs(row["trend"] - 0.06) < 1e-12
        # next slot = 2 % 7 = 2 → s2 = 0
        assert row["s_next"] == 0.0
        assert abs(row["forecast1"] - 5.26) < 1e-12


class TestGraphRound6:
    def test_jaccard_orders_by_overlap_share(self, spark):
        from p2_mapreduce_spark.operators.graph import (
            link_prediction_jaccard,
        )

        # suppliers 1..3; cust 10,11 share ALL their suppliers (1,2);
        # cust 12 shares supplier 1 with both but also has 3
        li = spark.createDataFrame(
            [(o, 1, s, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
              dt.datetime(2024, 1, 1))
             for o, s in [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3)]],
            ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
             "l_quantity", "l_extendedprice", "l_discount", "l_tax",
             "l_returnflag", "l_linestatus", "l_shipdate"],
        )
        orders = spark.createDataFrame(
            [(1, 10, "O", 1.0, dt.datetime(2024, 1, 1), "x"),
             (2, 11, "O", 1.0, dt.datetime(2024, 1, 1), "x"),
             (3, 12, "O", 1.0, dt.datetime(2024, 1, 1), "x")],
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderdate", "o_orderpriority"],
        )
        got = link_prediction_jaccard(li, orders, panel_k=10).collect()
        top = got[0]
        assert (top["cust_a"], top["cust_b"]) == (10, 11)
        assert abs(top["jaccard"] - 1.0) < 1e-12  # identical portfolios
        rest = {(r["cust_a"], r["cust_b"]): r["jaccard"] for r in got[1:]}
        assert abs(rest[(10, 12)] - 1 / 3) < 1e-12

    def test_modularity_perfect_split_and_sum(self, spark):
        from p2_mapreduce_spark.operators.graph import graph_modularity

        # two nations, trade strictly within nation → strong positive Q
        li = spark.createDataFrame(
            [(o, 1, s, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
              dt.datetime(2024, 1, 1))
             for o, s in [(1, 1), (2, 1), (3, 2), (4, 2)]],
            ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
             "l_quantity", "l_extendedprice", "l_discount", "l_tax",
             "l_returnflag", "l_linestatus", "l_shipdate"],
        )
        orders = spark.createDataFrame(
            [(1, 10, "O", 1.0, dt.datetime(2024, 1, 1), "x"),
             (2, 11, "O", 1.0, dt.datetime(2024, 1, 1), "x"),
             (3, 12, "O", 1.0, dt.datetime(2024, 1, 1), "x"),
             (4, 13, "O", 1.0, dt.datetime(2024, 1, 1), "x")],
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderdate", "o_orderpriority"],
        )
        customer = spark.createDataFrame(
            [(10, 0), (11, 0), (12, 1), (13, 1)],
            ["c_custkey", "c_nationkey"],
        )
        supplier = spark.createDataFrame(
            [(1, 0), (2, 1)], ["s_suppkey", "s_nationkey"]
        )
        rows = graph_modularity(li, orders, customer, supplier).collect()
        # 4 edges, all within-community, k balanced → Q = 1 − 2·(1/2)²
        q = rows[0]["q_total"]
        assert abs(q - 0.5) < 1e-12
        assert abs(sum(r["q_contrib"] for r in rows) - q) < 1e-12


class TestProfileRound6:
    def test_chi2_residuals_grid_and_zero_cells(self, spark):
        from p2_mapreduce_spark.operators.profile import chi2_residuals

        docs = spark.createDataFrame(
            [(i, "t", "en", "A", 1) for i in range(8)]
            + [(i + 10, "t", "fr", "B", 1) for i in range(8)],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        got = {(r["source"], r["lang"]): r
               for r in chi2_residuals(docs).collect()}
        assert len(got) == 4  # full grid incl. the two absent cells
        import math
        # exp = 8*8/16 = 4 everywhere; present cells (8−4)/2 = 2
        assert abs(got[("A", "en")]["residual"] - (8 - 4) / math.sqrt(4)) < 1e-12
        assert abs(got[("A", "fr")]["residual"] - (0 - 4) / math.sqrt(4)) < 1e-12

    def test_hbos_ranks_the_singleton(self, spark):
        from p2_mapreduce_spark.operators.profile import hbos_outliers

        rows = [(i, 1, "O", 100.0 + (i % 3), dt.datetime(2024, 1, 1),
                 "1-URGENT") for i in range(50)]
        # one order far away in price, alone in month and priority
        rows.append((99, 1, "O", 9999.0, dt.datetime(2024, 7, 1),
                     "5-LOW"))
        orders = spark.createDataFrame(
            rows,
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderdate", "o_orderpriority"],
        )
        top = hbos_outliers(orders, top_n=3).collect()[0]
        assert top["o_orderkey"] == 99
        assert top["c_price"] == 1 and top["c_month"] == 1
        assert abs(top["rarity"] - 1.0) < 1e-12


class TestAnalyticsRound6:
    def test_rbo_identical_and_disjoint(self, spark):
        from p2_mapreduce_spark.operators.analytics import rbo_ranks

        # qty proportional to revenue → identical rankings → rbo =
        # (1−p)·Σ p^(d−1) (overlap X_d = d at every depth)
        li = spark.createDataFrame(
            [(i, 1, i, 1, float(100 - i), float(1000 - i), 0.0, 0.0,
              "N", "O", dt.datetime(2024, 1, 1)) for i in range(1, 31)],
            ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
             "l_quantity", "l_extendedprice", "l_discount", "l_tax",
             "l_returnflag", "l_linestatus", "l_shipdate"],
        )
        row = rbo_ranks(li).collect()[0]
        expect = 0.1 * sum(0.9 ** (d - 1) for d in range(1, 21))
        assert row["overlap_at_depth"] == 20
        assert abs(row["rbo"] - expect) < 1e-12

    def test_xyz_classes_hand(self, spark):
        from p2_mapreduce_spark.operators.analytics import xyz_class

        # part 1: constant qty (X); part 2: wildly varying (Z);
        # part 3: single line (X by definition)
        rows = [(1, 1, 5.0), (1, 1, 5.0), (1, 1, 5.0),
                (2, 2, 1.0), (2, 2, 50.0), (2, 2, 1.0),
                (3, 3, 7.0)]
        li = spark.createDataFrame(
            [(o, p, 1, 1, q, 1.0, 0.0, 0.0, "N", "O",
              dt.datetime(2024, 1, 1)) for (o, p, q) in rows],
            ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
             "l_quantity", "l_extendedprice", "l_discount", "l_tax",
             "l_returnflag", "l_linestatus", "l_shipdate"],
        )
        got = {r["xyz"]: r for r in xyz_class(li).collect()}
        assert got["X"]["n_parts"] == 2
        assert got["Z"]["n_parts"] == 1


class TestTpchRound6:
    def test_custdist_includes_zero_bucket(self, spark):
        from p2_mapreduce_spark.operators.tpch import custdist

        customer = spark.createDataFrame(
            [(i,) for i in range(1, 6)], ["c_custkey"]
        )
        orders = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 2), (4, 3), (5, 3), (6, 3)],
            ["o_orderkey", "o_custkey"],
        )
        got = {r["c_count"]: r["custdist"] for r in
               custdist(customer, orders).collect()}
        # cust1: 2 orders, cust2: 1, cust3: 3, cust4/5: 0
        assert got == {0: 2, 1: 1, 2: 1, 3: 1}

    def test_min_cost_supplier_picks_cheapest_with_tiebreak(self, spark):
        from p2_mapreduce_spark.operators.tpch import min_cost_supplier

        # part 1: supp 2 cheaper; part 2: exact unit-price tie -> lower
        # suppkey wins
        li = spark.createDataFrame(
            [
                (1, 1, 1, 1, 2.0, 10.0, 0.0, 0.0, "N", "O",
                 dt.datetime(2024, 1, 1)),   # unit 5.0
                (2, 1, 2, 1, 4.0, 10.0, 0.0, 0.0, "N", "O",
                 dt.datetime(2024, 1, 1)),   # unit 2.5 -> winner
                (3, 2, 3, 1, 1.0, 7.0, 0.0, 0.0, "N", "O",
                 dt.datetime(2024, 1, 1)),   # unit 7.0
                (4, 2, 4, 1, 2.0, 14.0, 0.0, 0.0, "N", "O",
                 dt.datetime(2024, 1, 1)),   # unit 7.0 tie -> supp 3
            ],
            ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
             "l_quantity", "l_extendedprice", "l_discount", "l_tax",
             "l_returnflag", "l_linestatus", "l_shipdate"],
        )
        supplier = spark.createDataFrame(
            [(i, f"S{i}", i % 2) for i in range(1, 5)],
            ["s_suppkey", "s_name", "s_nationkey"],
        )
        nation = spark.createDataFrame(
            [(0, "A"), (1, "B")], ["n_nationkey", "n_name"]
        )
        got = {r["p_partkey"]: r for r in
               min_cost_supplier(li, supplier, nation).collect()}
        assert got[1]["s_suppkey"] == 2 and got[1]["unit_price"] == 25000
        assert got[2]["s_suppkey"] == 3  # tie broken by suppkey


class TestDecoderEdgePaths:
    """Pure-Python payloads for decoder paths the JVM attach tables
    don't reach: multi-frame FLAC streams and AC-refinement EOB runs
    spanning multiple blocks."""

    def test_flac_two_frames(self):
        from p2_mapreduce_spark.operators.multimodal import (
            _crc8_flac,
            _crc16_flac,
            _decode_flac,
        )

        n = 16
        total = 2 * n
        si = n.to_bytes(2, "big") * 2 + b"\x00" * 6
        bits = (
            format(8000, "020b") + "000" + format(15, "05b")
            + format(total, "036b")
        )
        si += int(bits, 2).to_bytes(8, "big") + b"\x00" * 16
        payload = b"fLaC" + b"\x80" + (34).to_bytes(3, "big") + si
        samples = []
        for fno in (0, 1):
            a, b1, c = 20 + fno, 1, -1
            fh = bytes([0xFF, 0xF8, 0x60, 0x08, fno, n - 1])
            fh += bytes([_crc8_flac(fh)])
            body = "00010100"
            body += format(a, "016b") + format(a + b1, "016b")
            body += "00" + "0000" + "0010"
            u = -2 * c - 1  # c = −1 → u = 1
            body += ("0" * (u >> 2) + "1" + format(u & 3, "02b")) * (n - 2)
            body += "0" * ((8 - len(body) % 8) % 8)
            frame = fh + bytes(
                int(body[i:i + 8], 2) for i in range(0, len(body), 8)
            )
            frame += _crc16_flac(frame).to_bytes(2, "big")
            payload += frame
            samples += [
                a + b1 * t + c * t * (t - 1) // 2 for t in range(n)
            ]
        rate, nch, chans = _decode_flac(payload)
        assert rate == 8000 and nch == 1
        assert chans[0] == samples

    def test_ac_refinement_eobrun_spans_blocks(self):
        """A refinement scan whose ONLY symbol is an EOB-run covering
        both blocks must still hand every covered block's nonzero
        history its correction bit (the post-EOB sweep path)."""
        from p2_mapreduce_spark.operators.multimodal import (
            _decode_jpeg_progressive,
        )

        def pack(bits):
            bits += "1" * ((8 - len(bits) % 8) % 8)
            out = bytearray()
            for i in range(0, len(bits), 8):
                byte = int(bits[i:i + 8], 2)
                out.append(byte)
                if byte == 0xFF:
                    out.append(0x00)
            return bytes(out)

        hexs = "ffd8"
        hexs += "ffdb" + "0043" + "00" + "08" + "01" * 38 + "08" + "01" * 24
        hexs += ("ffc4" + "001b" + "00" + "00000701" + "00" * 12
                 + "0001020304050607")
        # AC table: EOB0 '0', ZRL '10', 0x61 '110', EOB-r1 (0x10)
        # '1110' — the 4th code lets ONE refinement symbol cover both
        # blocks via eobrun
        hexs += ("ffc4" + "0017" + "10" + "01010101" + "00" * 12
                 + "00f06110")
        # grayscale SOF2, 16×8 → two blocks
        hexs += "ffc2" + "000b" + "08" + "0008" + "0010" + "01" + "01" + "11" + "00"
        payload = bytes.fromhex(hexs)
        # DC first scan (Al=0): two blocks, DC = +8 then −8 (cat 4)
        payload += bytes.fromhex("ffda00080101000000" + "00")
        payload += pack("100" + "1000" + "100" + "0111")
        # AC first scan (Al=1): each block coef +1 at z39
        payload += bytes.fromhex("ffda00080101000" + "13f01")
        payload += pack(("1010" + "110" + "1" + "0") * 2)
        # AC refinement (Ah=1, Al=0): ONE EOB-r1 symbol ('1110' +
        # 1 appended bit '0' → eobrun covers block 2 as well), then the
        # post-EOB sweeps still hand each block its correction bit:
        # block 1 gets '1' (|coef| 2 → 3), block 2 gets '0' (stays 2)
        payload += bytes.fromhex("ffda00080101000" + "13f10")
        payload += pack("1110" + "0" + "1" + "0")
        payload += bytes.fromhex("ffd9")
        res = _decode_jpeg_progressive(payload)
        assert res is not None
        w, h, planes = res
        assert (w, h) == (16, 8)
        # block 1: DC 8 → 136 base, AC amp now 3 (2 +1 correction);
        # block 2: DC 0 → 128 base, amp stays 2
        vals1 = {v for row in planes[0] for v in row[:8]}
        vals2 = {v for row in planes[0] for v in row[8:]}
        assert vals1 == {133, 139}
        assert vals2 == {126, 130}


class TestProgressiveDri:
    def test_dri_decode_matches_closed_form(self, spark):
        """Restart segments byte-realign and reset the DC predictor;
        the per-segment diff pattern reproduces the no-DRI chain."""
        from p2_mapreduce_spark.operators.multimodal import (
            _decode_jpeg,
            attach_jpeg_prog_dri,
        )

        docs = spark.createDataFrame(
            [(i, "x") for i in range(8)], ["doc_id", "text"]
        )
        for r in attach_jpeg_prog_dri(docs).collect():
            mid = r["media_id"]
            parsed = _decode_jpeg(bytes(r["payload"]))
            assert parsed is not None, f"id {mid} quarantined"
            w, h, planes = parsed
            wb, hb = 1 + mid % 2, 1 + (mid % 4) // 2
            n, a8 = wb * hb, mid % 8
            assert (w, h) == (8 * wb, 8 * hb)
            got = sum(v for row in planes[0] for v in row)
            exp = sum(
                64 * (128 + a8 + 16 * (1 - m % 2)) for m in range(n)
            )
            assert got == exp, f"id {mid}"

    def test_bad_restart_marker_quarantines(self, spark):
        """Corrupting an RSTn byte must quarantine, proving the marker
        verify is load-bearing."""
        from p2_mapreduce_spark.operators.multimodal import (
            _decode_jpeg_progressive,
            attach_jpeg_prog_dri,
        )

        docs = spark.createDataFrame([(3, "x")], ["doc_id", "text"])
        payload = bytearray(attach_jpeg_prog_dri(docs).collect()[0]["payload"])
        # id 3 → nb = 4 → RST0 markers present; break the first one
        idx = bytes(payload).find(b"\xff\xd0")
        assert idx > 0
        payload[idx + 1] = 0xD5  # wrong restart number
        assert _decode_jpeg_progressive(bytes(payload)) is None


class TestSubsampledProgressive:
    def test_420_prog_matches_420_closed_form(self, spark):
        """The 4:2:0 progressive table reconstructs exactly the
        attach_jpeg420 pixel layout: luma stripes checker by sub-block
        column, whole MCUs alternate chroma."""
        import math

        from p2_mapreduce_spark.operators.multimodal import (
            _decode_jpeg,
            attach_jpeg420_prog,
        )

        docs = spark.createDataFrame(
            [(i, "x") for i in range(8)], ["doc_id", "text"]
        )
        for r in attach_jpeg420_prog(docs).collect():
            mid = r["media_id"]
            parsed = _decode_jpeg(bytes(r["payload"]))
            assert parsed is not None, f"id {mid} quarantined"
            w, h, planes = parsed
            wb, hb = 1 + mid % 2, 1 + (mid % 4) // 2
            id8, id5, id7 = mid % 8, mid % 5, mid % 7
            assert (w, h) == (16 * wb, 16 * hb) and len(planes) == 3
            exp = [0, 0, 0]
            for m in range(wb * hb):
                cpar = 1 - m % 2
                for stripe in (1, 0):
                    yv = 128 + id8 + 8 * stripe
                    cbo = id5 + 8 * cpar
                    cro = id7 + 8 * cpar
                    vals = (
                        math.floor(yv + 1.402 * cro + 0.5),
                        math.floor(
                            yv - 0.344136 * cbo - 0.714136 * cro + 0.5
                        ),
                        math.floor(yv + 1.772 * cbo + 0.5),
                    )
                    for i, v in enumerate(vals):
                        exp[i] += 128 * v
            got = [sum(v for row in ch for v in row) for ch in planes]
            assert got == exp, f"id {mid}"

    def test_beyond_2x2_sampling_still_gated(self):
        from p2_mapreduce_spark.operators.multimodal import (
            _decode_jpeg_progressive,
        )

        bad = bytes.fromhex(
            "ffd8" + "ffc2" + "0011" + "08" + "0010" + "0010"
            + "03" + "014400" + "021100" + "031100" + "ffd9"
        )
        assert _decode_jpeg_progressive(bad) is None


def test_croston_state_stream_equals_batch(spark, sf_dir, tmp_path):
    """Streaming forecast-state maintenance: after all micro-batches
    drain, the persisted day-grain contraction equals the batch one
    bit-for-bit, and Croston answered FROM THE STATE equals the batch
    operator over the full event history."""
    import pyspark.sql.functions as F2

    from p2_mapreduce_spark.operators.timeseries import croston
    from p2_mapreduce_spark.session import load_table
    from p2_mapreduce_spark.streaming.sinks import (
        croston_from_state,
        daily_cents_state_sink,
        load_latest_state,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    src = str(tmp_path / "events_src_croston")
    events.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    state_path = str(tmp_path / "croston_state")
    q = daily_cents_state_sink(
        stream, state_path, str(tmp_path / "ck_croston")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        map(tuple, load_latest_state(spark, state_path).collect())
    )
    want = sorted(
        map(
            tuple,
            events.select(
                "event_type",
                F2.to_date("ts").alias("d"),
                F2.floor(F2.col("value") * 100)
                .cast("bigint")
                .alias("cents"),
            )
            .groupBy("event_type", "d")
            .agg(F2.sum("cents").alias("y"))
            .collect(),
        )
    )
    assert got == want
    live = sorted(
        map(
            tuple,
            croston_from_state(
                load_latest_state(spark, state_path)
            ).collect(),
        )
    )
    batch = sorted(
        map(tuple, croston(load_table(spark, sf_dir, "events")).collect())
    )
    assert live == batch
