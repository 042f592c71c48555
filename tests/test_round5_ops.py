"""Round-5 operator tests: drift/association stats (TVD, λ), rank and
randomness tests (runs, Spearman, Kendall), forecast-baseline evals
(MASE, pinball), classifier gains, deterministic dropout, and the
blocking-quality audit."""

import datetime as dt

from pyspark.sql import functions as F


def _events(spark, rows):
    """rows: list of (day_offset, event_type, value) → events frame."""
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (base + dt.timedelta(days=d, hours=i % 5), g, float(v))
            for i, (d, g, v) in enumerate(rows)
        ],
        ["ts", "event_type", "value"],
    )


class TestTvdDrift:
    def test_hand_computed_two_sources(self, spark):
        from p2_mapreduce_spark.operators.profile import tvd_drift

        docs = spark.createDataFrame(
            [("A", "en")] * 2 + [("A", "fr")] * 2 + [("B", "en")] * 4,
            ["source", "lang"],
        )
        got = {r["source"]: r for r in tvd_drift(docs).collect()}
        # A: p=(.5,.5) vs rest=B: q=(1,0) → ½(|.5−1|+|.5−0|) = .5
        assert abs(got["A"]["tvd"] - 0.5) < 1e-12
        assert abs(got["B"]["tvd"] - 0.5) < 1e-12
        assert got["A"]["n_group"] == 4 and got["A"]["n_rest"] == 4

    def test_identical_distributions_zero(self, spark):
        from p2_mapreduce_spark.operators.profile import tvd_drift

        docs = spark.createDataFrame(
            [("A", "en"), ("A", "fr"), ("B", "en"), ("B", "fr")],
            ["source", "lang"],
        )
        for r in tvd_drift(docs).collect():
            assert abs(r["tvd"]) < 1e-12


class TestGkLambda:
    def test_hand_computed(self, spark):
        from p2_mapreduce_spark.operators.profile import gk_lambda

        docs = spark.createDataFrame(
            [("x1", "a")] * 3 + [("x1", "b")] * 1 + [("x2", "b")] * 4,
            ["source", "lang"],
        )
        r = gk_lambda(docs).collect()[0]
        # Σ_x max = 3+4 = 7; global modal lang = b (5); n = 8
        assert r["sum_modal"] == 7 and r["global_modal"] == 5
        assert abs(r["lambda_yx"] - (7 - 5) / (8 - 5)) < 1e-12

    def test_perfect_and_zero_association(self, spark):
        from p2_mapreduce_spark.operators.profile import gk_lambda

        perfect = spark.createDataFrame(
            [("x1", "a")] * 2 + [("x2", "b")] * 3, ["source", "lang"]
        )
        assert gk_lambda(perfect).collect()[0]["lambda_yx"] == 1.0
        # y constant → n_rows == global_modal → λ = 0 by convention
        const = spark.createDataFrame(
            [("x1", "a"), ("x2", "a")], ["source", "lang"]
        )
        assert gk_lambda(const).collect()[0]["lambda_yx"] == 0.0


class TestRunsTest:
    def test_hand_computed(self, spark):
        from p2_mapreduce_spark.operators.timeseries import runs_test

        # daily values 1,2,1,2,3,1 → moves +,−,+,+,− → 4 runs, 3 up 2 dn
        ev = _events(spark, [(d, "view", v) for d, v in
                             enumerate([1, 2, 1, 2, 3, 1])])
        r = runs_test(ev).collect()[0]
        assert (r["n_moves"], r["n_up"], r["n_down"], r["n_runs"]) == (
            5, 3, 2, 4)
        mu = 2 * 3 * 2 / 5 + 1
        var = 2 * 3 * 2 * (12 - 5) / (25 * 4)
        assert abs(r["z"] - (4 - mu) / var ** 0.5) < 1e-12

    def test_monotone_series_single_run(self, spark):
        from p2_mapreduce_spark.operators.timeseries import runs_test

        ev = _events(spark, [(d, "view", d + 1) for d in range(6)])
        r = runs_test(ev).collect()[0]
        # all moves up → z pinned to 0 by the degenerate-counts guard
        assert r["n_runs"] == 1 and r["n_down"] == 0 and r["z"] == 0.0


class TestRankCorrelation:
    def test_concordant_series(self, spark):
        from p2_mapreduce_spark.operators.timeseries import (
            kendall_tau_xy,
            spearman_daily,
        )

        # day d: d+1 events, each value 10·(d+1) → volume and revenue
        # strictly co-monotone
        rows = []
        for d in range(4):
            rows += [(d, "view", 10 * (d + 1))] * (d + 1)
        ev = _events(spark, rows)
        rho = spearman_daily(ev).collect()[0]
        assert rho["n_days"] == 4 and abs(rho["rho"] - 1.0) < 1e-12
        tau = kendall_tau_xy(ev).collect()[0]
        assert tau["concordant"] == 6 and tau["discordant"] == 0
        assert abs(tau["tau_b"] - 1.0) < 1e-12

    def test_anticoncordant_series(self, spark):
        from p2_mapreduce_spark.operators.timeseries import (
            kendall_tau_xy,
            spearman_daily,
        )

        # more events on days with lower total revenue
        rows = []
        revenue = [100, 50, 20, 5]
        for d in range(4):
            per = revenue[d] / (d + 1)
            rows += [(d, "view", per)] * (d + 1)
        ev = _events(spark, rows)
        assert abs(spearman_daily(ev).collect()[0]["rho"] + 1.0) < 1e-12
        assert abs(kendall_tau_xy(ev).collect()[0]["tau_b"] + 1.0) < 1e-12


class TestForecastEvals:
    def test_mase_weekly_pattern_is_zero(self, spark):
        from p2_mapreduce_spark.operators.timeseries import mase_eval

        pattern = [5, 9, 2, 7, 4, 8, 3]
        ev = _events(
            spark, [(d, "view", pattern[d % 7]) for d in range(14)]
        )
        r = mase_eval(ev).collect()[0]
        assert r["n_seasonal"] == 7 and r["n_naive"] == 13
        assert r["mase"] == 0.0 and r["mae_seasonal"] == 0.0
        assert r["mae_naive"] > 0

    def test_pinball_hand_computed(self, spark):
        from p2_mapreduce_spark.operators.timeseries import pinball_eval

        # train days 0..14 values 1..15 → p90 rank ceil(13.5)=14 → f=14
        # test days 15..29 value 15 → loss10 = 9·(1500−1400) per day
        rows = [(d, "view", d + 1) for d in range(15)]
        rows += [(d, "view", 15) for d in range(15, 30)]
        ev = _events(spark, rows)
        r = pinball_eval(ev).collect()[0]
        assert r["n_train"] == 15 and r["n_test"] == 15
        assert r["forecast"] == 14.0
        assert abs(r["mean_pinball"] - 0.9) < 1e-12


class TestDecileLift:
    def test_shape_and_monotone_capture(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.curation import decile_lift
        from p2_mapreduce_spark.session import load_table

        docs = load_table(spark, sf_dir, "documents")
        rows = sorted(decile_lift(docs).collect(), key=lambda r: r["decile"])
        assert [r["decile"] for r in rows] == list(range(1, 11))
        n_docs = docs.count()
        assert rows[-1]["cum_docs"] == n_docs
        assert abs(rows[-1]["capture"] - 1.0) < 1e-12
        captures = [r["capture"] for r in rows]
        assert captures == sorted(captures)
        # equal-frequency deciles: sizes differ by at most 1
        sizes = [r["n_docs"] for r in rows]
        assert max(sizes) - min(sizes) <= 1


class TestTokenDropout:
    def test_content_keyed_and_deterministic(self, spark):
        from p2_mapreduce_spark.operators.curation import token_dropout

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "gamma alpha zeta")],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r for r in token_dropout(docs).collect()}
        assert out[1]["n_tokens"] == 4 and out[2]["n_tokens"] == 3
        kept1 = set(out[1]["text_aug"].split())
        kept2 = set(out[2]["text_aug"].split())
        # the mask is keyed on token CONTENT: a token dropped anywhere
        # is dropped everywhere
        for tok in {"alpha", "gamma"}:
            assert (tok in kept1) == (tok in kept2)
        again = {r["doc_id"]: r for r in token_dropout(docs).collect()}
        assert again[1]["text_aug"] == out[1]["text_aug"]

    def test_drop_mod_one_drops_everything(self, spark):
        from p2_mapreduce_spark.operators.curation import token_dropout

        docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        r = token_dropout(docs, drop_mod=1).collect()[0]
        assert r["n_kept"] == 0 and r["text_aug"] == ""


class TestBlockingQuality:
    def test_identical_docs_are_complete(self, spark):
        from p2_mapreduce_spark.operators.dedup import blocking_quality

        text = "the quick brown fox jumps over the lazy dog " * 3
        docs = spark.createDataFrame(
            [(1, text), (2, text), (3, "совершенно другой текст здесь "
                                       "ничего общего нет вовсе")],
            ["doc_id", "text"],
        )
        r = blocking_quality(docs).collect()[0]
        # identical docs: truth pair (jaccard 1) AND identical simhash →
        # guaranteed candidate → completeness 1
        assert r["n_truth"] >= 1 and r["n_hit"] == r["n_truth"]
        assert r["pair_completeness"] == 1.0
        assert 0.0 <= r["reduction_ratio"] <= 1.0

    def test_fixture_bounds(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.dedup import blocking_quality
        from p2_mapreduce_spark.session import load_table

        docs = load_table(spark, sf_dir, "documents")
        r = blocking_quality(docs).collect()[0]
        assert r["n_hit"] <= r["n_truth"]
        assert r["n_candidates"] <= r["n_docs"] * (r["n_docs"] - 1) // 2
        if r["n_truth"] > 0:
            assert 0.0 <= r["pair_completeness"] <= 1.0


class TestJpeg420:
    def test_decode_matches_closed_form(self, spark):
        from p2_mapreduce_spark.operators.multimodal import (
            _decode_jpeg,
            attach_jpeg420,
        )

        docs = spark.createDataFrame(
            [(i, "x") for i in range(8)], ["doc_id", "text"]
        )
        rows = attach_jpeg420(docs).collect()
        assert len(rows) == 8
        for r in rows:
            mid = r["media_id"]
            wb, hb = 1 + mid % 2, 1 + (mid % 4) // 2
            parsed = _decode_jpeg(bytes(r["payload"]))
            assert parsed is not None, f"id {mid} quarantined"
            w, h, planes = parsed
            assert (w, h) == (16 * wb, 16 * hb) and len(planes) == 3
            a8, b5, c7 = mid % 8, mid % 5, mid % 7
            n = wb * hb
            ne = (n + 1) // 2
            import math

            def cells(coef_cb, coef_cr):
                tot = 0
                for par, cnt in ((1, ne), (0, n - ne)):
                    cb = b5 + 8 * par
                    cr = c7 + 8 * par
                    for y in (136 + a8, 128 + a8):
                        tot += cnt * 128 * int(
                            math.floor(y + coef_cb * cb + coef_cr * cr + 0.5)
                        )
                return tot

            got = [sum(v for row in ch for v in row) for ch in planes]
            assert got[0] == cells(0.0, 1.402)
            assert got[1] == cells(-0.344136, -0.714136)
            assert got[2] == cells(1.772, 0.0)

    def test_subsampled_chroma_still_gated(self):
        """2×2 CHROMA (illegal in our envelope: only luma subsamples)
        must quarantine, as must 4×1 luma."""
        from p2_mapreduce_spark.operators.multimodal import _decode_jpeg

        # minimal header with SOF0 declaring chroma 2×2 — decoder must
        # reject before any entropy work
        sof = bytes.fromhex(
            "ffd8"
            + "ffc0" + "0011" + "08" + "0010" + "0010"
            + "03" + "012200" + "022200" + "031100"
        )
        assert _decode_jpeg(sof) is None
        sof41 = bytes.fromhex(
            "ffd8"
            + "ffc0" + "0011" + "08" + "0010" + "0020"
            + "03" + "014100" + "021100" + "031100"
        )
        assert _decode_jpeg(sof41) is None


class TestAbcParts:
    def test_classes_partition_revenue(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.analytics import abc_parts
        from p2_mapreduce_spark.session import load_table

        li = load_table(spark, sf_dir, "lineitem")
        rows = {r["abc_class"]: r for r in abc_parts(li).collect()}
        assert set(rows) <= {"A", "B", "C"} and "A" in rows
        total_share = sum(r["revenue_share"] for r in rows.values())
        assert abs(total_share - 1.0) < 1e-9
        # A-parts produce at most 80% of revenue but more than any
        # single later class's per-part average implies
        assert rows["A"]["revenue_share"] <= 0.8 + 1e-12
        if "C" in rows:
            a_avg = rows["A"]["class_cents"] / rows["A"]["n_parts"]
            c_avg = rows["C"]["class_cents"] / rows["C"]["n_parts"]
            assert a_avg > c_avg

    def test_hand_computed(self, spark):
        from p2_mapreduce_spark.operators.analytics import abc_parts

        # revenues 70, 20, 6, 4 (discount 0): cum shares .7, .9, .96, 1
        li = spark.createDataFrame(
            [(k, float(v), 0.0) for k, v in
             [(1, 70), (2, 20), (3, 6), (4, 4)]],
            ["l_partkey", "l_extendedprice", "l_discount"],
        )
        got = {r["abc_class"]: r["n_parts"] for r in abc_parts(li).collect()}
        assert got == {"A": 1, "B": 1, "C": 2}


class TestHoltLinear:
    def test_linear_ramp_learns_trend(self, spark):
        from p2_mapreduce_spark.operators.timeseries import holt_linear

        # y_t = 10·(t+1): Holt with alpha=beta=.5 converges toward
        # trend 10 and forecast ahead of the last level
        ev = _events(spark, [(d, "view", 10 * (d + 1)) for d in range(20)])
        r = holt_linear(ev).collect()[0]
        assert r["n_days"] == 20
        assert 8.0 < r["trend"] < 12.0
        assert r["forecast7"] > r["level"]

    def test_constant_series(self, spark):
        from p2_mapreduce_spark.operators.timeseries import holt_linear

        ev = _events(spark, [(d, "view", 42) for d in range(10)])
        r = holt_linear(ev).collect()[0]
        assert abs(r["level"] - 42.0) < 1e-9
        assert abs(r["trend"]) < 1e-9
        assert abs(r["forecast7"] - 42.0) < 1e-9


class TestConformalBand:
    def test_coverage_on_fixture(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.profile import conformal_band
        from p2_mapreduce_spark.session import load_table

        ev = load_table(spark, sf_dir, "events")
        bands = {r["event_type"]: r for r in conformal_band(ev).collect()}
        import pyspark.sql.functions as F2

        for g, r in bands.items():
            assert r["lo"] <= r["mean"] <= r["hi"]
            n_in = ev.filter(
                (F2.col("event_type") == g)
                & (F2.col("value") >= r["lo"] - 1e-9)
                & (F2.col("value") <= r["hi"] + 1e-9)
            ).count()
            # finite-sample guarantee: ≥ q·(n+1)/n − 1/n coverage;
            # assert the practical floor
            assert n_in / r["n"] >= 0.88


class TestGraphShape:
    def test_degree_histogram_conserves_nodes_and_edges(self, spark):
        from p2_mapreduce_spark.operators.graph import degree_histogram

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (3, 4), (4, 4)], ["u", "v"]
        )
        rows = degree_histogram(edges).collect()
        # self-loop dropped: degrees 1:{2,} ... nodes 1,2 deg 2; 3 deg 3; 4 deg 1
        got = {r["degree"]: r["n_nodes"] for r in rows}
        assert got == {2: 2, 3: 1, 1: 1}

    def test_link_prediction_deterministic_top(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.graph import link_prediction
        from p2_mapreduce_spark.session import load_table

        li = load_table(spark, sf_dir, "lineitem")
        od = load_table(spark, sf_dir, "orders")
        a = link_prediction(li, od).collect()
        b = link_prediction(li, od).collect()
        assert a == b and len(a) <= 20
        scores = [r["n_common"] for r in a]
        assert scores == sorted(scores, reverse=True)


class TestSearchRound5:
    def test_snippet_finds_dense_window(self, spark):
        from p2_mapreduce_spark.operators.search import search_snippets

        docs = spark.createDataFrame(
            [
                (1, "xx yy zz aa bb cc dd ee data join data ff"),
                (2, "nothing relevant here at all"),
            ],
            ["doc_id", "text"],
        )
        rows = {r["doc_id"]: r for r in search_snippets(docs).collect()}
        assert 2 not in rows
        r = rows[1]
        assert r["n_hits"] == 3
        assert "data join data" in r["snippet"]

    def test_fuzzy_matches_typos(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.search import fuzzy_search
        from p2_mapreduce_spark.session import load_table

        part = load_table(spark, sf_dir, "part")
        got = {(r["query"], r["token"]) for r in fuzzy_search(part).collect()}
        assert ("lrge", "large") in got
        assert ("gizmmo", "gizmo") in got
        assert ("bold", "bolt") in got and ("bold", "cold") in got


class TestKmeansPurity:
    def test_purity_bounds_and_totals(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.similarity import (
            kmeans_embeddings,
            kmeans_purity,
        )
        from p2_mapreduce_spark.session import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        pur = kmeans_purity(emb).collect()
        km = {r["cluster"]: r["n_members"]
              for r in kmeans_embeddings(emb).collect()}
        for r in pur:
            assert 0.0 < r["purity"] <= 1.0
            assert r["n_modal"] <= r["n_members"]
            # same assignment as the clustering op
            assert km[r["cluster"]] == r["n_members"]
        assert sum(r["n_members"] for r in pur) == emb.count()


class TestAveragePrecision:
    def test_perfect_and_worst_ranking(self, spark):
        from p2_mapreduce_spark.operators.curation import average_precision

        # long English docs outrank short foreign ones by margin →
        # construct so positives (en) rank first: margin grows with
        # token count and 'the' hits
        docs = spark.createDataFrame(
            [(i, "the " * 40 + "alpha beta", "en") for i in range(5)]
            + [(i, "corto", "es") for i in range(5, 10)],
            ["doc_id", "text", "lang"],
        )
        r = average_precision(docs).collect()[0]
        assert r["n_pos"] == 5 and r["n_docs"] == 10
        # positives occupy ranks 1..5 → every precision term is 1 (up
        # to nano flooring)
        assert r["average_precision"] > 0.999999

    def test_matches_bruteforce_on_fixture(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.curation import (
            average_precision,
            quality_classifier,
        )
        from p2_mapreduce_spark.session import load_table

        docs = load_table(spark, sf_dir, "documents")
        r = average_precision(docs).collect()[0]
        import pyspark.sql.functions as F2

        scored = (
            quality_classifier(docs)
            .select("doc_id", "margin")
            .join(
                docs.select(
                    "doc_id",
                    (F2.col("lang") == "en").cast("int").alias("pos"),
                ),
                "doc_id",
            )
            .orderBy(F2.col("margin").desc(), F2.col("doc_id"))
            .collect()
        )
        cum = 0
        s = 0
        for k, row in enumerate(scored, 1):
            if row["pos"]:
                cum += 1
                s += (cum * 10**9) // k
        assert r["ap_nano_sum"] == s


class TestIsotonicCalibration:
    def test_monotone_and_weighted_mean_preserved(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.curation import isotonic_calibration
        from p2_mapreduce_spark.session import load_table

        docs = load_table(spark, sf_dir, "documents")
        rows = sorted(
            isotonic_calibration(docs).collect(), key=lambda r: r["bin"]
        )
        iso = [r["iso_rate"] for r in rows]
        assert iso == sorted(iso), "isotonic fit must be nondecreasing"
        # PAV preserves the weighted mean of the response
        tot_n = sum(r["n_docs"] for r in rows)
        raw_mean = sum(r["n_pos"] for r in rows) / tot_n
        iso_mean = sum(r["iso_rate"] * r["n_docs"] for r in rows) / tot_n
        assert abs(raw_mean - iso_mean) < 1e-9
        for r in rows:
            assert 0.0 <= r["iso_rate"] <= 1.0


class TestRakingWeights:
    def test_margins_converge(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.curation import raking_weights
        from p2_mapreduce_spark.session import load_table

        docs = load_table(spark, sf_dir, "documents")
        rows = raking_weights(docs).collect()
        total = sum(r["n_docs"] for r in rows)
        langs = {r["lang"] for r in rows}
        # after the final column step, language marginals are exactly
        # uniform (up to micro flooring)
        per_lang = {}
        for r in rows:
            per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + r["weight"]
        target = total / len(langs)
        for v in per_lang.values():
            assert abs(v - target) / target < 1e-3
        # source marginals stay near observed (raking converges fast)
        per_src_w = {}
        per_src_n = {}
        for r in rows:
            per_src_w[r["source"]] = per_src_w.get(r["source"], 0) + r["weight"]
            per_src_n[r["source"]] = per_src_n.get(r["source"], 0) + r["n_docs"]
        for s in per_src_w:
            assert abs(per_src_w[s] - per_src_n[s]) / per_src_n[s] < 0.25


class TestDupClusterSizes:
    def test_histogram_consistent_with_clusters(self, spark, sf_dir):
        import __spark_entry__ as em

        qs = em.queries()
        sizes = {
            r["cluster_size"]: r["n_clusters"]
            for r in qs["dup_cluster_sizes"](spark, sf_dir).collect()
        }
        assert sizes, "fixture seeds near-dups, histogram can't be empty"
        for sz, n in sizes.items():
            assert sz >= 2 and n >= 1


class TestAdpcm:
    def test_decode_matches_reference(self, spark):
        from p2_mapreduce_spark.operators.multimodal import (
            ADPCM_INDEX_TABLE,
            ADPCM_STEP_TABLE,
            _decode_adpcm,
            attach_adpcm,
        )

        docs = spark.createDataFrame(
            [(i, "x") for i in range(12)], ["doc_id", "text"]
        )
        for r in attach_adpcm(docs).collect():
            mid = r["media_id"]
            parsed = _decode_adpcm(bytes(r["payload"]))
            assert parsed is not None, f"id {mid} quarantined"
            rate, n, total, peak = parsed
            nn = 64 + (mid % 32) * 2
            assert n == nn + 1
            assert rate == 8000 + (mid % 3) * 4000
            # independent pure-Python reference over the nibble design
            pred = (mid * 31) % 4096 - 2048
            idx = mid % 89
            ref_total, ref_peak = pred, abs(pred)
            for i in range(nn):
                nib = (mid * 7 + i * 3) % 16
                step = ADPCM_STEP_TABLE[idx]
                diff = step >> 3
                if nib & 4:
                    diff += step
                if nib & 2:
                    diff += step >> 1
                if nib & 1:
                    diff += step >> 2
                pred = pred - diff if nib & 8 else pred + diff
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + ADPCM_INDEX_TABLE[nib]))
                ref_total += pred
                ref_peak = max(ref_peak, abs(pred))
            assert total == ref_total and peak == ref_peak

    def test_malformed_quarantines(self):
        from p2_mapreduce_spark.operators.multimodal import _decode_adpcm

        assert _decode_adpcm(b"") is None
        assert _decode_adpcm(b"RIFF\x00\x00\x00\x00WAVE") is None
        # a 16-bit PCM wav must NOT decode through the ADPCM kernel
        pcm = (
            b"RIFF$\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01\x00\x01\x00"
            b"\x40\x1f\x00\x00\x80>\x00\x00\x02\x00\x10\x00data\x00\x00\x00\x00"
        )
        assert _decode_adpcm(pcm) is None


class TestProgressiveJpeg:
    def test_decode_matches_closed_form(self, spark):
        from p2_mapreduce_spark.operators.multimodal import (
            _decode_jpeg,
            attach_jpeg_prog,
        )

        docs = spark.createDataFrame(
            [(i, "x") for i in range(8)], ["doc_id", "text"]
        )
        for r in attach_jpeg_prog(docs).collect():
            mid = r["media_id"]
            parsed = _decode_jpeg(bytes(r["payload"]))
            assert parsed is not None, f"id {mid} quarantined"
            w, h, planes = parsed
            wb, hb = 1 + mid % 2, 1 + (mid % 4) // 2
            assert (w, h) == (8 * wb, 8 * hb) and len(planes) == 1
            got = sum(v for row in planes[0] for v in row)
            n = wb * hb
            ne = (n + 1) // 2
            a8 = mid % 8
            assert got == 64 * (n * (128 + a8) + 16 * ne)
            # block values must alternate by MCU parity: the refinement
            # bit and the point transform both round-tripped
            vals = {v for row in planes[0] for v in row}
            expect = {128 + a8 + 16} | ({128 + a8} if n > 1 else set())
            assert vals == expect

    def test_unsupported_progressive_shapes_quarantine(self):
        from p2_mapreduce_spark.operators.multimodal import (
            _decode_jpeg_progressive,
        )

        # 3-component progressive frame with no scans → malformed
        sof3 = bytes.fromhex(
            "ffd8" + "ffc2" + "0011" + "08" + "0008" + "0008"
            + "03" + "011100" + "021100" + "031100" + "ffd9"
        )
        assert _decode_jpeg_progressive(sof3) is None
        # luma-2x2-sampled progressive is SUPPORTED since round 6
        # (media_jpeg420_prog); this scanless frame is rejected as
        # malformed, not for its sampling (ADVICE r06 comment fix)
        sub = bytes.fromhex(
            "ffd8" + "ffc2" + "0011" + "08" + "0010" + "0010"
            + "03" + "012200" + "021100" + "031100" + "ffd9"
        )
        assert _decode_jpeg_progressive(sub) is None
        # sampling factors beyond 2x2 (luma 3x3) remain GATED — the
        # decoder rejects at SOF parse (multimodal.py "sampling beyond
        # 2x2 gated"), before the scanless check can fire
        sub33 = bytes.fromhex(
            "ffd8" + "ffc2" + "0011" + "08" + "0018" + "0018"
            + "03" + "013300" + "021100" + "031100" + "ffd9"
        )
        assert _decode_jpeg_progressive(sub33) is None
        # DRI header with no scans → malformed (DRI itself is
        # SUPPORTED since round 6 — see media_jpeg_prog_dri)
        dri = bytes.fromhex(
            "ffd8" + "ffc2" + "000b" + "08" + "0008" + "0008"
            + "01" + "01" + "11" + "00" + "ffdd" + "0004" + "0002" + "ffd9"
        )
        assert _decode_jpeg_progressive(dri) is None

    def test_color_progressive_matches_closed_form(self, spark):
        """The 8-scan color table round-trips: DC point transform +
        refinement per component, AC first scans, and all three AC
        refinement disciplines (correction 1, insertion, correction 0)
        reconstruct the exact base ± amp checkerboards."""
        import math

        from p2_mapreduce_spark.operators.multimodal import (
            _decode_jpeg,
            attach_jpeg_prog_color,
        )

        docs = spark.createDataFrame(
            [(i, "x") for i in range(16)], ["doc_id", "text"]
        )
        for r in attach_jpeg_prog_color(docs).collect():
            mid = r["media_id"]
            parsed = _decode_jpeg(bytes(r["payload"]))
            assert parsed is not None, f"id {mid} quarantined"
            w, h, planes = parsed
            wb, hb = 1 + mid % 2, 1 + (mid % 4) // 2
            assert (w, h) == (8 * wb, 8 * hb) and len(planes) == 3
            a8, a5, a7 = mid % 8, mid % 5, mid % 7
            scb = 1 if mid % 2 == 0 else -1
            ne = (wb * hb + 1) // 2
            nodd = wb * hb - ne
            exp_sum, exp_ssq = [0, 0, 0], [0, 0, 0]
            for par, cnt in ((1, ne), (0, nodd)):
                for sgn in (1, -1):
                    yv = 128 + a8 + 16 * par + 3 * sgn
                    cbo = a5 + 16 * par + scb * sgn
                    cro = a7 + 16 * par - 2 * sgn
                    vals = (
                        math.floor(yv + 1.402 * cro + 0.5),
                        math.floor(
                            yv - 0.344136 * cbo - 0.714136 * cro + 0.5
                        ),
                        math.floor(yv + 1.772 * cbo + 0.5),
                    )
                    for i, v in enumerate(vals):
                        exp_sum[i] += cnt * 32 * v
                        exp_ssq[i] += cnt * 32 * v * v
            got_sum = [sum(v for row in ch for v in row) for ch in planes]
            got_ssq = [
                sum(v * v for row in ch for v in row) for ch in planes
            ]
            assert got_sum == exp_sum, f"id {mid} sums"
            assert got_ssq == exp_ssq, f"id {mid} ssq"


class TestRound5Properties:
    def test_empty_inputs_yield_empty_or_stable(self, spark):
        """Empty-corpus behavior: no garbage rows from descending
        sequence() walks or null contingencies."""
        from p2_mapreduce_spark.operators.curation import (
            isotonic_calibration,
            raking_weights,
        )
        from p2_mapreduce_spark.operators.profile import gk_lambda, tvd_drift
        from p2_mapreduce_spark.operators.timeseries import (
            kendall_tau_xy,
            runs_test,
            spearman_daily,
        )

        docs = spark.createDataFrame([], "doc_id long, text string, lang string, source string")
        ev = spark.createDataFrame([], "ts timestamp, event_type string, value double")
        assert isotonic_calibration(docs).count() == 0
        assert raking_weights(docs).count() == 0
        assert tvd_drift(docs).count() == 0
        assert gk_lambda(docs).count() == 0 or gk_lambda(docs).collect()[0]["n_rows"] is None
        for op in (runs_test, spearman_daily, kendall_tau_xy):
            assert op(ev).count() == 0

    def test_rank_stats_invariances(self, spark):
        """Spearman/Kendall are invariant under strictly monotone value
        transforms; the runs test under value scaling."""
        from p2_mapreduce_spark.operators.timeseries import (
            kendall_tau_xy,
            runs_test,
            spearman_daily,
        )

        vals = [3, 1, 4, 1, 5, 9, 2, 6]
        rows = []
        for d, v in enumerate(vals):
            rows += [(d, "view", v)] * ((d % 3) + 1)
        ev = _events(spark, rows)
        # scaled twin: value → 7·value (monotone, preserves daily-count
        # series exactly and scales daily sums)
        rows7 = [(d, g, v * 7) for (d, g, v) in rows]
        ev7 = _events(spark, rows7)
        rho = spearman_daily(ev).collect()[0]["rho"]
        rho7 = spearman_daily(ev7).collect()[0]["rho"]
        assert abs(rho - rho7) < 1e-12
        tau = kendall_tau_xy(ev).collect()[0]["tau_b"]
        tau7 = kendall_tau_xy(ev7).collect()[0]["tau_b"]
        assert abs(tau - tau7) < 1e-12
        r1 = runs_test(ev).collect()[0]
        r7 = runs_test(ev7).collect()[0]
        assert (r1["n_runs"], r1["n_up"], r1["n_down"]) == (
            r7["n_runs"], r7["n_up"], r7["n_down"])

    def test_tvd_partition_invariance(self, spark):
        """TVD must not depend on partitioning (exact-sum protocol)."""
        from p2_mapreduce_spark.operators.profile import tvd_drift

        rows = [(f"s{i % 5}", f"l{(i * 7) % 3}") for i in range(500)]
        one = spark.createDataFrame(rows, ["source", "lang"]).coalesce(1)
        many = spark.createDataFrame(rows, ["source", "lang"]).repartition(13)
        a = {r["source"]: r["tvd"] for r in tvd_drift(one).collect()}
        b = {r["source"]: r["tvd"] for r in tvd_drift(many).collect()}
        assert a == b


class TestSeqAccuracyAndPeers:
    def test_next_event_accuracy_hand_computed(self, spark):
        import datetime as dt2

        from p2_mapreduce_spark.operators.events_analytics import (
            next_event_accuracy,
        )

        base = dt2.datetime(2024, 1, 1)
        # user 1: a->b, b->a, a->b ; user 2: a->b  →  P(b|a)=3/3, P(a|b)=1/1
        seqs = {1: ["a", "b", "a", "b"], 2: ["a", "b"]}
        rows = []
        eid = 0
        for u, types in seqs.items():
            for i, t in enumerate(types):
                rows.append(
                    (eid, base + dt2.timedelta(minutes=i), u, t, 1.0)
                )
                eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value"]
        )
        got = {r["prev_type"]: r for r in next_event_accuracy(ev).collect()}
        assert got["a"]["predicted"] == "b" and got["a"]["accuracy"] == 1.0
        assert got["a"]["n_pairs"] == 3
        assert got["b"]["predicted"] == "a" and got["b"]["n_pairs"] == 1
        # modal next type is b (3 of 4 transitions)
        assert abs(got["a"]["baseline_share"] - 0.75) < 1e-12

    def test_peer_percentile_bounds(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.analytics import peer_percentile
        from p2_mapreduce_spark.session import load_table

        out = peer_percentile(
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "supplier"),
        ).collect()
        assert out
        per_nation = {}
        for r in out:
            assert 0.0 <= r["pct_rank"] <= 1.0
            per_nation.setdefault(r["s_nationkey"], []).append(r)
        for rows in per_nation.values():
            assert all(r["n_peers"] == len(rows) for r in rows)
            top = max(rows, key=lambda r: r["pct_rank"])
            assert top["revenue"] == max(r["revenue"] for r in rows)


def test_drift_state_stream_equals_batch(spark, sf_dir, tmp_path):
    """Streaming drift-monitor maintenance: after all micro-batches
    drain, the persisted contingency equals the batch contingency
    bit-for-bit, and the TVD answered FROM THE STATE equals
    profile.tvd_drift over the full corpus."""
    from p2_mapreduce_spark.operators.profile import tvd_drift
    from p2_mapreduce_spark.session import load_table
    from p2_mapreduce_spark.streaming.sinks import (
        drift_state_sink,
        load_latest_state,
        tvd_from_state,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang"
    )
    src = str(tmp_path / "docs_src_drift")
    docs.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    state_path = str(tmp_path / "drift_state")
    q = drift_state_sink(stream, state_path, str(tmp_path / "ck_drift"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    import pyspark.sql.functions as F2

    got = sorted(map(tuple, load_latest_state(spark, state_path).collect()))
    want = sorted(map(tuple,
        docs.groupBy("source", "lang").agg(
            F2.count(F2.lit(1)).alias("n")).collect()))
    assert got == want
    live = {
        r["source"]: r["tvd"]
        for r in tvd_from_state(
            load_latest_state(spark, state_path)
        ).collect()
    }
    batch = {
        r["source"]: r["tvd"]
        for r in tvd_drift(load_table(spark, sf_dir, "documents")).collect()
    }
    assert live == batch


def test_brier_score_bounds_and_degenerate(spark):
    from p2_mapreduce_spark.operators.curation import brier_score

    docs = spark.createDataFrame(
        [(1, "the the the long text here", "en"),
         (2, "corto", "es"), (3, "medio texto aqui", "es")],
        ["doc_id", "text", "lang"],
    )
    r = brier_score(docs).collect()[0]
    assert r["n_docs"] == 3 and r["n_pos"] == 1
    assert 0.0 <= r["brier"] <= 1.0
    # degenerate corpus (one doc → max == min → p = 0): brier = label²
    one = spark.createDataFrame([(1, "solo", "en")],
                                ["doc_id", "text", "lang"])
    r1 = brier_score(one).collect()[0]
    assert abs(r1["brier"] - 1.0) < 1e-9
