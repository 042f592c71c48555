"""Round-9 operators: MJPEG-in-AVI — the first container video codec
(r08 verdict item 4) — plus the consolidation-round additions."""

from pyspark.sql import functions as F

from p2_mapreduce_spark.session import load_table


class TestAviMjpeg:
    def test_parity_with_elementary_stream(self, spark, sf_dir):
        """The AVI payload carries attach_mjpeg's exact frames, so the
        container decode must reproduce video_frame_sums bit-for-bit
        (plus the declared_frames header column)."""
        from p2_mapreduce_spark.operators.multimodal import (
            attach_avi_mjpeg,
            attach_mjpeg,
            avi_frame_stats,
            video_frame_sums,
        )

        docs = load_table(spark, sf_dir, "documents")
        got = {
            (r["media_id"], r["frame_idx"]): (
                r["width"], r["height"], r["n_comp"],
                r["sum_r"], r["sum_g"], r["sum_b"],
            )
            for r in avi_frame_stats(attach_avi_mjpeg(docs), every_n=2).collect()
        }
        ref = {
            (r["media_id"], r["frame_idx"]): (
                r["width"], r["height"], r["n_comp"],
                r["sum_r"], r["sum_g"], r["sum_b"],
            )
            for r in video_frame_sums(attach_mjpeg(docs), every_n=2).collect()
        }
        assert got == ref and got

    def test_declared_frames_matches_header(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.multimodal import (
            attach_avi_mjpeg,
            avi_frame_stats,
        )

        docs = load_table(spark, sf_dir, "documents")
        rows = (
            avi_frame_stats(attach_avi_mjpeg(docs))
            .select("media_id", "declared_frames")
            .distinct()
            .collect()
        )
        assert rows
        for r in rows:
            assert r["declared_frames"] == 2 + r["media_id"] % 8

    def test_container_is_spec_valid_riff(self, spark, sf_dir):
        """RIFF magic, declared size == file size, AVI form type, and
        the hdrl/movi LIST layout all hold on every payload."""
        from p2_mapreduce_spark.operators.multimodal import attach_avi_mjpeg

        docs = load_table(spark, sf_dir, "documents").limit(20)
        for r in attach_avi_mjpeg(docs).collect():
            b = bytes(r["payload"])
            assert b[:4] == b"RIFF" and b[8:12] == b"AVI "
            assert int.from_bytes(b[4:8], "little") + 8 == len(b)
            assert b[12:16] == b"LIST" and b[20:24] == b"hdrl"
            assert b[24:28] == b"avih"

    def test_non_mjpg_handler_quarantines(self, spark):
        """An AVI whose stream handler is not MJPG yields ZERO rows —
        the decoder refuses to guess at codecs it doesn't have."""
        from p2_mapreduce_spark.operators.multimodal import (
            attach_avi_mjpeg,
            avi_frame_stats,
        )

        docs = spark.createDataFrame(
            [(1, "x", "en", "s", 1)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        avi = attach_avi_mjpeg(docs).collect()[0]
        b = bytearray(bytes(avi["payload"]))
        pos = b.find(b"MJPG")  # strh fccHandler (first occurrence)
        b[pos : pos + 4] = b"DIB "
        broken = spark.createDataFrame(
            [(1, "video", bytes(b))],
            "media_id long, modality string, payload binary",
        )
        assert avi_frame_stats(broken).count() == 0

    def test_truncated_and_garbage_payloads_quarantine(self, spark):
        from p2_mapreduce_spark.operators.multimodal import (
            attach_avi_mjpeg,
            avi_frame_stats,
        )

        docs = spark.createDataFrame(
            [(3, "x", "en", "s", 1)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        full = bytes(attach_avi_mjpeg(docs).collect()[0]["payload"])
        cases = [
            (1, b"not an avi at all"),
            (2, full[: len(full) // 2]),  # truncated mid-movi
            (3, b""),
        ]
        broken = spark.createDataFrame(
            [(i, "video", p) for i, p in cases],
            "media_id long, modality string, payload binary",
        )
        # truncated container yields no rows (size check fails before
        # any frame is emitted); garbage and empty quarantine outright
        assert avi_frame_stats(broken).count() == 0

    def test_word_alignment_odd_frames(self, spark):
        """RIFF requires word-aligned chunks; docs whose frame length is
        odd must still round-trip (the pad byte is emitted and skipped)."""
        from p2_mapreduce_spark.operators.multimodal import (
            attach_avi_mjpeg,
            avi_frame_stats,
        )

        docs = spark.createDataFrame(
            [(i, "x", "en", "s", 1) for i in range(16)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        avi = attach_avi_mjpeg(docs)
        # doc_id % 4 == 0 rows have wb*hb odd => odd frame length =>
        # pad bytes present; decoding EVERY frame proves the walk skips
        # them correctly (a mis-aligned walk desyncs and drops frames)
        out = avi_frame_stats(avi, every_n=1)
        n_expected = sum(2 + i % 8 for i in range(16))
        assert out.count() == n_expected


def _daily(spark, sf_dir):
    """(g, d, y) exact-cent daily revenue, computed in plain Python."""
    import math
    from collections import defaultdict

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("d"), "value"
    ).collect()
    out = defaultdict(int)
    for r in ev:
        out[(r["event_type"], r["d"])] += math.floor(r["value"] * 100)
    return out


class TestFinancialTrio:
    def test_max_drawdown_matches_manual(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.timeseries import max_drawdown

        daily = _daily(spark, sf_dir)
        series = {}
        for (g, d), y in sorted(daily.items(), key=lambda kv: kv[0][1]):
            series.setdefault(g, []).append(y)
        got = {
            r["event_type"]: (
                r["n_days"], r["peak_cents"], r["dd_cents"], r["dd_frac"]
            )
            for r in max_drawdown(
                load_table(spark, sf_dir, "events")
            ).collect()
        }
        for g, ys in series.items():
            peak, ddc, ddf = 0, 0, 0.0
            for y in ys:
                peak = max(peak, y)
                ddc = max(ddc, peak - y)
                if peak > 0:
                    ddf = max(ddf, (peak - y) / peak)
            assert got[g] == (len(ys), peak, ddc, ddf)

    def test_ma_crossover_integer_semantics(self, spark, sf_dir):
        """Signals require full frames on consecutive days and flip the
        exact integer comparison sf*slow vs ss*fast."""
        from p2_mapreduce_spark.operators.timeseries import ma_crossover

        rows = ma_crossover(load_table(spark, sf_dir, "events")).collect()
        daily = _daily(spark, sf_dir)
        series = {}
        for (g, d), y in sorted(daily.items(), key=lambda kv: kv[0][1]):
            series.setdefault(g, []).append((d, y))
        expect = set()
        for g, pts in series.items():
            by_x = {d.toordinal(): y for d, y in pts}
            xs = sorted(by_x)
            state = {}
            for x in xs:
                wf = [by_x[i] for i in range(x - 4, x + 1) if i in by_x]
                ws = [by_x[i] for i in range(x - 19, x + 1) if i in by_x]
                if len(wf) == 5 and len(ws) == 20:
                    above = int(sum(wf) * 20 > sum(ws) * 5)
                    if x - 1 in state and state[x - 1] != above:
                        expect.add(
                            (g, x, "golden" if above else "death")
                        )
                    state[x] = above
        import datetime

        got = {
            (
                r["event_type"],
                datetime.date.fromisoformat(r["day"]).toordinal(),
                r["direction"],
            )
            for r in rows
        }
        assert got == expect

    def test_bollinger_pinned_tree(self, spark, sf_dir):
        import math

        from p2_mapreduce_spark.operators.timeseries import bollinger_bands

        rows = bollinger_bands(load_table(spark, sf_dir, "events")).collect()
        daily = _daily(spark, sf_dir)
        by_g = {}
        for (g, d), y in sorted(daily.items(), key=lambda kv: kv[0][1]):
            by_g.setdefault(g, {})[d.toordinal()] = y
        for r in rows:
            import datetime

            g = r["event_type"]
            x = datetime.date.fromisoformat(r["day"]).toordinal()
            w = [by_g[g][i] for i in range(x - 19, x + 1) if i in by_g[g]]
            assert len(w) == 20
            s, ss = sum(w), sum(v * v for v in w)
            m = s / 20.0
            var = ss / 20.0 - m * m
            sd = math.sqrt(max(var, 0.0))
            assert r["mean_rev"] == m / 100.0
            assert r["sd_rev"] == sd / 100.0
            assert r["band_low"] == (m - 2.0 * sd) / 100.0
            assert r["band_high"] == (m + 2.0 * sd) / 100.0


class TestOrderedAndReliability:
    def test_jonckheere_matches_bruteforce(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.timeseries import jonckheere

        daily = _daily(spark, sf_dir)
        groups = sorted({g for g, _ in daily})
        vals = {g: [y for (gg, _), y in daily.items() if gg == g] for g in groups}
        jt2 = 0
        for i in range(len(groups)):
            for j in range(i + 1, len(groups)):
                for a in vals[groups[i]]:
                    for b in vals[groups[j]]:
                        jt2 += 2 if a < b else (1 if a == b else 0)
        row = jonckheere(load_table(spark, sf_dir, "events")).collect()[0]
        n = sum(len(v) for v in vals.values())
        sum_sq = sum(len(v) ** 2 for v in vals.values())
        assert row["jt2"] == jt2
        assert row["n_total"] == n
        assert row["mu2"] == (n * n - sum_sq) // 2

    def test_jonckheere_single_group_empty(self, spark):
        from p2_mapreduce_spark.operators.timeseries import jonckheere

        import datetime

        ev = spark.createDataFrame(
            [(1, datetime.datetime(2024, 1, 1), 1, "view", 5.0, "{}")],
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        )
        assert jonckheere(ev).count() == 0

    def test_icc_matches_manual_anova(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.events_analytics import (
            icc_reliability,
        )

        daily = _daily(spark, sf_dir)
        groups = sorted({g for g, _ in daily})
        k = len(groups)
        days = sorted(
            d
            for d in {d for _, d in daily}
            if all((g, d) in daily for g in groups)
        )
        n = len(days)
        cells = {(g, d): daily[(g, d)] for g in groups for d in days}
        total = sum(cells.values())
        ss_cells = sum(v * v for v in cells.values())
        ss_rows = sum(
            sum(cells[(g, d)] for g in groups) ** 2 for d in days
        )
        ss_cols = sum(
            sum(cells[(g, d)] for d in days) ** 2 for g in groups
        )
        kd, nd, td = float(k), float(n), float(total)
        grand = td * td / (nd * kd)
        ssr = ss_rows / kd - grand
        ssc = ss_cols / nd - grand
        sse = (ss_cells - grand) - ssr - ssc
        msr = ssr / (nd - 1.0)
        msc = ssc / (kd - 1.0)
        mse = sse / ((nd - 1.0) * (kd - 1.0))
        icc = (msr - mse) / (msr + (kd - 1.0) * mse + (kd / nd) * (msc - mse))
        row = icc_reliability(load_table(spark, sf_dir, "events")).collect()[0]
        assert (row["n_days"], row["k_raters"]) == (n, k)
        assert abs(row["msr"] - msr) < 1e-9 * max(1.0, abs(msr))
        assert abs(row["icc"] - icc) < 1e-12

    def test_nelson_aalen_consistent_with_life_table(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.events_analytics import (
            life_table,
            nelson_aalen,
        )

        ev = load_table(spark, sf_dir, "events")
        na = {r["t_days"]: r for r in nelson_aalen(ev).collect()}
        lt = {r["t_days"]: r for r in life_table(ev).collect()}
        assert set(na) == set(lt)
        cum = 0
        for t in sorted(na):
            assert na[t]["n_at_risk"] == lt[t]["n_at_risk"]
            assert na[t]["hazard_ppm"] == lt[t]["hazard_ppm"]
            cum += na[t]["hazard_ppm"]
            assert na[t]["cum_hazard_ppm"] == cum


class TestReciprocity:
    def test_matches_manual(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.graph import (
            nation_trade_reciprocity,
        )

        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        cust = load_table(spark, sf_dir, "customer")
        supp = load_table(spark, sf_dir, "supplier")
        snat = {r["s_suppkey"]: r["s_nationkey"] for r in supp.collect()}
        cnat = {r["c_custkey"]: r["c_nationkey"] for r in cust.collect()}
        ocust = {r["o_orderkey"]: r["o_custkey"] for r in orders.collect()}
        edges = set()
        for r in li.select("l_orderkey", "l_suppkey").collect():
            s = snat[r["l_suppkey"]]
            c = cnat[ocust[r["l_orderkey"]]]
            if s != c:
                edges.add((s, c))
        rec = sum(1 for (s, c) in edges if (c, s) in edges)
        row = nation_trade_reciprocity(li, orders, cust, supp).collect()[0]
        assert row["n_edges"] == len(edges)
        assert row["n_reciprocated"] == rec
        if edges:
            assert row["reciprocity"] == rec / len(edges)


class TestAviAv:
    def test_video_plane_parity_and_audio_closed_form(self, spark, sf_dir):
        """The multiplexed container's video rows equal the
        single-stream AVI decode (every frame); audio rows match the
        telescoped closed form."""
        from p2_mapreduce_spark.operators.multimodal import (
            attach_avi_av,
            attach_avi_mjpeg,
            avi_av_stats,
            avi_frame_stats,
        )

        docs = load_table(spark, sf_dir, "documents")
        out = avi_av_stats(attach_avi_av(docs)).collect()
        vid = {
            (r["media_id"], r["idx"]): (
                r["width"], r["height"], r["sum_r"], r["sum_g"], r["sum_b"]
            )
            for r in out
            if r["stream"] == "video"
        }
        ref = {
            (r["media_id"], r["frame_idx"]): (
                r["width"], r["height"], r["sum_r"], r["sum_g"], r["sum_b"]
            )
            for r in avi_frame_stats(
                attach_avi_mjpeg(docs), every_n=1
            ).collect()
        }
        assert vid == ref and vid
        for r in out:
            if r["stream"] != "audio":
                continue
            i, f = r["media_id"], r["idx"]
            ns = 100 + i % 50
            base = (7 * i + 3 * f) % 100
            assert r["n_samples"] == ns
            assert r["sum_samples"] == ns * (base - 64) + ns * (ns - 1) // 2

    def test_bad_audio_format_quarantines(self, spark):
        """A container whose audio strf is not 16-bit PCM yields zero
        rows — the demux refuses codecs it doesn't have (same contract
        as the video handler check)."""
        from p2_mapreduce_spark.operators.multimodal import (
            attach_avi_av,
            avi_av_stats,
        )

        docs = spark.createDataFrame(
            [(2, "x", "en", "s", 1)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        full = bytearray(bytes(attach_avi_av(docs).collect()[0]["payload"]))
        # wFormatTag lives 8 bytes into the audio strf chunk body;
        # find 'auds' strh then its strf
        p = full.find(b"auds")
        p = full.find(b"strf", p)
        full[p + 8 : p + 10] = (85).to_bytes(2, "little")  # MP3 tag
        broken = spark.createDataFrame(
            [(2, "video", bytes(full))],
            "media_id long, modality string, payload binary",
        )
        assert avi_av_stats(broken).count() == 0

    def test_truncated_av_quarantines(self, spark):
        from p2_mapreduce_spark.operators.multimodal import (
            attach_avi_av,
            avi_av_stats,
        )

        docs = spark.createDataFrame(
            [(5, "x", "en", "s", 1)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        full = bytes(attach_avi_av(docs).collect()[0]["payload"])
        broken = spark.createDataFrame(
            [(5, "video", full[: len(full) * 2 // 3])],
            "media_id long, modality string, payload binary",
        )
        assert avi_av_stats(broken).count() == 0


class TestObvAndBeta:
    def test_obv_matches_manual(self, spark, sf_dir):
        from collections import defaultdict

        from p2_mapreduce_spark.operators.timeseries import obv_daily

        ev = load_table(spark, sf_dir, "events").select(
            "event_type", F.to_date("ts").alias("d"), "value"
        ).collect()
        import math

        y = defaultdict(int)
        v = defaultdict(int)
        for r in ev:
            y[(r["event_type"], r["d"])] += math.floor(r["value"] * 100)
            v[(r["event_type"], r["d"])] += 1
        expect = {}
        for g in {k[0] for k in y}:
            days = sorted(d for gg, d in y if gg == g)
            obv = 0
            for d in days:
                pd_ = d.toordinal() - 1
                prev = next(
                    (y[(g, dd)] for dd in days if dd.toordinal() == pd_),
                    None,
                )
                s = (
                    0
                    if prev is None or y[(g, d)] == prev
                    else (1 if y[(g, d)] > prev else -1)
                )
                obv += s * v[(g, d)]
                expect[(g, d.isoformat())] = (s, v[(g, d)], obv)
        got = {
            (r["event_type"], r["day"]): (
                r["move_sign"], r["volume"], r["obv"]
            )
            for r in obv_daily(load_table(spark, sf_dir, "events")).collect()
        }
        assert got == expect

    def test_capm_beta_matches_manual(self, spark, sf_dir):
        from collections import defaultdict

        from p2_mapreduce_spark.operators.timeseries import capm_beta

        ev = load_table(spark, sf_dir, "events").select(
            "event_type", F.to_date("ts").alias("d"), "value"
        ).collect()
        import math

        y = defaultdict(int)
        for r in ev:
            y[(r["event_type"], r["d"].toordinal())] += math.floor(
                r["value"] * 100
            )
        m = defaultdict(int)
        for (g, x), val in y.items():
            m[x] += val
        dm = {x: m[x] - m[x - 1] for x in m if x - 1 in m}
        rows = capm_beta(load_table(spark, sf_dir, "events")).collect()
        for r in rows:
            g = r["event_type"]
            pairs = [
                (dm[x], y[(g, x)] - y[(g, x - 1)])
                for x in dm
                if (g, x) in y and (g, x - 1) in y
            ]
            n = len(pairs)
            sx = sum(p[0] for p in pairs)
            sy = sum(p[1] for p in pairs)
            sxx = sum(p[0] * p[0] for p in pairs)
            sxy = sum(p[0] * p[1] for p in pairs)
            num, den = n * sxy - sx * sy, n * sxx - sx * sx
            beta = float(num) / float(den) if den else 0.0
            assert r["n_days"] == n
            assert r["beta"] == beta
            assert r["alpha"] == (float(sy) - beta * float(sx)) / float(n)

    def test_capm_market_beta_identity(self, spark, sf_dir):
        """Value-weighted betas average to 1 (Σ over groups of each
        group's move = the market move), within float tolerance — the
        standard sanity identity."""
        from p2_mapreduce_spark.operators.timeseries import capm_beta

        rows = capm_beta(load_table(spark, sf_dir, "events")).collect()
        # identity holds exactly only when every group observes every
        # consecutive-day pair; fixtures are dense, so expect near-1
        assert rows
        assert abs(sum(r["beta"] for r in rows) - 1.0) < 0.2


class TestKrippendorff:
    def test_matches_manual_coincidence_matrix(self, spark, sf_dir):
        from collections import Counter, defaultdict

        from p2_mapreduce_spark.operators.events_analytics import (
            krippendorff_alpha,
        )

        ev = load_table(spark, sf_dir, "events").select(
            "user_id", F.to_date("ts").alias("d"), "event_type"
        ).collect()
        kinds = {"click", "purchase", "view"}
        days = [r["d"] for r in ev]
        d0, d1 = min(days), max(days)
        mid = d0 + __import__("datetime").timedelta(
            days=(d1 - d0).days // 2
        )
        cnt = defaultdict(Counter)
        for r in ev:
            if r["event_type"] in kinds:
                cnt[(r["user_id"], r["d"] <= mid)][r["event_type"]] += 1
        modal = {
            k: min(c, key=lambda t: (-c[t], t)) for k, c in cnt.items()
        }
        pairs = [
            (modal[(u, True)], modal[(u, False)])
            for u in {u for u, _ in modal}
            if (u, True) in modal and (u, False) in modal
        ]
        n = len(pairs)
        do = 2 * sum(1 for a, b in pairs if a != b)
        marg = Counter()
        for a, b in pairs:
            marg[a] += 1
            marg[b] += 1
        de = 4 * n * n - sum(v * v for v in marg.values())
        alpha = 1.0 - float(do * (2 * n - 1)) / float(de) if de else 0.0
        row = krippendorff_alpha(
            load_table(spark, sf_dir, "events")
        ).collect()[0]
        assert (row["n_units"], row["do_pairs"], row["de_num"]) == (
            n, do, de,
        )
        assert row["alpha"] == alpha

    def test_perfect_agreement_is_one(self, spark):
        import datetime

        from p2_mapreduce_spark.operators.events_analytics import (
            krippendorff_alpha,
        )

        rows = []
        eid = 0
        for u, t in ((1, "view"), (2, "click"), (3, "purchase")):
            for day in (1, 20):  # one event each half, same type
                eid += 1
                rows.append(
                    (eid, datetime.datetime(2024, 1, day), u, t, 1.0, "{}")
                )
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        )
        row = krippendorff_alpha(ev).collect()[0]
        assert row["do_pairs"] == 0 and row["alpha"] == 1.0

    def test_degenerate_single_category_sentinel(self, spark):
        import datetime

        from p2_mapreduce_spark.operators.events_analytics import (
            krippendorff_alpha,
        )

        ev = spark.createDataFrame(
            [
                (1, datetime.datetime(2024, 1, 1), 1, "view", 1.0, "{}"),
                (2, datetime.datetime(2024, 1, 20), 1, "view", 1.0, "{}"),
            ],
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        )
        row = krippendorff_alpha(ev).collect()[0]
        assert row["de_num"] == 0 and row["alpha"] == 0.0


class TestHilbert:
    def test_full_grid_curve_validity_and_classic_parity(self, spark):
        """The 32x32 curve is a bijection, every consecutive pair of
        indices is one grid step apart (THE Hilbert property Z lacks),
        and every cell matches the classical xy2d algorithm."""
        from p2_mapreduce_spark.operators.layout import with_hilbert

        bits, n = 5, 32
        grid = spark.range(n * n).selectExpr(
            f"CAST(id % {n} AS BIGINT) AS gx",
            f"CAST(id div {n} AS BIGINT) AS gy",
        )
        cells = {
            r["hval"]: (r["gx"], r["gy"])
            for r in with_hilbert(grid, ("gx", "gy"), bits).collect()
        }
        assert len(cells) == n * n

        def xy2d(x, y):
            d, s = 0, n // 2
            while s > 0:
                rx = 1 if (x & s) > 0 else 0
                ry = 1 if (y & s) > 0 else 0
                d += s * s * ((3 * rx) ^ ry)
                if ry == 0:
                    if rx == 1:
                        x, y = n - 1 - x, n - 1 - y
                    x, y = y, x
                s //= 2
            return d

        for h, (x, y) in cells.items():
            assert xy2d(x, y) == h
        for i in range(n * n - 1):
            (x1, y1), (x2, y2) = cells[i], cells[i + 1]
            assert abs(x1 - x2) + abs(y1 - y2) == 1

    def test_bucket_confinement(self, spark, sf_dir):
        """Dropping 2k bits confines each bucket to an aligned
        2^k x 2^k square — the parquet min/max tightness contract."""
        from p2_mapreduce_spark.operators.layout import hilbert_cluster

        li = load_table(spark, sf_dir, "lineitem")
        k = 4  # drop_bits=8
        for r in hilbert_cluster(li).collect():
            assert r["max_l_partkey"] - r["min_l_partkey"] <= (1 << k) - 1
            assert r["max_l_suppkey"] - r["min_l_suppkey"] <= (1 << k) - 1
