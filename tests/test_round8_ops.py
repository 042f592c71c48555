"""Round-8 operator tests: bucketized range join boundary semantics,
IVF-PQ end-to-end retrieval, MP1 subband->PCM synthesis, and the
round-8 analytics batch."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from p2_mapreduce_spark.operators.relational import (
    range_join_quantity_bands,
)


def test_range_join_bucketized_boundaries(spark):
    """The bucketized equi-join must keep the exact [lo, lo+5) band
    semantics of the former BroadcastNestedLoopJoin: inclusive at the
    lower bound, exclusive at lo+5, fractional quantities handled."""
    lineitem = spark.createDataFrame(
        [(Decimal("10.00"),), (Decimal("14.99"),), (Decimal("15.00"),),
         (Decimal("9.99",),), (Decimal("12.50"),)],
        "l_quantity decimal(18,2)",
    )
    part = spark.createDataFrame([(10,), (10,), (20,)], "p_size int")
    got = {
        r["band_lo"]: (r["n_items"], r["sum_qty"])
        for r in range_join_quantity_bands(lineitem, part).collect()
    }
    # band 10 = [10, 15): 10.00, 14.99, 12.50 in; 15.00 and 9.99 out
    assert got == {10: (3, 10.00 + 14.99 + 12.50)}


def _recall(exact_df, approx_df):
    exact = {(r["q_id"], r["n_id"]) for r in exact_df.collect()}
    approx = {(r["q_id"], r["n_id"]) for r in approx_df.collect()}
    return len(exact & approx) / len(exact)


class TestIvfPq:
    def test_nprobe_all_cells_recovers_pq_search(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.similarity import (
            ivf_pq_search,
            pq_search,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        full = ivf_pq_search(emb, nprobe=16)
        pq = pq_search(emb)
        assert sorted(map(tuple, full.collect())) == sorted(
            map(tuple, pq.collect())
        )

    def test_candidate_set_monotone_in_nprobe(self, spark, sf_dir):
        """The PROVABLE nprobe invariant: each query's candidate pool
        (members of its probed cells) grows as a superset chain with
        nprobe, reaching the whole corpus at nprobe=n_cells.

        Note recall@k vs the exact scan is deliberately NOT pinned
        monotone: the fine stage is approximate, so a wider candidate
        pool can admit a PQ-quantization impostor that displaces a true
        neighbor from the top-k (measured at sf0.001-0.01: recall can
        DIP as nprobe grows).  The honest gates are this superset chain
        + exact pq_search equality at full probe + the ivf_pq_recall
        readout."""
        from pyspark.sql import Window
        from p2_mapreduce_spark.operators.similarity import (
            _dot,
            build_ivf_cells,
            with_norm,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cents, assign = build_ivf_cells(emb)
        queries = with_norm(emb.filter(F.col("vec_id") < 3)).select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("qv"),
            F.col("norm").alias("qn"),
        )
        q_cells = queries.crossJoin(F.broadcast(cents)).withColumn(
            "c_sim",
            _dot(F.col("qv"), F.col("c_vec"))
            / (F.col("qn") * F.col("c_norm")),
        )
        wq = Window.partitionBy("q_id").orderBy(
            F.col("c_sim").desc(), "cell"
        )
        ranked = q_cells.withColumn("pr", F.row_number().over(wq)).select(
            "q_id", "cell", "pr"
        )
        n_corpus = emb.count()
        prev: set = set()
        for p in (1, 4, 16):
            cand = {
                (r["q_id"], r["n_id"])
                for r in ranked.filter(F.col("pr") <= p)
                .join(
                    assign.select(
                        F.col("vec_id").alias("n_id"), "cell"
                    ),
                    "cell",
                )
                .select("q_id", "n_id")
                .collect()
            }
            assert prev <= cand
            prev = cand
        assert len(prev) == 3 * n_corpus  # full probe == whole corpus

    def test_ivf_pq_recall_gate_matches_manual(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.similarity import (
            ivf_pq_recall,
            ivf_pq_search,
            knn_bruteforce,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        gate = {r["q_id"]: r["recall"] for r in ivf_pq_recall(emb).collect()}
        exact = knn_bruteforce(emb, n_queries=3, k=10).select("q_id", "n_id")
        approx = ivf_pq_search(emb).select("q_id", "n_id")
        e = {}
        for r in exact.collect():
            e.setdefault(r["q_id"], set()).add(r["n_id"])
        a = {}
        for r in approx.collect():
            a.setdefault(r["q_id"], set()).add(r["n_id"])
        manual = {q: len(e[q] & a.get(q, set())) / len(e[q]) for q in e}
        assert gate == manual


def test_range_join_bucketized_matches_theta(spark):
    """Property pin: the explode-candidates equi-join equals the direct
    theta predicate on a randomized small input."""
    lineitem = spark.range(200).select(
        (F.col("id") % 47 / 2 + 1).cast("decimal(18,2)").alias("l_quantity")
    )
    part = spark.range(30).select((F.col("id") % 12 * 3 + 1).cast("int").alias("p_size"))
    bands = part.select(F.col("p_size").cast("bigint").alias("band_lo")).distinct()
    theta = (
        lineitem.join(
            F.broadcast(bands),
            (F.col("l_quantity") >= F.col("band_lo"))
            & (F.col("l_quantity") < F.col("band_lo") + 5),
        )
        .groupBy("band_lo")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    got = range_join_quantity_bands(lineitem, part).select("band_lo", "n_items")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, theta.collect()))


class TestRound8StatsParity:
    """Third-implementation parity: each statistic recomputed from the
    same parquet rows with textbook formulas in pure Python (the
    judge's durbin_watson/fleiss_kappa verification style)."""

    def _cents(self, spark, sf_dir):
        import math
        rows = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("event_type", "value")
            .collect()
        )
        by = {}
        for r in rows:
            by.setdefault(r["event_type"], []).append(
                math.floor(r["value"] * 100)
            )
        return by

    def test_jarque_bera_matches_textbook(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.timeseries import jarque_bera

        got = {
            r["event_type"]: (r["skewness"], r["kurtosis_excess"], r["jb_stat"])
            for r in jarque_bera(
                spark.read.parquet(f"{sf_dir}/events.parquet")
            ).collect()
        }
        for g, cs in self._cents(spark, sf_dir).items():
            n = len(cs)
            mu = sum(cs) / n
            m2 = sum((c - mu) ** 2 for c in cs) / n
            m3 = sum((c - mu) ** 3 for c in cs) / n
            m4 = sum((c - mu) ** 4 for c in cs) / n
            if n < 4 or m2 <= 0:
                assert g not in got
                continue
            s = m3 / m2**1.5
            k = m4 / m2**2 - 3.0
            jb = n / 6.0 * (s * s + k * k / 4.0)
            gs, gk, gj = got[g]
            assert abs(gs - s) < 1e-9 and abs(gk - k) < 1e-9
            assert abs(gj - jb) < 1e-6 * max(1.0, abs(jb))

    def test_levene_bf_matches_textbook(self, spark, sf_dir):
        import statistics

        from p2_mapreduce_spark.operators.timeseries import levene_bf

        row = levene_bf(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).collect()[0]
        groups = list(self._cents(spark, sf_dir).values())
        # operator uses z = |2c - 2*median| (scale-invariant F)
        zs = [
            [abs(2 * c - round(2 * statistics.median(g))) for c in g]
            for g in groups
        ]
        n = sum(len(z) for z in zs)
        k = len(zs)
        zbar = sum(sum(z) for z in zs) / n
        ssb = sum(len(z) * (sum(z) / len(z) - zbar) ** 2 for z in zs)
        ssw = sum(
            sum((v - sum(z) / len(z)) ** 2 for v in z) for z in zs
        )
        f = (ssb / (k - 1)) / (ssw / (n - k))
        assert row["n_rows"] == n and row["n_groups"] == k
        assert abs(row["bf_stat"] - f) < 1e-7 * max(1.0, abs(f))

    def test_mood_median_matches_textbook(self, spark, sf_dir):
        import statistics

        from p2_mapreduce_spark.operators.timeseries import mood_median

        row = mood_median(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).collect()[0]
        by = self._cents(spark, sf_dir)
        allc = [c for g in by.values() for c in g]
        m2x = round(2 * statistics.median(allc))
        n = len(allc)
        a = sum(1 for c in allc if 2 * c > m2x)
        chi2 = 0.0
        for g in by.values():
            nj = len(g)
            aj = sum(1 for c in g if 2 * c > m2x)
            ea = nj * a / n
            eb = nj * (n - a) / n
            chi2 += (aj - ea) ** 2 / ea + ((nj - aj) - eb) ** 2 / eb
        assert row["n_rows"] == n and row["n_above"] == a
        assert abs(row["chi2"] - chi2) < 1e-9 * max(1.0, chi2)

    def test_cochran_armitage_matches_textbook(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.analytics import cochran_armitage

        row = cochran_armitage(
            spark.read.parquet(f"{sf_dir}/orders.parquet")
        ).collect()[0]
        recs = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select("o_orderpriority", "o_orderstatus")
            .collect()
        )
        per = {}
        for r in recs:
            w = int(r["o_orderpriority"][0])
            nj, rj = per.get(w, (0, 0))
            per[w] = (nj + 1, rj + (1 if r["o_orderstatus"] == "F" else 0))
        n = sum(nj for nj, _ in per.values())
        rr = sum(rj for _, rj in per.values())
        num = sum(
            (rj - nj * rr / n) * w for w, (nj, rj) in per.items()
        )
        den = (rr / n) * (1 - rr / n) * (
            sum(nj * w * w for w, (nj, _) in per.items())
            - sum(nj * w for w, (nj, _) in per.items()) ** 2 / n
        )
        assert row["n_total"] == n and row["n_success"] == rr
        assert abs(row["ca_chi2"] - num * num / den) < 1e-9 * max(
            1.0, num * num / den
        )

    def test_partial_corr_matches_textbook(self, spark, sf_dir):
        import math

        from p2_mapreduce_spark.operators.profile import partial_corr

        row = partial_corr(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        ).collect()[0]
        recs = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .select("l_quantity", "l_extendedprice", "l_discount")
            .collect()
        )
        xs = [math.floor(r["l_quantity"]) for r in recs]
        ys = [math.floor(r["l_extendedprice"] * 100) for r in recs]
        zs = [math.floor(r["l_discount"] * 10000) for r in recs]
        n = len(xs)

        def r_of(p, q):
            sp, sq = sum(p), sum(q)
            cov = sum(a * b for a, b in zip(p, q)) - sp * sq / n
            vp = sum(a * a for a in p) - sp * sp / n
            vq = sum(b * b for b in q) - sq * sq / n
            return cov / math.sqrt(vp * vq)

        rxy, rxz, ryz = r_of(xs, ys), r_of(xs, zs), r_of(ys, zs)
        pr = (rxy - rxz * ryz) / math.sqrt(
            (1 - rxz * rxz) * (1 - ryz * ryz)
        )
        assert abs(row["r_xy"] - rxy) < 1e-12
        assert abs(row["partial_r_xy_z"] - pr) < 1e-12

    def test_ordinal_assoc_matches_textbook(self, spark, sf_dir):
        import math
        from collections import Counter

        from p2_mapreduce_spark.operators.profile import (
            ordinal_association,
        )

        row = ordinal_association(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        ).collect()[0]
        recs = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .select("l_quantity", "l_discount")
            .collect()
        )
        cells = Counter(
            (math.floor(r["l_quantity"]) // 10,
             math.floor(r["l_discount"] * 100))
            for r in recs
        )
        C = D = T = 0
        items = list(cells.items())
        for (a1, b1), n1 in items:
            for (a2, b2), n2 in items:
                if a2 > a1:
                    if b2 > b1:
                        C += n1 * n2
                    elif b2 < b1:
                        D += n1 * n2
                    else:
                        T += n1 * n2
        assert (row["c_pairs"], row["d_pairs"], row["ties_y"]) == (C, D, T)
        assert abs(row["gamma"] - (C - D) / (C + D)) < 1e-15
        assert abs(row["somers_dyx"] - (C - D) / (C + D + T)) < 1e-15


def test_round8_stats_ops_tolerate_empty_inputs(spark):
    """Every round-8 report emits ZERO rows on empty input (the
    standing empty-input discipline)."""
    from p2_mapreduce_spark.operators.analytics import cochran_armitage
    from p2_mapreduce_spark.operators.profile import (
        ordinal_association,
        partial_corr,
    )
    from p2_mapreduce_spark.operators.timeseries import (
        jarque_bera,
        levene_bf,
        mood_median,
    )

    ev = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    li = spark.createDataFrame(
        [],
        "l_orderkey long, l_quantity double, l_extendedprice double,"
        " l_discount double",
    )
    od = spark.createDataFrame(
        [], "o_orderkey long, o_orderstatus string, o_orderpriority string"
    )
    for op, df in (
        (jarque_bera, ev),
        (levene_bf, ev),
        (mood_median, ev),
        (cochran_armitage, od),
        (partial_corr, li),
        (ordinal_association, li),
    ):
        assert op(df).count() == 0, op.__name__


class TestRound8TimeseriesParity:
    """Third-implementation parity for the round-8 time-series batch:
    pure-Python textbook recomputation from the same parquet rows."""

    def _daily(self, spark, sf_dir):
        import math
        rows = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("event_type", "ts", "value")
            .collect()
        )
        by = {}
        for r in rows:
            d = r["ts"].date()
            key = (r["event_type"], d)
            by[key] = by.get(key, 0) + math.floor(r["value"] * 100)
        out = {}
        for (g, d), y in by.items():
            out.setdefault(g, {})[d] = y
        return out

    def test_ar1_matches_textbook(self, spark, sf_dir):
        import datetime as dt

        from p2_mapreduce_spark.operators.timeseries import ar1_forecast

        got = {
            r["event_type"]: r
            for r in ar1_forecast(
                spark.read.parquet(f"{sf_dir}/events.parquet")
            ).collect()
        }
        for g, series in self._daily(spark, sf_dir).items():
            pairs = [
                (series[d], series[d - dt.timedelta(days=1)])
                for d in series
                if d - dt.timedelta(days=1) in series
            ]
            if len(pairs) < 3:
                assert g not in got
                continue
            n1 = len(pairs)
            sa = sum(a for a, _ in pairs)
            sb = sum(b for _, b in pairs)
            cov = sum(a * b for a, b in pairs) - sa * sb / n1
            vb = sum(b * b for _, b in pairs) - sb * sb / n1
            if vb <= 0:
                assert g not in got
                continue
            phi = cov / vb
            mean_c = sum(series.values()) / len(series)
            y_last = series[max(series)]
            fc = mean_c + phi * (y_last - mean_c)
            r = got[g]
            assert r["n_pairs"] == n1
            assert abs(r["phi"] - phi) < 1e-12
            assert abs(r["forecast_cents"] - fc) < 1e-6 * max(1.0, abs(fc))
            # closed-form SSE == direct residual sum
            sse = sum(
                (a - mean_c - phi * (b - mean_c)) ** 2 for a, b in pairs
            )
            assert abs(r["sse"] - sse) < 1e-6 * max(1.0, sse)

    def test_seasonal_strength_is_weekday_anova_r2(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.timeseries import (
            seasonal_strength,
        )

        got = {
            r["event_type"]: r["strength"]
            for r in seasonal_strength(
                spark.read.parquet(f"{sf_dir}/events.parquet")
            ).collect()
        }
        for g, series in self._daily(spark, sf_dir).items():
            vals = list(series.values())
            n = len(vals)
            if n <= 7:
                assert g not in got
                continue
            mean = sum(vals) / n
            sst = sum((v - mean) ** 2 for v in vals)
            bywd = {}
            for d, y in series.items():
                bywd.setdefault(d.isoweekday() % 7, []).append(y)
            ssb = sum(
                len(v) * (sum(v) / len(v) - mean) ** 2 for v in bywd.values()
            )
            assert abs(got[g] - ssb / sst) < 1e-9

    def test_granger_matches_statsmodels_style(self, spark, sf_dir):
        import datetime as dt

        from p2_mapreduce_spark.operators.timeseries import granger_lag1

        rows = granger_lag1(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).collect()
        daily = self._daily(spark, sf_dir)
        y, x = daily["purchase"], daily["view"]
        tri = [
            (y[d], y[d - dt.timedelta(days=1)], x[d - dt.timedelta(days=1)])
            for d in y
            if d - dt.timedelta(days=1) in y
            and d - dt.timedelta(days=1) in x
        ]
        n = len(tri)
        if n < 5:
            assert rows == []
            return
        mw = sum(t[0] for t in tri) / n
        mu = sum(t[1] for t in tri) / n
        mv = sum(t[2] for t in tri) / n
        cww = sum((t[0] - mw) ** 2 for t in tri)
        cuu = sum((t[1] - mu) ** 2 for t in tri)
        cvv = sum((t[2] - mv) ** 2 for t in tri)
        cuw = sum((t[1] - mu) * (t[0] - mw) for t in tri)
        cvw = sum((t[2] - mv) * (t[0] - mw) for t in tri)
        cuv = sum((t[1] - mu) * (t[2] - mv) for t in tri)
        rss_r = cww - cuw**2 / cuu
        det = cuu * cvv - cuv**2
        bu = (cuw * cvv - cvw * cuv) / det
        bv = (cvw * cuu - cuw * cuv) / det
        rss_u = cww - (bu * cuw + bv * cvw)
        f = (rss_r - rss_u) / (rss_u / (n - 3))
        r = rows[0]
        assert r["n_triples"] == n
        assert abs(r["f_granger"] - f) < 1e-6 * max(1.0, abs(f))

    def test_rsi_matches_textbook(self, spark, sf_dir):
        import datetime as dt

        from p2_mapreduce_spark.operators.timeseries import rsi_daily

        got = {
            (r["event_type"], r["day"]): r["rsi"]
            for r in rsi_daily(
                spark.read.parquet(f"{sf_dir}/events.parquet")
            ).collect()
        }
        daily = self._daily(spark, sf_dir)
        expected = {}
        for g, series in daily.items():
            moves = {
                d: series[d] - series[d - dt.timedelta(days=1)]
                for d in series
                if d - dt.timedelta(days=1) in series
            }
            for d in moves:
                frame = [
                    moves[d - dt.timedelta(days=i)]
                    for i in range(14)
                    if d - dt.timedelta(days=i) in moves
                ]
                if len(frame) != 14:
                    continue
                gains = sum(m for m in frame if m > 0)
                losses = sum(-m for m in frame if m < 0)
                expected[(g, d.isoformat())] = (
                    100.0 * gains / (gains + losses)
                    if gains + losses > 0
                    else 50.0
                )
        assert set(got) == set(expected)
        for k in got:
            assert abs(got[k] - expected[k]) < 1e-9

    def test_sprt_decision_and_llr(self, spark, sf_dir):
        import math

        from p2_mapreduce_spark.operators.events_analytics import (
            SPRT_ALPHA,
            SPRT_BETA,
            SPRT_P0,
            SPRT_P1,
            sprt_daily,
        )

        rows = sorted(
            sprt_daily(
                spark.read.parquet(f"{sf_dir}/events.parquet")
            ).collect(),
            key=lambda r: r["day"],
        )
        l1 = math.log(SPRT_P1 / SPRT_P0)
        l0 = math.log((1 - SPRT_P1) / (1 - SPRT_P0))
        a = math.log((1 - SPRT_BETA) / SPRT_ALPHA)
        b = math.log(SPRT_BETA / (1 - SPRT_ALPHA))
        decided = None
        for r in rows:
            llr = r["k_cum"] * l1 + (r["n_cum"] - r["k_cum"]) * l0
            assert abs(r["llr"] - llr) < 1e-9
            if decided is None:
                if llr >= a:
                    decided = "accept_h1"
                elif llr <= b:
                    decided = "accept_h0"
            assert r["state"] == (decided or "continue")


def test_round8_timeseries_ops_tolerate_empty_inputs(spark):
    from p2_mapreduce_spark.operators.events_analytics import sprt_daily
    from p2_mapreduce_spark.operators.timeseries import (
        ar1_forecast,
        granger_lag1,
        price_osc,
        rsi_daily,
        seasonal_strength,
    )

    ev = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    for op in (
        ar1_forecast,
        seasonal_strength,
        granger_lag1,
        rsi_daily,
        price_osc,
        sprt_daily,
    ):
        assert op(ev).count() == 0, op.__name__


class TestRound8BatchCParity:
    """Third-implementation parity for HITS, Hellinger, Stuart-Maxwell
    and the squared-rank scale test."""

    def test_hits_matches_numpy_power_iteration(self, spark, sf_dir):
        from collections import defaultdict

        from p2_mapreduce_spark.operators.graph import trade_hits

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        od = spark.read.parquet(f"{sf_dir}/orders.parquet")
        got = {
            (r["side"], r["node"]): (r["score_q"], r["score"])
            for r in trade_hits(li, od).collect()
        }
        edges = {
            (r["o_custkey"] * 2, r["l_suppkey"] * 2 + 1)
            for r in li.join(od, li.l_orderkey == od.o_orderkey)
            .select("o_custkey", "l_suppkey")
            .collect()
        }
        h = {s: 1 for s, _ in edges}
        a = None
        for _ in range(2):
            a = defaultdict(int)
            for s, d in edges:
                a[d] += h[s]
            h2 = defaultdict(int)
            for s, d in edges:
                h2[s] += a[d]
            h = h2
        hm, am = max(h.values()), max(a.values())
        exp = {("hub", k): (v, v / hm) for k, v in h.items()}
        exp.update({("auth", k): (v, v / am) for k, v in a.items()})
        assert got == exp

    def test_hellinger_matches_textbook(self, spark, sf_dir):
        import math
        from collections import Counter

        from p2_mapreduce_spark.operators.profile import hellinger_drift

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        got = {
            r["source"]: r["hellinger"] for r in hellinger_drift(docs).collect()
        }
        rows = docs.select("source", "lang").collect()
        cells = Counter((r["source"], r["lang"]) for r in rows)
        langs = sorted({lg for _, lg in cells})
        srcs = sorted({s for s, _ in cells})
        n_all = len(rows)
        for s in srcs:
            n_s = sum(c for (src, _), c in cells.items() if src == s)
            h2 = 0.0
            for lg in langs:
                c = cells.get((s, lg), 0)
                tot = sum(v for (_, l2), v in cells.items() if l2 == lg)
                p = c / n_s
                q = (tot - c) / (n_all - n_s)
                h2 += (math.sqrt(p) - math.sqrt(q)) ** 2
            assert abs(got[s] - math.sqrt(h2 * 0.5)) < 1e-12, s

    def test_stuart_maxwell_matches_textbook(self, spark, sf_dir):
        from collections import Counter, defaultdict

        from p2_mapreduce_spark.operators.events_analytics import (
            stuart_maxwell,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        row = stuart_maxwell(ev).collect()[0]
        recs = ev.select("user_id", "ts", "event_type").collect()
        kinds = ("click", "purchase", "view")
        days = sorted({r["ts"].date() for r in recs})
        mid = days[0] + __import__("datetime").timedelta(
            days=(days[-1] - days[0]).days // 2
        )
        per = defaultdict(Counter)
        for r in recs:
            if r["event_type"] in kinds:
                half = r["ts"].date() <= mid
                per[(r["user_id"], half)][r["event_type"]] += 1

        def modal(c):
            return min(c, key=lambda k: (-c[k], k))

        cells = Counter()
        users = {u for u, _ in per}
        n_users = 0
        for u in users:
            if (u, True) in per and (u, False) in per:
                cells[(modal(per[(u, True)]), modal(per[(u, False)]))] += 1
                n_users += 1
        n = {
            (i, j): cells.get((kinds[i], kinds[j]), 0)
            for i in range(3)
            for j in range(3)
        }
        r_ = [sum(n[(i, j)] for j in range(3)) for i in range(3)]
        c_ = [sum(n[(i, j)] for i in range(3)) for j in range(3)]
        d1, d2 = r_[0] - c_[0], r_[1] - c_[1]
        s11 = r_[0] + c_[0] - 2 * n[(0, 0)]
        s22 = r_[1] + c_[1] - 2 * n[(1, 1)]
        s12 = -(n[(0, 1)] + n[(1, 0)])
        det = s11 * s22 - s12 * s12
        chi2 = (
            (d1 * d1 * s22 - 2 * d1 * d2 * s12 + d2 * d2 * s11) / det
            if det > 0
            else 0.0
        )
        assert row["n_users"] == n_users
        assert abs(row["chi2"] - chi2) < 1e-9 * max(1.0, abs(chi2))

    def test_squared_rank_scale_matches_textbook(self, spark, sf_dir):
        import math
        from collections import defaultdict

        from p2_mapreduce_spark.operators.timeseries import (
            squared_rank_scale,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        row = squared_rank_scale(ev).collect()[0]
        recs = ev.filter(
            ev.event_type.isin("view", "click")
        ).select("event_type", "ts", "value").collect()
        daily = defaultdict(int)
        for r in recs:
            daily[(r["event_type"], r["ts"].date())] += math.floor(
                r["value"] * 100
            )
        pooled = sorted(daily.items(), key=lambda kv: kv[1])
        vals = [v for _, v in pooled]
        n = len(vals)
        # tie-aware midranks
        mid = {}
        i = 0
        while i < n:
            j = i
            while j < n and vals[j] == vals[i]:
                j += 1
            for k in range(i, j):
                mid[k] = (i + 1 + j) / 2
            i = j
        scores = [(mid[k] - (n + 1) / 2) ** 2 for k in range(n)]
        t_a = sum(
            s
            for k, s in enumerate(scores)
            if pooled[k][0][0] == "view"
        )
        n_a = sum(1 for (g, _), _v in pooled if g == "view")
        n_b = n - n_a
        sbar = sum(scores) / n
        s2 = sum(s * s for s in scores)
        var = n_a * n_b / (n * (n - 1)) * (s2 - n * sbar**2)
        z = (t_a - n_a * sbar) / math.sqrt(var)
        assert row["n_a"] == n_a and row["n_b"] == n_b
        assert row["t4_a"] == round(4 * t_a)
        assert abs(row["z_scale"] - z) < 1e-9


def test_round8_batch_c_tolerate_empty_inputs(spark):
    from p2_mapreduce_spark.operators.dedup import dedup_roi_curve
    from p2_mapreduce_spark.operators.events_analytics import stuart_maxwell
    from p2_mapreduce_spark.operators.graph import hits_scores
    from p2_mapreduce_spark.operators.profile import (
        hellinger_drift,
        staleness_audit,
    )
    from p2_mapreduce_spark.operators.timeseries import squared_rank_scale

    ev = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    edges = spark.createDataFrame([], "src long, dst long")
    assert stuart_maxwell(ev).count() == 0
    assert squared_rank_scale(ev).count() == 0
    assert staleness_audit(ev).count() == 0
    assert hellinger_drift(docs).count() == 0
    assert hits_scores(edges).count() == 0
    # dup_roi on an empty corpus: 5 threshold rows, all zero counts
    roi = dedup_roi_curve(docs).collect()
    assert len(roi) == 5 and all(r["n_pairs"] == 0 for r in roi)


class TestRound8RankTestParity:
    """Third-implementation parity for the rank/trend/outlier batch."""

    def _daily2(self, spark, sf_dir):
        import math
        from collections import defaultdict

        rows = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("event_type", "ts", "value")
            .collect()
        )
        daily = defaultdict(int)
        for r in rows:
            daily[(r["event_type"], r["ts"].date())] += math.floor(
                r["value"] * 100
            )
        return daily

    @staticmethod
    def _midranks(vals):
        out = {}
        i, n = 0, len(vals)
        sv = sorted(range(n), key=lambda k: vals[k])
        i = 0
        while i < n:
            j = i
            while j < n and vals[sv[j]] == vals[sv[i]]:
                j += 1
            for k in range(i, j):
                out[sv[k]] = (i + 1 + j) / 2
            i = j
        return [out[k] for k in range(n)]

    def test_ansari_bradley_matches_textbook(self, spark, sf_dir):
        import math

        from p2_mapreduce_spark.operators.timeseries import ansari_bradley

        row = ansari_bradley(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).collect()[0]
        daily = self._daily2(spark, sf_dir)
        pooled = [
            (g, y) for (g, _), y in sorted(daily.items())
            if g in ("view", "click")
        ]
        ranks = self._midranks([y for _, y in pooled])
        n = len(pooled)
        scores = [min(r, n + 1 - r) for r in ranks]
        t_a = sum(s for (g, _), s in zip(pooled, scores) if g == "view")
        n_a = sum(1 for g, _ in pooled if g == "view")
        n_b = n - n_a
        sbar = sum(scores) / n
        var = (
            n_a * n_b / (n * (n - 1))
            * (sum(s * s for s in scores) - n * sbar**2)
        )
        z = (t_a - n_a * sbar) / math.sqrt(var)
        assert row["t2_a"] == round(2 * t_a)
        assert abs(row["z_scale"] - z) < 1e-9

    def test_wilcoxon_signed_matches_textbook(self, spark, sf_dir):
        import math

        from p2_mapreduce_spark.operators.timeseries import wilcoxon_signed

        row = wilcoxon_signed(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).collect()[0]
        daily = self._daily2(spark, sf_dir)
        days = {
            d for g, d in daily if g == "view"
        } & {d for g, d in daily if g == "click"}
        diffs = [
            daily[("view", d)] - daily[("click", d)] for d in sorted(days)
        ]
        nz = [d for d in diffs if d != 0]
        ranks = self._midranks([abs(d) for d in nz])
        n = len(nz)
        w_plus = sum(r for d, r in zip(nz, ranks) if d > 0)
        tie = {}
        for d in nz:
            tie[abs(d)] = tie.get(abs(d), 0) + 1
        tie_sum = sum(t**3 - t for t in tie.values())
        var = n * (n + 1) * (2 * n + 1) / 24 - tie_sum / 48
        z = (w_plus - n * (n + 1) / 4) / math.sqrt(var)
        assert row["n_pairs"] == len(diffs)
        assert row["n_nonzero"] == n
        assert row["w2_plus"] == round(2 * w_plus)
        assert abs(row["z_signed"] - z) < 1e-9

    def test_page_trend_matches_textbook(self, spark, sf_dir):
        import math
        from collections import defaultdict

        from p2_mapreduce_spark.operators.timeseries import page_trend

        row = page_trend(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).collect()[0]
        rows = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("event_type", "ts", "value")
            .collect()
        )
        cell = defaultdict(int)
        for r in rows:
            wd = r["ts"].date().isoweekday() % 7  # block id only
            cell[(r["event_type"], wd)] += math.floor(r["value"] * 100)
        groups = sorted({g for g, _ in cell})
        blocks = sorted({b for _, b in cell})
        rank_sum = {g: 0.0 for g in groups}
        for b in blocks:
            col = [(g, cell.get((g, b))) for g in groups if (g, b) in cell]
            ranks = self._midranks([y for _, y in col])
            for (g, _), r in zip(col, ranks):
                rank_sum[g] += r
        l = sum((j + 1) * rank_sum[g] for j, g in enumerate(groups))
        k, b = len(groups), len(blocks)
        e = b * k * (k + 1) ** 2 / 4
        var = b * k**2 * (k + 1) * (k**2 - 1) / 144
        z = (l - e) / math.sqrt(var)
        assert row["l2"] == round(2 * l)
        complete = all((g, bb) in cell for g in groups for bb in blocks)
        if k >= 3 and complete and var > 0:
            assert abs(row["z_trend"] - z) < 1e-9

    def test_cox_stuart_matches_textbook(self, spark, sf_dir):
        import math

        from p2_mapreduce_spark.operators.timeseries import cox_stuart

        got = {
            r["event_type"]: r
            for r in cox_stuart(
                spark.read.parquet(f"{sf_dir}/events.parquet")
            ).collect()
        }
        daily = self._daily2(spark, sf_dir)
        series = {}
        for (g, d), y in sorted(daily.items()):
            series.setdefault(g, []).append(y)
        for g, ys in series.items():
            nd = len(ys)
            h = nd // 2
            diffs = [ys[i + h] - ys[i] for i in range(h)]
            m = sum(1 for d in diffs if d != 0)
            sp = sum(1 for d in diffs if d > 0)
            r = got[g]
            assert r["n_days"] == nd and r["s_plus"] == sp
            if m:
                z = (sp - m / 2) / math.sqrt(m / 4)
                assert abs(r["z_trend"] - z) < 1e-12

    def test_dixon_q_matches_textbook(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.timeseries import dixon_q

        got = {
            r["event_type"]: (r["q_low"], r["q_high"])
            for r in dixon_q(
                spark.read.parquet(f"{sf_dir}/events.parquet")
            ).collect()
        }
        daily = self._daily2(spark, sf_dir)
        series = {}
        for (g, d), y in daily.items():
            series.setdefault(g, []).append(y)
        for g, ys in series.items():
            ys = sorted(ys)
            if len(ys) < 3 or ys[-1] == ys[0]:
                assert g not in got
                continue
            rng = ys[-1] - ys[0]
            assert abs(got[g][0] - (ys[1] - ys[0]) / rng) < 1e-15
            assert abs(got[g][1] - (ys[-1] - ys[-2]) / rng) < 1e-15


def test_round8_rank_tests_tolerate_empty_inputs(spark):
    from p2_mapreduce_spark.operators.timeseries import (
        ansari_bradley,
        cox_stuart,
        dixon_q,
        page_trend,
        wilcoxon_signed,
    )

    ev = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    for op in (ansari_bradley, wilcoxon_signed, page_trend, cox_stuart,
               dixon_q):
        assert op(ev).count() == 0, op.__name__


class TestRound8GraphComposition:
    def test_textrank_matches_pure_python_pagerank(self, spark, sf_dir):
        import re
        from collections import defaultdict

        from p2_mapreduce_spark.operators.graph import PR_SCALE
        from p2_mapreduce_spark.operators.text_analysis import (
            textrank_keywords,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        got = [
            (r["word"], r["rank_q"], r["rnk"])
            for r in textrank_keywords(docs).collect()
        ]
        # pure-python twin of the exact integer pagerank on the same graph
        texts = [r["text"] for r in docs.select("text").collect()]
        edges = set()
        for t in texts:
            toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
            for x, y in zip(toks, toks[1:]):
                if x != y:
                    edges.add((min(x, y), max(x, y)))
        sym = defaultdict(list)
        for a, b in edges:
            sym[a].append(b)
            sym[b].append(a)
        deg = {w: len(vs) for w, vs in sym.items()}
        n = len(deg)
        rank = {w: PR_SCALE // n for w in deg}
        import math
        base = math.floor(0.15 * float(PR_SCALE) / n)
        for _ in range(3):
            inflow = defaultdict(int)
            for w, vs in sym.items():
                c = rank[w] // deg[w]
                for v in vs:
                    inflow[v] += c
            rank = {
                w: base + math.floor(0.85 * inflow[w]) for w in deg
            }
        exp = sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        assert got == [
            (w, q, i + 1) for i, (w, q) in enumerate(exp)
        ]

    def test_dup_edge_support_matches_manual(self, spark, sf_dir):
        from collections import Counter, defaultdict

        from p2_mapreduce_spark.operators.dedup import (
            dup_edge_support,
            ngram_jaccard_pairs,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        got = {
            r["support"]: r["n_edges"]
            for r in dup_edge_support(docs).collect()
        }
        pairs = {
            (r["doc_a"], r["doc_b"])
            for r in ngram_jaccard_pairs(docs, threshold=0.5)
            .select("doc_a", "doc_b")
            .collect()
        }
        nbr = defaultdict(set)
        for a, b in pairs:
            nbr[a].add(b)
            nbr[b].add(a)
        hist = Counter(len(nbr[a] & nbr[b]) for a, b in pairs)
        assert got == dict(hist)

    def test_textrank_and_support_empty_inputs(self, spark):
        from p2_mapreduce_spark.operators.dedup import dup_edge_support
        from p2_mapreduce_spark.operators.text_analysis import (
            textrank_keywords,
        )

        docs = spark.createDataFrame(
            [], "doc_id long, text string, lang string, source string,"
            " n_chars long"
        )
        assert textrank_keywords(docs).count() == 0
        assert dup_edge_support(docs).count() == 0


class TestTiffCodec:
    """TIFF decoder: real-bytes round-trip on both byte orders plus the
    quarantine envelope (the round-5 JPEG-gate test discipline: every
    guard exercised with a payload that is truly gated)."""

    @staticmethod
    def _build(mid, mutate=None):
        """Pure-python twin of attach_tiff's hex fold."""
        w, h, base = 4 + mid % 9, 4 + (mid * 5) % 9, (mid % 32) * 2
        le = mid % 2 == 0
        bo = "little" if le else "big"
        px = bytes(
            (base + 3 * x + 7 * y) % 256
            for y in range(h)
            for x in range(w)
        )
        ents = [
            (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8),
            (259, 3, 1, 1), (262, 3, 1, 1), (273, 4, 1, 8),
            (277, 3, 1, 1), (278, 3, 1, h), (279, 4, 1, w * h),
        ]
        if mutate:
            ents = [mutate(e) for e in ents]
        ifd = len(ents).to_bytes(2, bo)
        for tag, typ, cnt, val in ents:
            vf = (
                val.to_bytes(2, bo) + b"\x00\x00"
                if typ == 3
                else val.to_bytes(4, bo)
            )
            ifd += (
                tag.to_bytes(2, bo) + typ.to_bytes(2, bo)
                + cnt.to_bytes(4, bo) + vf
            )
        ifd += b"\x00\x00\x00\x00"
        head = (
            (b"II" if le else b"MM")
            + (42).to_bytes(2, bo)
            + (8 + w * h).to_bytes(4, bo)
        )
        return head + px + ifd

    def test_roundtrip_both_byte_orders(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.multimodal import (
            _decode_tiff,
            attach_tiff,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        rows = attach_tiff(docs).orderBy("media_id").limit(8).collect()
        for r in rows:
            mid = r["media_id"]
            payload = bytes(r["payload"])
            assert payload == self._build(mid), mid  # byte-exact builder
            w, h, grid = _decode_tiff(payload)
            assert (w, h) == (4 + mid % 9, 4 + (mid * 5) % 9)
            base = (mid % 32) * 2
            assert grid[0][0] == base % 256
            assert grid[h - 1][w - 1] == (base + 3 * (w - 1) + 7 * (h - 1)) % 256

    def test_quarantine_envelope(self):
        from p2_mapreduce_spark.operators.multimodal import _decode_tiff

        good = self._build(7)
        assert _decode_tiff(good) is not None
        # wrong order mark / magic
        assert _decode_tiff(b"XX" + good[2:]) is None
        assert _decode_tiff(good[:2] + b"\x00\x29" + good[4:]) is None
        # compressed file (tag 259 = 5, LZW)
        assert (
            _decode_tiff(
                self._build(7, lambda e: (259, 3, 1, 5) if e[0] == 259 else e)
            )
            is None
        )
        # 16-bit samples
        assert (
            _decode_tiff(
                self._build(7, lambda e: (258, 3, 1, 16) if e[0] == 258 else e)
            )
            is None
        )
        # RATIONAL value type out of the baseline envelope
        assert (
            _decode_tiff(
                self._build(7, lambda e: (256, 5, 1, e[3]) if e[0] == 256 else e)
            )
            is None
        )
        # multi-count entry (multi-strip)
        assert (
            _decode_tiff(
                self._build(7, lambda e: (273, 4, 2, 8) if e[0] == 273 else e)
            )
            is None
        )
        # strip byte count mismatch
        assert (
            _decode_tiff(
                self._build(7, lambda e: (279, 4, 1, 9999) if e[0] == 279 else e)
            )
            is None
        )
        # truncated strip
        assert _decode_tiff(good[:20]) is None
        # chained second IFD
        bad = bytearray(good)
        bad[-4:] = (1).to_bytes(4, "big" if good[:2] == b"MM" else "little")
        assert _decode_tiff(bytes(bad)) is None


class TestPgmAndStump:
    def test_pgm_grammar_and_quarantine(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.multimodal import (
            _decode_pgm,
            attach_pgm,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        rows = attach_pgm(docs).orderBy("media_id").limit(6).collect()
        for r in rows:
            mid = r["media_id"]
            payload = bytes(r["payload"])
            if mid % 3 == 0:
                assert b"# synthetic\n" in payload  # comment exercised
            w, h, grid = _decode_pgm(payload)
            assert (w, h) == (4 + mid % 9, 4 + (mid * 7) % 9)
            base = (mid % 24) * 3
            assert grid[0][0] == base % 256
        good = bytes(rows[1]["payload"])
        assert _decode_pgm(b"P2" + good[2:]) is None  # ASCII variant
        assert _decode_pgm(good[:-1]) is None  # short pixel block
        assert _decode_pgm(good + b"\x00") is None  # overlong block
        # maxval != 255
        bad = good.replace(b"255\n", b"65535\n", 1)
        assert _decode_pgm(bad) is None

    def test_stump_gini_matches_textbook(self, spark, sf_dir):
        import math
        from collections import defaultdict

        from p2_mapreduce_spark.operators.curation import stump_gini

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        got = {
            r["feature"]: (r["gini_parent"], r["gini_split"], r["decrease"])
            for r in stump_gini(li).collect()
        }
        recs = li.select(
            "l_quantity", "l_discount", "l_shipdate", "l_returnflag"
        ).collect()
        n = len(recs)
        p = sum(1 for r in recs if r["l_returnflag"] == "R")
        gp = 1 - (p / n) ** 2 - ((n - p) / n) ** 2
        feats = {
            "qty_decile": lambda r: math.floor(r["l_quantity"]) // 10,
            "discount_level": lambda r: math.floor(r["l_discount"] * 100),
            "ship_month": lambda r: r["l_shipdate"].month,
        }
        for name, fn in feats.items():
            cells = defaultdict(lambda: [0, 0])
            for r in recs:
                c = cells[fn(r)]
                c[0] += 1
                c[1] += 1 if r["l_returnflag"] == "R" else 0
            gs = sum(
                (nb / n) * (1 - (pb / nb) ** 2 - ((nb - pb) / nb) ** 2)
                for nb, pb in cells.values()
            )
            ggp, ggs, gd = got[name]
            assert abs(ggp - gp) < 1e-12
            assert abs(ggs - gs) < 1e-12
            assert abs(gd - (gp - gs)) < 1e-12

    def test_pgm_stump_empty_inputs(self, spark):
        from p2_mapreduce_spark.operators.curation import stump_gini
        from p2_mapreduce_spark.operators.multimodal import (
            attach_pgm,
            pgm_pixel_stats,
        )

        docs = spark.createDataFrame(
            [], "doc_id long, text string, lang string, source string,"
            " n_chars long"
        )
        li = spark.createDataFrame(
            [],
            "l_orderkey long, l_quantity double, l_extendedprice double,"
            " l_discount double, l_returnflag string, l_shipdate timestamp",
        )
        assert pgm_pixel_stats(attach_pgm(docs)).count() == 0
        assert stump_gini(li).count() == 0


class TestReliabilityBatch:
    def test_cronbach_matches_textbook(self, spark, sf_dir):
        import re
        import statistics

        from p2_mapreduce_spark.operators.text_analysis import (
            cronbach_alpha,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        row = cronbach_alpha(docs).collect()[0]
        recs = docs.select("text", "n_chars").collect()
        x1, x2, x3 = [], [], []
        for r in recs:
            toks = [w for w in re.split(r"[^a-z0-9]+", r["text"].lower()) if w]
            x1.append(r["n_chars"])
            x2.append(len(toks))
            x3.append(len(set(toks)))
        tot = [a + b + c for a, b, c in zip(x1, x2, x3)]
        vi = sum(statistics.variance(x) for x in (x1, x2, x3))
        vt = statistics.variance(tot)
        alpha = 1.5 * (1 - vi / vt)
        assert row["n_docs"] == len(recs)
        assert abs(row["alpha"] - alpha) < 1e-9

    def test_lins_ccc_and_bland_altman_match_textbook(self, spark, sf_dir):
        import math
        from collections import defaultdict

        from p2_mapreduce_spark.operators.timeseries import (
            bland_altman,
            lins_ccc,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        ccc_row = lins_ccc(ev).collect()[0]
        ba_row = bland_altman(ev).collect()[0]
        daily = defaultdict(int)
        for r in ev.select("event_type", "ts", "value").collect():
            if r["event_type"] in ("view", "click"):
                daily[(r["event_type"], r["ts"].date())] += math.floor(
                    r["value"] * 100
                )
        days = {d for g, d in daily if g == "view"} & {
            d for g, d in daily if g == "click"
        }
        xs = [daily[("view", d)] for d in sorted(days)]
        ys = [daily[("click", d)] for d in sorted(days)]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        vx = sum((v - mx) ** 2 for v in xs) / n
        vy = sum((v - my) ** 2 for v in ys) / n
        cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys)) / n
        ccc = 2 * cov / (vx + vy + (mx - my) ** 2)
        r = cov / math.sqrt(vx * vy)
        assert ccc_row["n_pairs"] == n
        assert abs(ccc_row["ccc"] - ccc) < 1e-9
        assert abs(ccc_row["pearson_r"] - r) < 1e-9
        assert abs(ccc_row["c_b"] - ccc / r) < 1e-9
        diffs = [a - b for a, b in zip(xs, ys)]
        md = sum(diffs) / n
        sd = math.sqrt(sum((d - md) ** 2 for d in diffs) / (n - 1))
        assert abs(ba_row["mean_diff"] - md / 100) < 1e-6
        assert abs(ba_row["sd_diff"] - sd / 100) < 1e-6
        assert abs(ba_row["loa_high"] - (md + 1.96 * sd) / 100) < 1e-6

    def test_reliability_empty_inputs(self, spark):
        from p2_mapreduce_spark.operators.text_analysis import (
            cronbach_alpha,
        )
        from p2_mapreduce_spark.operators.timeseries import (
            bland_altman,
            lins_ccc,
        )

        docs = spark.createDataFrame(
            [], "doc_id long, text string, lang string, source string,"
            " n_chars long"
        )
        ev = spark.createDataFrame(
            [],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        assert cronbach_alpha(docs).count() == 0
        assert lins_ccc(ev).count() == 0
        assert bland_altman(ev).count() == 0


def test_risk_ratio_matches_textbook_and_empty(spark, sf_dir):
    from collections import defaultdict

    from p2_mapreduce_spark.operators.events_analytics import risk_ratio

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    row = risk_ratio(ev).collect()[0]
    per = defaultdict(lambda: [None, 0])
    for r in sorted(
        ev.select("user_id", "ts", "event_id", "event_type").collect(),
        key=lambda r: (r["ts"], r["event_id"]),
    ):
        u = per[r["user_id"]]
        if u[0] is None:
            u[0] = r["event_type"]
        if r["event_type"] == "purchase":
            u[1] = 1
    a = sum(1 for f, o in per.values() if f == "view" and o)
    b = sum(1 for f, o in per.values() if f == "view" and not o)
    c = sum(1 for f, o in per.values() if f != "view" and o)
    d = sum(1 for f, o in per.values() if f != "view" and not o)
    assert (row["n_exposed"], row["n_unexposed"]) == (a + b, c + d)
    if a + b > 0 and c + d > 0:
        re_, ru = a / (a + b), c / (c + d)
        if ru > 0:
            assert abs(row["risk_ratio"] - re_ / ru) < 1e-12
        assert abs(row["risk_diff"] - (re_ - ru)) < 1e-12
    else:
        # degenerate margin: the operator's documented 0.0 sentinels
        assert row["risk_ratio"] == 0.0 and row["risk_diff"] == 0.0
    empty = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    assert risk_ratio(empty).count() == 0
