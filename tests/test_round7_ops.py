"""Round-7 operator tests: FLAC LPC + stereo decorrelation, the
MPEG-1 Layer I subband decode, and the round-7 analytics/stats batch.
"""

import datetime as dt

from pyspark.sql import functions as F


def _flac_lpc_bytes(
    doc_id,
    shift_bits="00001",
    prec_bits="0011",
    ch_code=None,
):
    """Python twin of attach_flac_lpc's JVM hex fold, with knobs to
    produce out-of-envelope variants (negative shift, reserved
    precision, reserved channel code) the decoder must quarantine."""
    from p2_mapreduce_spark.operators.multimodal import (
        _crc8_flac,
        _crc16_flac,
    )

    def bits_int(v, n):
        return format(v % (1 << n), f"0{n}b")

    n = 16 + 8 * (doc_id % 4)
    s0 = 150 + doc_id % 50
    b = doc_id % 7 - 3
    d = doc_id % 9 - 4
    mode = doc_id % 3
    cc = ch_code if ch_code is not None else {0: 8, 1: 9, 2: 10}[mode]
    si = n.to_bytes(2, "big") * 2 + b"\x00" * 6
    sbits = (
        format(8000, "020b") + "001" + format(15, "05b")
        + format(n, "036b")
    )
    si += int(sbits, 2).to_bytes(8, "big") + b"\x00" * 16
    fh = bytes([0xFF, 0xF8, 0x60, (cc << 4) | 0x08, 0x00, n - 1])
    fh += bytes([_crc8_flac(fh)])
    base = {0: s0, 1: s0 - d, 2: s0 + ((-d) >> 1)}[mode]
    e = -((-b) >> 1)
    u = 2 * e if e >= 0 else -2 * e - 1
    res = "0" * (u >> 1) + "1" + str(u & 1)
    lpc = (
        "01000010" + bits_int(base, 16) + bits_int(base + b, 16)
        + prec_bits + shift_bits + "0011" + "1111"
        + "0000000001" + res * (n - 2)
    )
    const = "00000000" + bits_int(d, 17)
    body = const + lpc if mode == 1 else lpc + const
    body += "0" * ((8 - len(body) % 8) % 8)
    frame = fh + int(body, 2).to_bytes(len(body) // 8, "big")
    frame += _crc16_flac(frame).to_bytes(2, "big")
    return b"fLaC" + b"\x80" + (34).to_bytes(3, "big") + si + frame


class TestFlacLpc:
    def test_decode_matches_closed_form(self, spark):
        """All three decorrelation modes and the LPC [3,-1]>>1
        predictor reconstruct L = s0 + b*t and R = L - d exactly."""
        from p2_mapreduce_spark.operators.multimodal import (
            _decode_flac,
            attach_flac_lpc,
        )

        docs = spark.createDataFrame(
            [(i, "x") for i in range(36)], ["doc_id", "text"]
        )
        for r in attach_flac_lpc(docs).collect():
            mid = r["media_id"]
            parsed = _decode_flac(bytes(r["payload"]))
            assert parsed is not None, f"id {mid} quarantined"
            rate, nch, chans = parsed
            assert (rate, nch) == (8000, 2)
            n = 16 + 8 * (mid % 4)
            s0, b, d = 150 + mid % 50, mid % 7 - 3, mid % 9 - 4
            left = [s0 + b * t for t in range(n)]
            right = [v - d for v in left]
            assert chans[0] == left, f"id {mid} L"
            assert chans[1] == right, f"id {mid} R"

    def test_jvm_builder_matches_python_twin(self, spark):
        """The JVM hex fold and the Python twin produce byte-identical
        files — any drift in either construction is a failure."""
        from p2_mapreduce_spark.operators.multimodal import (
            attach_flac_lpc,
        )

        docs = spark.createDataFrame(
            [(i, "x") for i in range(12)], ["doc_id", "text"]
        )
        for r in attach_flac_lpc(docs).collect():
            assert bytes(r["payload"]) == _flac_lpc_bytes(r["media_id"])

    def test_crc_verification_is_real(self):
        """Flipping any single frame byte must quarantine (stereo/LPC
        frames included)."""
        from p2_mapreduce_spark.operators.multimodal import _decode_flac

        payload = _flac_lpc_bytes(5)
        assert _decode_flac(payload) is not None
        for off in range(42, len(payload)):
            bad = bytearray(payload)
            bad[off] ^= 0x04
            assert _decode_flac(bytes(bad)) is None, f"byte {off}"

    def test_out_of_envelope_variants_quarantine(self):
        """Negative LPC shift, reserved coefficient precision, and a
        reserved channel code each quarantine."""
        from p2_mapreduce_spark.operators.multimodal import _decode_flac

        # shift = -1 (11111): spec-representable, never emitted
        assert _decode_flac(_flac_lpc_bytes(5, shift_bits="11111")) is None
        # precision-1 field = 15 is reserved
        assert _decode_flac(_flac_lpc_bytes(5, prec_bits="1111")) is None
        # channel code 11 is reserved
        assert _decode_flac(_flac_lpc_bytes(5, ch_code=11)) is None

    def test_mid_side_parity_path(self):
        """Odd d exercises the dropped-LSB (side & 1) reconstruction:
        pick a mid-side id with odd d and verify bit-exactness."""
        from p2_mapreduce_spark.operators.multimodal import _decode_flac

        # id 14: mode = 14 % 3 = 2 (mid-side), d = 14 % 9 - 4 = 1 (odd)
        parsed = _decode_flac(_flac_lpc_bytes(14))
        assert parsed is not None
        n, s0, b, d = 16 + 8 * (14 % 4), 150 + 14 % 50, 14 % 7 - 3, 1
        left = [s0 + b * t for t in range(n)]
        assert parsed[2][0] == left
        assert parsed[2][1] == [v - d for v in left]


def _mp1_bytes(doc_id, header=None, mutate_bits=None):
    """Python twin of attach_mp1's JVM hex fold, with knobs for
    out-of-envelope variants."""
    nalloc = 4 + doc_id % 5
    bits = ""
    nbs = {}
    for sb in range(32):
        if sb < nalloc:
            nb = 2 + (doc_id + sb) % 7
            nbs[sb] = nb
            bits += format(nb - 1, "04b")
        else:
            bits += "0000"
    for sb in range(nalloc):
        bits += format(3 * ((doc_id + 2 * sb) % 16), "06b")
    for t in range(12):
        for sb in range(nalloc):
            nb = nbs[sb]
            c = (doc_id + 3 * sb + 5 * t) % ((1 << nb) - 1)
            bits += format(c, f"0{nb}b")
    if mutate_bits:
        bits = mutate_bits(bits)
    bits += "0" * ((8 - len(bits) % 8) % 8)
    body = int(bits, 2).to_bytes(len(bits) // 8, "big")
    frame = bytes.fromhex(header or "ffff48c0") + body
    return frame + b"\x00" * (192 - len(frame))


class TestMp1:
    def test_decode_matches_closed_form(self, spark):
        """Bit allocation walk, scalefactor lattice, MSB-inverted
        requantization: every dequantized subband sample must equal
        the single-division closed form."""
        import math

        from p2_mapreduce_spark.operators.multimodal import (
            _decode_mp1,
            attach_mp1,
        )

        docs = spark.createDataFrame(
            [(i, "x") for i in range(25)], ["doc_id", "text"]
        )
        for r in attach_mp1(docs).collect():
            mid = r["media_id"]
            assert bytes(r["payload"]) == _mp1_bytes(mid), f"id {mid} bytes"
            parsed = _decode_mp1(bytes(r["payload"]))
            assert parsed is not None, f"id {mid} quarantined"
            rate, subbands = parsed
            assert rate == 32000 and len(subbands) == 4 + mid % 5
            for sb, idx, vals in subbands:
                nb = 2 + (mid + sb) % 7
                assert idx == 3 * ((mid + 2 * sb) % 16)
                half, levels = 1 << (nb - 1), (1 << nb) - 1
                exp = [
                    math.floor(
                        ((2.0 * ((mid + 3 * sb + 5 * t) % levels
                                 - half + 1)) / levels)
                        * (1 << (31 - idx // 3))
                    )
                    for t in range(12)
                ]
                assert vals == exp, f"id {mid} sb {sb}"

    def test_out_of_envelope_headers_quarantine(self):
        from p2_mapreduce_spark.operators.multimodal import _decode_mp1

        assert _decode_mp1(b"") is None
        assert _decode_mp1(_mp1_bytes(3)) is not None
        # broken sync
        assert _decode_mp1(b"\x00" + _mp1_bytes(3)[1:]) is None
        # Layer II bits (fd instead of ff in byte 1)
        assert _decode_mp1(_mp1_bytes(3, header="fffd48c0")) is None
        # protection_bit 0 (CRC frame) out of envelope
        assert _decode_mp1(_mp1_bytes(3, header="fffe48c0")) is None
        # free-format bitrate
        assert _decode_mp1(_mp1_bytes(3, header="ffff08c0")) is None
        # reserved sampling code
        assert _decode_mp1(_mp1_bytes(3, header="ffff4cc0")) is None
        # stereo mode out of envelope
        assert _decode_mp1(_mp1_bytes(3, header="ffff4800")) is None
        # wrong frame length (truncated / extended)
        assert _decode_mp1(_mp1_bytes(3)[:-1]) is None
        assert _decode_mp1(_mp1_bytes(3) + b"\x00") is None

    def test_forbidden_codes_quarantine(self):
        """Allocation code 15, scalefactor 63, and the all-ones sample
        code must each quarantine."""
        from p2_mapreduce_spark.operators.multimodal import _decode_mp1

        def set_alloc15(bits):
            return "1111" + bits[4:]

        assert _decode_mp1(_mp1_bytes(3, mutate_bits=set_alloc15)) is None

        def set_scf63(bits):
            return bits[:128] + "111111" + bits[134:]

        assert _decode_mp1(_mp1_bytes(3, mutate_bits=set_scf63)) is None

        def set_allones_sample(bits):
            # id 3: nalloc 7, first sample subband 0 has nb = 2 + 3%7 = 5
            start = 128 + 6 * 7
            return bits[:start] + "1" * 5 + bits[start + 5:]

        assert (
            _decode_mp1(_mp1_bytes(3, mutate_bits=set_allones_sample))
            is None
        )


def _events7(spark, rows):
    """rows: (day, user, event_type, value) → events frame."""
    base = dt.datetime(2024, 3, 1)
    return spark.createDataFrame(
        [
            (i, base + dt.timedelta(days=d, hours=i % 4), u, g, float(v), "{}")
            for i, (d, u, g, v) in enumerate(rows)
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )


class TestRound7Stats:
    def test_durbin_watson_hand(self, spark):
        from p2_mapreduce_spark.operators.timeseries import durbin_watson

        vals = [3, 1, 4, 1, 5, 9, 2]
        ev = _events7(spark, [(d, 1, "a", v) for d, v in enumerate(vals)])
        row = durbin_watson(ev).collect()[0]
        c = [v * 100 for v in vals]
        m = sum(c) / len(c)
        dw = sum(
            (c[i] - c[i - 1]) ** 2 for i in range(1, len(c))
        ) / sum((v - m) ** 2 for v in c)
        assert row["n_days"] == 7
        assert abs(row["dw"] - dw) < 1e-9

    def test_durbin_watson_alternating_vs_trending(self, spark):
        """Alternating series → DW near 4; smooth trend → DW near 0."""
        from p2_mapreduce_spark.operators.timeseries import durbin_watson

        alt = _events7(
            spark, [(d, 1, "a", 10 if d % 2 else 1) for d in range(20)]
        )
        trend = _events7(spark, [(d, 1, "a", d + 1) for d in range(20)])
        assert durbin_watson(alt).collect()[0]["dw"] > 3.0
        assert durbin_watson(trend).collect()[0]["dw"] < 0.5

    def test_pettitt_finds_level_shift(self, spark):
        from p2_mapreduce_spark.operators.timeseries import pettitt_test

        vals = [1, 2, 1, 2, 1, 50, 51, 50, 51, 50]
        ev = _events7(spark, [(d, 1, "a", v) for d, v in enumerate(vals)])
        row = pettitt_test(ev).collect()[0]
        # change point after day index 4 (2024-03-05)
        assert row["cp_day"] == "2024-03-05"
        # U at the break: all 5 lows below all 5 highs → |U| = 25
        assert row["k_stat"] == 25 and row["u_at_cp"] == -25

    def test_tsb_hand_fold(self, spark):
        from p2_mapreduce_spark.operators.timeseries import tsb_forecast

        # demand on days 0 and 2 (values 4, 8), zero on days 1, 3
        rows = [(0, 1, "a", 4), (2, 1, "a", 8), (3, 1, "a", 0)]
        row = tsb_forecast(_events7(spark, rows)).collect()[0]
        # d0: seed (p=1, z=400); d1 zero: p=.75; d2 demand:
        # p=.75+.25*.25=.8125, z=(800+400)/2=600; d3 zero: p=.609375
        assert row["n_days"] == 4 and row["n_demand_days"] == 2
        assert abs(row["p_hat"] - 0.609375) < 1e-12
        assert abs(row["z_hat"] - 6.0) < 1e-12
        assert abs(row["forecast"] - 0.609375 * 6.0) < 1e-12

    def test_page_hinkley_detects_upshift(self, spark):
        from p2_mapreduce_spark.operators.timeseries import page_hinkley

        flat = [(d, 1, "a", 5) for d in range(10)]
        shifted = flat + [(d, 1, "a", 50) for d in range(10, 15)]
        ph_flat = page_hinkley(_events7(spark, flat)).collect()[0]
        ph_shift = page_hinkley(_events7(spark, shifted)).collect()[0]
        assert abs(ph_flat["ph_up"]) < 1e-9  # constant series: no alarm
        assert ph_shift["ph_up"] > 1000.0  # cents-scale alarm

    def test_friedman_hand(self, spark):
        from p2_mapreduce_spark.operators.timeseries import friedman_test

        # 3 groups × 3 weekdays (days 0,1,2 = Fri,Sat,Sun blocks),
        # group c always top, b middle, a lowest → perfect concordance
        rows = []
        for d in range(3):
            rows += [(d, 1, "a", 1 + d), (d, 1, "b", 10 + d),
                     (d, 1, "c", 100 + d)]
        row = friedman_test(_events7(spark, rows)).collect()[0]
        # perfect concordance: chi2_F = b·(k−1)·12/(k(k+1))·?? — use the
        # formula directly: R = (3, 6, 9), b=3, k=3
        b, k, ranks = 3.0, 3.0, [3.0, 6.0, 9.0]
        chi2 = 12.0 * sum(r * r for r in ranks) / (b * k * (k + 1)) \
            - 3.0 * b * (k + 1)
        assert row["n_blocks"] == 3 and row["n_groups"] == 3
        assert abs(row["chi2_f"] - chi2) < 1e-9
        assert abs(row["chi2_f"] - 6.0) < 1e-9  # b(k-1) for perfect

    def test_cohens_d_hand(self, spark):
        from p2_mapreduce_spark.operators.events_analytics import cohens_d

        rows = [(d, 1, "view", v) for d, v in enumerate([1, 2, 3, 4])]
        rows += [(d, 1, "click", v) for d, v in enumerate([2, 4, 6, 8])]
        row = cohens_d(_events7(spark, rows)).collect()[0]
        import statistics

        a = [100, 200, 300, 400]
        b = [200, 400, 600, 800]
        sp = (
            (3 * statistics.variance(a) + 3 * statistics.variance(b)) / 6
        ) ** 0.5
        d = (statistics.mean(a) - statistics.mean(b)) / sp
        assert row["n_a"] == 4 and row["n_b"] == 4
        assert abs(row["cohens_d"] - d) < 1e-9
        assert abs(row["mean_a"] - 2.5) < 1e-12

    def test_mcnemar_hand(self, spark):
        from p2_mapreduce_spark.operators.events_analytics import (
            mcnemar_test,
        )

        # 20-day span, midpoint day 10 (2024-03-11).  users: 1 buys in
        # both halves, 2 only first, 3 only second, 4 never
        rows = [
            (0, 1, "purchase", 1), (15, 1, "purchase", 1),
            (2, 2, "purchase", 1),
            (18, 3, "purchase", 1),
            (5, 4, "view", 1),
            (0, 5, "view", 1), (20, 5, "view", 1),  # span anchors
        ]
        row = mcnemar_test(_events7(spark, rows)).collect()[0]
        assert row["n_users"] == 5
        assert row["b_cnt"] == 1 and row["c_cnt"] == 1
        assert row["mcnemar_chi2"] == 0.0

    def test_odds_ratio_hand(self, spark):
        from p2_mapreduce_spark.operators.events_analytics import odds_ratio

        # exposed (first=view): u1 purchases, u2 doesn't;
        # unexposed: u3 purchases, u4 doesn't → a=b=c=d=1, OR=1
        rows = [
            (0, 1, "view", 1), (1, 1, "purchase", 1),
            (0, 2, "view", 1), (1, 2, "click", 1),
            (0, 3, "click", 1), (1, 3, "purchase", 1),
            (0, 4, "click", 1), (1, 4, "error", 1),
        ]
        row = odds_ratio(_events7(spark, rows)).collect()[0]
        assert (row["a"], row["b"], row["c"], row["d"]) == (1, 1, 1, 1)
        assert abs(row["odds_ratio"] - 1.0) < 1e-12

    def test_hhi_monopoly_and_uniform(self, spark):
        from p2_mapreduce_spark.operators.analytics import hhi_concentration

        li = spark.createDataFrame(
            [(1, 1, 1, 1.0, 100.0), (2, 2, 1, 1.0, 25.0),
             (3, 3, 1, 1.0, 25.0), (4, 4, 1, 1.0, 25.0),
             (5, 5, 1, 1.0, 25.0)],
            ["l_orderkey", "l_suppkey", "l_partkey", "l_quantity",
             "l_extendedprice"],
        )
        supp = spark.createDataFrame(
            [(1, "s1", 0, 0.0), (2, "s2", 0, 0.0), (3, "s3", 1, 0.0),
             (4, "s4", 1, 0.0), (5, "s5", 1, 0.0)],
            ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
        )
        nat = spark.createDataFrame(
            [(0, "MONO", 0), (1, "TRIO", 0)],
            ["n_nationkey", "n_name", "n_regionkey"],
        )
        got = {
            r["nation"]: r
            for r in hhi_concentration(li, supp, nat).collect()
        }
        # MONO: one 100 + one 25 supplier → (100²+25²)/125²
        assert abs(got["MONO"]["hhi"] - (100**2 + 25**2) / 125**2) < 1e-12
        # TRIO: three equal suppliers → HHI = 1/3, effective_n = 3
        assert abs(got["TRIO"]["hhi"] - 1 / 3) < 1e-12
        assert abs(got["TRIO"]["effective_n"] - 3.0) < 1e-12

    def test_kendall_w_perfect_and_formula(self, spark):
        from p2_mapreduce_spark.operators.analytics import kendall_w

        # suppliers with rev/qty/cnt all ranking identically (no ties)
        rows = []
        for s in range(1, 6):
            for _ in range(s):  # cnt rank == s rank
                rows.append((s, s, 1, float(s), float(s * 100)))
        li = spark.createDataFrame(
            rows,
            ["l_orderkey", "l_suppkey", "l_partkey", "l_quantity",
             "l_extendedprice"],
        )
        row = kendall_w(li).collect()[0]
        assert row["n_items"] == 5
        assert abs(row["w"] - 1.0) < 1e-12  # perfect concordance

    def test_business_day_lag_weekend_skip(self, spark):
        from p2_mapreduce_spark.operators.analytics import business_day_lag

        # 2024-03-01 is a Friday; shipping Monday 03-04 = 1 business day
        li = spark.createDataFrame(
            [(1, 1, 1, 1.0, 1.0, dt.date(2024, 3, 4)),
             (2, 2, 1, 1.0, 1.0, dt.date(2024, 3, 8)),
             (3, 3, 1, 1.0, 1.0, dt.date(2024, 3, 1))],
            ["l_orderkey", "l_suppkey", "l_partkey", "l_quantity",
             "l_extendedprice", "l_shipdate"],
        )
        orders = spark.createDataFrame(
            [(1, dt.date(2024, 3, 1)), (2, dt.date(2024, 3, 1)),
             (3, dt.date(2024, 3, 1))],
            ["o_orderkey", "o_orderdate"],
        )
        got = {
            r["bd_lag"]: r["n_items"]
            for r in business_day_lag(li, orders).collect()
        }
        assert got == {0: 1, 1: 1, 5: 1}  # same-day, Fri→Mon, Fri→Fri+1wk

    def test_cliffs_delta_extremes(self, spark):
        from p2_mapreduce_spark.operators.profile import cliffs_delta

        rows = [(i, "x" * 10, "en", "hi", 1000 + i) for i in range(5)]
        rows += [(i + 5, "y", "en", "lo", i) for i in range(5)]
        docs = spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        )
        got = {r["source"]: r["delta"] for r in cliffs_delta(docs).collect()}
        assert abs(got["hi"] - 1.0) < 1e-12  # hi dominates completely
        assert abs(got["lo"] + 1.0) < 1e-12

    def test_null_cooccurrence_lift(self, spark):
        from p2_mapreduce_spark.operators.profile import null_cooccurrence

        # discount and tax "missing" always together (lift = N/n), the
        # returnflag flag independent
        rows = []
        for i in range(8):
            miss = i < 4
            rows.append(
                (i, 1, 1, 1.0, 1.0,
                 0.0 if miss else 0.05,
                 0.0 if miss else 0.08,
                 "N" if i % 2 == 0 else "R", "O", dt.date(2024, 1, 1))
            )
        li = spark.createDataFrame(
            rows,
            ["l_orderkey", "l_suppkey", "l_partkey", "l_quantity",
             "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
             "l_linestatus", "l_shipdate"],
        )
        got = {
            (r["col_a"], r["col_b"]): r
            for r in null_cooccurrence(li).collect()
        }
        dt_pair = got[("discount", "tax")]
        assert dt_pair["n_both"] == 4 and abs(dt_pair["lift"] - 2.0) < 1e-12
        dr = got[("discount", "returnflag")]
        assert abs(dr["lift"] - 1.0) < 1e-12  # independent

    def test_burstiness_hand(self, spark):
        from p2_mapreduce_spark.operators.text_analysis import (
            text_burstiness,
        )

        # "spark" appears 3x in each of 5 docs (bursty); "the" once per
        # doc in 6 docs (flat)
        rows = [(i, "spark spark spark the", "en", "s", 1) for i in range(5)]
        rows += [(5, "the", "en", "s", 1)]
        docs = spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        )
        got = {
            r["token"]: r for r in text_burstiness(docs, min_df=5).collect()
        }
        assert got["spark"]["burst_ppm"] == 3_000_000
        assert got["the"]["burst_ppm"] == 1_000_000

    def test_harmonic_on_path(self, spark):
        from p2_mapreduce_spark.operators.graph import harmonic_centrality

        path = spark.createDataFrame(
            [(0, 20), (20, 40), (40, 60)], ["u", "v"]
        )
        got = {
            r["node"]: r for r in harmonic_centrality(path, panel_k=10).collect()
        }
        # end node 0: one 1-hop + one 2-hop → H2 = 1 + 0.5 = 1.5
        assert got[0]["h2x"] == 3 and abs(got[0]["harmonic"] - 1.5) < 1e-12
        # middle node 20: two 1-hop + one 2-hop → 2.5
        assert got[20]["h2x"] == 5


class TestG711:
    def test_formulas_match_stdlib_tables(self):
        """Both companding expansions must equal the canonical CCITT
        tables (stdlib audioop) on every one of the 256 code points."""
        import audioop

        from p2_mapreduce_spark.operators.multimodal import (
            _g711_alaw,
            _g711_ulaw,
        )

        for b in range(256):
            exp_u = int.from_bytes(
                audioop.ulaw2lin(bytes([b]), 2), "little", signed=True
            )
            exp_a = int.from_bytes(
                audioop.alaw2lin(bytes([b]), 2), "little", signed=True
            )
            assert _g711_ulaw(b) == exp_u, f"ulaw {b}"
            assert _g711_alaw(b) == exp_a, f"alaw {b}"

    def test_decode_matches_closed_form(self, spark):
        from p2_mapreduce_spark.operators.multimodal import (
            _decode_g711,
            _g711_alaw,
            _g711_ulaw,
            attach_g711,
        )

        docs = spark.createDataFrame(
            [(i, "x") for i in range(16)], ["doc_id", "text"]
        )
        for r in attach_g711(docs).collect():
            mid = r["media_id"]
            parsed = _decode_g711(bytes(r["payload"]))
            assert parsed is not None, f"id {mid} quarantined"
            codec, rate, samples = parsed
            assert rate == 8000
            assert codec == ("ulaw" if mid % 2 == 0 else "alaw")
            dec = _g711_ulaw if mid % 2 == 0 else _g711_alaw
            n = 32 + mid % 32
            exp = [dec((mid * 7 + i * 13) % 256) for i in range(n)]
            assert samples == exp, f"id {mid}"

    def test_quarantine_non_g711(self):
        from p2_mapreduce_spark.operators.multimodal import _decode_g711

        assert _decode_g711(b"") is None
        # 16-bit PCM must not decode through the G.711 kernel
        pcm = (
            b"RIFF$\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01\x00\x01\x00"
            b"\x40\x1f\x00\x00\x80>\x00\x00\x02\x00\x10\x00"
            b"data\x00\x00\x00\x00"
        )
        assert _decode_g711(pcm) is None


class TestBmpRle:
    def test_decode_matches_closed_form(self, spark):
        from p2_mapreduce_spark.operators.multimodal import (
            _decode_bmp_rle8,
            attach_bmp_rle,
        )

        docs = spark.createDataFrame(
            [(i, "x") for i in range(24)], ["doc_id", "text"]
        )
        for r in attach_bmp_rle(docs).collect():
            mid = r["media_id"]
            parsed = _decode_bmp_rle8(bytes(r["payload"]))
            assert parsed is not None, f"id {mid} quarantined"
            w, h, grid = parsed
            assert (w, h) == (8 + (mid % 4) * 4, 2 + mid % 3)
            for ys in range(h):
                c1 = (mid + 3 * ys) % 256
                c2 = (mid * 5 + 7 * ys) % 256
                if (mid + ys) % 3 == 0:
                    exp = [(mid + ys + i) % 256 for i in range(4)]
                    exp += [c2] * (w - 4)
                else:
                    exp = [c1] * (w // 2) + [c2] * (w // 2)
                # stored row ys is image row h-1-ys (bottom-up unflip)
                assert grid[h - 1 - ys] == exp, f"id {mid} row {ys}"

    def test_out_of_envelope_quarantines(self, spark):
        from p2_mapreduce_spark.operators.multimodal import (
            _decode_bmp_rle8,
            attach_bmp_rle,
        )

        docs = spark.createDataFrame([(5, "x")], ["doc_id", "text"])
        payload = bytearray(
            attach_bmp_rle(docs).collect()[0]["payload"]
        )
        assert _decode_bmp_rle8(bytes(payload)) is not None
        # delta escape (0, 2) leaves pixels undefined → gated
        bad = bytearray(payload)
        bad[1078] = 0
        bad[1079] = 2
        assert _decode_bmp_rle8(bytes(bad)) is None
        # truncated stream (no end-of-bitmap) → gated
        assert _decode_bmp_rle8(bytes(payload[:-2])) is None
        # uncompressed 24-bpp BMP must not decode through this kernel
        from p2_mapreduce_spark.operators.multimodal import attach_bmp

        plain = bytes(attach_bmp(docs).collect()[0]["payload"])
        assert _decode_bmp_rle8(plain) is None
        # run overrunning the row width → gated
        bad2 = bytearray(payload)
        bad2[1078] = 255  # first run count > w
        assert _decode_bmp_rle8(bytes(bad2)) is None


class TestRound7Batch2:
    def test_ljung_box_white_vs_trending(self, spark):
        """A strongly trending series must score a far larger Q than
        an alternating one, and Q must equal the hand fold."""
        from p2_mapreduce_spark.operators.timeseries import (
            acf_lags,
            ljung_box,
        )

        rows = [(d, 1, "a", (d + 1) * 10) for d in range(30)]
        ev = _events7(spark, rows)
        row = ljung_box(ev).collect()[0]
        acf = {
            r["lag"]: r["acf"] for r in acf_lags(ev).collect()
        }
        n = row["n_days"]
        s = 0.0
        for lag in sorted(acf):
            s += (acf[lag] * acf[lag]) / (n - lag)
        assert abs(row["q_lb"] - n * (n + 2.0) * s) < 1e-9
        assert row["q_lb"] > 50.0  # trending → large Q

    def test_seasonal_mk_blocks_out_weekly_cycle(self, spark):
        """A pure weekly cycle (no drift) has S = 0 in the seasonal
        test; adding a drift makes S strongly positive."""
        from p2_mapreduce_spark.operators.timeseries import (
            seasonal_mann_kendall,
        )

        cyc = [(d, 1, "a", 10 + (d % 7)) for d in range(28)]
        r0 = seasonal_mann_kendall(_events7(spark, cyc)).collect()[0]
        assert r0["s_stat"] == 0 and r0["z"] == 0.0
        drift = [(d, 1, "a", 10 + (d % 7) + d) for d in range(28)]
        r1 = seasonal_mann_kendall(_events7(spark, drift)).collect()[0]
        # 7 weekday subseries x C(4,2)=6 pairs, all rising → S = 42
        assert r1["s_stat"] == 42 and r1["z"] > 0.0
        assert r1["n_days"] == 28

    def test_cochran_q_hand(self, spark):
        from p2_mapreduce_spark.operators.events_analytics import cochran_q

        # users 1-4; types a (all 4), b (2 users), c (1 user)
        rows = [(0, u, "a", 1) for u in (1, 2, 3, 4)]
        rows += [(1, u, "b", 1) for u in (1, 2)]
        rows += [(2, 1, "c", 1)]
        row = cochran_q(_events7(spark, rows)).collect()[0]
        k, cjs = 3, [4, 2, 1]
        ris = [3, 2, 1, 1]
        num = k * sum(c * c for c in cjs) - sum(cjs) ** 2
        den = k * sum(ris) - sum(r * r for r in ris)
        assert row["n_users"] == 4 and row["k_types"] == 3
        assert abs(row["q_stat"] - (k - 1) * num / den) < 1e-12

    def test_price_index_pure_inflation(self, spark):
        """Doubling every price month-over-month with constant
        quantities gives L = P = Fisher = 2 exactly."""
        from p2_mapreduce_spark.operators.analytics import price_index

        rows = []
        for month, mult in ((1, 1), (2, 2)):
            for part in (1, 2, 3):
                rows.append(
                    (part * 10 + month, part, part, 1, 5.0,
                     float(part * mult * 10), 0.0, 0.0, "N", "O",
                     dt.date(2024, month, 15))
                )
        li = spark.createDataFrame(
            rows,
            ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
             "l_quantity", "l_extendedprice", "l_discount", "l_tax",
             "l_returnflag", "l_linestatus", "l_shipdate"],
        )
        got = {r["month"]: r for r in price_index(li).collect()}
        assert abs(got["2024-01"]["laspeyres"] - 1.0) < 1e-12
        assert abs(got["2024-02"]["laspeyres"] - 2.0) < 1e-12
        assert abs(got["2024-02"]["paasche"] - 2.0) < 1e-12
        assert abs(got["2024-02"]["fisher"] - 2.0) < 1e-12


def _gif_lzw_encode(indices, min_code_size):
    """Spec-faithful GIF LZW encoder (test-side reference): giflib
    per-code width rule, clear prologue, EOI epilogue, LSB packing —
    the generator that produced the _GIF_VARIANTS constants."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_codes = [(clear, min_code_size + 1)]
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    running = eoi + 1
    width = min_code_size + 1

    def emit(code):
        nonlocal running, width
        out_codes.append((code, width))
        running += 1
        if running > (1 << width) and width < 12:
            width += 1

    cur = ()
    for px in indices:
        cand = cur + (px,)
        if cand in table:
            cur = cand
        else:
            emit(table[cur])
            if next_code < 4096:
                table[cand] = next_code
                next_code += 1
            cur = (px,)
    emit(table[cur])
    out_codes.append((eoi, width))
    acc, nbits, out = 0, 0, bytearray()
    for c, w in out_codes:
        acc |= c << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


class TestGif:
    def test_variant_streams_are_true_lzw_of_patterns(self):
        """The embedded _GIF_VARIANTS streams must be exactly the LZW
        encoding of the documented index patterns (regenerated here by
        the reference encoder) and must decode back pixel-exact."""
        from p2_mapreduce_spark.operators.multimodal import (
            _GIF_VARIANTS,
            _lzw_decode_gif,
        )

        for v, (w, h, counts, lzw_hex) in enumerate(_GIF_VARIANTS):
            pat = []
            for y in range(h):
                pat += (
                    [0, 0, 0]
                    + [(x + y) % 4 for x in range(w - 6)]
                    + [1, 0, 1]
                )
            assert _gif_lzw_encode(pat, 2).hex() == lzw_hex, v
            assert _lzw_decode_gif(bytes.fromhex(lzw_hex), 2) == pat, v
            for i in range(4):
                assert counts[i] == pat.count(i), (v, i)

    def test_lzw_roundtrip_stress(self):
        """Randomized repeat-heavy sequences roundtrip through the
        width-growth / dictionary / KwKwK machinery."""
        import random

        from p2_mapreduce_spark.operators.multimodal import (
            _lzw_decode_gif,
        )

        rng = random.Random(7)
        for trial in range(30):
            n = rng.randrange(5, 400)
            seq = [rng.randrange(4) for _ in range(n)]
            for _ in range(n // 4):
                i = rng.randrange(max(1, n - 8))
                seq[i : i + 4] = seq[max(0, i - 4) : max(0, i - 4) + 4]
            enc = _gif_lzw_encode(seq, 2)
            assert _lzw_decode_gif(enc, 2) == seq, trial
        # KwKwK on a leading run
        assert _lzw_decode_gif(
            _gif_lzw_encode([1, 1, 1, 1, 1], 2), 2
        ) == [1, 1, 1, 1, 1]

    def test_decode_matches_closed_form(self, spark):
        from p2_mapreduce_spark.operators.multimodal import (
            _GIF_VARIANTS,
            _decode_gif,
            attach_gif,
        )

        docs = spark.createDataFrame(
            [(i, "x") for i in range(16)], ["doc_id", "text"]
        )
        for r in attach_gif(docs).collect():
            mid = r["media_id"]
            parsed = _decode_gif(bytes(r["payload"]))
            assert parsed is not None, f"id {mid} quarantined"
            w, h, grid = parsed
            vw, vh, counts, _ = _GIF_VARIANTS[mid % 4]
            assert (w, h) == (vw, vh)
            grays = [(mid * 11 + 37 * i) % 256 for i in range(4)]
            got = sum(v for row in grid for v in row)
            assert got == sum(c * g for c, g in zip(counts, grays))

    def test_out_of_envelope_quarantines(self, spark):
        from p2_mapreduce_spark.operators.multimodal import (
            _decode_gif,
            attach_gif,
        )

        docs = spark.createDataFrame([(5, "x")], ["doc_id", "text"])
        payload = bytearray(attach_gif(docs).collect()[0]["payload"])
        assert _decode_gif(bytes(payload)) is not None
        assert _decode_gif(b"") is None
        assert _decode_gif(b"GIF87a") is None
        # interlace flag on the image descriptor → gated
        bad = bytearray(payload)
        desc_at = 13 + 12  # header+LSD + 4-entry palette
        assert bad[desc_at] == 0x2C
        bad[desc_at + 9] |= 0x40
        assert _decode_gif(bytes(bad)) is None
        # non-gray palette → gated
        bad2 = bytearray(payload)
        bad2[13] = (bad2[13] + 1) % 256
        assert _decode_gif(bytes(bad2)) is None
        # truncated LZW stream → gated
        assert _decode_gif(bytes(payload[:-4])) is None


class TestAbsolutePanels:
    def test_two_hop_panel_is_partition_invariant(self, spark):
        """The md5-ranked top-K node panel (and so the whole reach
        report) must be identical under any input partitioning — the
        property that makes the absolute panel deterministic at any
        cluster layout."""
        from p2_mapreduce_spark.operators.graph import two_hop_reach

        edges = [(i, (i * 7) % 40) for i in range(40)]
        one = spark.createDataFrame(edges, ["u", "v"]).coalesce(1)
        many = spark.createDataFrame(edges, ["u", "v"]).repartition(13)
        a = sorted(map(tuple, two_hop_reach(one, panel_k=9).collect()))
        b = sorted(map(tuple, two_hop_reach(many, panel_k=9).collect()))
        assert a == b and len(a) == 9

    def test_harmonic_consistent_with_reach(self, spark):
        """h2x must equal 2·n_1hop + n_2hop_new row-for-row (the
        doubled-exact contract)."""
        from p2_mapreduce_spark.operators.graph import harmonic_centrality

        edges = spark.createDataFrame(
            [(i, (i * 3) % 20) for i in range(20)], ["u", "v"]
        )
        for r in harmonic_centrality(edges, panel_k=8).collect():
            assert r["h2x"] == 2 * r["n_1hop"] + r["n_2hop_new"]
            assert abs(r["harmonic"] - r["h2x"] / 2.0) < 1e-15


class TestRound7Batch3:
    def test_theta_on_perfect_line(self, spark):
        """On an exact line the θ=2 residual line IS the series, and
        the forecast averages SES with the next trend point."""
        from p2_mapreduce_spark.operators.timeseries import theta_forecast

        rows = [(d, 1, "a", (d + 1) * 10) for d in range(4)]
        row = theta_forecast(_events7(spark, rows)).collect()[0]
        # cents line 1000+1000x: z = y; SES(1/2): 1000, 1500, 2250,
        # 3125; forecast = .5*(3125 + 5000) = 4062.5 cents
        assert row["n_days"] == 4
        assert abs(row["slope"] - 10.0) < 1e-9
        assert abs(row["ses_theta2"] - 31.25) < 1e-9
        assert abs(row["forecast1"] - 40.625) < 1e-9

    def test_theta_drops_degenerate_groups(self, spark):
        from p2_mapreduce_spark.operators.timeseries import theta_forecast

        one_day = _events7(spark, [(0, 1, "only", 5)])
        assert theta_forecast(one_day).count() == 0

    def test_fleiss_perfect_and_formula(self, spark):
        """All raters agreeing on every doc gives kappa = 1; a hand
        fixture checks the exact formula."""
        from p2_mapreduce_spark.operators.text_analysis import fleiss_kappa

        # perfect agreement over TWO classes (all-one-category is the
        # p_e = 1 degenerate, where kappa is defined as 0): tiny docs
        # rate short on all three measures, long docs long on all three
        long_text = " ".join(f"word{i}" for i in range(200))
        rows = [(i, "tiny words here") for i in range(3)]
        rows += [(i + 3, long_text) for i in range(3)]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        r = fleiss_kappa(docs).collect()[0]
        assert abs(r["p_bar"] - 1.0) < 1e-12
        assert abs(r["p_e"] - 0.5) < 1e-12
        assert abs(r["fleiss_kappa"] - 1.0) < 1e-12
        # the all-one-category degenerate: kappa surfaced as 0
        uni = spark.createDataFrame(
            [(i, "tiny words here") for i in range(4)],
            ["doc_id", "text"],
        )
        r0 = fleiss_kappa(uni).collect()[0]
        assert abs(r0["p_bar"] - 1.0) < 1e-12
        assert r0["fleiss_kappa"] == 0.0

    def test_y4m_decode_matches_closed_form(self, spark):
        from p2_mapreduce_spark.operators.multimodal import (
            _decode_y4m,
            attach_y4m,
        )

        docs = spark.createDataFrame(
            [(i, "x") for i in range(12)], ["doc_id", "text"]
        )
        for r in attach_y4m(docs).collect():
            mid = r["media_id"]
            parsed = _decode_y4m(bytes(r["payload"]))
            assert parsed is not None, f"id {mid}"
            w, h, fn, fd, frames = parsed
            assert (w, h, fn, fd) == (
                4 + 2 * (mid % 3), 2 + 2 * (mid % 2), 25, 1
            )
            assert len(frames) == 1 + mid % 3
            for f, (sy, su, sv) in enumerate(frames):
                assert sy == sum(
                    (mid * 13 + f * 17 + i * 7) % 256
                    for i in range(w * h)
                )
                assert su == sum(
                    (mid * 5 + f * 11 + i * 3) % 256
                    for i in range((w // 2) * (h // 2))
                )

    def test_y4m_out_of_envelope_quarantines(self, spark):
        from p2_mapreduce_spark.operators.multimodal import (
            _decode_y4m,
            attach_y4m,
        )

        docs = spark.createDataFrame([(5, "x")], ["doc_id", "text"])
        payload = bytes(attach_y4m(docs).collect()[0]["payload"])
        assert _decode_y4m(payload) is not None
        assert _decode_y4m(b"") is None
        # interlaced stream → gated
        assert _decode_y4m(payload.replace(b" Ip ", b" It ", 1)) is None
        # non-4:2:0 chroma → gated
        assert _decode_y4m(payload.replace(b"C420", b"C444", 1)) is None
        # truncated frame → gated
        assert _decode_y4m(payload[:-3]) is None


def test_tsb_and_ph_answer_from_stream_state(spark, sf_dir, tmp_path):
    """The round-7 forecasters/monitors answer FROM the maintained
    day-grain stream state bit-for-bit equal to their batch twins
    (the croston_from_state contract extended)."""
    from p2_mapreduce_spark.operators.timeseries import (
        page_hinkley,
        tsb_forecast,
    )
    from p2_mapreduce_spark.session import load_table
    from p2_mapreduce_spark.streaming.sinks import (
        daily_cents_state_sink,
        load_latest_state,
        page_hinkley_from_state,
        tsb_from_state,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    src = str(tmp_path / "events_src_r7")
    events.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    state_path = str(tmp_path / "r7_state")
    q = daily_cents_state_sink(stream, state_path, str(tmp_path / "ck_r7"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    state = load_latest_state(spark, state_path)
    full = load_table(spark, sf_dir, "events")
    assert sorted(map(tuple, tsb_from_state(state).collect())) == sorted(
        map(tuple, tsb_forecast(full).collect())
    )
    assert sorted(
        map(tuple, page_hinkley_from_state(state).collect())
    ) == sorted(map(tuple, page_hinkley(full).collect()))


def test_round7_stats_ops_tolerate_empty_inputs(spark):
    """Every round-7 report emits ZERO rows on empty input (the
    round-6 ADVICE discipline, applied up front)."""
    from p2_mapreduce_spark.operators.analytics import (
        business_day_lag,
        hhi_concentration,
        kendall_w,
        price_index,
    )
    from p2_mapreduce_spark.operators.events_analytics import (
        cochran_q,
        cohens_d,
        mcnemar_test,
        odds_ratio,
    )
    from p2_mapreduce_spark.operators.profile import (
        cliffs_delta,
        null_cooccurrence,
    )
    from p2_mapreduce_spark.operators.text_analysis import (
        fleiss_kappa,
        text_burstiness,
    )
    from p2_mapreduce_spark.operators.timeseries import (
        durbin_watson,
        friedman_test,
        ljung_box,
        page_hinkley,
        pettitt_test,
        seasonal_mann_kendall,
        theta_forecast,
        tsb_forecast,
    )

    ev = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    for op in (
        durbin_watson, pettitt_test, tsb_forecast, page_hinkley,
        friedman_test, ljung_box, seasonal_mann_kendall, theta_forecast,
        cochran_q, cohens_d, mcnemar_test, odds_ratio,
    ):
        assert op(ev).count() == 0, op.__name__
    li = spark.createDataFrame(
        [],
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    )
    orders = spark.createDataFrame(
        [], "o_orderkey long, o_orderdate timestamp"
    )
    supp = spark.createDataFrame(
        [], "s_suppkey long, s_name string, s_nationkey int,"
        " s_acctbal double"
    )
    nat = spark.createDataFrame(
        [], "n_nationkey int, n_name string, n_regionkey int"
    )
    assert hhi_concentration(li, supp, nat).count() == 0
    assert kendall_w(li).count() == 0
    assert business_day_lag(li, orders).count() == 0
    assert price_index(li).count() == 0
    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    assert cliffs_delta(docs).count() == 0
    assert text_burstiness(docs).count() == 0
    assert fleiss_kappa(docs).count() == 0
    # null_cooccurrence's 3-pair report stays shaped on empty input
    # (counts zero, lift 0.0) — a profile table, not a test statistic
    assert null_cooccurrence(li).count() == 3


def test_binary_segmentation_two_shifts(spark):
    """A series with two level shifts: the top split lands on the
    larger one and each side's secondary argmax is reported."""
    from p2_mapreduce_spark.operators.timeseries import binary_segmentation

    vals = [10] * 6 + [100] * 6 + [200] * 6  # shifts after d5 and d11
    ev = _events7(spark, [(d, 1, "a", v) for d, v in enumerate(vals)])
    got = {
        r["segment"]: r for r in binary_segmentation(ev).collect()
    }
    assert set(got) == {"all", "left", "right"}
    assert got["all"]["n_days"] == 18
    # the global CUSUM peaks at the larger (first-vs-rest) imbalance
    cp1 = got["all"]["change_day"]
    assert cp1 in {"2024-03-06", "2024-03-11", "2024-03-12"}
    # each side finds an interior candidate strictly inside its range
    assert got["left"]["change_day"] <= cp1
    assert got["right"]["change_day"] > cp1
    assert got["left"]["n_days"] + got["right"]["n_days"] == 18
    # 1-day series → no rows (no interior change point)
    one = _events7(spark, [(0, 1, "a", 5)])
    assert binary_segmentation(one).count() == 0
