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
