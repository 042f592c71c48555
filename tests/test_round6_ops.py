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

    def test_lpc_and_stereo_gated(self, spark):
        """An LPC subframe type or a decorrelated-stereo channel code
        quarantines instead of mis-decoding."""
        from p2_mapreduce_spark.operators.multimodal import (
            _crc8_flac,
            _decode_flac,
            attach_flac,
        )

        docs = spark.createDataFrame([(2, "x")], ["doc_id", "text"])
        payload = bytearray(attach_flac(docs).collect()[0]["payload"])
        frame_start = 42
        # channel code 8 (left/side) in frame-header byte 3 → gated
        # even with the CRC-8 recomputed to match
        bad = bytearray(payload)
        bad[frame_start + 3] = (8 << 4) | (bad[frame_start + 3] & 0x0F)
        bad[frame_start + 6] = _crc8_flac(
            bytes(bad[frame_start : frame_start + 6])
        )
        assert _decode_flac(bytes(bad)) is None
        # subframe type bits 100000 (LPC order 1) → gated: rewrite the
        # subframe header byte (pad 0 + 100000 + wasted 0 = 0x40)
        bad2 = bytearray(payload)
        bad2[frame_start + 7] = 0x40
        assert _decode_flac(bytes(bad2)) is None
