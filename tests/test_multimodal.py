"""Multimodal plumbing tests: the decode path's Spark-side contract
(schema, Arrow batching, determinism) is real even though the codec is a
stub."""

import pytest
from pyspark.sql import functions as F

from p2_mapreduce_spark.operators.multimodal import (
    attach_binary,
    decode_media,
    frame_sample,
)
from p2_mapreduce_spark.session import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return attach_binary(docs, modality="image")


def test_attach_binary_schema_and_meta(spark, media):
    row = media.first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["meta"]["byte_len"] == len(row["payload"])
    assert len(row["meta"]["sha256"]) == 64


def test_decode_fake_deterministic(spark, media):
    a = sorted(map(tuple, decode_media(media, "fake").collect()))
    b = sorted(map(tuple, decode_media(media.repartition(5), "fake").collect()))
    assert a == b
    for r in decode_media(media, "fake").collect():
        assert r["width"] >= 16 and r["height"] >= 16
        assert r["n_frames"] == 1  # images


def test_decode_none_raises(spark, media):
    with pytest.raises(NotImplementedError):
        decode_media(media, "none")


def test_decode_unknown_decoder(spark, media):
    with pytest.raises(ValueError):
        decode_media(media, "pillow")


def test_frame_sample_video(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    vids = decode_media(attach_binary(docs, modality="video"), "fake")
    frames = frame_sample(vids, every_n=8)
    joined = frames.join(vids, "media_id").collect()
    assert len(joined) > 0
    for r in joined:
        assert 0 <= r["frame_idx"] < r["n_frames"]
        assert r["frame_idx"] % 8 == 0


def test_resize_caps_long_side_and_keeps_aspect(spark, media):
    from p2_mapreduce_spark.operators.multimodal import resize_media

    src = {r["media_id"]: r for r in decode_media(media, "fake").collect()}
    out = resize_media(media, max_side=32).collect()
    assert len(out) == len(src)
    for r in out:
        s = src[r["media_id"]]
        assert 1 <= r["width"] <= 32 and 1 <= r["height"] <= 32
        # aspect preserved under integer floor scaling
        if max(s["width"], s["height"]) > 32:
            assert r["width"] == s["width"] * 32 // max(s["width"], s["height"])
            assert r["height"] == s["height"] * 32 // max(s["width"], s["height"])
        else:
            assert (r["width"], r["height"]) == (s["width"], s["height"])
        assert isinstance(r["payload"], (bytes, bytearray)) and len(r["payload"]) == 32


def test_resize_deterministic_and_gated(spark, media):
    from p2_mapreduce_spark.operators.multimodal import resize_media

    a = sorted(map(tuple, resize_media(media, 24).collect()))
    b = sorted(map(tuple, resize_media(media.repartition(7), 24).collect()))
    assert a == b
    with pytest.raises(NotImplementedError):
        resize_media(media, 24, decoder="none")


def _make_png(w: int, h: int) -> bytes:
    """Minimal spec-valid PNG: signature + IHDR + 1 IDAT + IEND, real
    CRCs, zlib-compressed scanlines."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + b"\x7f" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _make_jpeg(w: int, h: int) -> bytes:
    """Minimal JPEG marker stream through SOF0 (enough for any header
    scanner): SOI + APP0/JFIF + SOF0 carrying the dimensions."""
    import struct

    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
        + b"\xff\xd9"
    )


def test_headers_decoder_reads_real_png_and_jpeg(spark):
    from p2_mapreduce_spark.operators.multimodal import decode_media

    rows = [
        (1, "image", _make_png(320, 200)),
        (2, "image", _make_jpeg(640, 480)),
        (3, "image", b"not an image at all"),
        (4, "image", None),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, payload binary"
    )
    got = {r["media_id"]: r for r in decode_media(media, decoder="headers").collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_frames"]) == (320, 200, 1)
    assert (got[2]["width"], got[2]["height"], got[2]["n_frames"]) == (640, 480, 1)
    # corrupt / null payloads quarantine as 0x0 rather than failing the batch
    assert (got[3]["width"], got[3]["height"], got[3]["n_frames"]) == (0, 0, 0)
    assert (got[4]["width"], got[4]["height"], got[4]["n_frames"]) == (0, 0, 0)
    # feature hash stays the payload digest (stable content fingerprint)
    import hashlib

    d = hashlib.sha256(_make_png(320, 200)).digest()
    assert got[1]["feature_hash"] == int.from_bytes(d[4:12], "big", signed=True)


def test_headers_decoder_pure_parsers():
    """Parser unit coverage without Spark: odd-but-valid streams."""
    from p2_mapreduce_spark.operators.multimodal import _parse_jpeg, _parse_png

    assert _parse_png(_make_png(1, 1)) == (1, 1)
    assert _parse_png(b"\x89PNG\r\n\x1a\n" + b"x" * 8) is None  # truncated
    assert _parse_jpeg(_make_jpeg(65535, 1)) == (65535, 1)
    # SOF behind a fill byte and a restart marker
    import struct

    sof0 = struct.pack(">BHHB", 8, 7, 9, 1) + b"\x01\x11\x00"
    weird = (
        b"\xff\xd8" + b"\xff\xff" + b"\xff\xd0"
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
    )
    assert _parse_jpeg(weird) == (9, 7)
    assert _parse_jpeg(b"\xff\xd8\x00\x00") is None


def test_attach_png_payloads_are_valid_png_prologues(spark, sf_dir):
    """The JVM-built bytes must round-trip through the REAL IHDR parser
    — and through Python's own int.from_bytes as an independent check."""
    from p2_mapreduce_spark.operators.multimodal import (
        attach_png,
        decode_media,
    )
    from p2_mapreduce_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = attach_png(docs)
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    for mid, b in payloads.items():
        assert b[:8] == b"\x89PNG\r\n\x1a\n"
        assert b[12:16] == b"IHDR"
        assert int.from_bytes(b[16:20], "big") == 16 + mid % 64
        assert int.from_bytes(b[20:24], "big") == 16 + (mid * 7) % 64
    got = {r.media_id: (r.width, r.height)
           for r in decode_media(media, decoder="headers").collect()}
    for mid in payloads:
        assert got[mid] == (16 + mid % 64, 16 + (mid * 7) % 64)


class TestVideoAudioCodecs:
    """Real demux/parse kernels: frame walk by self-declared length,
    RIFF chunk walk, and quarantine on truncation/corruption."""

    def test_video_demux_counts_and_sampling(self, spark):
        from p2_mapreduce_spark.operators.multimodal import (
            attach_bmp_video,
            video_frame_stats,
        )

        docs = spark.createDataFrame(
            [(i, "x") for i in range(20)], ["doc_id", "text"]
        )
        media = attach_bmp_video(docs)
        got = {}
        for r in video_frame_stats(media, every_n=2).collect():
            got.setdefault(r["media_id"], []).append(r["frame_idx"])
        for mid in range(20):
            nf = 2 + mid % 8
            assert sorted(got[mid]) == list(range(0, nf, 2)), mid

    def test_video_frame_pixels_match_formula(self, spark):
        from p2_mapreduce_spark.operators.multimodal import (
            attach_bmp_video,
            video_frame_stats,
        )

        docs = spark.createDataFrame([(7, "x")], ["doc_id", "text"])
        rows = video_frame_stats(attach_bmp_video(docs), every_n=1).collect()
        w, h, base = 4 + 7 % 9, 4 + 21 % 9, (7 % 16) * 3
        tri = 5 * h * (w * (w - 1) // 2) + 4 * w * (h * (h - 1) // 2)
        assert len(rows) == 2 + 7 % 8
        for r in rows:
            f = r["frame_idx"]
            assert (r["width"], r["height"]) == (w, h)
            assert r["sum_b"] == w * h * (base + 2 * f) + tri
            assert r["sum_g"] == w * h * (base + 2 * f + 7) + tri
            assert r["sum_r"] == w * h * (base + 2 * f + 14) + tri

    def test_video_truncated_tail_quarantines(self, spark):
        from pyspark.sql import functions as F

        from p2_mapreduce_spark.operators.multimodal import (
            attach_bmp_video,
            video_frame_stats,
        )

        docs = spark.createDataFrame([(4, "x")], ["doc_id", "text"])
        media = attach_bmp_video(docs)
        full = video_frame_stats(media, every_n=1).count()
        # chop 10 bytes off the stream: the LAST frame is truncated and
        # must be dropped; earlier frames still decode
        clipped = media.select(
            "media_id",
            F.expr("substring(payload, 1, length(payload) - 10)").alias(
                "payload"
            ),
        )
        part = video_frame_stats(clipped, every_n=1).count()
        assert part == full - 1 > 0

    def test_wav_roundtrip_and_chunk_walk(self, spark):
        from p2_mapreduce_spark.operators.multimodal import (
            attach_wav,
            audio_stats,
        )

        docs = spark.createDataFrame([(5, "x")], ["doc_id", "text"])
        r = audio_stats(attach_wav(docs)).collect()[0]
        n, rate = 64 + 5 % 64, 8000 + (5 % 3) * 4000
        samples = [((5 * 31 + i * 7) % 4096) - 2048 for i in range(n)]
        assert r["sample_rate"] == rate and r["n_samples"] == n
        assert r["duration_ms"] == n * 1000 // rate
        assert r["sum_amp"] == sum(samples)
        assert r["peak_amp"] == max(abs(s) for s in samples)

    def test_wav_parser_skips_interleaved_chunks(self, spark):
        import pandas as pd

        from p2_mapreduce_spark.operators.multimodal import audio_stats

        # hand-build a WAV with a LIST chunk BETWEEN fmt and data — the
        # chunk walk must skip it (a naive fixed-offset parse breaks)
        rate, samples = 8000, [100, -100, 32000, -32768]
        data = b"".join(
            (s + 65536 if s < 0 else s).to_bytes(2, "little") for s in samples
        )
        fmt = (
            (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
            + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        )
        lst = b"INFOjunk"  # odd-size payloads also test word alignment
        body = (
            b"fmt " + (16).to_bytes(4, "little") + fmt
            + b"LIST" + (7).to_bytes(4, "little") + lst[:7] + b"\x00"
            + b"data" + len(data).to_bytes(4, "little") + data
        )
        wav = b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body
        df = spark.createDataFrame(
            pd.DataFrame({"media_id": [1], "payload": [wav]})
        )
        r = audio_stats(df).collect()[0]
        assert r["n_samples"] == 4 and r["peak_amp"] == 32768
        assert r["sum_amp"] == 100 - 100 + 32000 - 32768
        # corrupt magic quarantines as the zero row
        df2 = spark.createDataFrame(
            pd.DataFrame({"media_id": [2], "payload": [b"JUNK" + wav[4:]]})
        )
        r2 = audio_stats(df2).collect()[0]
        assert tuple(r2)[1:] == (0, 0, 0, 0, 0)


class TestPhashNearDup:
    def test_identical_payloads_pair_at_hamming_zero(self, spark):
        import pandas as pd

        from p2_mapreduce_spark.operators.multimodal import phash_near_pairs

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "media_id": [1, 2, 3],
                    "payload": [b"same-bytes", b"same-bytes", b"other"],
                }
            )
        )
        rows = sorted(map(tuple, phash_near_pairs(df).collect()))
        assert rows == [(1, 2, 0)]

    def test_band_guarantee_on_crafted_fingerprints(self, spark):
        """Pigeonhole contract of the shared banding engine: ≤3 flipped
        bits are ALWAYS caught (≥1 of 4 bands untouched); 4 flips spread
        one-per-band are the documented recall boundary (missed), while
        4 flips inside one band stay caught."""
        from p2_mapreduce_spark.operators.dedup import banded_hamming_pairs

        base = 0b10110100_01011010_11001100_00110101
        flip3 = base ^ 0b111  # 3 flips, all in band 0
        spread4 = base ^ ((1 << 0) | (1 << 8) | (1 << 16) | (1 << 24))
        inband4 = base ^ 0b1111
        fps = spark.createDataFrame(
            [(1, base), (2, flip3), (3, spread4), (4, inband4)],
            "id long, fp long",
        )
        got = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in banded_hamming_pairs(
                fps, "fp", "id", bits=32, max_hamming=4
            ).collect()
        }
        assert got[(1, 2)] == 3
        assert got[(1, 4)] == 4  # 4 flips in one band: other bands match
        assert (1, 3) not in got  # one flip per band: no band survives


class TestPngCodec:
    def _build_png(self, pixels, filters):
        """Hand-build a PNG with REAL deflate (zlib.compress) and a
        chosen filter per scanline — the encoder the attach path does
        NOT use, proving the decoder handles genuine compressed input
        and the full filter algebra, not just its own stored blocks."""
        import struct
        import zlib

        h, w = len(pixels), len(pixels[0])
        raw = bytearray()
        prev = bytes(3 * w)
        for y, flt in zip(range(h), filters):
            line = bytes(v for px in pixels[y] for v in px)
            enc = bytearray(line)
            if flt == 1:
                for i in range(3 * w - 1, 2, -1):
                    enc[i] = (enc[i] - line[i - 3]) & 0xFF
            elif flt == 2:
                for i in range(3 * w):
                    enc[i] = (enc[i] - prev[i]) & 0xFF
            elif flt == 3:
                for i in range(3 * w):
                    a = line[i - 3] if i >= 3 else 0
                    enc[i] = (enc[i] - (a + prev[i]) // 2) & 0xFF
            elif flt == 4:
                for i in range(3 * w):
                    a = line[i - 3] if i >= 3 else 0
                    c = prev[i - 3] if i >= 3 else 0
                    p = a + prev[i] - c
                    pa, pb, pc = abs(p - a), abs(p - prev[i]), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (
                        prev[i] if pb <= pc else c
                    )
                    enc[i] = (enc[i] - pred) & 0xFF
            raw += bytes([flt]) + bytes(enc)
            prev = line

        def chunk(typ, data):
            return (
                struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    def test_decoder_reconstructs_all_five_filters(self):
        from p2_mapreduce_spark.operators.multimodal import _decode_png

        pixels = [
            [(y * 40 + x * 11 + c * 3 for c in range(3)) for x in range(4)]
            for y in range(5)
        ]
        pixels = [[tuple(px) for px in row] for row in pixels]
        png = self._build_png(pixels, filters=[0, 1, 2, 3, 4])
        got = _decode_png(png)
        assert got is not None
        w, h, grid = got
        assert (w, h) == (4, 5)
        assert grid == pixels

    def test_corrupt_crc_and_junk_quarantine(self):
        from p2_mapreduce_spark.operators.multimodal import _decode_png

        pixels = [[(1, 2, 3), (4, 5, 6)]]
        png = bytearray(self._build_png(pixels, filters=[0]))
        assert _decode_png(bytes(png)) is not None
        png[20] ^= 0xFF  # flip a bit inside IHDR: CRC must now reject
        assert _decode_png(bytes(png)) is None
        assert _decode_png(b"not a png") is None
        assert _decode_png(b"") is None

    def test_attach_payloads_roundtrip_the_formula(self, spark):
        from p2_mapreduce_spark.operators.multimodal import (
            _decode_png,
            attach_png_rgb,
        )

        docs = spark.createDataFrame(
            [(i, "x") for i in (0, 3, 7, 12)], "doc_id long, text string"
        )
        for r in attach_png_rgb(docs).collect():
            w, h, grid = _decode_png(bytes(r["payload"]))
            i = r["media_id"]
            assert (w, h) == (4 + i % 9, 4 + (i * 3) % 9)
            base = (i % 16) * 3
            for y in range(h):
                for x in range(w):
                    assert grid[y][x] == (
                        base + 5 * x + 4 * y,
                        base + 5 * x + 4 * y + 7,
                        base + 5 * x + 4 * y + 14,
                    )


class TestRealMixedDecode:
    """decoder='real' — the flagship mixed-corpus decode: every branch
    does genuine byte work and quarantines garbage."""

    def test_real_kernel_every_branch(self, spark):
        from p2_mapreduce_spark.operators.multimodal import (
            attach_real_mixed,
            decode_media,
        )

        docs = spark.createDataFrame(
            [(i, "x") for i in range(9)], "doc_id long, text string"
        )
        rows = {
            r["media_id"]: r
            for r in decode_media(
                attach_real_mixed(docs), decoder="real"
            ).collect()
        }
        assert len(rows) == 9
        for i, r in rows.items():
            if i % 3 == 0:  # image: real BMP decode
                w, h = 4 + i % 9, 4 + (i * 3) % 9
                base = (i % 16) * 3
                assert (r["modality"], r["width"], r["height"]) == (
                    "image", w, h,
                )
                assert r["n_frames"] == 1 and r["sample_rate"] == 0
                sum_b = (
                    w * h * base
                    + 5 * h * (w * (w - 1) // 2)
                    + 4 * w * (h * (h - 1) // 2)
                )
                assert r["feature_hash"] == 3 * sum_b + 21 * w * h
            elif i % 3 == 1:  # audio: real PCM sample sum
                n = 64 + i % 64
                assert (r["modality"], r["width"], r["n_frames"]) == (
                    "audio", 0, 0,
                )
                assert r["sample_rate"] == 8000 + (i % 3) * 4000
                assert r["feature_hash"] == sum(
                    ((i * 31 + j * 7) % 4096) - 2048 for j in range(n)
                )
            else:  # video: real MJPEG demux counts every frame
                assert r["modality"] == "video"
                assert r["n_frames"] == 2 + i % 8
                assert r["width"] == 8 * (1 + i % 2)
                assert r["height"] == 8 * (1 + (i % 4) // 2)

    def test_real_kernel_quarantines_garbage(self, spark):
        from p2_mapreduce_spark.operators.multimodal import decode_media

        junk = spark.createDataFrame(
            [
                (1, "image", bytearray(b"not a bmp")),
                (2, "audio", bytearray(b"RIFFxxxx")),
                (3, "video", bytearray(b"")),
            ],
            "media_id long, modality string, payload binary",
        )
        rows = decode_media(junk, decoder="real").collect()
        assert all(
            (r["width"], r["n_frames"], r["sample_rate"], r["feature_hash"])
            == (0, 0, 0, 0)
            for r in rows
        )


class TestJpegCodec:
    """Real baseline-JPEG grayscale decoder: canonical Huffman, DPCM,
    EXTEND, dequant, de-zigzag, IDCT, stuffing, clamping, quarantine."""

    @staticmethod
    def _headers(wb, hb, ac_bits_syms=None):
        """Spec-valid grayscale baseline headers as hex.  Default AC
        table is the builder's single-EOB table; pass (bits, syms) hex
        to override."""
        hx = "ffd8"
        hx += "ffdb" + "0043" + "00" + "08" + "01" * 63
        hx += ("ffc4" + "001b" + "00" + "00000701" + "00" * 12
               + "0001020304050607")
        if ac_bits_syms is None:
            hx += "ffc4" + "0014" + "10" + "01" + "00" * 15 + "00"
        else:
            bits, syms = ac_bits_syms
            ln = 2 + 1 + 16 + len(syms) // 2
            hx += "ffc4" + format(ln, "04x") + "10" + bits + syms
        hx += ("ffc0" + "000b" + "08" + format(hb * 8, "04x")
               + format(wb * 8, "04x") + "01" + "01" + "11" + "00")
        hx += "ffda" + "0008" + "01" + "01" + "00" + "003f00"
        return hx

    @staticmethod
    def _pack(bitstr):
        """Independent test-side entropy packer: MSB-first bit string →
        bytes with 0xFF00 stuffing and 1-padding (T.81 B.1.1.5/F.1.2.3)."""
        bitstr += "1" * ((8 - len(bitstr) % 8) % 8)
        out = bytearray()
        for i in range(0, len(bitstr), 8):
            byte = int(bitstr[i : i + 8], 2)
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        return bytes(out)

    def test_attach_payloads_roundtrip_the_formula(self, spark):
        """Even ids decode as grayscale, odd ids as 4:4:4 color (ids
        divisible by 3 carry DRI restart markers — same closed form);
        every MCU must be uniform at the DC-DPCM + JFIF-RGB value."""
        import math

        from p2_mapreduce_spark.operators.multimodal import (
            _decode_jpeg,
            attach_jpeg,
        )

        docs = spark.createDataFrame(
            [(i, "x") for i in range(24)], "doc_id long, text string"
        )
        for r in attach_jpeg(docs).collect():
            i = r["media_id"]
            wb, hb = 1 + i % 2, 1 + (i % 4) // 2
            w, h, planes = _decode_jpeg(bytes(r["payload"]))
            assert (w, h) == (8 * wb, 8 * hb)
            assert len(planes) == (3 if i % 2 else 1)
            for m in range(wb * hb):
                by, bx = divmod(m, wb)
                up = 8 * (1 - m % 2)
                yv = 128 + i % 8 + up
                if i % 2 == 0:
                    exp = [yv]
                else:
                    cb, cr = i % 5 + up, i % 7 + up
                    exp = [
                        math.floor(yv + 1.402 * cr + 0.5),
                        math.floor(
                            yv - 0.344136 * cb - 0.714136 * cr + 0.5
                        ),
                        math.floor(yv + 1.772 * cb + 0.5),
                    ]
                for ch, want in zip(planes, exp):
                    assert {
                        ch[by * 8 + y][bx * 8 + x]
                        for y in range(8)
                        for x in range(8)
                    } == {want}, (i, m)

    def test_ac_coefficient_against_naive_idct(self):
        """A block with a real AC coefficient (zigzag 1 = horizontal
        frequency v=1) must match a from-the-spec naive IDCT double
        loop — independent of the decoder's matrix-multiply path."""
        import math

        import numpy as np

        from p2_mapreduce_spark.operators.multimodal import _decode_jpeg

        # AC table: EOB '0' (len 1), symbol 0x02 (run 0, size 2) '10'
        hx = self._headers(1, 1, ac_bits_syms=("0101" + "00" * 14, "0002"))
        # DC cat 0 '000' | AC '10' + bits '11' (+3) | EOB '0' = 8 bits
        hx += self._pack("000" + "10" + "11" + "0").hex() + "ffd9"
        w, h, (grid,) = _decode_jpeg(bytes.fromhex(hx))
        assert (w, h) == (8, 8)

        def c(u):
            return math.sqrt(0.5) if u == 0 else 1.0

        for y in range(8):
            for x in range(8):
                f = 0.25 * c(0) * c(1) * 3.0 * math.cos(
                    (2 * x + 1) * 1 * math.pi / 16.0
                )
                assert grid[y][x] == int(np.clip(np.rint(f) + 128, 0, 255))
        # varies along x, constant along y (zigzag 1 is horizontal)
        assert len({tuple(row) for row in grid}) == 1
        assert len(set(grid[0])) > 1

    def test_byte_stuffing_and_clamp(self):
        """A 4-bit first block aligns the second block's seven cat-7
        magnitude ones plus the following AC code's leading 1 into one
        0xFF scan byte (stuffed 0xFF00 by the test packer); the +127 DC
        also drives bright pixels to the 255 clamp — the decoder must
        unstuff, decode the AC coefficient, and clamp."""
        import math

        import numpy as np

        from p2_mapreduce_spark.operators.multimodal import _decode_jpeg

        # AC table: EOB '0' (len 1), symbol 0x06 (run 0, size 6) '10'
        headers = self._headers(2, 1, ac_bits_syms=("0101" + "00" * 14, "0006"))
        bits = (
            "000" + "0"                    # block A: DC cat 0, EOB — 4 bits
            + "1110" + "1111111"           # block B: DC cat 7, +127
            + "10" + "100000"              # AC (0,6), value +32 at zigzag 1
            + "0"                          # EOB
        )
        scan = self._pack(bits)
        assert b"\xff\x00" in scan  # the stuffing case is actually hit
        w, h, (grid,) = _decode_jpeg(
            bytes.fromhex(headers + scan.hex() + "ffd9")
        )
        assert (w, h) == (16, 8)
        assert {grid[y][x] for y in range(8) for x in range(8)} == {128}
        c0, c1 = math.sqrt(0.5), 1.0
        for y in range(8):
            for x in range(8):
                f = 127.0 + 0.25 * c0 * c1 * 32.0 * math.cos(
                    (2 * x + 1) * 1 * math.pi / 16.0
                )
                exp = int(np.clip(np.rint(f) + 128, 0, 255))
                assert grid[y][8 + x] == exp
        assert 255 in {grid[0][8 + x] for x in range(8)}  # clamp hit

    def test_quarantine_envelope(self):
        from p2_mapreduce_spark.operators.multimodal import _decode_jpeg

        good = bytes.fromhex(
            self._headers(1, 1) + self._pack("100" + "1000" + "0").hex()
            + "ffd9"
        )
        assert _decode_jpeg(good) is not None
        assert _decode_jpeg(b"") is None
        assert _decode_jpeg(b"\xff\xd8junk") is None
        assert _decode_jpeg(good[:40]) is None  # truncated headers
        # progressive (SOF2) gated
        assert _decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2")) is None
        # a DRI segment on a 1-MCU image decodes (no restart ever due)
        dri = bytes.fromhex("ffdd00040008")
        sos_at = good.find(b"\xff\xda")
        assert _decode_jpeg(good[:sos_at] + dri + good[sos_at:]) is not None
        # chroma subsampling gated: 2x2 sampling factor on component 1
        sub = good.replace(
            b"\xff\xc0\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00",
            b"\xff\xc0\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x22\x00",
        )
        assert sub != good and _decode_jpeg(sub) is None
        # truncated scan: entropy data cut mid-block
        assert _decode_jpeg(good[: sos_at + 10]) is None

    def test_mjpeg_frame_sums_match_formula(self, spark):
        """MJPEG demux + full JPEG decode per sampled frame: every 2nd
        frame's channel sums must match the DC-DPCM + JFIF closed form;
        a truncated tail quarantines the cut frame, not the stream."""
        import math

        from p2_mapreduce_spark.operators.multimodal import (
            attach_mjpeg,
            video_frame_sums,
        )

        docs = spark.createDataFrame(
            [(i, "x") for i in range(10)], "doc_id long, text string"
        )
        media = attach_mjpeg(docs)
        got = {
            (r["media_id"], r["frame_idx"]): r
            for r in video_frame_sums(media, every_n=2).collect()
        }
        for i in range(10):
            wb, hb, nf = 1 + i % 2, 1 + (i % 4) // 2, 2 + i % 8
            n = wb * hb
            ne, nodd = (n + 1) // 2, n - (n + 1) // 2
            for f in range(0, nf, 2):
                r = got.pop((i, f))
                assert (r["width"], r["height"], r["n_comp"]) == (
                    8 * wb, 8 * hb, 3,
                )
                af, b5, c7 = (i % 8 + f) % 8, i % 5, i % 7
                exp_r = 64 * (
                    ne * math.floor((136 + af) + 1.402 * (c7 + 8) + 0.5)
                    + nodd * math.floor((128 + af) + 1.402 * c7 + 0.5)
                )
                exp_b = 64 * (
                    ne * math.floor((136 + af) + 1.772 * (b5 + 8) + 0.5)
                    + nodd * math.floor((128 + af) + 1.772 * b5 + 0.5)
                )
                assert (r["sum_r"], r["sum_b"]) == (exp_r, exp_b), (i, f)
        assert not got  # no extra frames decoded
        # truncated tail: doc 1 has nf=3 (sampled frames 0 and 2);
        # cutting the last byte kills frame 2's EOI, leaving frame 0
        pay = bytes(
            media.filter(F.col("media_id") == 1).collect()[0]["payload"]
        )
        trunc = spark.createDataFrame(
            [(1, bytearray(pay[:-1]))], "media_id long, payload binary"
        )
        idxs = [
            r["frame_idx"]
            for r in video_frame_sums(trunc, every_n=2).collect()
        ]
        assert idxs == [0]

    def test_restart_marker_misalign_quarantines(self, spark):
        """A DRI color payload whose RST index is corrupted must
        quarantine — proves the decoder genuinely checks the marker
        sequence instead of skipping two bytes."""
        from p2_mapreduce_spark.operators.multimodal import (
            _decode_jpeg,
            attach_jpeg,
        )

        docs = spark.createDataFrame(
            [(3, "x")], "doc_id long, text string"
        )
        payload = bytes(attach_jpeg(docs).collect()[0]["payload"])
        # id 3: 2x2 MCUs, restart interval 2 -> one RST0 mid-scan
        assert b"\xff\xd0" in payload
        assert _decode_jpeg(payload) is not None
        broken = payload.replace(b"\xff\xd0", b"\xff\xd5")
        assert _decode_jpeg(broken) is None
