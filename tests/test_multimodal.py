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
