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
