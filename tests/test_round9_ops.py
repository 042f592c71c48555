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
