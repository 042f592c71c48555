"""Tests for corpus_report, doclen_histogram, dup_matrix."""

from p2_mapreduce_spark.operators.dedup import dup_matrix
from p2_mapreduce_spark.operators.text_analysis import (
    corpus_report,
    doclen_histogram,
)
from p2_mapreduce_spark.session import load_table

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


class TestCorpusReport:
    def test_cube_grains_consistent(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        rows = corpus_report(docs).collect()
        total = {(r["lang"], r["source"]): r for r in rows}
        all_all = total[("ALL", "ALL")]
        assert all_all["n_docs"] == docs.count()
        # lang-marginal rows sum to the grand total
        lang_rows = [r for r in rows if r["source"] == "ALL" and r["lang"] != "ALL"]
        assert sum(r["n_docs"] for r in lang_rows) == all_all["n_docs"]
        assert sum(r["total_tokens"] for r in lang_rows) == all_all["total_tokens"]

    def test_avg_and_ratio(self, spark):
        rows = [
            (1, "a b a", "en", "s", 5),   # 3 tokens, 2 uniq
            (2, "c", "en", "s", 1),       # 1 token, 1 uniq
        ]
        out = {
            (r["lang"], r["source"]): r
            for r in corpus_report(
                spark.createDataFrame(rows, DOC_SCHEMA)
            ).collect()
        }
        r = out[("en", "s")]
        assert r["total_tokens"] == 4 and r["avg_tokens"] == 2.0
        assert r["distinct_ratio_ppm"] == 750_000


class TestDoclenHistogram:
    def test_buckets_and_shares(self, spark):
        rows = [
            (1, "", "en", "s", 0),            # 0 tokens -> bucket 0
            (2, "a", "en", "s", 1),           # 1 token  -> [1,1]
            (3, "a b c", "en", "s", 5),       # 3 tokens -> [2,3]
            (4, "a b c d", "en", "s", 7),     # 4 tokens -> [4,7]
        ]
        out = {
            (r["bucket_lo"], r["bucket_hi"]): (r["n_docs"], r["share_ppm"])
            for r in doclen_histogram(
                spark.createDataFrame(rows, DOC_SCHEMA)
            ).collect()
        }
        assert out[(0, 0)] == (1, 250_000)
        assert out[(1, 1)] == (1, 250_000)
        assert out[(2, 3)] == (1, 250_000)
        assert out[(4, 7)] == (1, 250_000)

    def test_total_mass_is_ppm(self, spark, sf_dir):
        out = doclen_histogram(load_table(spark, sf_dir, "documents")).collect()
        total_ppm = sum(r["share_ppm"] for r in out)
        # integer-div ppm: sum within len(out) of 1e6 from floor loss
        assert 1_000_000 - len(out) <= total_ppm <= 1_000_000


class TestDupMatrix:
    def test_matrix_counts_match_pair_list(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.dedup import ngram_jaccard_pairs

        docs = load_table(spark, sf_dir, "documents")
        out = dup_matrix(docs)
        assert sum(r["n_dup_pairs"] for r in out.collect()) == (
            ngram_jaccard_pairs(docs).count()
        )

    def test_cross_source_mirror_detected(self, spark):
        boiler = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [
            (1, boiler, "en", "srcA", 1),
            (2, boiler + " iota", "en", "srcB", 1),  # near-dup of 1
            (3, "totally different words here now", "en", "srcA", 1),
        ]
        out = {
            (r["source_a"], r["source_b"]): r["n_dup_pairs"]
            for r in dup_matrix(
                spark.createDataFrame(rows, DOC_SCHEMA)
            ).collect()
        }
        assert out == {("srcA", "srcB"): 1}
