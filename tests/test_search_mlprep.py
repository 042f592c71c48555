"""Tests for the search-indexing family (postings, BM25) and the
ML-prep ops (feature binning, dictionary encoding, stratified split,
skyline)."""

import math

from pyspark.sql import functions as F

from p2_mapreduce_spark.operators.analytics import skyline_frontier
from p2_mapreduce_spark.operators.curation import dict_encode, stratified_split
from p2_mapreduce_spark.operators.profile import feature_bin
from p2_mapreduce_spark.operators.search import bm25_search, build_postings

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)], DOC_SCHEMA
    )


class TestPostings:
    def test_tf_and_positions(self, spark):
        out = {
            (r["token"], r["doc_id"]): (r["tf"], r["first_pos"])
            for r in build_postings(
                _docs(spark, ["b a b b", "a c"])
            ).collect()
        }
        assert out[("b", 0)] == (3, 0)
        assert out[("a", 0)] == (1, 1)
        assert out[("a", 1)] == (1, 0)
        assert out[("c", 1)] == (1, 1)

    def test_single_wide_exchange(self, spark, sf_dir):
        from p2_mapreduce_spark.session import load_table

        plan = build_postings(
            load_table(spark, sf_dir, "documents")
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("hashpartitioning") == 1


class TestBM25:
    def test_ranking_matches_reference_formula(self, spark):
        texts = ["x x x y", "x z w q", "z w q v"]
        out = bm25_search(_docs(spark, texts), ["x"], top_n=3).collect()
        # df(x)=2, N=3: lift idf = (3-2+0.5)/(2.5) = 0.6 for both hits
        ids = [r["doc_id"] for r in out]
        assert set(ids) == {0, 1}
        # doc 0 has tf=3 but same length: must outrank doc 1 (tf=1)
        assert ids[0] == 0
        r0 = out[0]
        dl, avgdl, tf = 4.0, (4 + 4 + 4) / 3.0, 3.0
        idf = (3 - 2 + 0.5) / (2 + 0.5)
        exp = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * dl) / avgdl))
        assert math.isclose(r0["score"], exp, rel_tol=1e-12)
        assert r0["n_terms_hit"] == 1

    def test_multi_term_sum_and_miss(self, spark):
        out = {
            r["doc_id"]: r["n_terms_hit"]
            for r in bm25_search(
                _docs(spark, ["x y", "x q", "q v"]), ["x", "y"], top_n=10
            ).collect()
        }
        assert out == {0: 2, 1: 1}  # doc 2 hits nothing -> absent

    def test_longer_docs_penalized(self, spark):
        texts = ["x a", "x a a a a a a a a a a a a a a a"]
        out = bm25_search(_docs(spark, texts), ["x"], top_n=2).collect()
        assert out[0]["doc_id"] == 0
        assert out[0]["score"] > out[1]["score"]


class TestFeatureBin:
    def test_bins_partition_rows_into_quartiles(self, spark, sf_dir):
        from p2_mapreduce_spark.session import load_table

        li = load_table(spark, sf_dir, "lineitem")
        out = feature_bin(
            li, "l_extendedprice", ["l_returnflag"],
            lo_c=0, hi_c=11_000_000, n_buckets=1100,
        )
        counts = (
            out.groupBy("l_returnflag", "bin").count().collect()
        )
        by_flag = {}
        for r in counts:
            by_flag.setdefault(r["l_returnflag"], {})[r["bin"]] = r["count"]
        for flag, bins in by_flag.items():
            total = sum(bins.values())
            # every quartile bin inhabited and roughly balanced (sketch
            # boundaries: ± one bucket width)
            assert set(bins) == {0, 1, 2, 3}
            for b, n in bins.items():
                assert n > total * 0.15, (flag, b, n, total)

    def test_row_count_preserved(self, spark, sf_dir):
        from p2_mapreduce_spark.session import load_table

        li = load_table(spark, sf_dir, "lineitem")
        out = feature_bin(
            li, "l_extendedprice", ["l_returnflag"],
            lo_c=0, hi_c=11_000_000, n_buckets=1100,
        )
        assert out.count() == li.count()


class TestDictEncode:
    def test_frequency_rank_and_total(self, spark):
        rows = [(i, v) for i, v in enumerate("aababcbaa")]
        df = spark.createDataFrame(rows, "id long, v string")
        out = dict_encode(df, "v", "id")
        codes = {r["v"]: r["code"] for r in out.collect()}
        assert codes == {"a": 0, "b": 1, "c": 2}
        assert out.count() == 9

    def test_tie_breaks_by_value(self, spark):
        rows = [(0, "z"), (1, "y")]
        df = spark.createDataFrame(rows, "id long, v string")
        codes = {r["v"]: r["code"] for r in dict_encode(df, "v", "id").collect()}
        assert codes == {"y": 0, "z": 1}


class TestStratifiedSplit:
    def test_fractions_and_stability(self, spark, sf_dir):
        from p2_mapreduce_spark.session import load_table

        docs = load_table(spark, sf_dir, "documents")
        out = stratified_split(docs)
        counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
        n = sum(counts.values())
        assert counts["train"] > 0.7 * n
        assert 0 < counts["val"] < 0.2 * n
        assert 0 < counts["test"] < 0.2 * n
        # growing the corpus never moves an old row
        half = stratified_split(docs.filter(F.col("doc_id") < 50))
        full = {r["doc_id"]: r["split"] for r in out.collect()}
        for r in half.collect():
            assert full[r["doc_id"]] == r["split"]


class TestSkyline:
    def test_hand_frontier(self, spark):
        # (price, size): frontier = cheapest-for-their-size maximals
        rows = [
            (1, 10.0, 5),
            (2, 10.0, 7),   # dominates 1 (same price, bigger)
            (3, 8.0, 3),
            (4, 12.0, 7),   # dominated by 2 (cheaper, same size)
            (5, 5.0, 1),
            (6, 5.0, 1),    # duplicate of 5: neither dominates -> both stay
        ]
        df = spark.createDataFrame(rows, "p_partkey long, p_retailprice double, p_size int")
        keys = sorted(r["p_partkey"] for r in skyline_frontier(df).collect())
        assert keys == [2, 3, 5, 6]

    def test_matches_bruteforce_on_fixture(self, spark, sf_dir):
        from p2_mapreduce_spark.session import load_table

        part = load_table(spark, sf_dir, "part")
        fast = sorted(r["p_partkey"] for r in skyline_frontier(part).collect())
        rows = part.select("p_partkey", "p_retailprice", "p_size").collect()
        brute = sorted(
            p["p_partkey"]
            for p in rows
            if not any(
                q["p_retailprice"] <= p["p_retailprice"]
                and q["p_size"] >= p["p_size"]
                and (
                    q["p_retailprice"] < p["p_retailprice"]
                    or q["p_size"] > p["p_size"]
                )
                for q in rows
            )
        )
        assert fast == brute


def test_phrase_search_counts_adjacent_occurrences(spark):
    from p2_mapreduce_spark.operators.search import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "data join data join x data data join"),
            (2, "join data"),
            (3, "data x join"),
            (4, "prefix data join"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_occurrences, r.first_pos)
           for r in phrase_search(docs, ("data", "join")).collect()}
    assert got == {1: (3, 0), 4: (1, 1)}
    # three-token phrase goes through the chained adjacency joins
    got3 = {r.doc_id: (r.n_occurrences, r.first_pos)
            for r in phrase_search(docs, ("data", "join", "x")).collect()}
    assert got3 == {1: (1, 2)}


def test_substring_search_equals_naive_scan(spark, sf_dir):
    from pyspark.sql import functions as F

    from p2_mapreduce_spark.operators.search import substring_search
    from p2_mapreduce_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    needle = "data join"
    got = {r.doc_id: (r.n_matches, r.first_off)
           for r in substring_search(docs, needle).collect()}
    naive = {
        r.doc_id: (r.n, r.o)
        for r in docs.select(
            "doc_id",
            ((F.length("text") - F.length(F.replace(F.col("text"), F.lit(needle))))
             / len(needle)).cast("bigint").alias("n"),
            F.instr("text", needle).cast("bigint").alias("o"),
        ).where(F.col("n") > 0).collect()
    }
    assert got == naive and len(got) > 0


def test_trigram_index_path_matches_direct_and_prunes(spark, sf_dir, tmp_path):
    from p2_mapreduce_spark.operators.search import (
        build_trigram_index,
        substring_search,
        substring_search_indexed,
    )
    from p2_mapreduce_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "tri_idx")
    build_trigram_index(docs, path)
    needle = "data join"
    direct = sorted(tuple(r) for r in substring_search(docs, needle).collect())
    indexed = sorted(
        tuple(r)
        for r in substring_search_indexed(docs, path, needle).collect()
    )
    assert indexed == direct and len(indexed) > 0
    # the probe must partition-prune to the needle trigrams' head chars
    idx = spark.read.parquet(path)
    from pyspark.sql import functions as F

    probe = idx.where(F.col("tri_head").isin(["d", "a"]))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "tri_head" in plan
