"""Null-semantics pins: the testdata has no nulls, so these tests feed
null-rich frames through the core operators and pin the Spark/ANSI
behaviors the engine's results depend on (null group keys are kept as a
group; null join keys never match; null text flows through tokenize and
dedup without crashing or pairing)."""

from pyspark.sql import functions as F

from p2_mapreduce_spark.operators.dedup import exact_dedup, ngram_jaccard_pairs
from p2_mapreduce_spark.operators.text import wordcount


def test_null_group_key_is_its_own_group(spark):
    df = spark.createDataFrame(
        [("a", 1.0), (None, 2.0), (None, 3.0), ("b", 4.0)], ["k", "v"]
    )
    got = {r["k"]: (r["n"], r["s"]) for r in df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("s"),
    ).collect()}
    assert got[None] == (2, 5.0)  # one NULL group, values aggregated
    assert got["a"] == (1, 1.0) and got["b"] == (1, 4.0)


def test_null_join_keys_never_match(spark):
    left = spark.createDataFrame([(1, "x"), (None, "y")], ["k", "l"])
    right = spark.createDataFrame([(1, "p"), (None, "q")], ["k", "r"])
    inner = left.join(right, left.k == right.k).collect()
    assert len(inner) == 1 and inner[0]["l"] == "x"
    # and in a left join the null-keyed row survives with null right side
    lj = {r["l"]: r["r"] for r in left.join(right, left.k == right.k, "left").collect()}
    assert lj == {"x": "p", "y": None}


def test_null_text_through_text_ops(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, "")], ["doc_id", "text"]
    )
    wc = {r["word"]: r["cnt"] for r in wordcount(df).collect()}
    assert wc == {"hello": 1, "world": 1}
    # exact_dedup groups null text like any other group key
    dd = exact_dedup(df)
    assert dd.count() == 3
    # near-dup pipeline drops null/short docs instead of crashing
    assert ngram_jaccard_pairs(df).count() == 0


def test_count_distinct_ignores_null(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",), ("b",)], ["x"])
    row = df.agg(
        F.countDistinct("x").alias("d"), F.count("x").alias("c"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    # ANSI: COUNT(col)/COUNT(DISTINCT col) skip nulls, COUNT(*) does not
    assert (row["d"], row["c"], row["n"]) == (2, 3, 4)


def test_missing_table_raises_cleanly(spark):
    """S1 scan of a nonexistent path must fail with AnalysisException at
    plan time (refuse-don't-corrupt), not at execution."""
    import pytest
    from pyspark.errors import AnalysisException

    from p2_mapreduce_spark.session import load_table

    with pytest.raises(AnalysisException):
        load_table(spark, "/root/testdata/does-not-exist", "lineitem").count()
