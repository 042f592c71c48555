"""Tests for the distributed Gram matrix and market-basket pairs."""

from pyspark.sql import functions as F

from p2_mapreduce_spark.operators.analytics import copurchase_pairs
from p2_mapreduce_spark.operators.similarity import gram_matrix


def test_gram_matrix_known_values(spark):
    # integer-valued components: quantization is exact, so the Gram
    # matrix equals the plain dot products
    rows = [(1, [1.0, 2.0, 0.0]), (2, [0.0, 1.0, 3.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {(r["i"], r["j"]): r["gram"] for r in gram_matrix(df).collect()}
    assert len(out) == 6  # d(d+1)/2 upper-triangle entries
    assert out[(0, 0)] == 1.0  # 1*1 + 0*0
    assert out[(0, 1)] == 2.0  # 1*2 + 0*1
    assert out[(0, 2)] == 0.0  # 1*0 + 0*3
    assert out[(1, 1)] == 5.0  # 2*2 + 1*1
    assert out[(1, 2)] == 3.0  # 2*0 + 1*3
    assert out[(2, 2)] == 9.0  # 0*0 + 3*3


def test_gram_matrix_partitioning_invariant(spark):
    rows = [(i, [float(i) / 7, float(i * i) / 13]) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(map(tuple, gram_matrix(df).collect()))
    b = sorted(map(tuple, gram_matrix(df.repartition(11)).collect()))
    assert a == b  # exact fixed-point sums: bit-identical, not approx


def test_copurchase_counts_and_dedup(spark):
    # order 1: parts {10, 20, 30}; order 2: {10, 20}; order 3: {10, 20}
    # with part 10 appearing TWICE (two lineitems) — must count once
    rows = [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 10), (3, 10), (3, 20),
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {
        (r["part_a"], r["part_b"]): r["n_orders"]
        for r in copurchase_pairs(li, top_n=10).collect()
    }
    assert out[(10, 20)] == 3
    assert out[(10, 30)] == 1
    assert out[(20, 30)] == 1
    assert len(out) == 3


def test_copurchase_top_n_cut_is_deterministic(spark):
    rows = [(o, p) for o in range(5) for p in (1, 2, 3)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = [
        (r["part_a"], r["part_b"])
        for r in copurchase_pairs(li, top_n=2).collect()
    ]
    # all pairs tie at 5 orders: the cut falls back to pair ascending
    assert got == [(1, 2), (1, 3)]
