"""Connected-components / dup-cluster tests (operators/graph.py).

The pair→cluster closure is the one iterative algorithm in the engine;
these pin convergence (chain graphs need diameter rounds, not 1),
canonical-label determinism, and the dedup-sweep contract.
"""

from pyspark.sql import functions as F

from p2_mapreduce_spark.operators.graph import connected_components, dup_clusters


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    rows = connected_components(df).collect()
    return {r["v"]: r["component"] for r in rows}


def test_chain_converges_to_min_label(spark):
    # 1-2-3-4-5 chain: diameter 4 — exercises the multi-round path.
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_and_direction_independence(spark):
    # labels must not depend on edge direction (10,9) vs (9,10)
    got = _cc(spark, [(10, 9), (9, 8), (1, 2), (2, 1)])
    assert got == {8: 8, 9: 8, 10: 8, 1: 1, 2: 1}


def test_dup_clusters_sizes_and_representatives(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], ["doc_a", "doc_b"]
    )
    rows = {r["doc_id"]: r for r in dup_clusters(pairs).collect()}
    assert {d: r["cluster"] for d, r in rows.items()} == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}
    assert {d: r["cluster_size"] for d, r in rows.items()} == {1: 3, 2: 3, 3: 3, 7: 2, 9: 2}
    # dedup sweep: keep rows where doc_id == cluster → exactly one
    # representative per group
    reps = [d for d, r in rows.items() if d == r["cluster"]]
    assert sorted(reps) == [1, 7]


def test_empty_edges_yield_empty_labels(spark):
    df = spark.createDataFrame([], "doc_a BIGINT, doc_b BIGINT")
    assert connected_components(df).count() == 0


def test_partition_count_invariance(spark):
    edges = [(i, i + 1) for i in range(1, 8)] + [(20, 21)]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    base = sorted(map(tuple, connected_components(df).collect()))
    repart = sorted(map(tuple, connected_components(df.repartition(7)).collect()))
    assert base == repart
