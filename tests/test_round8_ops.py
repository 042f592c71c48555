"""Round-8 operator tests: bucketized range join boundary semantics,
IVF-PQ end-to-end retrieval, MP1 subband->PCM synthesis, and the
round-8 analytics batch."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from p2_mapreduce_spark.operators.relational import (
    range_join_quantity_bands,
)


def test_range_join_bucketized_boundaries(spark):
    """The bucketized equi-join must keep the exact [lo, lo+5) band
    semantics of the former BroadcastNestedLoopJoin: inclusive at the
    lower bound, exclusive at lo+5, fractional quantities handled."""
    lineitem = spark.createDataFrame(
        [(Decimal("10.00"),), (Decimal("14.99"),), (Decimal("15.00"),),
         (Decimal("9.99",),), (Decimal("12.50"),)],
        "l_quantity decimal(18,2)",
    )
    part = spark.createDataFrame([(10,), (10,), (20,)], "p_size int")
    got = {
        r["band_lo"]: (r["n_items"], r["sum_qty"])
        for r in range_join_quantity_bands(lineitem, part).collect()
    }
    # band 10 = [10, 15): 10.00, 14.99, 12.50 in; 15.00 and 9.99 out
    assert got == {10: (3, 10.00 + 14.99 + 12.50)}


def test_range_join_bucketized_matches_theta(spark):
    """Property pin: the explode-candidates equi-join equals the direct
    theta predicate on a randomized small input."""
    lineitem = spark.range(200).select(
        (F.col("id") % 47 / 2 + 1).cast("decimal(18,2)").alias("l_quantity")
    )
    part = spark.range(30).select((F.col("id") % 12 * 3 + 1).cast("int").alias("p_size"))
    bands = part.select(F.col("p_size").cast("bigint").alias("band_lo")).distinct()
    theta = (
        lineitem.join(
            F.broadcast(bands),
            (F.col("l_quantity") >= F.col("band_lo"))
            & (F.col("l_quantity") < F.col("band_lo") + 5),
        )
        .groupBy("band_lo")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    got = range_join_quantity_bands(lineitem, part).select("band_lo", "n_items")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, theta.collect()))
