"""Pins for the z-order layout operators (operators/layout.py): the
curve must be a bijection, buckets must bound BOTH dimensions, and the
written files must actually deliver multi-dimensional min/max pruning.
"""

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F

import __spark_entry__ as entry_mod
from p2_mapreduce_spark.operators.layout import (
    write_zordered,
    zorder_cluster,
    zvalue,
)
from p2_mapreduce_spark.plans import plan_report
from p2_mapreduce_spark.session import load_table


def test_zvalue_is_bijective(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    n_pairs = li.select("l_partkey", "l_suppkey").distinct().count()
    n_z = (
        li.select(zvalue(("l_partkey", "l_suppkey")).alias("z"))
        .distinct()
        .count()
    )
    assert n_pairs == n_z


def test_zvalue_interleave_positions(spark):
    # bit b of col i lands at position 2b+i: check a known pair
    df = spark.createDataFrame([(5, 3)], "a long, b long")
    z = df.select(zvalue(("a", "b")).alias("z")).collect()[0]["z"]
    # a=0b101 -> bits at 0,4; b=0b011 -> bits at 1,3  => 0b11011 = 27
    assert z == 0b11011


def test_zorder_buckets_bound_both_dimensions(spark, sf_dir):
    out = zorder_cluster(
        load_table(spark, sf_dir, "lineitem"), drop_bits=10
    ).collect()
    # dropping 10 low bits of a 2-D curve = a 32x32 square per bucket
    for r in out:
        assert r["max_l_partkey"] - r["min_l_partkey"] <= 31
        assert r["max_l_suppkey"] - r["min_l_suppkey"] <= 31


def test_zorder_cluster_plan_jvm_only(spark, sf_dir):
    r = plan_report(entry_mod.queries()["zorder_cluster"](spark, sf_dir))
    assert not r["has_python_worker"]
    assert r["has_partial_agg"]
    assert r["n_exchanges"] <= 1  # one hash shuffle on the bucket


def test_write_zordered_files_prune_both_dims(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "li_z")
    write_zordered(li, path, ("l_partkey", "l_suppkey"), n_files=8)

    # the clustered copy is lossless
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    probe = back.filter(
        (F.col("l_partkey").between(100, 131))
        & (F.col("l_suppkey").between(32, 63))
    )
    want = li.filter(
        (F.col("l_partkey").between(100, 131))
        & (F.col("l_suppkey").between(32, 63))
    )
    assert probe.count() == want.count()

    # footer stats: a small 2-D box must exclude most files on the
    # partkey ranges alone (z-contiguous files = narrow in BOTH dims)
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) >= 4
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "l_partkey"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if min(mins) <= 131 and max(maxs) >= 100:
            hit += 1
    assert hit <= len(files) // 2, (
        f"{hit}/{len(files)} files overlap a 32-wide partkey box — "
        "layout is not clustering"
    )


def test_compaction_plan_bins_are_contiguous_and_sized(spark, sf_dir):
    from p2_mapreduce_spark.operators.layout import compaction_plan
    from p2_mapreduce_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rows = sorted(
        compaction_plan(li, target_rows=5000).collect(),
        key=lambda r: r.part_month,
    )
    # every partition accounted for exactly once
    assert sum(r.n_rows for r in rows) == li.count()
    # bins are monotone over the partition order (contiguity)
    bins = [r.bin for r in rows]
    assert bins == sorted(bins)
    # a bin only opens once the previous one holds >= target rows:
    # cumulative rows before each bin's first partition is bin * target
    seen = 0
    for r in rows:
        assert r.bin == seen // 5000
        seen += r.n_rows
    # per-bin rollups agree with the membership
    from collections import Counter

    per_bin = Counter()
    for r in rows:
        per_bin[r.bin] += r.n_rows
    for r in rows:
        assert r.bin_rows == per_bin[r.bin]


def test_bitmap_count_matches_direct_counts_and_rejects_nothing(spark, sf_dir):
    from pyspark.sql import functions as F

    from p2_mapreduce_spark.operators.layout import bitmap_count
    from p2_mapreduce_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    row = bitmap_count(orders).collect()[0]
    direct = orders.agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias("b"),
        F.sum(
            F.when(
                (F.col("o_orderstatus") == "F")
                & (F.col("o_orderpriority") == "1-URGENT"),
                1,
            ).otherwise(0)
        ).alias("ab"),
    ).collect()[0]
    assert (row.n_a, row.n_b, row.n_both) == (direct.a, direct.b, direct.ab)
    assert 0 < row.n_both <= min(row.n_a, row.n_b)


def test_partition_advisor_flags_skew_and_tiny(spark):
    """A constant column has 1 partition / no skew; a 90%-one-value
    column has skew_ratio near the hot share x cardinality; tiny
    partitions count against the tiny_ppm budget."""
    from pyspark.sql import functions as F

    from p2_mapreduce_spark.operators.layout import partition_advisor

    df = spark.range(0, 1000).select(
        F.lit("x").alias("const"),
        F.when(F.col("id") < 900, F.lit("hot"))
        .otherwise((F.col("id") % 10).cast("string"))
        .alias("skewed"),
        (F.col("id") % 500).alias("wide"),
    )
    out = {r["column"]: r
           for r in partition_advisor(df, ["const", "skewed", "wide"],
                                      target_rows=1000).collect()}
    c = out["const"]
    assert c["n_partitions"] == 1 and c["skew_ratio"] == 1.0
    assert c["tiny_ppm"] == 0            # 1000 rows >= tiny cut of 10
    s = out["skewed"]
    assert s["n_partitions"] == 11 and s["max_rows"] == 900
    assert s["skew_ratio"] == 900 / (1000 / 11)
    assert s["tiny_ppm"] == 0            # 10-row parts are not < 10
    w = out["wide"]                       # 500 parts of 2 rows: all tiny
    assert w["n_partitions"] == 500 and w["tiny_ppm"] == 1_000_000
