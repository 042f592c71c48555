#!/usr/bin/env python3
"""A/B a config set on a query subset: same methodology as bench.py
(noop sink, min-of-2), one Spark session, subset passed as ids.
Usage: exp_config.py <on|off> <id> [...]"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1]
ids = sys.argv[2:]

from pyspark.sql import SparkSession

builder = (
    SparkSession.builder.master("local[32]")
    .appName(f"exp-{mode}")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.files.maxPartitionBytes", "128m")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
)
if mode == "on":
    builder = builder.config(
        "spark.sql.join.preferSortMergeJoin", "false"
    ).config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as contract  # noqa: E402
from p2_mapreduce_spark.session import TABLES, load_table  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
qs = contract.queries()

# same base-table cache as bench.py
for t in TABLES:
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        bdf = load_table(spark, sf_dir, t).persist()
        bdf.write.mode("overwrite").format("noop").save()

# warmup
qs["filter_project"](spark, sf_dir).write.mode("overwrite").format("noop").save()

out = {}
for name in ids:
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    out[name] = round(min(ts), 3)
print(json.dumps({"mode": mode, "total": round(sum(out.values()), 3), "queries": out}))
spark.stop()
