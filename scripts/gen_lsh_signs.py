"""Regenerate __spark_entry__._LSH_SIGNS: the ±1 hyperplane component
matrix sign(xxhash64(plane, dim) mod 2) that operators/similarity.
_hyperplane_sign derives on the fly.  These are algorithm constants
(functions of plane/dimension INDEX only), inlined into the DuckDB
oracles because DuckDB lacks xxhash64."""

from pyspark.sql import SparkSession, functions as F

N_PLANES, MAX_DIM = 8, 64

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
row = spark.range(1).select(*[
    F.array(*[
        (F.pmod(F.xxhash64(F.lit(p), F.lit(d).cast("int")), F.lit(2)) * 2 - 1).cast("int")
        for d in range(MAX_DIM)
    ]).alias(f"p{p}")
    for p in range(N_PLANES)
]).collect()[0]
print("_LSH_SIGNS = (")
for p in range(N_PLANES):
    print("    (" + ", ".join(str(v) for v in row[f"p{p}"]) + "),")
print(")")
spark.stop()
