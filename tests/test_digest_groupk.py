"""Tests for sample_k_per_group and table_digest."""

from pyspark.sql import functions as F

from p2_mapreduce_spark.operators.curation import sample_k_per_group
from p2_mapreduce_spark.operators.profile import table_digest
from p2_mapreduce_spark.session import load_table


class TestSampleKPerGroup:
    def test_quota_met_per_group(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        out = sample_k_per_group(docs, 3, "source")
        counts = {
            r["source"]: r["count"]
            for r in out.groupBy("source").count().collect()
        }
        sizes = {
            r["source"]: r["count"]
            for r in docs.groupBy("source").count().collect()
        }
        for src, n in counts.items():
            assert n == min(3, sizes[src])

    def test_deterministic_and_partition_invariant(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        a = sorted(r["doc_id"] for r in sample_k_per_group(docs, 4, "source").collect())
        b = sorted(
            r["doc_id"]
            for r in sample_k_per_group(docs.repartition(11), 4, "source").collect()
        )
        assert a == b

    def test_small_group_keeps_all(self, spark):
        rows = [(1, "x", "en", "tiny", 1), (2, "y", "en", "tiny", 1)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        assert sample_k_per_group(df, 5, "source").count() == 2


class TestTableDigest:
    SCHEMA = "k long, v string"

    def test_identical_tables_identical_digests(self, spark):
        rows = [(i, f"v{i}") for i in range(100)]
        a = spark.createDataFrame(rows, self.SCHEMA)
        b = spark.createDataFrame(list(reversed(rows)), self.SCHEMA).repartition(7)
        da = sorted(map(tuple, table_digest(a, ["k"]).collect()))
        db = sorted(map(tuple, table_digest(b, ["k"]).collect()))
        assert da == db  # order/partitioning independent

    def test_single_row_change_flips_exactly_its_bucket(self, spark):
        rows = [(i, f"v{i}") for i in range(100)]
        a = spark.createDataFrame(rows, self.SCHEMA)
        mutated = [(i, "CHANGED" if i == 42 else f"v{i}") for i in range(100)]
        b = spark.createDataFrame(mutated, self.SCHEMA)
        da = {r["bucket"]: r["digest"] for r in table_digest(a, ["k"]).collect()}
        db = {r["bucket"]: r["digest"] for r in table_digest(b, ["k"]).collect()}
        diff = [bk for bk in da if da[bk] != db.get(bk)]
        assert len(diff) == 1  # the key's bucket, nothing else

    def test_duplicate_rows_do_not_cancel(self, spark):
        # a XOR fold would miss a duplicated row pair; the sum fold must not
        a = spark.createDataFrame([(1, "x")], self.SCHEMA)
        b = spark.createDataFrame([(1, "x"), (1, "x"), (1, "x")], self.SCHEMA)
        da = table_digest(a, ["k"]).collect()[0]
        db = table_digest(b, ["k"]).collect()[0]
        assert da["n_rows"] != db["n_rows"] and da["digest"] != db["digest"]
