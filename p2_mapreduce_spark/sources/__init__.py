"""Sources & sinks — the engine's edge (reference S1-S7 surface).

The reference's DFS plane (chunk placement, replication, MD5 scrub,
heartbeats) is the platform here; what remains product is format dispatch,
text sniffing, and the golden TSV writer."""

from p2_mapreduce_spark.sources.readers import is_text_file, read_table, read_text_records
from p2_mapreduce_spark.sources.writers import write_parquet, write_tsv

__all__ = ["is_text_file", "read_table", "read_text_records", "write_parquet", "write_tsv"]
