"""Runs EVERY queries() entry against its oracle_sql() — the local mirror
of the driver's correctness gate (sf0.001 for speed; the driver uses
sf0.01)."""

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_harness import assert_oracle_match

QUERY_IDS = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("qid", QUERY_IDS)
def test_query_matches_oracle(spark, sf_dir, qid):
    q = entry_mod.queries()[qid]
    oracles = entry_mod.oracle_sql()
    df = q(spark, sf_dir)
    if qid not in oracles:
        # rows-only contract (non-SQL-expressible op): must run, yield a
        # stable schema, and be non-degenerate.
        rows = df.count()
        assert rows >= 0 and len(df.columns) > 0
        return
    assert_oracle_match(df, oracles[qid], sf_dir, name=qid)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["word", "cnt"]
