"""The reference's golden end-to-end pair: word count over smallt.txt must
reproduce smallt_out.txt exactly (4,610 words, 59,132 total tokens, TSV,
lexicographically sorted — reference cmd/client/smallt_out.txt, produced by
the '-aggregate' path)."""

import os

import pytest

from p2_mapreduce_spark.mapreduce import run_mapreduce_by_name
from p2_mapreduce_spark.operators.text import wordcount_global
from p2_mapreduce_spark.sources.readers import read_text_records
from p2_mapreduce_spark.sources.writers import write_tsv

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
SMALLT = os.path.join(FIXTURES, "smallt.txt")
GOLDEN = os.path.join(FIXTURES, "smallt_out.txt")


def load_golden() -> list[tuple[str, int]]:
    out = []
    with open(GOLDEN, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            word, cnt = line.split("\t")
            out.append((word, int(cnt)))
    return out


@pytest.fixture(scope="module")
def golden():
    return load_golden()


def test_golden_columnar(spark, golden):
    docs = read_text_records(spark, SMALLT)
    got = [(r["word"], r["cnt"]) for r in wordcount_global(docs, "contents").collect()]
    assert len(got) == len(golden) == 4610
    assert sum(c for _, c in got) == 59132
    assert got == golden  # exact content AND global order


def test_golden_engine_path(spark, golden):
    """Same result through the registry/plugin path (mirrors
    `client mapreduce smallt.txt out wordcount wordcount -aggregate`)."""
    docs = read_text_records(spark, SMALLT)
    out = run_mapreduce_by_name(docs, "wordcount", "wordcount", aggregate=True)
    got = [(r["key"], int(r["value"])) for r in out.collect()]
    assert got == golden


def test_golden_tsv_roundtrip(spark, golden, tmp_path):
    """write_tsv single-file output re-read == golden file semantics."""
    docs = read_text_records(spark, SMALLT)
    out_dir = str(tmp_path / "wc_out")
    write_tsv(wordcount_global(docs, "contents"), out_dir, single_file=True)
    parts = [p for p in os.listdir(out_dir) if p.startswith("part-")]
    assert len(parts) == 1
    with open(os.path.join(out_dir, parts[0]), encoding="utf-8") as f:
        got = [tuple(line.rstrip("\n").split("\t")) for line in f if line.strip()]
    assert [(w, int(c)) for w, c in got] == golden
