"""Round-9 optimization pins: the residue-wrapped payload builders
(`_residue_media`) must be BYTE-IDENTICAL to their row-sequential
twins on arbitrary ids — the modulus claim (payload is a pure function
of doc_id mod lcm of the builder's pmod terms) checked across several
periods and non-contiguous / very large ids, so a future edit that
introduces a non-modular doc_id dependence cannot drift silently."""

from __future__ import annotations

import pytest

#: many residues, several periods (max modulus is 1400), plus ids far
#: outside the bench range — all deterministic
IDS = [i * 37 for i in range(120)] + [10**9 + i * 13 for i in range(40)]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(i,) for i in IDS], "doc_id long")


def _rows(df):
    out = []
    for r in df.collect():
        d = r.asDict()
        if isinstance(d.get("payload"), (bytes, bytearray)):
            d["payload"] = bytes(d["payload"])
        out.append(tuple(sorted(d.items())))
    return sorted(out)


@pytest.mark.parametrize("name", ["attach_avi_av"])
def test_residue_builder_equals_sequential_twin(spark, docs, name):
    import p2_mapreduce_spark.operators.multimodal as MM

    wrapped = getattr(MM, name)
    seq = getattr(MM, f"_{name}_seq")
    assert _rows(wrapped(docs)) == _rows(seq(docs))


def test_residue_wrapper_preserves_row_count_on_filtered_input(spark, docs):
    """Builders may be called on filtered subsets; the residue join
    must keep exactly one row per input row."""
    from pyspark.sql import functions as F

    import p2_mapreduce_spark.operators.multimodal as MM

    sub = docs.where(F.col("doc_id") % 3 == 0)
    assert MM.attach_avi_av(sub).count() == sub.count()
