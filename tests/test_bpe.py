"""Tests for distributed BPE merge learning, pinned against a
pure-Python reference implementation, plus share_of_parent."""

import collections

from p2_mapreduce_spark.operators.analytics import share_of_parent
from p2_mapreduce_spark.operators.bpe import (
    bpe_learn,
    bpe_segment_words,
    word_freq_table,
)
from p2_mapreduce_spark.session import load_table

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _ref_bpe(word_freqs: dict, n_merges: int):
    """Reference BPE (Sennrich et al.): position-counted pairs, greedy
    leftmost non-overlapping merge, lexicographic tie-break."""
    seg = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts = collections.Counter()
        for syms, f in seg.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        merges.append((l, r, c))
        new_seg = {}
        for syms, f in seg.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_seg[tuple(out)] = new_seg.get(tuple(out), 0) + f
        seg = new_seg
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)], DOC_SCHEMA
    )


class TestBpeLearn:
    def test_matches_reference_on_fixture(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        wf = {
            r["word"]: r["freq"] for r in word_freq_table(docs).collect()
        }
        got = bpe_learn(docs, n_merges=4)
        want = _ref_bpe(wf, 4)
        assert got == want

    def test_overlapping_run_merges_greedily(self, spark):
        # 'aaaa' x3: round 1 pair (a,a) count 3*3=9 -> 'aa aa'
        docs = _docs(spark, ["aaaa aaaa aaaa"])
        merges = bpe_learn(docs, n_merges=2)
        assert merges[0][:2] == ("a", "a")
        seg = {
            r["word"]: r["segmented"]
            for r in bpe_segment_words(docs, merges[:1]).collect()
        }
        assert seg["aaaa"] == "aa aa"

    def test_merged_symbol_participates_next_round(self, spark):
        # corpus of 'abab': round1 merges a+b ('ab'), round2 ab+ab
        docs = _docs(spark, ["abab abab abab"])
        merges = bpe_learn(docs, n_merges=2)
        assert merges[0][:2] == ("a", "b")
        assert merges[1][:2] == ("ab", "ab")

    def test_partition_invariant(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        a = bpe_learn(docs, n_merges=3)
        b = bpe_learn(docs.repartition(9), n_merges=3)
        assert a == b


class TestShareOfParent:
    def test_shares_sum_to_one_per_region(self, spark, sf_dir):
        out = share_of_parent(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "customer"),
            load_table(spark, sf_dir, "nation"),
            load_table(spark, sf_dir, "region"),
        ).collect()
        by_region = {}
        for r in out:
            by_region.setdefault(r["r_name"], []).append(r)
        for rows in by_region.values():
            assert abs(sum(x["share"] for x in rows) - 1.0) < 1e-9
            for x in rows:
                assert abs(x["region_revenue"] - rows[0]["region_revenue"]) < 1e-9
