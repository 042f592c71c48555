"""Unit tests for the training-data curation operators (operators/curation.py)."""

import hashlib

from pyspark.sql import Row

from p2_mapreduce_spark.operators.curation import (
    benchmark_contamination,
    pack_sequences,
    pii_scrub,
    repetition_stats,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


class TestRepetitionStats:
    def test_repetitive_doc_flagged(self, spark):
        rep_text = " ".join(["a"] * 24 + ["b"])          # 25 tokens, 2 distinct
        div_text = " ".join(f"tok{i}" for i in range(25))  # 25 distinct tokens
        out = {
            r["doc_id"]: r
            for r in repetition_stats(_docs(spark, [rep_text, div_text])).collect()
        }
        rep = out[0]
        assert rep["n_tokens"] == 25
        assert rep["n_distinct"] == 2
        assert rep["top_token_ratio"] == 24 / 25
        # bigrams: "a a" x23, "a b" x1 -> top share 23/24
        assert rep["top_bigram_ratio"] == 23 / 24
        assert rep["repetitive"]
        div = out[1]
        assert div["distinct_ratio"] == 1.0
        assert div["top_bigram_ratio"] == 1 / 24
        assert not div["repetitive"]

    def test_short_doc_never_flagged(self, spark):
        # < 20 tokens: repetition shares are pigeonhole-inflated, so the
        # flag is gated off (MassiveText min-word-count rule)
        row = repetition_stats(_docs(spark, ["a a a a b"])).collect()[0]
        assert row["top_bigram_ratio"] == 3 / 4
        assert not row["repetitive"]

    def test_single_token_doc_has_zero_bigram_ratio(self, spark):
        row = repetition_stats(_docs(spark, ["hello"])).collect()[0]
        assert row["n_tokens"] == 1
        assert row["top_bigram_ratio"] == 0.0
        # distinct_ratio 1.0, bigram 0.0 -> not repetitive
        assert not row["repetitive"]

    def test_zero_token_doc_dropped(self, spark):
        # punctuation-only docs tokenize to nothing and produce no row
        # (same as the unnest-of-empty oracle semantics)
        assert repetition_stats(_docs(spark, ["!!! ...", "ok doc here"])).count() == 1


class TestBenchmarkContamination:
    def test_overlap_counted_against_explicit_benchmark(self, spark):
        bench = _docs(spark, ["alpha beta gamma delta"])
        corpus = spark.createDataFrame(
            [
                # shares the 3-gram "alpha beta gamma" and "beta gamma delta"
                Row(doc_id=10, text="x alpha beta gamma delta y"),
                Row(doc_id=11, text="totally unrelated words only here"),
            ]
        )
        out = {
            r["doc_id"]: r
            for r in benchmark_contamination(
                corpus, benchmark=bench, n=3, threshold=0.2
            ).collect()
        }
        hit = out[10]
        assert hit["n_shingles"] == 4
        assert hit["n_contaminated"] == 2
        assert hit["contamination_ratio"] == 0.5
        assert hit["contaminated"]
        assert out[11]["n_contaminated"] == 0
        assert not out[11]["contaminated"]

    def test_default_benchmark_is_deterministic_slice(self, spark):
        docs = _docs(spark, [f"w{i} common trigram here tail{i}" for i in range(50)])
        out = benchmark_contamination(docs, n=3, threshold=0.05)
        ids = [r["doc_id"] for r in out.collect()]
        # benchmark docs (doc_id % 25 == 0) are excluded from the output
        assert 0 not in ids and 25 not in ids
        assert len(ids) == 48


class TestPackSequences:
    def test_offsets_and_bins(self, spark):
        # 4, 3, 5, 2 tokens in doc_id order; cap=6
        texts = ["a b c d", "e f g", "h i j k l", "m n"]
        rows = {
            r["doc_id"]: r
            for r in pack_sequences(_docs(spark, texts), cap=6).collect()
        }
        assert [rows[i]["token_offset"] for i in range(4)] == [0, 4, 7, 12]
        # seq = floor(offset / 6)
        assert [rows[i]["seq_id"] for i in range(4)] == [0, 0, 1, 2]

    def test_partition_count_invariance(self, spark):
        texts = [f"{'w ' * (i % 7 + 1)}end" for i in range(40)]
        docs = _docs(spark, texts)
        a = sorted(map(tuple, pack_sequences(docs, cap=16, partitions=2).collect()))
        b = sorted(map(tuple, pack_sequences(docs, cap=16, partitions=7).collect()))
        assert a == b

    def test_offsets_are_prefix_sums(self, spark):
        texts = ["x y", "z", "p q r"]
        out = sorted(
            pack_sequences(_docs(spark, texts), cap=100).collect(),
            key=lambda r: r["doc_id"],
        )
        cum = 0
        for r in out:
            assert r["token_offset"] == cum
            cum += r["n_tokens"]


class TestPiiScrub:
    def test_counts_and_redaction(self, spark):
        text = (
            "contact bob@example.com or https://ex.com/a?b=1 "
            "card 1234567890 customer supplier customer end"
        )
        row = pii_scrub(_docs(spark, [text])).collect()[0]
        assert row["n_email"] == 1
        assert row["n_url"] == 1
        assert row["n_longnum"] == 1
        assert row["n_blocked"] == 3
        clean = (
            "contact <EMAIL> or <URL> "
            "card <NUM> <BLOCKED> <BLOCKED> <BLOCKED> end"
        )
        assert row["clean_len"] == len(clean)
        assert row["clean_md5"] == hashlib.md5(clean.encode()).hexdigest()

    def test_clean_text_passthrough(self, spark):
        text = "no pii in this document at all"
        row = pii_scrub(_docs(spark, [text])).collect()[0]
        assert (
            row["n_email"] == row["n_url"] == row["n_longnum"] == row["n_blocked"] == 0
        )
        assert row["clean_md5"] == hashlib.md5(text.encode()).hexdigest()


def test_chunk_documents_boundaries(spark):
    from p2_mapreduce_spark.operators.curation import chunk_documents

    words = " ".join(f"w{i:03d}" for i in range(70))
    docs = spark.createDataFrame(
        [
            (1, words),                                  # 70 tokens
            (2, " ".join(f"w{i}" for i in range(64))),   # exactly one chunk
            (3, "solo"),
            (4, "!!! ???"),                              # tokenizes to nothing
        ],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, chunk_tokens=64, overlap=16).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 4 not in by_doc  # empty docs emit no chunks
    assert [r["n_tokens"] for r in sorted(by_doc[1], key=lambda r: r["chunk_id"])] == [64, 22]
    c0, c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    # consecutive chunks share exactly `overlap` tokens
    assert c0["chunk_text"].split()[48:] == c1["chunk_text"].split()[:16]
    assert [r["n_tokens"] for r in by_doc[2]] == [64]
    assert by_doc[3][0]["chunk_text"] == "solo"


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from p2_mapreduce_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_pseudonymize_preserves_joins_and_rotates_with_salt(spark):
    from p2_mapreduce_spark.operators.curation import pseudonymize

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (1, "a")], "k long, payload string"
    )
    p1 = pseudonymize(df, ["k"], salt="s1")
    toks = [r["k"] for r in p1.collect()]
    assert toks[0] == toks[2] != toks[1]          # equality preserved
    assert all(len(t) == 32 for t in toks)         # md5 hex, raw gone
    assert p1.select("k").distinct().count() == df.select("k").distinct().count()
    p2 = pseudonymize(df, ["k"], salt="s2")
    assert set(r["k"] for r in p2.collect()).isdisjoint(toks)  # salt rotates


def test_mixture_sample_rates_and_determinism(spark):
    from p2_mapreduce_spark.operators.curation import mixture_sample

    docs = spark.createDataFrame(
        [(i, f"s{i % 2}", "x") for i in range(400)],
        "doc_id long, source string, text string",
    )
    all_kept = mixture_sample(docs, {"s0": 1.0, "s1": 1.0})
    assert all_kept.count() == 400
    none_kept = mixture_sample(docs, {"s0": 0.0}, default_rate=0.0)
    assert none_kept.count() == 0
    half = mixture_sample(docs, {"s0": 0.5}, default_rate=0.25)
    ids1 = sorted(r["doc_id"] for r in half.collect())
    ids2 = sorted(r["doc_id"] for r in half.collect())
    assert ids1 == ids2  # deterministic md5 coin — no RNG in sight
    n_s0 = sum(1 for i in ids1 if i % 2 == 0)
    n_s1 = len(ids1) - n_s0
    assert 60 <= n_s0 <= 140   # ~100 of 200 at rate .5
    assert 20 <= n_s1 <= 80    # ~50 of 200 at rate .25


def test_budget_sample_is_hash_order_prefix_per_source(spark):
    import hashlib

    from p2_mapreduce_spark.operators.curation import budget_sample

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", " ".join(["w"] * (5 + i % 7))) for i in range(60)],
        "doc_id long, source string, text string",
    )
    budget = 40
    got = {r["doc_id"]: r for r in budget_sample(docs, budget).collect()}

    def coin(i):
        return int(hashlib.md5(f"budget:{i}".encode()).hexdigest()[17:32], 16)

    for s in range(3):
        members = sorted(
            (i for i in range(60) if i % 3 == s), key=lambda i: (coin(i), i)
        )
        cum = 0
        for i in members:
            n = 5 + i % 7
            cum += n
            if cum <= budget:
                assert i in got and got[i]["cum_tokens"] == cum, i
            else:
                assert i not in got, i


class TestQualityBudgetSelect:
    def test_selects_best_within_budget(self, spark):
        # doc margins descend with id here; budget cuts mid-list
        rows = [
            (1, "w1 w2 w3 w4 w5 w6 w7 w8 the the the the", "en", "s", 40),
            (2, "a b c d e f", "en", "s", 11),
            (3, "x", "en", "s", 1),
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        from p2_mapreduce_spark.operators.curation import (
            quality_budget_select,
            quality_classifier,
        )

        margins = {
            r["doc_id"]: r["margin"] for r in quality_classifier(df).collect()
        }
        order = sorted(margins, key=lambda d: (-margins[d], d))
        out = quality_budget_select(df, budget_tokens=13)
        kept = sorted(r["doc_id"] for r in out.collect())
        # greedy whole-doc walk in margin order within 13 tokens
        cum, expect = 0, []
        ntoks = {1: 12, 2: 6, 3: 1}
        for d in order:
            if cum + ntoks[d] <= 13:
                cum += ntoks[d]
                expect.append(d)
            else:
                break
        assert kept == sorted(expect)

    def test_partition_invariant(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.curation import quality_budget_select
        from p2_mapreduce_spark.session import load_table

        docs = load_table(spark, sf_dir, "documents")
        a = sorted(map(tuple, quality_budget_select(docs, 5000).collect()))
        b = sorted(
            map(
                tuple,
                quality_budget_select(docs.repartition(11), 5000).collect(),
            )
        )
        assert a == b


def test_weighted_sample_exact_k_biased_and_partition_invariant(spark, sf_dir):
    from p2_mapreduce_spark.operators.curation import weighted_sample
    from p2_mapreduce_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = weighted_sample(docs, k=100)
    ids = sorted(r.doc_id for r in got.collect())
    assert len(ids) == 100
    # partition-invariance: a different layout draws the same sample
    ids2 = sorted(
        r.doc_id for r in weighted_sample(docs.repartition(13), k=100).collect()
    )
    assert ids == ids2
    # weight bias: mean n_chars of the sample exceeds the corpus mean
    corpus_mean = docs.agg({"n_chars": "avg"}).collect()[0][0]
    sample_mean = got.agg({"n_chars": "avg"}).collect()[0][0]
    assert sample_mean > corpus_mean
    # scale contract: top-k heap merge, never a global sort
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_quality_calibration_pct_is_source_local(spark, sf_dir):
    from p2_mapreduce_spark.operators.curation import quality_calibration
    from p2_mapreduce_spark.session import load_table

    rows = quality_calibration(load_table(spark, sf_dir, "documents")).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (r.quality, r.doc_id))
        n = len(rs)
        assert rs[0].pct_in_source == 0.0
        assert rs[-1].pct_in_source == 1.0
        for i, r in enumerate(rs):
            assert r.pct_in_source == i / (n - 1)
    # a same-percentile cut keeps a fair share of EVERY source
    kept = [r for r in rows if r.pct_in_source >= 0.6]
    for src, rs in by_src.items():
        share = sum(1 for r in kept if r.source == src) / len(rs)
        assert 0.3 <= share <= 0.5


def test_length_batches_partition_invariant_and_low_padding(spark, sf_dir):
    from p2_mapreduce_spark.operators.curation import length_batches
    from p2_mapreduce_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {r.doc_id: (r.ordinal, r.batch_id)
         for r in length_batches(docs, batch_size=32).collect()}
    b = {r.doc_id: (r.ordinal, r.batch_id)
         for r in length_batches(docs, batch_size=32, partitions=7).collect()}
    assert a == b
    # ordinals are a permutation of 0..n-1 in (n_tokens, id) order
    assert sorted(o for o, _ in a.values()) == list(range(len(a)))
    # batching by length beats random batching on padding waste
    rows = length_batches(docs, batch_size=32).collect()
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r.batch_id, []).append(r.n_tokens)
    pad_sorted = sum(
        (max(v) - t) for v in by_batch.values() for t in v
    )
    import random

    rnd = random.Random(0)
    toks = [r.n_tokens for r in rows]
    rnd.shuffle(toks)
    rand_batches = [toks[i:i + 32] for i in range(0, len(toks), 32)]
    pad_random = sum((max(v) - t) for v in rand_batches for t in v)
    assert pad_sorted < pad_random / 4


def test_mixture_plan_water_filling_invariants(spark, sf_dir):
    from p2_mapreduce_spark.operators.curation import mixture_plan
    from p2_mapreduce_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    W = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    rows = {r.source: r for r in mixture_plan(docs, W, 4000).collect()}
    total_alloc = sum(r.allocated_tokens for r in rows.values())
    total_avail = sum(r.avail_tokens for r in rows.values())
    # budget exhausted (up to flooring), never exceeding availability
    assert total_alloc <= min(4000, total_avail)
    assert total_alloc >= min(4000, total_avail) - len(rows)
    for r in rows.values():
        assert r.allocated_tokens <= r.avail_tokens
    # at least one source caps out at this budget and its share spills
    assert any(r.capped for r in rows.values())
    assert any(not r.capped for r in rows.values())
    # uncapped allocations stay proportional to weights (same lambda)
    unc = [r for r in rows.values() if not r.capped]
    lams = {round(r.allocated_tokens / r.weight, -1) for r in unc}
    assert len(lams) == 1
    # budget above total availability: everything capped
    rows_hi = mixture_plan(docs, W, 10**9).collect()
    assert all(r.capped for r in rows_hi)
    assert sum(r.allocated_tokens for r in rows_hi) == total_avail


def test_cluster_sample_is_all_or_nothing_per_group(spark, sf_dir):
    """Every user is either fully kept or fully dropped — the property
    that distinguishes cluster sampling from row sampling — and the
    kept set is invariant to partitioning."""
    from pyspark.sql import functions as F

    from p2_mapreduce_spark.operators.curation import cluster_sample
    from p2_mapreduce_spark.session import load_table

    events = load_table(spark, sf_dir, "events")
    kept = cluster_sample(events)
    totals = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_all"))
    kept_per = kept.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_kept"))
    joined = totals.join(kept_per, "user_id", "left").select(
        "user_id", "n_all", F.coalesce("n_kept", F.lit(0)).alias("n_kept")
    )
    partial = joined.filter(
        (F.col("n_kept") != 0) & (F.col("n_kept") != F.col("n_all"))
    )
    assert partial.count() == 0
    assert 0 < kept.count() < events.count()
    again = cluster_sample(events.repartition(11)).count()
    assert again == kept.count()
