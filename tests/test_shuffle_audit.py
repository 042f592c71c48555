"""Measured shuffle-volume contracts for marquee scale claims.

Every operator docstring in this engine states a "shape at 100 TB";
these tests turn four of the strongest claims into MEASURED assertions:
materialize the operator, read the executors' actual shuffle write
bytes (plans/shuffle_audit.py), and bound them against the input's own
byte volume computed from the same data.  The bounds are inequalities
against input-derived quantities — not golden constants — so they hold
at any scale factor and stay meaningful when the fixture grows.

Shuffle writes are lz4-compressed on disk, which only HELPS every
upper-bound assertion here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from p2_mapreduce_spark.plans.shuffle_audit import measure_shuffle_bytes
from p2_mapreduce_spark.session import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_exact_dedup_shuffles_digests_not_corpus(spark, docs):
    """exact_dedup's claim: the shuffle key is a 32-byte md5, so the
    exchange carries hashes, not documents.  Measured: shuffle bytes
    under half the corpus text bytes (the true ratio is ~1% at real
    document lengths; /2 keeps the assertion safe for tiny fixtures
    where per-record shuffle framing dominates)."""
    from p2_mapreduce_spark.operators.dedup import exact_dedup

    text_bytes = docs.select(
        F.sum(F.octet_length("text")).alias("b")
    ).collect()[0]["b"]
    shuffled = measure_shuffle_bytes(exact_dedup(docs))
    assert shuffled < text_bytes / 2, (shuffled, text_bytes)


def test_gram_matrix_shuffle_independent_of_rows(spark, sf_dir):
    """gram_matrix's claim: the only shuffle is the (i,j)-grain
    partial→final SUM — d(d+1)/2 keys × #partitions, independent of N.
    Measured bound: partitions × d² × 64 bytes/key, which is orders of
    magnitude below the N·d² explode volume a naive plan would ship."""
    from p2_mapreduce_spark.operators.similarity import gram_matrix

    emb = load_table(spark, sf_dir, "embeddings")
    d = len(emb.select("embedding").first()["embedding"])
    n_parts = emb.rdd.getNumPartitions()
    shuffled = measure_shuffle_bytes(gram_matrix(emb))
    assert shuffled < max(n_parts, 32) * d * d * 64, (shuffled, d, n_parts)


def test_wordcount_combiner_contracts_tokens(spark, docs):
    """M7's associative map-side combine: the reduce exchange carries
    (word, partial count) per partition — vocabulary grain — not one
    record per token occurrence (token volume stays executor-local).

    The input is pre-spread so ``spread()``'s one-time local-fixture
    repartition (a no-op at scale, where scans arrive with enough
    splits) doesn't pollute the measured reduce exchange — without it
    the raw-doc shuffle dwarfs the vocabulary-grain combine output."""
    from p2_mapreduce_spark.operators.text import wordcount
    from p2_mapreduce_spark.session import spread

    pre = spread(docs).persist()
    try:
        pre.count()
        token_bytes = pre.select(
            F.sum(F.octet_length("text")).alias("b")
        ).collect()[0]["b"]
        shuffled = measure_shuffle_bytes(wordcount(pre))
    finally:
        pre.unpersist()
    assert shuffled < token_bytes / 10, (shuffled, token_bytes)


def test_pack_sequences_shuffles_data_once(spark, docs):
    """pack_sequences' two-phase prefix sum: one range repartition of the
    data plus partition-grain offset rows — the shuffle must stay within
    a small multiple of the input volume (no iterative reshuffling, no
    window funnel replicating the corpus)."""
    from p2_mapreduce_spark.operators.curation import pack_sequences

    input_bytes = docs.select(
        F.sum(F.octet_length("text") + 64).alias("b")
    ).collect()[0]["b"]
    shuffled = measure_shuffle_bytes(pack_sequences(docs))
    assert shuffled < 3 * input_bytes, (shuffled, input_bytes)


def test_semantic_contamination_shuffles_nothing(spark, sf_dir):
    """semantic_contamination's claim: the benchmark inlines as
    literals and the whole operator is one zero-shuffle projection —
    measured shuffle bytes are EXACTLY zero (a groupBy formulation
    would ship corpus × n_bench rows)."""
    from p2_mapreduce_spark.operators.similarity import semantic_contamination

    emb = load_table(spark, sf_dir, "embeddings")
    shuffled = measure_shuffle_bytes(semantic_contamination(emb, n_bench=8))
    assert shuffled == 0, shuffled


def test_hybrid_rrf_fusion_adds_config_grain_shuffle_only(spark, sf_dir, docs):
    """hybrid_search's claim: RRF fusion itself is config-grain — the
    candidate lists are LIMITed, so fusing adds only a ≤2·top-N-row
    exchange ON TOP of what the two retrievers already shuffle.
    Measured as a DELTA: hybrid's shuffle minus the standalone BM25 and
    kNN shuffles stays under 64 KiB (≤100 fused rows + framing), no
    matter the corpus size."""
    from p2_mapreduce_spark.operators.search import bm25_search, hybrid_search
    from p2_mapreduce_spark.operators.similarity import knn_bruteforce

    emb = load_table(spark, sf_dir, "embeddings")
    terms = ["spark", "table", "window"]
    base = measure_shuffle_bytes(
        bm25_search(docs, terms, top_n=50)
    ) + measure_shuffle_bytes(knn_bruteforce(emb, n_queries=1, k=50))
    total = measure_shuffle_bytes(hybrid_search(docs, emb, terms))
    assert total - base < 64 * 1024, (total, base)


def test_seq_pattern_shuffle_is_letter_grain(spark, sf_dir):
    """seq_pattern's claim: the user-grain collect ships (ts, id,
    letter) structs — a small CONSTANT per event, independent of the
    row's width (the JSON props column never crosses the wire).
    Measured: < 48 bytes/event including lz4-framed map-output
    overhead, vs the ~100+ bytes/event a raw-row shuffle ships."""
    from p2_mapreduce_spark.operators.events_analytics import seq_pattern

    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    shuffled = measure_shuffle_bytes(seq_pattern(ev))
    assert shuffled < n_events * 48, (shuffled, n_events)


def test_kmeans_shuffle_independent_of_corpus(spark, sf_dir):
    """kmeans_embeddings' claim: the corpus NEVER shuffles — per round
    the only exchange is the (cluster, dim)-grain partial→final SUM
    (k·d keys × #partitions), plus one cluster-grain final aggregate.
    Measured across the WHOLE pipeline (the iteration jobs run eagerly
    at construction, so the counter brackets construction +
    materialization): bounded by (iterations + 1) × partitions × k·d
    × 64 bytes — a quantity with NO corpus-size term in it."""
    from p2_mapreduce_spark.operators.similarity import kmeans_embeddings
    from p2_mapreduce_spark.plans.shuffle_audit import (
        total_shuffle_write_bytes,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    d = len(emb.select("embedding").first()["embedding"])
    n_parts = max(emb.rdd.getNumPartitions(), 32)
    k, iterations = 4, 2
    before = total_shuffle_write_bytes(spark)
    out = kmeans_embeddings(emb, k=k, iterations=iterations)
    out.write.format("noop").mode("overwrite").save()
    shuffled = total_shuffle_write_bytes(spark) - before
    bound = (iterations + 1) * n_parts * k * d * 64
    assert shuffled < bound, (shuffled, bound)
