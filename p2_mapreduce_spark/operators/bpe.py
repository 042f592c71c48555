"""Byte-pair-encoding merge learning — the tokenizer-training step of an
LLM data pipeline, distributed.

Classic BPE (Sennrich et al., 2016) over a word-frequency table: words
start as character-symbol sequences; each round counts all ADJACENT
symbol pairs (every position counts — ``a a a`` holds two ``(a, a)``
pairs), merges the most frequent pair everywhere (greedy leftmost,
non-overlapping), and repeats.

Spark-first shape: the corpus contracts ONCE to the (word, freq) table —
every subsequent round runs at VOCABULARY grain, not corpus grain, which
is the whole trick for 100 TB: a billion documents share a few million
distinct words, and rounds never touch the fact table again.  Each round
is one pair-count aggregate (explode bigrams weighted by freq, map-side
combined) + a one-row argmax pulled to the driver (the merge decision is
a config-sized control value, like similarity.py's probe lists) + a
zero-shuffle re-segmentation map.  ``localCheckpoint`` truncates the
per-round lineage exactly like graph.py's iterative operators.

Determinism: counts are exact BIGINTs; argmax ties break
lexicographically on the pair; re-segmentation is a pure function of
(word, merge) — the learned merge list is identical under any
partitioning (pytest-pinned against a pure-Python reference).

Reference seed: tokenize+count (mapreduce/functions/wordcount.go:20-45)
is the word_freq_table pass; merge learning is extension surface per
BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from p2_mapreduce_spark.functions.text import tokens_array
from p2_mapreduce_spark.session import spread


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the one corpus-grain pass."""
    return (
        spread(docs)
        .select(F.explode(tokens_array(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def _char_spaced(word: Column) -> Column:
    """'abc' -> 'a b c': the initial symbol segmentation."""
    return F.array_join(F.split(word, ""), " ")


def pair_counts(segmented: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over a (w, freq) segmented-word
    table: ``(left, right, cnt)`` — every position counts, weighted by
    word frequency.  One map-side-combined aggregate at pair grain."""
    syms = F.split(F.col("w"), " ")
    n = F.size(syms)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(syms, 1, n - 1),
            F.slice(syms, 2, n - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        ),
    ).otherwise(F.expr("array()"))
    return (
        segmented.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Greedy leftmost non-overlapping merge of (left, right) over a
    symbol array, as an ``aggregate`` fold — NOT a string replace, which
    can false-match across symbol boundaries and mishandles overlapping
    runs ('a a a a' must become 'aa aa').  ``F.get`` (0-based) returns
    NULL on the empty accumulator, so the first symbol always appends —
    no ANSI out-of-bounds.  After a merge the last element becomes
    left+right ≠ left, so the freshly-merged symbol never chains into
    the next pair — exactly the non-overlap rule.  Pure codegen, zero
    shuffles."""
    last = lambda acc: F.get(acc, F.size(acc) - 1)  # noqa: E731
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, s: F.when(
            (last(acc) == F.lit(left)) & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(last(acc), s)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_learn(
    docs: DataFrame, n_merges: int = 5, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns ``[(left, right, count),
    …]`` in merge order.  Driver-side state is ONE (pair, count) row per
    round — the merge table is tokenizer config, not data."""
    wf = word_freq_table(docs, text_col)
    seg = wf.select(_char_spaced(F.col("word")).alias("w"), "freq").persist()
    merges: list[tuple[str, str, int]] = []
    cur = seg
    for _ in range(n_merges):
        top = (
            pair_counts(cur)
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] <= 0:
            break
        l, r, c = top[0]["left"], top[0]["right"], int(top[0]["cnt"])
        merges.append((l, r, c))
        cur = cur.select(
            F.array_join(
                _merge_fold(F.split(F.col("w"), " "), l, r), " "
            ).alias("w"),
            "freq",
        ).localCheckpoint()
    seg.unpersist()
    return merges


def bpe_segment_words(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge list to the corpus vocabulary: ``(word,
    freq, segmented)`` — the tokenizer's inference face, a zero-shuffle
    chain of merge folds over the vocabulary table."""
    wf = word_freq_table(docs, text_col)
    seg = wf.select("word", "freq", _char_spaced(F.col("word")).alias("w"))
    for l, r, _ in merges:
        seg = seg.select(
            "word",
            "freq",
            F.array_join(
                _merge_fold(F.split(F.col("w"), " "), l, r), " "
            ).alias("w"),
        )
    return seg.select("word", "freq", F.col("w").alias("segmented"))


def bpe_pair_table(
    docs: DataFrame, top_n: int = 20, text_col: str = "text"
) -> DataFrame:
    """Round-1 pair statistics (the oracle-checkable face of the
    learner): the ``top_n`` most frequent adjacent character pairs over
    the vocabulary, weighted by word frequency — exactly the table the
    first ``bpe_learn`` round argmaxes over."""
    wf = word_freq_table(docs, text_col)
    seg = wf.select(_char_spaced(F.col("word")).alias("w"), "freq")
    return (
        pair_counts(seg)
        .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
        .limit(int(top_n))
    )
