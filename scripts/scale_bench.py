#!/usr/bin/env python3
"""Measure sf0.1 -> sf1 (10x) time ratios for the heavy query families.

Runs a fixed panel of queries() ids at /root/testdata/sf0.1 and at the
gen_scale.py output (default /tmp/scale_sf1), min-of-2 timing each, and
prints a JSON record plus a markdown table for SCALE.md.  The sf1 data
has the same schemas and key-cardinality shape as the driver's tables
(scripts/gen_scale.py) but its own hash seed — this run validates TIME
scaling, not values (the driver's three scales already pin correctness).

Usage: python3 scripts/scale_bench.py [--small DIR] [--big DIR] [--out F]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Panel: one id per heavy family (see SCALE.md for the family mapping).
PANEL = (
    "agg_pricing",            # full-scan aggregate (map-side combine)
    "join_orders_customer",   # shuffle hash join at fact grain
    "volume_shipping",        # TPC-H multi-join + agg
    "topk_window",            # partitioned window rank
    "dedup_minhash",          # MinHash-LSH banded candidate join
    "dedup_allpairs",         # prefix-filtered AllPairs set-similarity
    "winnow_fingerprints",    # in-row winnowing fold
    "knn_embeddings",         # brute-force cosine top-k (quadratic face)
    "knn_multiprobe",         # LSH-bucketed kNN (the scale path)
    "classifier_auc",         # two-phase distributed rank-sum
    "sssp_trade",             # iterative graph (bounded Bellman-Ford)
    # NOT triangle_census: the co-supply graph densifies toward complete
    # as supplier count grows (every part ties ~30 suppliers; by 10k
    # suppliers the edge set is ~quadratic in nodes), so the EXACT
    # census is super-linear by construction — triangle_doulion is the
    # designed scale path for dense graphs and is what we ratio here.
    "triangle_doulion",       # sampled triangle estimate (dense graphs)
    "markov_attribution",     # path-matrix absorption (event sequences)
    "lm_bigram_score",        # vocabulary-grain text aggregates
    "pmi_bigrams",            # bigram PMI at vocab grain
    "media_frames",           # MJPEG demux + decode at doc grain
    "logrank",                # day-grain survival suffix sums
    "cohort_retention",       # events cohort matrix
    # round-9 standing additions
    "avi_demux_av",           # two-stream AVI demux + JPEG/PCM kernels
    "dup_edge_support",       # ORIENTED wedge join over the pair graph
    "hits_trade",             # 2-iter integer HITS power iteration
    "hilbert_cluster",        # chained-projection curve fold
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/tmp/scale_sf1")
    ap.add_argument("--out", default="/tmp/scale_bench.json")
    ap.add_argument("names", nargs="*", help="subset of PANEL ids to run")
    args = ap.parse_args()
    panel = tuple(args.names) or PANEL

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    from p2_mapreduce_spark.session import get_spark

    spark = get_spark("scale-bench")
    qs = entry.queries()
    results: dict[str, dict[str, float]] = {}
    for name in panel:
        fn = qs[name]
        row: dict[str, float] = {}
        for label, sf_dir in (("sf0.1", args.small), ("sf1", args.big)):
            samples = []
            for _ in range(2):
                t0 = time.monotonic()
                n = fn(spark, sf_dir).count()
                samples.append(time.monotonic() - t0)
            row[label] = min(samples)
            row[f"{label}_rows"] = n
            spark.catalog.clearCache()
        row["ratio"] = row["sf1"] / row["sf0.1"] if row["sf0.1"] else float("nan")
        results[name] = row
        print(
            f"{name:24s} sf0.1={row['sf0.1']:7.2f}s sf1={row['sf1']:7.2f}s "
            f"ratio={row['ratio']:5.1f}x rows {int(row['sf0.1_rows'])}->"
            f"{int(row['sf1_rows'])}",
            flush=True,
        )
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("\n| query | sf0.1 (s) | sf1 (s) | ratio |")
    print("|---|---|---|---|")
    for name, row in results.items():
        print(
            f"| {name} | {row['sf0.1']:.2f} | {row['sf1']:.2f} "
            f"| {row['ratio']:.1f}x |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
