#!/usr/bin/env python3
"""Generate scale-test tables ABOVE the driver's sf0.1 (for SCALE.md).

The driver materializes sf{0.001,0.01,0.1} read-only (TESTDATA.md); the
100 TB scaling claims need at least one 10x point, so this script
synthesizes an sfN directory with the SAME schemas and the same
key-cardinality/selectivity SHAPE (hash-derived deterministic values,
TPC-H-ish proportions: lineitem ~4 lines/order, 10 customers/order key
space, 20 doc sources, 5 event types over a 30-day window, 64-dim
embeddings).  Values are NOT the driver's (seed differs) — this data is
for sf0.1 -> sf1 TIME ratios, not for oracle correctness, which the
driver data already covers at three scales.

Usage:  python3 scripts/gen_scale.py [--mult 10] [--out /tmp/scale_sf1]

Everything is generated with spark.range + column expressions — no
driver-side loops, no Python UDFs — so generating 6M lineitem rows
takes seconds on local[32].
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from p2_mapreduce_spark.session import get_spark  # noqa: E402

#: sf0.1 row counts (TESTDATA.md / measured) — the generator scales these.
BASE = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,  # derived: ~4 lines/order
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}

VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data vector join shuffle cache disk node task stage plan index read "
    "write block page file"
).split()

SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
PRIORITIES = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
)
PTYPES = ("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
PADJ = ("large", "hot", "blue", "red", "dark", "pale", "small", "new")
PNOUN = ("ring", "bolt", "case", "drum", "tube", "disk", "cap", "rod")
LANGS = ("en", "en", "en", "es", "fr", "de", "zh")  # ~40% en like sf0.1
ETYPES = ("view", "click", "signup", "purchase", "error")


def _h(*cols):
    """Deterministic nonneg 63-bit hash of the given columns."""
    return F.abs(F.xxhash64(*[F.lit(c) if isinstance(c, str) else c for c in cols]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10, help="multiple of sf0.1")
    ap.add_argument("--out", default="/tmp/scale_sf1")
    args = ap.parse_args()
    mult, out = args.mult, args.out
    spark = get_spark("gen-scale")
    os.makedirs(out, exist_ok=True)

    def rng(n, name="id"):
        return spark.range(n).withColumnRenamed("id", name)

    def write(df, name):
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {df.count()} rows")

    # region / nation: fixed tiny dimensions — copy the driver's
    for t in ("region", "nation"):
        spark.read.parquet(f"/root/testdata/sf0.1/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{t}.parquet"))
        print(f"{t}: copied")

    n_cust = BASE["customer"] * mult
    n_supp = BASE["supplier"] * mult
    n_part = BASE["part"] * mult
    n_ord = BASE["orders"] * mult
    n_ev = BASE["events"] * mult
    n_doc = BASE["documents"] * mult
    n_emb = BASE["embeddings"] * mult

    seg = F.array(*[F.lit(s) for s in SEGMENTS])
    write(
        rng(n_cust, "c_custkey").select(
            F.col("c_custkey"),
            F.format_string("Customer#%09d", F.col("c_custkey")).alias("c_name"),
            F.pmod(_h("cn", F.col("c_custkey")), F.lit(25)).cast("int").alias("c_nationkey"),
            (F.pmod(_h("cb", F.col("c_custkey")), F.lit(1100000)) / 100.0 - 1000.0).alias("c_acctbal"),
            F.element_at(seg, (F.pmod(_h("cs", F.col("c_custkey")), F.lit(5)) + 1).cast("int")).alias("c_mktsegment"),
        ),
        "customer",
    )
    write(
        rng(n_supp, "s_suppkey").select(
            F.col("s_suppkey"),
            F.format_string("Supplier#%09d", F.col("s_suppkey")).alias("s_name"),
            F.pmod(_h("sn", F.col("s_suppkey")), F.lit(25)).cast("int").alias("s_nationkey"),
            (F.pmod(_h("sb", F.col("s_suppkey")), F.lit(1000000)) / 100.0).alias("s_acctbal"),
        ),
        "supplier",
    )
    adj = F.array(*[F.lit(s) for s in PADJ])
    noun = F.array(*[F.lit(s) for s in PNOUN])
    ptype = F.array(*[F.lit(s) for s in PTYPES])
    write(
        rng(n_part, "p_partkey").select(
            F.col("p_partkey"),
            F.concat_ws(
                " ",
                F.element_at(adj, (F.pmod(_h("pa", F.col("p_partkey")), F.lit(8)) + 1).cast("int")),
                F.element_at(noun, (F.pmod(_h("pn", F.col("p_partkey")), F.lit(8)) + 1).cast("int")),
            ).alias("p_name"),
            F.format_string("Brand#%d", (F.pmod(_h("pb", F.col("p_partkey")), F.lit(25)) + 1).cast("int")).alias("p_brand"),
            F.element_at(ptype, (F.pmod(_h("pt", F.col("p_partkey")), F.lit(6)) + 1).cast("int")).alias("p_type"),
            (F.pmod(_h("ps", F.col("p_partkey")), F.lit(50)) + 1).cast("int").alias("p_size"),
            (900.0 + F.pmod(_h("pp", F.col("p_partkey")), F.lit(10000)) / 100.0).alias("p_retailprice"),
        ),
        "part",
    )
    prio = F.array(*[F.lit(s) for s in PRIORITIES])
    orders = rng(n_ord, "o_orderkey").select(
        F.col("o_orderkey"),
        F.pmod(_h("oc", F.col("o_orderkey")), F.lit(n_cust)).alias("o_custkey"),
        F.element_at(
            F.array(F.lit("O"), F.lit("P"), F.lit("F")),
            (F.pmod(_h("os", F.col("o_orderkey")), F.lit(3)) + 1).cast("int"),
        ).alias("o_orderstatus"),
        (1000.0 + F.pmod(_h("op", F.col("o_orderkey")), F.lit(49900000)) / 100.0).alias("o_totalprice"),
        F.timestamp_seconds(
            F.lit(788918400)  # 1995-01-01 UTC, day-grain over ~6.5y
            + F.pmod(_h("od", F.col("o_orderkey")), F.lit(2400)).cast("bigint") * 86400
        ).alias("o_orderdate"),
        F.element_at(prio, (F.pmod(_h("opr", F.col("o_orderkey")), F.lit(5)) + 1).cast("int")).alias("o_orderpriority"),
        (F.pmod(_h("onl", F.col("o_orderkey")), F.lit(7)) + 1).cast("int").alias("nl"),
    )
    orders.persist()
    write(orders.drop("nl"), "orders")
    rf = F.array(F.lit("A"), F.lit("N"), F.lit("R"))
    ls = F.array(F.lit("O"), F.lit("F"))
    li = orders.select(
        "o_orderkey", "o_orderdate", F.explode(F.sequence(F.lit(1), F.col("nl"))).alias("l_linenumber")
    )
    lk = _h("lk", F.col("o_orderkey"), F.col("l_linenumber"))
    write(
        li.select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.pmod(lk, F.lit(n_part)).alias("l_partkey"),
            F.pmod(_h("lsk", lk), F.lit(n_supp)).alias("l_suppkey"),
            F.col("l_linenumber").cast("int"),
            (F.pmod(_h("lq", lk), F.lit(50)) + 1).cast("double").alias("l_quantity"),
            (900.0 + F.pmod(_h("lep", lk), F.lit(10400000)) / 100.0).alias("l_extendedprice"),
            (F.pmod(_h("ld", lk), F.lit(11)) / 100.0).alias("l_discount"),
            (F.pmod(_h("lt", lk), F.lit(9)) / 100.0).alias("l_tax"),
            F.element_at(rf, (F.pmod(_h("lrf", lk), F.lit(3)) + 1).cast("int")).alias("l_returnflag"),
            F.element_at(ls, (F.pmod(_h("lls", lk), F.lit(2)) + 1).cast("int")).alias("l_linestatus"),
            (F.col("o_orderdate") + F.make_interval(days=F.pmod(_h("lsd", lk), F.lit(95)).cast("int"))).alias("l_shipdate"),
        ),
        "lineitem",
    )
    orders.unpersist()

    et = F.array(*[F.lit(s) for s in ETYPES])
    write(
        rng(n_ev, "event_id").select(
            F.col("event_id"),
            F.timestamp_micros(
                F.lit(1704067200000000)  # 2024-01-01 UTC in micros
                + F.pmod(_h("ets", F.col("event_id")), F.lit(30 * 86400 * 1000000)).cast("bigint")
            ).alias("ts"),
            # user cardinality scales with --mult so a 10x dataset has
            # 10x MORE users at the same per-user event density (not
            # 10x-denser chains), preserving the user-grain window /
            # sessionize scaling shape the panel reports.
            F.pmod(_h("eu", F.col("event_id")), F.lit(15_000 * mult)).alias("user_id"),
            F.element_at(et, (F.pmod(_h("ee", F.col("event_id")), F.lit(5)) + 1).cast("int")).alias("event_type"),
            (F.pmod(_h("ev", F.col("event_id")), F.lit(100000)) / 100.0).alias("value"),
            F.format_string('{"k": %d}', F.pmod(_h("ek", F.col("event_id")), F.lit(100)).cast("int")).alias("props"),
        ),
        "events",
    )

    vocab = F.array(*[F.lit(wd) for wd in VOCAB])
    langs = F.array(*[F.lit(s) for s in LANGS])
    docs = rng(n_doc, "doc_id").withColumn(
        # near-dup seeding like real corpora: every 50th doc repeats the
        # previous doc's text (same hash seed) plus one extra token
        "seed",
        F.when(F.pmod(F.col("doc_id"), F.lit(50)) == 1, F.col("doc_id") - 1).otherwise(F.col("doc_id")),
    )
    nw = (F.pmod(_h("dn", F.col("seed")), F.lit(86)) + 15).cast("int")
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), nw),
            lambda i: F.element_at(vocab, (F.pmod(_h("dw", F.col("seed"), i), F.lit(len(VOCAB))) + 1).cast("int")),
        ),
    )
    text = F.when(
        F.pmod(F.col("doc_id"), F.lit(50)) == 1, F.concat(text, F.lit(" extra"))
    ).otherwise(text)
    write(
        docs.select(
            "doc_id",
            text.alias("text"),
            F.element_at(langs, (F.pmod(_h("dl", F.col("doc_id")), F.lit(len(LANGS))) + 1).cast("int")).alias("lang"),
            F.format_string("src%d", F.pmod(F.col("doc_id"), F.lit(20)).cast("int")).alias("source"),
            F.length(text).alias("n_chars"),
        ),
        "documents",
    )

    write(
        rng(n_emb, "vec_id").select(
            "vec_id",
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda j: (F.pmod(_h("em", F.col("vec_id"), j), F.lit(2001)) / 1000.0 - 1.0).cast("float"),
            ).alias("embedding"),
            F.pmod(F.col("vec_id"), F.lit(10)).cast("int").alias("label"),
        ),
        "embeddings",
    )
    spark.stop()


if __name__ == "__main__":
    main()
