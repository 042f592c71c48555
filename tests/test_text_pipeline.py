"""Semantics + plan pins for the round-2 text-pipeline operators
(vocab building, OOV scoring, PMI collocations, the composed curation
decision) and the Q6/Q11/Q20-analog warehouse queries."""

import pyspark.sql.functions as F

import __spark_entry__ as entry_mod
from p2_mapreduce_spark.operators.curation import curation_decision
from p2_mapreduce_spark.operators.text_analysis import (
    build_vocab,
    oov_stats,
    pmi_bigrams,
)
from p2_mapreduce_spark.plans import plan_report


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_build_vocab_rank_ids(spark):
    docs = _docs(
        spark,
        [(1, "b b b a a c"), (2, "a b z")],
    )
    rows = {r["token"]: (r["token_id"], r["cnt"]) for r in build_vocab(docs, k=3).collect()}
    # b:4 > a:3 > c:1==z:1 but k=3 cuts at c (lexicographic tie-break)
    assert rows == {"b": (0, 4), "a": (1, 3), "c": (2, 1)}


def test_oov_stats_counts(spark):
    docs = _docs(
        spark,
        [(1, "the the the cat"), (2, "qqq zzz the")],
    )
    out = {r["doc_id"]: r for r in oov_stats(docs, vocab_k=1).collect()}
    # vocab = {the}; doc 1: 1 OOV of 4; doc 2: 2 OOV of 3
    assert out[1]["n_tokens"] == 4 and out[1]["n_oov"] == 1
    assert out[2]["n_tokens"] == 3 and out[2]["n_oov"] == 2
    assert out[2]["oov_rate"] == 2.0 / 3.0


def test_pmi_prefers_collocation(spark):
    # "new york" always together; "the" everywhere -> low lift for the-*
    docs = _docs(
        spark,
        [(i, "the new york trip the fun") for i in range(6)],
    )
    rows = pmi_bigrams(docs, min_count=5, k=3).collect()
    top = (rows[0]["w1"], rows[0]["w2"])
    assert top in {("new", "york"), ("york", "trip")}  # lift 6 > any the-pair
    lifts = {(r["w1"], r["w2"]): r["lift"] for r in rows}
    assert all(
        lifts[p] >= lifts.get(("the", "new"), 0.0) for p in [("new", "york")]
    )


def test_pmi_single_token_docs_no_bigrams(spark):
    docs = _docs(spark, [(1, "solo"), (2, "")])
    assert pmi_bigrams(docs, min_count=1, k=10).count() == 0


def test_curation_decision_reasons(spark):
    good = "the cat and the dog went to the house in the morning and all was good "
    docs = spark.createDataFrame(
        [
            (1, good * 3, "en"),  # canonical, en, decent quality -> kept
            (2, good * 3, "en"),  # exact dup of 1 -> duplicate
            (3, "zzz qqq 123", "en"),  # no markers -> language
            (4, "the@@@@#####&&&&" * 10, "en"),  # en marker, junk -> quality
        ],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r for r in curation_decision(docs).collect()}
    assert out[1]["keep"] and out[1]["reason"] == "kept"
    assert not out[2]["keep"] and out[2]["reason"] == "duplicate"
    assert not out[2]["is_canonical"]
    assert out[3]["reason"] == "language"
    assert out[4]["reason"] == "quality"


def test_curation_decision_single_scan_plan(spark, sf_dir):
    r = plan_report(entry_mod.queries()["curation_decision"](spark, sf_dir))
    assert not r["has_python_worker"]


def test_revenue_forecast_pushdown(spark, sf_dir):
    from p2_mapreduce_spark.operators.tpch import revenue_forecast
    from p2_mapreduce_spark.session import load_table

    df = revenue_forecast(load_table(spark, sf_dir, "lineitem"))
    r = plan_report(df)
    pushed = " ".join(r["pushed_filters"])
    assert "l_shipdate" in pushed and "l_discount" in pushed
    assert r["has_partial_agg"]
    assert not r["has_python_worker"]


def test_important_parts_no_second_fact_scan(spark, sf_dir):
    from p2_mapreduce_spark.operators.tpch import important_parts
    from p2_mapreduce_spark.session import load_table

    df = important_parts(load_table(spark, sf_dir, "lineitem"))
    r = plan_report(df)
    # the per-part table is persisted: both the global total and the
    # share projection read the cache, so the fact scan appears once
    # (inside the InMemoryRelation definition), and the one-row total
    # joins as a broadcast nested-loop degenerate case
    assert "InMemoryTableScan" in r["plan"]
    assert "BroadcastNestedLoopJoin" in r["plan"]
    # every part's share sums to ~1 over the unfiltered variant
    rows = important_parts(
        load_table(spark, sf_dir, "lineitem"), threshold_ppm=0
    ).collect()
    assert abs(sum(x["share"] for x in rows) - 1.0) < 1e-9


def test_dominant_suppliers_semantics(spark):
    from p2_mapreduce_spark.operators.tpch import dominant_suppliers

    li = spark.createDataFrame(
        [
            # part 10: s1 ships 80 of 100 -> dominated (2 suppliers)
            (1, 10, 80.0),
            (2, 10, 20.0),
            # part 20: sole supplier -> excluded (not contested)
            (1, 20, 50.0),
            # part 30: even split -> no dominator at 0.6
            (1, 30, 50.0),
            (2, 30, 50.0),
        ],
        "l_suppkey long, l_partkey long, l_quantity double",
    )
    sup = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "s_suppkey long, s_name string"
    )
    rows = dominant_suppliers(li, sup, min_share=0.6).collect()
    assert len(rows) == 1
    assert rows[0]["s_suppkey"] == 1
    assert rows[0]["n_dominated_parts"] == 1
    assert rows[0]["dominated_qty"] == 80.0


def test_rarity_score_orders_gibberish_above_common_text(spark):
    from p2_mapreduce_spark.operators.text_analysis import rarity_score

    docs = spark.createDataFrame(
        [
            (1, "the the the the the the the the"),
            (2, "the qzx vrbk jjqw zzpt the the the"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.rarity_ppm for r in rarity_score(docs).collect()}
    assert got[2] > got[1]
    # doc1 is all 'the': cnt('the') = 8 + 4 = 12 of N = 16 tokens, so
    # every term (and the mean) is floor(1e6 * 16 / 12)
    assert got[1] == int(1_000_000.0 * 16 / 12)


def test_distinctive_tokens_surfaces_planted_vocabulary(spark):
    """A token 5x over-represented in one source must rank #1 there,
    with the exact integer lift."""
    common = "alpha beta gamma delta " * 6
    docs = spark.createDataFrame(
        [
            (i, common + ("zebra " * (5 if i >= 40 else 1)),
             "b" if i >= 40 else "a")
            for i in range(80)
        ],
        "doc_id long, text string, source string",
    )
    from p2_mapreduce_spark.operators.text_analysis import distinctive_tokens

    got = distinctive_tokens(docs, top_k=3, min_tf=20).collect()
    top_b = [r for r in got if r.source == "b" and r.rk == 1][0]
    assert top_b.token == "zebra"
    assert top_b.tf_source == 200 and top_b.tf_rest == 40
    n_b = 40 * (24 + 5)
    n_a = 40 * (24 + 1)
    assert top_b.lift_ppm == (200 * n_a * 1_000_000) // (40 * n_b)
    # and 'zebra' is the LEAST distinctive of source a (under-used there)
    a_rows = sorted(
        (r for r in got if r.source == "a"), key=lambda r: r.rk
    )
    assert all(r.token != "zebra" or r.rk == a_rows[-1].rk for r in a_rows)
