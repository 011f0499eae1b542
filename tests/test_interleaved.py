"""Interleaved text+media span family (operators/interleaved.py):
derivation rule, caption pairing, multimodal packing — semantics,
edge cases, and plan pins (zero-shuffle captions, one-exchange pack).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from rca_pdf_extraction_pipeline_spark.operators import interleaved as I

SPAN_SCHEMA = ("doc_id long, spans array<struct<kind:string,text:string,"
               "media_ref:string,offset:int>>")


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t)
                                  for i, t in rows], "doc_id long, text string")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---- synth_interleaved -----------------------------------------------------


def test_synth_rule_hand_check(spark):
    # 20 tokens, span_tokens=8 -> 3 text chunks (8, 8, 4); media after
    # every 3rd text span -> T T T M, media_ref img_7_1
    text = " ".join(f"w{i}" for i in range(20))
    out = I.synth_interleaved(_docs(spark, [(7, text)])) \
        .select(F.explode("spans").alias("s")).select("s.*").collect()
    assert [r.kind for r in out] == ["text", "text", "text", "image"]
    assert [r.offset for r in out] == [0, 1, 2, 3]
    assert out[0].text == " ".join(f"w{i}" for i in range(8))
    assert out[2].text == " ".join(f"w{i}" for i in range(16, 20))
    assert out[3].media_ref == "img_7_1" and out[3].text is None
    assert all(r.media_ref is None for r in out[:3])


def test_synth_no_trailing_media_below_threshold(spark):
    # 2 chunks < media_every=3 -> no media span at all
    out = I.synth_interleaved(_docs(spark, [(1, " ".join(["x"] * 9))])) \
        .select(F.size("spans").alias("n"),
                F.exists("spans", lambda s: s["kind"] == "image").alias("m")) \
        .collect()[0]
    assert out.n == 2 and out.m is False


def test_synth_empty_and_whitespace_docs(spark):
    out = I.synth_interleaved(_docs(spark, [(1, ""), (2, "   "), (3, "a b")])) \
        .select("doc_id", F.size("spans").alias("n")).collect()
    n = {r.doc_id: r.n for r in out}
    assert n == {1: 0, 2: 0, 3: 1}


def test_synth_guards(spark):
    docs = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        I.synth_interleaved(docs, span_tokens=0)
    with pytest.raises(ValueError):
        I.synth_interleaved(docs, media_every=0)


# ---- caption_pairs ---------------------------------------------------------


def test_caption_nearest_preceding_text(spark):
    inter = spark.createDataFrame([
        (1, [("text", "alpha", None, 0), ("image", None, "m1", 1),
             ("text", "beta", None, 2), ("text", "gamma", None, 3),
             ("image", None, "m2", 4)]),
    ], SPAN_SCHEMA)
    rows = {r.media_ref: r for r in I.caption_pairs(inter).collect()}
    assert rows["m1"].caption == "alpha" and rows["m1"].caption_offset == 0
    assert rows["m2"].caption == "gamma" and rows["m2"].caption_offset == 3
    assert rows["m2"].media_offset == 4


def test_caption_media_first_is_null_and_order_is_data(spark):
    # reading order comes from the offset field, NOT array position:
    # the shuffled array must give identical pairs
    inter = spark.createDataFrame([
        (1, [("text", "late", None, 2), ("image", None, "m0", 0),
             ("image", None, "m3", 3)]),
    ], SPAN_SCHEMA)
    rows = {r.media_ref: r for r in I.caption_pairs(inter).collect()}
    assert rows["m0"].caption is None and rows["m0"].caption_offset is None
    assert rows["m3"].caption == "late" and rows["m3"].caption_offset == 2


def test_caption_plan_is_narrow(spark):
    inter = I.synth_interleaved(_docs(spark, [(1, "a b c")]))
    plan = _plan(I.caption_pairs(inter))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


# ---- pack_interleaved ------------------------------------------------------


def test_pack_budget_rule_hand_check(spark):
    # costs: text(3) text(2) image(16) text(4) under budget 20:
    # cum-cost starts 0,3,5,21 -> seq 0,0,0,1
    inter = spark.createDataFrame([
        (1, [("text", "a b c", None, 0), ("text", "d e", None, 1),
             ("image", None, "m1", 2), ("text", "f g h i", None, 3)]),
    ], SPAN_SCHEMA)
    out = {r.seq_id: r for r in
           I.pack_interleaved(inter, budget_tokens=20, media_cost=16)
            .collect()}
    assert out[0].n_spans == 3 and out[0].n_text == 2 and out[0].n_media == 1
    assert out[0].seq_tokens == 21  # last span may overhang its bin
    assert out[1].n_spans == 1 and out[1].seq_tokens == 4


def test_pack_totals_conserved(spark):
    docs = _docs(spark, [(i, " ".join(f"t{i}_{j}" for j in range(i * 7 + 1)))
                         for i in range(12)])
    inter = I.synth_interleaved(docs)
    packed = I.pack_interleaved(inter, budget_tokens=32, media_cost=8)
    got = packed.groupBy().agg(
        F.sum("n_text").alias("t"), F.sum("n_media").alias("m"),
        F.sum("seq_tokens").alias("tok")).collect()[0]
    ex = inter.select(F.explode("spans").alias("s"))
    want_t = ex.filter(F.col("s.kind") == "text").count()
    want_m = ex.filter(F.col("s.kind") == "image").count()
    assert (got.t, got.m) == (want_t, want_m)
    # every sequence id is contiguous from 0 within its doc
    per_doc = packed.groupBy("doc_id").agg(
        F.min("seq_id").alias("lo"), F.max("seq_id").alias("hi"),
        F.count("*").alias("n")).collect()
    assert all(r.lo == 0 and r.n == r.hi + 1 for r in per_doc)


def test_pack_plan_single_exchange(spark):
    inter = I.synth_interleaved(_docs(spark, [(1, "a b c d e")]))
    plan = _plan(I.pack_interleaved(inter))
    # the groupBy reuses the window's hash partitioning on doc_id:
    # exactly one Exchange in the whole plan
    assert plan.count("Exchange") == 1, plan[:2000]
    assert "EvalPython" not in plan


def test_pack_guards(spark):
    inter = I.synth_interleaved(_docs(spark, [(1, "a")]))
    with pytest.raises(ValueError):
        I.pack_interleaved(inter, budget_tokens=0)
    with pytest.raises(ValueError):
        I.pack_interleaved(inter, media_cost=0)


# ---- span_diff -------------------------------------------------------------


def test_span_diff_verdicts_hand_check(spark):
    left = spark.createDataFrame([
        (1, [("text", "a", None, 0), ("image", None, "m1", 1)]),
        (2, [("text", "x", None, 0)]),
        (3, [("text", "q", None, 0)]),
        (5, []),
    ], SPAN_SCHEMA)
    right = spark.createDataFrame([
        # doc 1: identical sequence, array deliberately scrambled —
        # comparison must normalize to offset order, not array order
        (1, [("image", None, "m1", 1), ("text", "a", None, 0)]),
        (2, [("text", "x", None, 0), ("text", "y", None, 1)]),
        (4, [("text", "new", None, 0)]),
        (5, []),
    ], SPAN_SCHEMA)
    out = {r.doc_id: r for r in I.span_diff(left, right).collect()}
    assert out[1].verdict == "equal" and out[1].first_diff_offset is None
    assert (out[1].n_left, out[1].n_right) == (2, 2)
    # doc 2: equal prefix, right longer -> first diff at the extra slot
    assert out[2].verdict == "diverged" and out[2].first_diff_offset == 1
    assert out[3].verdict == "left_only" and out[3].n_right is None
    assert out[3].n_left == 1
    assert out[4].verdict == "right_only" and out[4].n_left is None
    # doc 5: two empty sequences are equal (and sequence(0,-1) must
    # not fire — Spark's sequence() is descending for start > stop)
    assert out[5].verdict == "equal" and (out[5].n_left, out[5].n_right) == (0, 0)


def test_span_diff_field_sensitivity(spark):
    base = [("text", "a", None, 0), ("image", None, "m1", 1)]
    left = spark.createDataFrame([(i, base) for i in (1, 2, 3)], SPAN_SCHEMA)
    right = spark.createDataFrame([
        (1, [("text", "b", None, 0), ("image", None, "m1", 1)]),   # text
        (2, [("text", "a", None, 0), ("image", None, "m2", 1)]),   # media_ref
        (3, [("image", "a", None, 0), ("image", None, "m1", 1)]),  # kind
    ], SPAN_SCHEMA)
    out = {r.doc_id: r for r in I.span_diff(left, right).collect()}
    assert (out[1].verdict, out[1].first_diff_offset) == ("diverged", 0)
    assert (out[2].verdict, out[2].first_diff_offset) == ("diverged", 1)
    assert (out[3].verdict, out[3].first_diff_offset) == ("diverged", 0)


def test_span_diff_plan_one_join_no_python_no_explode(spark):
    inter = I.synth_interleaved(_docs(spark, [(1, "a b c")]))
    plan = _plan(I.span_diff(inter, inter))
    assert "EvalPython" not in plan
    assert "Generate" not in plan  # positional compare is narrow, no explode
    assert plan.count("Join") == 1, plan[:2000]
