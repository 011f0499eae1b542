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


# ---- merge_adjacent_text ---------------------------------------------------


def test_merge_runs_hand_check(spark):
    inter = spark.createDataFrame([
        (1, [("text", "a b", None, 0), ("text", "c", None, 1),
             ("image", None, "m1", 2), ("text", "d", None, 3)]),
        (2, [("image", None, "m2", 0), ("text", "x", None, 1)]),
        (3, []),
    ], SPAN_SCHEMA)
    out = {r.doc_id: [(s.kind, s.text, s.media_ref, s.offset)
                      for s in r.spans]
           for r in I.merge_adjacent_text(inter).collect()}
    assert out[1] == [("text", "a b c", None, 0), ("image", None, "m1", 1),
                      ("text", "d", None, 2)]
    assert out[2] == [("image", None, "m2", 0), ("text", "x", None, 1)]
    assert out[3] == []


def test_merge_order_is_data_not_partition(spark):
    # spans delivered in scrambled offset order — the merge must be
    # computed in reading order (the offset-first array_sort rule)
    inter = spark.createDataFrame([
        (1, [("text", "late", None, 3), ("image", None, "m", 1),
             ("text", "first", None, 0), ("text", "second", None, 2)]),
    ], SPAN_SCHEMA)
    spans = I.merge_adjacent_text(inter).collect()[0].spans
    assert [(s.kind, s.text) for s in spans] == [
        ("text", "first"), ("image", None), ("text", "second late")]
    assert [s.offset for s in spans] == [0, 1, 2]


def test_merge_idempotent_and_span_diff_equal(spark):
    inter = I.synth_interleaved(
        _docs(spark, [(i, " ".join(f"t{i}_{j}" for j in range(30)))
                      for i in range(5)]))
    once = I.merge_adjacent_text(inter)
    twice = I.merge_adjacent_text(once)
    verdicts = {r.verdict for r in I.span_diff(once, twice).collect()}
    assert verdicts == {"equal"}


def test_merge_plan_is_narrow(spark):
    inter = I.synth_interleaved(_docs(spark, [(1, "a b c")]))
    plan = _plan(I.merge_adjacent_text(inter))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


# ---- media_context ---------------------------------------------------------


def test_media_context_hand_check(spark):
    inter = spark.createDataFrame([
        (1, [("text", "a", None, 0), ("text", "b", None, 1),
             ("text", "c", None, 2), ("image", None, "m1", 3),
             ("text", "d", None, 4), ("text", "e", None, 5),
             ("text", "f", None, 6)]),
        (2, [("image", None, "m2", 0)]),
    ], SPAN_SCHEMA)
    rows = {r.media_ref: r for r in I.media_context(inter, k=2).collect()}
    m1 = rows["m1"]
    # nearest 2 preceding in offset order; nearest 2 following
    assert (m1.before_text, m1.after_text) == ("b c", "d e")
    assert (m1.n_before, m1.n_after) == (2, 2)
    m2 = rows["m2"]
    assert m2.before_text is None and m2.after_text is None
    assert (m2.n_before, m2.n_after) == (0, 0)


def test_media_context_k_guard_and_short_sides(spark):
    inter = spark.createDataFrame([
        (1, [("text", "only", None, 0), ("image", None, "m", 1)]),
    ], SPAN_SCHEMA)
    with pytest.raises(ValueError):
        I.media_context(inter, k=0)
    r = I.media_context(inter, k=3).collect()[0]
    assert r.before_text == "only" and r.n_before == 1
    assert r.after_text is None and r.n_after == 0


def test_media_context_plan_narrow_single_generate(spark):
    inter = I.synth_interleaved(_docs(spark, [(1, "a b c")]))
    plan = _plan(I.media_context(inter))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    # one explode of the pairs array — the only row amplification
    assert plan.count("Generate") == 1, plan[:2000]


# ---- asset census / dedup groups -------------------------------------------


def test_asset_census_counts(spark):
    inter = spark.createDataFrame([
        (1, [("image", None, "shared", 0), ("image", None, "solo1", 1)]),
        (2, [("image", None, "shared", 2), ("image", None, "shared", 3),
             ("text", "t", None, 4)]),
    ], SPAN_SCHEMA)
    rows = {r.asset: r for r in I.asset_census(inter).collect()}
    assert rows["shared"].n_docs == 2
    assert rows["shared"].n_occurrences == 3
    assert (rows["shared"].min_offset, rows["shared"].max_offset) == (0, 3)
    assert rows["solo1"].n_docs == 1


def test_asset_census_pool_folds_refs(spark):
    inter = spark.createDataFrame([
        (1, [("image", None, f"r{i}", i) for i in range(16)]),
    ], SPAN_SCHEMA)
    rows = I.asset_census(inter, pool=4).collect()
    assert all(r.asset.startswith("asset_") for r in rows)
    assert sum(r.n_occurrences for r in rows) == 16
    assert len(rows) <= 4


def test_asset_dedup_groups_signature(spark):
    inter = spark.createDataFrame([
        # docs 1 and 2: same asset SET (order/multiplicity differ)
        (1, [("image", None, "a", 0), ("image", None, "b", 1)]),
        (2, [("image", None, "b", 0), ("image", None, "a", 1),
             ("image", None, "a", 2)]),
        (3, [("image", None, "c", 0)]),
        (4, [("text", "no media", None, 0)]),  # excluded
    ], SPAN_SCHEMA)
    rows = I.asset_dedup_groups(inter).collect()
    by_keep = {r.keep_doc_id: r for r in rows}
    assert by_keep[1].n_docs == 2            # docs 1+2 grouped
    assert by_keep[3].n_docs == 1
    assert len(rows) == 2                    # doc 4 excluded entirely


def test_asset_plans_single_exchange(spark):
    inter = I.synth_interleaved(
        _docs(spark, [(1, " ".join(["w"] * 40))]))
    for df in (I.asset_census(inter, pool=8),
               I.asset_dedup_groups(inter, pool=8)):
        plan = _plan(df)
        assert "EvalPython" not in plan
        # countDistinct plans expand to two-phase agg over ONE shuffle
        # key family; the dedup-groups signature is fully narrow
        assert plan.count("Exchange") <= 2, plan[:2000]


# ---- interleaved_quality ---------------------------------------------------


def test_quality_verdicts_hand_check(spark):
    inter = spark.createDataFrame([
        (1, [("text", "a b", None, 0), ("image", None, "m", 1)]),   # keep
        (2, [("image", None, "m1", 0), ("image", None, "m2", 1)]),  # media_only
        (3, [("text", "t", None, 0), ("image", None, "m3", 1),
             ("image", None, "m4", 2)]),                            # media_heavy
        (4, []),                                                    # empty
        (5, [("text", "only text", None, 0)]),                      # keep
    ], SPAN_SCHEMA)
    rows = {r.doc_id: r for r in I.interleaved_quality(inter).collect()}
    assert rows[1].verdict == "keep" and rows[1].media_ratio == 0.5
    assert rows[2].verdict == "media_only"
    assert rows[3].verdict == "media_heavy"
    assert rows[4].verdict == "empty" and rows[4].media_ratio is None
    assert rows[5].verdict == "keep" and rows[5].caption_coverage is None
    assert rows[5].text_tokens == 2
    # coverage: media after the first text span counts as captionable
    assert rows[3].caption_coverage == 1.0
    assert rows[2].caption_coverage == 0.0


def test_quality_plan_is_pure_map(spark):
    inter = I.synth_interleaved(_docs(spark, [(1, "a b c")]))
    plan = _plan(I.interleaved_quality(inter))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert "Generate" not in plan
