"""Multi-column reading order (operators/readingorder.py): the
x-projection column-cut sweep's semantics on hand geometry, full
token-order recovery over the deterministic synth layouts, and the
one-exchange plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rca_pdf_extraction_pipeline_spark.operators import readingorder as RO

BOX_SCHEMA = "doc_id long, box_id int, x0 int, x1 int, y0 int, y1 int"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_column_cut_hand_check(spark):
    # two newspaper columns; rows listed deliberately out of reading
    # order — box_id encodes the ground-truth order
    boxes = spark.createDataFrame([
        (1, 3, 500, 580, 0, 40), (1, 0, 0, 80, 0, 40),
        (1, 4, 600, 680, 0, 40), (1, 1, 100, 180, 0, 40),
        (1, 5, 500, 580, 50, 90), (1, 2, 0, 80, 50, 90),
    ], BOX_SCHEMA)
    out = {r.box_id: r for r in RO.column_reading_order(boxes).collect()}
    assert [out[i].col_id for i in range(6)] == [1, 1, 1, 2, 2, 2]
    assert [out[i].read_rank for i in range(6)] == [1, 2, 3, 4, 5, 6]


def test_intra_column_gaps_do_not_cut(spark):
    # word pitch 100 with width 80 leaves 20px gaps — below min_gap=50,
    # so a single wide line stays one column
    boxes = spark.createDataFrame(
        [(1, i, i * 100, i * 100 + 80, 0, 40) for i in range(6)], BOX_SCHEMA)
    out = RO.column_reading_order(boxes).collect()
    assert {r.col_id for r in out} == {1}
    assert sorted((r.read_rank, r.box_id) for r in out) == \
        [(i + 1, i) for i in range(6)]


def test_min_gap_guard(spark):
    boxes = spark.createDataFrame([(1, 0, 0, 80, 0, 40)], BOX_SCHEMA)
    with pytest.raises(ValueError):
        RO.column_reading_order(boxes, min_gap=0)


def test_synth_recovery_full(spark):
    # mixed doc lengths; every doc must be FULLY recovered
    # (read_rank == box_id + 1 everywhere) whichever layout its hash
    # chose, and both 1- and 2-column layouts must occur
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(5 * i + 1)))
         for i in range(1, 13)], "doc_id long, text string")
    rep = RO.reading_order_report(RO.synth_boxes(docs)).collect()
    assert len(rep) == 12
    assert all(r.n_in_order == r.n_boxes for r in rep)
    assert {r.doc_id: r.n_boxes for r in rep} == \
        {i: 5 * i + 1 for i in range(1, 13)}
    assert {r.n_cols for r in rep} == {1, 2}


def test_synth_skips_empty_docs(spark):
    docs = spark.createDataFrame([(1, ""), (2, "   "), (3, "a b")],
                                 "doc_id long, text string")
    got = RO.synth_boxes(docs).groupBy("doc_id").count().collect()
    assert {r.doc_id: r["count"] for r in got} == {3: 2}


def test_report_plan_one_exchange_no_python(spark):
    docs = spark.createDataFrame([(1, "a b c d e f g h i")],
                                 "doc_id long, text string")
    plan = _plan(RO.reading_order_report(RO.synth_boxes(docs)))
    # both windows and the report aggregate share one doc_id hash
    # partitioning: exactly one Exchange end-to-end
    assert plan.count("Exchange") == 1, plan[:2000]
    assert "EvalPython" not in plan
