"""Z-order layout (plans/layout.py): Morton-key correctness vs a
Python reference, guard behavior, and the actual pruning property —
a z-ordered layout's per-file min/max stats skip most files for a
point predicate on EITHER dimension, where a single-column sort only
prunes its own column."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rca_pdf_extraction_pipeline_spark.plans import layout


def _morton2(x: int, y: int, bits: int) -> int:
    key = 0
    for j in range(bits):
        key |= ((x >> j) & 1) << (2 * j)
        key |= ((y >> j) & 1) << (2 * j + 1)
    return key


def test_zorder_key_matches_python_reference(spark):
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {(r["x"], r["y"]): r["z"]
           for r in df.withColumn(
               "z", layout.zorder_key(["x", "y"], bits=4)).collect()}
    for (x, y), z in got.items():
        assert z == _morton2(x, y, 4), (x, y)


def test_zorder_key_three_dims_distinct_and_bounded(spark):
    df = spark.createDataFrame(
        [(x, y, w) for x in range(4) for y in range(4) for w in range(4)],
        "x int, y int, w int")
    zs = [r["z"] for r in df.withColumn(
        "z", layout.zorder_key(["x", "y", "w"], bits=2)).collect()]
    assert sorted(zs) == list(range(64))  # bijection onto [0, 2^(d*b))


def test_zorder_key_out_of_range_is_null_not_collision(spark):
    df = spark.createDataFrame([(300, 1), (-1, 1), (255, 1)], "x int, y int")
    got = df.withColumn("z", layout.zorder_key(["x", "y"], bits=8)).collect()
    by_x = {r["x"]: r["z"] for r in got}
    assert by_x[300] is None and by_x[-1] is None
    assert by_x[255] == _morton2(255, 1, 8)


def test_zorder_key_guards():
    with pytest.raises(ValueError, match="bits"):
        layout.zorder_key(["x", "y"], bits=0)
    with pytest.raises(ValueError, match=">= 2 columns"):
        layout.zorder_key(["x"], bits=8)
    with pytest.raises(ValueError, match="> 62"):
        layout.zorder_key(["a", "b", "c", "d"], bits=16)


def test_zorder_key_stays_in_codegen(spark):
    df = spark.range(10).select(
        (F.col("id") % 8).cast("int").alias("x"),
        (F.col("id") % 4).cast("int").alias("y"))
    plan = df.withColumn(
        "z", layout.zorder_key(["x", "y"], bits=3))._jdf \
        .queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_zorder_layout_prunes_both_dims_linear_sort_does_not(spark):
    """The reason Z-order exists: 64x64 grid into 16 files.  Linear
    x-sort gives perfect x-pruning but ZERO y-pruning (every file is a
    full-height stripe); the Z layout prunes BOTH dimensions."""
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).cast("int").alias("x"),
        (F.col("id") / 64).cast("int").alias("y"))

    zstats = layout.layout_stats(
        layout.zorder_layout(grid, ["x", "y"], bits=6, num_files=16),
        ["x", "y"]).cache()
    linear = grid.repartitionByRange(16, F.col("x")) \
        .sortWithinPartitions("x")
    lstats = layout.layout_stats(linear, ["x", "y"]).cache()

    # linear layout: x prunes well, y prunes nothing
    assert layout.pruned_fraction(lstats, "x", 7) >= 0.75
    assert layout.pruned_fraction(lstats, "y", 7) == 0.0
    # z layout: BOTH dimensions prune (16 files = 4x4 rectangles of
    # span 16; a point hits one row/column of 4 rectangles = 12 skipped)
    assert layout.pruned_fraction(zstats, "x", 7) >= 0.5
    assert layout.pruned_fraction(zstats, "y", 7) >= 0.5

    # every z file is a bounded rectangle, never a full-width stripe
    spans = zstats.select(
        F.max(F.col("x_max") - F.col("x_min")).alias("dx"),
        F.max(F.col("y_max") - F.col("y_min")).alias("dy")).collect()[0]
    assert spans["dx"] <= 31 and spans["dy"] <= 31
    # and the layout lost no rows
    assert zstats.agg(F.sum("n")).collect()[0][0] == 64 * 64
