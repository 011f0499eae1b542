"""Extraction regression-diff job (jobs/run_diff.py): verdict
artifacts, stats funnel, CI gate exit code, F9 path guard."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from rca_pdf_extraction_pipeline_spark.jobs import run_diff
from rca_pdf_extraction_pipeline_spark.operators import interleaved as I


def _write_runs(spark, tmp_path):
    """Baseline + candidate interleaved tables with known drift: doc 3
    dropped, doc 99 added, doc 2 mutated, docs 1/4/5 unchanged."""
    base = [(i, f"tok{i} " + " ".join(f"w{j}" for j in range(12)))
            for i in range(1, 6)]
    cand = ([r for r in base if r[0] != 3] + [(99, "brand new doc")])
    cand = [(i, t + " CHANGED") if i == 2 else (i, t) for i, t in cand]
    for rows, name in ((base, "left"), (cand, "right")):
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        I.synth_interleaved(docs).write.parquet(str(tmp_path / name))


def test_run_diff_artifacts_and_gate(spark, tmp_path):
    _write_runs(spark, tmp_path)
    rc = run_diff.main([
        "--left", str(tmp_path / "left"),
        "--right", str(tmp_path / "right"),
        "--output", str(tmp_path / "report"),
    ])
    assert rc == 0  # no threshold -> report-only
    stats = json.loads((tmp_path / "report" / "stats.json").read_text())
    assert stats["verdicts"] == {"equal": 3, "diverged": 1,
                                 "left_only": 1, "right_only": 1}
    assert stats["n_docs_compared"] == 6 and stats["changed"] == 3
    ex = {e["doc_id"]: e for e in stats["examples"]}
    assert ex["2"]["verdict"] == "diverged"
    assert ex["2"]["first_diff_offset"] is not None
    assert ex["3"]["verdict"] == "left_only"
    assert ex["99"]["verdict"] == "right_only"

    # verdict table is partitioned by verdict and round-trips
    stored = spark.read.parquet(str(tmp_path / "report" / "verdicts"))
    assert stored.filter(F.col("verdict") == "diverged").count() == 1
    assert stored.count() == 6

    # CI gate: 3/6 changed exceeds 1% -> exit 3
    rc = run_diff.main([
        "--left", str(tmp_path / "left"),
        "--right", str(tmp_path / "right"),
        "--output", str(tmp_path / "report2"),
        "--max-changed-frac", "0.01",
    ])
    assert rc == 3
    # ...and passes when the threshold admits the drift
    rc = run_diff.main([
        "--left", str(tmp_path / "left"),
        "--right", str(tmp_path / "right"),
        "--output", str(tmp_path / "report3"),
        "--max-changed-frac", "0.6",
    ])
    assert rc == 0


def test_run_diff_identical_runs_all_equal(spark, tmp_path):
    docs = spark.createDataFrame([(1, "a b c"), (2, "d e")],
                                 "doc_id long, text string")
    I.synth_interleaved(docs).write.parquet(str(tmp_path / "same"))
    rc = run_diff.main([
        "--left", str(tmp_path / "same"),
        "--right", str(tmp_path / "same"),
        "--output", str(tmp_path / "report"),
        "--max-changed-frac", "0.0",
    ])
    assert rc == 0
    stats = json.loads((tmp_path / "report" / "stats.json").read_text())
    assert stats["verdicts"] == {"equal": 2} and stats["examples"] == []


def test_run_diff_rejects_bad_output(tmp_path):
    with pytest.raises(ValueError):
        run_diff.main([
            "--left", str(tmp_path / "l"), "--right", str(tmp_path / "r"),
            "--output", "/root/reference/evil",
        ])


def test_run_diff_merge_text_ignores_split_granularity(spark, tmp_path):
    # same content, different text-span granularity: left emits one
    # span per line, right one span per paragraph; plus one REAL text
    # change that must still diverge after merging
    left = spark.createDataFrame([
        (1, [("text", "a b", None, 0), ("text", "c d", None, 1),
             ("image", None, "m1", 2)]),
        (2, [("text", "x", None, 0), ("text", "y", None, 1)]),
    ], "doc_id long, spans array<struct<kind:string,text:string,"
       "media_ref:string,offset:int>>")
    right = spark.createDataFrame([
        (1, [("text", "a b c d", None, 0), ("image", None, "m1", 1)]),
        (2, [("text", "x y CHANGED", None, 0)]),
    ], "doc_id long, spans array<struct<kind:string,text:string,"
       "media_ref:string,offset:int>>")
    left.write.parquet(str(tmp_path / "l"))
    right.write.parquet(str(tmp_path / "r"))

    # without --merge-text both docs diverge (split-point noise)
    rc = run_diff.main(["--left", str(tmp_path / "l"),
                        "--right", str(tmp_path / "r"),
                        "--output", str(tmp_path / "raw")])
    assert rc == 0
    raw = json.loads((tmp_path / "raw" / "stats.json").read_text())
    assert raw["verdicts"] == {"diverged": 2}

    # with --merge-text only the real content change survives
    rc = run_diff.main(["--left", str(tmp_path / "l"),
                        "--right", str(tmp_path / "r"),
                        "--output", str(tmp_path / "merged"),
                        "--merge-text"])
    assert rc == 0
    merged = json.loads((tmp_path / "merged" / "stats.json").read_text())
    assert merged["verdicts"] == {"equal": 1, "diverged": 1}
    assert merged["examples"][0]["doc_id"] == "2"
