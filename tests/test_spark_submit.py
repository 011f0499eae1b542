"""The literal deployment contract: the extraction job runs under a
REAL ``spark-submit --py-files rca_pkg.zip`` subprocess — script file
copied outside the repo, PYTHONPATH stripped, so the package resolves
ONLY from the shipped zip (the north-rule "ships as a spark-submit
--py-files job" term, exercised end-to-end rather than via an
in-process main() call)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_spark_submit_py_files_extraction_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from rca_pdf_extraction_pipeline_spark.jobs import package as pkgmod
    from rca_pdf_extraction_pipeline_spark.operators.extraction import (
        extract_documents,
    )
    from rca_pdf_extraction_pipeline_spark.sources import fixtures

    docs = fixtures.docs_to_spark(
        spark, [fixtures.build_golden_doc()]
        + fixtures.build_parser_branch_docs())
    in_dir = tmp_path / "docs_in"
    docs.write.parquet(str(in_dir))

    zip_path = tmp_path / "rca_pkg.zip"
    assert pkgmod.main(["--output", str(zip_path)]) == 0
    assert zip_path.exists() and zip_path.stat().st_size > 10_000

    # script copied OUTSIDE the repo: the file + the zip are the whole
    # deployment artifact; strip PYTHONPATH so nothing leaks from cwd
    script = tmp_path / "run_extraction.py"
    shutil.copy(REPO / "rca_pdf_extraction_pipeline_spark" / "jobs"
                / "run_extraction.py", script)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    out_dir = tmp_path / "table"
    res = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--py-files", str(zip_path), str(script),
         "--input", str(in_dir), "--output", str(out_dir),
         "--n-buckets", "8", "--waves", "2",
         "--allowed-roots", str(tmp_path)],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=420)
    assert res.returncode == 0, res.stderr[-4000:]
    report = json.loads(
        [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1])
    assert report["buckets_remaining"] == 0
    assert report["waves_run"] >= 1 and len(report["snapshots"]) >= 1

    # the submitted job's output table == the in-process pipeline's
    got = spark.read.parquet(str(out_dir / "data"))
    exp = extract_documents(docs)
    key = lambda df: sorted(
        (r["doc_id"],
         tuple((s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in r["spans"]))
        for r in df.select("doc_id", "spans").collect())
    assert key(got.select("doc_id", "spans")) == key(exp)
    assert got.filter(F.col("doc_id") == "golden-doc-w20552").count() == 1
