"""ANN index-build job: artifact layout, determinism, partition
pruning readiness, F9 path guard."""

from __future__ import annotations

import json
from pathlib import Path

import pytest


def _embeddings(spark, n=16, dim=8):
    rows = [(i, [float((i * 7 + j * 3) % 5) / 5.0 for j in range(dim)])
            for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_run_index_artifacts_and_stats(spark, tmp_path):
    from rca_pdf_extraction_pipeline_spark.jobs import run_index

    _embeddings(spark).write.parquet(str(tmp_path / "in"))
    rc = run_index.main([
        "--input", str(tmp_path / "in"),
        "--output", str(tmp_path / "idx"),
        "--n-centroids", "2", "--pq-m", "2", "--pq-k", "2", "--dim", "8",
        "--sample-rate", "1.0",
    ])
    assert rc == 0
    idx = tmp_path / "idx"
    for art in ("centroids", "assignments", "pq_codebooks", "pq_codes"):
        assert (idx / art).exists(), art

    stats = json.loads((idx / "stats.json").read_text())
    assert stats["n_vectors"] == 16
    assert sum(stats["cells"].values()) == 16

    # the assignments table is physically partitioned by cell — the
    # layout that lets an nprobe-cell query prune to nprobe/k of files
    part_dirs = [p.name for p in (idx / "assignments").iterdir()
                 if p.is_dir() and p.name.startswith("cid=")]
    assert sorted(part_dirs) == [f"cid={c}" for c in sorted(stats["cells"])]

    # every vector got exactly m PQ codes
    codes = spark.read.parquet(str(idx / "pq_codes"))
    assert codes.count() == 16 * 2


def test_run_index_deterministic_rebuild(spark, tmp_path):
    from rca_pdf_extraction_pipeline_spark.jobs import run_index

    _embeddings(spark).write.parquet(str(tmp_path / "in"))
    argv = ["--input", str(tmp_path / "in"),
            "--n-centroids", "2", "--pq-m", "2", "--pq-k", "2",
            "--dim", "8", "--sample-rate", "1.0"]
    run_index.main(argv + ["--output", str(tmp_path / "a")])
    run_index.main(argv + ["--output", str(tmp_path / "b")])
    for art in ("centroids", "assignments", "pq_codebooks", "pq_codes"):
        ra = sorted(map(tuple,
                        spark.read.parquet(str(tmp_path / "a" / art)).collect()))
        rb = sorted(map(tuple,
                        spark.read.parquet(str(tmp_path / "b" / art)).collect()))
        assert ra == rb, art


def test_run_index_rejects_bad_output(tmp_path):
    from rca_pdf_extraction_pipeline_spark.jobs import run_index

    with pytest.raises(ValueError):
        run_index.main(["--input", str(tmp_path / "in"),
                        "--output", "/etc/evil"])
