"""BPE train job: artifact layout, stored-merges tokenization parity
with an in-plan train, sampled-fit determinism, F9 path guard."""

from __future__ import annotations

import json

import pytest


def test_run_bpe_artifacts_and_stored_parity(spark, tmp_path):
    from rca_pdf_extraction_pipeline_spark.jobs import run_bpe
    from rca_pdf_extraction_pipeline_spark.operators import bpe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.parquet(str(tmp_path / "corpus"))

    rc = run_bpe.main([
        "--input", str(tmp_path / "corpus"),
        "--output", str(tmp_path / "tok"),
        "--n-merges", "6",
    ])
    assert rc == 0
    stats = json.loads((tmp_path / "tok" / "stats.json").read_text())
    assert stats["n_merges"] == 6
    assert stats["n_docs_trained"] == stats["n_docs_total"] == 500
    assert len(stats["merges_head"]) == 6

    # the STORED merge table tokenizes identically to an in-plan train:
    # downstream tokenization never retrains
    stored = spark.read.parquet(str(tmp_path / "tok" / "merges")) \
        .orderBy("rank").collect()
    live = bpe.bpe_train(docs, 6).collect()
    assert [(r["rank"], r["left"], r["right"], r["pair_count"])
            for r in stored] == \
           [(r["rank"], r["left"], r["right"], r["pair_count"])
            for r in live]
    merge_list = [(r["left"], r["right"]) for r in stored]
    toks = bpe.bpe_apply(docs.limit(5), merge_list).collect()
    assert all(r["n_bpe_tokens"] > 0 for r in toks)


def test_run_bpe_sampled_fit_is_deterministic(spark, tmp_path):
    from rca_pdf_extraction_pipeline_spark.jobs import run_bpe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.parquet(str(tmp_path / "corpus"))
    for d in ("a", "b"):
        rc = run_bpe.main([
            "--input", str(tmp_path / "corpus"),
            "--output", str(tmp_path / d),
            "--n-merges", "4", "--sample-rate", "0.5",
        ])
        assert rc == 0
    sa = json.loads((tmp_path / "a" / "stats.json").read_text())
    sb = json.loads((tmp_path / "b" / "stats.json").read_text())
    assert sa == sb
    assert sa["n_docs_trained"] < sa["n_docs_total"]


def test_run_bpe_rejects_bad_output(tmp_path):
    from rca_pdf_extraction_pipeline_spark.jobs import run_bpe

    with pytest.raises(ValueError):
        run_bpe.main(["--input", str(tmp_path / "in"),
                      "--output", "/etc/evil"])
