"""End-to-end pretraining-data job: stage funnel semantics (dup
collapsed, contaminated dropped), packed-output invariants, shard
permutation shape, and artifact-level resume."""

from __future__ import annotations

import json
import shutil

import pytest
from pyspark.sql import functions as F


def _corpus(spark, tmp_path, n=60):
    """Testdata docs (they pass the default gates — test_curation relies
    on that) plus one EXACT duplicate of the first doc under a new id."""
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .orderBy("doc_id").limit(n).select("doc_id", "text"))
    first = docs.orderBy("doc_id").first()
    dup = spark.createDataFrame([(999999, first["text"])],
                                "doc_id long, text string")
    docs.unionByName(dup).write.parquet(str(tmp_path / "corpus"))
    return first


def test_run_pretrain_funnel_and_pack(spark, tmp_path):
    from rca_pdf_extraction_pipeline_spark.jobs import run_pretrain

    first = _corpus(spark, tmp_path)
    # benchmark = the verbatim text of a second doc: conservative
    # decontamination must drop at least that doc
    victim = (spark.read.parquet(str(tmp_path / "corpus"))
              .orderBy("doc_id").collect()[5])
    spark.createDataFrame([(victim["text"],)], "text string") \
         .write.parquet(str(tmp_path / "bench"))

    rc = run_pretrain.main([
        "--input", str(tmp_path / "corpus"),
        "--output", str(tmp_path / "run"),
        "--benchmarks", str(tmp_path / "bench"),
        "--seq-len", "32", "--n-shards", "3", "--no-mask",
    ])
    assert rc == 0
    stats = json.loads((tmp_path / "run" / "stats.json").read_text())

    # funnel: monotone; the exact dup collapsed; the victim doc gone
    assert stats["input_docs"] == 61
    assert stats["curated_docs"] < stats["input_docs"]
    assert stats["decontaminated_docs"] < stats["curated_docs"]
    curated_ids = {r["doc_id"] for r in
                   spark.read.parquet(str(tmp_path / "run" / "curated"))
                   .select("doc_id").collect()}
    assert 999999 not in curated_ids              # keep-min-id exact dedup
    assert first["doc_id"] in curated_ids
    clean_ids = {r["doc_id"] for r in
                 spark.read.parquet(str(tmp_path / "run" / "clean"))
                 .select("doc_id").collect()}
    assert victim["doc_id"] not in clean_ids

    # packed output: every complete row is exactly seq_len; token
    # conservation — stream length = sum over clean docs of n_tokens+1
    # (the EOD sentinel)
    data = spark.read.parquet(str(tmp_path / "run" / "data"))
    rows = data.collect()
    assert {r["n_tokens"] == 32 for r in rows if r["complete"]} <= {True}
    assert sum(1 for r in rows if not r["complete"]) <= 1
    clean = spark.read.parquet(str(tmp_path / "run" / "clean"))
    n_stream = clean.select(
        F.sum(F.size(F.filter(F.split("text", " "),
                              lambda t: t != F.lit(""))) + 1)
    ).first()[0]
    assert stats["total_tokens"] == n_stream
    assert stats["total_tokens"] == sum(r["n_tokens"] for r in rows)
    assert stats["n_sequences"] == len(rows) == -(-n_stream // 32)
    assert any("<|eod|>" in r["tokens"] for r in rows)

    # shard permutation: every sequence exactly once; per-shard pos is
    # contiguous from 0 (a reader streams shard k in pos order)
    assert sorted(r["seq_id"] for r in rows) == list(range(len(rows)))
    assert set(stats["shard_histogram"]) <= {"0", "1", "2"}
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    assert sum(stats["shard_histogram"].values()) == len(rows)


def test_run_pretrain_resume_skips_staged_work(spark, tmp_path):
    from rca_pdf_extraction_pipeline_spark.jobs import run_pretrain

    _corpus(spark, tmp_path, n=20)
    argv = ["--input", str(tmp_path / "corpus"),
            "--output", str(tmp_path / "run"),
            "--seq-len", "16", "--n-shards", "2",
            "--no-mask", "--no-near-dedup"]
    assert run_pretrain.main(argv) == 0
    stats1 = json.loads((tmp_path / "run" / "stats.json").read_text())

    # poison the input: resume must serve every stage from its staged
    # artifact, so the downstream numbers cannot see the new corpus
    shutil.rmtree(tmp_path / "corpus")
    spark.createDataFrame([(1, "tiny corpus now")],
                          "doc_id long, text string") \
         .write.parquet(str(tmp_path / "corpus"))
    assert run_pretrain.main(argv + ["--resume"]) == 0
    stats2 = json.loads((tmp_path / "run" / "stats.json").read_text())

    assert stats2["input_docs"] == 1                 # input WAS re-read
    for k in ("curated_docs", "n_sequences", "total_tokens",
              "shard_histogram"):
        assert stats2[k] == stats1[k], k             # stages were not

    # without --resume the same rerun rebuilds from the poisoned input
    assert run_pretrain.main(argv) == 0
    stats3 = json.loads((tmp_path / "run" / "stats.json").read_text())
    assert stats3["curated_docs"] <= 1


def test_run_pretrain_rewrite_stages(spark, tmp_path):
    """--paragraph-dedup and --trim-substr: the shared paragraph
    survives once, the shared 8-gram run is cut everywhere, and the
    packed stream is built from the rewritten texts."""
    from rca_pdf_extraction_pipeline_spark.jobs import run_pretrain

    base = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .orderBy("doc_id").limit(12).select("doc_id", "text"))
    # every doc gets the same extra paragraph; two docs share an
    # 8-gram run inside otherwise-unique text
    run = "one two three four five six seven eight nine ten"
    docs = base.selectExpr(
        "doc_id",
        f"CASE WHEN doc_id % 3 = 2 THEN text || ' {run}' ELSE text END"
        " || chr(10) || 'JOIN OUR MAILING LIST TODAY' AS text")
    docs.write.parquet(str(tmp_path / "corpus"))

    argv = ["--input", str(tmp_path / "corpus"),
            "--output", str(tmp_path / "run"),
            "--seq-len", "16", "--n-shards", "2", "--no-mask",
            "--no-near-dedup", "--paragraph-dedup", "--trim-substr"]
    assert run_pretrain.main(argv) == 0
    stats = json.loads((tmp_path / "run" / "stats.json").read_text())
    assert stats["config"]["paragraph_dedup"] is True
    assert stats["paragraph_dedup_docs"] == stats["decontaminated_docs"]

    para = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(str(tmp_path / "run" / "para_dedup"))
            .collect()}
    # the shared paragraph survives only in the min doc
    n_mail = sum("JOIN OUR MAILING LIST TODAY" in t for t in para.values())
    assert n_mail == 1 and "JOIN OUR MAILING LIST TODAY" in para[min(para)]

    trimmed = {r["doc_id"]: r["text"] for r in
               spark.read.parquet(str(tmp_path / "run" / "trimmed"))
               .collect()}
    assert all(run not in t for t in trimmed.values())  # cut EVERYWHERE
    assert stats["trimmed_docs"] <= stats["paragraph_dedup_docs"]

    # token conservation against the FINAL rewrite stage (tokens split
    # on single space, as functions.text.tokens does — a '\\n' joint is
    # ONE token)
    total = sum(len([w for w in t.split(" ") if w]) + 1
                for t in trimmed.values())
    assert stats["total_tokens"] == total


def test_run_pretrain_output_path_guard(tmp_path):
    from rca_pdf_extraction_pipeline_spark.jobs import run_pretrain

    with pytest.raises(ValueError):
        run_pretrain.main(["--input", str(tmp_path / "corpus"),
                           "--output", "/etc/pwned"])
