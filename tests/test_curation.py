"""End-to-end corpus curation: gate cascade, dedup composition, PII
masking, and the spark-submit job driver."""

from __future__ import annotations

import json

import pytest

from rca_pdf_extraction_pipeline_spark.operators.curation import (
    CurationConfig,
    curate,
    curation_report,
    curation_signals,
)

GOOD = ("the quick brown fox jumps over the lazy dog and it runs "
        "to the river bank for a drink of water in the morning")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, GOOD),
        (2, "zzz qqq www vvv kkk jjj xxx yyy uuu ooo ppp lll"),  # lang
        (3, "123 456 789 000 111 222 333 444 555 666 777 888"),  # quality
        (4, "the spam " * 30 + "the end"),                       # repetition
        (5, GOOD),                                               # exact dup of 1
        (6, GOOD + " extra tail words here"),                    # near dup of 1
        (7, "please mail the report to boss@corp.com by the end of the "
            "day and copy the team on it as we agreed this morning ok"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_signals_reasons(corpus):
    r = {x["doc_id"]: x["reject_reason"]
         for x in curation_signals(corpus).collect()}
    assert r[1] == "keep" and r[5] == "keep" and r[6] == "keep"
    assert r[2] == "lang"
    assert r[3] in ("lang", "quality")  # no stopwords either; lang fires first
    assert r[4] == "repetition"
    assert r[7] == "keep"


def test_report_funnel(corpus):
    got = {r["reject_reason"]: r["n_docs"]
           for r in curation_report(corpus).collect()}
    assert got["keep"] == 4
    assert sum(got.values()) == 7


def test_curate_end_to_end(corpus):
    kept = curate(corpus).collect()
    ids = sorted(r["doc_id"] for r in kept)
    # 5 drops as exact dup of 1; 6 drops as near dup of 1 (keep-first)
    assert ids == [1, 7]
    text7 = next(r["text"] for r in kept if r["doc_id"] == 7)
    assert "boss@corp.com" not in text7 and "<EMAIL>" in text7


def test_curate_without_mask_or_neardedup(corpus):
    cfg = CurationConfig(mask_pii=False, near_dedup=False)
    kept = curate(corpus, cfg).collect()
    ids = sorted(r["doc_id"] for r in kept)
    assert ids == [1, 6, 7]  # near-dup 6 survives; exact dup 5 still drops
    text7 = next(r["text"] for r in kept if r["doc_id"] == 7)
    assert "boss@corp.com" in text7


def test_lang_gate_configurable(corpus):
    cfg = CurationConfig(keep_langs=("en", "und"), near_dedup=False,
                         mask_pii=False)
    r = {x["doc_id"]: x["reject_reason"]
         for x in curation_signals(corpus, cfg).collect()}
    assert r[2] in ("keep", "quality", "repetition")  # lang gate passes now


def test_run_curation_job(spark, tmp_path):
    from rca_pdf_extraction_pipeline_spark.jobs import run_curation

    rows = [(1, GOOD), (2, GOOD), (3, "zzz qqq www vvv kkk jjj")]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(str(tmp_path / "in"))
    rc = run_curation.main([
        "--input", str(tmp_path / "in"),
        "--output", str(tmp_path / "out"),
        "--no-near-dedup",
    ])
    assert rc == 0
    stats = json.loads((tmp_path / "out" / "stats.json").read_text())
    assert stats["input_docs"] == 3
    assert stats["gate_funnel"]["keep"] == 2
    assert stats["output_docs"] == 1  # exact dup dropped
    assert stats["dedup_dropped"] == 1
    got = spark.read.parquet(str(tmp_path / "out" / "data")).collect()
    assert [r["doc_id"] for r in got] == [1]


def test_run_curation_rejects_bad_output(tmp_path):
    from rca_pdf_extraction_pipeline_spark.jobs import run_curation

    with pytest.raises(ValueError):
        run_curation.main([
            "--input", str(tmp_path / "in"),
            "--output", "/etc/evil",
        ])


def test_run_curation_jsonl_output(spark, tmp_path):
    import glob

    from rca_pdf_extraction_pipeline_spark.jobs import run_curation

    rows = [(1, GOOD), (2, "zzz qqq www vvv kkk jjj")]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(str(tmp_path / "in"))
    rc = run_curation.main([
        "--input", str(tmp_path / "in"),
        "--output", str(tmp_path / "out"),
        "--no-near-dedup", "--format", "jsonl",
    ])
    assert rc == 0
    parts = glob.glob(str(tmp_path / "out" / "data" / "part-*"))
    assert parts
    lines = []
    for p in parts:
        lines += [l for l in open(p).read().splitlines() if l]
    recs = [json.loads(l) for l in lines]
    assert [r["doc_id"] for r in recs] == [1]
    assert recs[0]["text"].startswith("the quick brown fox")


def test_source_report_funnel(spark):
    from rca_pdf_extraction_pipeline_spark.operators.curation import (
        source_report,
    )

    rows = [
        (1, GOOD, "srcA"),
        (2, "zzz qqq www vvv kkk jjj", "srcA"),           # lang reject
        (3, GOOD, "srcB"),
        (4, GOOD + " and more of the same words here", "srcB"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in source_report(d).collect()}
    a, b = out["srcA"], out["srcB"]
    assert (a["n_docs"], a["n_keep"], a["n_lang"]) == (2, 1, 1)
    assert a["keep_rate"] == 0.5
    assert (b["n_docs"], b["n_keep"], b["keep_rate"]) == (2, 2, 1.0)
    assert b["mean_quality"] > a["mean_quality"]
