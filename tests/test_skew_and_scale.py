"""Skew defusal (operators/skew.py) + partitioning determinism:
output span sequences must be identical under any partitioning
(SURVEY.md §7.4.2) and heavy docs must spread across partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from rca_pdf_extraction_pipeline_spark.config import DEFAULT_CONFIG, ExtractionConfig
from rca_pdf_extraction_pipeline_spark.operators import skew
from rca_pdf_extraction_pipeline_spark.operators.extraction import extract_documents
from rca_pdf_extraction_pipeline_spark.sources import fixtures


def _collect_spans(df):
    rows = df.select("doc_id", "spans").collect()
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                      for s in r["spans"]]
        for r in rows
    }


def test_salted_repartition_spreads_docs(spark):
    docs = fixtures.docs_to_spark(spark, fixtures.build_skew_docs(n_small=40,
                                                                 big_factor=20))
    cfg = ExtractionConfig(num_partitions=8)
    parts = (skew.salted_repartition(docs, cfg)
             .withColumn("pid", F.spark_partition_id())
             .groupBy("pid").count().collect())
    # docs spread over many partitions, no partition hogs the majority
    assert len(parts) >= 4
    assert max(p["count"] for p in parts) <= 41 * 0.5


def test_isolate_heavy_separates_outliers(spark):
    docs = fixtures.docs_to_spark(spark, fixtures.build_skew_docs(n_small=30,
                                                                 big_factor=30))
    cfg = ExtractionConfig(num_partitions=8, heavy_doc_span_threshold=1000)
    routed = skew.isolate_heavy(docs, cfg)
    pid_of = {
        r["doc_id"]: r["pid"]
        for r in routed.withColumn("pid", F.spark_partition_id())
                       .select("doc_id", "pid").collect()
    }
    heavy_pid = pid_of["skew-big"]
    sharers = [d for d, p in pid_of.items() if p == heavy_pid and d != "skew-big"]
    # the oversized doc shares its partition with at most a couple of
    # small docs (hash collision), never a big cluster of them
    assert len(sharers) <= 8
    assert routed.count() == 31


def test_extraction_invariant_under_partitioning(spark):
    """Same output span sequences at 1, 3, and 16 partitions, with and
    without skew defusal — order is computed per-doc, never from
    partition order."""
    docs_list = fixtures.build_skew_docs(n_small=10, big_factor=8)
    docs = fixtures.docs_to_spark(spark, docs_list)

    baseline = _collect_spans(extract_documents(docs.coalesce(1)))
    for variant in [
        docs.repartition(3),
        docs.repartition(16, "doc_id"),
        skew.salted_repartition(docs, ExtractionConfig(num_partitions=16)),
        skew.isolate_heavy(docs, ExtractionConfig(num_partitions=8,
                                                  heavy_doc_span_threshold=500)),
    ]:
        assert _collect_spans(extract_documents(variant)) == baseline


def test_structural_classifier_on_table_spans(spark):
    """C2 over real span geometry: non-page-1 table pages with grid
    lines classify as 'table' @0.9 (page_classifier.py:78-83)."""
    from rca_pdf_extraction_pipeline_spark.operators.extraction import (
        classify_documents_structural,
    )
    docs = fixtures.docs_to_spark(spark, fixtures.build_skew_docs(n_small=3,
                                                                 big_factor=4))
    out = classify_documents_structural(docs).collect()
    small = [r for r in out if r["doc_id"].startswith("skew-small")]
    assert small and all(r["page_type"] == "table" and r["confidence"] == 0.9
                         for r in small)
    big = [r for r in out if r["doc_id"] == "skew-big"]
    assert len(big) == 4 and all(r["page_type"] == "table" for r in big)


def test_extraction_invariant_under_span_permutation(spark):
    """Reading order is computed from geometry/offsets, never from the
    input array order: a deterministically shuffled spans array must
    extract to the identical output sequence."""
    import random

    golden = fixtures.build_golden_doc()
    shuffled = {"doc_id": golden["doc_id"], "spans": list(golden["spans"])}
    random.Random(42).shuffle(shuffled["spans"])

    a = _collect_spans(extract_documents(
        fixtures.docs_to_spark(spark, [golden])))
    b = _collect_spans(extract_documents(
        fixtures.docs_to_spark(spark, [shuffled])))
    assert a == b
    assert len(a["golden-doc-w20552"]) == 12 + 138 * 12 + 4
