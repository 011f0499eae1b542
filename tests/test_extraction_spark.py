"""Spark-path e2e: the mapInPandas pipeline over the fixture docs table
must produce identical span sequences regardless of partitioning."""

import pytest

from rca_pdf_extraction_pipeline_spark.operators.extraction import (
    classify_documents,
    extract_documents,
    extract_headers,
    extract_samples,
)
from rca_pdf_extraction_pipeline_spark.sources import fixtures as fx


@pytest.fixture(scope="module")
def docs_df(spark):
    docs = [fx.build_golden_doc()] + fx.build_parser_branch_docs() \
        + fx.build_classify_docs()
    return fx.docs_to_spark(spark, docs)


def spans_tuples(rows):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                      for s in r["spans"]]
        for r in rows
    }


def test_extract_documents_golden_equality(spark, docs_df):
    out = extract_documents(docs_df).collect()
    got = spans_tuples([r.asDict(recursive=True) for r in out])
    want = fx.expected_golden_output()["spans"]
    want_t = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in want]
    assert got["golden-doc-w20552"] == want_t
    for doc_id in ["parse-normal", "parse-plus", "parse-detect", "parse-star",
                   "parse-fracture", "parse-toolong"]:
        w = fx.expected_branch_output(doc_id)["spans"]
        assert got[doc_id] == [(s["kind"], s["text"], s["media_ref"], s["offset"])
                               for s in w], doc_id


def test_deterministic_across_partitionings(spark, docs_df):
    one = spans_tuples([r.asDict(recursive=True)
                        for r in extract_documents(docs_df.coalesce(1)).collect()])
    many = spans_tuples([r.asDict(recursive=True)
                         for r in extract_documents(docs_df.repartition(7, "doc_id")).collect()])
    assert one == many


def test_classify_documents_golden(spark, docs_df):
    cls = classify_documents(docs_df).where("doc_id = 'golden-doc-w20552'") \
        .toPandas().sort_values("page")
    want = fx.load_golden_classification().sort_values("page")
    assert len(cls) == 253
    assert list(cls.page_type) == list(want.page_type)


def test_extract_samples_relational_view(spark, docs_df):
    s = extract_samples(docs_df).where("doc_id = 'golden-doc-w20552'").toPandas()
    assert len(s) == 138
    golden = fx.load_golden_rows().sort_values("row_idx")
    got = s.sort_values("row_idx")
    assert list(got.sample_number) == list(golden.sample_number)
    assert list(got.permeability_air_md) == list(golden.permeability_air_md)


def test_extract_headers_view(spark, docs_df):
    from rca_pdf_extraction_pipeline_spark.config import GOLDEN_EXTRACTED_HEADERS
    h = extract_headers(docs_df).where(
        "doc_id = 'golden-doc-w20552' and page = 41").toPandas()
    assert list(h.sort_values("col").header) == GOLDEN_EXTRACTED_HEADERS[:-1]
