"""End-to-end golden tests: the synthetic 253-page twin of W20552.pdf must
classify and extract EXACTLY as the reference's committed golden outputs
(span-sequence equality on kind, text, media_ref, order — BASELINE.json
per-row invariant)."""

import pandas as pd
import pytest

from rca_pdf_extraction_pipeline_spark.config import (
    DEFAULT_CONFIG,
    GOLDEN_EXTRACTED_HEADERS,
)
from rca_pdf_extraction_pipeline_spark.operators.extraction import (
    _assemble_output,
    _extract_batch,
    classify_flat,
    flatten_spans,
)
from rca_pdf_extraction_pipeline_spark.sources import fixtures as fx


@pytest.fixture(scope="module")
def golden_doc():
    return fx.build_golden_doc()


@pytest.fixture(scope="module")
def batch_result(golden_doc):
    pdf = fx.docs_to_pandas([golden_doc])
    return _extract_batch(pdf, DEFAULT_CONFIG)


def test_classification_matches_golden_253_pages(batch_result):
    got = batch_result["cls"][["page", "page_type"]].sort_values("page")
    want = fx.load_golden_classification().sort_values("page")
    assert len(got) == 253
    mism = [
        (int(p), g, w)
        for p, g, w in zip(want.page, got.page_type, want.page_type)
        if g != w
    ]
    assert mism == []


def test_table_pages_are_39_to_42(batch_result):
    tp = sorted(batch_result["table_pages"]["page"])
    assert tp == [39, 40, 41, 42]


def test_all_138_samples_match_golden_cells(batch_result):
    golden = fx.load_golden_rows().sort_values("row_idx").reset_index(drop=True)
    got = batch_result["samples"].sort_values("row_idx").reset_index(drop=True)
    assert len(got) == 138
    cell_cols = [c for c in golden.columns if c not in ("row_idx", "page_number")]
    for c in cell_cols:
        mism = [(i, a, b) for i, (a, b) in enumerate(zip(got[c], golden[c])) if a != b]
        assert mism == [], f"column {c}: {mism[:5]}"
    assert [str(p) for p in got.page_number] == list(golden.page_number)


def test_rows_per_page_distribution(batch_result):
    counts = batch_result["samples"].groupby("page_number").size().to_dict()
    assert counts == {39: 44, 40: 44, 41: 44, 42: 6}


def test_headers_flattened_on_all_table_pages(batch_result):
    hdr = batch_result["headers"]
    for page in (39, 40, 41, 42):
        h = hdr[hdr.page == page].sort_values("col")["header"].tolist()
        assert h == GOLDEN_EXTRACTED_HEADERS[:-1], f"page {page}"


def test_golden_span_sequence_equality(golden_doc, batch_result):
    pdf = fx.docs_to_pandas([golden_doc])
    out = _assemble_output(pdf["doc_id"], batch_result["samples"],
                           batch_result["flat"], batch_result["table_pages"],
                           DEFAULT_CONFIG)
    got = out.iloc[0]["spans"]
    want = fx.expected_golden_output()["spans"]
    assert len(got) == len(want) == 12 + 138 * 12 + 4
    for g, w in zip(got, want):
        assert (g["kind"], g["text"], g["media_ref"], g["offset"]) == (
            w["kind"], w["text"], w["media_ref"], w["offset"])


def test_parser_branch_docs_span_equality():
    docs = fx.build_parser_branch_docs()
    pdf = fx.docs_to_pandas(docs)
    r = _extract_batch(pdf, DEFAULT_CONFIG)
    out = _assemble_output(pdf["doc_id"], r["samples"], r["flat"],
                           r["table_pages"], DEFAULT_CONFIG)
    for _, row in out.iterrows():
        want = fx.expected_branch_output(row.doc_id)["spans"]
        got = row.spans
        assert len(got) == len(want), row.doc_id
        for g, w in zip(got, want):
            assert (g["kind"], g["text"], g["media_ref"], g["offset"]) == (
                w["kind"], w["text"], w["media_ref"], w["offset"]), row.doc_id


def _assemble_docs(docs):
    pdf = fx.docs_to_pandas(docs)
    r = _extract_batch(pdf, DEFAULT_CONFIG)
    out = _assemble_output(pdf["doc_id"], r["samples"], r["flat"],
                           r["table_pages"], DEFAULT_CONFIG)
    return {
        row.doc_id: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                     for s in row.spans]
        for _, row in out.iterrows()
    }


def test_vector_art_kinds_round_trip_untouched(golden_doc):
    """path/curve/annotation spans (reference ElementType enum,
    models.py:8-18) are structural vector art: batching the vector-art
    doc with the golden doc must leave the golden span sequence
    byte-identical, and the vector doc itself must emit no text/table
    output (no golden artifact claims it)."""
    solo = _assemble_docs([golden_doc])
    mixed = _assemble_docs([golden_doc, fx.build_vector_art_doc()])
    assert mixed["golden-doc-w20552"] == solo["golden-doc-w20552"]
    # the vector doc's output contains no decoded samples, only media
    va = mixed.get("vector-art", [])
    assert all(k in ("image",) for k, _, _, _ in va)


def test_element_kind_census_counts_vector_kinds(spark):
    from rca_pdf_extraction_pipeline_spark.operators import metadata

    docs = fx.docs_to_spark(spark, [fx.build_vector_art_doc()])
    got = {r["kind"]: (r["n_spans"], r["n_docs"], r["total_items"])
           for r in metadata.element_kind_census(docs).collect()}
    assert got["path"] == (2, 1, 6)        # 4 + 2 drawing commands
    assert got["curve"] == (1, 1, 2)
    assert got["annotation"] == (2, 1, 2)  # 1 item each (no ';')
    assert got["line"] == (1, 1, 0)
    assert got["rect"] == (1, 1, 0)
    assert got["image"] == (1, 1, 0)
    assert got["text"] == (1, 1, 0)


def test_media_emission_is_batch_independent(golden_doc):
    """A doc's span sequence must not depend on what else shares its Arrow
    batch (determinism invariant). media-nosample has a table page with an
    image but no decodable samples: alone or batched with the sample-rich
    golden doc, its output is identical — headers only, no image span."""
    doc = fx.build_media_nosample_doc()
    alone = _assemble_docs([doc])[doc["doc_id"]]
    together = _assemble_docs([doc, golden_doc])[doc["doc_id"]]
    assert alone == together
    want = fx.expected_branch_output(doc["doc_id"])["spans"]
    assert alone == [(s["kind"], s["text"], s["media_ref"], s["offset"])
                     for s in want]
    assert [k for k, *_ in alone] == ["field"] * len(GOLDEN_EXTRACTED_HEADERS)

    # and the golden doc's own sequence is unchanged by the extra neighbor
    g_together = _assemble_docs([doc, golden_doc])[golden_doc["doc_id"]]
    g_alone = _assemble_docs([golden_doc])[golden_doc["doc_id"]]
    assert g_together == g_alone


def test_classify_archetype_docs():
    docs = fx.build_classify_docs()
    pdf = fx.docs_to_pandas(docs)
    cls = classify_flat(flatten_spans(pdf))
    got = dict(zip(cls.doc_id, cls.page_type))
    assert got == {
        "classify-plot": "plot",
        "classify-cover": "cover",
        "classify-text": "text",
        "classify-other": "other",
        "classify-table": "table",
    }
