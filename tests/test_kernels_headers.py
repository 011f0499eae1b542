"""H1/H2 header kernel tests — must reproduce the 11 golden header strings
(reference data/output/spec/header_verification.txt, test_header_extraction.py)."""

import pandas as pd

from rca_pdf_extraction_pipeline_spark.config import GOLDEN_EXTRACTED_HEADERS
from rca_pdf_extraction_pipeline_spark.kernels.headers import (
    fallback_headers,
    flatten_headers,
    verify_headers,
)
from rca_pdf_extraction_pipeline_spark.sources.fixtures import HEADER_FRAGMENTS


def band_spans(page_key=0):
    rows = []
    for content, y, cx in HEADER_FRAGMENTS:
        rows.append({"page_key": page_key, "x0": cx - 15, "x1": cx + 15,
                     "y0": float(y), "text": content})
    return pd.DataFrame(rows).sort_values(["y0", "x0"]).reset_index(drop=True)


def test_flatten_produces_the_11_golden_headers():
    out = flatten_headers(band_spans())
    headers = list(out.sort_values("col")["header"])
    assert headers == GOLDEN_EXTRACTED_HEADERS[:-1]


def test_exact_golden_strings():
    out = flatten_headers(band_spans())
    h = dict(zip(out.col, out.header))
    assert h[2] == "Sample Depth, feet"
    assert h[3] == "Permeability, millidarcys to Air"
    assert h[4] == "Permeability, millidarcys Klinkenberg"
    assert h[7] == "Grain Density, gm/cc"
    assert h[8] == "Fluid Saturations, percent Water"


def test_multiple_pages_batch():
    b = pd.concat([band_spans(0), band_spans(1)], ignore_index=True)
    out = flatten_headers(b)
    assert len(out) == 22
    for pk in (0, 1):
        assert list(out[out.page_key == pk].sort_values("col")["header"]) \
            == GOLDEN_EXTRACTED_HEADERS[:-1]


def test_empty_column_yields_empty_string():
    spans = band_spans()
    spans = spans[~spans["text"].isin(["Core", "Number"]) | (spans["x0"] > 60)]
    # removing the col-0 fragments leaves col 0 empty
    spans = spans[~((spans["x0"] == 62 - 15))]
    out = flatten_headers(spans)
    assert out[out.col == 0]["header"].iloc[0] == ""


def test_fallback_headers():
    assert len(fallback_headers()) == 11
    assert fallback_headers()[0] == "Core Number"


def test_trailing_comma_stripped_and_whitespace_normalized():
    spans = pd.DataFrame([
        {"page_key": 0, "x0": 47, "x1": 77, "y0": 193.0, "text": "  Core  "},
        {"page_key": 0, "x0": 47, "x1": 77, "y0": 204.0, "text": "Number,"},
    ])
    out = flatten_headers(spans)
    assert out[out.col == 0]["header"].iloc[0] == "Core Number"


def test_verify_headers_match():
    b = pd.concat([band_spans(39), band_spans(40)], ignore_index=True)
    rep = verify_headers(flatten_headers(b))
    assert rep["verified"] is True
    assert rep["reference_page"] == 39
    assert rep["pages_checked"] == [39, 40]
    assert rep["reference_headers"] == GOLDEN_EXTRACTED_HEADERS[:-1]


def test_verify_headers_mismatch():
    b40 = band_spans(40)
    b40.loc[b40["text"] == "Klinkenberg", "text"] = "Klink"
    rep = verify_headers(flatten_headers(
        pd.concat([band_spans(39), b40], ignore_index=True)))
    assert rep["verified"] is False
    assert rep["mismatches"][0]["page"] == 40
    assert "Column 4" in rep["mismatches"][0]["differences"][0]


def test_verify_empty():
    rep = verify_headers(pd.DataFrame(columns=["page_key", "col", "header"]))
    assert rep["verified"] is False and rep["reference_page"] is None
