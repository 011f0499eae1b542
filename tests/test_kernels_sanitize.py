"""X8 sanitizer tests (reference tests/test_csv_sanitizer.py semantics)."""

import pandas as pd

from rca_pdf_extraction_pipeline_spark.kernels.sanitize import (
    rows_to_csv_bytes,
    sanitize_series,
    sanitize_value,
)


def test_formula_chars_escaped():
    assert sanitize_value("=SUM(A1)") == "'=SUM(A1)"
    assert sanitize_value("+1234") == "'+1234"
    assert sanitize_value("-5") == "'-5"
    assert sanitize_value("@cmd") == "'@cmd"


def test_safe_indicators_pass_through():
    for v in ["+", "**", "-", "<0.0001", "<"]:
        assert sanitize_value(v) == v


def test_normal_values_untouched():
    assert sanitize_value("Normal Header") == "Normal Header"
    assert sanitize_value("a=b") == "a=b"  # mid-string chars untouched
    assert sanitize_value("") == ""


def test_vectorized_matches_scalar():
    vals = ["=x", "+", "+12", "**", "-", "-9", "<0.0001", "ok", "", "@a"]
    got = list(sanitize_series(pd.Series(vals)))
    assert got == [sanitize_value(v) for v in vals]


def test_csv_bytes_bom_and_rows():
    data = rows_to_csv_bytes(["H1", "=H2"], [["+", "a,b"], ["**", "=x"]])
    assert data.startswith(b"\xef\xbb\xbf")
    text = data.decode("utf-8-sig")
    lines = text.splitlines()
    assert lines[0] == "H1,'=H2"
    assert lines[1] == '+,"a,b"'
    assert lines[2] == "**,=x"  # row cells are written as given
