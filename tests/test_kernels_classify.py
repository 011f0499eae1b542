"""C1/C2 classification kernel tests (reference core_analysis.py:438-516,
page_classifier.py:51-125)."""

import numpy as np
import pandas as pd

from rca_pdf_extraction_pipeline_spark.kernels.classify import (
    classify_pages_keyword,
    classify_pages_structural,
    gap_regularity,
)

TABLE_TEXT = "SUMMARY OF ROUTINE CORE ANALYSES RESULTS Core Number Sample Number"
PLOT_TEXT = "PROFILE PLOT Core Analysis Results Depth vs Porosity"
COVER_TEXT = "TABLE OF CONTENTS CORE LABORATORIES Advanced Technology Center"
OTHER_TEXT = "Page 150 Figure 12"
DENSE_TEXT = ("The laboratory team documented each step of the measurement "
              "campaign in the daily log. " * 8)


def run(texts):
    return classify_pages_keyword(pd.Series(texts))


def test_cascade_priorities():
    out = run([TABLE_TEXT, PLOT_TEXT, COVER_TEXT, OTHER_TEXT, DENSE_TEXT])
    assert list(out.page_type) == ["table", "plot", "cover", "other", "text"]
    assert list(out.confidence) == [0.95, 0.85, 0.80, 0.60, 0.65]


def test_summary_beats_plot():
    out = run(["SUMMARY OF ROUTINE CORE ANALYSES and also a CROSS PLOT"])
    assert out.iloc[0].page_type == "table"
    assert out.iloc[0].confidence == 0.95


def test_three_table_keywords_rule():
    txt = "Core Number Sample Number Permeability readings " + "x" * 60
    out = run([txt])
    assert out.iloc[0].page_type == "table"
    assert out.iloc[0].confidence == 0.70
    assert out.iloc[0].reason == "Contains 3 table keywords"


def test_keyword_match_is_case_insensitive():
    txt = "core number sample number permeability " + "y" * 60
    assert run([txt]).iloc[0].page_type == "table"


def test_dense_text_with_table_keyword_falls_through_to_other():
    txt = DENSE_TEXT + " porosity"  # table_score == 1, len > 500
    out = run([txt])
    assert out.iloc[0].page_type == "other"
    assert out.iloc[0].confidence == 0.50


def test_mid_length_text_is_other_50():
    out = run(["z" * 200])
    assert out.iloc[0].page_type == "other"
    assert out.iloc[0].confidence == 0.50


def test_empty_text_is_other_minimal():
    out = run(["", None])
    assert list(out.page_type) == ["other", "other"]
    assert list(out.confidence) == [0.60, 0.60]


# --- C2 structural ---------------------------------------------------------

def stats(**kw):
    base = dict(page_number=2, h_lines=0, v_lines=0, text_blocks=0,
                char_count=0, image_coverage=0.0, gap_regular=False)
    base.update(kw)
    return pd.DataFrame([base])


def test_structural_blank():
    out = classify_pages_structural(stats(char_count=3))
    assert out.iloc[0].page_type == "blank" and out.iloc[0].confidence == 0.95


def test_structural_grid_table():
    out = classify_pages_structural(
        stats(h_lines=4, v_lines=5, text_blocks=6, char_count=900))
    assert out.iloc[0].page_type == "table" and out.iloc[0].confidence == 0.9


def test_structural_regular_lines_table():
    out = classify_pages_structural(
        stats(h_lines=6, v_lines=0, text_blocks=4, char_count=900,
              gap_regular=True))
    assert out.iloc[0].page_type == "table" and out.iloc[0].confidence == 0.75


def test_structural_figure_and_narrative():
    fig = classify_pages_structural(stats(char_count=40, image_coverage=0.8))
    nar = classify_pages_structural(stats(char_count=900, h_lines=1))
    assert fig.iloc[0].page_type == "figure"
    assert nar.iloc[0].page_type == "narrative"


def test_structural_first_page_cover():
    out = classify_pages_structural(
        stats(page_number=1, char_count=200, image_coverage=0.3))
    assert out.iloc[0].page_type == "cover" and out.iloc[0].confidence == 0.7


def test_gap_regularity():
    regular = np.array([100, 120, 140, 160, 180], dtype=float)
    irregular = np.array([100, 101, 150, 380], dtype=float)
    tight = np.array([100, 101, 102, 103], dtype=float)  # avg gap < 5
    out = gap_regularity([regular, irregular, tight, np.array([1.0])])
    assert list(out) == [True, False, False, False]
