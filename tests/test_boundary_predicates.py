"""The str-method boundary predicates must agree with the reference
regexes (config.RE_*) on every input — property-based equivalence."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from rca_pdf_extraction_pipeline_spark.config import (
    RE_CORE_NUMBER,
    RE_DEPTH,
    RE_SAMPLE_NUMBER,
)
from rca_pdf_extraction_pipeline_spark.kernels.samples import (
    _is_core,
    _is_depth,
    _is_sample,
)

re_core = re.compile(RE_CORE_NUMBER)
re_sample = re.compile(RE_SAMPLE_NUMBER)
re_depth = re.compile(RE_DEPTH)

#: generator biased toward near-miss shapes around the three grammars
near_miss = st.one_of(
    st.text(alphabet="0123456789,.-<+*f()F ", max_size=12),
    st.from_regex(r"\d{0,3},?\d{0,4}\.?\d{0,3}", fullmatch=True),
    st.from_regex(r"\d+-?\d*", fullmatch=True),
    st.sampled_from(["9,580.50", "12,345.67", "1234.56", "123.45", "12345.67",
                     "1,23.45", ",123.45", "9,58.50", "99", "100", "1-2",
                     "1-", "-2", "1-2(F)", "+", "**", "<0.0001", "²", "٣٤"]),
)


@settings(max_examples=2000, deadline=None)
@given(near_miss)
def test_core_predicate_equals_regex(s):
    assert _is_core(s) == bool(re_core.match(s)), repr(s)


@settings(max_examples=2000, deadline=None)
@given(near_miss)
def test_sample_predicate_equals_regex(s):
    assert _is_sample(s) == bool(re_sample.match(s)), repr(s)


@settings(max_examples=2000, deadline=None)
@given(near_miss)
def test_depth_predicate_equals_regex(s):
    assert _is_depth(s) == bool(re_depth.match(s)), repr(s)
