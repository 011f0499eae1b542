"""Cross-engine hash contract: the Spark column-expression hashing
primitives (functions/hashing.py) must equal an independent pure-Python
reimplementation of their specs on arbitrary token lists — this is the
contract the DuckDB oracles rely on."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rca_pdf_extraction_pipeline_spark.functions import hashing as H

token = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1,
    max_size=12)
token_lists = st.lists(token, min_size=1, max_size=20)


def py_hash32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def py_minhash(tokens: list[str]) -> list[int]:
    out = []
    for a, b in H.MINHASH_SEEDS:
        out.append(min((a * py_hash32(t) + b) % H.MINHASH_MOD for t in tokens))
    return out


def py_fingerprint(tokens: list[str]) -> int:
    acc = 0
    for t in tokens:
        acc = (acc * 31 + py_hash32(t)) % H.FINGERPRINT_MOD
    return acc


def test_hash_contract_on_generated_lists(spark):
    """One Spark pass over a hypothesis-generated batch of token lists;
    compare minhash signatures + rolling fingerprints element-wise."""
    cases: list[list[str]] = []

    @settings(max_examples=150, deadline=None)
    @given(token_lists)
    def collect(ts):
        cases.append(ts)

    collect()
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "id long, toks array<string>")
    got = (
        df.select(
            "id",
            H.minhash_int_array(F.col("toks")).alias("mh"),
            H.rolling_fingerprint(F.col("toks")).alias("fp"),
            H.hash32(F.element_at("toks", 1)).alias("h0"),
        ).collect()
    )
    for r in got:
        ts = cases[r["id"]]
        assert list(r["mh"]) == py_minhash(ts), ts
        assert r["fp"] == py_fingerprint(ts), ts
        assert r["h0"] == py_hash32(ts[0]), ts
