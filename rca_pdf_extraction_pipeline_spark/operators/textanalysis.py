"""Corpus text analytics — token stats, quality scoring, language ID,
document fingerprinting. Pure column expressions (functions/text.py,
functions/hashing.py); generalizes the reference's scalar functions
X1-X3 (core_analysis.py:222, 452, 455-491) to corpus scale.

All operators are narrow (per-row) — at 100 TB they pipeline inside a
single scan stage with full predicate pushdown and column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import text as T


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_distinct_tokens, n_chars, avg_token_len,
    distinct_ratio) — the basic length/diversity profile."""
    toks = T.tokens(F.col(text_col))
    nt = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    chars = F.length(F.col(text_col))
    return docs.select(
        F.col(id_col),
        nt.alias("n_tokens"),
        nd.alias("n_distinct_tokens"),
        chars.alias("n_chars_actual"),
        F.round(chars.cast("double") / F.greatest(nt, F.lit(1)), 6).alias("avg_token_len"),
        F.round(nd.cast("double") / F.greatest(nt, F.lit(1)), 6).alias("distinct_ratio"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality profile (CCNet/Gopher-style filters, public
    heuristics): alpha ratio, digit ratio, stopword ratio and a simple
    composite keep-score in [0,1]."""
    c = F.col(text_col)
    total = F.greatest(F.length(c), F.lit(1)).cast("double")
    alpha_ratio = T.alpha_chars(c).cast("double") / total
    digit_ratio = T.digit_chars(c).cast("double") / total
    stop_ratio = T.stopword_ratio(c)
    score = (F.lit(0.5) * alpha_ratio + F.lit(0.3) * stop_ratio
             + F.lit(0.2) * (F.lit(1.0) - digit_ratio))
    return docs.select(
        F.col(id_col),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def language_id(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", threshold: float = 0.03) -> DataFrame:
    """(id, stopword_ratio, pred_lang) — stopword-ratio language ID."""
    c = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.round(T.stopword_ratio(c), 6).alias("stopword_ratio"),
        T.predict_lang(c, threshold).alias("pred_lang"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(id, fingerprint) — order-sensitive rolling token hash
    (functions/hashing.rolling_fingerprint)."""
    return docs.select(
        F.col(id_col),
        H.rolling_fingerprint(T.tokens(F.col(text_col))).alias("fingerprint"),
    )
