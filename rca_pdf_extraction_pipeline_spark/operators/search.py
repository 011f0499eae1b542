"""Corpus keyword search — BM25 ranking over the documents table.

Generalizes the reference's elementizer substring search
(database.py:299-319: LIKE '%q%' LIMIT 100) to the ranked retrieval a
training-data pipeline uses for corpus curation (find documents about X,
score topical relevance).  Classic Okapi BM25 (Robertson & Walker;
the Lucene-standard "+1" idf smoothing) — public formulation.

Scale design (100 TB):
  * the query term list is tiny and inlined as literals — per-term tf
    is a narrow ``size(filter(tokens, ...))`` pass inside the scan stage.
  * corpus statistics (N, per-term document frequency, average doc
    length) reduce to ONE aggregate row, broadcast back via a 1-row
    cross join — no shuffle of the corpus itself.
  * final top-k is ``TakeOrderedAndProject``: O(k) memory per task.

Everything is deterministic: doubles rounded to 6 dp, ties broken by
ascending id; a DuckDB oracle replays the exact formula.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

BM25_K1 = 1.2
BM25_B = 0.75


def _tf(toks: Column, term: str) -> Column:
    return F.size(F.filter(toks, lambda t: t == F.lit(term)))


def bm25_topk(docs: DataFrame, terms: list[str], k: int = 20,
              text_col: str = "text", id_col: str = "doc_id",
              k1: float = BM25_K1, b: float = BM25_B) -> DataFrame:
    """Top-``k`` documents by BM25 score for the bag-of-words query
    ``terms``.

    Returns (id, <tf_<term> per term>, bm25) ordered by (bm25 desc, id).
    idf uses the Lucene-standard smoothing
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` — always positive, so
    stopword-heavy queries never produce negative contributions.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    toks = T.tokens(F.col(text_col))

    # per-doc projection: doc length + per-term tf (one narrow pass)
    proj = docs.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        *[_tf(toks, t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )

    # ONE corpus-stats row: N, avgdl, df per term (map-side partial agg)
    stats = proj.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
          for i in range(len(terms))],
    )

    scored = proj.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5)))
        norm = tf * F.lit(k1 + 1.0) / (
            tf + F.lit(k1) * (F.lit(1.0 - b)
                              + F.lit(b) * F.col("dl") / F.col("avgdl")))
        score = score + idf * norm

    return (scored
            .select(F.col(id_col),
                    *[F.col(f"tf_{i}").alias(f"tf_{t}")
                      for i, t in enumerate(terms)],
                    F.round(score, 6).alias("bm25"))
            .filter(F.col("bm25") > 0)
            .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
            .limit(k))
