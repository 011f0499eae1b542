"""Corpus profiling — per-group distribution summaries (the dataset-
card / ingest-QA numbers a pipeline publishes with every corpus drop).

Exact discrete percentiles (``percentile_disc``: always an actual data
value, so cross-engine comparison is exact — no interpolation float
drift), plus count/min/max/mean.  One shuffle on the group key with
map-side partial aggregation; group cardinality (languages, sources)
is tiny, so the reduce side is trivial at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PERCENTILES = (0.25, 0.5, 0.75, 0.9, 0.99)


def corpus_profile(docs: DataFrame, group_col: str = "lang",
                   value_col: str = "n_chars",
                   percentiles: tuple[float, ...] = DEFAULT_PERCENTILES) -> DataFrame:
    """(group, n_docs, min, p25..p99, max, mean) of ``value_col``.

    Percentile columns are named ``p<percent>`` (p25, p50, ...); the
    discrete percentile is cast back to the value column's integer type
    (it is always an actual data value).
    """
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.min(value_col).alias("min_val"),
    ]
    for p in percentiles:
        name = f"p{int(round(p * 100))}"
        aggs.append(
            F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY {value_col})")
            .cast("long").alias(name))
    aggs += [
        F.max(value_col).alias("max_val"),
        F.round(F.avg(value_col), 6).alias("mean_val"),
    ]
    return docs.groupBy(group_col).agg(*aggs).orderBy(group_col)


def source_tfidf_terms(docs: DataFrame, top_k: int = 5,
                       min_len: int = 3, text_col: str = "text",
                       group_col: str = "source") -> DataFrame:
    """Distinctive vocabulary per subcorpus: treat each ``group_col``
    value as one aggregate document and rank its terms by tf-idf
    (Sparck Jones 1972): ``tf * ln(n_groups / df_groups)`` — the
    per-source keyword summary a dataset card publishes, and the
    quickest way to spot a mislabeled or contaminated source.

    Returns (source, term, tf, df_groups, tfidf, rank) for the top
    ``top_k`` terms per group by (tfidf desc, term asc); terms shorter
    than ``min_len`` chars are dropped (stopword-ish tail).  Scores are
    rounded to 6 dp so any engine reproduces them exactly.

    Scale: explode -> hash-agg on (group, term) — map-side combine does
    most of the reduction — then a window over those aggregates, whose
    row count is bounded by groups x vocabulary, not corpus size; the
    group-count side is a one-row broadcast.
    """
    from pyspark.sql import Window

    from ..functions import text as T

    toks = T.tokens(F.col(text_col))
    pairs = (docs.select(F.col(group_col).alias("source"),
                         F.explode(toks).alias("term"))
             .filter(F.length("term") >= min_len)
             .groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf")))
    n_groups = docs.select(F.countDistinct(group_col).alias("n_groups"))
    df_groups = pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_groups"))
    scored = (pairs.join(df_groups, "term")
              .crossJoin(F.broadcast(n_groups))
              .select("source", "term", "tf", "df_groups",
                      F.round(F.col("tf")
                              * F.log(F.col("n_groups")
                                      / F.col("df_groups")), 6)
                      .alias("tfidf")))
    w = Window.partitionBy("source").orderBy(
        F.col("tfidf").desc(), F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k))
