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
