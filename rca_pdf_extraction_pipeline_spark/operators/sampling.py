"""Deterministic sampling & dataset splitting — the reproducibility
primitives of a training-data pipeline.  ``df.sample()`` is
seed-dependent on partitioning and row order; these operators decide
membership from a content-independent hash of the ROW ID alone, so the
same document lands in the same sample/split on every run, every
cluster size, and every engine (md5-derived — DuckDB replays exactly).

  * ``hash_sample``            — keep a deterministic ~``rate`` fraction
  * ``train_val_test_split``   — disjoint, exhaustive split labels
  * ``stratified_hash_sample`` — per-stratum rates (e.g. per language)

Scale: all three are narrow per-row filters/projections — no shuffle,
no state; they pipeline inside the scan stage and compose with
partition pruning.  (Broder-style hash sampling; the md5-mod idiom is
the public standard for reproducible corpus subsampling.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H

#: hash buckets per row: membership thresholds are integer PER-MILLION
#: cuts of the bucket space, so rates are exact rationals (no float
#: boundary ambiguity between engines)
SAMPLE_BUCKETS = 1_000_000


def sample_bucket(id_col: Column, seed: int = 0) -> Column:
    """Deterministic bucket in [0, 1e6): hash32(md5('<seed>:' || id)) mod 1e6.

    DuckDB twin:
    ``('0x' || substr(md5(seed || ':' || id), 1, 8))::BIGINT % 1000000``.
    """
    return H.hash32(F.concat(F.lit(f"{seed}:"), id_col.cast("string"))) \
        % SAMPLE_BUCKETS


def hash_sample(docs: DataFrame, rate: float, seed: int = 0,
                id_col: str = "doc_id") -> DataFrame:
    """The deterministic ~``rate`` sample: rows whose bucket falls below
    ``rate * 1e6``.  Same rows on every run and at any parallelism."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1]; got {rate}")
    cut = int(round(rate * SAMPLE_BUCKETS))
    return docs.filter(sample_bucket(F.col(id_col), seed) < cut)


def train_val_test_split(docs: DataFrame,
                         weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
                         seed: int = 0,
                         id_col: str = "doc_id") -> DataFrame:
    """Append a ``split`` column ('train' | 'val' | 'test') — disjoint
    and exhaustive by construction (consecutive bucket ranges)."""
    if abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1; got {weights}")
    cut1 = int(round(weights[0] * SAMPLE_BUCKETS))
    cut2 = cut1 + int(round(weights[1] * SAMPLE_BUCKETS))
    b = sample_bucket(F.col(id_col), seed)
    split = (F.when(b < cut1, F.lit("train"))
             .when(b < cut2, F.lit("val"))
             .otherwise(F.lit("test")))
    return docs.withColumn("split", split)


def per_group_sample(docs: DataFrame, group_col: str, k: int,
                     seed: int = 0, id_col: str = "doc_id") -> DataFrame:
    """EXACTLY ``k`` rows per group (fewer if the group is smaller) —
    the eval-set constructor ("100 held-out docs per language").

    Deterministic uniform choice: rank rows inside each group by their
    sample bucket (ties by id) and keep rank <= k.  One window over the
    group key — the same exchange any per-group operator needs; no
    global sort, no collect.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1; got {k}")
    w = Window.partitionBy(group_col).orderBy(
        sample_bucket(F.col(id_col), seed), F.col(id_col))
    return (docs.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k).drop("_rk"))


def stratified_hash_sample(docs: DataFrame, strata_col: str,
                           rates: dict[str, float],
                           default_rate: float = 0.0, seed: int = 0,
                           id_col: str = "doc_id") -> DataFrame:
    """Per-stratum deterministic sampling — e.g. keep 100% of rare
    languages and 10% of the dominant one.  Strata missing from
    ``rates`` use ``default_rate``."""
    cut = F.lit(int(round(default_rate * SAMPLE_BUCKETS)))
    for value, rate in sorted(rates.items()):
        cut = F.when(F.col(strata_col) == value,
                     F.lit(int(round(rate * SAMPLE_BUCKETS)))).otherwise(cut)
    return docs.filter(sample_bucket(F.col(id_col), seed) < cut)
