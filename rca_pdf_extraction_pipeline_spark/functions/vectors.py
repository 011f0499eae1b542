"""Embedding-vector primitives over ``array<float>`` columns — built-in
higher-order functions only (`zip_with` + `aggregate`), no UDFs.

All math is done in double precision regardless of the storage type so
a DuckDB oracle (``list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])``)
matches bit-for-bit: both engines then run the same left-to-right
double accumulation.

Scale: these expressions vectorize inside codegen; a 100 TB ANN scan is
bandwidth-bound on the parquet read of the embedding column, with
nested-column pruning keeping other columns off disk.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i, left-to-right double accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """cosine similarity; caller is responsible for non-zero vectors."""
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(vec: Column, n_bits: int = 8) -> Column:
    """Sign-LSH bucket id: bit i set iff vec[i] > 0, for i < n_bits.

    A deterministic random-hyperplane LSH specialization (axis-aligned
    hyperplanes) — bucket-joins restrict ANN search to candidates in
    the query's bucket, turning a full O(N) scan into O(N / 2^bits)
    per query at cluster scale.

    DuckDB twin: ``Σ 2^i * CASE WHEN v[i+1] > 0 THEN 1 ELSE 0 END``.
    """
    acc = F.lit(0).cast("long")
    for i in range(n_bits):
        acc = acc + F.when(F.element_at(vec, i + 1) > 0, F.lit(2 ** i)).otherwise(F.lit(0))
    return acc
