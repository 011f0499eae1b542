"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, sign-LSH bucketing as
the scale path — both pure DataFrame expressions (functions/vectors.py),
no UDFs, oracle-checkable against DuckDB's list_cosine_similarity.

Scale design (100 TB / 10^12 vectors):
  * the query side is always broadcast (one row or a small batch);
    the corpus scan stays narrow — no shuffle at all for brute force,
    and `TakeOrderedAndProject` keeps top-k memory O(k) per task.
  * bucketed ANN prunes the scan with a partition-pruning-friendly
    bucket column (write the table partitioned/bucketed by it), so a
    query touches 1/2^bits of the files: IVF-style coarse quantization
    with deterministic axis-sign centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vectors as V


def _query_vec(embs: DataFrame, query_id: int, id_col: str, vec_col: str) -> DataFrame:
    return embs.filter(F.col(id_col) == query_id).select(
        F.col(id_col).alias("query_id"), V.as_double(F.col(vec_col)).alias("q_vec")
    )


def cosine_topk(embs: DataFrame, query_id: int, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors of ``query_id`` by cosine similarity.

    Deterministic: ties broken by ascending id; similarity rounded to
    6 dp. Returns (vec_id, cosine_sim) with the query itself excluded.
    """
    q = _query_vec(embs, query_id, id_col, vec_col)
    sim = F.round(V.cosine(V.as_double(F.col(vec_col)), F.col("q_vec")), 6)
    return (
        embs.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bucket_histogram(embs: DataFrame, n_bits: int = 8,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(bucket, n_vecs) under the sign-LSH coarse quantizer — the
    balance diagnostic for the ANN index layout."""
    return (
        embs.select(V.sign_bucket(F.col(vec_col), n_bits).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )


def bucketed_topk_multiprobe(embs: DataFrame, query_id: int, k: int = 10,
                             n_bits: int = 8, nprobe: int = 4,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Multi-probe IVF top-k (Lv et al., VLDB'07 multi-probe LSH): probe
    the query's sign-LSH bucket PLUS the ``nprobe - 1`` buckets reached
    by flipping the hyperplane bits with the smallest margin
    (|query[j]| — the dims where the sign decision was least confident).
    Recovers most of the recall nprobe=1 loses while still scanning only
    nprobe/2^bits of the corpus.

    Deterministic: margin ties flip the lower dim first; similarity
    rounded to 6 dp, final ties by ascending id."""
    if not 1 <= nprobe <= 2 ** n_bits:
        raise ValueError(f"nprobe must be in [1, 2^{n_bits}]; got {nprobe}")
    with_bucket = embs.withColumn("bucket", V.sign_bucket(F.col(vec_col), n_bits))
    margins = F.array_sort(F.array(*[
        F.struct(F.abs(F.element_at(F.col(vec_col), j + 1).cast("double"))
                 .alias("m"), F.lit(j).alias("j"))
        for j in range(n_bits)
    ]))
    flips = F.slice(margins, 1, nprobe - 1) if nprobe > 1 \
        else F.array().cast("array<struct<m:double,j:int>>")
    q = (
        with_bucket.filter(F.col(id_col) == query_id)
        .select(F.col(id_col).alias("query_id"),
                V.as_double(F.col(vec_col)).alias("q_vec"),
                F.col("bucket").alias("q_bucket"),
                flips.alias("flips"))
        .select("query_id", "q_vec",
                F.concat(
                    F.array(F.col("q_bucket")),
                    F.transform(
                        "flips",
                        lambda f: F.col("q_bucket").bitwiseXOR(
                            F.pow(F.lit(2.0), f["j"]).cast("long"))),
                ).alias("probes"))
    )
    sim = F.round(V.cosine(V.as_double(F.col(vec_col)), F.col("q_vec")), 6)
    return (
        with_bucket.join(F.broadcast(q),
                         F.array_contains(q["probes"], with_bucket["bucket"]))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bucketed_topk(embs: DataFrame, query_id: int, k: int = 10, n_bits: int = 8,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the
    query's sign-LSH bucket (IVF nprobe=1). Recall trades off with
    n_bits; the scan prunes to ~1/2^bits of the corpus when the table
    is partitioned by bucket."""
    with_bucket = embs.withColumn("bucket", V.sign_bucket(F.col(vec_col), n_bits))
    q = (
        with_bucket.filter(F.col(id_col) == query_id)
        .select(F.col(id_col).alias("query_id"),
                V.as_double(F.col(vec_col)).alias("q_vec"),
                F.col("bucket").alias("q_bucket"))
    )
    sim = F.round(V.cosine(V.as_double(F.col(vec_col)), F.col("q_vec")), 6)
    return (
        with_bucket.join(F.broadcast(q), with_bucket["bucket"] == q["q_bucket"])
        .filter(F.col(id_col) != F.col("query_id"))
        .select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )
