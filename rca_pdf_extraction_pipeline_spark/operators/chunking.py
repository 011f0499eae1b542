"""Training-sequence preparation — chunking and packing.

The last mile of a training-data pipeline: curated documents become
fixed-budget training sequences.

  * ``chunk_documents`` — split each document into token windows of
    size ``chunk_tokens`` advancing by ``stride`` (overlap = chunk -
    stride), the standard sliding-window chunking for long documents.
    Pure per-row array expressions: the token array is sliced inside
    one projection, then one ``posexplode`` — narrow until the explode,
    no shuffle at all.
  * ``pack_documents`` — assign documents to fixed token-budget bins by
    running cumulative sum in a deterministic order (the parallel
    formulation of greedy sequential packing: bin = floor(cumsum /
    budget); documents never split).  Range-partitioned: per-range
    cumsum windows + a tiny per-range offset table — no corpus-wide
    window at any scale.

Both are deterministic (order derives from ids, never partitioning)
and exactly replayable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T


def chunk_documents(docs: DataFrame, chunk_tokens: int = 64,
                    stride: int | None = None, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(id, chunk_idx, chunk_text, n_chunk_tokens) — sliding token
    windows; the final window is the remainder (>= 1 token, shorter
    than ``chunk_tokens``).  ``stride`` defaults to ``chunk_tokens``
    (no overlap).  Empty documents emit no chunks.
    """
    stride = chunk_tokens if stride is None else stride
    if not 1 <= stride <= chunk_tokens:
        raise ValueError(
            f"stride must be in [1, chunk_tokens={chunk_tokens}]; got {stride}")
    # tokens hoisted to a column layer: the chunk lambda slices them
    # once per window — inline, every slice re-ran the tokenizer
    # (O(n_windows * n_tokens) per doc; the substring-dedup lesson)
    tok_df = docs.select(F.col(id_col),
                         T.tokens(F.col(text_col)).alias("toks"))
    toks = F.col("toks")
    n = F.size(toks)
    # window start positions: 0, stride, 2*stride, ... while start < n
    n_windows = F.when(n <= 0, F.lit(0)).otherwise(
        F.floor((n - 1) / stride) + 1).cast("int")
    starts = F.when(n_windows > 0,
                    F.transform(F.sequence(F.lit(0), n_windows - 1),
                                lambda w: w * stride)) \
        .otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(toks, s + 1, chunk_tokens)))
    ex = tok_df.select(F.col(id_col),
                       F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
    return ex.select(
        F.col(id_col), F.col("chunk_idx"), F.col("chunk_text"),
        T.n_tokens(F.col("chunk_text")).alias("n_chunk_tokens"))


def pack_documents(docs: DataFrame, budget_tokens: int = 512,
                   text_col: str = "text", id_col: str = "doc_id",
                   num_ranges: int | None = None) -> DataFrame:
    """(id, n_tokens, bin_id) — deterministic token-budget packing:
    documents in ascending id order fill bins of ``budget_tokens`` by
    running cumulative sum (bin = floor((cumsum - n) / budget), i.e.
    the bin the document STARTS in; documents are never split, so a
    document may overhang its bin — the standard cumsum approximation
    of greedy packing, off by at most one document per bin).

    Scale formulation (the ONLY formulation — a global-window variant
    would move the whole corpus to one task): range-repartition on id
    into ``num_ranges`` contiguous id ranges (default
    spark.sql.shuffle.partitions), cumsum WITHIN each range under a
    window that always has a partition spec, then shift each range by
    the total tokens of all earlier ranges.  The offsets come from one
    tiny per-range-totals aggregate (``num_ranges`` rows) whose running
    sum is computed with a triangular self-join — no partition-less
    window anywhere, at any size.  The result is bitwise identical to
    the logical global cumsum for ANY contiguous ordered split, so the
    SQL oracle stays the one-line global formulation.

    The per-range key is ``spark_partition_id()`` AFTER the range
    exchange: range k maps to shuffle partition k, so the key is
    order-contiguous; AQE may only merge ADJACENT shuffle partitions,
    which preserves contiguity and therefore the cumsum decomposition.
    """
    spark = docs.sparkSession
    if num_ranges is None:
        num_ranges = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = docs.select(F.col(id_col),
                       T.n_tokens(F.col(text_col)).alias("n_tokens"))
    ranged = base.repartitionByRange(num_ranges, F.col(id_col)) \
                 .withColumn("rng", F.spark_partition_id())
    w = Window.partitionBy("rng").orderBy(F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    within = ranged.select(
        F.col(id_col), F.col("n_tokens"), F.col("rng"),
        F.sum("n_tokens").over(w).alias("cum_in_range"))
    totals = ranged.groupBy("rng").agg(
        F.sum("n_tokens").alias("rng_tokens"))
    # running offset over the tiny totals table without a global window:
    # triangular self-join (num_ranges^2 comparisons on <=1k rows)
    earlier = totals.select(F.col("rng").alias("erng"),
                            F.col("rng_tokens").alias("etok"))
    offsets = (totals.join(earlier, F.col("erng") < F.col("rng"), "left")
               .groupBy("rng")
               .agg(F.coalesce(F.sum("etok"), F.lit(0)).alias("offset")))
    joined = within.join(F.broadcast(offsets), "rng")
    return joined.select(
        F.col(id_col), F.col("n_tokens"),
        F.floor((F.col("offset") + F.col("cum_in_range") - F.col("n_tokens"))
                / F.lit(budget_tokens)).cast("long").alias("bin_id"))
