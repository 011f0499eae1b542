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
    budget); documents never split).  One window over the ordering key;
    at scale, order within salted ranges and pack per range.

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
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, bin_id) — deterministic token-budget packing:
    documents in ascending id order fill bins of ``budget_tokens`` by
    running cumulative sum (bin = floor((cumsum - n) / budget), i.e.
    the bin the document STARTS in; documents are never split, so a
    document may overhang its bin — the standard cumsum approximation
    of greedy packing, off by at most one document per bin).

    Scale note: the single global window is the local formulation; at
    10^12 docs, range-partition on id first and pack per range with a
    per-range bin offset — same expression, one extra aggregate.
    """
    w = Window.orderBy(F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    base = docs.select(F.col(id_col),
                       T.n_tokens(F.col(text_col)).alias("n_tokens"))
    return base.select(
        F.col(id_col), F.col("n_tokens"),
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens"))
                / F.lit(budget_tokens)).cast("long").alias("bin_id"))
