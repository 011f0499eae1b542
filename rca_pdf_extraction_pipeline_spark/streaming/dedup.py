"""Streaming deduplication — the ingest-time half of the dedup family.

Batch dedup (operators/dedup.py) cleans a corpus at rest; a training-
data pipeline ALSO needs to suppress duplicates as documents arrive
(re-crawls, mirror sites, retry storms).  Two operators:

  * ``dedup_stream(docs)`` — exact streaming dedup on the md5 content
    digest via ``dropDuplicatesWithinWatermark``: state is bounded by
    the watermark horizon (keys older than the delay are evicted), so
    memory is O(arrival rate x horizon), not O(stream length) — the
    only safe shape for an unbounded crawl.
  * ``dedup_stream_unbounded(docs)`` — plain ``dropDuplicates`` for
    finite backfills where the key set fits in state and exact global
    uniqueness matters more than eviction.

Semantics vs batch: within one watermark horizon the stream emits
exactly the first arrival per content hash — the same keep-first
policy as ``operators.dedup.deduplicate_corpus`` (which keeps min id;
ingest order stands in for id order on a stream).  Duplicates farther
apart than the horizon are the batch job's responsibility — run it
periodically over the landed table; the two compose, not compete.

Scale notes: state shards on the content-hash exchange exactly like a
batch groupBy; RocksDB state store + watermark eviction keep per-
executor state bounded.  The digest is computed BEFORE the stateful
exchange so the full document text never enters the state store —
state rows carry (hash, timestamp) only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_hash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the md5 content digest (the dedup key; 16 bytes of state
    per document instead of the document)."""
    return docs.withColumn("content_hash",
                           F.md5(F.col(text_col).cast("string")))


def dedup_stream(docs: DataFrame, ts_col: str = "event_time",
                 text_col: str = "text",
                 watermark_delay: str = "10 minutes") -> DataFrame:
    """First arrival per content hash within the watermark horizon.

    Input must be a STREAMING DataFrame with an event-time column;
    state for hashes older than ``watermark_delay`` is evicted, which
    is what makes this safe on an unbounded stream.
    """
    return (with_content_hash(docs, text_col)
            .withWatermark(ts_col, watermark_delay)
            .dropDuplicatesWithinWatermark(["content_hash"]))


def dedup_stream_unbounded(docs: DataFrame,
                           text_col: str = "text") -> DataFrame:
    """Exact streaming dedup with unbounded state — finite backfills
    only (state grows with the distinct-hash count forever)."""
    return (with_content_hash(docs, text_col)
            .dropDuplicates(["content_hash"]))


def url_dedup_stream(docs: DataFrame, ts_col: str = "event_time",
                     url_col: str = "url",
                     watermark_delay: str = "10 minutes") -> DataFrame:
    """Ingest-time URL dedup: first arrival per NORMALIZED url within
    the watermark horizon — the streaming half of the batch URL family
    (operators/urls.url_duplicates), sharing the exact canonicalization
    expression so 'HTTPS://WWW.E.com/x/?utm_source=f' and
    'https://www.e.com/x' collide on arrival, not at the next batch
    sweep.  State rows carry the 16-byte md5 of the normalized url plus
    a timestamp — never the url string itself."""
    from ..operators.urls import normalize_url

    return (docs.withColumn("url_norm", normalize_url(F.col(url_col)))
            .withColumn("url_hash", F.md5(F.col("url_norm")))
            .withWatermark(ts_col, watermark_delay)
            .dropDuplicatesWithinWatermark(["url_hash"]))


def batch_url_keep_first(docs: DataFrame, order_col: str,
                         url_col: str = "url") -> DataFrame:
    """Batch twin of :func:`url_dedup_stream`'s keep-first policy — one
    row per normalized url, smallest ``order_col`` wins.  Pins
    stream == batch in tests."""
    from ..operators.urls import normalize_url

    w = (docs.withColumn("url_norm", normalize_url(F.col(url_col)))
         .withColumn("url_hash", F.md5(F.col("url_norm"))))
    first = w.groupBy("url_hash").agg(F.min(order_col).alias(order_col))
    return w.join(first, ["url_hash", order_col], "left_semi")


def batch_keep_first(docs: DataFrame, order_col: str,
                     text_col: str = "text") -> DataFrame:
    """Batch twin of the streaming keep-first policy: one row per
    content hash, the one with the smallest ``order_col`` (arrival
    order).  Used by tests to pin stream == batch equivalence."""
    w = with_content_hash(docs, text_col)
    first = (w.groupBy("content_hash")
             .agg(F.min(order_col).alias(order_col)))
    return w.join(first, ["content_hash", order_col], "left_semi")
