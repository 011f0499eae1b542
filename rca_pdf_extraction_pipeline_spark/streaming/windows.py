"""Event-time windowed aggregation with watermarking — the Structured
Streaming counterpart of the batch event analytics (SURVEY.md §2.5).

The extraction pipeline itself is stateless (streaming/pipeline.py), but
a corpus-ingest deployment also needs progress/throughput telemetry over
the event stream: tumbling-window counts with late-data tolerance.

    events(ts timestamp, user_id long, event_type string, value double)
      -> windowed (window_start, window_end, event_type, n_events, total_value)

Watermark semantics: rows later than ``watermark`` behind the max seen
event time are dropped and their windows finalized — bounded state at
any scale (state size = open windows x group cardinality, independent of
stream length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, window: str = "10 minutes",
                          watermark: str = "5 minutes") -> DataFrame:
    """Tumbling event-time windows per event_type. Works on both batch
    and streaming frames (watermark is a no-op in batch, so batch output
    is the exact completion of the stream's results — tested)."""
    # watermarking requires TIMESTAMP (ltz); event-time arithmetic is
    # tz-consistent within a session
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    w = F.window("ts", window)
    return (
        src.groupBy(w.alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("win.start").alias("window_start"),
                F.col("win.end").alias("window_end"),
                "event_type", "n_events", "total_value")
    )
