"""Gap-based sessionization — the inactivity-window operator behind
clickstream / interaction-log training data (user "sessions" close
after ``gap_minutes`` without an event).

Built on Spark's native ``session_window`` (dynamic-gap windows merged
by the aggregation itself), so batch and Structured Streaming share one
code path: the same expression works under ``readStream`` +
``withWatermark`` with state evicted once the watermark passes a
session's close.

Scale: ONE hash exchange on the user key; partial session merging
happens map-side, and AQE coalesces the post-shuffle partitions.  This
replaces the self-join / global-sort formulations that need either an
O(N log N) sort per key or a window function over the full event
stream.  Complements the boundary-event sessionization of
``w2_cumsum_sessions`` (event-driven split vs time-gap split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts",
               value_col: str = "value",
               watermark: str = "10 minutes") -> DataFrame:
    """(user, session_start, session_end, n_events, total_value):
    events within ``gap_minutes`` of the previous event chain into one
    session (boundary INCLUSIVE: an event exactly gap after the last
    still chains — pinned by test); ``session_end`` is Spark's
    convention — last event + gap (the instant the session closed).

    Works on batch AND streaming frames: on a stream the watermark
    finalizes (and evicts) a session once event time passes its close,
    so the batch output is the exact completion of the stream's
    (pinned by test_streaming).  ``total_value`` is summed in
    micro-units (integer) and scaled back, so cross-row float addition
    order can't change the result."""
    if gap_minutes <= 0:
        raise ValueError(f"gap_minutes must be positive, got {gap_minutes}")
    # watermarking requires TIMESTAMP (ltz); gap arithmetic is wall-time
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), f"{gap_minutes} minutes")
    micro = F.round(F.col(value_col) * 1_000_000).cast("long")
    return (src
            .groupBy(F.col(user_col), win.alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 (F.sum(micro).cast("double") / 1_000_000)
                 .alias("total_value"))
            .select(F.col(user_col),
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events",
                    F.round(F.col("total_value"), 2).alias("total_value")))
