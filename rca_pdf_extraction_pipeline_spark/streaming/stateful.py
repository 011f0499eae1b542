"""Custom stateful streaming operator — ``applyInPandasWithState``.

The reference has no streaming at all; this is the cluster-ingest
telemetry piece of the training-data pipeline: per-user running event
totals maintained across micro-batches in managed group state (the
Structured Streaming analogue of a keyed operator with checkpointed
state — survives restarts via the streaming checkpoint).

Determinism contract: totals accumulate as INTEGER CENTS
(``round(value * 100)`` per row, summed as int64), so the result is
identical regardless of how rows split across micro-batches — a float
accumulator would drift with batch boundaries and break the
stream == batch equivalence the tests pin.

Scale notes: state is one small tuple per user_id (bounded by key
cardinality, not stream length); update-mode output emits only keys
that received data in the batch.  On a cluster the state store shards
with the groupBy exchange and checkpoints incrementally (RocksDB state
store in production configs).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_cents long"
STATE_SCHEMA = "n bigint, cents bigint"


def running_user_totals(events: DataFrame) -> DataFrame:
    """events(ts, user_id, event_type, value) -> running per-user totals,
    one row per (user, micro-batch-with-data); the LAST row per user is
    the complete total.  Works identically on a batch frame (one "batch"
    = all data)."""

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_cents": [cents]})

    return (events.groupBy("user_id")
            .applyInPandasWithState(
                fn,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
