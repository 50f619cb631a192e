"""Custom stateful streaming operator via applyInPandasWithState —
the arbitrary-state tier of Structured Streaming (what the reference's
hand-rolled consumer loop would need Spark-side if its per-key logic
outgrew windows/joins).

``running_user_state`` maintains, per user key, a live account of the
change feed: event count, last value, last offset, and the first-seen
timestamp — i.e. an incrementally-maintained ``user_account_stats``
(README.md:38) that updates per micro-batch instead of being recomputed.

State is a GroupState holding one tuple per key — O(keys) memory across
the cluster, partitioned by the group key, checkpointed with the query.
Timeouts are left off (the CDC state never expires); a TTL'd variant
would pass GroupStateTimeout.ProcessingTimeTimeout and call
``state.setTimeoutDuration``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events long, last_value double, last_offset long, first_seen_us long"
OUTPUT_SCHEMA = (
    "user_id long, n_events long, last_value double, last_offset long, "
    "first_seen_us long"
)


def _update_user_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n_events, last_value, last_offset, first_seen_us = state.get
    else:
        n_events, last_value, last_offset, first_seen_us = 0, None, -1, None

    for pdf in pdfs:
        pdf = pdf.sort_values("kafka_offset")
        n_events += len(pdf)
        if len(pdf):
            tail = pdf.iloc[-1]
            # per-key offset order: only advance on newer offsets (replays
            # of old batches can't regress the state)
            if int(tail["kafka_offset"]) > last_offset:
                last_value = float(tail["value"])
                last_offset = int(tail["kafka_offset"])
            head_us = int(pdf["ts_us"].min())
            first_seen_us = head_us if first_seen_us is None else min(first_seen_us, head_us)

    state.update((n_events, last_value, last_offset, first_seen_us))
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "n_events": n_events,
                "last_value": last_value,
                "last_offset": last_offset,
                "first_seen_us": first_seen_us,
            }
        ]
    )


def running_user_state(feed: DataFrame) -> DataFrame:
    """Apply the stateful per-user accumulator to a (streaming or batch)
    normalized change feed.  Emits one updated row per key per batch."""
    from pyspark.sql import functions as F

    prepared = feed.select(
        F.col("original_id").alias("user_id"),
        F.col("kafka_offset"),
        F.col("value"),
        F.unix_micros(F.col("registered_at").cast("timestamp")).alias("ts_us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
