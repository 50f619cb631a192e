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
``running_user_state`` runs without timeouts (CDC state never expires);
``session_close_on_timeout`` below is the EXPIRING tier —
EventTimeTimeout-driven session closure with state removal.
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


# ---------------------------------------------------------------------------
# Event-time-timeout sessionization — the state-EXPIRY tier.
#
# running_user_state never expires (CDC state is permanent); a session
# aggregator is the canonical operator that MUST expire: a user's
# session closes when the event-time watermark passes last_event + gap,
# at which point the state is freed and the closed session emitted.
# This exercises GroupStateTimeout.EventTimeTimeout — the mechanism that
# bounds arbitrary-state memory at 100 TB (without it, every key ever
# seen holds state forever).
#
# Determinism note: timed-out groups emit when a LATER micro-batch's
# watermark passes their timeout — availableNow runs a final no-data
# batch for exactly this cleanup, and the batch-equivalence test pins
# the semantics (streaming sessions == batch gap-sessionization for all
# sessions the final watermark can close).
# ---------------------------------------------------------------------------

SESSION_STATE_SCHEMA = "start_us long, end_us long, n_events long"
SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start_us long, session_end_us long, n_events long"
)


def _session_with_timeout(gap_us: int):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start_us": start_us,
                        "session_end_us": end_us,
                        "n_events": n,
                    }
                ]
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts_us")
        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us, end_us, n = None, None, 0
        out = []
        for ts in rows["ts_us"].astype("int64"):
            if start_us is None:
                start_us, end_us, n = int(ts), int(ts), 1
            elif ts - end_us <= gap_us:
                end_us, n = int(ts), n + 1
            else:  # gap exceeded WITHIN the data: close and restart
                out.append((start_us, end_us, n))
                start_us, end_us, n = int(ts), int(ts), 1
        state.update((start_us, end_us, n))
        # expire when the watermark passes the open session's end + gap
        state.setTimeoutTimestamp((end_us + gap_us) // 1000)
        if out:
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start_us": s,
                        "session_end_us": e,
                        "n_events": c,
                    }
                    for s, e, c in out
                ]
            )

    return update


def session_close_on_timeout(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "0 seconds"
) -> DataFrame:
    """Gap-based sessionization with EVENT-TIME state expiry: closed
    sessions emit either when a later event of the same user exceeds the
    gap (in-data closure) or when the watermark passes the open
    session's end + gap (timeout closure — state removed).  Gap parsed
    as minutes/seconds; emitted bounds are epoch-µs."""
    from pyspark.sql import functions as F

    n, unit = gap.split()
    gap_us = int(n) * (60_000_000 if unit.startswith("minute") else 1_000_000)
    prepared = (
        events.withColumn("event_time", F.col("ts").cast("timestamp"))
        .withWatermark("event_time", watermark)
        .select(
            F.col("user_id"),
            F.unix_micros(F.col("event_time")).alias("ts_us"),
            "event_time",
        )
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_with_timeout(gap_us),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState — Spark 4's successor API for arbitrary state.
#
# Same per-user accumulator as running_user_state above, re-expressed as
# a StatefulProcessor over typed state variables.  What the new API buys
# at scale over applyInPandasWithState:
#   - NAMED state variables (ValueState/ListState/MapState) with
#     per-variable TTL, instead of one opaque tuple per key;
#   - state-store-level schema evolution (add a variable without
#     rebuilding the checkpoint);
#   - handleInitialState: bootstrap streaming state from a BATCH
#     DataFrame — exactly the CDC deployment story (seed the running
#     stats from the warehouse snapshot, then tail the feed; no need to
#     replay history through the stream).
# The batch-equivalence test pins both the plain run and the
# snapshot-bootstrapped run to the batch aggregate.
# ---------------------------------------------------------------------------

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class RunningUserStateProcessor(StatefulProcessor):
    """Per-user (n_events, last_value, last_offset, first_seen_us) kept
    in one ValueState, updated per micro-batch in offset order."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._acc = handle.getValueState("acc", STATE_SCHEMA)

    def handleInitialState(self, key, initialState, timerValues) -> None:
        row = initialState.iloc[0]
        self._acc.update(
            (
                int(row["n_events"]),
                float(row["last_value"]),
                int(row["last_offset"]),
                int(row["first_seen_us"]),
            )
        )

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        if self._acc.exists():
            n_events, last_value, last_offset, first_seen_us = self._acc.get()
        else:
            n_events, last_value, last_offset, first_seen_us = 0, None, -1, None
        for pdf in rows:
            pdf = pdf.sort_values("kafka_offset")
            n_events += len(pdf)
            if len(pdf):
                tail = pdf.iloc[-1]
                if int(tail["kafka_offset"]) > last_offset:
                    last_value = float(tail["value"])
                    last_offset = int(tail["kafka_offset"])
                head_us = int(pdf["ts_us"].min())
                first_seen_us = (
                    head_us
                    if first_seen_us is None
                    else min(first_seen_us, head_us)
                )
        self._acc.update((n_events, last_value, last_offset, first_seen_us))
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

    def close(self) -> None:
        pass


def running_user_state_tws(
    feed: DataFrame, initial_state: DataFrame | None = None
) -> DataFrame:
    """The transformWithState twin of ``running_user_state``: identical
    output contract, typed state variables underneath.  Pass
    ``initial_state`` (a batch DataFrame in the OUTPUT schema, e.g. the
    warehouse snapshot's per-user stats) to seed the store before the
    first micro-batch — the stream then continues from the snapshot
    instead of replaying history."""
    from pyspark.sql import functions as F

    prepared = feed.select(
        F.col("original_id").alias("user_id"),
        F.col("kafka_offset"),
        F.col("value"),
        F.unix_micros(F.col("registered_at").cast("timestamp")).alias("ts_us"),
    )
    init = (
        initial_state.groupBy("user_id") if initial_state is not None else None
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningUserStateProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
        initialState=init,
    )
