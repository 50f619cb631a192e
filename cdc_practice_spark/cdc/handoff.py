"""Initial-snapshot → binlog-tail handoff (Debezium snapshot mode).

A CDC connector bootstraps a table by (1) taking a consistent snapshot
at binlog position S — emitted as READ events carrying each existing
row — then (2) streaming changes from the log.  For safety the log is
often re-read from an EARLIER position G < S (rewind-on-reconnect,
at-least-once buses), so the tail overlaps changes already baked into
the snapshot.  The reference pipeline never faces this (its e2e test
starts Kafka and MySQL together, test-etl-pipeline.sh:67-76); a real
bootstrap does, and applying the overlap naively resurrects deleted
rows and regresses values.

The merge here is exact:

  1. overlap discard — tail events with offset <= S are already
     reflected in the snapshot and are dropped (per-event, stateless);
  2. snapshot rows become synthetic READ events at offset S, so the
     standard change-feed windows see the correct per-key prefix state
     (a first tail event for a snapshotted key classifies UPDATE, not
     INSERT — the reference's P4 existence probe, seeded);
  3. the first-INSERT carry is SEEDED: a READ event contributes the
     snapshot's original_registered_at (the pre-S INSERT's timestamp,
     which the tail alone cannot know), while a genuine tail INSERT
     contributes its own registered_at, exactly as in the full build.

Result contract: the handoff snapshot is ROW-IDENTICAL to building the
snapshot over the complete feed — pinned by the oracle (full-hash vs
the cdc_current_snapshot SQL) and tests.

Scale: the snapshot is |live keys| rows, the tail is the new events —
the merge unions them and runs the SAME one-exchange window pipeline as
build_current; nothing re-reads the pre-S log.  This is how a
1000-executor warehouse bootstraps from 100 TB of state + a day of
binlog without replaying history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_practice_spark.cdc.feed import TOPIC
from cdc_practice_spark.cdc.history import (
    with_change_type,
    with_registered_at_carry,
)
from cdc_practice_spark.cdc.snapshot import current_from_carried


def snapshot_handoff_current(
    snapshot: DataFrame, tail_feed: DataFrame, snapshot_offset: int
) -> DataFrame:
    """Merge an initial snapshot (build_current output, valid as of
    ``snapshot_offset``) with a change-feed tail that may overlap it;
    returns the current-state snapshot as of the tail's end, identical
    to a from-scratch build over the full feed."""
    s = int(snapshot_offset)
    read_events = snapshot.select(
        F.lit(s).cast("long").alias("kafka_offset"),
        F.lit(0).alias("kafka_partition"),
        F.lit(TOPIC).alias("kafka_topic"),
        F.col("original_id"),
        F.col("event_type"),
        F.col("value"),
        # the READ after-image's event time is the row's last pre-S write
        F.col("last_updated_at").alias("registered_at"),
        F.lit("false").alias("__deleted"),
        F.col("props_k"),
        # raw-payload passthrough for the post-filter parse (feed.py)
        F.to_json(F.struct(F.col("props_k").alias("k"))).alias("props"),
        # seed for the first-INSERT carry — only READ rows carry it
        F.col("original_registered_at").alias("_snap_orig"),
    )
    tail = tail_feed.filter(F.col("kafka_offset") > s).withColumn(
        "_snap_orig", F.lit(None).cast("timestamp_ntz")
    )
    merged = read_events.unionByName(tail.select(*read_events.columns))
    typed = with_change_type(merged)
    # SEEDED carry: the shared P5 window, with INSERT-classified READ
    # rows contributing the SNAPSHOT's original timestamp (their own
    # registered_at is the last update time, not the first insert time);
    # genuine tail INSERTs have _snap_orig null and contribute their own
    carried = with_registered_at_carry(
        typed,
        insert_ts_expr=F.coalesce(F.col("_snap_orig"), F.col("registered_at")),
    )
    return current_from_carried(carried)
