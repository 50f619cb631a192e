"""bank_accounts_current analog — SCD-1 current-state snapshot (S9, P4/P8–P10).

Reference semantics (SURVEY.md §2.5.2): the current table holds the
latest event per key, dropped when that event is a delete
(simple_kafka_etl.py:108,134-138,159-163), with
``original_registered_at`` preserved from the key's most recent INSERT
(immutable across UPDATEs — simple_kafka_etl.py:133-138) and
``last_updated_at`` stamped on every write (:136,162 — NOW() in the
reference; event-time here for determinism, SURVEY.md §7.4.3).

Spark-first translation: the reference's row-at-a-time
INSERT-or-UPDATE-or-DELETE merge becomes a latest-per-key window dedup —
``row_number() = 1`` over (key, offset desc), then filter out keys whose
latest event is a delete.  In streaming mode the same transform runs
inside ``foreachBatch`` (see streaming/pipeline.py).

Scale: one shuffle on the key; the window's per-key state is one row.
AQE skew-join/partition-coalescing handles hot keys.  This is the
standard "compact a change log to a snapshot" plan and is exactly what a
1000-executor compaction job would run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_practice_spark.cdc.history import with_change_type, with_registered_at_carry
from cdc_practice_spark.schemas import PROPS_SCHEMA

CURRENT_COLUMNS = [
    "original_id",
    "user_id",
    "value",
    "original_registered_at",
    "last_updated_at",
]


def build_current(feed: DataFrame) -> DataFrame:
    """Latest-per-key snapshot, delete-aware, with first-INSERT carry.

    Mirrors the reference's upsert loop end state: after replaying the
    feed in per-key offset order, current = the last live after-image per
    key (simple_kafka_etl.py:108,134-138,159-163)."""
    typed = with_change_type(feed)
    carried = with_registered_at_carry(typed)
    return current_from_carried(carried)


def current_from_carried(carried: DataFrame) -> DataFrame:
    """The snapshot TAIL shared by build_current and the bootstrap
    handoff (cdc/handoff.py): latest-per-key filter + delete apply +
    the canonical 7-column projection."""
    # latest-per-key via an ORDERLESS max-offset window: its required
    # ordering (just the partition key) is already satisfied by the
    # change_type/carry windows' (key, offset) sort, so Catalyst elides
    # the descending re-sort a row_number().desc() would force — the
    # whole snapshot runs on ONE exchange + ONE sort.
    w = Window.partitionBy("original_id")
    return (
        carried.withColumn("_max_offset", F.max("kafka_offset").over(w))
        .filter(
            (F.col("kafka_offset") == F.col("_max_offset"))
            & (F.col("__deleted") == "false")  # P8 delete apply
        )
        .select(
            F.col("original_id"),
            F.col("original_id").alias("user_id"),
            F.col("value"),
            F.col("event_type"),
            # parse post-filter: only the surviving latest-per-key rows
            # pay from_json (see feed.py — eager props_k is pruned away)
            F.from_json(F.col("props"), PROPS_SCHEMA).getField("k").alias("props_k"),
            F.col("original_registered_at"),
            F.col("registered_at").alias("last_updated_at"),
        )
    )
