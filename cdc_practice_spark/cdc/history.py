"""bank_accounts_history analog — append-only audit log (S8, P5–P7).

Reference semantics (SURVEY.md §2.5.1): every change event becomes one
history row with

  - ``change_type`` ∈ INSERT/UPDATE/DELETE, derived per event from
    ``__deleted`` + key-existence in the current table
    (simple_kafka_etl.py:76,114,128-131): DELETE when ``__deleted='true'``;
    INSERT when the key is absent from current (i.e. first event for the
    key, or the previous event for the key was a delete); else UPDATE.
  - ``original_registered_at`` carried forward from the key's most recent
    INSERT (the reference looks it up in the current table per row,
    simple_kafka_etl.py:90-93,141-144; on INSERT it is the event's own
    ``registered_at``, :173).
  - ``change_timestamp``: the reference stamps NOW() for UPDATE/DELETE
    (simple_kafka_etl.py:100,150) but the *source* ``registered_at`` for
    INSERT (:170-173).  NOW() is unreproducible, so the engine uses
    event-time (the feed's ``registered_at``) for all rows — the INSERT
    quirk is thereby honored exactly, and UPDATE/DELETE get the
    deterministic event-time stand-in (SURVEY.md §7.4.3/§7.4.5).

Spark-first translation: the reference's three per-row probes
(existence probe P4, lookup join P5) collapse into two window functions
over (key, offset) — ``lag(__deleted)`` for change_type and
``last(INSERT-time, ignorenulls)`` for the carry-forward.  One shuffle on
the key, no joins, no per-row round-trips.

Scale: a single hash-partition by ``original_id`` (AQE handles skew);
window state per key is O(1) streaming through sorted runs — this plan
survives 1000 executors reading 100 TB because nothing is global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HISTORY_COLUMNS = [
    "original_id",
    "user_id",
    "account",
    "change_type",
    "change_timestamp",
    "original_registered_at",
    "kafka_offset",
    "kafka_partition",
    "kafka_topic",
]


def with_change_type(feed: DataFrame, key: str = "original_id", order: str = "kafka_offset") -> DataFrame:
    """Derive INSERT/UPDATE/DELETE per event (P7).

    ``lag(__deleted)`` over the per-key offset order replaces the
    reference's per-row existence probe against the current table
    (simple_kafka_etl.py:128-131): the key exists in current exactly when
    its previous event was a non-delete.
    """
    w = Window.partitionBy(key).orderBy(order)
    prev_deleted = F.lag("__deleted").over(w)
    return feed.withColumn(
        "change_type",
        F.when(F.col("__deleted") == "true", F.lit("DELETE"))
        .when(prev_deleted.isNull() | (prev_deleted == "true"), F.lit("INSERT"))
        .otherwise(F.lit("UPDATE")),
    )


def with_registered_at_carry(
    typed: DataFrame,
    key: str = "original_id",
    order: str = "kafka_offset",
    insert_ts_expr: "F.Column | None" = None,
) -> DataFrame:
    """Carry ``registered_at`` forward from the key's most recent INSERT
    (P5).  ``last(..., ignorenulls=True)`` over an unbounded-preceding
    window replaces the reference's per-row lookup join against current
    (simple_kafka_etl.py:90-93,141-144).

    ``insert_ts_expr`` overrides the value an INSERT-classified row
    contributes (default: its own ``registered_at``) — the snapshot
    handoff seeds synthetic READ rows with the snapshot's original
    timestamp this way (cdc/handoff.py) while sharing this window."""
    w = (
        Window.partitionBy(key)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if insert_ts_expr is None:
        insert_ts_expr = F.col("registered_at")
    insert_ts = F.when(F.col("change_type") == "INSERT", insert_ts_expr)
    carried = F.last(insert_ts, ignorenulls=True).over(w)
    # A DELETE whose key is NOT currently live (first event, or right
    # after another DELETE) finds no row to look up — the reference's
    # probe misses and registered_at is NULL (simple_kafka_etl.py:
    # 141-144).  The last-INSERT carry must not leak across that
    # boundary.  Same window spec as the carry — rides the same sort.
    prev_deleted = F.lag("__deleted").over(Window.partitionBy(key).orderBy(order))
    dead_delete = (F.col("change_type") == "DELETE") & (
        prev_deleted.isNull() | (prev_deleted == "true")
    )
    return typed.withColumn(
        "original_registered_at",
        F.when(dead_delete, F.lit(None).cast("timestamp_ntz")).otherwise(carried),
    )


def build_history(feed: DataFrame) -> DataFrame:
    """Full history pipeline: change_type + carry-forward + projection (P6).

    The feed's key column is ``original_id`` and the mutable payload is
    ``value`` (the ``account`` analog — FIXTURES.md §B); the projection
    mirrors the reference's history INSERT column list
    (simple_kafka_etl.py:97-99)."""
    typed = with_change_type(feed)
    carried = with_registered_at_carry(typed)
    # NOTE: user_id is materialized via withColumn, not a second
    # `original_id.alias(...)` in the select — two references to one
    # attribute trip an optimizer INTERNAL_ERROR (attribute-not-found)
    # when count() prunes columns above a union+window plan.
    carried = carried.withColumn("user_id", F.col("original_id"))
    return carried.select(
        F.col("original_id"),
        F.col("user_id"),  # key doubles as the user in the fixture mapping
        F.col("value"),
        F.col("event_type"),
        F.col("change_type"),
        F.col("registered_at").alias("change_timestamp"),
        F.col("original_registered_at"),
        F.col("kafka_offset"),
        F.col("kafka_partition"),
        F.col("kafka_topic"),
    )
