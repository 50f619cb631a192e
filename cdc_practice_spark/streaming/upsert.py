"""Incremental snapshot upsert — the streaming twin of cdc/snapshot.py.

The reference applies changes row-at-a-time: existence probe → INSERT or
UPDATE, DELETE on delete-events (simple_kafka_etl.py:108,128-138,159-163).
Spark-first, the same contract becomes a per-micro-batch MERGE:

  new_state = latest-per-key(batch) ⟕ existing_state
    - keys only in existing       → carried over unchanged
    - keys in batch, last event live   → upserted (registered_at carried
      from the batch's last INSERT, else from existing state —
      the immutability rule of simple_kafka_etl.py:133)
    - keys in batch, last event delete → dropped

Set-oriented: one window over the batch (tiny), one join against state
keyed by original_id.  At 100 TB state lives in a key-partitioned table
(Delta/Iceberg MERGE or partition-overwrite); here state is parquet and
each epoch writes a new version directory (atomic swap by pointer) —
same plan shape, lakehouse-grade when swapped to a table format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STATE_COLUMNS = [
    "original_id",
    "value",
    "event_type",
    "props_k",
    "original_registered_at",
    "last_updated_at",
    "last_offset",
]


def empty_state(spark) -> DataFrame:
    return spark.createDataFrame(
        [],
        "original_id long, value double, event_type string, props_k int, "
        "original_registered_at timestamp_ntz, last_updated_at timestamp_ntz, "
        "last_offset long",
    )


def merge_batch(existing: DataFrame, batch_feed: DataFrame) -> DataFrame:
    """One MERGE step: apply a micro-batch of normalized change events
    (cdc/feed.py shape) to the existing snapshot state."""
    w = Window.partitionBy("original_id").orderBy("kafka_offset")
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    ex = existing.select(
        F.col("original_id").alias("ex_id"),
        F.col("original_registered_at").alias("ex_registered_at"),
    )

    b = batch_feed.join(
        ex, batch_feed["original_id"] == ex["ex_id"], "left"
    )

    # change_type inside the batch: the first batch event's "previous
    # state" is the existing snapshot (the reference's existence probe,
    # simple_kafka_etl.py:128-131); later events see their batch
    # predecessor via lag().
    prev = F.lag("__deleted").over(w)
    prev_deleted = F.coalesce(
        prev, F.when(F.col("ex_id").isNull(), F.lit("true")).otherwise(F.lit("false"))
    )
    b = b.withColumn(
        "change_type",
        F.when(F.col("__deleted") == "true", F.lit("DELETE"))
        .when(prev_deleted == "true", F.lit("INSERT"))
        .otherwise(F.lit("UPDATE")),
    )
    # registered_at carry: last in-batch INSERT, else the existing
    # state's value (immutable across UPDATEs — simple_kafka_etl.py:133).
    carry = F.last(
        F.when(F.col("change_type") == "INSERT", F.col("registered_at")),
        ignorenulls=True,
    ).over(w_all)
    b = b.withColumn(
        "original_registered_at", F.coalesce(carry, F.col("ex_registered_at"))
    )

    rn = F.row_number().over(
        Window.partitionBy("original_id").orderBy(F.col("kafka_offset").desc())
    )
    batch_state = (
        b.withColumn("rn", rn)
        .filter((F.col("rn") == 1) & (F.col("__deleted") == "false"))
        .select(
            "original_id",
            "value",
            "event_type",
            "props_k",
            "original_registered_at",
            F.col("registered_at").alias("last_updated_at"),
            F.col("kafka_offset").alias("last_offset"),
        )
    )

    untouched = existing.join(
        batch_feed.select("original_id").distinct(), "original_id", "left_anti"
    )
    return untouched.select(*STATE_COLUMNS).unionByName(batch_state)
