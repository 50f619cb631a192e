"""Structured Streaming shells (S6–S9): readStream → the SAME transform
functions the batch path uses → append/upsert sinks.

Batch/stream unification is the design win: ``change_feed_from_events``,
``merge_batch``, and the windowed aggregates are plain DataFrame
functions, so one implementation serves the driver's batch harness AND
the streaming runtime (the reference needed a hand-rolled consumer loop
for the latter — simple_kafka_etl.py:38-198).

Delivery semantics: the reference is at-least-once + idempotent-apply
(auto-commit offsets, dedup probe — simple_kafka_etl.py:52-55,81-88).
Spark's checkpoint gives exactly-once source tracking; we keep the
coordinate dedup anyway (``dropDuplicatesWithinWatermark`` bounds the
dedup state that the reference kept unbounded in Postgres).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from cdc_practice_spark.cdc.feed import change_feed_from_events
from cdc_practice_spark.streaming.upsert import empty_state, merge_batch

# Raw fixture schema (ts as int64 nanos — see session.load_table).
EVENTS_FILE_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over events parquet (the batch-replayable
    stand-in for the Kafka topic — SURVEY.md §1.4).  One file per
    trigger ⇒ deterministic micro-batch boundaries in tests."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = (
        spark.readStream.schema(EVENTS_FILE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    return raw.withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
    )


def stream_history_append(
    events_stream: DataFrame, out_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """S8 append-only history sink: normalized feed rows appended as
    parquet.  The watermark-bounded coordinate dedup (replacing the
    reference's unbounded SELECT-COUNT probe, simple_kafka_etl.py:81-88)
    lives INSIDE change_feed_from_events — one state store, shared with
    the upsert path, instead of the double-dedup this sink used to
    layer on top."""
    feed = change_feed_from_events(events_stream)
    return (
        feed.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_current_upsert(
    spark: SparkSession,
    events_stream: DataFrame,
    state_root: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """S9 upsert sink via foreachBatch MERGE (streaming/upsert.py).

    State versioning: each epoch writes ``state_root/v{epoch}`` and
    updates a pointer file — the parquet-only stand-in for a Delta/
    Iceberg MERGE target (atomic swap, time-travelable, and safe
    against reading-while-overwriting)."""
    feed = change_feed_from_events(events_stream)

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        existing = load_current_state(spark, state_root)
        new_state = merge_batch(existing, batch_df)
        out = os.path.join(state_root, f"v{epoch_id}")
        new_state.write.mode("overwrite").parquet(out)
        with open(os.path.join(state_root, "_POINTER.tmp"), "w") as fh:
            fh.write(out)
        os.replace(
            os.path.join(state_root, "_POINTER.tmp"),
            os.path.join(state_root, "_POINTER"),
        )

    return (
        feed.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def load_current_state(spark: SparkSession, state_root: str) -> DataFrame:
    pointer = os.path.join(state_root, "_POINTER")
    if not os.path.exists(pointer):
        return empty_state(spark)
    with open(pointer) as fh:
        path = fh.read().strip()
    return spark.read.parquet(path)


def stream_windowed_stats(
    events_stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Event-time tumbling window aggregate with a watermark — the
    streaming twin of queries/analytics.py:event_time_tumbling_agg.
    Late events beyond the watermark are dropped (the reference has no
    late-data story at all — SURVEY.md §2.4); state is bounded."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start").cast("timestamp")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_session_windows(
    events_stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming session windows — the same session_window operator the
    batch query (queries/events_queries.py:session_window_native) uses,
    unchanged: rows within `gap` of each other merge into one
    [first_ts, last_ts + gap) window per user.  The watermark both
    bounds state AND closes sessions (a session emits only once the
    watermark passes its end — append-mode semantics), which is exactly
    the late-data story the reference lacks (SURVEY.md §2.4)."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window(F.col("ts"), gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start").cast("timestamp")).alias("window_start_us"),
            F.unix_micros(F.col("w.end").cast("timestamp")).alias("window_end_us"),
            "n_events",
        )
    )
