"""Pipeline observability (P12): the reference logs a per-message
``processed_count`` (simple_kafka_etl.py:59,72); the engine's equivalent
is ``DataFrame.observe`` — named aggregate metrics computed inline with
the job (no second scan, no driver-side loop) and surfaced on the
query-progress/listener bus in streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_feed(feed: DataFrame, name: str = "cdc_feed_metrics"):
    """Attach engine metrics to a (batch) feed: processed count, delete
    count, distinct-key estimate, max offset.  Returns (df, observation);
    read ``observation.get`` after an action."""
    obs = Observation(name)
    df = feed.observe(
        obs,
        F.count(F.lit(1)).alias("processed_count"),
        F.sum(F.when(F.col("__deleted") == "true", 1).otherwise(0)).alias(
            "delete_count"
        ),
        F.approx_count_distinct("original_id").alias("approx_keys"),
        F.max("kafka_offset").alias("max_offset"),
    )
    return df, obs


def observe_stream(feed: DataFrame, name: str = "cdc_feed_metrics") -> DataFrame:
    """Streaming variant: same metrics, emitted per micro-batch in
    QueryProgressEvent.observedMetrics[name] (listener-consumable)."""
    return feed.observe(
        name,
        F.count(F.lit(1)).alias("processed_count"),
        F.sum(F.when(F.col("__deleted") == "true", 1).otherwise(0)).alias(
            "delete_count"
        ),
        F.max("kafka_offset").alias("max_offset"),
    )


def observe_drift(parsed: DataFrame, name="cdc_schema_drift") -> DataFrame:
    """Schema-drift metric over a rescue-parsed feed (``parse_debezium(
    rescue=True)``): rows carrying rescued (schema-unknown) fields and an
    estimate of how many distinct unknown keys are in flight.  ``name``
    is a string (streaming: metrics land per micro-batch in
    QueryProgressEvent.observedMetrics[name]) or an Observation (batch:
    read ``obs.get`` after an action) — the alerting hook for upstream
    ALTER TABLE: drifted_count > 0 means the fixed StructType is stale."""
    drifted = F.size(F.col("_rescued")) > 0
    return parsed.observe(
        name,
        F.count(F.lit(1)).alias("processed_count"),
        F.sum(drifted.cast("long")).alias("drifted_count"),
        F.approx_count_distinct(
            F.concat_ws(",", F.array_sort(F.map_keys(F.col("_rescued"))))
        ).alias("approx_key_shapes"),
    )
