"""Full Debezium envelope support (the non-SMT wire format).

The reference flattens events in the connector with ExtractNewRecordState
(mysql-connector-config-clean.json:21-22), so its consumer only ever sees
after-images.  Real deployments often ship the FULL envelope instead:

    {"before": {...}|null, "after": {...}|null,
     "op": "c"|"u"|"d"|"r", "ts_ms": ..., "source": {...}}

This module normalizes that richer format to the engine's canonical feed
shape (same columns the SMT path produces), so every downstream operator
(history/snapshot/stats/streaming merge) works unchanged on either wire
format — one engine, two capture configurations.

op mapping: c(reate)/r(ead snapshot) → live row; u(pdate) → live row;
d(elete) → ``__deleted='true'`` with the before-image as payload (exactly
what the SMT delete-rewrite emits, mysql-connector-config-clean.json:24).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from cdc_practice_spark.schemas import BANK_ACCOUNT_SCHEMA

ENVELOPE_SCHEMA = StructType(
    [
        StructField("before", BANK_ACCOUNT_SCHEMA),
        StructField("after", BANK_ACCOUNT_SCHEMA),
        StructField("op", StringType()),
        StructField("ts_ms", LongType()),
        StructField(
            "source",
            StructType(
                [
                    StructField("db", StringType()),
                    StructField("table", StringType()),
                ]
            ),
        ),
    ]
)


def parse_debezium_envelope(kafka_df: DataFrame) -> DataFrame:
    """Kafka records carrying full Debezium envelopes → canonical feed.

    Tombstones are skipped (P1); deletes surface the BEFORE image with
    ``__deleted='true'`` (matching the SMT rewrite); snapshot reads (op
    'r') are INSERT-equivalent live rows — replaying a snapshot+stream
    topic rebuilds the warehouse exactly like the reference's
    from-earliest replay (simple_kafka_etl.py:52)."""
    parsed = kafka_df.filter(F.col("value").isNotNull()).select(
        F.col("topic").alias("kafka_topic"),
        F.col("partition").alias("kafka_partition"),
        F.col("offset").alias("kafka_offset"),
        F.from_json(F.col("value").cast("string"), ENVELOPE_SCHEMA).alias("env"),
    )
    is_delete = F.col("env.op") == "d"
    image = F.when(is_delete, F.col("env.before")).otherwise(F.col("env.after"))
    return parsed.select(
        "kafka_topic",
        "kafka_partition",
        "kafka_offset",
        image.getField("id").alias("id"),
        image.getField("user_id").alias("user_id"),
        image.getField("account").alias("account"),
        image.getField("registered_at").alias("registered_at"),
        F.when(is_delete, F.lit("true")).otherwise(F.lit("false")).alias("__deleted"),
        F.col("env.op").alias("op"),
        F.timestamp_millis(F.col("env.ts_ms")).alias("source_ts"),
    )
