"""Kafka source/sink builders for the Debezium change-event topic.

The capture layer stays external, as in the reference (MySQL binlog →
Debezium → Kafka; SURVEY.md §3.1): this engine consumes the flattened
JSON the connector's SMT chain produces
(mysql-connector-config-clean.json:21-29).

No broker exists in the test environment, so these builders are
exercised for option-correctness and for the parse/serialize round-trip
in batch (from_json/to_json are engine-agnostic); the streaming path is
covered by the file-source twin in streaming/pipeline.py, which shares
every downstream transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_practice_spark.schemas import CHANGE_EVENT_SCHEMA

DEFAULT_TOPIC = "dbserver1.bankdb.bank_accounts"  # mysql-connector-config-clean.json:25


def kafka_source_options(
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "earliest",
) -> dict[str, str]:
    """Option set mirroring the reference consumer: subscribe one topic,
    replay from earliest (simple_kafka_etl.py:48-57).  Group id /
    auto-commit are replaced by Spark's checkpointed offset tracking."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
    }


def read_kafka_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str = DEFAULT_TOPIC
) -> DataFrame:
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(bootstrap_servers, topic).items():
        reader = reader.option(k, v)
    return parse_debezium(reader.load())


def parse_debezium(
    kafka_df: DataFrame, rescue: bool = False, schema=None
) -> DataFrame:
    """Kafka record → flattened change event:
      - tombstone skip = value IS NOT NULL (P1, simple_kafka_etl.py:68-70)
      - envelope unwrap = from_json + star-expand (S3,
        mysql-connector-config-clean.json:21-22)
      - Kafka coordinates kept as the idempotency key (P3,
        simple_kafka_etl.py:81-84).

    ``rescue=True`` adds a ``_rescued`` map<string,string> of top-level
    JSON fields NOT in the parse schema.  Debezium tracks source DDL
    in a schema-history topic (mysql-connector-config-clean.json:17,20);
    a fixed-StructType ``from_json`` silently drops a column added by
    ALTER TABLE upstream — with rescue, the new column's values land in
    ``_rescued`` (empty map when the event matches the schema exactly)
    instead of vanishing.  Cost: one extra map-typed from_json in the
    same projection — no shuffle, no second scan; leave it off for
    schema-stable feeds.

    ``schema`` overrides CHANGE_EVENT_SCHEMA — pass the WIDENED
    StructType from ``schemas.evolve_schema`` to promote a rescued
    column to a typed one once the DDL is known: events from before the
    ALTER parse with NULL for the added columns (null backfill), events
    after carry the typed values.  Rescue composes: with both, only
    fields outside the widened schema land in ``_rescued``."""
    schema = schema if schema is not None else CHANGE_EVENT_SCHEMA
    known = F.array(*[F.lit(f.name) for f in schema.fields])
    cols = [
        F.col("topic").alias("kafka_topic"),
        F.col("partition").alias("kafka_partition"),
        F.col("offset").alias("kafka_offset"),
        F.from_json(F.col("value").cast("string"), schema).alias("d"),
    ]
    out = ["kafka_topic", "kafka_partition", "kafka_offset", "d.*"]
    if rescue:
        cols.append(
            F.map_filter(
                F.from_json(F.col("value").cast("string"), "map<string,string>"),
                lambda k, _: ~F.array_contains(known, k),
            ).alias("_rescued")
        )
        out.append("_rescued")
    return kafka_df.filter(F.col("value").isNotNull()).select(*cols).select(*out)


def to_debezium_json(feed: DataFrame) -> DataFrame:
    """Serialize a normalized feed back to the wire format (key/value
    pair for a Kafka sink) — the inverse of parse_debezium."""
    payload = F.to_json(
        F.struct(
            F.col("original_id").alias("id"),
            F.col("original_id").alias("user_id"),
            F.col("value").cast("string").alias("account"),
            F.col("registered_at").cast("string").alias("registered_at"),
            F.col("__deleted"),
        )
    )
    return feed.select(
        F.col("original_id").cast("string").alias("key"),
        payload.alias("value"),
    )
