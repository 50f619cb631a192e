"""Kafka wire-format contract: the exact reference SMT output shape.

The reference's connector flattens events with ExtractNewRecordState +
delete-rewrite (mysql-connector-config-clean.json:21-29) and its test
harness drives INSERT → UPDATE → DELETE (+ tombstone) through the topic
(test-etl-pipeline.sh:165-184).  No broker exists in this container, so
these tests replay RECORDED envelopes of that exact shape through the
same parse path the streaming reader uses — parse_debezium is the
value-side transform of read_kafka_stream, identical for a static frame
and a stream (Structured Streaming's unified Dataset contract).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from cdc_practice_spark.sources.kafka import (
    DEFAULT_TOPIC,
    kafka_source_options,
    parse_debezium,
    read_kafka_stream,
    to_debezium_json,
)

PARSED_COLUMNS = [
    "kafka_topic",
    "kafka_partition",
    "kafka_offset",
    "id",
    "user_id",
    "account",
    "registered_at",
    "__deleted",
]


def kafka_frame(spark, records):
    """(offset, value-bytes-or-None) → the kafka source's fixed schema
    (spark-sql-kafka's read schema: topic/partition/offset/key/value/…)."""
    rows = [
        (DEFAULT_TOPIC, 0, off, None, val)
        for off, val in records
    ]
    return spark.createDataFrame(
        rows,
        "topic string, partition int, offset long, key binary, value binary",
    )


def smt(id_, user_id, account, registered_at, deleted):
    """One post-SMT wire message (simple_kafka_etl.py:76,114 shape)."""
    return json.dumps(
        {
            "id": id_,
            "user_id": user_id,
            "account": account,
            "registered_at": registered_at,
            "__deleted": deleted,
        }
    ).encode()


def test_reference_workload_insert_update_delete_tombstone(spark):
    """Mirror of test-etl-pipeline.sh:165-184: INSERT user 1004,
    UPDATE user 1001, DELETE user 1003 (rewrite + tombstone)."""
    records = [
        (100, smt(4, 1004, "Hana Bank 111-222-333444", "2024-01-01 10:00:00", "false")),
        (101, smt(1, 1001, "KB Bank 999-888-777666", "2023-12-01 09:00:00", "false")),
        (102, smt(3, 1003, "Shinhan Bank 555-666-777888", "2023-12-02 09:00:00", "true")),
        (103, None),  # drop.tombstones=false → tombstone follows the delete
    ]
    out = parse_debezium(kafka_frame(spark, records))
    assert out.columns == PARSED_COLUMNS
    rows = {r.kafka_offset: r for r in out.collect()}

    assert set(rows) == {100, 101, 102}  # tombstone skipped (P1)
    assert rows[100]["__deleted"] == "false" and rows[100].user_id == 1004
    assert rows[101].account == "KB Bank 999-888-777666"
    # delete-rewrite keeps the row with __deleted='true' as a STRING
    assert rows[102]["__deleted"] == "true" and rows[102].id == 3
    assert all(r.kafka_topic == DEFAULT_TOPIC for r in rows.values())


def test_adversarial_payloads_isolated_not_fatal(spark):
    """Per-message error isolation (P11): garbage JSON, wrong field
    types, missing fields, extra fields — each degrades to nulls in THAT
    row; the scan never fails and healthy rows are untouched."""
    records = [
        (0, b"not json at all \xff"),
        (1, json.dumps({"id": "NOT_A_NUMBER", "user_id": 7, "account": "A",
                        "registered_at": "x", "__deleted": "false"}).encode()),
        (2, json.dumps({"unexpected": True}).encode()),
        (3, json.dumps({"id": 9, "user_id": 9, "account": "ok",
                        "registered_at": "2024-01-01", "__deleted": "false",
                        "EXTRA_FIELD": [1, 2, 3]}).encode()),
        (4, b""),  # empty (non-null) value: parses to all-null struct
    ]
    out = {r.kafka_offset: r for r in parse_debezium(kafka_frame(spark, records)).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    assert out[0].id is None and out[0].account is None
    # PERMISSIVE from_json nulls the whole record on a type mismatch
    assert out[1].id is None
    assert out[2].id is None and out[2]["__deleted"] is None
    assert out[3].id == 9 and out[3].account == "ok"  # extras ignored
    assert out[4].id is None


def test_schema_drift_rescued_not_dropped(spark):
    """An upstream ALTER TABLE adds a column; the fixed-schema parse must
    NOT silently drop it.  rescue=True lands unknown top-level fields in
    _rescued (values intact, stringified); known fields are never
    rescued; the observe_drift metric counts exactly the drifted rows."""
    from cdc_practice_spark.streaming.metrics import observe_drift

    records = [
        # pre-ALTER event — no drift
        (0, smt(1, 1001, "KB Bank 1", "2024-01-01 00:00:00", "false")),
        # post-ALTER: new columns credit_score (int) and branch (string)
        (1, json.dumps({"id": 2, "user_id": 1002, "account": "KB Bank 2",
                        "registered_at": "2024-01-02 00:00:00",
                        "__deleted": "false",
                        "credit_score": 715, "branch": "Gangnam"}).encode()),
        (2, json.dumps({"id": 3, "user_id": 1003, "account": "KB Bank 3",
                        "registered_at": "2024-01-03 00:00:00",
                        "__deleted": "true", "credit_score": 640}).encode()),
    ]
    parsed = parse_debezium(kafka_frame(spark, records), rescue=True)
    assert parsed.columns == PARSED_COLUMNS + ["_rescued"]
    from pyspark.sql import Observation

    obs = Observation("drift_test")
    observed = observe_drift(parsed, obs)
    rows = {r.kafka_offset: r for r in observed.collect()}
    assert obs.get["processed_count"] == 3 and obs.get["drifted_count"] == 2
    # known columns still parse exactly as without rescue
    assert rows[1].id == 2 and rows[2]["__deleted"] == "true"
    # no drift → empty map, not null
    assert rows[0]["_rescued"] == {}
    # ALTER-added columns are rescued with their values, known keys absent
    assert rows[1]["_rescued"] == {"credit_score": "715", "branch": "Gangnam"}
    assert rows[2]["_rescued"] == {"credit_score": "640"}
    # rescue off (default) keeps the legacy shape
    assert parse_debezium(kafka_frame(spark, records)).columns == PARSED_COLUMNS


def test_roundtrip_feed_to_wire_and_back(spark, sf_dir):
    """to_debezium_json → parse_debezium is lossless for the fields the
    wire format carries (id/user_id/account/registered_at/__deleted) —
    proves the sink writes exactly what the source parses."""
    from cdc_practice_spark.cdc.feed import change_feed_from_events
    from cdc_practice_spark.session import load_table

    feed = change_feed_from_events(load_table(spark, sf_dir, "events")).limit(50)
    wire = to_debezium_json(feed)
    assert wire.columns == ["key", "value"]  # Kafka sink contract

    # re-frame as kafka records and parse back
    reparsed = parse_debezium(
        wire.select(
            F.lit(DEFAULT_TOPIC).alias("topic"),
            F.lit(0).alias("partition"),
            F.monotonically_increasing_id().alias("offset"),
            F.encode(F.col("value"), "UTF-8").alias("value"),
        )
    )
    orig = {
        (r.original_id, f"{r.value}", r["__deleted"])
        for r in feed.select("original_id", "value", "__deleted").collect()
    }
    back = {
        (r.id, r.account, r["__deleted"])
        for r in reparsed.select("id", "account", "__deleted").collect()
    }
    assert back == orig


def test_source_options_match_reference_consumer():
    """Option set mirrors simple_kafka_etl.py:48-57: one topic, replay
    from earliest; offset tracking moves to Spark's checkpoint."""
    opts = kafka_source_options("kafka:9092")
    assert opts["subscribe"] == "dbserver1.bankdb.bank_accounts"
    assert opts["startingOffsets"] == "earliest"
    assert opts["kafka.bootstrap.servers"] == "kafka:9092"


def test_read_kafka_stream_plumbing(spark):
    """Drive read_kafka_stream as far as the sandbox allows.  With the
    kafka connector jar on the classpath it must yield the parsed feed
    schema; without it, the failure must be the MISSING DATA SOURCE —
    never an error in our option/parse plumbing."""
    try:
        df = read_kafka_stream(spark, "localhost:9092")
    except Exception as ex:  # no spark-sql-kafka jar in this container
        msg = str(ex)
        assert "kafka" in msg.lower() and (
            "Failed to find" in msg or "DATA_SOURCE_NOT_FOUND" in msg
        ), f"unexpected failure mode: {msg}"
        pytest.skip("kafka connector jar not on classpath (no broker env)")
    assert df.isStreaming
    assert df.columns == PARSED_COLUMNS
