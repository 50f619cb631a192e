"""Full-envelope Debezium parsing + compaction maintenance."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_practice_spark.queries.streaming_queries import TMP_ROOT
from cdc_practice_spark.sources.debezium import parse_debezium_envelope
from cdc_practice_spark.sources.maintenance import (
    compact_parquet,
    parquet_file_count,
)


def _kafka_df(spark, payloads):
    rows = [
        ("dbserver1.bankdb.bank_accounts", 0, i, json.dumps(p).encode() if p is not None else None)
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(
        rows, "topic string, partition int, offset long, value binary"
    )


def test_envelope_ops(spark):
    payloads = [
        {"before": None, "after": {"id": 1, "user_id": 10, "account": "A"},
         "op": "c", "ts_ms": 1000, "source": {"db": "bankdb", "table": "bank_accounts"}},
        {"before": {"id": 1, "user_id": 10, "account": "A"},
         "after": {"id": 1, "user_id": 10, "account": "B"},
         "op": "u", "ts_ms": 2000, "source": {"db": "bankdb", "table": "bank_accounts"}},
        {"before": {"id": 1, "user_id": 10, "account": "B"}, "after": None,
         "op": "d", "ts_ms": 3000, "source": {"db": "bankdb", "table": "bank_accounts"}},
        None,  # tombstone after the delete (mysql-connector-config:23)
        {"before": None, "after": {"id": 2, "user_id": 20, "account": "C"},
         "op": "r", "ts_ms": 500, "source": {"db": "bankdb", "table": "bank_accounts"}},
    ]
    out = {r.kafka_offset: r for r in parse_debezium_envelope(_kafka_df(spark, payloads)).collect()}
    assert set(out) == {0, 1, 2, 4}  # tombstone skipped
    assert out[0]["__deleted"] == "false" and out[0].account == "A"
    assert out[1]["__deleted"] == "false" and out[1].account == "B"
    # delete surfaces the BEFORE image, like the SMT rewrite
    assert out[2]["__deleted"] == "true" and out[2].account == "B"
    assert out[4].op == "r" and out[4].user_id == 20


def test_envelope_malformed_value_isolated(spark):
    df = _kafka_df(spark, [{"op": "c", "after": {"id": 1}, "before": None,
                            "ts_ms": 1, "source": {}}])
    broken = spark.createDataFrame(
        [("t", 0, 99, b"this is not json")],
        "topic string, partition int, offset long, value binary",
    )
    out = parse_debezium_envelope(df.unionByName(broken)).collect()
    assert len(out) == 2  # broken row survives with null fields
    bad = [r for r in out if r.kafka_offset == 99][0]
    assert bad.id is None and bad["__deleted"] == "false"


def test_compaction_preserves_rows(spark, sf_dir):
    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="compact_", dir=TMP_ROOT)
    path = os.path.join(work, "hist")
    from cdc_practice_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")  # handles the NANOS-ts fixture
    # simulate a many-micro-batch append sink: 10 tiny appends
    for i in range(10):
        ev.filter(F.col("event_id") % 10 == i).write.mode("append").parquet(path)
    n_files_before = parquet_file_count(path)
    total = spark.read.parquet(path).count()

    n = compact_parquet(spark, path, target_files=2, sort_by=["user_id"])
    assert n == total
    assert parquet_file_count(path) <= max(2, n_files_before // 5)
    assert spark.read.parquet(path).count() == total
