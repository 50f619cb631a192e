"""Partitioned warehouse layout: correctness + actual partition pruning
(PartitionFilters reaching the scan)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_practice_spark.cdc import build_current, change_feed_from_events
from cdc_practice_spark.plans.explain import plan_string
from cdc_practice_spark.queries.streaming_queries import TMP_ROOT
from cdc_practice_spark.session import load_table
from cdc_practice_spark.sources.partitioned import (
    read_snapshot_for_key,
    write_snapshot_partitioned,
)


@pytest.fixture(scope="module")
def snapshot_path(spark, sf_dir):
    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="partsnap_", dir=TMP_ROOT)
    path = os.path.join(work, "snapshot")
    cur = build_current(change_feed_from_events(load_table(spark, sf_dir, "events")))
    write_snapshot_partitioned(cur, path, n_buckets=8)
    return path


def test_partition_dirs_exist(snapshot_path):
    dirs = [d for d in os.listdir(snapshot_path) if d.startswith("key_bucket=")]
    assert len(dirs) >= 6  # 8 buckets, allow a couple empty at tiny sf


def test_point_lookup_prunes_partitions(spark, sf_dir, snapshot_path):
    cur = build_current(change_feed_from_events(load_table(spark, sf_dir, "events")))
    some_key = cur.select("original_id").head().original_id
    df = read_snapshot_for_key(spark, snapshot_path, some_key, n_buckets=8)
    plan = plan_string(df)
    # the bucket literal must reach the scan as a PartitionFilter
    assert "PartitionFilters: [isnotnull(key_bucket" in plan or (
        "PartitionFilters: [" in plan and "key_bucket" in plan.split("PartitionFilters:")[1][:120]
    )
    rows = df.collect()
    expect = cur.filter(F.col("original_id") == some_key).collect()
    assert len(rows) == len(expect) == 1
    assert rows[0].value == expect[0].value


def test_all_keys_found_in_partitioned_layout(spark, sf_dir, snapshot_path):
    cur = build_current(change_feed_from_events(load_table(spark, sf_dir, "events")))
    assert spark.read.parquet(snapshot_path).count() == cur.count()
