"""Partitioned-layout sink for the warehouse tables.

At 100 TB the snapshot/history tables are laid out hive-partitioned so
key- and time-scoped queries touch only their partitions (directory-level
pruning — zero I/O for everything else).  The helpers pick the layout the
CDC tables want:

  - snapshot: bucket-of-key partitions (``key_bucket = pmod(hash(key), n)``)
    — point lookups prune to one directory; buckets stay balanced under
    skewed key domains (raw key-value partitioning would create hot/tiny
    directories).
  - history: event-date partitions — time-range scans prune; append-only
    writes land in the newest partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_snapshot_partitioned(
    snapshot: DataFrame, path: str, key: str = "original_id", n_buckets: int = 16
) -> None:
    out = snapshot.withColumn(
        "key_bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets))
    )
    out.write.mode("overwrite").partitionBy("key_bucket").parquet(path)


def read_snapshot_for_key(
    spark: SparkSession, path: str, key_value: int, key: str = "original_id",
    n_buckets: int = 16,
) -> DataFrame:
    """Point lookup that prunes to one partition directory: the bucket
    expression is evaluated driver-side to a literal, so the catalog
    lists only ``key_bucket=<b>`` (check PartitionFilters in .explain)."""
    bucket = (
        spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit(key_value).cast("long")), F.lit(n_buckets)))
        .head()[0]
    )
    return (
        spark.read.parquet(path)
        .filter(F.col("key_bucket") == int(bucket))
        .filter(F.col(key) == key_value)
    )


def write_history_partitioned(
    history: DataFrame, path: str, ts_col: str = "change_timestamp"
) -> None:
    out = history.withColumn(
        "change_date", F.date_format(F.col(ts_col), "yyyy-MM-dd")
    )
    out.write.mode("overwrite").partitionBy("change_date").parquet(path)
