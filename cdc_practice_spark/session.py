"""SparkSession construction + test-fixture table loaders.

The engine is designed for a large multi-executor cluster; locally we run
``local[$SPARK_GRAFT_CPUS]``.  All scale-sensitive knobs live here so a
cluster deployment only overrides this module:

- AQE on (runtime join-strategy selection, skew-join splitting, partition
  coalescing) — replaces the reference's "1 task, 1 consumer" serialization
  (mysql-connector-config-clean.json:5, simple_kafka_etl.py:34) with
  per-key parallelism.
- ``spark.sql.shuffle.partitions`` sized for the local harness; on a real
  cluster AQE coalesces from a high initial number.
- Arrow enabled for the few Pandas-UDF code paths (vector math fallbacks).
- Session timezone pinned to UTC so event-time columns round-trip
  deterministically against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "cdc-practice-spark") -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a real cluster, master/memory come from spark-submit; everything
    set here is cluster-safe.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        # local-bench fixtures are single small parquet files; split them
        # finer so the 32 cores all scan (A/B measured ~18% on the fact
        # scans).  On a real cluster with many files, the 128 MB default
        # is right — this is the knob a deployment overrides.
        .config("spark.sql.files.maxPartitionBytes", "4m")
        # Same local-fixture reasoning for post-shuffle sizing: AQE's 64 MB
        # advisory coalesces a ~30 MB shuffle to 1-2 partitions, serializing
        # every window/sort stage.  1 MB keeps all cores busy at bench SF
        # (A/B: 9.3 s → 8.6 s across the headline suite); a real deployment
        # with real data volumes overrides back to the 64 MB default.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table.  Parquet scans get predicate pushdown +
    column pruning from Catalyst for free; callers should select only the
    columns they need so ``ReadSchema`` stays narrow.

    Two session confs are pinned here because the driver may hand us a
    session we didn't build:
      - ``nanosAsLong``: the ``events`` fixture stores TIMESTAMP(NANOS)
        which Spark's parquet reader rejects natively; we read the raw
        int64 nanos and convert to a microsecond TIMESTAMP_NTZ ourselves
        (truncation matches DuckDB's ns→µs epoch_us()).
      - session timezone UTC: makes the LTZ→NTZ cast of that conversion
        deterministic (epoch == naive wall clock).
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
