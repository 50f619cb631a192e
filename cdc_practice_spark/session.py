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
        # Spark 4.1's ChecksumCheckpointFileManager (default on) routes
        # EVERY checkpoint-file create through a shared checksum thread
        # pool and the creating task AWAITS it — thread dumps during the
        # streaming replays show all 32 task threads parked in
        # ChecksumCheckpointFileManager.awaitResult under the stateful
        # dedup's delta-file open (~1-2 s blocked per task, ~3% CPU).
        # The engine's exactly-once story rests on atomic rename + its
        # own manifest/pointer swap protocol, not on checksum sidecars,
        # so integrity checking is off by default here; override with
        # SPARK_GRAFT_CKPT_CHECKSUM=true where bit-rot detection on
        # checkpoint files matters more than stateful-task latency.
        .config(
            "spark.sql.streaming.checkpoint.fileChecksum.enabled",
            os.environ.get("SPARK_GRAFT_CKPT_CHECKSUM", "false"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def pin_session_confs(spark: SparkSession) -> None:
    """Re-pin the two execution-time session confs the engine depends on
    (~1 ms RPC each).  Called on every table/view resolution — they matter
    at EXECUTION time, so a caller flipping the session timezone between
    queries must not leak into the NTZ casts, even when the plan itself
    comes from a memo."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # see get_spark: checkpoint-file checksum sidecars cost 1-2 s of
    # blocked time PER STATEFUL TASK on this Spark version; the engine's
    # exactly-once protocol doesn't use them.  Pinned here too so a
    # driver-provided session runs the streaming queries the same way.
    spark.conf.set(
        "spark.sql.streaming.checkpoint.fileChecksum.enabled",
        os.environ.get("SPARK_GRAFT_CKPT_CHECKSUM", "false"),
    )


def _events_ts_as_ntz(df: DataFrame) -> "Column":  # noqa: F821
    """Canonical TIMESTAMP_NTZ(µs) ``ts`` for the events table, whatever
    physical type the fixture generation used: TIMESTAMP(NANOS) arrives
    as raw int64 under ``nanosAsLong`` (truncate ns→µs, matching
    DuckDB's epoch_us()); µs TIMESTAMP/TIMESTAMP_NTZ just needs the NTZ
    cast (deterministic — session timezone is pinned UTC)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        return F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
    return F.col("ts").cast("timestamp_ntz")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table.  Parquet scans get predicate pushdown +
    column pruning from Catalyst for free; callers should select only the
    columns they need so ``ReadSchema`` stays narrow.

    The scan DataFrame is memoized per (session, sf_dir, name) — this is a
    CATALOG, not a data cache: a DataFrame is an immutable logical plan, so
    re-resolving the same path every query only re-reads parquet footers and
    re-pays driver RPCs (measured ~0.1-0.3 s per multi-table query locally).
    A warehouse session registers its tables once; so do we.  No row data is
    cached — execution still scans parquet, with pushdown/pruning per query.
    The fixture files are immutable for a session's lifetime (driver
    contract); the cache dies with the Python session object.

    Two session confs are re-pinned on EVERY call (two ~1 ms RPCs — they
    matter at execution time, so a caller flipping the session timezone
    between queries must not leak into the NTZ casts) because the driver
    may hand us a session we didn't build:
      - ``nanosAsLong``: the ``events`` fixture stores TIMESTAMP(NANOS)
        which Spark's parquet reader rejects natively; we read the raw
        int64 nanos and convert to a microsecond TIMESTAMP_NTZ ourselves
        (truncation matches DuckDB's ns→µs epoch_us()).
      - session timezone UTC: makes the LTZ→NTZ cast of that conversion
        deterministic (epoch == naive wall clock).
    """
    from pyspark.sql import functions as F

    pin_session_confs(spark)
    cache = getattr(spark, "_cps_scan_cache", None)
    if cache is None:
        cache = {}
        spark._cps_scan_cache = cache
    key = (sf_dir, name)
    df = cache.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            df = df.withColumn("ts", _events_ts_as_ntz(df))
        cache[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def memo_view(spark: SparkSession, key: tuple, builder) -> DataFrame:
    """Session-scoped memo for deterministic derived-view PLANS (same
    contract as the ``load_table`` catalog: DataFrames are immutable
    logical plans, so rebuilding the same view per query only re-pays
    driver-side construction).  No data is cached — execution always
    runs the full plan.  Use only for views that are pure functions of
    (sf_dir, constants); anything parameterized by per-call arguments
    must key on them."""
    pin_session_confs(spark)
    cache = getattr(spark, "_cps_view_cache", None)
    if cache is None:
        cache = {}
        spark._cps_view_cache = cache
    df = cache.get(key)
    if df is None:
        df = builder()
        cache[key] = df
    return df
