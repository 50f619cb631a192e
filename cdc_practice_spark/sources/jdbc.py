"""JDBC source/sink builders — the engine's path to the reference's
actual endpoints (MySQL OLTP source for snapshot loads, Postgres DW sink,
docker-compose.yml:9-73,163-213).

No Postgres/MySQL exists in the test container, but the write and
partitioned-read paths ARE executed end-to-end against embedded Derby
(Spark bundles the driver) in tests/test_sources.py — same
DataFrameWriter/Reader JDBC code path, different dialect.  The parquet
sinks used by the harness are drop-in replacements (same DataFrame in,
same semantics).

Scale notes baked into the defaults:
  - reads partition on a numeric column (``partitionColumn`` +
    lower/upperBound + numPartitions) — a single-connection JDBC scan is
    the classic accidental bottleneck;
  - writes batch (``batchsize``) and bound parallelism (coalesce before
    write) so the warehouse isn't hit by one connection per shuffle
    partition;
  - isolation level pinned to READ_COMMITTED to match the per-event
    transaction the reference commits (simple_kafka_etl.py:182).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_read_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    opts = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetch_size),
    }
    if partition_column is not None:
        opts.update(
            {
                "partitionColumn": partition_column,
                "lowerBound": str(lower_bound),
                "upperBound": str(upper_bound),
                "numPartitions": str(num_partitions),
            }
        )
    return opts


def read_jdbc_table(
    spark: SparkSession, url: str, table: str, **kwargs
) -> DataFrame:
    reader = spark.read.format("jdbc")
    for k, v in jdbc_read_options(url, table, **kwargs).items():
        reader = reader.option(k, v)
    return reader.load()


def jdbc_write_options(
    url: str, table: str, batch_size: int = 10_000
) -> dict[str, str]:
    return {
        "url": url,
        "dbtable": table,
        "batchsize": str(batch_size),
        "isolationLevel": "READ_COMMITTED",
    }


def write_jdbc_append(
    df: DataFrame, url: str, table: str, max_connections: int = 8, **kwargs
) -> None:
    """Append with bounded write parallelism (history-sink pattern, S8)."""
    writer = df.coalesce(max_connections).write.format("jdbc").mode("append")
    for k, v in jdbc_write_options(url, table, **kwargs).items():
        writer = writer.option(k, v)
    writer.save()


# SQLStates meaning "table/view does not exist" across the dialects we
# target: Derby 42X05 ("Table/View does not exist"), SQL-standard/MySQL
# 42S02, Postgres 42P01 (undefined_table).
_TABLE_MISSING_SQLSTATES = {"42X05", "42S02", "42P01"}


def _is_table_missing(exc: Exception) -> bool:
    """True iff a py4j-raised java.sql.SQLException (anywhere in the
    cause chain) carries a table-does-not-exist SQLState."""
    java_exc = getattr(exc, "java_exception", None)
    while java_exc is not None:
        try:
            state = java_exc.getSQLState()
        except Exception:
            state = None
        if state in _TABLE_MISSING_SQLSTATES:
            return True
        try:
            java_exc = java_exc.getCause()
        except Exception:
            java_exc = None
    return False


def write_jdbc_epoch_idempotent(
    df: DataFrame,
    url: str,
    table: str,
    epoch_id: int,
    epoch_col: str = "_epoch",
    max_connections: int = 8,
    **kwargs,
) -> None:
    """Exactly-once-through-replay JDBC append: rows are tagged with the
    micro-batch epoch, and any rows of the SAME epoch already in the
    table are deleted first — so a ``foreachBatch`` retry or a
    checkpoint-resume replay of epoch k converges to exactly one copy of
    its rows, whether the previous attempt wrote none, some, or all of
    them.  This is the database-sink twin of the parquet sinks' write-
    to-v{epoch}-then-swap discipline (streaming/pipeline.py): the epoch
    tag IS the transaction id, delete-before-insert IS the rollback.

    The reference commits per event and dedups via a SELECT probe
    (simple_kafka_etl.py:81-88,182); here idempotency is per micro-batch
    and needs no probe on the hot path — the delete touches only rows of
    the replayed epoch (an index on ``epoch_col`` keeps it O(epoch) in a
    real warehouse)."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            # epoch_col is quoted: Spark's JDBC writer CREATEs the column
            # as a quoted identifier, and the default "_epoch" is not a
            # valid UNQUOTED identifier in Derby — the unquoted DELETE
            # was a syntax error every time, silently eaten by the old
            # blanket except (the r6-ADVICE bug this fix surfaced).
            st.executeUpdate(
                f'DELETE FROM {table} WHERE "{epoch_col}" = {int(epoch_id)}'
            )
        except Exception as exc:
            # ONLY "table does not exist" may be swallowed (the first
            # append below creates it).  Any other delete failure (lock
            # timeout, permission, connectivity, bad epoch_col) must
            # abort the batch: skipping the cleanup and appending anyway
            # would double-insert the replayed epoch and break the
            # exactly-once contract this function exists to provide.
            if not _is_table_missing(exc):
                raise
        finally:
            st.close()
    finally:
        conn.close()
    write_jdbc_append(
        df.withColumn(epoch_col, F.lit(int(epoch_id))),
        url,
        table,
        max_connections,
        **kwargs,
    )
