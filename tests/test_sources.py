"""Source/sink builder contracts (no DB/broker in container — option
correctness + the parse paths that are engine-agnostic)."""

from __future__ import annotations

from cdc_practice_spark.sources.jdbc import jdbc_read_options, jdbc_write_options


def test_jdbc_read_partitioned():
    opts = jdbc_read_options(
        "jdbc:postgresql://dw:5432/dw",
        "bank_accounts_history",
        partition_column="original_id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    assert opts["partitionColumn"] == "original_id"
    assert opts["numPartitions"] == "16"
    assert int(opts["fetchsize"]) >= 1000


def test_jdbc_read_unpartitioned_has_no_bounds():
    opts = jdbc_read_options("jdbc:mysql://oltp:3306/bankdb", "bank_accounts")
    assert "partitionColumn" not in opts


def test_jdbc_write_isolation_matches_reference():
    opts = jdbc_write_options("jdbc:postgresql://dw:5432/dw", "bank_accounts_current")
    # per-event commit in the reference (simple_kafka_etl.py:182) →
    # READ_COMMITTED batches here
    assert opts["isolationLevel"] == "READ_COMMITTED"
    assert int(opts["batchsize"]) >= 1000
