"""Driver-contract smoke tests: every registered query runs at sf0.001
and returns a well-formed DataFrame; every oracle key has a query."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_every_oracle_has_query():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 16


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_runs(spark, sf_dir, name):
    df = entry_mod.queries()[name](spark, sf_dir)
    assert df.columns  # non-empty schema
    df.limit(5).collect()  # executes without error


def test_timezone_independence(spark, sf_dir):
    """The driver may hand us a session with any timezone config; all
    event-time outputs are epoch-µs BIGINTs and load_table pins UTC, so
    results must be identical under a hostile session timezone."""
    fn = entry_mod.queries()["cdc_current_snapshot"]
    baseline = sorted(map(tuple, fn(spark, sf_dir).collect()))
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        shifted = sorted(map(tuple, fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert shifted == baseline
