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
