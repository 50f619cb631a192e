"""Query registry — single source of truth for the driver contract.

``register(name, oracle=...)`` decorates a ``(spark, sf_dir) -> DataFrame``
callable and records its DuckDB oracle SQL (or None for ops that aren't
SQL-expressible — the driver then records a weaker rows-only check).

Conventions that keep the hash-compare honest (see __spark_entry__.py
docstring in the repo root):
  - every computed column is aliased IDENTICALLY in Spark and SQL;
  - event-time timestamps are emitted as epoch-microsecond BIGINTs
    (``unix_micros`` / ``epoch_us``) — type- and timezone-proof;
  - double aggregates over many rows go through exact DECIMAL(18,2)
    sums, then ROUND + CAST to DOUBLE, so value hashes don't wobble with
    summation order;
  - DuckDB's HUGEINT sums are cast back to BIGINT.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so their registrations run."""
    import cdc_practice_spark.queries.analytics  # noqa: F401
    import cdc_practice_spark.queries.aggregates_queries  # noqa: F401
    import cdc_practice_spark.queries.analytics_ext  # noqa: F401
    import cdc_practice_spark.queries.cdc_queries  # noqa: F401
    import cdc_practice_spark.queries.dedup_queries  # noqa: F401
    import cdc_practice_spark.queries.events_queries  # noqa: F401
    import cdc_practice_spark.queries.graph_queries  # noqa: F401
    import cdc_practice_spark.queries.layout_queries  # noqa: F401
    import cdc_practice_spark.queries.multimodal_queries  # noqa: F401
    import cdc_practice_spark.queries.pipeline_queries  # noqa: F401
    import cdc_practice_spark.queries.similarity_queries  # noqa: F401
    import cdc_practice_spark.queries.sql_surface  # noqa: F401
    import cdc_practice_spark.queries.text_queries  # noqa: F401
    import cdc_practice_spark.queries.timeseries_queries  # noqa: F401
    import cdc_practice_spark.queries.relational_more  # noqa: F401
    import cdc_practice_spark.queries.tpch_more  # noqa: F401
    import cdc_practice_spark.queries.tpch_full  # noqa: F401
    import cdc_practice_spark.queries.udf_queries  # noqa: F401
    import cdc_practice_spark.queries.streaming_queries  # noqa: F401
