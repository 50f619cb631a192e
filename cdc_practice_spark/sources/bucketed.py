"""Bucketed-table layout for co-located joins — the storage-side answer
to repeated fact⋈fact shuffles.

At 100 TB, orders⋈lineitem on orderkey shuffles both tables every query.
Bucketing writes each table hash-partitioned AND sorted by the join key
once at ingest; every later join on that key is then exchange-free
(SortMergeJoin reads co-located buckets directly).  The write costs one
shuffle — amortized over every downstream join.

Uses the session catalog (`saveAsTable` + `bucketBy`); bucket metadata
lives in the metastore, which is why plain `.save(path)` can't do it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist df as a bucketed (and optionally sort-within-bucket)
    managed table keyed for co-located joins."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession) -> None:
    """Confs that let the planner exploit bucket layout."""
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
