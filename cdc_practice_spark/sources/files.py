"""File-format sources beyond parquet: JSON-lines, CSV, ORC.

The reference's transport format is schema-less JSON over Kafka
(mysql-connector-config-clean.json:26-29); these readers are the batch
file-based equivalents, and deliberately use the SAME parse shape as the
Kafka path (sources/kafka.py): a raw-bytes/text scan + ``from_json`` /
``from_csv`` projection.  Two rules, both scale-driven:

  1. ALWAYS pass an explicit schema.  Schema inference reads the data
     twice (a full extra pass at 100 TB) and can silently widen types
     between runs; a fixed StructType keeps the scan single-pass and the
     plan stable.
  2. Malformed rows never abort the job: a line that fails to parse
     keeps its raw text in ``_corrupt_record`` and NULLs elsewhere, so
     one bad line in a terabyte of logs is a filterable row, not a
     failed stage (the engine-shaped version of the reference's
     per-message error isolation, simple_kafka_etl.py:185-188).

Parsing text ourselves (instead of ``spark.read.json/csv`` with
PERMISSIVE mode) also sidesteps Spark's
QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction — the corrupt side-channel
here is an ordinary derived column, queryable on its own.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


CORRUPT_COL = "_corrupt_record"


def _expand(parsed: Column, raw: Column, schema: StructType) -> list[Column]:
    """Star-expand the parsed struct; keep raw text only for rows where
    parsing produced nothing (every field NULL)."""
    all_null = None
    for f in schema.fieldNames():
        isnull = parsed.getField(f).isNull()
        all_null = isnull if all_null is None else (all_null & isnull)
    cols = [parsed.getField(f).alias(f) for f in schema.fieldNames()]
    cols.append(F.when(all_null, raw).alias(CORRUPT_COL))
    return cols


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Newline-delimited JSON with explicit schema: text scan +
    ``from_json`` (the identical unwrap the Kafka/Debezium path runs —
    SURVEY.md §2.1 S5).  Malformed lines keep their raw text in
    ``_corrupt_record``."""
    raw = spark.read.text(path)
    parsed = F.from_json(F.col("value"), schema)
    return raw.select(*_expand(parsed, F.col("value"), schema))


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = False
) -> DataFrame:
    """CSV with explicit schema via text scan + ``from_csv``.  With
    ``header=True`` the rendered header line is filtered out wherever it
    appears (one per input file)."""
    raw = spark.read.text(path)
    if header:
        header_line = ",".join(schema.fieldNames())
        raw = raw.filter(F.col("value") != header_line)
    parsed = F.from_csv(F.col("value"), schema.simpleString())
    return raw.select(*_expand(parsed, F.col("value"), schema))


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar like parquet: predicate pushdown and column
    pruning apply the same way (PushedFilters in the plan)."""
    return spark.read.orc(path)


def good_rows(df: DataFrame) -> DataFrame:
    """Rows that parsed cleanly, corrupt side-channel dropped."""
    if CORRUPT_COL not in df.columns:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def corrupt_rows(df: DataFrame) -> DataFrame:
    """The error side-output (for quarantine sinks / dead-letter audit)."""
    return df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
