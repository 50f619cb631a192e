"""Storage-layout queries: Z-order clustering + stats-based file
skipping under the oracle gate.

The oracle checks CONTENT (the pruned read must return exactly the rows
a plain filter returns) and the skipping DECISION (files_skipped = the
pruned read touched strictly fewer files than the layout holds — if the
index or the bounding-box intersection logic regresses, the boolean
flips and the hash fails).  tests/test_layout.py additionally asserts
the layout-quality property a hash can't see: Z-order prunes on BOTH
dimensions, a linear sort only on its leading column.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_practice_spark.operators.layout import (
    build_file_blooms,
    compact_files,
    optimize_zorder,
    read_with_bloom,
    read_with_skipping,
)
from cdc_practice_spark.queries.registry import register
from cdc_practice_spark.session import load_table

TMP_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".tmp",
)


@register(
    "zorder_data_skipping",
    oracle="""
WITH b AS (
  SELECT CAST(max(l_partkey) * 2 // 10 AS BIGINT) AS plo,
         CAST(max(l_partkey) * 4 // 10 AS BIGINT) AS phi,
         CAST(max(l_suppkey) * 2 // 10 AS BIGINT) AS slo,
         CAST(max(l_suppkey) * 4 // 10 AS BIGINT) AS shi
  FROM lineitem
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(l_orderkey) AS BIGINT) AS sum_okey,
       TRUE AS files_skipped
FROM lineitem, b
WHERE l_partkey BETWEEN b.plo AND b.phi
  AND l_suppkey BETWEEN b.slo AND b.shi
""",
)
def zorder_data_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE-by-Z-order + data-skipping read, end to end: rewrite
    lineitem clustered by Z(l_partkey, l_suppkey) with a per-file
    min/max sidecar (operators/layout.py), then answer a two-dimensional
    range query by reading only the files whose bounding box intersects
    the box — content must equal the plain filter (oracle) and at least
    one file must actually be skipped (decision boolean)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    mp, ms = li.agg(F.max("l_partkey"), F.max("l_suppkey")).head()
    plo, phi = mp * 2 // 10, mp * 4 // 10
    slo, shi = ms * 2 // 10, ms * 4 // 10
    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="zorder_", dir=TMP_ROOT)
    path = os.path.join(work, "lineitem_z")
    optimize_zorder(li, path, "l_partkey", "l_suppkey", n_files=16)
    pruned, n_total, n_read = read_with_skipping(
        spark, path, {"l_partkey": (plo, phi), "l_suppkey": (slo, shi)}
    )
    return pruned.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("l_orderkey").cast("long").alias("sum_okey"),
    ).select(
        "n_rows", "sum_okey", F.lit(n_read < n_total).alias("files_skipped")
    )


@register(
    "bloom_point_lookup",
    oracle="""
SELECT l_orderkey, l_partkey, l_suppkey, TRUE AS files_skipped
FROM lineitem
WHERE l_orderkey = (SELECT max(l_orderkey) FROM lineitem)
ORDER BY l_partkey, l_suppkey
""",
)
def bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file Bloom-filter skipping for point lookups (operators/
    layout.py::build_file_blooms): the table is clustered by
    Z(l_partkey, l_suppkey), so one l_orderkey's rows scatter across
    files and min/max stats can't prune — the membership sidecar can.
    Content must equal the plain equality filter (Bloom filters never
    false-negative), and the decision boolean asserts files were
    actually skipped."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    probe = int(li.agg(F.max("l_orderkey")).head()[0])
    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="bloom_", dir=TMP_ROOT)
    path = os.path.join(work, "lineitem_z")
    optimize_zorder(li, path, "l_partkey", "l_suppkey", n_files=16)
    build_file_blooms(spark, path, "l_orderkey")
    hits, n_total, n_read = read_with_bloom(spark, path, probe)
    return hits.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        F.lit(n_read < n_total).alias("files_skipped"),
    ).orderBy("l_partkey", "l_suppkey")


@register(
    "compact_small_files",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(o_orderkey) AS BIGINT) AS sum_okey,
       TRUE AS compacted
FROM orders
""",
)
def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-ingest residue → OPTIMIZE compaction, end to end:
    scatter orders into 64 per-micro-batch-sized files, compact them
    shuffle-free with coalesce (operators/layout.py::compact_files),
    and prove content survived byte-for-byte (count + key-sum vs the
    oracle) plus the decision that the file count actually dropped."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="compact_", dir=TMP_ROOT)
    src = os.path.join(work, "small")
    dst = os.path.join(work, "compacted")
    orders.repartition(64).write.parquet(src)
    n_rows = orders.count()
    n_before, n_after = compact_files(spark, src, dst, target_rows_per_file=max(n_rows // 4, 1))
    return (
        spark.read.parquet(dst)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("sum_okey"),
        )
        .select("n_rows", "sum_okey", F.lit(n_after < n_before).alias("compacted"))
    )
