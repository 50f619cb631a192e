"""Data-layout management: Z-order clustering + file-level stats
skipping — the storage half of the 100 TB story.

Spark prunes partitions and parquet row groups, but it keeps no
PER-FILE column stats for plain parquet directories — that index is
what lets a lakehouse table format (the public Delta/Iceberg designs)
skip whole files for predicates on non-partition columns.  This module
implements that layout contract on plain parquet:

  - ``optimize_zorder`` rewrites a table clustered by the Z-order
    (Morton) interleaving of two columns: each column is rank-scaled to
    ``bits`` bits, the bits are interleaved with a codegen'd
    shift/or expression (no UDF), and ``repartitionByRange(zval) +
    sortWithinPartitions(zval)`` gives every output file a tight
    bounding box in BOTH dimensions — the property that makes
    multi-column range predicates skip files, which a linear sort only
    provides for its leading column.
  - a post-write stats pass (one scan of the written files, grouped by
    ``input_file_name``) records per-file min/max of the clustered
    columns into a ``_file_stats.json`` sidecar — the OPTIMIZE +
    stats-collection step, expressed as a normal aggregation.
  - ``read_with_skipping`` consults the sidecar, reads ONLY the files
    whose bounding box intersects the predicate, and applies the
    residual filter — at 1000 executors the pruning decision is a
    driver-side pass over an n_files-sized index, not a cluster scan.

Scale shape: the rewrite is one range shuffle (the same cost any
clustering rewrite pays, amortized over every later query); the stats
pass reduces to n_files rows map-side; the skipping read touches only
surviving files, so query cost tracks selectivity instead of table
size.
"""

from __future__ import annotations

import json
import os
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

STATS_NAME = "_file_stats.json"


def interleave_bits(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave two non-negative integer columns (a gets the
    odd bit positions): one codegen'd shift/or chain, no UDF."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i))
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def zorder_value(ca: Column, amin, amax, cb: Column, bmin, bmax, bits: int = 16) -> Column:
    """Scale both columns to [0, 2^bits) and Morton-interleave.  The
    scaling only shapes the LAYOUT (results never depend on it), so
    integer truncation here is harmless."""
    span = (1 << bits) - 1

    def scale(c: Column, lo, hi) -> Column:
        if hi <= lo:
            return F.lit(0).cast("long")
        return ((c.cast("double") - float(lo)) * span / (float(hi) - float(lo))).cast(
            "long"
        )

    return interleave_bits(scale(ca, amin, amax), scale(cb, bmin, bmax), bits)


def optimize_zorder(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 16,
) -> list[dict]:
    """Rewrite ``df`` under ``path`` clustered by Z(col_a, col_b) and
    record per-file min/max stats.  Returns the stats list."""
    spark = df.sparkSession
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).head()
    z = zorder_value(F.col(col_a), lo_a, hi_a, F.col(col_b), lo_b, hi_b, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    stats_rows = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(col_a).alias("min_a"),
            F.max(col_a).alias("max_a"),
            F.min(col_b).alias("min_b"),
            F.max(col_b).alias("max_b"),
        )
        .collect()
    )
    stats = sorted(
        (
            {
                "file": r.file,
                col_a: [r.min_a, r.max_a],
                col_b: [r.min_b, r.max_b],
            }
            for r in stats_rows
        ),
        key=lambda s: s["file"],
    )
    with open(os.path.join(path, STATS_NAME), "w") as fh:
        json.dump({"cols": [col_a, col_b], "files": stats}, fh)
    return stats


BLOOM_NAME = "_file_bloom.json"


def build_file_blooms(
    spark: SparkSession,
    path: str,
    col: str,
    m_bits: int | None = None,
    k_hashes: int = 5,
) -> int:
    """Per-file Bloom filters for POINT lookups on a high-cardinality
    column — the complement to the min/max sidecar (range predicates
    skip on bounding boxes; equality on a column with interleaved
    ranges needs membership).  One pass over the files: each row emits
    its k bit positions (xxhash64 with k seeds — JVM-side), and the
    per-file filter is the distinct set of set bits, collected as a
    map-side-combined aggregate and packed into a base64 bitmap
    sidecar.  Lookups never false-negative (a present value's bits are
    all set); false positives only cost a wasted file read.

    Sizing: an undersized filter saturates and skips NOTHING (every
    probe passes every file), so by default m is derived from the data
    — ~16 bits per expected key per file (p_fp ≈ 0.1%% at k=5), rounded
    up to a power of two.  Returns the chosen m_bits."""
    import base64

    data = spark.read.parquet(path)
    if m_bits is None:
        per_file = (
            data.groupBy(F.input_file_name()).count().agg(F.max("count")).head()[0]
        )
        m_bits = 4096
        while m_bits < 16 * int(per_file):
            m_bits *= 2
    # integer-keyed: both build and probe hash the value AS LONG, so the
    # bit positions agree by construction (xxhash64 has no seed arg —
    # hashing the (value, i) pair gives k independent positions)
    bits = F.array(
        *[
            F.pmod(F.xxhash64(F.col(col).cast("long"), F.lit(i)), F.lit(m_bits))
            for i in range(k_hashes)
        ]
    )
    rows = (
        data.select(F.input_file_name().alias("file"), F.explode(bits).alias("bit"))
        .groupBy("file")
        .agg(F.collect_set("bit").alias("set_bits"))
        .collect()
    )
    files = {}
    for r in rows:
        bitmap = bytearray(m_bits // 8)
        for b in r.set_bits:
            bitmap[b >> 3] |= 1 << (b & 7)
        files[r.file] = base64.b64encode(bytes(bitmap)).decode()
    payload = {
        "col": col,
        "m_bits": m_bits,
        "k_hashes": k_hashes,
        "files": files,
    }
    with open(os.path.join(path, BLOOM_NAME), "w") as fh:
        json.dump(payload, fh)
    return m_bits


def read_with_bloom(
    spark: SparkSession,
    path: str,
    value,
) -> tuple[DataFrame, int, int]:
    """Read only the files whose Bloom filter may contain ``value`` for
    the indexed column; apply the residual equality filter.  Returns
    (frame, n_files_total, n_files_read).  The probe's bit positions
    are computed with the SAME engine expressions used at build time
    (a one-row local job), so hash parity is by construction."""
    import base64

    with open(os.path.join(path, BLOOM_NAME)) as fh:
        index = json.load(fh)
    col, m_bits, k = index["col"], index["m_bits"], index["k_hashes"]
    probe = spark.range(1).select(
        *[
            F.pmod(F.xxhash64(F.lit(value).cast("long"), F.lit(i)), F.lit(m_bits)).alias(
                f"b{i}"
            )
            for i in range(k)
        ]
    ).head()
    need = [int(probe[f"b{i}"]) for i in range(k)]
    survivors = []
    for f, encoded in index["files"].items():
        bitmap = base64.b64decode(encoded)
        if all(bitmap[b >> 3] & (1 << (b & 7)) for b in need):
            survivors.append(f)
    base = (
        spark.read.parquet(*survivors)
        if survivors
        else spark.read.parquet(path).limit(0)
    )
    return base.filter(F.col(col) == value), len(index["files"]), len(survivors)


def read_with_skipping(
    spark: SparkSession,
    path: str,
    predicates: dict[str, tuple],
) -> tuple[DataFrame, int, int]:
    """Read ``path`` keeping only files whose stats bounding box
    intersects every ``col: (lo, hi)`` predicate, then apply the
    residual filter.  Returns (frame, n_files_total, n_files_read)."""
    with open(os.path.join(path, STATS_NAME)) as fh:
        index = json.load(fh)
    survivors = []
    for entry in index["files"]:
        keep = True
        for col, (lo, hi) in predicates.items():
            fmin, fmax = entry[col]
            if fmax < lo or fmin > hi:
                keep = False
                break
        if keep:
            survivors.append(entry["file"])
    base = (
        spark.read.parquet(*survivors)
        if survivors
        else spark.read.parquet(path).limit(0)
    )
    cond = reduce(
        lambda x, y: x & y,
        [F.col(c).between(lo, hi) for c, (lo, hi) in predicates.items()],
    )
    return base.filter(cond), len(index["files"]), len(survivors)


def compact_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_rows_per_file: int,
) -> tuple[int, int]:
    """Small-file compaction (the other half of OPTIMIZE): rewrite a
    directory of many small files — the natural residue of streaming
    ingest, where every micro-batch commits its own files — into
    ~target-sized ones.  Uses ``coalesce``, which merges partitions
    WITHOUT a shuffle: each output task concatenates a set of input
    files, so the rewrite moves every byte exactly once and never
    re-keys it.  (A clustering rewrite is ``optimize_zorder``; this one
    deliberately preserves only content, not order.)  Returns
    (n_files_before, n_files_after)."""
    df = spark.read.parquet(src_path)
    n_before = len(df.inputFiles())
    n_rows = df.count()
    n_out = max(1, -(-n_rows // target_rows_per_file))
    df.coalesce(min(n_out, n_before)).write.mode("overwrite").parquet(dst_path)
    n_after = len(spark.read.parquet(dst_path).inputFiles())
    return n_before, n_after
