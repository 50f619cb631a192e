"""Table maintenance: small-file compaction for append sinks.

The streaming history sink appends one file set per micro-batch; at
1-minute triggers that's ~1440 file groups/day — the classic small-files
problem that degrades every later scan (footer reads, scheduling
overhead, no row-group locality).

``compact_parquet`` rewrites a directory into ``target_files`` files,
optionally sorted by a key so downstream per-key windows read clustered
data.  Write-audit-swap: the rewrite lands in a side directory, is row-
counted against the source, and only then swapped in — a crash leaves
either the old or the new layout, never a mix.  (Table formats do this
with metadata transactions; this is the plain-parquet equivalent.)
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_files: int = 4,
    sort_by: list[str] | None = None,
) -> int:
    """Compact ``path`` in place; returns the row count."""
    df = spark.read.parquet(path)
    n_before = df.count()

    out = df.repartition(target_files)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)

    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)

    n_after = spark.read.parquet(tmp).count()
    if n_after != n_before:  # audit before swap
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"compaction row-count mismatch: {n_before} -> {n_after}; aborted"
        )

    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_after


def parquet_file_count(path: str) -> int:
    return sum(
        1
        for _, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
