"""Z-order layout: Morton math, skipping correctness, and the
both-dimensions pruning property that distinguishes Z-order from a
linear sort."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdc_practice_spark.operators import layout as L
from cdc_practice_spark.session import load_table


def _morton_ref(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_interleave_bits_matches_reference(spark):
    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 3, 170, 65535)],
        "a long, b long",
    )
    rows = df.withColumn("z", L.interleave_bits(F.col("a"), F.col("b"))).collect()
    for r in rows:
        assert r.z == _morton_ref(r.a, r.b, 16), (r.a, r.b)


def test_skipping_read_equals_plain_filter(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    path = os.path.join(str(tmp_path), "z")
    stats = L.optimize_zorder(li, path, "l_partkey", "l_suppkey", n_files=8)
    assert len(stats) == 8
    preds = {"l_partkey": (100, 400), "l_suppkey": (10, 60)}
    pruned, n_total, n_read = L.read_with_skipping(spark, path, preds)
    expect = li.filter(
        F.col("l_partkey").between(100, 400) & F.col("l_suppkey").between(10, 60)
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, expect.collect()))
    assert n_read < n_total  # the box must not touch every file


def test_zorder_prunes_both_dims_linear_sort_does_not(spark, sf_dir, tmp_path):
    """The reason to Z-order: a predicate on the SECOND column alone
    still skips files, while a layout sorted by the first column spreads
    every second-column value across all files."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    zpath = os.path.join(str(tmp_path), "z")
    L.optimize_zorder(li, zpath, "l_partkey", "l_suppkey", n_files=8)

    lpath = os.path.join(str(tmp_path), "linear")
    (
        li.repartitionByRange(8, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    lin_stats = (
        spark.read.parquet(lpath)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min("l_partkey").alias("min_a"),
            F.max("l_partkey").alias("max_a"),
            F.min("l_suppkey").alias("min_b"),
            F.max("l_suppkey").alias("max_b"),
        )
        .collect()
    )
    ms = li.agg(F.max("l_suppkey")).head()[0]
    lo, hi = 1, ms // 8  # narrow band of the second dimension
    z_read = L.read_with_skipping(spark, zpath, {"l_suppkey": (lo, hi)})[2]
    lin_read = sum(1 for r in lin_stats if not (r.max_b < lo or r.min_b > hi))
    assert z_read < 8  # Z-order skips files on the non-leading dim
    assert lin_read == 8  # linear sort cannot
    assert z_read < lin_read


def test_skipping_empty_box_reads_zero_files(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    path = os.path.join(str(tmp_path), "z")
    L.optimize_zorder(li, path, "l_partkey", "l_suppkey", n_files=4)
    mp = li.agg(F.max("l_partkey")).head()[0]
    pruned, _, n_read = L.read_with_skipping(
        spark, path, {"l_partkey": (mp + 10, mp + 20)}
    )
    assert n_read == 0
    assert pruned.count() == 0


def test_bloom_never_false_negative_and_skips(spark, sf_dir, tmp_path):
    """Every probe of a PRESENT key returns exactly the plain-filter
    rows (no false negatives, by construction), and most probes skip
    files (false positives only waste reads)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    path = os.path.join(str(tmp_path), "z")
    L.optimize_zorder(li, path, "l_partkey", "l_suppkey", n_files=8)
    L.build_file_blooms(spark, path, "l_orderkey")
    keys = [r.l_orderkey for r in li.select("l_orderkey").distinct().limit(12).collect()]
    skipped_any = False
    for key in keys:
        got, n_total, n_read = L.read_with_bloom(spark, path, int(key))
        expect = li.filter(F.col("l_orderkey") == int(key))
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))
        skipped_any = skipped_any or n_read < n_total
    assert skipped_any


def test_bloom_absent_key_reads_few_or_no_files(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    path = os.path.join(str(tmp_path), "z")
    L.optimize_zorder(li, path, "l_partkey", "l_suppkey", n_files=8)
    L.build_file_blooms(spark, path, "l_orderkey")
    mx = li.agg(F.max("l_orderkey")).head()[0]
    got, n_total, n_read = L.read_with_bloom(spark, path, int(mx) + 999_983)
    assert got.count() == 0
    assert n_read < n_total  # absent key: bloom should rule most files out


def test_compact_files_preserves_content_without_shuffle(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    src = os.path.join(str(tmp_path), "small")
    dst = os.path.join(str(tmp_path), "big")
    orders.repartition(32).write.parquet(src)
    n = orders.count()
    n_before, n_after = L.compact_files(spark, src, dst, target_rows_per_file=n // 2)
    assert n_before == 32 and n_after <= 3
    got = sorted(map(tuple, spark.read.parquet(dst).collect()))
    assert got == sorted(map(tuple, orders.collect()))
    # coalesce plan must not shuffle: no Exchange in the write-side plan
    plan = spark.read.parquet(src).coalesce(2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
