"""Parity pins for the r12 Arrow/numpy PQ kernels: the fast paths must
reproduce the JVM expression twins BIT-FOR-BIT (codes feed persisted
stores and hash-gated oracles, so "close" is not enough)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_practice_spark.functions.vectors import to_double
from cdc_practice_spark.operators import quantization as Q
from cdc_practice_spark.session import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_round6_exact_matches_spark_round(spark):
    # adversarial values: exact half-boundaries at the 7th decimal,
    # values whose shortest repr sits ON a .xxxxxx5 boundary (the fast
    # floor path's danger zone), plus bulk random coverage
    vals = [
        0.1234565,
        0.12345650000000001,
        0.1234564999999999,
        1.0000005,
        2.5e-7,
        7.5e-7,
        0.9999995,
        123456.1234565,
        0.0,
        1e-12,
        3.0000004999999997,
    ]
    # large magnitudes (r12 ADVICE): past |x| ~ a few thousand the ×1e6
    # scaling's ULP exceeds a fixed 1e-6 guard band, so the fast floor
    # path can silently diverge from the Decimal twin — these two were
    # verified numerically to diverge under the old fixed band
    vals += [
        17164.3226305,
        133702.3305735,
        4503599627.370497,  # |x|·1e6 ≈ 2^52: ULP(scaled) = 1, all-exact path
        9.87654321e12,
        1.5e15,
    ]
    rng = np.random.default_rng(7)
    vals += [float(x) for x in rng.uniform(0, 200, 500)]
    vals += [float(x) / 1e7 for x in rng.integers(0, 10**8, 500)]
    # bulk coverage in the large-magnitude band the r12 ADVICE flagged
    # (squared L2 distances of unnormalized embeddings)
    vals += [float(x) for x in rng.uniform(1e4, 1e6, 500)]
    vals += [float(x) for x in rng.uniform(1e6, 1e13, 200)]
    got = Q._round6_exact_np(np.array(vals, dtype=np.float64))
    want = [
        r.r
        for r in spark.createDataFrame([(v,) for v in vals], "x double")
        .select(F.round("x", 6).alias("r"))
        .collect()
    ]
    for v, g, w in zip(vals, got, want):
        assert g == w, f"round6 diverged for {v!r}: numpy {g!r} vs JVM {w!r}"


def test_lit_double_array_round_trips_bit_exactly(spark):
    # the single-parse array literal must round-trip every double
    # bit-for-bit, including the non-finite values the r12 ADVICE
    # flagged (repr emits nan/inf, which D-suffixed parse as
    # identifiers — those must take the CAST form)
    import math
    import struct

    from cdc_practice_spark.functions.vectors import lit_double_array

    vals = [
        0.0,
        -0.0,
        1.5,
        -2.75,
        5e-324,  # smallest subnormal
        2.2250738585072014e-308,  # smallest normal
        1.7976931348623157e308,  # max double
        1e-7,
        123456789.123456789,
        float("nan"),
        float("inf"),
        float("-inf"),
    ]
    got = spark.range(1).select(lit_double_array(vals).alias("a")).head().a
    assert len(got) == len(vals)
    for v, g in zip(vals, got):
        if math.isnan(v):
            assert math.isnan(g)
        else:
            assert struct.pack("<d", g) == struct.pack("<d", v), (v, g)
    # empty stays a typed empty array
    assert spark.range(1).select(lit_double_array([]).alias("a")).head().a == []


def test_pq_codes_and_norm_match_expression_twin(emb):
    cb = Q.pq_train(emb, m=8, ksub=16, n_iter=1)
    v = to_double(F.col("embedding"))
    jvm_norm = F.round(
        F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)), 6
    )
    want = {
        r.vec_id: (list(r.codes), r.norm)
        for r in emb.select(
            "vec_id",
            Q._codes_expr(v, cb).alias("codes"),
            jvm_norm.alias("norm"),
        ).collect()
    }
    got = {
        r.vec_id: (list(r.codes), r.norm)
        for r in Q.pq_encode(emb, cb).collect()
    }
    assert got == want


def test_pq_train_deterministic_and_kernel_backed(emb):
    cb1 = Q.pq_train(emb, m=8, ksub=16, n_iter=2)
    cb2 = Q.pq_train(emb, m=8, ksub=16, n_iter=2)
    assert cb1 == cb2
    m, ksub = len(cb1), len(cb1[0])
    assert (m, ksub) == (8, 16)
