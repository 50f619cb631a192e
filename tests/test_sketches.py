"""Misra-Gries heavy-hitters: the superset guarantee must hold on
adversarial distributions across arbitrary partitionings."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_practice_spark.operators.sketches import misra_gries_candidates
from cdc_practice_spark.session import load_table


def _exact_counts(df, col):
    return {
        r[col]: r.c for r in df.groupBy(col).agg(F.count(F.lit(1)).alias("c")).collect()
    }


def test_mg_guarantee_on_skewed_synthetic(spark):
    """Zipf-ish stream: items with freq > n/(k+1) MUST be candidates,
    for several k, regardless of the 13-way partitioning."""
    rows = (
        [("hot",)] * 4000
        + [("warm",)] * 1500
        + [(f"cold_{i % 97}",) for i in range(4500)]
    )
    df = spark.createDataFrame(rows, "item string").repartition(13)
    n = len(rows)
    exact = _exact_counts(df, "item")
    for k in (1, 2, 3, 8):
        cands, n_seen = misra_gries_candidates(df, "item", k=k)
        assert n_seen == n
        assert len(cands) <= k
        must_have = {i for i, c in exact.items() if c * (k + 1) > n}
        assert must_have <= set(cands), (k, must_have, cands)


def test_mg_candidate_list_is_bounded_and_deterministic(spark):
    df = spark.createDataFrame(
        [(f"u{i % 50}",) for i in range(5000)], "item string"
    ).repartition(7)
    a, _ = misra_gries_candidates(df, "item", k=4)
    b, _ = misra_gries_candidates(df, "item", k=4)
    assert a == b and len(a) <= 4


def test_mg_on_fixture_lang(spark, sf_dir):
    """documents.lang: 'en' dominates the fixtures (> n/4), so it must
    survive a capacity-3 summary."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    cands, n = misra_gries_candidates(docs, "lang", k=3)
    exact = _exact_counts(docs, "lang")
    assert sum(exact.values()) == n
    for lang, c in exact.items():
        if c * 4 > n:
            assert lang in cands


def test_mg_nulls_are_not_items(spark):
    df = spark.createDataFrame(
        [("x",)] * 10 + [(None,)] * 90, "item string"
    ).repartition(3)
    cands, n = misra_gries_candidates(df, "item", k=2)
    assert n == 10  # nulls excluded from the stream length
    assert cands == ["x"]
