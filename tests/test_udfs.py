"""UDF/UDAF/UDTF surface tests."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cdc_practice_spark.functions.udfs import chunk_text_udtf, clipped_ratio, geomean_udaf
from cdc_practice_spark.session import load_table


def test_geomean_udaf_matches_formula(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    got = {
        r.o_orderstatus: r.gm
        for r in orders.groupBy("o_orderstatus")
        .agg(F.round(geomean_udaf()("o_totalprice"), 4).alias("gm"))
        .collect()
    }
    expected = {
        r.o_orderstatus: r.gm
        for r in orders.groupBy("o_orderstatus")
        .agg(F.round(F.exp(F.avg(F.ln("o_totalprice"))), 4).alias("gm"))
        .collect()
    }
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-3, k


def test_clipped_ratio(spark):
    df = spark.createDataFrame(
        [(5.0, 10.0), (10.0, 5.0), (1.0, 0.0)], "num double, den double"
    )
    got = [r.r for r in df.select(clipped_ratio()("num", "den").alias("r")).collect()]
    assert got[0] == 0.5
    assert got[1] == 1.0  # clipped
    assert got[2] == 1.0  # div-by-~zero clipped


def test_chunk_text_udtf(spark):
    spark.udtf.register("chunk_text", chunk_text_udtf())
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(70)))], "doc_id long, text string"
    )
    df.createOrReplaceTempView("docs_to_chunk")
    out = spark.sql(
        """
        SELECT doc_id, c.chunk_idx, c.n_tokens
        FROM docs_to_chunk,
        LATERAL chunk_text(text, 32) AS c
        """
    ).collect()
    assert [(r.chunk_idx, r.n_tokens) for r in out] == [(0, 32), (1, 32), (2, 6)]
