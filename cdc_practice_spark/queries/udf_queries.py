"""UDF-surface queries: grouped-agg pandas UDAF and text-chunking UDTF,
both oracle-checked (the UDAF against the closed-form SQL identity, the
UDTF against DuckDB list slicing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_practice_spark.functions.udfs import chunk_text_udtf, geomean_udaf
from cdc_practice_spark.queries.registry import register
from cdc_practice_spark.session import load_table


@register(
    "udaf_geomean_by_status",
    oracle="""
SELECT o_orderstatus,
       round(exp(avg(ln(o_totalprice))), 4) AS geomean_price,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
""",
)
def udaf_geomean_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF (grouped-agg pandas UDF): geometric mean of order
    totals per status.  Arrow hands the whole group to one numpy call;
    the oracle is the exp(avg(ln x)) identity."""
    orders = load_table(spark, sf_dir, "orders")
    # a grouped-agg pandas UDF can't share an agg with JVM aggregates —
    # compute each and join on the (tiny) group key
    gm = orders.groupBy("o_orderstatus").agg(
        F.round(geomean_udaf()("o_totalprice"), 4).alias("geomean_price")
    )
    counts = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return gm.join(counts, "o_orderstatus")


@register(
    "udtf_text_chunks",
    oracle="""
WITH tk AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
  WHERE doc_id < 50
)
SELECT doc_id,
       ci AS chunk_idx,
       array_to_string(toks[ci * 32 + 1 : least((ci + 1) * 32, len(toks))], ' ')
         AS chunk,
       CAST(least((ci + 1) * 32, len(toks)) - ci * 32 AS INTEGER) AS n_tokens
FROM tk, unnest(generate_series(0, CAST((len(toks) - 1) // 32 AS INTEGER))) AS t(ci)
""",
)
def udtf_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF: LLM-ingest token chunking (32-token windows) via LATERAL —
    one doc row in, one row per chunk out."""
    spark.udtf.register("chunk_text", chunk_text_udtf())
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 50
    ).createOrReplaceTempView("_docs_chunks")
    return spark.sql(
        """
        SELECT doc_id, c.chunk_idx, c.chunk, c.n_tokens
        FROM _docs_chunks, LATERAL chunk_text(text, 32) AS c
        """
    )
