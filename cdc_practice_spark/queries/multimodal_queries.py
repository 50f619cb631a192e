"""Multimodal plumbing under the oracle gate.

The codec kernel is a deterministic fake (no media libs in container),
which has a silver lining: the ENTIRE distributed path — synth binary
assets → Arrow-batched mapInPandas decode → aggregate — is exactly
reproducible in SQL, so the driver hash-checks the mapInPandas plumbing
itself (schema, batching, byte-level payload handling), not just a row
count.

Float note: each asset's mean_byte is sum(ascii)/256 — an exact multiple
of 2⁻⁸ — so sums/averages are bit-exact regardless of aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_practice_spark.operators.multimodal import decode_assets, synth_assets
from cdc_practice_spark.queries.registry import register
from cdc_practice_spark.session import load_table


@register(
    "multimodal_decode_stats",
    oracle="""
WITH assets AS (
  SELECT doc_id AS asset_id,
         (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INTEGER) + 1] AS modality,
         repeat(sha256(text), 4) AS payload
  FROM documents
),
decoded AS (
  SELECT asset_id, modality,
         length(payload) AS n_bytes,
         CAST(list_sum(list_transform(string_split(payload, ''),
                                      c -> ascii(c))) AS DOUBLE)
           / length(payload) AS mean_byte,
         sha256(payload) AS content_sha256
  FROM assets
)
SELECT modality,
       count(*) AS n_assets,
       CAST(round(avg(n_bytes), 6) AS DOUBLE) AS avg_bytes,
       round(avg(mean_byte), 6) AS avg_mean_byte,
       count(DISTINCT content_sha256) AS n_distinct_payloads
FROM decoded
GROUP BY modality
""",
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synth assets → mapInPandas decode → per-modality stats.  The
    oracle recomputes the deterministic fake decode in SQL, so this
    checks the Arrow/mapInPandas byte path end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_assets(synth_assets(docs))
    return decoded.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.round(F.avg("n_bytes"), 6).cast("double").alias("avg_bytes"),
        F.round(F.avg("mean_byte"), 6).alias("avg_mean_byte"),
        F.countDistinct("content_sha256").alias("n_distinct_payloads"),
    )
