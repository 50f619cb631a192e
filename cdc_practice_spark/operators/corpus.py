"""Shared corpus-curation building blocks: the single-scan per-document
feature pass and the frozen ingest-time statistics.

The composed batch pipeline (queries/pipeline_queries.py), its
incremental form, and the streaming ingest sink (streaming/corpus.py)
all consume the SAME feature frame and the SAME frozen-stats algebra, so
the three surfaces cannot drift apart semantically — the streaming sink
is hash-checked against the batch oracle precisely because this module
is their one implementation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_practice_spark.functions import text as T
from cdc_practice_spark.operators import dedup as D

# GPT-3/Pile-style decontamination n-gram order — ONE definition shared
# by the composed pipeline stages, the frozen ingest stats, and the
# standalone corpus_decontaminate_ngram query/oracle.
DECON_GRAM_K = 8


def corpus_features(docs: DataFrame) -> DataFrame:
    """Every per-document feature the curation stages need, computed in
    ONE pass over ``docs`` (doc_id, source, text): language, quality,
    content fingerprint, token count, shingle hashes, the full
    16-permutation minhash signature, and (r8) the distinct 8-gram
    hashes (``g8``) the decontamination stage semi-joins against the
    benchmark blocklist.

    Scalar features are one JVM projection sharing a single materialized
    token array (higher-order functions don't CSE — the *_from_tokens
    variants exist for exactly this); shingle hashes + minhash mins +
    8-gram hashes ride the Arrow C-md5 kernel with the scalars as
    passthrough columns.  The raw text is dropped on the way out: at
    100 TB this pass IS the ingest job and everything downstream moves
    narrow feature rows."""
    # ONE tokenization definition repo-wide (functions/text.py::tokens —
    # the expression the DuckDB oracle's _TOKS mirrors); materialized as
    # a column so every feature shares it
    toks = T.tokens(F.col("text"))
    tk = F.col("_toks")
    staged = docs.select(
        "doc_id", "text", "source", toks.alias("_toks")
    ).select(
        "doc_id",
        "text",
        "source",
        F.size(F.filter(tk, lambda t: t != "")).cast("long").alias("n_tokens"),
        T.lang_id_from_tokens(tk).alias("lang_pred"),
        T.quality_score_from_tokens(F.col("text"), tk).alias("quality_score"),
        T.fingerprint_sorted_from_tokens(tk).alias("fp"),
    )
    return D.with_minhash_arrow(
        staged,
        passthrough=["source", "n_tokens", "lang_pred", "quality_score", "fp"],
        gram_k=DECON_GRAM_K,
    )


@dataclass(frozen=True)
class FrozenCorpusStats:
    """Ingest-time statistics a production pipeline computes ONCE from
    the standing corpus and then applies to every arriving batch until
    the next re-calibration: the quality threshold, the per-source
    temperature-mix acceptance thresholds (millionths), and the
    benchmark blocklist's distinct 8-gram hashes (r8 — the GPT-3/Pile
    decontamination rule replaced the whole-document fingerprint)."""

    q25: float
    rates: dict  # source -> accept threshold in millionths (int)
    blocklist_grams: tuple  # sorted 60-bit 8-gram hashes of the eval set


def blocklist_gram_df(spark, grams) -> DataFrame:
    """The frozen benchmark grams as a one-column broadcastable frame —
    the semi-join side of every surface's decontamination stage."""
    return spark.createDataFrame([(int(g),) for g in grams], "g long")


def decontaminate(df: DataFrame, bl_grams: DataFrame) -> DataFrame:
    """Drop every row of ``df`` sharing ANY 8-gram with the broadcast
    benchmark-gram set (``bl_grams``: one ``g`` long column) — the
    composed pipeline's s4.  Shape at 100 TB: the eval set's distinct
    grams are small → broadcast; the survivors' grams explode map-side
    and only HITS shuffle (a distinct on contaminated doc_ids, bounded
    by the survivor count)."""
    contaminated = (
        df.select("doc_id", F.explode("g8").alias("g"))
        .join(F.broadcast(bl_grams), "g")
        .select("doc_id")
        .distinct()
    )
    return df.join(contaminated, "doc_id", "left_anti")


def freeze_corpus_stats(
    corpus_feats: DataFrame, blocklist_grams: list[int]
) -> FrozenCorpusStats:
    """Compute the frozen stats from the corpus' feature frame with the
    SAME algebra as the batch pipeline: threshold = exact P25 of the
    language-detected corpus' quality scores (round-6); mix rates from
    the quality-surviving, decontaminated population (√n temperature
    rule, target half) — decontaminated by the 8-gram rule, matching
    the batch/incremental/streaming s4."""
    c1 = corpus_feats.filter(F.col("lang_pred") != "und")
    q25 = float(
        c1.agg(
            F.round(F.expr("percentile(quality_score, 0.25)"), 6).alias("q")
        ).collect()[0]["q"]
    )
    bl = sorted(set(int(g) for g in blocklist_grams))
    c2 = c1.filter(F.col("quality_score") >= q25)
    c4 = (
        decontaminate(c2, blocklist_gram_df(corpus_feats.sparkSession, bl))
        if bl
        else c2
    )
    # the rates are computed IN SPARK with the exact expression the batch
    # pipeline (and its DuckDB oracle) uses — a Python-float re-derivation
    # could differ by one millionth at a rounding boundary (different sum
    # order for sw, int(x+0.5) vs engine HALF_UP) and flip a mix decision
    stats = c4.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n_s")
    )
    tot = stats.agg(F.sum(F.sqrt("n_s")).alias("sw"), F.sum("n_s").alias("n"))
    rate_rows = (
        stats.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.sqrt("n_s")
                    / F.col("sw")
                    * F.floor(F.col("n") * 0.5)
                    / F.col("n_s"),
                )
                * 1000000,
                0,
            )
            .cast("long")
            .alias("accept_thr"),
        )
        .collect()
    )
    rates = {r["source"]: int(r["accept_thr"]) for r in rate_rows}
    return FrozenCorpusStats(q25=q25, rates=rates, blocklist_grams=tuple(bl))
