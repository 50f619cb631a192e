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


def corpus_features(docs: DataFrame) -> DataFrame:
    """Every per-document feature the curation stages need, computed in
    ONE pass over ``docs`` (doc_id, source, text): language, quality,
    content fingerprint, token count, shingle hashes, and the full
    16-permutation minhash signature.

    Scalar features are one JVM projection sharing a single materialized
    token array (higher-order functions don't CSE — the *_from_tokens
    variants exist for exactly this); shingle hashes + minhash mins ride
    the Arrow C-md5 kernel with the scalars as passthrough columns.  The
    raw text is dropped on the way out: at 100 TB this pass IS the
    ingest job and everything downstream moves narrow feature rows."""
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
    )


@dataclass(frozen=True)
class FrozenCorpusStats:
    """Ingest-time statistics a production pipeline computes ONCE from
    the standing corpus and then applies to every arriving batch until
    the next re-calibration: the quality threshold, the per-source
    temperature-mix acceptance thresholds (millionths), and the
    benchmark blocklist fingerprints."""

    q25: float
    rates: dict  # source -> accept threshold in millionths (int)
    blocklist_fps: tuple  # sorted content fingerprints of the eval set


def freeze_corpus_stats(
    corpus_feats: DataFrame, blocklist_fps: list[str]
) -> FrozenCorpusStats:
    """Compute the frozen stats from the corpus' feature frame with the
    SAME algebra as the batch pipeline: threshold = exact P25 of the
    language-detected corpus' quality scores (round-6); mix rates from
    the quality-surviving, decontaminated population (√n temperature
    rule, target half)."""
    c1 = corpus_feats.filter(F.col("lang_pred") != "und")
    q25 = float(
        c1.agg(
            F.round(F.expr("percentile(quality_score, 0.25)"), 6).alias("q")
        ).collect()[0]["q"]
    )
    bl = set(blocklist_fps)
    c4 = c1.filter(F.col("quality_score") >= q25).filter(
        ~F.col("fp").isin(*bl) if bl else F.lit(True)
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
    return FrozenCorpusStats(
        q25=q25, rates=rates, blocklist_fps=tuple(sorted(bl))
    )
