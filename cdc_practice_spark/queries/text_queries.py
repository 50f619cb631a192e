"""Text-analysis queries over the ``documents`` corpus — language ID,
quality scoring, token counting, fingerprinting (the training-data
pipeline surface).  Every query is one projection pass over the corpus:
no shuffles, no UDFs — scan-speed at any scale.

The DuckDB oracles replicate each formula digit-for-digit (shared
md5-derived hashing, identical regexes, identical fold order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_practice_spark.functions import text as T
from cdc_practice_spark.queries.registry import register
from cdc_practice_spark.session import load_table

_STOP_SQL = ", ".join(f"'{w}'" for w in T.STOPWORDS_EN)

# shared oracle fragment: whitespace tokens of lowercased text
_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"


@register(
    "text_token_stats",
    oracle=f"""
SELECT doc_id,
       n_chars,
       length(text) AS n_chars_actual,
       len({_TOKS}) AS n_tokens_ws,
       len(regexp_extract_all(lower(text), '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens_bpe,
       round(CAST(list_sum(list_transform({_TOKS}, t -> length(t))) AS DOUBLE)
             / greatest(len({_TOKS}), 1), 6) AS mean_token_len
FROM documents
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace + BPE-ish regex (LLM token budgeting)."""
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        "n_chars",
        F.length(c).alias("n_chars_actual"),
        T.token_count_ws(c).alias("n_tokens_ws"),
        T.token_count_bpe(c).alias("n_tokens_bpe"),
        T.mean_token_len(c).alias("mean_token_len"),
    )


@register(
    "text_quality",
    oracle=f"""
WITH scored AS (
  SELECT doc_id,
         round(CAST(len(list_filter({_TOKS}, t -> list_contains([{_STOP_SQL}], t))) AS DOUBLE)
               / greatest(len({_TOKS}), 1), 6) AS stopword_ratio,
         round(CAST(length(regexp_replace(text, '\\s', '', 'g'))
                    - length(regexp_replace(regexp_replace(text, '\\s', '', 'g'),
                                            '[^A-Za-z0-9]', '', 'g')) AS DOUBLE)
               / greatest(length(regexp_replace(text, '\\s', '', 'g')), 1), 6) AS punct_ratio,
         least(length(text) / 500.0, 1.0) AS length_term
  FROM documents
)
SELECT doc_id, stopword_ratio, punct_ratio,
       round((length_term + least(stopword_ratio * 4, 1.0)
              + 1.0 - least(punct_ratio * 4, 1.0)) / 3, 6) AS quality_score
FROM scored
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / punctuation / stopword ratios folded
    into a fixed composite heuristic (functions/text.py:quality_score)."""
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        T.stopword_ratio(c).alias("stopword_ratio"),
        T.punct_ratio(c).alias("punct_ratio"),
        T.quality_score(c).alias("quality_score"),
    )


def _lang_oracle() -> str:
    hits = ",\n         ".join(
        f"len(list_filter({_TOKS}, t -> list_contains(["
        + ", ".join(f"'{m}'" for m in markers)
        + f"], t))) AS h_{lang}"
        for lang, markers in T.LANG_MARKERS.items()
    )
    langs = list(T.LANG_MARKERS)
    # argmax with earliest-language tiebreak — replicates the Spark fold
    conds = []
    for i, lang in enumerate(langs):
        later = [f"h_{lang} >= h_{l2}" for l2 in langs[i + 1 :]]
        cond = " AND ".join(later) if later else "TRUE"
        conds.append(f"WHEN {cond} THEN '{lang}'")
    case = "\n            ".join(conds)
    return f"""
WITH hits AS (
  SELECT doc_id, lang,
         {hits}
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN greatest(h_en, h_de, h_fr, h_es, h_zh) = 0 THEN 'und'
            {case}
       END AS lang_pred
FROM hits
"""


@register("text_lang_id", oracle=_lang_oracle())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID vs the table's claimed lang."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", T.lang_id(F.col("text")).alias("lang_pred")
    )


@register(
    "dataset_train_val_split",
    oracle="""
WITH tagged AS (
  SELECT doc_id, lang,
         CASE WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 15)
                   AS BIGINT) % 100 < 90
              THEN 'train' ELSE 'val' END AS split
  FROM documents
)
SELECT split, lang, count(*) AS n_docs
FROM tagged
GROUP BY split, lang
""",
)
def dataset_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val split (90/10) — the standard
    leakage-safe dataset partitioning: membership is a pure function of
    the id (stable across runs, machines, and engine versions — no
    rand()), so resumed/incremental pipelines never shuffle examples
    between splits.  Output: per-split-per-lang counts."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    tagged = docs.withColumn(
        "split", F.when(bucket < 90, "train").otherwise("val")
    )
    return tagged.groupBy("split", "lang").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "text_fingerprints",
    oracle=f"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fp_sorted,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform({_TOKS},
             t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT) % 1000000007)),
         (acc, h) -> (acc * 31 + h) % 1000000007) AS fp_rolling
FROM documents
""",
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: order-insensitive sorted-token md5 +
    order-sensitive polynomial rolling hash (functions/text.py)."""
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        T.fingerprint_sorted_tokens(c).alias("fp_sorted"),
        T.fingerprint_rolling(c).alias("fp_rolling"),
    )


@register(
    "vocab_df_idf_topk",
    oracle=f"""
WITH terms AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
df AS (
  SELECT term,
         CAST(count(*) AS BIGINT) AS n_occurrences,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM terms WHERE term <> '' GROUP BY term
)
SELECT term, n_occurrences, n_docs,
       CAST(round(ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / n_docs), 6)
            AS DOUBLE) AS idf
FROM df
ORDER BY n_docs DESC, term
LIMIT 50
""",
)
def vocab_df_idf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary building — the first step of any tokenizer /
    TF-IDF training pipeline: explode whitespace tokens, count term and
    document frequency, derive IDF against the corpus size (a one-row
    broadcast scalar), keep the top-50 head of the distribution.  One
    shuffle on term; the explode happens map-side, so at 100 TB this is
    scan + one word-count-shaped aggregation (the canonical map-side
    combine workload)."""
    docs = load_table(spark, sf_dir, "documents")
    n_total = docs.agg(F.count(F.lit(1)).cast("double").alias("_n_total"))
    terms = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    return (
        terms.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .crossJoin(F.broadcast(n_total))
        .withColumn(
            "idf",
            F.round(F.log(F.col("_n_total") / F.col("n_docs")), 6).cast("double"),
        )
        .drop("_n_total")
        .orderBy(F.col("n_docs").desc(), F.col("term"))
        .limit(50)
    )


@register(
    "corpus_quality_filter",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
         round((least(length(text) / 500.0, 1.0)
                + least(round(CAST(len(list_filter({_TOKS}, t -> list_contains([{_STOP_SQL}], t))) AS DOUBLE)
                              / greatest(len({_TOKS}), 1), 6) * 4, 1.0)
                + 1.0 - least(round(CAST(length(regexp_replace(text, '\\s', '', 'g'))
                           - length(regexp_replace(regexp_replace(text, '\\s', '', 'g'),
                                                   '[^A-Za-z0-9]', '', 'g')) AS DOUBLE)
                     / greatest(length(regexp_replace(text, '\\s', '', 'g')), 1), 6) * 4, 1.0)) / 3,
               6) AS quality_score
  FROM documents
),
thr AS (SELECT round(quantile_cont(quality_score, 0.25), 6) AS q25 FROM scored)
SELECT doc_id, lang, quality_score,
       CAST(q25 AS DOUBLE) AS threshold
FROM scored, thr
WHERE quality_score >= q25
""",
)
def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-percentile corpus curation — the standard 'drop the worst
    quartile' pre-training filter: score every document (one codegen'd
    projection), compute the corpus-wide exact P25 as a one-row
    aggregate, broadcast it back, and keep documents at or above it.
    Two passes over the scores but only ONE over the raw text (scores
    are 1 double/doc); at 100 TB swap the exact percentile for
    approx_percentile and nothing else changes."""
    docs = load_table(spark, sf_dir, "documents")
    # persist: the scored projection feeds BOTH the threshold aggregate
    # and the filter — without it Spark evaluates the whole text-scoring
    # subtree twice (plans don't CSE across join branches; measured 2×).
    # The cached footprint is 3 narrow columns, not the raw text.
    from cdc_practice_spark.plans.cache import tracked_persist

    scored = tracked_persist(
        docs.select(
            "doc_id", "lang", T.quality_score(F.col("text")).alias("quality_score")
        )
    )
    thr = scored.agg(
        F.round(F.expr("percentile(quality_score, 0.25)"), 6).alias("threshold")
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .filter(F.col("quality_score") >= F.col("threshold"))
        .select("doc_id", "lang", "quality_score", F.col("threshold").cast("double").alias("threshold"))
    )


_FP_SORTED_SQL = f"md5(array_to_string(list_sort(list_distinct({_TOKS})), ' '))"


@register(
    "corpus_decontaminate",
    oracle=f"""
WITH fps AS (
  SELECT doc_id, lang, {_FP_SORTED_SQL} AS fp FROM documents
),
blocklist AS (
  SELECT DISTINCT fp FROM fps WHERE doc_id % 97 = 0
)
SELECT lang,
       CAST(count(*) FILTER (fp NOT IN (SELECT fp FROM blocklist)) AS BIGINT)
         AS n_kept,
       CAST(count(*) FILTER (fp IN (SELECT fp FROM blocklist)) AS BIGINT)
         AS n_removed
FROM fps
GROUP BY lang
""",
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the training-data hygiene step that
    removes every document whose content fingerprint collides with an
    eval/benchmark set (here: doc_id % 97 == 0 plays the benchmark):
    fingerprint both sides with the order-insensitive sorted-token md5,
    LEFT ANTI join corpus → blocklist.  Content-based (not id-based), so
    near-exact copies of benchmark docs are swept too.  Scale: the
    blocklist is typically thousands of fingerprints → broadcast anti
    join, zero corpus shuffle; per-lang rollup after."""
    docs = load_table(spark, sf_dir, "documents")
    fps = docs.select(
        "doc_id", "lang", T.fingerprint_sorted_tokens(F.col("text")).alias("fp")
    )
    blocklist = fps.filter(F.col("doc_id") % 97 == 0).select(
        F.col("fp").alias("_bfp")
    ).distinct()
    flagged = fps.join(
        F.broadcast(blocklist), fps["fp"] == F.col("_bfp"), "left"
    )
    contaminated = F.col("_bfp").isNotNull()
    return flagged.groupBy("lang").agg(
        F.sum(F.when(~contaminated, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(contaminated, 1).otherwise(0)).cast("bigint").alias("n_removed"),
    )
