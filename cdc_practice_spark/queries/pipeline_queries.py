"""Training-data pipeline operators, tier 2: sequence packing, n-gram
LM scoring, embedding quantization, and embedding-level semantic dedup.
These extend the north-star operator set (COVERAGE.md bottom table)
beyond what the reference computes — the ops a 100 TB pretraining
pipeline runs between "raw corpus" and "training batches".

Hash-compare conventions follow registry.py: identical aliases both
engines, exact integer math where possible, round-6 before compare for
float ratios (sums of <100 doubles are ~1e-15 relative; round-6 is 9
orders of magnitude coarser).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_practice_spark.plans.hints import broadcast_if_small
from cdc_practice_spark.queries.registry import register
from cdc_practice_spark.session import load_table

_PACK_CAPACITY = 256

@register(
    "pack_sequences_greedy",
    oracle=f"""
WITH RECURSIVE toks AS (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
),
packed AS (
  SELECT source, doc_id, n_tokens, rn,
         CAST(0 AS BIGINT) AS bin_id, n_tokens AS bin_fill
  FROM toks WHERE rn = 1
  UNION ALL
  SELECT t.source, t.doc_id, t.n_tokens, t.rn,
         CASE WHEN p.bin_fill + t.n_tokens > {_PACK_CAPACITY}
              THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.bin_fill + t.n_tokens > {_PACK_CAPACITY}
              THEN t.n_tokens ELSE p.bin_fill + t.n_tokens END
  FROM toks t JOIN packed p ON t.source = p.source AND t.rn = p.rn + 1
)
SELECT source, doc_id, n_tokens, bin_id, bin_fill FROM packed
""",
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy first-fit-in-order sequence packing, 256-token bins per
    source (operators/packing.py — the applyInPandas running-state tier;
    the oracle recomputes the same scan as a recursive CTE).  One
    shuffle on the group key; at 100 TB the group key becomes
    (source, shard-hash) so groups stay executor-sized."""
    from cdc_practice_spark.operators.packing import pack_greedy

    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return pack_greedy(
        docs, capacity=_PACK_CAPACITY, group_col="source", tokens_col="n_tokens"
    )


@register(
    "ngram_lm_score",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
bg AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i) idx
),
c2 AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY w1),
prob AS (
  SELECT c2.w1, c2.w2, CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p
  FROM c2 JOIN c1 ON c2.w1 = c1.w1
)
SELECT bg.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(round(avg(p), 6) AS DOUBLE) AS lm_score
FROM bg JOIN prob ON bg.w1 = prob.w1 AND bg.w2 = prob.w2
GROUP BY bg.doc_id
""",
)
def ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model scoring — the fluency/
    quality signal pretraining pipelines compute per document (here the
    model is MLE P(w2|w1) trained on the corpus itself; a real pipeline
    would train on a reference corpus and score candidates).

    Shape: explode bigrams and persist NOTHING — c2 (counts on (w1,w2))
    is one map-side-combined aggregate, c1 is DERIVED from c2 (sum n2 by
    w1 — a vocab²-sized re-agg, not a second corpus pass), so the corpus
    is exploded only twice (once for the model, once for scoring) with no
    cache materialization in between.  The scoring join broadcasts the
    model only when a measured count says it fits (broadcast_if_small —
    at open-vocab 100 TB the gate declines and the (w1,w2) sort-merge
    join stands); then one doc_id agg.  Every stage is JVM codegen; no
    UDFs."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # Bigrams via arrays_zip(slice, slice), NOT a per-index transform
    # lambda: CollapseProject inlines the `w = split(text)` alias into
    # lambda bodies, so `w[i]` re-runs split() per bigram ELEMENT
    # (measured 0.66 s vs 0.36 s on the sf0.1 explode+count).  The two
    # slices reference w O(1) times per ROW, keeping re-evaluation
    # constant.  Guard size(w) >= 2: a 1-token doc must emit no bigrams
    # (Spark's sequence(0, -1) is DESCENDING [0, -1], not empty — the
    # bug class the old transform shape was one ANSI flag away from).
    def bigrams() -> DataFrame:
        return (
            docs.withColumn("w", F.split("text", " "))
            .where(F.size("w") >= 2)
            .select(
                "doc_id",
                F.explode(
                    F.arrays_zip(
                        F.slice("w", 1, F.size("w") - 1).alias("w1"),
                        F.slice(F.col("w"), 2, F.size("w") - 1).alias("w2"),
                    )
                ).alias("b"),
            )
            .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        )

    c2 = bigrams().groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    # n1 = Σ_w2 n2: derive the unigram-context counts from the bigram
    # counts instead of re-aggregating the corpus — c2 is vocab²-bounded,
    # so this agg + the model join touch no corpus-sized data at all.
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    prob = c2.join(c1, "w1").select(
        "w1", "w2", (F.col("n2").cast("double") / F.col("n1").cast("double")).alias("p")
    )
    # Size-gated broadcast (plans/hints.py): Catalyst's static stats on
    # the aggregated model side underestimate badly and would BuildLeft
    # the corpus-sized bigram stream.  The runtime count is memoized per
    # (dataset, query), so steady-state invocations pay a single model
    # build (inside the broadcast exchange) and nothing else — no persist:
    # the model is vocab²-bounded and cheaper to recompute once than to
    # materialize per run.
    prob = broadcast_if_small(prob, cache_key=(sf_dir, "ngram_lm_prob"))
    return (
        bigrams().join(prob, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("p"), 6).cast("double").alias("lm_score"),
        )
    )


@register(
    "embedding_quantize_int8",
    oracle="""
WITH prep AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
scaled AS (
  SELECT vec_id, label, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM prep
),
quant AS (
  SELECT vec_id, label, scale,
         list_transform(v, x -> CASE WHEN scale = 0 THEN 0
           ELSE greatest(-127, least(127, floor(x / scale + 0.5))) END) AS q,
         v
  FROM scaled
)
SELECT vec_id, label,
       CAST(round(scale, 6) AS DOUBLE) AS scale_r6,
       CAST(list_sum(q) AS BIGINT) AS q_sum,
       CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS q_l1,
       CAST(round(list_max(list_transform(generate_series(1, 64),
              i -> abs(v[i] - q[i] * scale))), 6) AS DOUBLE) AS max_abs_err
FROM quant
""",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column —
    the storage/serving compression step for a 100 TB vector corpus
    (4 bytes -> 1 byte per dim).  scale = max|x|/127; q = clamp(round
    half-up(x/scale)); outputs integer checksums (exact both engines)
    plus the round-6 reconstruction error.  Everything is JVM-side
    array HOFs in one codegen'd projection — no shuffle, no Python:
    quantization is embarrassingly parallel and should never cost an
    exchange."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    prep = emb.select("vec_id", "label", v.alias("v"))
    scaled = prep.withColumn(
        "scale",
        F.array_max(F.transform(F.col("v"), F.abs)) / F.lit(127.0),
    )
    qexpr = (
        "CASE WHEN scale = 0 THEN 0D ELSE "
        "greatest(-127D, least(127D, floor(x / scale + 0.5))) END"
    )
    quant = scaled.withColumn(
        "q", F.expr(f"transform(v, x -> {qexpr})")
    )
    return quant.select(
        "vec_id",
        "label",
        F.round("scale", 6).cast("double").alias("scale_r6"),
        F.expr("CAST(aggregate(q, 0D, (acc, x) -> acc + x) AS BIGINT)").alias("q_sum"),
        F.expr(
            "CAST(aggregate(q, 0D, (acc, x) -> acc + abs(x)) AS BIGINT)"
        ).alias("q_l1"),
        F.round(
            F.expr(
                "array_max(transform(sequence(0, size(v) - 1), "
                "i -> abs(v[i] - q[i] * scale)))"
            ),
            6,
        )
        .cast("double")
        .alias("max_abs_err"),
    )


_COS_PAIR_SQL = """
round((CAST(list_sum(list_transform(generate_series(1, 64),
       i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) AS DOUBLE)
  / (sqrt(CAST(list_sum(list_transform(generate_series(1, 64),
          i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)) AS DOUBLE))
     * sqrt(CAST(list_sum(list_transform(generate_series(1, 64),
            i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) AS DOUBLE)))), 6)
"""


@register(
    "semantic_dedup_keep",
    oracle=f"""
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a
  JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE {_COS_PAIR_SQL} >= 0.35
),
bi AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT src, dst FROM bi
  UNION
  SELECT r.src, e.dst FROM reach r JOIN bi e ON r.dst = e.src
)
SELECT emb.vec_id,
       coalesce(least(emb.vec_id, m.min_reach), emb.vec_id) AS cluster_rep,
       emb.vec_id = coalesce(least(emb.vec_id, m.min_reach), emb.vec_id) AS is_kept
FROM embeddings emb
LEFT JOIN (SELECT src, min(dst) AS min_reach FROM reach GROUP BY src) m
       ON m.src = emb.vec_id
""",
)
def semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level semantic dedup: cell-blocked cosine-threshold
    pairs (operators/similarity.py::threshold_similar_pairs — GEMM per
    IVF cell, threshold filter inside the Arrow batch) feed connected
    components (operators/cluster.py), and each vector keeps iff it is
    its cluster's min-id representative (τ=0.35 — on the synthetic
    random embeddings this yields the star-like tiny clusters real
    near-dup corpora produce; lower τ degenerates into one sparse giant
    component whose diameter, not size, bounds CC rounds).  The oracle recomputes the
    closure as a recursive CTE — an independent algorithm agreeing on
    the same keep-list.  Scale shape: edges only within cells, the
    closure iterates on the (tiny) edge list, and the corpus-sized side
    is touched exactly once by the final left join."""
    from cdc_practice_spark.operators.cluster import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    from cdc_practice_spark.operators.similarity import threshold_similar_pairs

    pairs = threshold_similar_pairs(emb, threshold=0.35)
    comp = connected_components(pairs, a_col="id_a", b_col="id_b")
    return (
        emb.select("vec_id")
        .join(comp, F.col("vec_id") == comp["node"], "left")
        .select(
            "vec_id",
            F.coalesce(F.col("component"), F.col("vec_id")).alias("cluster_rep"),
        )
        .withColumn("is_kept", F.col("vec_id") == F.col("cluster_rep"))
    )


_MIX_HASH = "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000007"


@register(
    "corpus_mixture_resample",
    oracle=f"""
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
),
budget AS (
  SELECT min(n_docs) AS min_c FROM counts
),
rated AS (
  SELECT lang, n_docs,
         CAST(min_c AS DOUBLE) / CAST(n_docs AS DOUBLE) AS rate
  FROM counts, budget
),
kept AS (
  SELECT d.lang, count(*) AS n_kept
  FROM documents d
  JOIN rated r ON d.lang = r.lang
  WHERE {_MIX_HASH} < CAST(floor(r.rate * 1000000007) AS BIGINT)
  GROUP BY d.lang
)
SELECT r.lang, r.n_docs,
       CAST(round(r.rate, 6) AS DOUBLE) AS rate_r6,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
FROM rated r LEFT JOIN kept k ON r.lang = k.lang
""",
)
def corpus_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture rebalancing: downsample each language to a uniform
    target mixture (rate_g = min_count / count_g — the largest uniform
    mixture reachable without upsampling), with DETERMINISTIC hash-
    threshold acceptance per document.

    Scale shape: group counts are one map-side-combined aggregate (5
    rows), rates broadcast back, and acceptance is a pure per-row
    predicate — no per-group sort, no window over 5-key partitions
    (which would serialize at 100 TB).  Hash-threshold acceptance hits
    the target proportions to binomial noise; both engines compute the
    identical md5-derived hash, so the kept counts hash-match exactly."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    budget = counts.agg(F.min("n_docs").alias("min_c"))
    rated = counts.crossJoin(F.broadcast(budget)).select(
        "lang",
        "n_docs",
        (F.col("min_c").cast("double") / F.col("n_docs").cast("double")).alias("rate"),
    )
    doc_hash = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % F.lit(1000000007)
    )
    kept = (
        docs.join(F.broadcast(rated), "lang")
        .filter(doc_hash < F.floor(F.col("rate") * 1000000007).cast("bigint"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rated.join(kept, "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.round("rate", 6).cast("double").alias("rate_r6"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )
