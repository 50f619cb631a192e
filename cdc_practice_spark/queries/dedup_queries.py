"""Deduplication queries over ``documents`` — exact, MinHash-LSH,
SimHash, and n-gram Jaccard — each with a digit-exact DuckDB oracle
(shared md5-derived hashes, identical permutation constants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_practice_spark.operators import dedup as D
from cdc_practice_spark.queries.registry import register
from cdc_practice_spark.session import load_table

_HASH = "CAST('0x' || substring(md5({x}), 1, 15) AS BIGINT) % 1000000007"

# Oracle fragment: doc_id + distinct 3-word shingles + their hashes.
_SHINGLES_CTE = f"""
tk AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(toks) - 2, 1)),
           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS sh
  FROM tk
),
hs AS (
  SELECT doc_id, sh,
         list_transform(sh, s -> {_HASH.format(x='s')}) AS hs
  FROM sh
)
"""


def _minhash_cols_sql() -> str:
    cols = []
    for i in range(D.NUM_PERM):
        a, b = D._perm_params(i)
        cols.append(
            f"list_aggregate(list_transform(hs, h -> (h * {a} + {b}) % {D.MOD}),"
            f" 'min') AS mh{i}"
        )
    return ",\n         ".join(cols)


def _band_list_sql() -> str:
    bands = []
    for b in range(D.BANDS):
        ms = ", ".join(f"mh{b * D.ROWS_PER_BAND + r}" for r in range(D.ROWS_PER_BAND))
        bands.append(f"concat_ws('-', {ms})")
    return "[" + ", ".join(bands) + "]"


@register(
    "dedup_exact_clusters",
    oracle="""
SELECT md5(array_to_string(list_sort(list_distinct(
         string_split_regex(lower(trim(text)), '\\s+'))), ' ')) AS fingerprint,
       count(*) AS n_docs,
       min(doc_id) AS representative_id
FROM documents
GROUP BY 1
""",
)
def dedup_exact_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy on the sorted-token fingerprint.
    One map-side-combinable shuffle; linear at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup_clusters(docs)


@register(
    "dedup_minhash_lsh",
    oracle=f"""
WITH {_SHINGLES_CTE},
sigs AS (
  SELECT doc_id, sh,
         {{minhash_cols}}
  FROM hs
),
banded AS (
  SELECT doc_id, sh,
         unnest({{band_list}}) AS band_key,
         unnest([0, 1, 2, 3]) AS band_idx
  FROM sigs
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
verified AS (
  -- Jaccard over the 60-bit hash sets, mirroring the engine (identical
  -- up to negligible hash collisions, and bit-identical to Spark)
  SELECT doc_a, doc_b,
         round(CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
               / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))),
               6) AS jaccard
  FROM cands
  JOIN hs sa ON sa.doc_id = cands.doc_a
  JOIN hs sb ON sb.doc_id = cands.doc_b
)
SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= 0.8
""".format(
        minhash_cols="__MINHASH__", band_list="__BANDS__"
    )
    .replace("__MINHASH__", _minhash_cols_sql())
    .replace("__BANDS__", _band_list_sql()),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (shingle → 16-perm signature → 4
    bands → bucket join → exact-Jaccard verify ≥ 0.8).  The scale path:
    candidate generation is equality joins on band keys, never O(N²)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs, threshold=0.8)


_HASH60 = "CAST('0x' || substring(md5({x}), 1, 15) AS BIGINT)"

_SIMHASH_BITS_SQL = " + ".join(
    f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {j}) & 1 = 1"
    f" THEN 1 ELSE -1 END)) > 0 THEN (1::BIGINT << {j}) ELSE 0 END)"
    for j in range(D.SIMHASH_BITS)
)

_SIMHASH_CTE = f"""
tk AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
toks_h AS (
  SELECT doc_id, list_transform(toks, s -> {_HASH60.format(x='s')}) AS hs
  FROM tk
),
sims AS (
  SELECT doc_id, CAST({_SIMHASH_BITS_SQL} AS BIGINT) AS simhash
  FROM toks_h
)
"""


@register(
    "dedup_simhash",
    oracle=f"""
WITH {_SIMHASH_CTE}
SELECT doc_id, simhash FROM sims
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 60-bit SimHash — two-stage projection (hash array
    materialized, then the bit fold) so md5 runs once per token."""
    docs = load_table(spark, sf_dir, "documents")
    return D.with_simhash60(docs)


_BAND_JOINS = "\nUNION\n".join(
    f"""SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
       a.simhash AS sim_a, b2.simhash AS sim_b
FROM sims a JOIN sims b2
  ON (a.simhash >> {b * D.SIM_BAND_WIDTH}) & {(1 << D.SIM_BAND_WIDTH) - 1}
   = (b2.simhash >> {b * D.SIM_BAND_WIDTH}) & {(1 << D.SIM_BAND_WIDTH) - 1}
 AND a.doc_id < b2.doc_id"""
    for b in range(D.SIM_BANDS)
)


@register(
    "dedup_simhash_pairs",
    oracle=f"""
WITH {_SIMHASH_CTE},
cands AS (
{_BAND_JOINS}
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
FROM cands
WHERE bit_count(xor(sim_a, sim_b)) <= 3
""",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 3 of 60 bits) via 4-band
    pigeonhole equality joins — EXACT for this radius (some band must be
    untouched), and no O(N²) pair explosion."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_pairs(docs, max_hamming=3).withColumn(
        "hamming", F.col("hamming").cast("int")
    )


@register(
    "dedup_minhash_clusters",
    oracle=f"""
WITH RECURSIVE {_SHINGLES_CTE},
sigs AS (
  SELECT doc_id, hs,
         {{minhash_cols}}
  FROM hs
),
banded AS (
  SELECT doc_id, unnest({{band_list}}) AS band_key,
         unnest([0, 1, 2, 3]) AS band_idx
  FROM sigs
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b
  FROM cands
  JOIN hs sa ON sa.doc_id = cands.doc_a
  JOIN hs sb ON sb.doc_id = cands.doc_b
  WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
        / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.8
),
bi AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT src, dst FROM bi
  UNION
  SELECT r.src, e.dst FROM reach r JOIN bi e ON r.dst = e.src
)
SELECT d.doc_id,
       coalesce(least(d.doc_id, m.min_reach), d.doc_id) AS cluster_rep,
       d.doc_id = coalesce(least(d.doc_id, m.min_reach), d.doc_id) AS is_kept
FROM documents d
LEFT JOIN (SELECT src, min(dst) AS min_reach FROM reach GROUP BY src) m
       ON m.src = d.doc_id
""".format(minhash_cols="__MINHASH__", band_list="__BANDS__")
    .replace("__MINHASH__", _minhash_cols_sql())
    .replace("__BANDS__", _band_list_sql()),
)
def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus dedup: MinHash-LSH pairs → connected components
    (iterative min-label propagation, operators/cluster.py) → cluster
    representative per doc.  The oracle computes the same components via
    a recursive CTE — an independent algorithm agreeing on the closure."""
    from cdc_practice_spark.operators.cluster import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, threshold=0.8)
    return dedup_clusters(docs, pairs)


@register(
    "dedup_ngram_jaccard_topk",
    oracle=f"""
WITH {_SHINGLES_CTE}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
             6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE a.doc_id < 100 AND b.doc_id < 100
ORDER BY jaccard DESC, doc_a, doc_b
LIMIT 20
""",
)
def dedup_ngram_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise n-gram Jaccard — the verification tier.  Explicitly
    BLOCKED to a bounded id range: pairwise similarity is O(N²) and must
    never run unblocked at scale (that's what minhash_lsh is for)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    sh = D.with_shingle_hashes(docs).select("doc_id", "sh")
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard"))
        .orderBy(F.col("jaccard").desc(), "doc_a", "doc_b")
        .limit(20)
    )


@register(
    "dedup_incremental_batch",
    oracle=f"""
WITH {_SHINGLES_CTE},
sigs AS (
  SELECT doc_id, hs,
         {{minhash_cols}}
  FROM hs
),
banded AS (
  SELECT doc_id, unnest({{band_list}}) AS band_key,
         unnest([0, 1, 2, 3]) AS band_idx
  FROM sigs
),
cut AS (
  SELECT CAST(floor((max(doc_id) + 1) * 0.8) AS BIGINT) AS c FROM documents
),
cands AS (
  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS other_id
  FROM banded n
  JOIN banded o ON n.band_idx = o.band_idx AND n.band_key = o.band_key
               AND o.doc_id < n.doc_id
  JOIN cut ON n.doc_id >= cut.c
),
matches AS (
  SELECT new_id, min(other_id) AS dup_of,
         CAST(count(*) AS BIGINT) AS n_dup_matches
  FROM cands
  JOIN hs sn ON sn.doc_id = cands.new_id
  JOIN hs so ON so.doc_id = cands.other_id
  WHERE round(CAST(len(list_intersect(sn.hs, so.hs)) AS DOUBLE)
        / (len(sn.hs) + len(so.hs) - len(list_intersect(sn.hs, so.hs))),
        6) >= 0.8
  GROUP BY new_id
)
SELECT d.doc_id,
       m.dup_of IS NOT NULL AS is_dup,
       m.dup_of,
       coalesce(m.n_dup_matches, 0) AS n_dup_matches
FROM documents d
JOIN cut ON d.doc_id >= cut.c
LEFT JOIN matches m ON m.new_id = d.doc_id
""".format(minhash_cols="__MINHASH__", band_list="__BANDS__")
    .replace("__MINHASH__", _minhash_cols_sql())
    .replace("__BANDS__", _band_list_sql()),
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: the newest 20% of the corpus arrives as
    a batch and dedups against the LSH index of the first 80% at
    O(batch) cost (operators/dedup.py::incremental_dedup — the corpus
    is never rescanned; its bands/signatures are the persisted index a
    deployment maintains append-only).  A new doc is a duplicate iff
    verified Jaccard ≥ 0.8 against any smaller-id doc (indexed corpus
    or earlier in the batch)."""
    docs = load_table(spark, sf_dir, "documents")
    cut = docs.agg(
        F.floor((F.max("doc_id") + 1) * 0.8).cast("long").alias("_cut")
    )
    split = docs.crossJoin(F.broadcast(cut))
    corpus = split.filter(F.col("doc_id") < F.col("_cut")).drop("_cut")
    batch = split.filter(F.col("doc_id") >= F.col("_cut")).drop("_cut")
    index_bands, index_sigs = D.minhash_index(corpus)
    return D.incremental_dedup(batch, index_bands, index_sigs, threshold=0.8)


@register(
    "dedup_exact_substring_spans",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents
),
tot AS (SELECT doc_id, greatest(len(w) - 7, 0) AS n_spans FROM t),
g AS (
  SELECT doc_id, array_to_string(list_slice(w, i, i + 7), ' ') AS gram
  FROM t, LATERAL (SELECT unnest(range(1, len(w) - 6)) AS i)
),
gp AS (SELECT doc_id, gram, count(*) AS npos FROM g GROUP BY 1, 2),
gs AS (SELECT gram FROM gp GROUP BY gram HAVING count(*) > 1),
d AS (
  SELECT gp.doc_id, sum(gp.npos) AS n_dup
  FROM gp JOIN gs USING (gram) GROUP BY 1
)
SELECT tot.doc_id,
       CAST(tot.n_spans AS BIGINT) AS n_spans,
       CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup_spans
FROM tot LEFT JOIN d USING (doc_id)
ORDER BY doc_id
""",
)
def dedup_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication per document (operators/dedup.py::
    duplicate_span_stats): count each doc's 8-token spans that also
    occur in another document — the Lee-et-al-style exact-dedup signal,
    as one explode + two map-side-combined aggregations + a semi join.
    Oracle mode carries raw span strings so DuckDB replicates exactly;
    the production default fingerprints spans with xxhash64 (8-byte
    shuffle payload), equivalence between the two modes is pinned in
    tests/test_dedup.py."""
    docs = load_table(spark, sf_dir, "documents")
    return D.duplicate_span_stats(docs, n=8, hashed=False).orderBy("doc_id")


@register(
    "dataset_split_leakage_safe",
    oracle=f"""
WITH RECURSIVE {_SHINGLES_CTE},
sigs AS (
  SELECT doc_id, hs,
         {{minhash_cols}}
  FROM hs
),
banded AS (
  SELECT doc_id, unnest({{band_list}}) AS band_key,
         unnest([0, 1, 2, 3]) AS band_idx
  FROM sigs
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b
  FROM cands
  JOIN hs sa ON sa.doc_id = cands.doc_a
  JOIN hs sb ON sb.doc_id = cands.doc_b
  WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
        / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.8
),
bi AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT src, dst FROM bi
  UNION
  SELECT r.src, e.dst FROM reach r JOIN bi e ON r.dst = e.src
),
clusters AS (
  SELECT d.doc_id,
         coalesce(least(d.doc_id, m.min_reach), d.doc_id) AS cluster_rep
  FROM documents d
  LEFT JOIN (SELECT src, min(dst) AS min_reach FROM reach GROUP BY src) m
         ON m.src = d.doc_id
),
tagged AS (
  SELECT *,
         CASE WHEN CAST('0x' || substring(
                md5(CAST(cluster_rep AS VARCHAR) || ':split'), 1, 15)
              AS BIGINT) % 100 < 90
              THEN 'train' ELSE 'val' END AS split
  FROM clusters
),
leak AS (
  SELECT CAST(count(*) AS BIGINT) AS leaky FROM (
    SELECT cluster_rep FROM tagged
    GROUP BY cluster_rep HAVING count(DISTINCT split) > 1)
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT cluster_rep) AS BIGINT) AS n_clusters,
       (SELECT leaky FROM leak) AS leaky_clusters
FROM tagged
GROUP BY split
""".format(minhash_cols="__MINHASH__", band_list="__BANDS__")
    .replace("__MINHASH__", _minhash_cols_sql())
    .replace("__BANDS__", _band_list_sql()),
)
def dataset_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val split: membership hashes the near-dup
    CLUSTER representative, not the document id — every member of a
    near-duplicate cluster lands in the same split, so no test example
    has a training near-duplicate (the contamination the plain
    ``dataset_train_val_split`` cannot rule out).  ``leaky_clusters``
    (clusters spanning both splits) is emitted as a checked invariant —
    it must be 0 by construction, and the oracle recomputes it
    independently.  Scale: one LSH+CC pass (already the dedup path) + a
    pure projection; the split adds NO extra shuffle over dedup."""
    from cdc_practice_spark.operators.cluster import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, threshold=0.8)
    clustered = dedup_clusters(docs, pairs)
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("cluster_rep").cast("string"), F.lit(":split"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    tagged = clustered.withColumn(
        "split", F.when(bucket < 90, "train").otherwise("val")
    )
    leaky = tagged.groupBy("cluster_rep").agg(
        F.countDistinct("split").alias("ns")
    ).filter(F.col("ns") > 1).agg(F.count(F.lit(1)).alias("leaky_clusters"))
    return (
        tagged.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster_rep").alias("n_clusters"),
        )
        .crossJoin(leaky)
    )


def _clusters_cte_prefix() -> str:
    """Shared oracle prefix: shingles → minhash → LSH bands → verified
    pairs → recursive closure → per-doc cluster_rep (the independent
    algorithm agreeing with the engine's CC output)."""
    return f"""
WITH RECURSIVE {_SHINGLES_CTE},
sigs AS (
  SELECT doc_id, hs,
         {_minhash_cols_sql()}
  FROM hs
),
banded AS (
  SELECT doc_id, unnest({_band_list_sql()}) AS band_key,
         unnest([0, 1, 2, 3]) AS band_idx
  FROM sigs
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b
  FROM cands
  JOIN hs sa ON sa.doc_id = cands.doc_a
  JOIN hs sb ON sb.doc_id = cands.doc_b
  WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
        / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.8
),
bi AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT src, dst FROM bi
  UNION
  SELECT r.src, e.dst FROM reach r JOIN bi e ON r.dst = e.src
),
clusters AS (
  SELECT d.doc_id,
         coalesce(least(d.doc_id, m.min_reach), d.doc_id) AS cluster_rep
  FROM documents d
  LEFT JOIN (SELECT src, min(dst) AS min_reach FROM reach GROUP BY src) m
         ON m.src = d.doc_id
)
"""


# quality_score SQL — identical formula to functions/text.py::quality_score
# (and the corpus_quality_filter oracle in text_queries.py)
def _quality_sql() -> str:
    from cdc_practice_spark.queries.text_queries import _STOP_SQL, _TOKS

    return f"""round((least(length(text) / 500.0, 1.0)
       + least(round(CAST(len(list_filter({_TOKS}, t -> list_contains([{_STOP_SQL}], t))) AS DOUBLE)
                     / greatest(len({_TOKS}), 1), 6) * 4, 1.0)
       + 1.0 - least(round(CAST(length(regexp_replace(text, '\\s', '', 'g'))
                  - length(regexp_replace(regexp_replace(text, '\\s', '', 'g'),
                                          '[^A-Za-z0-9]', '', 'g')) AS DOUBLE)
            / greatest(length(regexp_replace(text, '\\s', '', 'g')), 1), 6) * 4, 1.0)) / 3,
      6)"""


_KEEP_BEST_ORACLE = (
    _clusters_cte_prefix()
    + """,
scored AS (
  SELECT doc_id, {q} AS quality_score FROM documents
),
ranked AS (
  SELECT c.doc_id, c.cluster_rep, s.quality_score,
         row_number() OVER (PARTITION BY c.cluster_rep
                            ORDER BY s.quality_score DESC, c.doc_id) AS rn
  FROM clusters c JOIN scored s ON s.doc_id = c.doc_id
)
SELECT doc_id, cluster_rep, quality_score
FROM ranked WHERE rn = 1
""".format(q=_quality_sql())
)


@register("dedup_keep_best_quality", oracle=_KEEP_BEST_ORACLE)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup dedup keeping the HIGHEST-QUALITY member per cluster
    (quality ties → lower doc_id) instead of the arbitrary min-id rep —
    what a curation pipeline actually wants: dropping duplicates must
    not drop the best-written copy.  Composition: LSH+CC clusters
    (the existing dedup path) ⋈ the quality projection, then one
    row_number window per cluster — no extra pass over raw text beyond
    the scoring projection."""
    from cdc_practice_spark.functions import text as T
    from cdc_practice_spark.operators.cluster import dedup_clusters
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, threshold=0.8)
    clustered = dedup_clusters(docs, pairs).select("doc_id", "cluster_rep")
    scored = docs.select(
        "doc_id", T.quality_score(F.col("text")).alias("quality_score")
    )
    joined = clustered.join(scored, on="doc_id")
    w = Window.partitionBy("cluster_rep").orderBy(
        F.col("quality_score").desc(), F.col("doc_id")
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "cluster_rep", "quality_score")
    )


@register(
    "dedup_exact_jaccard_join",
    oracle=f"""
WITH {_SHINGLES_CTE},
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         round(CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
               / (len(list_distinct(a.hs)) + len(list_distinct(b.hs))
                  - len(list_intersect(a.hs, b.hs))), 6) AS jaccard
  FROM hs a JOIN hs b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, jaccard FROM p WHERE jaccard >= 0.8
ORDER BY doc_a, doc_b
""",
)
def dedup_exact_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT threshold similarity join (every pair with shingle-set
    Jaccard ≥ 0.8) via prefix filtering — operators/dedup.py::
    prefix_filtered_jaccard_join.  Completes the dedup tier's
    exactness spectrum: minhash/simhash are probabilistic (banded
    recall), the brute-force verify tier is exact but O(N²) and
    id-capped; this is exact AND sub-quadratic — candidates come from
    an equi-join on ordered-set prefixes (a lossless filter: J ≥ τ
    forces a shared prefix element), so the only pairs ever
    materialized share a prefix token and pass the length filter.  The
    oracle brute-forces all pairs, so a missed pair (broken prefix
    logic) or an extra pair (broken verify) hash-fails — the
    no-false-negatives claim is what's being checked."""
    pairs = D.prefix_filtered_jaccard_join(
        load_table(spark, sf_dir, "documents"), threshold=0.8
    )
    return pairs.orderBy("doc_a", "doc_b")
