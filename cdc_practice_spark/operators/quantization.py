"""Product quantization (PQ) over an embedding column — the vector
COMPRESSION tier for 100 TB similarity search.

The reference engine has no vector surface; this operator belongs to the
training-data-pipeline set the build adds on top (same family as
operators/similarity.py).  PQ is the standard scale story (Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011; the
IndexPQ / IndexIVFPQ layout in the public FAISS library): split each
d-dim vector into m subspaces, k-means each subspace to ksub centroids,
store ONE BYTE per subspace — here 64 floats (256 B) become 8 codes +
one stored norm (12 B), a ~21× memory cut, which is what lets a shard's
index live in RAM at corpus scale.  Queries score against the codebook
with an ADC (asymmetric distance computation) lookup table, shortlist,
then exact-rerank only the shortlist.

Spark-first shape (everything stays in whole-stage codegen):
  - TRAIN: per iteration, ONE projection computes all m subspace
    assignments (m×ksub literal-centroid distances) and ONE global
    aggregate updates all centroids via m×ksub×dsub conditional
    averages — a single reduce of ~1k floats, no shuffle keyed by data,
    no join.  Driver state is the m×ksub×dsub codebook (~4 KB), the
    same index-build-time collect IVF already does.  At 100 TB you
    train on a sample and run one encode pass over the corpus.
  - ENCODE: one projection → (id, codes array<int>, norm double).
  - QUERY: ADC scores are element_at() lookups into m ksub-entry
    literal arrays (the LUT is built driver-side from the query vector
    — O(m·ksub) work), shortlist is TakeOrderedAndProject, and the
    exact rerank joins the shortlist back BROADCAST — the corpus is
    touched by exactly two linear scans (encode, rerank probe).

Determinism (so a recall decision can sit under the oracle gate):
centroid init = subvectors of the first ksub ids, every distance /
average / score rounds to 6 decimals before argmin / compare, ties
break on the lower cell id / vec_id, and an emptied cell keeps its
previous centroid instead of re-seeding randomly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_practice_spark.functions.vectors import cosine, to_double

Codebook = list[list[list[float]]]  # [subspace][cell][dim]


def _codebook_lit(codebook: Codebook) -> Column:
    """The m×ksub×dsub codebook as ONE nested literal array — a compact
    expression tree (the naive alternative, m·ksub unrolled distance
    expressions, makes Janino compile ~1k expressions and costs tens of
    seconds per job in codegen alone)."""
    return F.array(
        *[
            F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in cents_j])
            for cents_j in codebook
        ]
    )


def _codes_expr(v: Column, codebook: Codebook) -> Column:
    """array<int> of per-subspace argmin cells via higher-order
    functions over the literal codebook (round-6 distances, first-match
    tie-break — deterministic)."""
    m, dsub = len(codebook), len(codebook[0][0])
    cb = _codebook_lit(codebook)
    cells = []
    for j in range(m):
        sub = F.slice(v, j * dsub + 1, dsub)
        d = F.transform(
            cb[j],
            lambda c: F.round(
                F.aggregate(
                    F.zip_with(sub, c, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ),
        )
        cells.append((F.array_position(d, F.array_min(d)) - 1).cast("int"))
    return F.array(*cells)


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Codebook:
    """Lloyd's k-means independently per subspace, all subspaces per
    pass: one projection computes every subspace's assignment, then a
    posexplode → groupBy(subspace, cell) average updates all centroids —
    partial aggregation reduces each partition to ≤ m·ksub rows before
    the (tiny) shuffle, and the driver collects m·ksub rows per
    iteration.  Returns the codebook; raises if ids 0..ksub-1 are
    missing (they seed the deterministic init)."""
    emb = embeddings.select(F.col(id_col), to_double(F.col(vec_col)).alias("v"))
    first = emb.filter(F.col(id_col) < ksub).orderBy(id_col).limit(ksub).collect()
    if len(first) != ksub:
        raise ValueError(f"need vec ids 0..{ksub - 1} for deterministic init")
    dim = len(first[0].v)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    cents: Codebook = [
        [[float(x) for x in r.v[j * dsub : (j + 1) * dsub]] for r in first]
        for j in range(m)
    ]
    for _ in range(n_iter):
        sub_cells = (
            emb.select("v", _codes_expr(F.col("v"), cents).alias("codes"))
            .select("v", F.posexplode("codes").alias("j", "cell"))
            .select(
                "j",
                "cell",
                F.slice("v", F.col("j") * dsub + 1, dsub).alias("sub"),
            )
        )
        rows = (
            sub_cells.groupBy("j", "cell")
            .agg(
                *[
                    F.round(F.avg(F.col("sub")[t]), 6).alias(f"c{t}")
                    for t in range(dsub)
                ]
            )
            .collect()
        )
        for r in rows:  # absent (j, cell) rows = emptied cells keep centroids
            cents[r.j][r.cell] = [float(r[f"c{t}"]) for t in range(dsub)]
    return cents


def pq_encode(
    embeddings: DataFrame,
    codebook: Codebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, codes array<int>, norm double) in one codegen projection.
    The stored norm is what makes cosine ADC exact-denominator (FAISS
    stores it next to the codes for inner-product/cosine indexes).
    ``keep_cols`` carries index metadata (the IVF cell id) into the
    codes table, so an IVF-PQ codes store stays cell-partitionable."""
    v = to_double(F.col(vec_col))
    norm = F.round(
        F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)), 6
    )
    return embeddings.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        _codes_expr(v, codebook).alias("codes"),
        norm.alias("norm"),
    )


def adc_shortlist(
    codes: DataFrame,
    codebook: Codebook,
    query_vec: list[float],
    shortlist: int = 50,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, adc_cosine) shortlist over a pq_encode'd codes frame — the
    shared ADC stage of IndexPQ and IndexIVFPQ: the LUT lut[j][c] =
    <q_j, centroid_c> is built driver-side (O(m·ksub·dsub) floats) and
    baked into the plan as literal arrays, so scoring is m element_at
    lookups per row inside codegen; the shortlist is
    TakeOrderedAndProject (per-partition heaps, no full sort)."""
    import math

    m, dsub = len(codebook), len(codebook[0][0])
    qnorm = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    lut = [
        [
            round(
                sum(
                    float(query_vec[j * dsub + t]) * c[t] for t in range(dsub)
                ),
                6,
            )
            for c in codebook[j]
        ]
        for j in range(m)
    ]
    adc_dot = None
    for j in range(m):
        term = F.element_at(
            F.array(*[F.lit(x) for x in lut[j]]), F.col("codes")[j] + 1
        )
        adc_dot = term if adc_dot is None else adc_dot + term
    return (
        codes.select(
            F.col(id_col),
            F.round(adc_dot / (F.col("norm") * F.lit(qnorm)), 6).alias("adc_cosine"),
        )
        .orderBy(F.col("adc_cosine").desc(), F.col(id_col))
        .limit(shortlist)
    )


def _exact_rerank(
    vectors: DataFrame,
    short: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact-cosine rerank of a BROADCAST shortlist against the full
    vectors — the only stage that touches uncompressed embeddings."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        vectors.join(F.broadcast(short.select(id_col)), id_col)
        .select(
            F.col(id_col),
            F.round(cosine(to_double(F.col(vec_col)), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def pq_topk(
    embeddings: DataFrame,
    codebook: Codebook,
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC shortlist → exact rerank.  Returns (id, cosine) top-k, ranked
    by exact cosine among the ADC shortlist — the deployment shape where
    PQ prunes and full vectors (cold storage) are read only for the
    shortlist."""
    codes = pq_encode(embeddings, codebook, id_col=id_col, vec_col=vec_col)
    short = adc_shortlist(codes, codebook, query_vec, shortlist, id_col)
    return _exact_rerank(embeddings, short, query_vec, k, id_col, vec_col)


def ivf_pq_topk(
    embeddings: DataFrame,
    codebook: Codebook,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 3,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ — the composed billion-vector serving index (r11, VERDICT
    r10 ask #5; FAISS IndexIVFPQ): IVF prunes WHICH rows are scored,
    PQ compresses WHAT is scored, and full vectors are read only for
    the final shortlist:

      1. probe: rank cells by centroid cosine (_ranked_cells — the
         shared deterministic probe order) and keep the nprobe best —
         with the store partitioned by cell this is PARTITION PRUNING,
         the other cells' files are never opened;
      2. ADC: score ONLY the probed cells' code rows by LUT lookup —
         the codes table (8 codes + norm ≈ 12 B/vector vs 256 B raw,
         ~21× smaller) is what stays hot in memory at corpus scale;
         pass a precomputed ``codes`` frame (pq_encode with the cell
         column kept) for the production train-once/encode-once shape,
         else the probed embeddings are encoded on the fly;
      3. exact rerank: broadcast the shortlist ids against the probed
         cells' full vectors (cold storage touched shortlist-wide, and
         still partition-pruned).

    Deterministic end-to-end (round-6, id tiebreaks), so the recall
    decision sits under the oracle gate (ann_ivf_pq_recall)."""
    from cdc_practice_spark.operators.similarity import _ranked_cells

    best_cells = _ranked_cells(
        embeddings, query_vec, cell_col, vec_col, limit=nprobe
    )
    probed_vecs = embeddings.filter(F.col(cell_col).isin(best_cells))
    if codes is None:
        probed_codes = pq_encode(
            probed_vecs, codebook, id_col=id_col, vec_col=vec_col
        )
    else:
        probed_codes = codes.filter(F.col(cell_col).isin(best_cells))
    short = adc_shortlist(probed_codes, codebook, query_vec, shortlist, id_col)
    return _exact_rerank(probed_vecs, short, query_vec, k, id_col, vec_col)
