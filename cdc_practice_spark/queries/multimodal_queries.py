"""Multimodal queries under the oracle gate.

Tiers of realness:
  - ``multimodal_image_decode`` runs a REAL pixel decoder (PIL when
    importable, a numpy BMP parser otherwise) over valid 24-bit BMP
    binaries synthesized from a deterministic pixel formula — so the
    oracle recomputes every pixel in SQL and hash-checks actual decoded
    image statistics, not byte stats.
  - ``multimodal_audio_decode`` does the same for audio: valid 16-bit
    PCM WAV binaries, decoded by soundfile or the numpy RIFF chunk
    walker; the oracle recomputes every sample.
  - ``multimodal_video_decode`` completes the set: valid uncompressed
    AVI containers, demuxed to per-frame pixel arrays by the numpy RIFF
    walker; the oracle recomputes every pixel of every frame.
  - ``multimodal_decode_stats`` keeps the generic byte-stats kernel (the
    fallback tier for codecs that DO need external libs — e.g. JPEG/
    H.264); its oracle reproduces the same byte math in SQL.

``multimodal_resize_plan`` / ``multimodal_frame_sample`` oracle-check the
JVM-side geometry/sampling stages (pure arithmetic + sequence/explode —
no Python in those plans at all).

Float note: each asset's mean_byte is sum(ascii)/256 — an exact multiple
of 2⁻⁸ — so sums/averages are bit-exact regardless of aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_practice_spark.operators.multimodal import (
    decode_assets,
    decode_images,
    resize_plan,
    sample_frames,
    synth_assets,
    synth_image_assets,
    synth_png_assets,
)
from cdc_practice_spark.queries.registry import register
from cdc_practice_spark.session import load_table

_SYNTH_META_SQL = """
  SELECT doc_id AS asset_id,
         (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INTEGER) + 1] AS modality,
         CAST(doc_id % 640 + 1 AS INTEGER) AS width,
         CAST(doc_id % 480 + 1 AS INTEGER) AS height,
         CAST(doc_id % 300 + 1 AS INTEGER) AS n_frames
  FROM documents
"""


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


@register(
    "multimodal_image_decode",
    oracle="""
WITH dims AS (
  SELECT doc_id AS asset_id,
         CAST(doc_id % 8 + 2 AS INTEGER) AS width,
         CAST(doc_id % 6 + 2 AS INTEGER) AS height
  FROM documents
),
grid AS (
  SELECT x.g AS x, y.g AS y, c.g AS c
  FROM (SELECT unnest(generate_series(0, 8)) AS g) x,
       (SELECT unnest(generate_series(0, 6)) AS g) y,
       (SELECT unnest(generate_series(0, 2)) AS g) c
)
SELECT d.asset_id, d.width, d.height,
       round(avg((d.asset_id + 7 * g.x + 13 * g.y + 31 * g.c) % 256), 6)
         AS mean_pixel
FROM dims d
JOIN grid g ON g.x < d.width AND g.y < d.height
GROUP BY d.asset_id, d.width, d.height
""",
)
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode under the oracle gate: valid BMP binaries in,
    actual pixel arrays out (PIL or the numpy BMP parser —
    operators/multimodal.py:decode_images).  The oracle recomputes every
    pixel from the synthesis formula, so a wrong stride, padding, BGR
    swap, or row order in the decoder fails the hash."""
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_images(synth_image_assets(docs))
    return decoded.select(
        "asset_id", "width", "height", F.round("mean_pixel", 6).alias("mean_pixel")
    )


@register(
    "multimodal_image_decode_png",
    oracle="""
WITH dims AS (
  SELECT doc_id AS asset_id,
         CAST(doc_id % 9 + 2 AS INTEGER) AS width,
         CAST(doc_id % 5 + 2 AS INTEGER) AS height
  FROM documents
),
grid AS (
  SELECT x.g AS x, y.g AS y, c.g AS c
  FROM (SELECT unnest(generate_series(0, 10)) AS g) x,
       (SELECT unnest(generate_series(0, 6)) AS g) y,
       (SELECT unnest(generate_series(0, 2)) AS g) c
)
SELECT d.asset_id, d.width, d.height,
       round(avg((d.asset_id + 7 * g.x + 13 * g.y + 31 * g.c) % 256), 6)
         AS mean_pixel
FROM dims d
JOIN grid g ON g.x < d.width AND g.y < d.height
GROUP BY d.asset_id, d.width, d.height
""",
)
def multimodal_image_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL *compressed* codec under the oracle gate: valid zlib-DEFLATE
    PNGs in (every filter type exercised — synth cycles None/Sub/Up/
    Average/Paeth per row), actual decompressed pixel arrays out via the
    numpy+zlib inflate+unfilter kernel (operators/multimodal.py:
    decode_png_numpy, CRC-verified chunk walk).  The oracle recomputes
    every pixel from the synthesis formula, so a wrong predictor,
    filter-byte offset, stride, or inflate windowing fails the hash."""
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_images(synth_png_assets(docs))
    return decoded.select(
        "asset_id", "width", "height", F.round("mean_pixel", 6).alias("mean_pixel")
    )


@register(
    "multimodal_resize_plan",
    oracle=f"""
WITH assets AS ({_SYNTH_META_SQL})
SELECT asset_id, modality, width, height,
       CAST(ceil(width * least(1.0, 256.0 / greatest(width, height)))
            AS INTEGER) AS target_width,
       CAST(ceil(height * least(1.0, 256.0 / greatest(width, height)))
            AS INTEGER) AS target_height
FROM assets
WHERE modality IN ('image', 'video')
""",
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize geometry stage (aspect-preserving fit into 256×256):
    computed entirely JVM-side — no UDF — so the 100 TB plan is a pure
    projection over the metadata columns with the payload pruned away."""
    docs = load_table(spark, sf_dir, "documents")
    return resize_plan(synth_assets(docs), max_side=256).drop("resized_content")


@register(
    "multimodal_frame_sample",
    oracle=f"""
WITH assets AS ({_SYNTH_META_SQL})
SELECT asset_id, n_frames,
       unnest(generate_series(0, greatest(n_frames - 1, 0), 30)) AS frame_idx
FROM assets
WHERE modality = 'video'
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling stage: every-30th frame index per video via
    sequence+explode — output size proportional to sampled frames, no
    Python, no per-frame rows materialized before the explode."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(synth_assets(docs), every_n=30)


@register(
    "multimodal_audio_decode",
    oracle="""
WITH dims AS (
  SELECT doc_id AS asset_id, CAST(doc_id % 480 + 20 AS INTEGER) AS n
  FROM documents
),
s AS (
  SELECT asset_id, n,
         CAST((asset_id * 31 + u.i * 17) % 65536 - 32768 AS DOUBLE) AS v
  FROM dims, unnest(generate_series(0, n - 1)) AS u(i)
)
SELECT asset_id,
       CAST(16000 AS INTEGER) AS sample_rate,
       CAST(n AS INTEGER) AS n_samples,
       round(avg(v), 6) AS mean_amp,
       round(sqrt(avg(v * v)), 6) AS rms
FROM s
GROUP BY asset_id, n
""",
)
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode under the oracle gate: valid 16-bit PCM WAV
    binaries in, actual int16 sample arrays out (soundfile or the numpy
    RIFF chunk walker — operators/multimodal.py:decode_audio).  The
    oracle recomputes every sample from the synthesis formula, so a
    wrong chunk offset, endianness, or word-alignment in the parser
    fails the hash."""
    from cdc_practice_spark.operators.multimodal import (
        decode_audio,
        synth_audio_assets,
    )

    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_audio(synth_audio_assets(docs))
    return decoded.select(
        "asset_id",
        "sample_rate",
        "n_samples",
        F.round("mean_amp", 6).alias("mean_amp"),
        F.round("rms", 6).alias("rms"),
    )


@register(
    "multimodal_video_decode",
    oracle="""
WITH dims AS (
  SELECT doc_id AS asset_id,
         CAST(doc_id % 6 + 2 AS INTEGER) AS width,
         CAST(doc_id % 4 + 2 AS INTEGER) AS height,
         CAST(doc_id % 5 + 1 AS INTEGER) AS nf
  FROM documents
),
frames AS (
  SELECT asset_id, width, height, CAST(u.f AS INTEGER) AS frame_idx
  FROM dims, unnest(generate_series(0, nf - 1)) AS u(f)
),
grid AS (
  SELECT x.g AS x, y.g AS y, c.g AS c
  FROM (SELECT unnest(generate_series(0, 7)) AS g) x,
       (SELECT unnest(generate_series(0, 5)) AS g) y,
       (SELECT unnest(generate_series(0, 2)) AS g) c
)
SELECT f.asset_id, f.frame_idx, f.width, f.height,
       round(avg((f.asset_id + 7 * g.x + 13 * g.y + 31 * g.c
                  + 97 * f.frame_idx) % 256), 6) AS mean_pixel
FROM frames f
JOIN grid g ON g.x < f.width AND g.y < f.height
GROUP BY f.asset_id, f.frame_idx, f.width, f.height
""",
)
def multimodal_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode under the oracle gate: valid uncompressed AVI
    containers in, demuxed per-frame pixel arrays out
    (operators/multimodal.py:decode_avi_numpy — RIFF chunk walk, DIB
    frame decode).  One output row per frame; the oracle recomputes
    every pixel of every frame from the synthesis formula, so a wrong
    chunk walk, frame order, stride, or BGR swap fails the hash."""
    from cdc_practice_spark.operators.multimodal import (
        decode_video,
        synth_video_assets,
    )

    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_video(synth_video_assets(docs))
    return decoded.select(
        "asset_id",
        "frame_idx",
        "width",
        "height",
        F.round("mean_pixel", 6).alias("mean_pixel"),
    )


@register(
    "multimodal_image_decode_gif",
    oracle="""
WITH dims AS (
  SELECT doc_id AS asset_id,
         CAST(doc_id % 7 + 2 AS INTEGER) AS width,
         CAST(doc_id % 4 + 2 AS INTEGER) AS height
  FROM documents
),
grid AS (
  SELECT x.g AS x, y.g AS y
  FROM (SELECT unnest(generate_series(0, 8)) AS g) x,
       (SELECT unnest(generate_series(0, 5)) AS g) y
)
SELECT d.asset_id, d.width, d.height,
       round(avg((d.asset_id + 7 * g.x + 13 * g.y) % 256), 6) AS mean_pixel
FROM dims d
JOIN grid g ON g.x < d.width AND g.y < d.height
GROUP BY d.asset_id, d.width, d.height
""",
)
def multimodal_image_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed codec #2 under the oracle gate: valid GIF87a in
    (palette-indexed, genuine LZW streams), decoded pixels out via the
    in-repo variable-width LZW kernel (operators/multimodal.py:
    decode_gif_numpy — sub-block reassembly, dictionary growth, KwKwK).
    The grayscale palette makes mean RGB == mean index, which the oracle
    recomputes from the synthesis formula — any bit-packing, width-bump,
    or dictionary drift fails the hash."""
    from cdc_practice_spark.operators.multimodal import synth_gif_assets

    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_images(synth_gif_assets(docs))
    return decoded.select(
        "asset_id", "width", "height", F.round("mean_pixel", 6).alias("mean_pixel")
    )


@register(
    "multimodal_image_decode_jpeg",
    oracle="""
WITH dims AS (
  SELECT doc_id AS asset_id,
         CAST(doc_id % 9 + 10 AS INTEGER) AS width,
         CAST(doc_id % 5 + 9 AS INTEGER) AS height
  FROM documents
),
grid AS (
  SELECT x.g AS x, y.g AS y
  FROM (SELECT unnest(generate_series(0, 17)) AS g) x,
       (SELECT unnest(generate_series(0, 12)) AS g) y
)
SELECT d.asset_id, d.width, d.height,
       round(avg((d.asset_id + 7 * (g.x // 8) + 13 * (g.y // 8)) % 256), 6)
         AS mean_pixel
FROM dims d
JOIN grid g ON g.x < d.width AND g.y < d.height
GROUP BY d.asset_id, d.width, d.height
""",
)
def multimodal_image_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed codec #3 under the oracle gate: valid baseline
    JFIF grayscale JPEGs in (canonical Huffman entropy coding, zigzag
    run-length AC coding, DC prediction across a multi-block grid),
    decoded pixels out via the in-repo huffman+IDCT kernel
    (operators/multimodal.py:decode_jpeg_numpy).  The synth tiles each
    8×8 block with a constant — DC-only blocks round-trip bit-exactly
    under the flat quant table — so the oracle recomputes every decoded
    pixel as value(x//8, y//8); a wrong zigzag, extend(), DC predictor,
    IDCT scale, or block-crop fails the hash.  Non-constant AC paths
    are pinned by tests/test_multimodal_jpeg.py against an independent
    double-loop IDCT."""
    from cdc_practice_spark.operators.multimodal import synth_jpeg_assets

    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_images(synth_jpeg_assets(docs))
    return decoded.select(
        "asset_id", "width", "height", F.round("mean_pixel", 6).alias("mean_pixel")
    )


@register(
    "multimodal_audio_spectral",
    oracle="""
WITH dims AS (
  SELECT doc_id AS asset_id, CAST(doc_id % 480 + 20 AS INTEGER) AS n
  FROM documents
),
e AS (
  SELECT d.asset_id, d.n,
         CAST(sum(power((d.asset_id * 31 + i.g * 17) % 65536 - 32768, 2))
              AS BIGINT) AS energy_time
  FROM dims d
  JOIN (SELECT unnest(generate_series(0, 499)) AS g) i ON i.g < d.n
  GROUP BY d.asset_id, d.n
)
SELECT asset_id, n AS n_samples, energy_time,
       CAST(n // 2 + 1 AS INTEGER) AS n_bins,
       TRUE AS parseval_ok
FROM e
""",
)
def multimodal_audio_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio FEATURE EXTRACTION beyond decode: numpy rFFT spectral
    energy per asset (operators/multimodal.py::spectral_features).  The
    FFT is not SQL-expressible, but the PARSEVAL IDENTITY is the
    checkable contract: time-domain energy (exact integer, recomputed by
    the oracle from the synthesis formula) must equal folded spectral
    energy / N — emitted as a boolean both engines agree on.  Arrow-
    batched mapInPandas; payload column pruned for every other query."""
    from cdc_practice_spark.operators.multimodal import (
        spectral_features,
        synth_audio_assets,
    )

    docs = load_table(spark, sf_dir, "documents")
    return spectral_features(synth_audio_assets(docs))


@register(
    "multimodal_phash_near_dup",
    oracle="""
WITH dims AS (
  SELECT doc_id AS asset_id,
         CAST(doc_id % 8 + 2 AS INTEGER) AS w,
         CAST(doc_id % 6 + 2 AS INTEGER) AS h
  FROM documents
),
px AS (
  SELECT d.asset_id, d.w, d.h,
         ((d.asset_id + 7 * x.g + 13 * y.g) % 256
          + (d.asset_id + 7 * x.g + 13 * y.g + 31) % 256
          + (d.asset_id + 7 * x.g + 13 * y.g + 62) % 256) AS gray,
         CAST((x.g * 4) // d.w AS INTEGER) AS bi,
         CAST((y.g * 4) // d.h AS INTEGER) AS bj
  FROM dims d
  JOIN (SELECT unnest(generate_series(0, 8)) AS g) x ON x.g < d.w
  JOIN (SELECT unnest(generate_series(0, 6)) AS g) y ON y.g < d.h
),
blocks AS (
  SELECT asset_id, w, h, bi, bj,
         CAST(sum(gray) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS c
  FROM px GROUP BY asset_id, w, h, bi, bj
),
tot AS (
  SELECT asset_id, CAST(sum(s) AS BIGINT) AS ts, CAST(sum(c) AS BIGINT) AS tc
  FROM blocks GROUP BY asset_id
),
hashes AS (
  SELECT b.asset_id, b.w, b.h,
         CAST(sum(CASE WHEN b.s * t.tc > t.ts * b.c
                       THEN 1 << (b.bi * 4 + b.bj) ELSE 0 END) AS BIGINT)
           AS phash
  FROM blocks b JOIN tot t USING (asset_id)
  GROUP BY b.asset_id, b.w, b.h
),
pairs AS (
  SELECT a.w AS width, a.h AS height,
         CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hd
  FROM hashes a
  JOIN hashes b ON a.w = b.w AND a.h = b.h AND a.asset_id < b.asset_id
  WHERE bit_count(xor(a.phash, b.phash)) <= 2
)
SELECT width, height,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(hd) AS BIGINT) AS sum_hamming
FROM pairs
GROUP BY width, height
""",
)
def multimodal_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate IMAGE detection — the multimodal face of the dedup
    tier: REAL BMP pixel decode → integer block-hash (4×4 block means vs
    image mean, cross-multiplied, no floats) → banded candidate join
    (pigeonhole: ≤2 bit errors leave ≥2 of 4 bands exact) → exact
    bit_count verify, aggregated per dimension class.  The oracle
    recomputes every pixel, every block bit, and every qualifying pair
    from the deterministic pixel formula in pure SQL — a single wrong
    pixel, bit, or missed candidate hash-fails."""
    from cdc_practice_spark.operators.multimodal import (
        phash_images,
        phash_near_pairs,
        synth_image_assets,
    )

    docs = load_table(spark, sf_dir, "documents")
    hashes = phash_images(synth_image_assets(docs))
    pairs = phash_near_pairs(hashes, max_hamming=2)
    return pairs.groupBy("width", "height").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("hamming").cast("long").alias("sum_hamming"),
    )


@register(
    "multimodal_audio_near_dup",
    oracle="""
WITH lens AS (
  SELECT doc_id AS asset_id,
         CAST(doc_id % 480 + 20 AS INTEGER) AS n
  FROM documents
),
sm AS (
  SELECT l.asset_id, l.n,
         ((l.asset_id * 31 + i.g * 17) % 65536 - 32768) AS s,
         CAST((i.g * 16) // l.n AS INTEGER) AS f
  FROM lens l
  JOIN (SELECT unnest(generate_series(0, 499)) AS g) i ON i.g < l.n
),
frames AS (
  SELECT asset_id, n, f,
         CAST(sum(s * s) AS BIGINT) AS e, CAST(count(*) AS BIGINT) AS c
  FROM sm GROUP BY asset_id, n, f
),
tot AS (
  SELECT asset_id, CAST(sum(e) AS BIGINT) AS te, CAST(sum(c) AS BIGINT) AS tc
  FROM frames GROUP BY asset_id
),
hashes AS (
  SELECT fr.asset_id, fr.n,
         CAST(sum(CASE WHEN fr.e * t.tc > t.te * fr.c
                       THEN 1 << fr.f ELSE 0 END) AS BIGINT) AS ahash
  FROM frames fr JOIN tot t USING (asset_id)
  GROUP BY fr.asset_id, fr.n
),
pairs AS (
  SELECT a.n AS n_samples,
         CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hd
  FROM hashes a
  JOIN hashes b ON a.n = b.n AND a.asset_id < b.asset_id
  WHERE bit_count(xor(a.ahash, b.ahash)) <= 2
)
SELECT n_samples,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(hd) AS BIGINT) AS sum_hamming
FROM pairs
GROUP BY n_samples
""",
)
def multimodal_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate AUDIO detection — the energy-envelope twin of the
    image perceptual hash: REAL PCM decode → 16-frame integer energy
    fingerprint (frame energy vs track mean, cross-multiplied — no
    floats) → 4-band pigeonhole candidates blocked on track length →
    exact bit_count verify, aggregated per length class.  The oracle
    recomputes every sample, every frame bit, and every qualifying pair
    from the deterministic sample formula in pure SQL."""
    from cdc_practice_spark.operators.multimodal import (
        ahash_audio,
        phash_near_pairs,
        synth_audio_assets,
    )

    docs = load_table(spark, sf_dir, "documents")
    hashes = ahash_audio(synth_audio_assets(docs))
    pairs = phash_near_pairs(
        hashes, max_hamming=2, key_cols=("n_samples",), hash_col="ahash"
    )
    return pairs.groupBy("n_samples").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("hamming").cast("long").alias("sum_hamming"),
    )


@register(
    "multimodal_video_near_dup",
    oracle="""
WITH dims AS (
  SELECT doc_id AS asset_id,
         CAST(doc_id % 6 + 2 AS INTEGER) AS w,
         CAST(doc_id % 4 + 2 AS INTEGER) AS h,
         CAST(doc_id % 5 + 1 AS INTEGER) AS nf
  FROM documents
),
tg AS (
  SELECT d.asset_id, d.w, d.h, d.nf, x.g AS x, y.g AS y,
         CAST(sum((d.asset_id + 7 * x.g + 13 * y.g + 97 * f.g) % 256
              + (d.asset_id + 7 * x.g + 13 * y.g + 97 * f.g + 31) % 256
              + (d.asset_id + 7 * x.g + 13 * y.g + 97 * f.g + 62) % 256)
           AS BIGINT) AS gray,
         CAST((x.g * 4) // d.w AS INTEGER) AS bi,
         CAST((y.g * 4) // d.h AS INTEGER) AS bj
  FROM dims d
  JOIN (SELECT unnest(generate_series(0, 7)) AS g) x ON x.g < d.w
  JOIN (SELECT unnest(generate_series(0, 5)) AS g) y ON y.g < d.h
  JOIN (SELECT unnest(generate_series(0, 4)) AS g) f ON f.g < d.nf
  GROUP BY d.asset_id, d.w, d.h, d.nf, x.g, y.g
),
blocks AS (
  SELECT asset_id, w, h, nf, bi, bj,
         CAST(sum(gray) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS c
  FROM tg GROUP BY asset_id, w, h, nf, bi, bj
),
tot AS (
  SELECT asset_id, CAST(sum(s) AS BIGINT) AS ts, CAST(sum(c) AS BIGINT) AS tc
  FROM blocks GROUP BY asset_id
),
hashes AS (
  SELECT b.asset_id, b.w, b.h, b.nf,
         CAST(sum(CASE WHEN b.s * t.tc > t.ts * b.c
                       THEN 1 << (b.bi * 4 + b.bj) ELSE 0 END) AS BIGINT)
           AS vhash
  FROM blocks b JOIN tot t USING (asset_id)
  GROUP BY b.asset_id, b.w, b.h, b.nf
),
pairs AS (
  SELECT a.w AS width, a.h AS height, a.nf AS n_frames,
         CAST(bit_count(xor(a.vhash, b.vhash)) AS BIGINT) AS hd
  FROM hashes a
  JOIN hashes b
    ON a.w = b.w AND a.h = b.h AND a.nf = b.nf AND a.asset_id < b.asset_id
  WHERE bit_count(xor(a.vhash, b.vhash)) <= 2
)
SELECT width, height, n_frames,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(hd) AS BIGINT) AS sum_hamming
FROM pairs
GROUP BY width, height, n_frames
""",
)
def multimodal_video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate VIDEO detection completing the modality triple:
    REAL AVI demux + frame decode → spatial block-hash of the
    temporal-sum grayscale (integer cross-multiplied bits) → 4-band
    pigeonhole candidates blocked on (dims, frame count) → exact
    bit_count verify, per shape class.  The oracle recomputes every
    pixel of every frame from the deterministic formula in SQL."""
    from cdc_practice_spark.operators.multimodal import (
        phash_near_pairs,
        synth_video_assets,
        vhash_videos,
    )

    docs = load_table(spark, sf_dir, "documents")
    hashes = vhash_videos(synth_video_assets(docs))
    pairs = phash_near_pairs(
        hashes,
        max_hamming=2,
        key_cols=("width", "height", "n_frames"),
        hash_col="vhash",
    )
    return pairs.groupBy("width", "height", "n_frames").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("hamming").cast("long").alias("sum_hamming"),
    )
