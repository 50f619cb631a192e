"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side architecture here is the real thing a 100 TB multimodal
corpus needs:
  - assets live as ``binary`` payloads + a typed ``metadata`` struct in
    columnar files (payload column pruned away unless a stage needs it);
  - decode / feature-extract / resize / frame-sample run as mapInPandas
    over Arrow batches — one Python invocation per ~10k-row batch, not
    per row, with the schema contract declared up front;
  - batches are size-bounded via spark.sql.execution.arrow.maxRecordsPerBatch
    so a partition of 4K video blobs can't OOM a worker.

The CODEC KERNELS are deliberately stubbed: the image/audio libraries
are not in this container (and a real deployment would swap in
PIL/ffmpeg/torchvision).  Each kernel either raises NotImplementedError
(``strict=True``) or runs a deterministic fake (default) whose outputs
are derived only from the payload bytes — so the distributed plumbing
(schemas, batching, partitioning, UDF signatures) is fully exercised by
tests while the pixel math is clearly marked fake.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),     # image/video
        StructField("height", IntegerType()),    # image/video
        StructField("sample_rate", IntegerType()),  # audio
        StructField("n_frames", IntegerType()),  # video
    ]
)

DECODED_SCHEMA = (
    "asset_id long, modality string, n_bytes int, mean_byte double, "
    "content_sha256 string"
)

FEATURE_DIM = 16
FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def synth_assets(docs: DataFrame) -> DataFrame:
    """Deterministic fake asset table derived from ``documents`` (the
    container has no media fixtures): payload = repeated sha2 of the
    text, modality round-robins by doc_id.  Real pipelines would read
    (path, bytes) from object storage or a binary-file source."""
    payload = F.repeat(F.sha2(F.col("text"), 256), 4).cast("binary")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        payload.alias("content"),
        (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.col("doc_id") % 300 + 1).cast("int").alias("n_frames"),
    )


def _fake_decode(content: bytes) -> dict:
    """Deterministic stand-in for a real codec: byte stats + digest.
    A real deployment replaces this with PIL.Image.open / soundfile /
    pyav — ONLY this function changes; the Spark plumbing stays."""
    return {
        "n_bytes": len(content),
        "mean_byte": float(sum(content)) / max(len(content), 1),
        "content_sha256": hashlib.sha256(content).hexdigest(),
    }


def decode_assets(assets: DataFrame, strict: bool = False) -> DataFrame:
    """Decode stage as mapInPandas.  strict=True surfaces the stub
    explicitly (NotImplementedError) instead of running the fake."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real codec kernels (PIL/ffmpeg) are not available in this "
                "container — run with strict=False for the deterministic fake"
            )
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                }
            )
            decoded = pdf["content"].map(lambda b: _fake_decode(bytes(b)))
            out["n_bytes"] = decoded.map(lambda d: d["n_bytes"]).astype("int32")
            out["mean_byte"] = decoded.map(lambda d: d["mean_byte"])
            out["content_sha256"] = decoded.map(lambda d: d["content_sha256"])
            yield out

    return assets.select("asset_id", "modality", "content").mapInPandas(
        decode, schema=DECODED_SCHEMA
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Feature-extraction stage (model inference placeholder): maps each
    payload to a FEATURE_DIM float vector.  STUB kernel: md5-seeded
    pseudo-features.  Real deployment: batched model forward pass per
    Arrow batch (exactly this shape — the batch IS the model batch)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for b in pdf["content"]:
                seed = int.from_bytes(hashlib.md5(bytes(b)).digest()[:4], "big")
                rng = np.random.default_rng(seed)
                feats.append(rng.standard_normal(FEATURE_DIM).astype("float32"))
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "feature": [list(f) for f in feats]}
            )

    return assets.select("asset_id", "content").mapInPandas(
        featurize, schema=FEATURE_SCHEMA
    )


def resize_plan(assets: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize stage: computes target dims JVM-side (pure arithmetic —
    no UDF needed for the plan), payload transform stubbed to passthrough
    (real kernel: PIL resize per Arrow batch)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return assets.filter(F.col("modality").isin("image", "video")).select(
        "asset_id",
        "modality",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("target_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_height"),
        F.col("content").alias("resized_content"),  # STUB: passthrough
    )


def sample_frames(assets: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling stage for video: explodes frame indices JVM-side
    (sequence + explode — scales without Python), frame payload stubbed
    to a sliced digest of the container bytes."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)
    )
    return (
        assets.filter(F.col("modality") == "video")
        .select("asset_id", "n_frames", F.explode(frames).alias("frame_idx"))
    )
