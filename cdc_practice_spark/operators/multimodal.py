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

Codec realness, per modality:
  - IMAGE: a REAL decode path exists and is oracle-verified — valid
    24-bit BMP payloads (public spec) decoded to pixel arrays by PIL
    when importable, else by the numpy BMP parser below (identical RGB
    output for BMP input).  See synth_bmp / decode_bmp_numpy /
    decode_images.
  - AUDIO: also REAL and oracle-verified — valid mono 16-bit PCM WAV
    payloads (RIFF spec) decoded by soundfile when importable, else by
    the numpy chunk walker below.  See synth_wav / decode_wav_numpy /
    decode_audio.
  - VIDEO: REAL and oracle-verified too — valid uncompressed ('DIB ')
    AVI containers (RIFF spec) demuxed by the numpy chunk walker below
    into per-frame pixel arrays.  See synth_avi / decode_avi_numpy /
    decode_video.
  - COMPRESSED codecs: PNG (DEFLATE + filters), GIF87a (variable-width
    LZW), and baseline JPEG (canonical Huffman + zigzag RLE + 8×8 IDCT)
    are REAL in-repo kernels, oracle-verified pixel-exact.  Codecs that
    genuinely need external libs (H.264/opus/MP4-class) keep the
    generic byte-stats kernel (decode_assets) as the clearly-marked
    deterministic stand-in — it either raises NotImplementedError
    (``strict=True``) or derives outputs only from the payload bytes,
    exercising the distributed plumbing (schemas, batching,
    partitioning, UDF signatures) end-to-end.
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


# ---------------------------------------------------------------------------
# REAL image path: valid BMP payloads + a real pixel decoder.
#
# The container has no media libraries, but the 24-bit BMP format (public
# spec: BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up BGR rows padded to
# 4 bytes) is simple enough to both WRITE and DECODE without them — so the
# engine carries a genuinely real decode kernel: PIL when importable
# (arbitrary formats), a numpy BMP parser otherwise.  Same query, real
# pixels, either way.  Only non-image modalities still use _fake_decode.
# ---------------------------------------------------------------------------


def _pil_image_module():
    try:
        from PIL import Image  # optional — not in this container

        return Image
    except ImportError:
        return None


def synth_bmp(asset_id: int, width: int, height: int) -> bytes:
    """A valid 24-bit BMP whose pixel (x, y, channel c∈{R,G,B}) equals
    ``(asset_id + 7x + 13y + 31c) % 256`` — deterministic, so an oracle
    can recompute every pixel without parsing the binary."""
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    image_size = (row_bytes + pad) * height
    header = (
        b"BM"
        + (54 + image_size).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + width.to_bytes(4, "little")
        + height.to_bytes(4, "little")  # positive → bottom-up rows
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + image_size.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        row = bytearray()
        for x in range(width):
            r = (asset_id + 7 * x + 13 * y) % 256
            g = (asset_id + 7 * x + 13 * y + 31) % 256
            b = (asset_id + 7 * x + 13 * y + 62) % 256
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * pad
        rows.append(bytes(row))
    return header + b"".join(rows)


def decode_bmp_numpy(data: bytes):
    """Real BMP decode with numpy only: returns (width, height,
    ndarray[h, w, 3] in RGB order).  Raises ValueError on anything that
    isn't an uncompressed 24-bit BMP."""
    import numpy as np

    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = int.from_bytes(data[10:14], "little")
    width = int.from_bytes(data[18:22], "little", signed=True)
    height = int.from_bytes(data[22:26], "little", signed=True)
    bits = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if bits != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant: {bits}-bit/c{compression}")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * height, offset=offset)
    rows = raw.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return width, height, rows[:, :, ::-1]  # BGR → RGB


def synth_image_assets(docs: DataFrame) -> DataFrame:
    """Real binary image fixtures: one small BMP per document, dims
    derived from doc_id (width = id%8+2, height = id%6+2).  Runs as
    mapInPandas — fixture synthesis is distributed like any other
    stage."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            w = (ids % 8 + 2).astype("int32")
            h = (ids % 6 + 2).astype("int32")
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "width": w,
                    "height": h,
                    "content": [
                        synth_bmp(int(i), int(wi), int(hi))
                        for i, wi, hi in zip(ids, w, h)
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(
        gen, schema="asset_id long, width int, height int, content binary"
    )


IMAGE_DECODED_SCHEMA = (
    "asset_id long, width int, height int, mean_pixel double"
)


def decode_images(assets: DataFrame) -> DataFrame:
    """REAL pixel decode as mapInPandas: PIL if importable, else the
    numpy BMP parser — both produce identical RGB arrays for BMP input,
    so the query result is environment-independent.  Output: decoded
    dims (from the payload, NOT the metadata columns) + mean pixel."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        Image = _pil_image_module()

        def one(b: bytes):
            if b[:8] == PNG_SIGNATURE:
                # always the in-repo inflate+unfilter kernel for PNG —
                # CRC-checked and bit-exact, so the result can't vary
                # with whatever PIL build happens to be installed
                return decode_png_numpy(b)
            if b[:6] in GIF_SIGNATURES:
                # same policy for GIF: the in-repo LZW kernel
                return decode_gif_numpy(b)
            if b[:2] == JPEG_SOI:
                # and for JPEG: the in-repo baseline huffman+IDCT kernel
                return decode_jpeg_numpy(b)
            if Image is not None:
                import io

                with Image.open(io.BytesIO(b)) as im:
                    arr = np.asarray(im.convert("RGB"))
                return arr.shape[1], arr.shape[0], arr
            return decode_bmp_numpy(b)

        for pdf in batches:
            w, h, mean = [], [], []
            for b in pdf["content"]:
                wi, hi, arr = one(bytes(b))
                w.append(wi)
                h.append(hi)
                mean.append(float(arr.astype(np.float64).mean()))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": pd.Series(w, dtype="int32"),
                    "height": pd.Series(h, dtype="int32"),
                    "mean_pixel": mean,
                }
            )

    return assets.select("asset_id", "content").mapInPandas(
        decode, schema=IMAGE_DECODED_SCHEMA
    )


# ---------------------------------------------------------------------------
# REAL compressed codec: PNG (RFC 2083), encode + decode with numpy+zlib
# only.  This upgrades the compressed-codec story from "stub" to "real"
# for one format: IDAT is genuinely DEFLATE-compressed, scanlines are
# genuinely filtered (the synthesizer cycles through all five PNG filter
# types — None/Sub/Up/Average/Paeth — so the decoder's unfilter kernel is
# fully exercised), and every chunk CRC is verified on read.  The pixel
# formula matches the BMP tier, so the same closed-form SQL oracle
# recomputes every pixel of the *decompressed* output.
# ---------------------------------------------------------------------------

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        len(body).to_bytes(4, "big")
        + ctype
        + body
        + (zlib.crc32(ctype + body) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def synth_png(asset_id: int, width: int, height: int) -> bytes:
    """A valid 8-bit RGB PNG whose pixel (x, y, c) equals
    ``(asset_id + 7x + 13y + 31c) % 256`` — same formula as synth_bmp, so
    the oracle recomputes every pixel without parsing the binary.  Row y
    uses filter type ``y % 5``, so a round-trip exercises every PNG
    filter; IDAT is real zlib DEFLATE output."""
    import zlib

    import numpy as np

    ys, xs, cs = np.meshgrid(
        np.arange(height), np.arange(width), np.arange(3), indexing="ij"
    )
    px = ((asset_id + 7 * xs + 13 * ys + 31 * cs) % 256).astype(np.int16)
    bpp = 3
    out = bytearray()
    prior = np.zeros(width * bpp, dtype=np.int16)
    for y in range(height):
        raw = px[y].reshape(-1)  # int16 row, RGB byte order
        ftype = y % 5
        left = np.concatenate([np.zeros(bpp, dtype=np.int16), raw[:-bpp]])
        if ftype == 0:
            filt = raw
        elif ftype == 1:  # Sub
            filt = raw - left
        elif ftype == 2:  # Up
            filt = raw - prior
        elif ftype == 3:  # Average
            filt = raw - (left + prior) // 2
        else:  # Paeth
            prior_left = np.concatenate(
                [np.zeros(bpp, dtype=np.int16), prior[:-bpp]]
            )
            filt = raw - np.array(
                [
                    _paeth(int(a), int(b), int(c))
                    for a, b, c in zip(left, prior, prior_left)
                ],
                dtype=np.int16,
            )
        out.append(ftype)
        out += (filt % 256).astype(np.uint8).tobytes()
        prior = raw
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes((8, 2, 0, 0, 0))  # bit depth 8, color type 2 (RGB)
    )
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_numpy(data: bytes):
    """Real PNG decode with numpy+zlib only: chunk walk (CRC-verified),
    IDAT inflate, scanline unfilter for all five filter types.  Returns
    (width, height, ndarray[h, w, 3] RGB).  Supports the 8-bit RGB
    non-interlaced profile it synthesizes; raises ValueError otherwise —
    the honest boundary for codecs that truly need external libs (JPEG,
    H.264) is documented in decode_assets."""
    import zlib

    import numpy as np

    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    pos, width, height, idat = 8, None, None, bytearray()
    while pos + 8 <= len(data):
        clen = int.from_bytes(data[pos : pos + 4], "big")
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        crc = int.from_bytes(data[pos + 8 + clen : pos + 12 + clen], "big")
        if (zlib.crc32(ctype + body) & 0xFFFFFFFF) != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width = int.from_bytes(body[0:4], "big")
            height = int.from_bytes(body[4:8], "big")
            depth, color, interlace = body[8], body[9], body[12]
            if (depth, color, interlace) != (8, 2, 0):
                raise ValueError(
                    f"unsupported PNG profile: depth={depth} color={color} "
                    f"interlace={interlace}"
                )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp, stride = 3, width * 3
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG IDAT length mismatch")
    img = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up — no left dependency, fully vectorized
            rec = (line + prior) % 256
        elif ftype in (1, 3, 4):  # left-dependent: sequential per pixel
            rec = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    pred = _paeth(a, b, c)
                rec[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        img[y] = rec.astype(np.uint8)
        prior = rec
    return width, height, img.reshape(height, width, 3)


def synth_png_assets(docs: DataFrame) -> DataFrame:
    """One small PNG per document, dims derived from doc_id
    (width = id%9+2, height = id%5+2) — deliberately different from the
    BMP dims so the two image tiers can't mask each other."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            w = (ids % 9 + 2).astype("int32")
            h = (ids % 5 + 2).astype("int32")
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "width": w,
                    "height": h,
                    "content": [
                        synth_png(int(i), int(wi), int(hi))
                        for i, wi, hi in zip(ids, w, h)
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(
        gen, schema="asset_id long, width int, height int, content binary"
    )


# ---------------------------------------------------------------------------
# REAL audio path: valid 16-bit PCM WAV payloads + a real chunk parser.
# Same recipe as the BMP tier: the RIFF/WAVE format (public spec) is
# simple enough to write AND parse without media libraries, so the audio
# decode kernel is real too — soundfile when importable, the numpy chunk
# walker below otherwise.  Samples follow a deterministic formula, so the
# oracle recomputes the decoded statistics from first principles.
# ---------------------------------------------------------------------------


def _soundfile_module():
    try:
        import soundfile  # optional — not in this container

        return soundfile
    except ImportError:
        return None


def synth_wav(asset_id: int, n_samples: int, sample_rate: int = 16000) -> bytes:
    """A valid mono 16-bit PCM WAV whose sample i equals
    ``((asset_id * 31 + i * 17) % 65536) - 32768``."""
    import numpy as np

    i = np.arange(n_samples, dtype=np.int64)
    samples = ((asset_id * 31 + i * 17) % 65536 - 32768).astype("<i2")
    data = samples.tobytes()
    hdr = (
        b"RIFF"
        + (36 + len(data)).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")            # PCM
        + (1).to_bytes(2, "little")            # mono
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * 2).to_bytes(4, "little")  # byte rate
        + (2).to_bytes(2, "little")            # block align
        + (16).to_bytes(2, "little")           # bits/sample
        + b"data"
        + len(data).to_bytes(4, "little")
    )
    return hdr + data


def decode_wav_numpy(data: bytes):
    """Real WAV decode with numpy only: walks RIFF chunks, returns
    (sample_rate, ndarray[int16]).  Raises ValueError on non-PCM-16."""
    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(f"unsupported WAV variant: fmt{fmt}/{channels}ch/{bits}b")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


def synth_audio_assets(docs: DataFrame) -> DataFrame:
    """Real binary audio fixtures: one short WAV per document,
    n_samples = doc_id % 480 + 20 at 16 kHz."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            ns = (ids % 480 + 20).astype("int32")
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "n_samples": ns,
                    "content": [
                        synth_wav(int(i), int(n)) for i, n in zip(ids, ns)
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(
        gen, schema="asset_id long, n_samples int, content binary"
    )


AUDIO_DECODED_SCHEMA = (
    "asset_id long, sample_rate int, n_samples int, mean_amp double, rms double"
)


def decode_audio(assets: DataFrame) -> DataFrame:
    """REAL audio decode as mapInPandas: soundfile if importable, else
    the numpy RIFF parser — identical int16 samples for PCM WAV input.
    Output: rate + sample count (from the payload) + amplitude stats."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        sf_mod = _soundfile_module()

        def one(b: bytes):
            if sf_mod is not None:
                import io

                samples, rate = sf_mod.read(io.BytesIO(b), dtype="int16")
                return rate, np.asarray(samples)
            return decode_wav_numpy(b)

        for pdf in batches:
            rate, n, mean, rms = [], [], [], []
            for b in pdf["content"]:
                r, s = one(bytes(b))
                sf64 = s.astype(np.float64)
                rate.append(r)
                n.append(len(s))
                mean.append(float(sf64.mean()))
                rms.append(float(np.sqrt((sf64 * sf64).mean())))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "sample_rate": pd.Series(rate, dtype="int32"),
                    "n_samples": pd.Series(n, dtype="int32"),
                    "mean_amp": mean,
                    "rms": rms,
                }
            )

    return assets.select("asset_id", "content").mapInPandas(
        decode, schema=AUDIO_DECODED_SCHEMA
    )


# ---------------------------------------------------------------------------
# REAL video path: valid uncompressed AVI containers + a real demuxer.
# Same recipe again: an AVI with the 'DIB ' (uncompressed device-
# independent bitmap) codec is pure RIFF structure — writable and
# demuxable without ffmpeg.  Frames are BMP-style pixel arrays
# (bottom-up BGR, 4-byte row padding) following a per-frame formula, so
# the oracle recomputes every pixel of every frame.
# ---------------------------------------------------------------------------


def _frame_pixels(asset_id: int, width: int, height: int, frame: int) -> bytes:
    """One DIB frame: v(x,y,c∈{R,G,B}) = (id + 7x + 13y + 31c + 97f) % 256,
    stored bottom-up BGR with rows padded to 4 bytes."""
    pad = (4 - (width * 3) % 4) % 4
    rows = []
    for y in range(height - 1, -1, -1):
        row = bytearray()
        for x in range(width):
            base = asset_id + 7 * x + 13 * y + 97 * frame
            row += bytes(((base + 62) % 256, (base + 31) % 256, base % 256))
        row += b"\x00" * pad
        rows.append(bytes(row))
    return b"".join(rows)


def synth_avi(asset_id: int, width: int, height: int, n_frames: int) -> bytes:
    """A valid uncompressed ('DIB ') AVI: RIFF('AVI ') → LIST(hdrl){avih,
    LIST(strl){strh,strf}} → LIST(movi){'00db' × n_frames}."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + len(body).to_bytes(4, "little") + body + (
            b"\x00" if len(body) % 2 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    frame_bytes = ((width * 3 + 3) & ~3) * height
    u32 = lambda v: int(v).to_bytes(4, "little")  # noqa: E731
    u16 = lambda v: int(v).to_bytes(2, "little")  # noqa: E731
    avih = (
        u32(100_000) + u32(frame_bytes * 10) + u32(0) + u32(0x10)
        + u32(n_frames) + u32(0) + u32(1) + u32(frame_bytes)
        + u32(width) + u32(height) + u32(0) * 4
    )
    strh = (
        b"vids" + b"DIB " + u32(0) + u16(0) + u16(0) + u32(0)
        + u32(1) + u32(10)          # scale/rate = 10 fps
        + u32(0) + u32(n_frames) + u32(frame_bytes) + u32(0xFFFFFFFF)
        + u32(0) + u16(0) + u16(0) + u16(width) + u16(height)
    )
    strf = (
        u32(40) + u32(width) + u32(height) + u16(1) + u16(24)
        + u32(0) + u32(frame_bytes) + u32(2835) * 2 + u32(0) * 2
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(
        b"movi",
        b"".join(
            chunk(b"00db", _frame_pixels(asset_id, width, height, f))
            for f in range(n_frames)
        ),
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_avi_numpy(data: bytes):
    """Real AVI demux + DIB frame decode with numpy only: returns
    (width, height, [ndarray[h, w, 3] RGB per frame]).  Raises
    ValueError for anything that isn't an uncompressed 24-bit AVI."""
    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")

    width = height = None
    frames = []

    def walk(buf: bytes) -> None:
        nonlocal width, height
        pos = 0
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            body = buf[pos + 8 : pos + 8 + size]
            if cid == b"LIST":
                walk(body[4:])  # skip the list kind, recurse into chunks
            elif cid == b"strf":
                bits = int.from_bytes(body[14:16], "little")
                comp = int.from_bytes(body[16:20], "little")
                if bits != 24 or comp != 0:
                    raise ValueError(f"unsupported AVI codec: {bits}-bit/c{comp}")
                width = int.from_bytes(body[4:8], "little", signed=True)
                height = int.from_bytes(body[8:12], "little", signed=True)
            elif cid in (b"00db", b"00dc"):
                frames.append(body)
            pos += 8 + size + (size % 2)  # word-aligned chunks

    walk(data[12:])
    if width is None or not frames:
        raise ValueError("missing strf/movi data")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    out = []
    for raw in frames:
        arr = np.frombuffer(raw, dtype=np.uint8, count=stride * height)
        rows = arr.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
        if bottom_up:
            rows = rows[::-1]
        out.append(rows[:, :, ::-1])  # BGR → RGB
    return width, height, out


def synth_video_assets(docs: DataFrame) -> DataFrame:
    """Real binary video fixtures: one tiny uncompressed AVI per
    document — width = id%6+2, height = id%4+2, n_frames = id%5+1."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            w = (ids % 6 + 2).astype("int32")
            h = (ids % 4 + 2).astype("int32")
            nf = (ids % 5 + 1).astype("int32")
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "width": w,
                    "height": h,
                    "n_frames": nf,
                    "content": [
                        synth_avi(int(i), int(wi), int(hi), int(n))
                        for i, wi, hi, n in zip(ids, w, h, nf)
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(
        gen,
        schema="asset_id long, width int, height int, n_frames int, content binary",
    )


VIDEO_DECODED_SCHEMA = (
    "asset_id long, frame_idx int, width int, height int, mean_pixel double"
)


def decode_video(assets: DataFrame) -> DataFrame:
    """REAL video decode as mapInPandas: demux the AVI container and
    emit one row PER FRAME with decoded dims + mean pixel — the shape a
    frame-level feature extractor consumes.  Output size ∝ frames, and
    each Arrow batch demuxes its blobs independently."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, fidx, ws, hs, means = [], [], [], [], []
            for aid, b in zip(pdf["asset_id"], pdf["content"]):
                w, h, frames = decode_avi_numpy(bytes(b))
                for i, fr in enumerate(frames):
                    ids.append(aid)
                    fidx.append(i)
                    ws.append(w)
                    hs.append(h)
                    means.append(float(fr.astype(np.float64).mean()))
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "mean_pixel": means,
                }
            )

    return assets.select("asset_id", "content").mapInPandas(
        decode, schema=VIDEO_DECODED_SCHEMA
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


# ---------------------------------------------------------------------------
# REAL compressed codec #2: GIF87a with a full LZW coder pair.
# PNG proved DEFLATE; GIF proves a dictionary coder — variable-width
# codes (9→12 bits, LSB-first bit packing), in-lockstep dictionary
# growth on both sides, CLEAR resets at 4096 entries, sub-block framing.
# The synthesized images are palette-indexed with pixel(x, y) =
# (asset_id + 7x + 13y) % 256 over a grayscale palette, so the oracle
# recomputes every decoded value without touching the binary.  Fixture
# images are tiny (width stays 9 bits); the width-bump and CLEAR-reset
# paths are exercised by a large round-trip unit test instead
# (tests/test_multimodal.py).
# ---------------------------------------------------------------------------

GIF_SIGNATURES = (b"GIF87a", b"GIF89a")


def lzw_encode_gif(indices, min_code: int = 8) -> bytes:
    """GIF-variant LZW: emits CLEAR first, grows the dictionary per
    mismatch, bumps code width when the next assignable code crosses the
    current width, resets at 4096.  LSB-first bit packing."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    bits = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    def fresh():
        return {bytes([i]): i for i in range(1 << min_code)}, end + 1, min_code + 1

    table, next_code, width = fresh()
    emit(clear, width)
    buf = bytes([indices[0]])
    for k in indices[1:]:
        cand = buf + bytes([k])
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        table[cand] = next_code
        next_code += 1
        # decoder bumps after ITS add, which lags the encoder's by one
        # code — so the encoder must widen one entry early (+1)
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table, next_code, width = fresh()
        buf = bytes([k])
    emit(table[buf], width)
    emit(end, width)
    if nacc:
        bits.append(acc & 0xFF)
    return bytes(bits)


def lzw_decode_gif(data: bytes, min_code: int = 8) -> bytes:
    """Inverse of lzw_encode_gif — the classic streaming LZW decode with
    the KwKwK special case."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = 0
    nacc = 0
    pos = 0

    table: list[bytes] = []
    width = min_code + 1
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
        width = min_code + 1
        prev = None

    reset()
    while True:
        while nacc < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated (no END code)")
            acc |= data[pos] << nacc
            nacc += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nacc -= width
        if code == clear:
            reset()
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("first code after CLEAR must be a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table size {len(table)}")
        out += entry
        if prev is not None and len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry


def synth_gif(asset_id: int, width: int, height: int) -> bytes:
    """A valid GIF87a whose palette index at (x, y) is
    ``(asset_id + 7x + 13y) % 256`` over the grayscale palette
    palette[i] = (i, i, i) — so decoded RGB mean == mean index, and the
    oracle recomputes it from the formula."""
    import numpy as np

    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    idx = ((asset_id + 7 * xs + 13 * ys) % 256).astype(np.uint8).reshape(-1)
    palette = bytes(bytearray(i for i in range(256) for _ in range(3)))
    lzw = lzw_encode_gif(idx.tobytes())
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)  # block terminator
    return (
        b"GIF87a"
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
        + bytes((0xF7, 0, 0))  # global table, 8-bit color, 256 entries
        + palette
        + b"\x2c"  # image descriptor
        + (0).to_bytes(2, "little") * 2
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
        + b"\x00"  # no local table, not interlaced
        + bytes([8])  # LZW minimum code size
        + bytes(blocks)
        + b"\x3b"  # trailer
    )


def decode_gif_numpy(data: bytes):
    """Real GIF decode with the stdlib + numpy only: header walk,
    global/local palettes, extension skip, sub-block reassembly, full
    LZW decode.  Returns (width, height, ndarray[h, w, 3] RGB).
    Supports the non-interlaced single-frame profile it synthesizes."""
    import numpy as np

    if data[:6] not in GIF_SIGNATURES:
        raise ValueError("not a GIF payload")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    flags = data[10]
    pos = 13
    palette = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        palette = np.frombuffer(data, np.uint8, size * 3, pos).reshape(-1, 3)
        pos += size * 3
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            w = int.from_bytes(data[pos + 5 : pos + 7], "little")
            h = int.from_bytes(data[pos + 7 : pos + 9], "little")
            iflags = data[pos + 9]
            pos += 10
            if iflags & 0x40:
                raise ValueError("interlaced GIF not supported")
            if iflags & 0x80:
                size = 2 << (iflags & 0x07)
                palette = np.frombuffer(data, np.uint8, size * 3, pos).reshape(
                    -1, 3
                )
                pos += size * 3
            if palette is None:
                raise ValueError("GIF image without a color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                n = data[pos]
                lzw += data[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = np.frombuffer(
                lzw_decode_gif(bytes(lzw), min_code), dtype=np.uint8
            )
            if len(idx) != w * h:
                raise ValueError("GIF pixel count mismatch")
            return sw, sh, palette[idx.reshape(h, w)]
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image data")


def synth_gif_assets(docs: DataFrame) -> DataFrame:
    """One small GIF per document (width = id%7+2, height = id%4+2 —
    distinct from both the BMP and PNG dims)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            w = (ids % 7 + 2).astype("int32")
            h = (ids % 4 + 2).astype("int32")
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "width": w,
                    "height": h,
                    "content": [
                        synth_gif(int(i), int(wi), int(hi))
                        for i, wi, hi in zip(ids, w, h)
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(
        gen, schema="asset_id long, width int, height int, content binary"
    )


# ---------------------------------------------------------------------------
# REAL compressed codec #3: baseline JPEG (ITU-T T.81), encode + decode
# with numpy only.  PNG proved DEFLATE, GIF proved a dictionary coder;
# JPEG proves a TRANSFORM codec — canonical Huffman entropy coding over
# zigzag-ordered, run-length-coded quantized DCT coefficients, then an
# 8×8 inverse DCT per block.  The decoder is a general baseline-grayscale
# kernel (marker walk, DQT/DHT/SOF0/SOS, bit reader with 0xFF00
# unstuffing, DC prediction, (run,size) AC decoding with ZRL/EOB,
# dequantize → dezigzag → IDCT → level shift).
#
# Pixel-exactness (the oracle story): JPEG is lossy in general, but a
# block-CONSTANT 8×8 tile has a single DC coefficient and zero ACs; with
# a flat quantization table (all 1s, carried in DQT like any other
# table) the round trip is bit-exact — DC = 8·(v−128) is stored without
# loss and the IDCT of a DC-only block is uniform to ~1e-13 before
# rounding.  The synthesizer therefore colors each 8×8 block with
# (asset_id + 7·bx + 13·by) % 256, and the SQL oracle recomputes every
# decoded pixel from that closed form.  Non-constant blocks (real AC
# coefficients through every huffman/run-length/IDCT path) are covered
# by unit tests against an independent double-loop IDCT reference
# (tests/test_multimodal_jpeg.py), since a float IDCT is not
# SQL-recomputable.
#
# Huffman tables are generated canonically in-module (DC: 12 symbols at
# 4 bits; AC: all 162 baseline symbols at 8 bits) and shipped in DHT —
# spec-compliant (tables are data, not convention) and immune to
# mistranscribing the Annex K tables.
# ---------------------------------------------------------------------------

JPEG_SOI = b"\xff\xd8"

# zigzag scan position -> natural index (v*8 + u), ITU-T T.81 Figure 5
JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# canonical tables: (bits[1..16], symbol list in code order)
_JPEG_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
_JPEG_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _jpeg_canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical construction of T.81
    Annex C (code increments within a length, doubles across)."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _jpeg_idct_matrix():
    import numpy as np

    u = np.arange(8)
    x = np.arange(8)
    m = 0.5 * np.cos((2 * x[None, :] + 1) * u[:, None] * np.pi / 16)
    m[0] /= np.sqrt(2.0)
    return m  # s = M.T @ S @ M


class _JpegBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.n = 0, 0
        return bytes(self.out)


def _jpeg_category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def jpeg_encode_baseline_gray(qblocks, width: int, height: int) -> bytes:
    """Assemble a valid baseline JFIF grayscale JPEG from QUANTIZED
    coefficient blocks (natural order, row-major over the padded block
    grid), flat quant table.  ``qblocks``: iterable of 8×8 int arrays."""
    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    w = _JpegBitWriter()
    prev_dc = 0
    for blk in qblocks:
        zz = [int(blk[idx // 8][idx % 8]) for idx in JPEG_ZIGZAG]
        diff = zz[0] - prev_dc
        prev_dc = zz[0]
        t = _jpeg_category(diff)
        code, ln = dc_codes[t]
        w.put(code, ln)
        if t:
            w.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]
                w.put(code, ln)
                run -= 16
            s = _jpeg_category(zz[k])
            code, ln = ac_codes[(run << 4) | s]
            w.put(code, ln)
            w.put(zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1, s)
            run = 0
        if run:
            code, ln = ac_codes[0x00]  # EOB
            w.put(code, ln)
    scan = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + (len(body) + 2).to_bytes(2, "big") + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(
        0xC0,
        bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    dht = seg(
        0xC4,
        bytes([0x00])
        + bytes(_JPEG_DC_BITS)
        + bytes(_JPEG_DC_VALS)
        + bytes([0x10])
        + bytes(_JPEG_AC_BITS)
        + bytes(_JPEG_AC_VALS),
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return JPEG_SOI + dqt + sof + dht + sos + scan + b"\xff\xd9"


def synth_jpeg(asset_id: int, width: int, height: int) -> bytes:
    """A valid baseline grayscale JPEG whose 8×8 block (bx, by) is
    uniformly ``(asset_id + 7·bx + 13·by) % 256`` — DC-only blocks, so
    with the flat quant table the decode is pixel-exact and the oracle
    recomputes every pixel as value(x//8, y//8)."""
    import numpy as np

    bw, bh = (width + 7) // 8, (height + 7) // 8
    blocks = []
    for by in range(bh):
        for bx in range(bw):
            v = (asset_id + 7 * bx + 13 * by) % 256
            blk = np.zeros((8, 8), dtype=np.int32)
            blk[0, 0] = 8 * (v - 128)  # DCT of a constant block: DC only
            blocks.append(blk)
    return jpeg_encode_baseline_gray(blocks, width, height)


class _JpegBitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(f"unexpected marker 0xff{nxt:02x} in scan")
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _jpeg_extend(v: int, t: int) -> int:
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_numpy(data: bytes):
    """Real baseline JPEG decode with numpy only (profile: 8-bit
    grayscale, single scan — the profile it synthesizes; anything else
    raises, same honesty boundary as the PNG/GIF kernels).  Returns
    (width, height, ndarray[h, w] uint8)."""
    import numpy as np

    if data[:2] != JPEG_SOI:
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    comp_qt = comp_dc = comp_ac = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        ln = int.from_bytes(data[pos + 2 : pos + 4], "big")
        body = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = list(body[b + 1 : b + 65])
                b += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                vals = list(body[b + 17 : b + 17 + nv])
                codes = _jpeg_canonical_codes(bits, vals)
                huff[(tc, th)] = {(c, l): sym for sym, (c, l) in codes.items()}
                b += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if body[0] != 8 or ncomp != 1 or body[7] != 0x11:
                raise ValueError(
                    "unsupported JPEG profile: baseline 8-bit single-component"
                    " 1x1 only"
                )
            comp_qt = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDA:  # SOS — scan follows
            if body[0] != 1:
                raise ValueError("multi-component scan unsupported")
            comp_dc, comp_ac = body[2] >> 4, body[2] & 0x0F
            pos = pos + 2 + ln
            break
        pos += 2 + ln
    if width is None:
        raise ValueError("JPEG missing SOF0")

    def read_symbol(r: _JpegBitReader, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | r.bit()
            length += 1
            sym = table.get((code, length))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    dc_tab, ac_tab = huff[(0, comp_dc)], huff[(1, comp_ac)]
    q = np.array(qt[comp_qt], dtype=np.int32)  # zigzag order
    m = _jpeg_idct_matrix()
    bw, bh = (width + 7) // 8, (height + 7) // 8
    img = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    r = _JpegBitReader(data, pos)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            zz = np.zeros(64, dtype=np.int64)
            t = read_symbol(r, dc_tab)
            diff = _jpeg_extend(r.bits(t), t) if t else 0
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                rs = read_symbol(r, ac_tab)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += rs >> 4
                if k > 63:
                    raise ValueError("AC run past end of block")
                zz[k] = _jpeg_extend(r.bits(rs & 0x0F), rs & 0x0F)
                k += 1
            coef = np.zeros(64, dtype=np.float64)
            coef[JPEG_ZIGZAG] = zz * q
            s = m.T @ coef.reshape(8, 8) @ m
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.round(s) + 128, 0, 255
            ).astype(np.uint8)
    return width, height, img[:height, :width]


def synth_jpeg_assets(docs: DataFrame) -> DataFrame:
    """One small multi-block JPEG per document (width = id%9+10,
    height = id%5+9 → 2-3 × 2 block grids, so DC prediction chains and
    row-boundary block cropping are genuinely exercised)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            w = (ids % 9 + 10).astype("int32")
            h = (ids % 5 + 9).astype("int32")
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "width": w,
                    "height": h,
                    "content": [
                        synth_jpeg(int(i), int(wi), int(hi))
                        for i, wi, hi in zip(ids, w, h)
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(
        gen, schema="asset_id long, width int, height int, content binary"
    )


def spectral_features(assets: DataFrame) -> DataFrame:
    """REAL DSP over decoded audio: per-asset rFFT spectral energy.
    Emits the exact integer time-domain energy (Σ s²), the rFFT bin
    count, and the Parseval identity check — time-domain energy must
    equal (|X₀|² + 2Σ|X_k|² + |X_{N/2}|²)/N to float precision.  The
    FFT itself is not SQL-recomputable, but Parseval makes the result
    ORACLE-CHECKABLE anyway: the oracle recomputes Σ s² from the synth
    formula and asserts the identity held — a broken window, scaling,
    or bin-fold fails the boolean."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, b in zip(pdf["asset_id"], pdf["content"]):
                _, samples = decode_wav_numpy(bytes(b))
                x = samples.astype(np.float64)
                n = len(x)
                e_time = int((samples.astype(np.int64) ** 2).sum())
                X = np.fft.rfft(x)
                mag2 = np.abs(X) ** 2
                e_freq = mag2[0] + 2.0 * mag2[1:-1].sum() + (
                    mag2[-1] if n % 2 == 0 else 2.0 * mag2[-1]
                )
                e_freq /= n
                ok = bool(
                    e_time == 0
                    and e_freq < 1e-6
                    or abs(e_time - e_freq) <= 1e-9 * max(e_time, 1)
                )
                out.append((int(aid), int(n), e_time, len(mag2), ok))
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id",
                    "n_samples",
                    "energy_time",
                    "n_bins",
                    "parseval_ok",
                ],
            )

    return assets.select("asset_id", "content").mapInPandas(
        feats,
        schema=(
            "asset_id long, n_samples int, energy_time long, "
            "n_bins int, parseval_ok boolean"
        ),
    )


PHASH_SCHEMA = "asset_id long, width int, height int, phash long"


def phash_images(assets: DataFrame) -> DataFrame:
    """Perceptual block-hash over REAL decoded pixels (blockhash.io
    shape, integer-exact): grayscale = r+g+b, 4×4 block grid
    (block of pixel x = (4x)//w), bit(i,j) = block-sum·total-count >
    total-sum·block-count (i.e. block mean above the image mean,
    cross-multiplied so there is never a float), hash =
    Σ bit(i,j) << (i·4+j).  Empty blocks (w or h < 4) are bit 0 on both
    engines by the same inequality.  One mapInPandas decode pass — the
    hash rides the SAME Arrow batch as the pixel decode, no second scan.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, ws, hs, hashes = [], [], [], []
            for aid, b in zip(pdf["asset_id"], pdf["content"]):
                w, h, arr = decode_bmp_numpy(bytes(b))
                gray = arr.astype(np.int64).sum(axis=2)  # h×w
                bi = (np.arange(w, dtype=np.int64) * 4) // w
                bj = (np.arange(h, dtype=np.int64) * 4) // h
                sums = np.zeros((4, 4), dtype=np.int64)
                cnts = np.zeros((4, 4), dtype=np.int64)
                np.add.at(sums, (bj[:, None], bi[None, :]), gray)
                np.add.at(cnts, (bj[:, None], bi[None, :]), 1)
                ts, tc = int(gray.sum()), int(gray.size)
                bits = sums * tc > ts * cnts
                ph = 0
                for i in range(4):
                    for j in range(4):
                        if bits[j, i]:
                            ph |= 1 << (i * 4 + j)
                ids.append(int(aid))
                ws.append(w)
                hs.append(h)
                hashes.append(ph)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    return assets.select("asset_id", "content").mapInPandas(
        run, schema=PHASH_SCHEMA
    )


def phash_near_pairs(
    hashes: DataFrame,
    max_hamming: int = 2,
    key_cols: tuple[str, ...] = ("width", "height"),
    hash_col: str = "phash",
) -> DataFrame:
    """Near-duplicate pairs over a 16-bit perceptual hash: same
    ``key_cols`` block, hamming ≤ ``max_hamming``.  Never all-pairs:
    the hash splits into four 4-bit bands, and ≤2 bit errors can damage
    at most 2 bands, so every qualifying pair shares an exact band
    (pigeonhole — the SimHash band-join guarantee); candidates come
    from a (keys, band, value) equi-join, then exact bit_count
    verification.  Output: (asset_a, asset_b, *key_cols, hamming).
    Serves both the image (width/height keys) and audio (n_samples key)
    fingerprints."""
    b = hashes.select(
        "asset_id",
        *key_cols,
        hash_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.shiftright(hash_col, k * 4)
                        .bitwiseAND(F.lit(15))
                        .alias("val"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("bv"),
    ).select("asset_id", *key_cols, hash_col, "bv.band", "bv.val")
    left = b.alias("a")
    right = b.alias("bb")
    cond = [F.col(f"a.{k}") == F.col(f"bb.{k}") for k in key_cols] + [
        F.col("a.band") == F.col("bb.band"),
        F.col("a.val") == F.col("bb.val"),
        F.col("a.asset_id") < F.col("bb.asset_id"),
    ]
    cand = (
        left.join(right, on=cond)
        .select(
            F.col("a.asset_id").alias("asset_a"),
            F.col("bb.asset_id").alias("asset_b"),
            *[F.col(f"a.{k}").alias(k) for k in key_cols],
            F.bit_count(
                F.col(f"a.{hash_col}").bitwiseXOR(F.col(f"bb.{hash_col}"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return cand


AHASH_SCHEMA = "asset_id long, n_samples int, ahash long"


def ahash_audio(assets: DataFrame) -> DataFrame:
    """Audio fingerprint over REAL decoded PCM samples, the energy-
    envelope analog of :func:`phash_images`: 16 frames (frame of sample
    i = (16·i)//n), bit(f) = frame-energy·total-count >
    total-energy·frame-count (cross-multiplied int64 — sample² ≤ 2³⁰,
    frames ≤ 500 samples, no overflow, no floats), hash =
    Σ bit(f) << f.  One mapInPandas decode pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, ns, hashes = [], [], []
            for aid, b in zip(pdf["asset_id"], pdf["content"]):
                _rate, samples = decode_wav_numpy(bytes(b))
                s = samples.astype(np.int64)
                n = s.size
                fidx = (np.arange(n, dtype=np.int64) * 16) // n
                e = np.zeros(16, dtype=np.int64)
                c = np.zeros(16, dtype=np.int64)
                np.add.at(e, fidx, s * s)
                np.add.at(c, fidx, 1)
                te, tc = int(e.sum()), n
                bits = e * tc > te * c
                ah = 0
                for f in range(16):
                    if bits[f]:
                        ah |= 1 << f
                ids.append(int(aid))
                ns.append(n)
                hashes.append(ah)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "ahash": pd.Series(hashes, dtype="int64"),
                }
            )

    return assets.select("asset_id", "content").mapInPandas(
        run, schema=AHASH_SCHEMA
    )


VHASH_SCHEMA = "asset_id long, width int, height int, n_frames int, vhash long"


def vhash_videos(assets: DataFrame) -> DataFrame:
    """Video fingerprint over REAL demuxed frames: the 4×4 spatial
    block-hash (see :func:`phash_images`) of the TEMPORAL-SUM grayscale
    image — per pixel, gray = Σ_frames (r+g+b); bits compare block sums
    against the whole-image mean with cross-multiplied int64s (no
    floats).  One mapInPandas demux+decode pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, ws, hs, nfs, hashes = [], [], [], [], []
            for aid, b in zip(pdf["asset_id"], pdf["content"]):
                w, h, frames = decode_avi_numpy(bytes(b))
                acc = np.zeros((h, w), dtype=np.int64)
                for arr in frames:
                    acc += arr.astype(np.int64).sum(axis=2)
                bi = (np.arange(w, dtype=np.int64) * 4) // w
                bj = (np.arange(h, dtype=np.int64) * 4) // h
                sums = np.zeros((4, 4), dtype=np.int64)
                cnts = np.zeros((4, 4), dtype=np.int64)
                np.add.at(sums, (bj[:, None], bi[None, :]), acc)
                np.add.at(cnts, (bj[:, None], bi[None, :]), 1)
                ts, tc = int(acc.sum()), int(acc.size)
                bits = sums * tc > ts * cnts
                vh = 0
                for i in range(4):
                    for j in range(4):
                        if bits[j, i]:
                            vh |= 1 << (i * 4 + j)
                ids.append(int(aid))
                ws.append(w)
                hs.append(h)
                nfs.append(len(frames))
                hashes.append(vh)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_frames": pd.Series(nfs, dtype="int32"),
                    "vhash": pd.Series(hashes, dtype="int64"),
                }
            )

    return assets.select("asset_id", "content").mapInPandas(
        run, schema=VHASH_SCHEMA
    )
